"""Video-column support: a real RIFF/AVI container codec (uncompressed
DIB frames — AVI's native raw-video format) plus the frame-sampling
decode query. Completes the multimodal triad: images
(``llm/multimodal.py``), audio (``llm/audio.py``), video (here).

The payload is a structurally valid AVI: RIFF('AVI ') wrapping a
LIST('hdrl') with real ``avih``/``strh``/``strf`` headers and a
LIST('movi') of ``00db`` frame chunks, each a bottom-up 24-bit DIB
with 4-byte row padding — the same layout a 1990s VfW decoder would
accept. Frame pixel bytes derive from (doc_id, frame, pixel) by pure
integer arithmetic, so the oracle reproduces every decoded feature
exactly. The decode kernel walks RIFF LIST structure for real and
frame-SAMPLES (every 2nd frame) before touching pixels — the pattern
that matters at scale: sampling happens at the container level, so
unsampled frames are never decoded.

Scale notes (100 TB of video): payloads live in a pruned binary
column; the kernel is Arrow-batched ``mapInPandas`` with per-batch
memory = batch_size × payload (never a partition of decoded frames);
frame sampling bounds decode work per video. A production variant
sharding videos longer than a row group would split containers into
(video_id, segment) rows — the multi-image array op
(q_multimodal_array) shows the per-document fan-out pattern.

Reference parity: none — driver-north-star multimodal surface
(BASELINE.json).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_rc_spark.registry import register
from flink_rc_spark.sources.tables import load

_W, _H = 2, 2
_N_FRAMES = 8
_FPS = 10
_SAMPLE_EVERY = 2
_ROW_STRIDE = ((_W * 3 + 3) // 4) * 4          # 8 bytes for 2px rows
_FRAME_BYTES = _ROW_STRIDE * _H                # 16
_PX_PER_FRAME = _W * 3 * _H                    # 12 pixel bytes


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return struct.pack("<4sI", cid, len(body)) + body + pad


def _list(subtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", subtype + body)


def encode_avi(frames: list[np.ndarray], fps: int = _FPS) -> bytes:
    """Encode RGB uint8 frames ``(h, w, 3)`` as an uncompressed-DIB
    AVI (RIFF/'AVI ', LIST hdrl + LIST movi, '00db' chunks)."""
    h, w, _ = frames[0].shape
    stride = ((w * 3 + 3) // 4) * 4
    frame_size = stride * h
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, frame_size * fps, 0, 0x10, len(frames), 0, 1,
        frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames),
        frame_size, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b""
    for fr in frames:
        # bottom-up rows, BGR byte order, 4-byte-aligned rows (DIB)
        rows = []
        for y in range(h - 1, -1, -1):
            row = fr[y, :, ::-1].tobytes()
            rows.append(row + b"\x00" * (stride - len(row)))
        movi_body += _chunk(b"00db", b"".join(rows))
    movi = _list(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(riff_body)) + riff_body


def decode_avi(payload: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """Parse a RIFF/AVI container: returns (width, height, fps,
    n_frames, frame_dibs). Walks LIST structure for real — unknown
    chunks skip by declared size; only '00db' (uncompressed DIB)
    frames are decoded."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = None
    rate = scale = None
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal w, h, rate, scale
        pos = 0
        while pos + 8 <= len(buf):
            cid, csize = struct.unpack_from("<4sI", buf, pos)
            pos += 8
            body = buf[pos : pos + csize]
            if cid == b"LIST":
                walk(body[4:])
            elif cid == b"strf":
                _sz, w, h = struct.unpack_from("<Iii", body, 0)
            elif cid == b"strh":
                fcc = body[:4]
                if fcc == b"vids":
                    scale, rate = struct.unpack_from("<II", body, 20)
            elif cid == b"00db":
                frames.append(body)
            pos += csize + (csize & 1)

    walk(payload[12:])
    if w is None or not frames:
        raise ValueError("AVI missing strf or frames")
    fps = rate // scale if rate and scale else 0
    return int(w), int(h), int(fps), len(frames), frames


# ---------------------------------------------------------------------------
# q_video_frames — binary AVI column -> frame-sampled decode -> features
# ---------------------------------------------------------------------------

# pixel byte p of frame f: (doc_id*11 + f*17 + p*5) % 256
_HDR = encode_avi(
    [np.zeros((_H, _W, 3), dtype=np.uint8) for _ in range(_N_FRAMES)], _FPS
)
# everything before the first frame chunk's data is constant geometry;
# frame chunk headers ('00db' + size) are also constant
_MOVI_DATA_START = _HDR.index(b"00db") + 8
_PREFIX = _HDR[: _MOVI_DATA_START - 8]
_FRAME_HDR_HEX = _HDR[_MOVI_DATA_START - 8 : _MOVI_DATA_START].hex()

# byte i (0..15) of a frame's DIB data: row-padding bytes are zero,
# pixel bytes follow the recurrence with p = (i div 8)*6 + (i mod 8)
_FRAME_BYTE_SPARK = (
    "IF(i % 8 >= 6, '00', lpad(hex((doc_id * 11 + f * 17"
    " + (CAST(i / 8 AS INT) * 6 + i % 8) * 5) % 256), 2, '0'))"
)

_PXSUM_DUCK = (
    f"list_sum(flatten(list_transform(range(0, {_N_FRAMES}, {_SAMPLE_EVERY}),"
    f" f -> list_transform(range(0, {_PX_PER_FRAME}),"
    " p -> (doc_id * 11 + f * 17 + p * 5) % 256))))"
)


def with_video_columns(docs: DataFrame) -> DataFrame:
    """Attach a REAL AVI payload + typed metadata struct, constructed
    JVM-side (constant header literal + unhex'd frame bytes)."""
    frame_hex = F.expr(
        f"concat_ws('', transform(sequence(0, {_N_FRAMES - 1}), f ->"
        f" concat('{_FRAME_HDR_HEX}', concat_ws('',"
        f" transform(sequence(0, {_FRAME_BYTES - 1}), i -> {_FRAME_BYTE_SPARK})))))"
    )
    payload = F.concat(F.lit(bytearray(_PREFIX)), F.unhex(frame_hex))
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(_W).alias("width"),
            F.lit(_H).alias("height"),
            F.lit(_FPS).alias("fps"),
            F.lit(_N_FRAMES).alias("n_frames"),
            F.lit("avi").alias("format"),
        ).alias("meta"),
    )


_VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_sampled", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
    ]
)


def _video_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: parse each AVI, frame-sample every
    ``_SAMPLE_EVERY``-th frame at the CONTAINER level (unsampled
    frames are never touched), sum sampled pixel bytes excluding DIB
    row padding."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        out = {k: [] for k in
               ("width", "height", "fps", "n_frames", "n_sampled", "px_sum")}
        for payload in pdf["payload"]:
            w, h, fps, n, frames = decode_avi(bytes(payload))
            stride = ((w * 3 + 3) // 4) * 4
            sampled = frames[::_SAMPLE_EVERY]
            s = 0
            for dib in sampled:
                arr = np.frombuffer(dib, dtype=np.uint8).reshape(h, stride)
                s += int(arr[:, : w * 3].sum())
            out["width"].append(w)
            out["height"].append(h)
            out["fps"].append(fps)
            out["n_frames"].append(n)
            out["n_sampled"].append(len(sampled))
            out["px_sum"].append(s)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "width": pd.Series(out["width"], dtype="int32"),
                "height": pd.Series(out["height"], dtype="int32"),
                "fps": pd.Series(out["fps"], dtype="int32"),
                "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                "n_sampled": pd.Series(out["n_sampled"], dtype="int32"),
                "px_sum": pd.Series(out["px_sum"], dtype="int64"),
            }
        )


@register(
    "q_video_frames",
    oracle=f"""
    SELECT doc_id,
           CAST({len(_PREFIX) + _N_FRAMES * (8 + _FRAME_BYTES)} AS INT)
               AS n_bytes,
           CAST({_W} AS INT) AS width,
           CAST({_H} AS INT) AS height,
           CAST({_FPS} AS INT) AS fps,
           CAST({_N_FRAMES} AS INT) AS n_frames,
           CAST({_N_FRAMES // _SAMPLE_EVERY} AS INT) AS n_sampled,
           CAST({_PXSUM_DUCK} AS BIGINT) AS px_sum
    FROM documents
    ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary video column -> mapInPandas REAL AVI parse ->
    frame-sample -> pixel features.

    The payload is a structurally valid RIFF/AVI with uncompressed DIB
    frames built JVM-side; the kernel walks the LIST/chunk structure,
    samples every 2nd frame BEFORE decoding pixels, and sums sampled
    pixel bytes (DIB row padding excluded). The oracle reproduces
    geometry and the sampled pixel sum from the generating integer
    recurrence, hash-verifying the full container -> parser ->
    sampler -> feature path.
    """
    from flink_rc_spark.util import ensure_package_shipped

    ensure_package_shipped(spark)
    docs = load(spark, sf_dir, "documents")
    video = with_video_columns(docs)
    flat = video.select("doc_id", "payload")
    # spread the Python kernel off the single-split local scan
    flat = flat.repartition(spark.sparkContext.defaultParallelism)
    return flat.mapInPandas(_video_batches, _VIDEO_SCHEMA)


# ---------------------------------------------------------------------------
# q_video_motion — frame-delta energy and scene-cut localization
# ---------------------------------------------------------------------------

_MOTION_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_pairs", T.IntegerType()),
        T.StructField("motion_energy", T.LongType()),
        T.StructField("cut_frame", T.LongType()),
        T.StructField("max_delta", T.LongType()),
    ]
)


def _motion_batches(batches):
    """mapInPandas kernel: REAL AVI parse, strip DIB row padding, then
    per-consecutive-frame absolute pixel deltas — total motion energy,
    the pair index with the largest delta (first on ties = numpy
    argmax), and that delta. Integer arithmetic end-to-end."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        energies, cuts, maxes, pairs = [], [], [], []
        for payload in pdf["payload"]:
            _w, _h, _fps, _n, frames = decode_avi(bytes(payload))
            px = []
            for fb in frames:
                arr = np.frombuffer(fb, dtype=np.uint8)
                mask = (np.arange(len(arr)) % 8) < 6  # drop row padding
                px.append(arr[mask].astype(np.int64))
            mat = np.stack(px)  # (n_frames, 12)
            deltas = np.abs(np.diff(mat, axis=0)).sum(axis=1)
            energies.append(int(deltas.sum()))
            cuts.append(int(np.argmax(deltas)))
            maxes.append(int(deltas.max()))
            pairs.append(len(deltas))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_pairs": pd.Series(pairs, dtype="int32"),
                "motion_energy": pd.Series(energies, dtype="int64"),
                "cut_frame": pd.Series(cuts, dtype="int64"),
                "max_delta": pd.Series(maxes, dtype="int64"),
            }
        )


_DELTAS_DUCK = (
    f"list_transform(range(0, {_N_FRAMES - 1}), f ->"
    f" list_sum(list_transform(range(0, {_PX_PER_FRAME}), p ->"
    " abs((doc_id * 11 + (f + 1) * 17 + p * 5) % 256"
    " - (doc_id * 11 + f * 17 + p * 5) % 256))))"
)


@register(
    "q_video_motion",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_DELTAS_DUCK} AS deltas FROM documents)
    SELECT doc_id,
           CAST({_N_FRAMES - 1} AS INT) AS n_pairs,
           CAST(list_sum(deltas) AS BIGINT) AS motion_energy,
           CAST(list_position(deltas, list_max(deltas)) - 1 AS BIGINT)
               AS cut_frame,
           CAST(list_max(deltas) AS BIGINT) AS max_delta
    FROM d
    ORDER BY doc_id
    """,
    tags=("llm", "multimodal", "video"),
)
def q_video_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video MOTION analysis — the temporal feature beside
    q_video_frames' spatial sampling: per document, the total
    absolute pixel delta between consecutive AVI frames (motion
    energy), the frame-pair index where the delta peaks (the scene
    cut — first index on ties, numpy argmax ≡ DuckDB list_position),
    and the peak delta. A video curation pipeline ranks clips by
    exactly these (static-slide detection, cut segmentation for
    frame-dedup).

    All-integer arithmetic on the decoded DIB bytes (row padding
    stripped), so the oracle recomputes everything from the
    generating recurrence — the hash proves container walk, padding
    layout, AND the temporal diff. Same Arrow streaming economics as
    the other media kernels; at 100 TB the diff runs fused with the
    decode so raw frames never leave the batch.
    """
    from flink_rc_spark.util import ensure_package_shipped

    ensure_package_shipped(spark)
    docs = load(spark, sf_dir, "documents")
    flat = with_video_columns(docs).select("doc_id", "payload")
    flat = flat.repartition(spark.sparkContext.defaultParallelism)
    return flat.mapInPandas(_motion_batches, _MOTION_SCHEMA).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q_video_shots — motion-threshold shot segmentation
# ---------------------------------------------------------------------------

_SHOT_TH = 600  # frame-pair delta above this = shot boundary

_SHOTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shot_start", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("pix_sum", T.LongType()),
    ]
)


def _shots_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas shot-segmentation kernel: REAL AVI parse, per-pair
    absolute pixel deltas, boundary where delta > threshold, frames
    merged into shots with their integer pixel-byte sums."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _w, _h, _fps, _n, frames = decode_avi(bytes(payload))
            px = []
            for fb in frames:
                arr = np.frombuffer(fb, dtype=np.uint8)
                mask = (np.arange(len(arr)) % 8) < 6  # drop row padding
                px.append(arr[mask].astype(np.int64))
            mat = np.stack(px)
            deltas = np.abs(np.diff(mat, axis=0)).sum(axis=1)
            start = 0
            for f in range(1, len(frames) + 1):
                if f == len(frames) or deltas[f - 1] > _SHOT_TH:
                    rows.append(
                        (
                            int(doc_id),
                            start,
                            f - start,
                            int(mat[start:f].sum()),
                        )
                    )
                    start = f
        yield pd.DataFrame(
            rows, columns=["doc_id", "shot_start", "n_frames", "pix_sum"]
        )


@register(
    "q_video_shots",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_DELTAS_DUCK} AS deltas FROM documents),
    frames AS (
        SELECT doc_id, r.f AS f,
               CAST(list_sum(list_transform(range(0, {_PX_PER_FRAME}), p ->
                   (doc_id * 11 + r.f * 17 + p * 5) % 256)) AS BIGINT)
                 AS fsum,
               CASE WHEN r.f = 0 THEN 0
                    WHEN deltas[r.f] > {_SHOT_TH} THEN 1 ELSE 0 END AS bnd
        FROM d CROSS JOIN range(0, {_N_FRAMES}) r(f)
    ), shotted AS (
        SELECT doc_id, f, fsum,
               CAST(SUM(bnd) OVER (PARTITION BY doc_id ORDER BY f)
                    AS BIGINT) AS shot_id
        FROM frames
    )
    SELECT doc_id,
           CAST(MIN(f) AS INT) AS shot_start,
           CAST(COUNT(*) AS INT) AS n_frames,
           CAST(SUM(fsum) AS BIGINT) AS pix_sum
    FROM shotted
    GROUP BY doc_id, shot_id
    ORDER BY doc_id, shot_start
    """,
    tags=("llm", "multimodal", "video"),
)
def q_video_shots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOT-BOUNDARY segmentation — the video twin of q_audio_vad's
    speech/silence map: a shot ends where the consecutive-frame pixel
    delta exceeds the motion threshold, and each shot reports its
    start frame, length, and integer pixel-byte sum (the features a
    sampling pipeline uses to pick one representative frame per
    shot). The synthetic frames step by +17 per byte mod 256, so a
    pair's delta is 204 + 222·wraps — the threshold at 600 (≥ 2
    wraps) yields a deterministic, doc-varying shot structure.

    Kernel segments during the REAL AVI decode (run-length in-stream,
    the q_audio_vad pattern); the oracle regenerates every pixel from
    the recurrence and derives the same shots relationally (boundary
    flags → cumulative shot ids → group): decode → delta → threshold
    → merge is pinned end-to-end by the driver hash.

    100 TB: Arrow-batched per-clip map, segments emit from the
    kernel, no shuffle; the relational twin shows the same algorithm
    over a decoded-frame TABLE when clips arrive pre-exploded.
    """
    from flink_rc_spark.util import ensure_package_shipped

    ensure_package_shipped(spark)
    docs = load(spark, sf_dir, "documents")
    flat = with_video_columns(docs).select("doc_id", "payload")
    flat = flat.repartition(spark.sparkContext.defaultParallelism)
    return flat.mapInPandas(_shots_batches, _SHOTS_SCHEMA).orderBy(
        "doc_id", "shot_start"
    )
