"""Audio-column support: real WAV (RIFF/PCM16) container codec plus
the decode query — the audio twin of the BMP/PNG/JPEG image path in
``llm/multimodal.py``.

The payload is a valid mono 16-bit WAV: a RIFF header built once for
the fixed geometry (64 samples @ 8 kHz) and 64 little-endian PCM16
samples derived from ``doc_id`` by pure integer arithmetic
(``(doc_id*7 + i*13) % 256``), constructed JVM-side so the oracle can
reproduce every decoded feature exactly — no float DSP anywhere in the
verified path. The decode kernel walks RIFF chunks for real (fmt +
data, skipping unknown chunks) and would decode any PCM16 WAV, not
just the synthetic ones.

Scale notes (100 TB of audio): same playbook as images — payloads
pruned unless needed (columnar parquet), decode streamed per Arrow
batch via ``mapInPandas`` (never a whole partition of decoded sample
arrays in memory), features written to a narrow table. Real feature
extraction (spectrograms, VAD, resampling) plugs into the same kernel
signature; the container parsing below is the genuine article.

Reference parity: none — the reference is numeric-vector-only
(SURVEY.md §1.1); driver-north-star multimodal surface.
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


# ---------------------------------------------------------------------------
# WAV codec (stdlib struct + numpy; no external audio libs in container)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 samples (mono ``(n,)`` or ``(n, ch)``) as a
    canonical RIFF/WAVE PCM16 container."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    block_align = ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, block_align, 16
    )
    data_hdr = struct.pack("<4sI", b"data", len(data))
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data_hdr) + len(data), b"WAVE")
    return riff + fmt + data_hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE container: returns (samples ``(n, ch)`` int16,
    sample_rate). Walks chunks for real — unknown chunks (LIST, fact,
    cue…) are skipped by their declared size, so files from other
    writers parse too. PCM16 only (format tag 1, 16 bits)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = None
    channels = None
    data = None
    while pos + 8 <= len(payload):
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        body = payload[pos : pos + csize]
        if cid == b"fmt ":
            tag, channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag != 1 or bits != 16:
                raise ValueError(f"unsupported WAV format tag={tag} bits={bits}")
        elif cid == b"data":
            data = body
        pos += csize + (csize & 1)  # RIFF chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    samples = np.frombuffer(data, dtype="<i2").reshape(-1, channels)
    return samples, sample_rate


# ---------------------------------------------------------------------------
# q_audio_decode — binary WAV column -> mapInPandas decode -> features
# ---------------------------------------------------------------------------

_N_SAMPLES = 64
_SR = 8000
# header is constant for the fixed geometry — built by the same encoder
# the tests roundtrip, then inlined as a binary literal (BMP idiom)
_WAV_HEADER = encode_wav(np.zeros(_N_SAMPLES, dtype=np.int16), _SR)[:44]
_WAV_SIZE = 44 + 2 * _N_SAMPLES

# sample i = (doc_id*7 + i*13) % 256 — non-negative int16, so its LE
# encoding is (low byte, 0x00) and the JVM can emit it with hex/unhex
_SAMPLES_SPARK = (
    f"transform(sequence(0, {_N_SAMPLES - 1}), "
    "i -> concat(lpad(hex((doc_id * 7 + i * 13) % 256), 2, '0'), '00'))"
)
_SAMPLES_DUCK = f"list_transform(range(0, {_N_SAMPLES}), i -> (doc_id * 7 + i * 13) % 256)"


def with_audio_columns(docs: DataFrame) -> DataFrame:
    """Attach a REAL WAV payload + typed metadata struct, constructed
    entirely JVM-side (header literal + unhex'd sample bytes)."""
    payload = F.concat(
        F.lit(bytearray(_WAV_HEADER)),
        F.unhex(F.concat_ws("", F.expr(_SAMPLES_SPARK))),
    )
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(_SR).alias("sample_rate"),
            F.lit(_N_SAMPLES).alias("n_samples"),
            F.lit("wav").alias("format"),
        ).alias("meta"),
    )


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("amp_sum", T.LongType()),
        T.StructField("amp_max", T.IntegerType()),
    ]
)


def _audio_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas decode kernel: parse each RIFF container, derive
    sample_rate/n_samples from the DECODED stream (not trusted
    metadata), and fold the samples into integer features."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        srs, ns, sums, maxs = [], [], [], []
        for payload in pdf["payload"]:
            samples, sr = decode_wav(bytes(payload))
            srs.append(sr)
            ns.append(samples.shape[0])
            sums.append(int(samples.sum()))
            maxs.append(int(np.abs(samples).max()) if samples.size else 0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "sample_rate": pd.Series(srs, dtype="int32"),
                "n_samples": pd.Series(ns, dtype="int32"),
                "amp_sum": pd.Series(sums, dtype="int64"),
                "amp_max": pd.Series(maxs, dtype="int32"),
            }
        )


@register(
    "q_audio_decode",
    oracle=f"""
    SELECT doc_id,
           CAST({_WAV_SIZE} AS INT) AS n_bytes,
           CAST({_SR} AS INT) AS sample_rate,
           CAST({_N_SAMPLES} AS INT) AS n_samples,
           CAST(list_sum({_SAMPLES_DUCK}) AS BIGINT) AS amp_sum,
           CAST(list_max({_SAMPLES_DUCK}) AS INT) AS amp_max
    FROM documents
    ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def q_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary audio column -> mapInPandas REAL WAV decode -> features.

    The payload is a valid RIFF/PCM16 WAV built JVM-side; the kernel
    walks the chunk structure and derives every output from the decoded
    sample stream. The oracle reproduces amp_sum/amp_max from the same
    integer recurrence the samples were built from, verifying the full
    bytes -> parser -> feature path with an exact hash. Same 100 TB
    shape as image decode: pruned 2-column scan, Arrow-batched kernel,
    no shuffle.
    """
    from flink_rc_spark.util import ensure_package_shipped

    ensure_package_shipped(spark)
    docs = load(spark, sf_dir, "documents")
    audio = with_audio_columns(docs)
    flat = audio.select("doc_id", "payload")
    # single-file local scan -> one split; spread the Python decode
    # across cores (see q_multimodal_formats' note — same economics)
    flat = flat.repartition(spark.sparkContext.defaultParallelism)
    return flat.mapInPandas(_audio_batches, _AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# q_audio_resample — sample-rate halving (the audio resize)
# ---------------------------------------------------------------------------

_RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate_out", T.IntegerType()),
        T.StructField("n_samples_out", T.IntegerType()),
        T.StructField("amp_sum_ds", T.LongType()),
        T.StructField("amp_max_ds", T.IntegerType()),
    ]
)


def _resample_batches(batches):
    """mapInPandas kernel: REAL WAV parse, then 2:1 downsample by
    pair-averaging with integer round-half-up ((a + b + 1) // 2 —
    samples are non-negative here, where floor ≡ the oracle's //).
    The integer box filter is the audio twin of q_multimodal_resize's
    pixel filter: exact, so the downsampled features hash-match."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        sums, maxs, ns, srs = [], [], [], []
        for payload in pdf["payload"]:
            samples, sr = decode_wav(bytes(payload))
            # Channel 0 only (fixture WAVs are mono; a multi-channel
            # input downsamples its first channel, documented rather
            # than silent), truncated to an even sample count so the
            # pair-average below never hits a numpy broadcast error
            # on an odd-length clip.
            mono = samples[:, 0].astype(np.int64)
            mono = mono[: len(mono) // 2 * 2]
            ds = (mono[0::2] + mono[1::2] + 1) // 2
            sums.append(int(ds.sum()))
            # a clip decoding to < 2 samples yields an empty ds —
            # emit amplitude 0 rather than tripping ds.max() on an
            # empty array (fixture clips are longer; the guard keeps
            # the kernel total on arbitrary WAV inputs)
            maxs.append(int(ds.max()) if len(ds) else 0)
            ns.append(len(ds))
            srs.append(sr // 2)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "sample_rate_out": pd.Series(srs, dtype="int32"),
                "n_samples_out": pd.Series(ns, dtype="int32"),
                "amp_sum_ds": pd.Series(sums, dtype="int64"),
                "amp_max_ds": pd.Series(maxs, dtype="int32"),
            }
        )


@register(
    "q_audio_resample",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               list_transform(range(0, {_N_SAMPLES // 2}), j ->
                   ((doc_id * 7 + (2*j) * 13) % 256
                    + (doc_id * 7 + (2*j + 1) * 13) % 256 + 1) // 2) AS ds
        FROM documents
    )
    SELECT doc_id,
           CAST({_SR // 2} AS INT) AS sample_rate_out,
           CAST({_N_SAMPLES // 2} AS INT) AS n_samples_out,
           CAST(list_sum(ds) AS BIGINT) AS amp_sum_ds,
           CAST(list_max(ds) AS INT) AS amp_max_ds
    FROM s
    ORDER BY doc_id
    """,
    tags=("llm", "multimodal", "audio"),
)
def q_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio RESAMPLING (8 kHz → 4 kHz by exact 2:1 pair-averaging)
    fused with the WAV parse in one mapInPandas pass — the audio
    member of the media-prep quartet beside q_multimodal_resize: a
    speech pipeline downsamples before feature extraction exactly
    like this. The oracle recomputes the downsampled stream from the
    generating recurrence ((doc_id·7 + i·13) mod 256), so the hash
    proves container walk + channel deinterleave + the integer
    decimation filter end-to-end. Same Arrow streaming economics as
    every media kernel here.
    """
    from flink_rc_spark.util import ensure_package_shipped

    ensure_package_shipped(spark)
    docs = load(spark, sf_dir, "documents")
    flat = with_audio_columns(docs).select("doc_id", "payload")
    flat = flat.repartition(spark.sparkContext.defaultParallelism)
    return flat.mapInPandas(_resample_batches, _RESAMPLE_SCHEMA).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q_source_binaryfile — file-per-object ingestion via the binaryFile source
# ---------------------------------------------------------------------------

_BINFILE_DOCS = 32  # doc_id < 32 => bounded, present at every SF

def _binaryfile_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize one REAL .wav file per doc (doc_id < _BINFILE_DOCS)
    into a cached temp dir — the on-disk stand-in for an object-store
    bucket of media files. The bytes are the SAME deterministic
    payloads with_audio_columns builds JVM-side, written by the
    tested encoder, so the columnar path and the file path must agree
    byte-for-byte. Cached per (process, sf_dir) with atexit cleanup
    via cached_fixture_dir (no temp-dir leak in a long-lived driver)."""
    import os

    from flink_rc_spark.util import cached_fixture_dir

    def build(d: str) -> None:
        ids = [
            r.doc_id
            for r in load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < _BINFILE_DOCS)
            .select("doc_id")
            .collect()  # bounded planning-time collect (<= 32 rows)
        ]
        for doc_id in ids:
            samples = np.array(
                [(doc_id * 7 + i * 13) % 256 for i in range(_N_SAMPLES)],
                dtype=np.int16,
            )
            with open(os.path.join(d, f"audio_{doc_id:08d}.wav"), "wb") as f:
                f.write(encode_wav(samples, _SR))
        # a decoy non-wav file the glob filter must skip
        with open(os.path.join(d, "README.txt"), "wb") as f:
            f.write(b"not audio")

    return cached_fixture_dir("binfiles", sf_dir.rstrip("/"), build)


@register(
    "q_source_binaryfile",
    oracle=f"""
    SELECT doc_id,
           CAST({_WAV_SIZE} AS INT) AS n_bytes,
           CAST({_SR} AS INT) AS sample_rate,
           CAST({_N_SAMPLES} AS INT) AS n_samples,
           CAST(list_sum({_SAMPLES_DUCK}) AS BIGINT) AS amp_sum,
           CAST(list_max({_SAMPLES_DUCK}) AS INT) AS amp_max
    FROM documents
    WHERE doc_id < {_BINFILE_DOCS}
    ORDER BY doc_id
    """,
    tags=("llm", "multimodal", "source"),
)
def q_source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-PER-OBJECT multimodal ingestion — Spark's ``binaryFile``
    source, the idiomatic way to read a bucket of media files at
    scale: each row is (path, modificationTime, length, content), the
    key is parsed from the path, a pathGlobFilter prunes non-media
    files at LISTING time (a decoy README.txt is planted and must
    never reach the kernel), and the content column feeds the same
    RIFF decode kernel as the columnar path (q_audio_decode). The
    oracle is the generating recurrence, so the hash proves
    listing -> glob filter -> bytes -> path-key parse -> decode
    end-to-end, and that file-shaped and column-shaped ingestion
    agree exactly.

    100 TB: binaryFile parallelizes over files (one task per file
    group), pushes the glob into the listing, and never materializes
    payloads on the driver; the usual pipeline is exactly this — read
    files, decode/feature-extract per Arrow batch, write a NARROW
    parquet table, after which everything downstream is columnar.
    """
    from flink_rc_spark.util import ensure_package_shipped

    ensure_package_shipped(spark)
    d = _binaryfile_dir(spark, sf_dir)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .load(d)
        .select(
            F.regexp_extract(F.col("path"), r"audio_(\d+)\.wav$", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("content").alias("payload"),
        )
    )
    files = files.repartition(spark.sparkContext.defaultParallelism)
    return files.mapInPandas(_audio_batches, _AUDIO_SCHEMA).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q_audio_vad — frame-energy voice-activity detection over real decodes
# ---------------------------------------------------------------------------

_VAD_FRAME = 8  # 8 samples/frame @ 8 kHz -> 1 ms frames, 8 per clip
_VAD_THRESHOLD = _VAD_FRAME * 127 * 127  # frame active iff energy > this

_VAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("seg_start", T.IntegerType()),
        T.StructField("seg_len", T.IntegerType()),
        T.StructField("seg_energy", T.LongType()),
    ]
)


def _vad_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas VAD kernel: REAL RIFF decode, integer frame energy
    (sum of squared PCM16 samples per 8-sample frame), threshold, and
    run-length merge of consecutive active frames into segments — the
    classic energy-gate VAD, no float DSP anywhere."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples, _sr = decode_wav(bytes(payload))
            s = samples.reshape(-1).astype(np.int64)
            frames = s.reshape(-1, _VAD_FRAME)
            energy = (frames * frames).sum(axis=1)
            active = energy > _VAD_THRESHOLD
            start = None
            for f in range(len(active) + 1):
                on = f < len(active) and active[f]
                if on and start is None:
                    start = f
                elif not on and start is not None:
                    rows.append(
                        (
                            int(doc_id),
                            start,
                            f - start,
                            int(energy[start:f].sum()),
                        )
                    )
                    start = None
        yield pd.DataFrame(
            rows, columns=["doc_id", "seg_start", "seg_len", "seg_energy"]
        )


@register(
    "q_audio_vad",
    oracle=f"""
    WITH frames AS (
        SELECT doc_id, r.f AS f,
               CAST(list_sum(list_transform(range(0, {_VAD_FRAME}), j ->
                   ((doc_id * 7 + (r.f * {_VAD_FRAME} + j) * 13) % 256)
                   * ((doc_id * 7 + (r.f * {_VAD_FRAME} + j) * 13) % 256)))
                   AS BIGINT) AS energy
        FROM documents
        CROSS JOIN range(0, {_N_SAMPLES // _VAD_FRAME}) r(f)
    ),
    active AS (
        SELECT doc_id, f, energy,
               f - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f) AS grp
        FROM frames WHERE energy > {_VAD_THRESHOLD}
    )
    SELECT doc_id,
           CAST(MIN(f) AS INT) AS seg_start,
           CAST(COUNT(*) AS INT) AS seg_len,
           CAST(SUM(energy) AS BIGINT) AS seg_energy
    FROM active
    GROUP BY doc_id, grp
    ORDER BY doc_id, seg_start
    """,
    tags=("llm", "multimodal", "audio"),
)
def q_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOICE-ACTIVITY DETECTION — the energy-gate VAD every speech
    corpus pipeline runs before transcription: per clip, frames of
    8 PCM16 samples are scored by integer energy (sum of
    squares), gated at a fixed threshold, and consecutive active
    frames merge into SEGMENTS (start, length, energy) — the
    speech/silence map that decides what gets transcribed, chunked,
    or dropped.

    The kernel decodes the RIFF container for real (the q_audio_decode
    walker) and merges runs in-stream; the oracle regenerates every
    sample from the doc_id recurrence and derives the SAME segments
    relationally (gaps-and-islands over active frames, the
    q_dedup_substring interval idiom) — integer end-to-end, so the
    hash pins decode -> framing -> energy -> threshold -> merge
    exactly.

    100 TB: per-clip work is an Arrow-batched map with NO shuffle —
    segments emit directly from the kernel; real deployments only grow
    the constants (25 ms frames, noise-floor-adaptive thresholds,
    hangover smoothing — all the same integer per-clip loop).
    """
    from flink_rc_spark.util import ensure_package_shipped

    ensure_package_shipped(spark)
    docs = load(spark, sf_dir, "documents")
    media = with_audio_columns(docs).select("doc_id", "payload")
    media = media.repartition(spark.sparkContext.defaultParallelism)
    return media.mapInPandas(_vad_batches, _VAD_SCHEMA).orderBy(
        "doc_id", "seg_start"
    )


# ---------------------------------------------------------------------------
# q_audio_fingerprint — landmark-hash audio matching (Shazam-style)
# ---------------------------------------------------------------------------

_FP_MAX_DT = 4  # landmark pairs at most 4 frames apart
_FP_DOC_CAP = 2000  # fixed matching sample (flat across SF by design)

_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fp", T.LongType()),
    ]
)


def _fingerprint_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas landmark-hash kernel: REAL RIFF decode, integer
    frame energies, strict-left/loose-right local-maximum peaks, and
    peak-pair landmarks hashed as ((e1%256)*256 + e2%256)*8 + dt —
    the constellation-map fingerprint (Wang 2003) with energy peaks
    standing in for spectrogram peaks (no FFT dependency, integer
    end-to-end)."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples, _sr = decode_wav(bytes(payload))
            s = samples.reshape(-1).astype(np.int64)
            energy = (s.reshape(-1, _VAD_FRAME) ** 2).sum(axis=1)
            peaks = [
                f
                for f in range(1, len(energy) - 1)
                if energy[f] > energy[f - 1] and energy[f] >= energy[f + 1]
            ]
            fps = set()
            for i, f1 in enumerate(peaks):
                for f2 in peaks[i + 1 :]:
                    dt = f2 - f1
                    if dt > _FP_MAX_DT:
                        break
                    fps.add(
                        int(
                            ((energy[f1] % 256) * 256 + energy[f2] % 256) * 8
                            + dt
                        )
                    )
            rows.extend((int(doc_id), fp) for fp in sorted(fps))
        yield pd.DataFrame(rows, columns=["doc_id", "fp"])


@register(
    "q_audio_fingerprint",
    oracle=f"""
    WITH frames AS (
        SELECT doc_id, r.f AS f,
               CAST(list_sum(list_transform(range(0, {_VAD_FRAME}), j ->
                   ((doc_id * 7 + (r.f * {_VAD_FRAME} + j) * 13) % 256)
                   * ((doc_id * 7 + (r.f * {_VAD_FRAME} + j) * 13) % 256)))
                   AS BIGINT) AS energy
        FROM documents
        CROSS JOIN range(0, {_N_SAMPLES // _VAD_FRAME}) r(f)
        WHERE doc_id < {_FP_DOC_CAP}
    ),
    peaks AS (
        SELECT doc_id, f, energy
        FROM (
            SELECT doc_id, f, energy,
                   LAG(energy) OVER (PARTITION BY doc_id ORDER BY f) AS ep,
                   LEAD(energy) OVER (PARTITION BY doc_id ORDER BY f) AS en
            FROM frames
        )
        WHERE ep IS NOT NULL AND en IS NOT NULL
          AND energy > ep AND energy >= en
    ),
    fps AS (
        SELECT DISTINCT a.doc_id,
               ((a.energy % 256) * 256 + b.energy % 256) * 8
                 + (b.f - a.f) AS fp
        FROM peaks a JOIN peaks b
          ON a.doc_id = b.doc_id AND b.f > a.f
         AND b.f - a.f <= {_FP_MAX_DT}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 2
    """,
    tags=("llm", "multimodal", "audio"),
)
def q_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO FINGERPRINT MATCHING — the landmark-hash (constellation)
    scheme behind audio dedup/content-ID: per clip, energy PEAKS
    (strict-left/loose-right local maxima over the VAD frame energies)
    pair into time-anchored landmarks hashed as
    ((e₁%256)·256 + e₂%256)·8 + Δt; clips sharing ≥ 2 distinct
    landmark hashes are reported as matches.

    The kernel decodes the RIFF container for real; the oracle
    regenerates every sample from the doc_id recurrence and derives
    the SAME peaks (lag/lead window), landmarks, and matches
    relationally — integer end-to-end, so the hash pins decode →
    framing → peak-picking → landmark hashing → inverted-index join.
    Matching is scoped to the fixed doc_id < 2000 sample (the
    q_dedup_embedding block-scope idiom): the toy 8-frame clips make
    residue-class clips IDENTICAL, so unscoped match volume grows
    n² by construction (the q_image_ahash effect, documented there).

    100 TB: fingerprint extraction is an Arrow-batched per-clip map
    (no shuffle, linear); matching is the inverted-index equi-join on
    fp — the q_dedup_minhash band-join shape, collisions only, never
    pairwise. Production changes only the peak domain (spectrogram
    bins via FFT) and the hash width.
    """
    from flink_rc_spark.util import ensure_package_shipped

    ensure_package_shipped(spark)
    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _FP_DOC_CAP
    )
    media = with_audio_columns(docs).select("doc_id", "payload")
    media = media.repartition(spark.sparkContext.defaultParallelism)
    fps = media.mapInPandas(_fingerprint_batches, _FP_SCHEMA)
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
