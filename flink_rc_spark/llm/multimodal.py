"""Multimodal-column plumbing (driver north star: image/audio/video as
opaque binary columns with typed metadata).

The container has no codec libraries (PIL/torchaudio/ffmpeg), so the
*decode* step is stubbed: `decode_image` raises NotImplementedError
unless a real decoder import succeeds, and the declared query runs the
clearly-marked deterministic fake path. Everything Spark-side is real
and tested: the binary column type, the metadata struct, the
`mapInPandas` batch signature (Arrow `bytes` objects in/out), the
partitioning story, and an exact oracle.

Payload construction: each document gets a synthetic 16-byte payload
`unhex(md5(text))` — a stand-in for image bytes that is deterministic
and identical in both engines. The fake "decode" computes brightness =
sum of payload bytes, which the oracle reproduces from the md5 hex
string (byte i == 16*hexval(2i-1) + hexval(2i)), proving the
Python-side byte handling end-to-end against SQL.

Scale notes (100 TB of media): binary payloads dominate row size, so
the scan path must (a) prune the payload column unless the query needs
it — columnar parquet gives that for free; (b) cap
`spark.sql.files.maxPartitionBytes` so a partition of wide rows fits
executor memory; (c) run decode as `mapInPandas` so bytes stream
through Arrow per-batch, never materializing a whole partition of
decoded tensors; (d) write decoded features to a separate narrow table
rather than carrying them beside the payload.

Reference parity: none — the reference is numeric-vector-only
(SURVEY.md §1.1); mandated by the driver's north star.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_rc_spark.registry import register
from flink_rc_spark.sources.tables import load

try:  # real decoder path — not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode real image bytes to an HxWxC array. STUB: the container
    ships no codec; a deployment with PIL installed takes the real
    branch unchanged."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL; use fake_decode_brightness for the "
            "deterministic test path"
        )
    import io

    return np.asarray(Image.open(io.BytesIO(payload)))  # pragma: no cover


def fake_decode_brightness(payload: bytes) -> int:
    """Deterministic fake decode: 'brightness' = sum of payload bytes."""
    return int(np.frombuffer(payload, dtype=np.uint8).sum())


def with_media_columns(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload + typed metadata struct.

    Metadata derives deterministically from existing columns the way a
    real ingest would parse container headers: width/height from
    n_chars, format from the source shard.
    """
    return docs.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        F.struct(
            (F.col("n_chars") % 64 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 48 + 12).cast("int").alias("height"),
            F.when(F.col("source") < "src2", "png").otherwise("jpeg").alias("format"),
        ).alias("meta"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("brightness", T.LongType()),
    ]
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas decode kernel: Arrow hands payloads as bytes; emit
    one feature row per media row. The real decoder would call
    decode_image here; the fake path exercises identical plumbing."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
                "format": pdf["format"],
                "brightness": pdf["payload"]
                .map(fake_decode_brightness)
                .astype("int64"),
            }
        )


@register(
    "q_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(unhex(md5(text))) AS INT) AS n_bytes,
           CAST(n_chars % 64 + 16 AS INT) AS width,
           CAST(n_chars % 48 + 12 AS INT) AS height,
           CASE WHEN source < 'src2' THEN 'png' ELSE 'jpeg' END AS format,
           CAST(list_sum(list_transform(range(1, 17), i ->
                (strpos('0123456789abcdef', substr(md5(text), 2*i-1, 1)) - 1) * 16
                + strpos('0123456789abcdef', substr(md5(text), 2*i, 1)) - 1))
                AS BIGINT) AS brightness
    FROM documents
    ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column -> mapInPandas decode -> typed feature rows.

    The Spark plumbing is real (BinaryType column, metadata struct,
    Arrow-batched decode kernel, narrow feature output); the codec is
    the documented stub. The oracle reproduces the byte-sum feature
    from the md5 hex string, verifying Python-side byte handling
    exactly.
    """
    docs = load(spark, sf_dir, "documents")
    media = with_media_columns(docs)
    flat = media.select(
        "doc_id", "payload", "meta.width", "meta.height", "meta.format"
    )
    return flat.mapInPandas(_decode_batches, _DECODE_SCHEMA).orderBy("doc_id")
