"""Multimodal-column support (driver north star: image/audio/video as
opaque binary columns with typed metadata).

The decode path is REAL end-to-end: each document carries an actual
24-bit BMP payload (2x2 RGB, pixels derived from md5(text) so both
engines can reproduce them), constructed JVM-side as
``concat(<54-byte header literal>, unhex(...), padding)`` and decoded
in an Arrow-batched ``mapInPandas`` kernel by the pure-Python codec in
``llm/codec.py`` (no PIL, no NotImplementedError). The oracle
recomputes the brightness feature — the sum of all decoded pixel
components — directly from the md5 hex string: the 12 pixel bytes are
md5 bytes 1..12, and BMP row padding is excluded by the decoder, so
``brightness == sum(md5_bytes[0:12])`` exactly.

Scale notes (100 TB of media): binary payloads dominate row size, so
the scan path must (a) prune the payload column unless the query needs
it — columnar parquet gives that for free; (b) cap
``spark.sql.files.maxPartitionBytes`` so a partition of wide rows fits
executor memory; (c) run decode as ``mapInPandas`` so bytes stream
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

from flink_rc_spark.llm.codec import decode_image, encode_bmp
from flink_rc_spark.registry import register
from flink_rc_spark.sources.tables import load

# 2x2 24-bit BMP: 54-byte header + 2 rows of (6 pixel bytes + 2 pad).
# The header is constant for the fixed geometry — computed once via the
# same encoder the tests roundtrip, then inlined as a binary literal.
_W = _H = 2
_BMP_HEADER = encode_bmp(np.zeros((_H, _W, 3), dtype=np.uint8))[:54]
_BMP_SIZE = 54 + 2 * 8  # 70 bytes


def with_media_columns(docs: DataFrame) -> DataFrame:
    """Attach a REAL image payload + typed metadata struct.

    The payload is a valid 2x2 24-bit BMP whose 12 pixel bytes are
    md5(text) bytes 1..12 — deterministic, reproducible in SQL, and
    decodable by any BMP reader. Metadata mirrors what an ingest would
    parse from the container header.
    """
    md5 = F.md5("text")
    payload = F.concat(
        F.lit(bytearray(_BMP_HEADER)),
        F.unhex(F.substring(md5, 1, 12)),  # bottom row: 6 bytes
        F.lit(bytearray(b"\x00\x00")),  # row padding to 4 bytes
        F.unhex(F.substring(md5, 13, 12)),  # top row: 6 bytes
        F.lit(bytearray(b"\x00\x00")),
    )
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(_W).alias("width"),
            F.lit(_H).alias("height"),
            F.lit("bmp").alias("format"),
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
    """mapInPandas decode kernel: Arrow hands payloads as bytes; the
    pure-Python codec parses the container for real, and width/height
    come from the DECODED array (not trusted metadata)."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        widths, heights, brightness = [], [], []
        for payload in pdf["payload"]:
            arr = decode_image(bytes(payload))
            heights.append(arr.shape[0])
            widths.append(arr.shape[1])
            brightness.append(int(arr.sum()))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "width": pd.Series(widths, dtype="int32"),
                "height": pd.Series(heights, dtype="int32"),
                "format": pdf["format"],
                "brightness": pd.Series(brightness, dtype="int64"),
            }
        )


@register(
    "q_multimodal_decode",
    oracle=f"""
    SELECT doc_id,
           CAST({_BMP_SIZE} AS INT) AS n_bytes,
           CAST({_W} AS INT) AS width,
           CAST({_H} AS INT) AS height,
           'bmp' AS format,
           CAST(list_sum(list_transform(range(1, 13), i ->
                (strpos('0123456789abcdef', substr(md5(text), 2*i-1, 1)) - 1) * 16
                + strpos('0123456789abcdef', substr(md5(text), 2*i, 1)) - 1))
                AS BIGINT) AS brightness
    FROM documents
    ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column -> mapInPandas REAL decode -> feature rows.

    The payload is a valid BMP built JVM-side; the kernel parses it
    with the pure-Python codec and derives width/height/brightness from
    the decoded pixel array. The oracle reproduces brightness from the
    md5 hex (pixel bytes = md5 bytes 1..12; decoder excludes row
    padding), verifying the full bytes -> parser -> feature path.
    """
    docs = load(spark, sf_dir, "documents")
    media = with_media_columns(docs)
    flat = media.select(
        "doc_id", "payload", "meta.width", "meta.height", "meta.format"
    )
    # No output sort: the driver compare is order-insensitive, and a
    # global Sort after mapInPandas is a full extra shuffle at scale
    # (same waste class removed from q_dedup_simhash).
    return flat.mapInPandas(_decode_batches, _DECODE_SCHEMA)
