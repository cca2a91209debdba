"""[EXT] Multimodal columns: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so decode is a
deterministic fake behind the real Spark plumbing (BASELINE.json
mandate): binary column → Arrow-batched ``mapInPandas`` → typed
metadata rows. The fake metadata is pure integer math on doc_id and
byte length, so even the UDF path is oracle-checkable — the DuckDB
twin recomputes it relationally.

At scale the binary column rides in parquet alongside the text; the
UDF signature/batching here is exactly what a real decoder (PIL,
ffmpeg) would use via the same iterator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import load
from . import register

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("codec", T.StringType(), False),
        T.StructField("frame_w", T.LongType(), False),
        T.StructField("frame_h", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), False),
    ]
)

_MM_ORACLE = """
SELECT
  doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS codec,
  CAST(16 + doc_id % 64 AS BIGINT) AS frame_w,
  CAST(16 + (doc_id * 7) % 64 AS BIGINT) AS frame_h,
  CAST(1 + doc_id % 4 AS BIGINT) AS n_frames
FROM documents
"""


def fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Stand-in decoder: a real implementation would parse
    ``payload`` bytes here (PIL/ffmpeg). Raises on non-bytes input to
    keep the contract honest."""
    for pdf in batches:
        doc_ids = pdf["doc_id"].astype("int64")
        payloads = pdf["payload"]
        if len(payloads) and not isinstance(payloads.iloc[0], (bytes, bytearray)):
            raise NotImplementedError("payload must be a binary column")
        codecs = doc_ids % 3
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "n_bytes": payloads.map(len).astype("int64"),
                "codec": codecs.map({0: "png", 1: "jpeg", 2: "webp"}),
                "frame_w": (16 + doc_ids % 64).astype("int64"),
                "frame_h": (16 + (doc_ids * 7) % 64).astype("int64"),
                "n_frames": (1 + doc_ids % 4).astype("int64"),
            }
        )


@register("multimodal_decode_metadata", _MM_ORACLE)
def multimodal_decode_metadata(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    media = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return media.mapInPandas(fake_decode, MEDIA_META_SCHEMA)
