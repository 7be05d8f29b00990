"""Multimodal-column catalog entries (SURVEY §2.10).

``multimodal_metadata_stats`` is fully native (binary encode, octet_length,
md5) and oracle-checked. ``multimodal_decode_stub`` exercises the
mapInPandas decode plumbing — Python-stubbed codec, so rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import decode_media, to_media_column
from ..session import load_table
from .base import QueryDef


def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata aggregation over the binary payload column: per-mime
    count, total/max payload bytes, distinct digests."""
    media = to_media_column(load_table(spark, sf_dir, "documents"))
    return media.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_objects"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
        F.countDistinct("digest").alias("n_distinct_payloads"),
    )


MULTIMODAL_METADATA_SQL = """
WITH media AS (
  SELECT doc_id,
         CASE WHEN source IN ('src0','src1') THEN 'image/png'
              WHEN source = 'src2' THEN 'audio/wav'
              ELSE 'video/mp4' END AS mime,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS digest
  FROM documents
)
SELECT mime, COUNT(*) AS n_objects,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       MAX(n_bytes) AS max_bytes,
       COUNT(DISTINCT digest) AS n_distinct_payloads
FROM media GROUP BY mime
"""


def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode plumbing (stubbed codec — rows-only check):
    decoded dimension stats per mime."""
    media = to_media_column(load_table(spark, sf_dir, "documents"))
    decoded = decode_media(media)
    return decoded.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_decoded"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
        F.max("n_channels").alias("max_channels"),
    )


QUERIES: dict[str, QueryDef] = {
    "multimodal_metadata_stats": QueryDef(
        multimodal_metadata_stats, MULTIMODAL_METADATA_SQL, "multimodal: metadata agg"
    ),
    "multimodal_decode_stub": QueryDef(
        multimodal_decode_stub, None, "multimodal: mapInPandas decode plumbing (stub codec)"
    ),
}
