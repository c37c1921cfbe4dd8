"""Multimodal workload: binary-column metadata projection with a DuckDB
oracle (codec-free stage), plus the rows-only decode/feature queries (the
stubbed-codec stages are Python-side by design -> weaker driver check)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import (
    decode_media,
    extract_features,
    media_from_documents,
    media_metadata,
)
from ..sources.testdata import load_table


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return media_metadata(media).orderBy("media_id")


SQL_MEDIA_METADATA = """
SELECT doc_id AS media_id,
       (['image', 'audio', 'video'])[doc_id % 3 + 1] AS kind,
       octet_length(encode(text)) AS n_bytes,
       substr(hex(encode(text)), 1, 8) AS magic_hex
FROM documents ORDER BY media_id
"""


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check: decode goes through the stubbed codec (mapInPandas),
    deliberately not SQL-expressible."""
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return decode_media(media).orderBy("media_id")


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check: sha-seeded stub embedder via mapInPandas."""
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return extract_features(media).orderBy("media_id")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "media_metadata": q_media_metadata,
    "media_decode": q_media_decode,
    "media_features": q_media_features,
}

ORACLE_SQL: dict[str, str] = {
    "media_metadata": SQL_MEDIA_METADATA,
}
