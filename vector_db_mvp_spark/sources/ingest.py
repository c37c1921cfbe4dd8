"""Text-format ingestion sources: JSONL and CSV document readers.

Parquet is the engine's native interchange (sources/testdata.py), but raw
corpora arrive as JSONL dumps and CSV exports. These readers wrap
``spark.read`` with the three things a pipeline must get right at scale:

- **Explicit schema, never inference.** Schema inference reads the data
  twice and silently unifies drifting types; at 100 TB that is a full extra
  pass and a correctness hazard. Readers here take (or default) a
  StructType and hand it to the scan, so malformed values fail *visibly*.
- **Corrupt-record capture, not crash / not silent drop.** PERMISSIVE mode
  with an explicit ``_corrupt_record`` column: bad lines land in a
  quarantine column the caller can count, sample, and sink — the standard
  dead-letter pattern. ``strict=True`` flips to FAILFAST for pipelines that
  prefer to die loudly.
- **Line-splittable formats.** JSONL (not multiline JSON arrays) and CSV
  split by newline, so a 1 TB file still fans out across executors;
  ``multiLine`` JSON/CSV would serialize each file into one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENT_INGEST_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

_CORRUPT = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    return StructType(list(schema.fields) + [StructField(_CORRUPT, StringType(), True)])


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema: StructType = DOCUMENT_INGEST_SCHEMA,
    strict: bool = False,
) -> DataFrame:
    """Read line-delimited JSON documents. Non-strict returns good rows plus
    a ``_corrupt_record`` column holding each unparseable line."""
    reader = spark.read.schema(_with_corrupt(schema) if not strict else schema)
    reader = reader.option("mode", "FAILFAST" if strict else "PERMISSIVE")
    if not strict:
        reader = reader.option("columnNameOfCorruptRecord", _CORRUPT)
    return reader.json(path)


def read_documents_csv(
    spark: SparkSession,
    path: str,
    *,
    schema: StructType = DOCUMENT_INGEST_SCHEMA,
    header: bool = True,
    strict: bool = False,
) -> DataFrame:
    """Read CSV documents with the same quarantine contract as JSONL."""
    reader = (
        spark.read.schema(_with_corrupt(schema) if not strict else schema)
        .option("header", header)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
    )
    if not strict:
        reader = reader.option("columnNameOfCorruptRecord", _CORRUPT)
    return reader.csv(path)


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined): good rows with the corrupt column dropped, and
    the dead-letter frame of raw unparseable lines.

    The parsed frame is cached first: Spark forbids a query that references
    ONLY ``_corrupt_record`` over raw JSON/CSV (the scan couldn't know which
    other columns to parse) — caching materializes the parse once, which is
    also what you want before reading the same ingest twice anyway."""
    df = df.cache()
    bad = df.filter(F.col(_CORRUPT).isNotNull()).select(_CORRUPT)
    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    return good, bad


def read_documents_orc(
    spark: SparkSession,
    path: str,
    *,
    schema: StructType = DOCUMENT_INGEST_SCHEMA,
) -> DataFrame:
    """Read ORC documents. ORC is self-describing columnar (like parquet):
    the schema argument enforces the expected shape at scan time (missing
    columns surface as analysis errors, not nulls at action time); there is
    no corrupt-line quarantine because row-level corruption is not
    representable in a columnar container — integrity failures surface as
    file-level read errors, the correct behavior for binary formats."""
    return spark.read.schema(schema).orc(path)


def write_documents_orc(df: DataFrame, path: str) -> None:
    """Write documents as ORC (predicate pushdown + column pruning work
    the same as parquet — Spark's OrcScan reports PushedFilters)."""
    df.write.mode("overwrite").orc(path)
