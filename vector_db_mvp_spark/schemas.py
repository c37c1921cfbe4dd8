"""Explicit StructType schemas — never inferred (SURVEY.md §1.3: the reference
validates every entity with Pydantic ``extra="forbid"``; our analog is explicit
schemas enforced on every write).

Entity model mirrors reference ``app/models/{library,document,chunk}.py``:
Library -> Document -> Chunk normalized into a star, with the chunks fact table
carrying the denormalized ``library_id`` exactly like the reference's internal
``Row`` record (``app/indexing/base.py:7-18``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- Core vector-db entity tables (reference app/models/*) -------------------

LIBRARY_SCHEMA = StructType(
    [
        StructField("library_id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("description", StringType(), True),
        StructField("tags", StringType(), True),  # comma-separated by convention
        StructField("created_at", TimestampType(), False),
        StructField("updated_at", TimestampType(), False),
        # Monotonic write counter (reference app/models/library.py:12-15);
        # bumped on every contained write, returned with search results.
        StructField("version", IntegerType(), False),
    ]
)

DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("library_id", StringType(), False),
        StructField("title", StringType(), False),
        StructField("category", StringType(), True),
        StructField("created_at", TimestampType(), False),
        StructField("updated_at", TimestampType(), False),
    ]
)

CHUNK_SCHEMA = StructType(
    [
        StructField("chunk_id", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("library_id", StringType(), False),  # denormalized FK
        StructField("text", StringType(), False),
        StructField("embedding", ArrayType(FloatType()), True),  # nullable (chunk.py:16)
        StructField("meta_type", StringType(), True),
        StructField("created_at", TimestampType(), False),
        StructField("updated_at", TimestampType(), False),
    ]
)

# Flattened search-row shape (reference app/indexing/base.py:7-18).
SEARCH_ROW_COLUMNS = ["chunk_id", "doc_id", "library_id", "text", "meta_type", "embedding"]

# --- Driver-provided fixture tables (/root/testdata/sf*/, TESTDATA.md) -------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)
