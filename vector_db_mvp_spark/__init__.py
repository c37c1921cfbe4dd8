"""vector_db_mvp_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference vector-db MVP
(bmallikanti/vector_db_mvp), re-expressed Spark-first.

Design stance (SURVEY.md §7): normalized star of DataFrames
(libraries / documents / chunks), declarative DataFrame plans for every query,
Catalyst + Tungsten for physical execution, vectorized Arrow/Pandas UDFs only
where built-in expressions genuinely cannot express the semantics (LSH bucket
hashing over wide vectors), and partition-by-library_id layouts sized for a
multi-executor 100 TB deployment even though tests run on local[32].
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level exports: keep `import vector_db_mvp_spark` free of the
    # pyspark import cost until a symbol is actually touched.
    _exports = {
        "EntityStore": ("vector_db_mvp_spark.storage.store", "EntityStore"),
        "ChunkIndexStore": ("vector_db_mvp_spark.storage.index_store", "ChunkIndexStore"),
        "SearchEngine": ("vector_db_mvp_spark.engine", "SearchEngine"),
        "VectorDbApi": ("vector_db_mvp_spark.api", "VectorDbApi"),
        "InteractiveApi": ("vector_db_mvp_spark.api", "InteractiveApi"),
        "QueryPipeline": ("vector_db_mvp_spark.plans.pipeline", "QueryPipeline"),
        "DurableQueryPipeline": ("vector_db_mvp_spark.plans.pipeline", "DurableQueryPipeline"),
        "get_spark": ("vector_db_mvp_spark.session", "get_spark"),
        "connected_components": ("vector_db_mvp_spark.operators.cluster", "connected_components"),
        "dedup_clusters": ("vector_db_mvp_spark.operators.cluster", "dedup_clusters"),
        "build_served_index": ("vector_db_mvp_spark.operators.served", "build_served_index"),
        "lsh_topk_served": ("vector_db_mvp_spark.operators.served", "lsh_topk_served"),
        "salted_join": ("vector_db_mvp_spark.operators.skew", "salted_join"),
        "salted_two_phase_agg": ("vector_db_mvp_spark.operators.skew", "salted_two_phase_agg"),
        "dedup_stream_exact": ("vector_db_mvp_spark.streaming.dedup_stream", "dedup_stream_exact"),
        "NearDupIngest": ("vector_db_mvp_spark.streaming.neardup_stream", "NearDupIngest"),
        "pii_scan": ("vector_db_mvp_spark.operators.pii", "pii_scan"),
        "pii_redact": ("vector_db_mvp_spark.operators.pii", "pii_redact"),
        "quality_rules": ("vector_db_mvp_spark.operators.quality", "quality_rules"),
        "line_dedup": ("vector_db_mvp_spark.operators.linededup", "line_dedup"),
        "pack_documents": ("vector_db_mvp_spark.operators.packing", "pack_documents"),
        "build_dedup_state": ("vector_db_mvp_spark.operators.incremental", "build_dedup_state"),
        "incremental_minhash_pairs": ("vector_db_mvp_spark.operators.incremental", "incremental_minhash_pairs"),
        "publish_dedup_state_table": ("vector_db_mvp_spark.operators.incremental", "publish_dedup_state_table"),
        "incremental_minhash_pairs_table": ("vector_db_mvp_spark.operators.incremental", "incremental_minhash_pairs_table"),
        "temperature_mix": ("vector_db_mvp_spark.operators.mixing", "temperature_mix"),
        "random_projection": ("vector_db_mvp_spark.operators.project", "random_projection"),
        "projected_prefilter_topk": ("vector_db_mvp_spark.operators.project", "projected_prefilter_topk"),
        "chunk_documents": ("vector_db_mvp_spark.operators.chunking", "chunk_documents"),
        "decontaminate_train": ("vector_db_mvp_spark.operators.textops", "decontaminate_train"),
        "compact_dedup_state": ("vector_db_mvp_spark.operators.incremental", "compact_dedup_state"),
        "assign_shards": ("vector_db_mvp_spark.sinks.shards", "assign_shards"),
        "write_training_shards": ("vector_db_mvp_spark.sinks.shards", "write_training_shards"),
    }
    if name in _exports:
        import importlib

        module, attr = _exports[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
