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
