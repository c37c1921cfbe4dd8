"""Persisted chunk index with version-based staleness — the cache the
reference declared but never implemented: ``Library.version`` exists "to
support caching" (``app/models/library.py:12-15``) yet every query rebuilds
its index from scratch (``app/services/search_service.py:121-125``).
SURVEY.md §4 ("version-based staleness signal") / §7 step 6.

Per library the index table holds one row per embedded chunk:
``chunk_id, doc_id, meta_type, category, text, unit_embedding, lsh_codes``.
The build does the two things the reference does at index-build time, once:

- **normalize-once** (``app/indexing/brute_force.py:29-30``): store unit
  vectors so query-time cosine is a plain dot product;
- **bucket-once** (``app/indexing/lsh.py:39-41``): per-table sign-bit codes
  via the Arrow-batched matmul path (one BLAS call per batch).

``refresh()`` compares the stored ``built_version`` against the library's
current ``version`` and is a no-op while they match; any write path bumps the
version (store.py) and therefore invalidates. Snapshot isolation comes from
the same atomic pointer flip the EntityStore uses — it applies to the
PARQUET snapshot (the old index directory stays on disk and readable) AND,
for exactly ONE generation, to the driver-memoized block-manager copy:
a rebuild moves the evicted checkpoint into a one-slot stale cache instead
of unpersisting it immediately (ADVICE r13 — eager unpersist made lazy
frames held across a rebuild unrecomputable, since a localCheckpoint
truncates lineage, and the non-blocking unpersist could race an in-flight
action on the old frame). The stale generation's blocks are freed on the
NEXT rebuild, so serving memory stays bounded at <= 2 index copies per
library while callers holding a frame across a single rebuild keep a
computable snapshot. A frame held across TWO rebuilds becomes
unrecomputable — re-request it from ``index_df``/``search``, or re-read
the old immutable directory with ``spark.read.parquet`` (collected
results are never affected).

Scale notes: at 100 TB the index table is the serving layout — partitioned by
``library_id`` like the fact table, rebuilt incrementally per library (only
libraries whose version advanced), scanned with only the columns a query
needs (unit vectors for brute, codes for LSH probes).
"""

from __future__ import annotations

import os
import uuid
from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.lsh import (
    bucket_codes_native,
    generate_planes,
    spark_sql_plane_dot,
)
from ..functions.vector import unit_normalize
from ..operators.lsh import with_bucket_codes
from .store import EntityStore


class ChunkIndexStore:
    """Staleness-aware persisted index over an EntityStore's chunks."""

    def __init__(
        self,
        store: EntityStore,
        root: str,
        *,
        lsh_tables: int = 8,
        lsh_planes: int = 12,
        seed: int = 42,
    ) -> None:
        self.store = store
        self.spark = store.spark
        self.root = root
        self.lsh_tables = lsh_tables
        self.lsh_planes = lsh_planes
        self.seed = seed
        self.builds = 0  # observability: staleness tests count rebuilds
        self._planes: dict[int, list] = {}  # dim -> planes
        os.makedirs(root, exist_ok=True)

    # ---- pointer files: "<dir>\t<built_version>" ------------------------

    def _pointer(self, library_id: str) -> str:
        return os.path.join(self.root, f"index-{library_id}._CURRENT")

    def built_version(self, library_id: str) -> int | None:
        try:
            with open(self._pointer(library_id)) as f:
                _, ver = f.read().strip().split("\t")
            return int(ver)
        except FileNotFoundError:
            return None

    def _current_dir(self, library_id: str) -> str:
        with open(self._pointer(library_id)) as f:
            return f.read().strip().split("\t")[0]

    def planes_for(self, dim: int) -> list:
        if dim not in self._planes:
            self._planes[dim] = generate_planes(
                dim, self.lsh_tables, self.lsh_planes, seed=self.seed
            )
        return self._planes[dim]

    # ---- build ----------------------------------------------------------

    def refresh(self, library_id: str) -> bool:
        """Rebuild the library's index iff its version advanced. Returns
        True when a rebuild happened."""
        current = self.store.library_version(library_id)  # raises NotFound
        if self.built_version(library_id) == current:
            return False
        chunks = self.store.read_chunks_library(library_id).filter(
            F.col("embedding").isNotNull()
        )
        docs = (
            self.store.read("documents")
            .filter(F.col("library_id") == library_id)
            .select("doc_id", "category")
        )
        rows = chunks.join(F.broadcast(docs), "doc_id", "left").withColumn(
            "unit_embedding", unit_normalize(F.col("embedding"))
        )
        first = rows.select("embedding").take(1)
        if first:
            dim = len(first[0]["embedding"])
            rows = with_bucket_codes(
                rows, self.planes_for(dim), embedding_col="unit_embedding"
            )
        else:
            rows = rows.withColumn("lsh_codes", F.lit(None).cast("array<long>"))
        out = rows.select(
            "chunk_id", "doc_id", F.lit(library_id).alias("library_id"),
            "text", "meta_type", "category", "unit_embedding", "lsh_codes",
        )
        new_dir = os.path.join(self.root, f"index-{library_id}.v{uuid.uuid4().hex[:12]}")
        out.write.mode("overwrite").parquet(new_dir)
        tmp = self._pointer(library_id) + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{new_dir}\t{current}")
        os.replace(tmp, self._pointer(library_id))
        self.builds += 1
        return True

    def index_df(self, library_id: str) -> DataFrame:
        """The fresh index frame (rebuilding first when stale). Memoized
        per built directory AND materialized once via localCheckpoint:
        the reader memo alone still paid the parquet decode on every
        query job (~29 ms/query of the ~113 ms serving latency at a
        2k-chunk library — measured r12, same-vector-vs-distinct probe
        ruled out codegen); serving from the block-manager copy cuts the
        per-query job to ~84 ms. The checkpoint's default
        MEMORY_AND_DISK storage spills rather than OOMs if a library's
        index outgrows executor memory, and the directory is immutable,
        so the cached frame stays valid until the pointer moves (the
        same (dir) key invalidates both memo layers together).

        Eviction is DEFERRED by one generation (ADVICE r13): when the
        pointer moves, the replaced checkpoint parks in a one-slot stale
        cache — still persisted, so a lazy frame a caller obtained from
        an earlier ``index_df``/``search`` stays computable across one
        rebuild, and the non-blocking unpersist cannot race an in-flight
        action on the frame being replaced. The slot's PREVIOUS occupant
        (two generations old) is unpersisted here; a frame held across
        TWO rebuilds is unrecomputable (see module docstring). The
        bounded-memory contract (ADVICE r12) holds at <= 2 generations
        per library, pytest-pinned via getRDDStorageInfo."""
        self.refresh(library_id)
        d = self._current_dir(library_id)
        cache = getattr(self, "_df_cache", None)
        if cache is None:
            cache = self._df_cache = {}
            self._stale_cache: dict[str, DataFrame] = {}
        hit = cache.get(library_id)
        if hit is not None and hit[0] == d:
            return hit[1]
        if hit is not None:
            # The pointer moved: free the blocks of the generation parked
            # at the LAST rebuild (if any), then park the one being
            # replaced now. DataFrame.unpersist only talks to the
            # CacheManager; a localCheckpoint's blocks belong to the
            # LogicalRDD's backing RDD, so unpersist THAT.
            prev = self._stale_cache.get(library_id)
            if prev is not None:
                try:
                    prev._jdf.queryExecution().logical().rdd().unpersist(False)
                except Exception:  # noqa: BLE001 — eviction is best-effort
                    pass
            self._stale_cache[library_id] = hit[1]
        df = self.spark.read.parquet(d).localCheckpoint(eager=True)
        cache[library_id] = (d, df)
        return df

    # ---- query paths over the precomputed columns -----------------------

    def search(
        self,
        library_id: str,
        query_embedding: Sequence[float],
        k: int = 5,
        *,
        index: str = "brute",
        filters: dict[str, Any] | None = None,
    ) -> DataFrame:
        """Same result contract as SearchEngine.search's hits (§2.11), served
        from the persisted index: cosine == dot(unit_emb, unit_q); LSH prunes
        on precomputed codes before the same dot re-rank."""
        from ..engine import SearchEngine  # circular-at-import-time only

        idx = SearchEngine.apply_metadata_filters(self.index_df(library_id), filters)
        if k <= 0:
            return self._pack(idx.withColumn("score", F.lit(0.0)).limit(0))
        qvec = [float(x) for x in query_embedding]
        norm = sum(x * x for x in qvec) ** 0.5
        unit_q = [x / norm for x in qvec] if norm != 0.0 else qvec
        if index == "lsh":
            first = idx.select("unit_embedding").take(1)
            if first:
                qc = bucket_codes_native(unit_q, self.planes_for(len(unit_q)))
                idx = idx.filter(
                    F.exists(
                        F.zip_with(F.col("lsh_codes"), qc, lambda c, x: c == x),
                        lambda b: b,
                    )
                )
        elif index != "brute":
            raise ValueError(f"unknown index: {index}")
        # One parsed SQL string instead of Column-API lambdas: the HOF
        # builders cost ~28 ms of py4j round-trips per query; the parsed
        # tree is the identical aggregate(zip_with(...)) expression
        # functions.vector.dot builds (see spark_sql_plane_dot docstring).
        scored = idx.withColumn(
            "score", F.expr(spark_sql_plane_dot("unit_embedding", unit_q))
        )
        return self._pack(scored.orderBy(F.desc("score"), F.asc("chunk_id")).limit(k))

    @staticmethod
    def _pack(hits: DataFrame) -> DataFrame:
        return hits.select(
            "chunk_id",
            F.col("doc_id").alias("document_id"),
            "library_id",
            "text",
            "meta_type",
            "score",
        )
