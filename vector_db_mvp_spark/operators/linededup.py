"""Line-level (boilerplate) deduplication, CCNet-style.

Lee et al. ("Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499) and the CCNet pipeline (arXiv:1911.00359) drop individual
*lines* that repeat across many documents — navigation chrome, cookie
banners, "subscribe" footers — while keeping each document's unique prose.
This operator is that pass as a composition of DataFrame ops:

1. explode documents into (doc, position, line);
2. count, per distinct line, how many distinct documents contain it
   (groupBy with map-side partial aggregation);
3. anti-join documents' lines against the frequent-line set;
4. reassemble surviving lines in their original order.

Scale notes (100 TB):
- The frequent-line set (step 3's right side) is TINY by construction —
  only lines appearing in > ``max_doc_freq`` distinct documents survive the
  filter, and highly-repeated boilerplate has few distinct values. AQE
  turns the anti-join into a broadcast join at runtime; we join on a 64-bit
  ``xxhash64`` of the line, not the line text, so the shuffled/broadcast
  key is 8 bytes regardless of line length.
- Step 2 shuffles line hashes once with partial aggregation; step 4
  shuffles (doc_id, pos, line) once to rebuild documents. Both are keyed,
  combinable shuffles — no all-pairs anywhere.
- Reassembly uses ``array_sort(collect_list(struct(pos, line)))``: struct
  sort order is field order, so sorting on (pos asc) is exact and avoids a
  per-document window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_dedup(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Remove lines occurring in more than ``max_doc_freq`` distinct
    documents. Returns (id, n_lines, n_kept, kept_text); blank lines are
    dropped before counting."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(sep))).alias("pos", "line"),
    ).withColumn("line", F.trim("line"))
    lines = lines.filter(F.col("line") != "").withColumn(
        "line_h", F.xxhash64("line")
    )

    frequent = (
        lines.groupBy("line_h")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") > max_doc_freq)
        .select("line_h")
    )
    kept = lines.join(frequent, "line_h", "left_anti")

    totals = lines.groupBy(id_col).agg(F.count("*").alias("n_lines"))
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.count("*").alias("n_kept"),
            F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("_ordered"),
        )
        .select(
            id_col,
            "n_kept",
            F.array_join(F.col("_ordered.line"), sep).alias("kept_text"),
        )
    )
    # left join from totals: a document whose every line was boilerplate
    # still appears, with n_kept=0 and empty text.
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        )
    )


def sql_line_dedup(
    source_cte: str, *, max_doc_freq: int = 2, id_col: str = "doc_id"
) -> str:
    """DuckDB twin: ``source_cte`` must be a CTE body yielding
    (doc_id, t) where t is the line-separated text."""
    return f"""
WITH src AS ({source_cte}),
split AS (SELECT {id_col}, string_split(t, chr(10)) AS ls FROM src),
lines AS (
  SELECT {id_col}, pos, trim(ls[pos]) AS line
  FROM split, UNNEST(range(1, len(ls) + 1)) AS r(pos)
  WHERE trim(ls[pos]) <> ''
),
frequent AS (
  SELECT line FROM lines GROUP BY line
  HAVING COUNT(DISTINCT {id_col}) > {max_doc_freq}
),
kept AS (
  SELECT * FROM lines WHERE line NOT IN (SELECT line FROM frequent)
),
totals AS (SELECT {id_col}, COUNT(*) AS n_lines FROM lines GROUP BY 1),
rebuilt AS (
  SELECT {id_col}, COUNT(*) AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS kept_text
  FROM kept GROUP BY 1
)
SELECT t.{id_col}, t.n_lines,
       COALESCE(r.n_kept, 0) AS n_kept,
       COALESCE(r.kept_text, '') AS kept_text
FROM totals t LEFT JOIN rebuilt r USING ({id_col})
ORDER BY t.{id_col}
"""
