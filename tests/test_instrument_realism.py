"""Instrument-realism regression gate (r9 verdict task 7, operationalized):
every registered oracle runs at sf0.001 in DuckDB and is scanned for
vacuous-instrument signals (zero rows; constant columns over >= 3 rows;
all-NULL columns). Each flag must appear in the REVIEWED allowlist below
(classified in COVERAGE.md "Instance realism audit": instance parameters,
whole-corpus totals, structural invariants, or data-limited cases with
unit-test coverage). A NEW flag fails — a freshly added or re-instanced
query cannot silently ship a uniform instrument again (the r7 dbscan-eps
/ r9 recall@10 lesson, now a test instead of a round-time sweep).

The allowlist is per-column so an instrument that LOSES discrimination in
a previously-varying column is also caught. sf0.001-only flags (tiny-
scale artifacts like empty filter results) are included and marked.
"""

from __future__ import annotations

import duckdb


from vector_db_mvp_spark.workload import ORACLE_SQL

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# name -> set of allowed flags. Verdicts per family: COVERAGE.md.
ALLOWED: dict[str, set[str]] = {
    # instance parameter / filter predicate echoed in output
    "distinct_kmv_users": {"CONST_COL:k_used", "CONST_COL:distinct_estimate",
                           "CONST_COL:n_exact"},
    "hll_distinct_users": {"CONST_COL:registers_hit",
                           "CONST_COL:distinct_estimate", "CONST_COL:n_exact"},
    "streaming_distinct_hll": {"CONST_COL:registers_hit",
                               "CONST_COL:distinct_estimate"},
    "streaming_distinct_kmv": {"CONST_COL:k_used", "CONST_COL:distinct_estimate"},
    "media_resize": {"CONST_COL:width", "CONST_COL:height"},
    "temperature_mix": {"CONST_COL:quota"},
    "topk_cosine_filtered": {"CONST_COL:label"},
    # top-15 by QL score: full-match docs dominate, so n_matched saturates
    # at |Q| in the head by construction (score is the instrument, 15
    # distinct values; the unit tests pin the 0/partial-match legs)
    "ql_dirichlet_search": {"CONST_COL:n_matched"},
    "customers_all_priorities": {"CONST_COL:n_priorities"},
    "fuzzy_part_names": {"CONST_COL:dist"},
    # whole-corpus total repeated per row
    "distinct_agg": {"CONST_COL:n_suppliers", "CONST_COL:n_parts"},
    # static node set repeated per ANF round (the avg_ball denominator)
    "part_anf_profile": {"CONST_COL:n_nodes"},
    # with centers capped at deg<=6 the gate-scale top-20 all share
    # n_common=2 (score still discriminates, 20 distinct values; the
    # uncapped twin's n_common varies and is gate-checked)
    "part_adamic_adar_capped": {"CONST_COL:n_common"},
    "frequent_tokens_guaranteed": {"CONST_COL:n_total"},
    "customer_spend_deciles": {"CONST_COL:n_customers"},
    "metadata_catalog": {"CONST_COL:n_docs"},
    "curation_report": {"CONST_COL:n_docs", "CONST_COL:n_en"},
    # structural invariant of the operator
    "price_histogram_equidepth": {"CONST_COL:n_items"},
    "line_dedup": {"CONST_COL:n_lines", "CONST_COL:n_kept"},
    # data-limited (unit tests cover the discriminating leg)
    "language_id": {"CONST_COL:hits_de", "CONST_COL:hits_es",
                    "CONST_COL:hits_fr", "CONST_COL:hits_zh",
                    "CONST_COL:pred_lang"},
    "corpus_curation": {"CONST_COL:pred_lang"},
    "quality_rules": {"CONST_COL:alpha_word_ratio",
                      "CONST_COL:rule_mean_word_len",
                      "CONST_COL:rule_alpha_words"},
    "token_stats": {"CONST_COL:punct_count"},
    "reading_ease": {"CONST_COL:n_sentences"},
    "sentence_split": {"CONST_COL:sentence_idx"},
    "dedup_exact": {"CONST_COL:n_docs"},
    "profile_orders": {"CONST_COL:n_nulls", "CONST_COL:fill_rate"},
    "domain_quality_rollup": {"CONST_COL:n_hosts", "CONST_COL:n_langs"},
    "exact_substring_pairs": {"CONST_COL:n_spans"},
    "incremental_substring": {"CONST_COL:n_spans"},
    "incremental_substring_bucketed": {"CONST_COL:n_spans"},
    "substring_pairs_capped": {"CONST_COL:n_spans"},
    "km_conversion_curve": {"CONST_COL:n_censored"},
    "cohort_retention": {"CONST_COL:cohort_week", "CONST_COL:n_active"},
    # sf0.001-only tiny-scale artifacts (non-empty at sf0.01 — the gate SF)
    "idle_rich_customers": {"ZERO_ROWS", "CONST_COL:n_customers"},
    # at sf0.001 every banding config catches all ~3 truth pairs, so the
    # whole curve is flat; at sf0.01 (the driver gate SF) recall reads
    # 1.0/0.96/0.92 across configs (.claude/audit_realism.json) — only
    # n_truth (whole-corpus total) and precision (no false candidates at
    # tau=0.4) stay constant there
    "dedup_minhash_quality": {
        "CONST_COL:n_truth", "CONST_COL:n_cands", "CONST_COL:n_hits",
        "CONST_COL:recall", "CONST_COL:precision",
    },
    # sampled twin: 6 truth pairs in the half-corpus at sf0.01, all caught
    # at every banding config — same class as the full instrument above;
    # the exact per-config counts still discriminate engines, and the
    # curve differentiates at sf0.1+ (probe_r12_mhq_sampled.json)
    "dedup_minhash_quality_sampled": {
        "CONST_COL:n_truth", "CONST_COL:n_cands", "CONST_COL:n_hits",
        "CONST_COL:recall", "CONST_COL:precision",
    },
    "important_part_stock": {"ZERO_ROWS"},
    "min_cost_supplier": {"ZERO_ROWS"},
    "event_throttle_dedup": {"CONST_COL:n_dropped"},
    "nation_market_hhi": {"CONST_COL:n_suppliers", "CONST_COL:hhi",
                          "CONST_COL:top_share"},
}


def test_no_unreviewed_vacuous_instruments(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    offenders: dict[str, list[str]] = {}
    for name in sorted(ORACLE_SQL):
        df = con.execute(ORACLE_SQL[name]).fetchdf()
        flags = []
        n = len(df)
        if n == 0:
            flags.append("ZERO_ROWS")
        for col in df.columns:
            s = df[col]
            nn = s.dropna()
            if n > 0 and len(nn) == 0:
                flags.append(f"ALL_NULL:{col}")
                continue
            if n >= 3 and len(nn) == n and nn.nunique() == 1:
                flags.append(f"CONST_COL:{col}")
        new = [f for f in flags if f not in ALLOWED.get(name, set())]
        if new:
            offenders[name] = new
    assert not offenders, (
        "unreviewed vacuous-instrument flags — either re-pick the instance "
        "so the column discriminates, or classify it in COVERAGE.md and "
        f"add it to ALLOWED: {offenders}"
    )
