"""Text-analysis primitives for the LLM-data-pipeline operators (north-star
surface: dedup, language-ID, quality scoring, token counting, fingerprinting)
— every function has a DuckDB SQL twin generated next to it so dedup/text
queries are oracle-checkable bit-for-bit.

Portability contract (Spark expression == DuckDB SQL):
- tokens: lower -> trim -> split on /\\s+/ (both engines drop no interior
  tokens; empty text -> ['']).
- h64: first 15 hex chars of md5 -> BIGINT (60 bits, positive). Identical in
  both engines (verified: 'hello' -> 419982666956583591).
- shingles: positional n-grams joined by ' '; < n tokens -> empty list.
- minhash: min over shingles of h64(i || ':' || shingle) for salt i in
  0..k-1 — salted-md5 hash family instead of (a*x+b) mod p, because 64-bit
  modular arithmetic overflows differently across engines while md5 is
  defined identically everywhere.
- simhash: 60-bit (see SIMHASH_BITS note); bit i = sign of sum over tokens of ±1 on h64(token) bit i.

All pure Catalyst expressions — no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..sqltext import sql_str

# ---------------------------------------------------------------------------
# tokens / shingles
# ---------------------------------------------------------------------------


def tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


SQL_TOKENS = "regexp_split_to_array(trim(lower({text})), '\\s+')"


def shingles(toks: Column, n: int) -> Column:
    """Positional word n-grams: [' '.join(t[i:i+n]) for i in 0..len-n]."""
    m = F.size(toks) - (n - 1)
    return F.when(m >= 1, F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )).otherwise(F.array().cast("array<string>"))


def sql_shingles(toks_expr: str, n: int) -> str:
    return (
        f"list_transform(generate_series(1, len({toks_expr}) - {n - 1}), "
        f"i -> array_to_string({toks_expr}[i:i+{n - 1}], ' '))"
    )


# ---------------------------------------------------------------------------
# portable 60-bit hash
# ---------------------------------------------------------------------------


def h64(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_h64(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# MinHash signature (Kirsch–Mitzenmacher family over one md5 per shingle)
# ---------------------------------------------------------------------------
#
# h_i(s) = h1(s) + i * h2(s), where h1 = first 60 bits and h2 = 56 bits
# (hex chars 17-30) of ONE md5 digest per shingle. The classic double-
# hashing construction preserves minhash accuracy while computing a single
# cryptographic hash per shingle instead of k salted ones (16x less md5 on
# the hot path). Bounds: h1 < 2^60 ≈ 1.16e18, i*h2 <= 15*2^56 ≈ 1.09e18,
# so the sum stays below 2.3e18 < 2^63 — no ANSI-mode long overflow on
# either engine.
#
# h2 MUST be wide relative to h1 (round-11 fix): with the original 40-bit
# h2, i*h2 <= 2^44 was ~4 orders of magnitude below the typical gap
# between the two smallest h1 values in a document (~2^60 / |shingles|²),
# so ONE shingle minimized h1 + i*h2 for every i — the 16 signature
# slots collapsed to a single effective hash. Measured at sf0.01: the
# slot-agreement distribution between all doc pairs was EXACTLY {0, 16}
# (nothing between), banding configs (16,2)/(16,4)/(16,8) produced
# byte-identical candidate sets, and candidate recall for a jaccard-j
# pair degraded to ~j instead of 1-(1-j^r)^b. At 56 bits, i*h2 spans the
# h1 min-gap scale, per-slot minimizers differ, and the banding knob
# works (pinned by tests/test_dedup.py::test_km_slots_not_degenerate and
# the dedup_minhash_quality instrument's monotone curve).
# Portability: md5/substr/conv exist identically in Spark and DuckDB, so
# the oracle reproduces signatures bit-for-bit.


def shingle_md5s(shingle_col: Column) -> Column:
    """array<string> — one 32-hex-char md5 digest per shingle. The only
    cryptographic hash the minhash path computes; signatures AND the
    Jaccard-verify postings both derive from these digests (digest equality
    == shingle equality on both engines, so verify counts are unchanged)."""
    return F.transform(shingle_col, F.md5)


def _km_hash(i: int):
    # factory, not a default-arg lambda — ``lambda m, i=i`` would be treated
    # as a binary (element, index) lambda, binding ``i`` to the array index
    def fn(m: Column) -> Column:
        h1 = F.conv(F.substring(m, 1, 15), 16, 10).cast("long")
        h2 = F.conv(F.substring(m, 17, 14), 16, 10).cast("long")
        return h1 + F.lit(i) * h2

    return fn


def minhash_signature_from_md5s(md5s_col: Column, k: int) -> Column:
    """array<long> of k minhashes from per-shingle md5 digests; empty input
    -> array of NULLs (docs without shingles are excluded by callers)."""
    return F.array(*[
        F.array_min(F.transform(md5s_col, _km_hash(i))) for i in range(k)
    ])


def sql_minhash_signature_from_md5s(md5s_expr: str, k: int) -> str:
    parts = []
    for i in range(k):
        km = (
            f"CAST(('0x' || substr(m, 1, 15)) AS BIGINT) "
            f"+ {i} * CAST(('0x' || substr(m, 17, 14)) AS BIGINT)"
        )
        parts.append(f"list_min(list_transform({md5s_expr}, m -> {km}))")
    return "[" + ", ".join(parts) + "]"


# ---------------------------------------------------------------------------
# SimHash (60-bit)
# ---------------------------------------------------------------------------

# 60, not the literature's 64 (Manku et al., WWW'07), for two portability
# reasons: (1) the shared token hash h64 is 60 bits (15 md5 hex chars), so
# bits beyond 59 would be vote-constant dead weight; (2) bit 63 is the sign
# bit of a BIGINT and DuckDB raises on signed-64 overflow (measured:
# `1::BIGINT << 63` errors), so a full 64-bit code could not be built by
# the oracle. 60 bits keeps every term and the full code inside the
# positive signed-64 range on BOTH engines, and 4 bands of 15 bits retain
# the pigeonhole recall guarantee for hamming <= 3 (some band unchanged)
# while giving each band 2^15 bucket values — the knob that keeps band-
# bucket occupancy, and with it candidate-pair count, sub-quadratic as the
# corpus grows (the old 32-bit/8-bit-band layout saturated its 256 buckets
# per band: measured 82 s at local sf1 vs 2.5 s at sf0.1).
SIMHASH_BITS = 60


def _bit_vote(i: int):
    # factory, not a default-arg lambda (see _salted_hash note)
    def fn(acc: Column, h: Column) -> Column:
        return acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    return fn


def token_hashes(toks: Column) -> Column:
    """array<long> of per-token h64 hashes. Materialize this in its OWN
    projection before calling ``simhash_from_hashes`` — inlined, the 60
    per-bit aggregates each recompute every md5 (measured 3x slower)."""
    return F.transform(toks, lambda t: h64(t))


def simhash_from_hashes(hashes: Column) -> Column:
    """60-bit simhash over precomputed token hashes: bit i set iff
    sum_tokens(bit_i(h) ? +1 : -1) >= 0. O(tokens * 60) native ops."""
    code = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _bit_vote(i))
        code = code + F.when(vote >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return code


def simhash(toks: Column) -> Column:
    """Single-expression form (hashes inlined; prefer the two-projection
    token_hashes -> simhash_from_hashes split on hot paths)."""
    return simhash_from_hashes(token_hashes(toks))


def sql_simhash(toks_expr: str) -> str:
    hashes = f"list_transform({toks_expr}, t -> {sql_h64('t')})"
    bits = []
    for i in range(SIMHASH_BITS):
        vote = (
            f"list_sum(list_transform({hashes}, "
            f"h -> CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END))"
        )
        bits.append(f"(CASE WHEN {vote} >= 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


# ---------------------------------------------------------------------------
# quality / language heuristics
# ---------------------------------------------------------------------------

# Tiny marker-word sets per language; prediction = argmax hit-count with
# fixed priority tie-break (en > de > es > fr > zh). Real pipelines swap in
# fastText — the operator shape (score columns + argmax) is the deliverable.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "los", "que", "y", "una"),
    "fr": ("le", "les", "et", "une", "est"),
    "zh": ("的", "了", "是", "在", "我"),
}
LANG_PRIORITY = ("en", "de", "es", "fr", "zh")

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    """Non-distinct count of tokens in the marker set."""
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def sql_marker_hits(toks_expr: str, markers: tuple[str, ...]) -> str:
    lst = ", ".join(sql_str(m) for m in markers)
    return f"len(list_filter({toks_expr}, t -> t IN ({lst})))"
