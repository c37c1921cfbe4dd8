"""Binary (sign-bit) vector quantization — the 32x-compression ANN path.

Each embedding dimension contributes one bit (1 iff the component is > 0);
a d-dim float32 vector becomes d/8 bytes. Hamming distance between sign
patterns approximates angular distance (the same geometry that makes
sign-random-projection LSH work — here the 'planes' are the coordinate
axes), so search is: rank by Hamming on the packed words (cheap integer
XOR/POPCNT inside whole-stage codegen), keep a candidate set, exact-cosine
re-rank. Classic two-phase shape shared with PQ (operators/pq.py) and the
JL sketch (operators/project.py); binary codes trade their recall for the
smallest possible footprint and the cheapest distance kernel.

Packing uses 32-bit halves stored in BIGINTs: bit 63 of a single packed
word would overflow signed 64-bit shifts differently across engines,
while 32-bit words keep every intermediate exactly representable in both
Spark and DuckDB — the oracle reproduces pack + Hamming + re-rank
bit-for-bit.

Scale notes (100 TB): the packed-words column is d/8 bytes per row — the
whole corpus's codes fit in memory orders of magnitude before the vectors
do; the Hamming scan is one codegen stage feeding TakeOrderedAndProject
(no shuffle, no Python), and the exact re-rank touches only the candidate
set. Encode once at ingest (it is a pure column expression — no fit, no
model state), serve forever; appends need no refit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32


def pack_sign_bits(embedding: Column, dim: int) -> Column:
    """array<bigint> of ceil(dim/32) words; bit i of word w is set iff
    component w*32+i is > 0. Pure native expression (sequence/aggregate
    inside codegen)."""
    n_words = (dim + WORD_BITS - 1) // WORD_BITS
    words = []
    for w in range(n_words):
        lo, hi = w * WORD_BITS, min((w + 1) * WORD_BITS, dim)
        words.append(
            F.aggregate(
                F.sequence(F.lit(lo), F.lit(hi - 1)),
                F.lit(0).cast("long"),
                # pow(2, b) is exact in double for b <= 31 and casts to the
                # same long as a shift; F.shiftleft only takes a Python int
                # for the shift amount, so it can't vary inside the lambda
                lambda acc, i: acc
                + F.when(
                    F.element_at(embedding, (i + 1).cast("int")) > 0,
                    F.pow(F.lit(2.0), (i % WORD_BITS).cast("double")).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            )
        )
    return F.array(*words)


def pack_sign_bits_py(vec: Sequence[float]) -> list[int]:
    """Driver-side twin of :func:`pack_sign_bits` for query vectors."""
    n_words = (len(vec) + WORD_BITS - 1) // WORD_BITS
    words = [0] * n_words
    for i, x in enumerate(vec):
        if float(x) > 0:
            words[i // WORD_BITS] |= 1 << (i % WORD_BITS)
    return words


def hamming_to_query(words_col: Column, query_words: Sequence[int]) -> Column:
    """Total popcount of XOR against the (literal) query words."""
    total = F.lit(0)
    for w, qw in enumerate(query_words):
        total = total + F.bit_count(
            F.element_at(words_col, w + 1).bitwiseXOR(F.lit(int(qw)))
        )
    return total


def binary_topk(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int,
    *,
    dim: int,
    candidates: int = 100,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    score_decimals: int | None = 6,
) -> DataFrame:
    """Two-phase binary-code search: Hamming-rank the packed sign bits
    (ties to lowest id), keep ``candidates`` rows, exact-cosine re-rank to
    top-k."""
    from .topk import topk_cosine

    qw = pack_sign_bits_py([float(x) for x in query_vector])
    coded = df.filter(F.col(embedding_col).isNotNull()).withColumn(
        "_bw", pack_sign_bits(F.col(embedding_col), dim)
    )
    cand = (
        coded.withColumn("_ham", hamming_to_query(F.col("_bw"), qw))
        .orderBy(F.asc("_ham"), F.asc(id_col))
        .limit(candidates)
        .drop("_bw", "_ham")
    )
    return topk_cosine(
        cand,
        [float(x) for x in query_vector],
        k,
        embedding_col=embedding_col,
        id_col=id_col,
        score_decimals=score_decimals,
    )
