"""Text-analysis operators (north-star surface): token stats + quality
scoring, language-ID, document fingerprinting. Pure Catalyst expressions
over the ``documents`` table; each has an exact SQL twin in
``workload/text.py``.

Quality score follows the standard cheap-heuristics recipe (length,
punctuation density, stopword ratio) used by LLM-data pipelines as a
first-pass filter; weights are fixed constants so the score is deterministic
and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_MARKERS,
    LANG_PRIORITY,
    STOPWORDS,
    h64,
    marker_hits,
    shingles,
    tokens,
)
from ..operators.dedup import NORM_TEXT


def token_stats(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token counts + quality heuristics + composite score."""
    t = tokens(F.col(text_col))
    n_tokens = F.size(t)
    n_chars = F.length(NORM_TEXT(F.col(text_col)))
    punct = F.length(F.col(text_col)) - F.length(F.regexp_replace(F.col(text_col), r"[.!?,;:]", ""))
    stop = marker_hits(t, STOPWORDS)
    avg_len = F.round((n_chars - (n_tokens - 1)) / n_tokens, 6)  # chars sans separators
    stop_ratio = F.round(stop / n_tokens, 6)
    punct_ratio = F.round(punct / n_chars, 6)
    quality = F.round(
        F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.5
        + stop_ratio * 2.0
        + (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * 10.0)) * 0.3,
        6,
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_norm"),
        avg_len.alias("avg_token_len"),
        punct.alias("punct_count"),
        stop.alias("stopword_count"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


# GPT-2-style pre-tokenizer regex (contractions | word | number | punct run,
# each optionally space-prefixed) — the standard cheap proxy for an LLM token
# budget when the real BPE merges aren't available. Java and RE2 agree on
# this pattern (parity tested against DuckDB).
BPE_ISH_PATTERN = r"'(?:ll|ve|re|[sdmt])| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def token_counts_bpe(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace vs BPE-ish token counts per doc + chars-per-token ratio
    (the budget planners' number). Pure Catalyst: one regexp_count, no UDF."""
    t = tokens(F.col(text_col))
    n_bpe = F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN))
    return df.select(
        F.col(id_col),
        F.size(t).alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(
            F.length(F.col(text_col)) / F.greatest(n_bpe, F.lit(1)), 6
        ).alias("chars_per_bpe_token"),
    )


def language_id(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: per-language hit counts, argmax with fixed
    priority tie-break (first in LANG_PRIORITY wins ties)."""
    t = tokens(F.col(text_col))
    hits = {lang: marker_hits(t, LANG_MARKERS[lang]) for lang in LANG_PRIORITY}
    best = F.lit(None).cast("string")
    best_n = F.lit(-1)
    # fold in reverse priority so earlier languages win ties with strict >
    for lang in reversed(LANG_PRIORITY):
        take = hits[lang] >= best_n
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_n = F.when(take, hits[lang]).otherwise(best_n)
    out = df.select(
        F.col(id_col),
        *[hits[lang].alias(f"hits_{lang}") for lang in LANG_PRIORITY],
        best.alias("pred_lang"),
    )
    return out


def deterministic_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    train_pct: int = 90,
    buckets: int = 100,
) -> DataFrame:
    """Reproducible train/val assignment by content-independent id hash:
    bucket = int(md5(id)[:8], 16) % buckets; train iff bucket < train_pct.
    The standard split primitive for dataset curation — stable across runs,
    machines, and engines (no RNG), and any engine that can md5 reproduces
    the exact same membership. Joins/filters on `split` prune with the scan."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % buckets
    )
    return df.withColumn("split_bucket", bucket).withColumn(
        "split",
        F.when(F.col("split_bucket") < train_pct, F.lit("train")).otherwise(
            F.lit("val")
        ),
    )


def contamination_check(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    train_pct: int = 90,
) -> DataFrame:
    """Train→val n-gram contamination audit: for every val doc, how many of
    its distinct word n-grams also occur anywhere in the train split.

    The standard eval-set decontamination primitive (cf. GPT-3 appendix C:
    13-gram overlap; we default n=8 so the small fixture docs have grams).
    Splits come from :func:`deterministic_split`, so membership is bit-stable
    across engines.

    Scale shape: both sides shingle once, dedupe *per doc* with
    ``array_distinct`` before exploding (bounds the explode at doc length),
    then the train side collapses to a distinct 60-bit hash index — an
    inverted-index equi-join keyed on the hash, never doc×doc. Every
    aggregate here is map-side combinable. At 100 TB the exact train index
    is itself a big table; the drop-in approximation is a broadcast Bloom
    filter over the same hashes (one false-positive-bounded scan, zero
    shuffle on the val side) — the exact join below stays the oracle path.
    """
    split = deterministic_split(df, id_col=id_col, train_pct=train_pct)
    grams = split.select(
        F.col(id_col),
        F.col("split"),
        F.explode(
            F.array_distinct(shingles(tokens(F.col(text_col)), n))
        ).alias("shingle"),
    ).select(F.col(id_col), F.col("split"), h64(F.col("shingle")).alias("h"))
    train_index = (
        grams.filter(F.col("split") == "train").select("h").distinct()
    )
    val_grams = grams.filter(F.col("split") == "val")
    stats = (
        val_grams.join(train_index.withColumn("hit", F.lit(1)), "h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("hit").alias("n_contaminated"),
        )
    )
    val_docs = split.filter(F.col("split") == "val").select(id_col)
    return val_docs.join(stats, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_ngrams"), F.lit(0)).alias("n_ngrams"),
        F.coalesce(F.col("n_contaminated"), F.lit(0)).alias("n_contaminated"),
        F.round(
            F.coalesce(F.col("n_contaminated") / F.col("n_ngrams"), F.lit(0.0)), 6
        ).alias("contamination_rate"),
    )


def decontaminate_train(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    train_pct: int = 90,
    max_rate: float = 0.2,
) -> DataFrame:
    """The enforcement twin of :func:`contamination_check`, run in the
    direction pipelines actually act on: drop TRAIN documents that overlap
    the held-out split (you can rebuild train, you cannot rebuild eval).
    Returns every train doc with (n_ngrams, n_overlap, overlap_rate, keep):
    keep = overlap_rate <= ``max_rate``.

    Same scale shape as the audit: per-doc-distinct shingles, 60-bit hash
    index of the VAL side (small — val is the minority split), broadcast-
    friendly equi-join, never doc x doc."""
    split = deterministic_split(df, id_col=id_col, train_pct=train_pct)
    grams = split.select(
        F.col(id_col),
        F.col("split"),
        F.explode(
            F.array_distinct(shingles(tokens(F.col(text_col)), n))
        ).alias("shingle"),
    ).select(F.col(id_col), F.col("split"), h64(F.col("shingle")).alias("h"))
    val_index = grams.filter(F.col("split") == "val").select("h").distinct()
    train_grams = grams.filter(F.col("split") == "train")
    stats = (
        train_grams.join(val_index.withColumn("hit", F.lit(1)), "h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("hit").alias("n_overlap"),
        )
    )
    train_docs = split.filter(F.col("split") == "train").select(id_col)
    out = train_docs.join(stats, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_ngrams"), F.lit(0)).alias("n_ngrams"),
        F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
        F.round(
            F.coalesce(F.col("n_overlap") / F.col("n_ngrams"), F.lit(0.0)), 6
        ).alias("overlap_rate"),
    )
    return out.withColumn("keep", F.col("overlap_rate") <= max_rate)


def repetition_metrics(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style intra-document repetition signals: duplicate-bigram
    fraction, most-frequent-bigram share, duplicate-trigram fraction
    (cf. Rae et al. 2021 §A1.1 repetition filters).

    Two plan shapes on purpose: the bigram stats need a per-(doc,gram) count
    (for the max share), so they go explode → two-level hash agg — both
    levels map-side combinable, shuffle keyed by doc — while the trigram
    dup fraction never leaves the row (`size` vs `size(array_distinct)`),
    i.e. zero shuffle. Trigram shingles are materialized in their own
    projection so the two size() calls share one computation (HOF lambdas
    defeat CSE when inlined)."""
    toks = tokens(F.col(text_col))
    per_gram = (
        df.select(F.col(id_col), F.explode(shingles(toks, 2)).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bigram_stats = per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        F.max("c").alias("top_bigram_count"),
    )
    tri = df.select(F.col(id_col), shingles(toks, 3).alias("tg")).select(
        F.col(id_col),
        F.size("tg").alias("n_trigrams"),
        F.size(F.array_distinct("tg")).alias("n_distinct_trigrams"),
    )
    return (
        df.select(F.col(id_col))
        .join(bigram_stats, id_col, "left")
        .join(tri, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias("n_bigrams"),
            F.round(
                F.coalesce(
                    F.lit(1.0) - F.col("n_distinct_bigrams") / F.col("n_bigrams"),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_bigram_frac"),
            F.round(
                F.coalesce(
                    F.col("top_bigram_count") / F.col("n_bigrams"), F.lit(0.0)
                ),
                6,
            ).alias("top_bigram_frac"),
            F.round(
                F.coalesce(
                    F.lit(1.0)
                    - F.col("n_distinct_trigrams")
                    / F.nullif(F.col("n_trigrams"), F.lit(0)),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_trigram_frac"),
        )
    )


def tfidf_keywords(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top: int = 3,
) -> DataFrame:
    """Per-doc top-N keywords by tf·idf (raw term count × ln(N/df)).

    Plan: one explode → (doc, term) hash agg (map-side combined), a
    vocabulary-sized doc-frequency agg joined back on term, the corpus size
    as a broadcast 1-row cross join (no driver-side count action), and a
    per-doc window for the top-N — rank ties broken lexically so the result
    is deterministic. The vocabulary table is Zipf-small relative to the
    corpus, so Catalyst broadcast-joins it back; at 100 TB the df table is
    still ≪ corpus (vocab grows sub-linearly)."""
    from pyspark.sql import Window

    term_counts = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_freq = term_counts.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_t")
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        term_counts.join(F.broadcast(doc_freq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("term"),
            F.col("tf"),
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df_t")), 6).alias(
                "tfidf"
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select(id_col, "term", "tf", "tfidf", "rank")
    )


def top_ngrams(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    k: int = 50,
) -> DataFrame:
    """Corpus-wide top-k most frequent word n-grams. Explode → hash agg
    (map-side partial combine) → global top-k, which Spark executes as
    TakeOrderedAndProject (per-partition heaps, driver merge of k rows —
    no full sort at any scale). Ties broken lexically for determinism.

    Built over the spread token barrier (operators/dedup.py
    _spread_tokens): exploding shingles straight off the scan runs the
    shingle expression — plus Catalyst's explode-inferred size filter —
    on the input's (often single) pre-shuffle split; the barrier keeps it
    32-way (measured 3.5 s -> 0.6 s at sf0.1)."""
    from .dedup import _spread_tokens

    return (
        _spread_tokens(df, text_col, id_col)
        .select(F.explode(shingles(F.col("_t"), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(k)
    )


def fingerprints(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact fingerprint (md5 of normalized text) + content minhash
    fingerprint (min token-hash — a 1-hash minhash, stable under
    reordering-free edits).

    The min token hash goes explode → codegen md5 → groupBy-min: hashing
    inside a transform() lambda runs interpreted per element (see
    operators/dedup.py measurements), while the aggregate form keeps md5 in
    whole-stage codegen and map-side combine shrinks the shuffle to one
    partial-min row per document."""
    from ..functions.text import h64

    tok_min = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok"))
        .select(F.col(id_col), h64(F.col("_tok")).alias("_h"))
        .groupBy(id_col)
        .agg(F.min("_h").alias("min_token_hash"))
    )
    return df.select(
        F.col(id_col),
        F.md5(NORM_TEXT(F.col(text_col))).alias("fingerprint"),
    ).join(tok_min, id_col, "left")


def lm_score(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Bigram language-model scoring (CCNet-style quality signal; Wenzek et
    al., "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data", LREC 2020 — the perplexity-filter recipe with the KenLM model
    replaced by a corpus-fit add-alpha bigram model so the whole pipeline
    stays native and oracle-checkable).

    Model: P(w2|w1) = (c(w1,w2) + alpha) / (h(w1) + alpha*V) where c is the
    corpus bigram count, h(w1) the history count (bigrams starting at w1)
    and V the corpus vocabulary size. Per doc: mean negative log-prob over
    its bigrams and the perplexity exp(mean_nll). Docs with < 2 tokens get
    n_bigrams = 0 and NULL scores.

    Determinism: each bigram's nll is rounded to 9 decimals and accumulated
    as DECIMAL(28,9) — float summation order across partitions would make
    the doc score run-dependent; the decimal sum is exact and therefore
    partitioning-independent (same convention as the relational money sums).

    Physical plan: bigrams are exploded ONCE over the spread token barrier
    and eagerly checkpointed — the counts aggregations and the per-doc score
    join all read that materialized frame instead of re-tokenizing. Counts
    join back on (w1,w2) / (w1): corpus-level count tables are vocab-sized
    (not broadcastable at 100 TB), so these are shuffle joins; the h(w1)
    key is Zipf-skewed — AQE skew-join handles it, or pre-salt with
    operators/skew.py for holistic aggs. V is computed driver-side (one
    scalar) and folded into the expression as a literal."""
    from .dedup import _spread_tokens

    toks = _spread_tokens(df, text_col, id_col)
    bg = (
        toks.filter(F.size("_t") >= 2)
        .select(
            F.col("_id"),
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("_t"), 1, F.size("_t") - 1).alias("w1"),
                    F.slice(F.col("_t"), 2, F.size("_t") - 1).alias("w2"),
                )
            ).alias("_p"),
        )
        .select("_id", F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
        .localCheckpoint(eager=True)
    )
    vocab = (
        toks.select(F.explode("_t").alias("_w")).agg(F.countDistinct("_w")).first()[0]
    )
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c"))
    hc = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("_h"))
    p = (F.col("_c") + F.lit(alpha)) / (F.col("_h") + F.lit(alpha * vocab))
    per = (
        bg.join(bc, ["w1", "w2"])
        .join(hc, ["w1"])
        .select(
            "_id", F.round(-F.log(p), 9).cast("decimal(28,9)").alias("_q")
        )
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("_q").alias("_s"))
        .withColumn(
            "mean_nll",
            F.round(F.col("_s").cast("double") / F.col("n_bigrams"), 6),
        )
        .withColumn("ppl", F.round(F.exp(F.col("mean_nll")), 6))
    )
    return (
        df.select(F.col(id_col))
        .join(per.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "mean_nll",
            "ppl",
        )
    )


def dup_span_metrics(
    df: DataFrame,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Duplicated-span coverage per document — the substring-level dedup
    signal (Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL 2022, ExactSubstr): how much of each document is covered by
    token n-grams that also occur in some OTHER document.

    Suffix arrays don't distribute; the standard Spark-shaped equivalent is
    positional n-gram postings: (doc, pos, hash(n-gram)) rows, a corpus
    aggregation marking hashes seen in >= 2 distinct docs, and per-doc
    interval-union of the duplicated [pos, pos+n) windows via one window
    function (gaps-and-islands with a running max end — integer math, so
    the coverage count is exact and engine-independent).

    Outputs per doc: n_tokens, n_ngrams, dup_ngrams, dup_ngram_frac,
    covered_tokens (interval union), covered_frac. Docs shorter than n
    tokens have 0 ngrams and NULL fractions.

    Scale notes (100 TB): postings shuffle on the 8-byte hash (never the
    string); the duplicated-hash set is produced by a map-side-combined
    countDistinct and joined back on the same key — two shuffles total plus
    one window keyed by doc. Stop-gram skew (boilerplate n-grams in
    millions of docs) concentrates the join key: AQE skew-join splits it,
    and the per-doc window stays balanced because its key is the doc."""
    from ..functions.text import h64, shingles, tokens
    from .dedup import _spread_tokens

    toks = _spread_tokens(df, text_col, id_col)
    pos = (
        toks.select(
            F.col("_id"),
            F.posexplode(shingles(F.col("_t"), n)).alias("_pos", "_s"),
        )
        .select("_id", "_pos", h64(F.col("_s")).alias("_h"))
        .localCheckpoint(eager=True)
    )
    dup_h = (
        pos.groupBy("_h")
        .agg(F.countDistinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("_h")
    )
    marked = pos.join(dup_h.withColumn("_dup", F.lit(True)), "_h", "left")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("_id")
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dup_rows = (
        marked.filter(F.col("_dup"))
        .withColumn("_prev_end", F.max(F.col("_pos") + n).over(w))
        .withColumn(
            "_contrib",
            F.greatest(
                F.lit(0),
                F.col("_pos")
                + n
                - F.greatest(F.col("_pos"), F.coalesce(F.col("_prev_end"), F.lit(0))),
            ),
        )
    )
    per_dup = dup_rows.groupBy("_id").agg(
        F.count(F.lit(1)).alias("dup_ngrams"),
        F.sum("_contrib").alias("covered_tokens"),
    )
    # token length for EVERY doc (docs shorter than n never reach `pos`)
    per_len = toks.select(F.col("_id"), F.size("_t").alias("n_tokens"))
    per_doc = marked.groupBy("_id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    return (
        per_len.withColumnRenamed("_id", id_col)
        .join(per_doc.withColumnRenamed("_id", id_col), id_col, "left")
        .join(per_dup.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("dup_ngrams", F.lit(0)).alias("dup_ngrams"),
            F.when(
                F.coalesce(F.col("n_ngrams"), F.lit(0)) > 0,
                F.round(
                    F.coalesce("dup_ngrams", F.lit(0))
                    / F.col("n_ngrams").cast("double"),
                    6,
                ),
            ).alias("dup_ngram_frac"),
            F.coalesce("covered_tokens", F.lit(0)).cast("long").alias("covered_tokens"),
            F.when(
                F.coalesce(F.col("n_tokens"), F.lit(0)) > 0,
                F.round(
                    F.coalesce(F.col("covered_tokens"), F.lit(0))
                    / F.col("n_tokens").cast("double"),
                    6,
                ),
            ).alias("covered_frac"),
        )
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al., "Data
    Selection for Language Models via Importance Resampling", NeurIPS
    2023): hashed-unigram bag-of-words features, add-alpha categorical
    distributions fit on the TARGET corpus vs the RAW corpus, and per-doc
    log importance weight

        log w(doc) = sum_tokens log( p_target[bucket] / p_raw[bucket] ).

    High-weight documents look like the target distribution; downstream
    selection keeps the top mass (pair with operators/sampling.py /
    operators/mixing.py for the resampling step).

    Determinism: the per-bucket log-ratio is rounded to 9 decimals and the
    per-doc sum accumulates count x ratio in DECIMAL — exact integer-scaled
    arithmetic, so the weight is partitioning-independent (same convention
    as lm_score). Token -> bucket uses the portable 60-bit md5 hash
    (functions/text.py h64) mod ``buckets``.

    Scale notes (100 TB): the bucket table is ``buckets`` rows — broadcast
    by construction, so the per-doc scoring join never shuffles the corpus
    side; the two distribution fits are map-side-combined counts. The raw
    totals are driver-side scalars folded into the expression (one count
    each, control-plane)."""
    from ..functions.text import h64, tokens
    from .dedup import _spread_tokens

    def bucketed(df: DataFrame) -> DataFrame:
        return (
            _spread_tokens(df, text_col, id_col)
            .select(F.col("_id"), F.explode("_t").alias("_tok"))
            .select(F.col("_id"), F.pmod(h64(F.col("_tok")), F.lit(buckets)).alias("_b"))
        )

    raw_toks = bucketed(docs).localCheckpoint(eager=True)
    tgt_toks = bucketed(target)
    n_raw = raw_toks.count()
    n_tgt = tgt_toks.count()
    raw_counts = raw_toks.groupBy("_b").agg(F.count(F.lit(1)).alias("_cr"))
    tgt_counts = tgt_toks.groupBy("_b").agg(F.count(F.lit(1)).alias("_ct"))
    denom_t = float(n_tgt + alpha * buckets)
    denom_r = float(n_raw + alpha * buckets)
    ratio = F.round(
        F.log((F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(alpha)) / F.lit(denom_t))
        - F.log((F.col("_cr") + F.lit(alpha)) / F.lit(denom_r)),
        9,
    ).cast("decimal(20,9)")
    bucket_table = (
        raw_counts.join(tgt_counts, "_b", "left").select("_b", ratio.alias("_q"))
    )
    per_doc = (
        raw_toks.groupBy("_id", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .join(F.broadcast(bucket_table), "_b")
        .groupBy("_id")
        .agg(
            F.sum("_c").alias("n_tokens"),
            # the count is cast NARROW before the multiply: bigint (20,0) x
            # (20,9) needs precision 41 > 38, and Spark's precision-loss
            # rule keeps digits by TRUNCATING THE SCALE to 6 — silently
            # rounding every product (measured 4e-7 doc-level drift vs the
            # scale-9-preserving oracle). (10,0) x (20,9) fits at scale 9.
            F.sum(F.col("_c").cast("decimal(10,0)") * F.col("_q")).alias("_s"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            # NO round-6 here: the decimal sum is an exact multiple of 1e-9
            # (integer counts x 9-decimal ratios), so round(x, 6) hits exact
            # ties where Spark's shortest-string rounding and a multiply-
            # based round disagree by 1e-6; the raw decimal->double cast is
            # identical in both engines.
            F.col("_s").cast("double").alias("log_weight"),
        )
    )


def char_entropy(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Alphabetic character entropy — a classic cheap quality signal (low
    entropy flags keyboard-mash/repeated-char spam, very high entropy flags
    base64/hex blobs; cf. Gopher rules in quality.py:35 which threshold
    ratios instead of distributions).

    Per document: the Shannon entropy (bits) of the distribution of the 26
    ASCII letters in lower(text). Counting uses 26 length(replace(...))
    scans — pure whole-stage-codegen string ops, no explode, no shuffle, no
    per-row histogram state; at 100 TB this is a map-only pass over the
    text column. The entropy fold runs in FIXED a..z expression order with
    DOUBLE math on both engines (the module's float-parity discipline), so
    round(.., 6) hash-matches the DuckDB oracle.
    """
    low = F.lower(F.col(text_col))
    letters = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    counts = [
        (F.length(low) - F.length(F.replace(low, F.lit(ch)))).cast("double")
        for ch in letters
    ]
    # Materialize the 26 counts ONCE as an array column: referenced naively,
    # each count is re-evaluated in n, in distinct, and twice per entropy
    # term (~4x the string scans — measured 5.1 s vs 1.9 s at sf0.1).
    # CollapseProject will not inline a non-cheap expression that the upper
    # projection references many times, so the array survives as a real
    # intermediate; the fold lambdas run left-to-right in a..z order —
    # bitwise-identical to the oracle's fixed-order sum.
    # The n>0 filter is expressed as an equivalent cheap regex precondition
    # on the raw text: filtering on _n itself gets pushed below the
    # projection and re-inlines the whole count array a second time.
    has_letter = F.lower(F.col(text_col)).rlike("[a-z]")
    with_counts = df.filter(has_letter).select(
        F.col(id_col), F.array(*counts).alias("_c")
    )
    n = F.aggregate("_c", F.lit(0.0), lambda a, x: a + x)
    with_n = with_counts.select(id_col, "_c", n.alias("_n"))
    ent = F.aggregate(
        "_c",
        F.lit(0.0),
        lambda a, x: a
        + F.when(x > 0, -((x / F.col("_n")) * F.log2(x / F.col("_n")))).otherwise(
            F.lit(0.0)
        ),
    )
    distinct = F.aggregate(
        "_c", F.lit(0.0), lambda a, x: a + F.when(x > 0, 1.0).otherwise(0.0)
    )
    return with_n.select(
        F.col(id_col),
        F.col("_n").cast("long").alias("n_letters"),
        distinct.cast("long").alias("distinct_letters"),
        F.round(ent, 6).alias("entropy"),
    )


def sql_char_entropy(table: str = "documents") -> str:
    """DuckDB oracle: the identical 26-term fixed-order entropy fold."""
    letters = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    cnt = {
        ch: f"CAST(length(low) - length(replace(low, '{ch}', '')) AS DOUBLE)"
        for ch in letters
    }
    n = " + ".join(f"c_{ch}" for ch in letters)
    ent = " + ".join(
        f"CASE WHEN c_{ch} > 0 THEN -((c_{ch} / n) * log2(c_{ch} / n)) ELSE 0.0 END"
        for ch in letters
    )
    distinct = " + ".join(f"CASE WHEN c_{ch} > 0 THEN 1 ELSE 0 END" for ch in letters)
    cols = ", ".join(f"{expr} AS c_{ch}" for ch, expr in cnt.items())
    return f"""
WITH low_t AS (SELECT doc_id, lower(text) AS low FROM {table}),
cnts AS (SELECT doc_id, {cols} FROM low_t),
tot AS (SELECT *, {n} AS n FROM cnts)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_letters,
       CAST({distinct} AS BIGINT) AS distinct_letters,
       round({ent}, 6) AS entropy
FROM tot WHERE n > 0
"""


def pmi_collocations(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k adjacent-word collocations by pointwise mutual information
    (Church & Hanks): PMI(x,y) = ln(c_xy * N / (c_x * c_y)) with N the
    corpus token count — the standard phrase-mining signal feeding
    tokenizer vocab curation. Bigram and unigram counts are exact BIGINTs
    from explode → map-side-partial hash aggs over the spread token
    barrier (operators/dedup.py _spread_tokens); the pair→unigram joins
    are pre-aggregated one-row-per-word frames (shuffle joins on the word
    key — no corpus-sized side), and the final PMI is ONE pinned-shape
    double expression, so round(.., 6) hash-matches the oracle. Top-k
    runs as TakeOrderedAndProject on (pmi DESC, pair ASC)."""
    from .dedup import _spread_tokens

    spread = _spread_tokens(df, text_col, id_col)
    uni = (
        spread.select(F.explode(F.col("_t")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nw = uni.agg(F.sum("c").cast("long").alias("nw"))
    big = (
        spread.select(F.explode(shingles(F.col("_t"), 2)).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
        .withColumn("w1", F.split(F.col("pair"), " ")[0])
        .withColumn("w2", F.split(F.col("pair"), " ")[1])
    )
    joined = (
        big.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("cx")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("cy")), "w2")
        .crossJoin(F.broadcast(nw))
    )
    return (
        joined.selectExpr(
            "pair",
            "c_xy",
            "CAST(cx AS BIGINT) AS cx",
            "CAST(cy AS BIGINT) AS cy",
            "round(ln((CAST(c_xy AS DOUBLE) * CAST(nw AS DOUBLE))"
            " / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))), 6) AS pmi",
        )
        .orderBy(F.desc("pmi"), F.asc("pair"))
        .limit(k)
    )


# Flesch constants injected as identical literals into both engines'
# expression trees (the shared-expression-tree float discipline).
_FRE_EXPR = (
    "206.835 - 1.015 * (CAST(nw AS DOUBLE) / CAST(ns AS DOUBLE))"
    " - 84.6 * (CAST(nsyl AS DOUBLE) / CAST(nw AS DOUBLE))"
)


def reading_ease(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading-ease score per document — the classic readability
    quality signal (joins the Gopher/entropy/perplexity family as a
    difficulty axis). Words = maximal non-space runs, sentences =
    [.!?]+ runs floored at 1, syllables = maximal vowel-group runs
    (the standard cheap heuristic). All three are single regexp_count
    scans — map-only whole-stage codegen, no explode, no shuffle; the
    score is one pinned-shape double expression (_FRE_EXPR) with Python-
    literal constants, so round(.., 6) hash-matches the oracle. Banding
    compares the UNROUNDED score against literal cutoffs — identical
    doubles both engines."""
    nw = F.regexp_count(F.col(text_col), F.lit(r"\S+"))
    ns = F.greatest(F.lit(1), F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")))
    nsyl = F.regexp_count(F.lower(F.col(text_col)), F.lit(r"[aeiouy]+"))
    return (
        df.select(
            F.col(id_col),
            nw.cast("long").alias("nw"),
            ns.cast("long").alias("ns"),
            nsyl.cast("long").alias("nsyl"),
        )
        .filter(F.col("nw") > 0)
        .selectExpr(
            id_col,
            "nw AS n_words",
            "ns AS n_sentences",
            "nsyl AS n_syllables",
            f"round({_FRE_EXPR}, 6) AS fre",
            f"CASE WHEN {_FRE_EXPR} >= 70.0 THEN 'easy'"
            f" WHEN {_FRE_EXPR} >= 50.0 THEN 'standard'"
            " ELSE 'difficult' END AS band",
        )
    )


def textrank_keywords(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_pair_count: int = 3,
    iters: int = 3,
    k: int = 30,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau): PageRank over the
    corpus-wide word co-occurrence graph — nodes are clean lowercase words
    (>= 4 letters), edges are adjacent-word pairs seen >= min_pair_count
    times, symmetrized. Composes operators/pagerank.py (one shuffle per
    round, |V|-sized share table, per-edge contributions pinned at 12
    decimals for cross-engine bit-parity); the edge build is the same
    map-side-partial bigram aggregation as pmi_collocations, so the graph
    is pair-count-bounded, never corpus-sized. Top-k keywords by rank run
    as TakeOrderedAndProject."""
    from .dedup import _spread_tokens
    from .pagerank import pagerank

    spread = _spread_tokens(df, text_col, id_col)
    word = r"^[a-z]{4,}$"
    pairs = (
        spread.select(F.explode(shingles(F.col("_t"), 2)).alias("pair"))
        .withColumn("w1", F.split(F.col("pair"), " ")[0])
        .withColumn("w2", F.split(F.col("pair"), " ")[1])
        .filter(
            (F.col("w1") != F.col("w2"))
            & F.col("w1").rlike(word)
            & F.col("w2").rlike(word)
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_pair_count)
    )
    edges = (
        pairs.select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
        .union(pairs.select(F.col("w2").alias("src"), F.col("w1").alias("dst")))
        .distinct()
    )
    pr = pagerank(edges, iters, assume_distinct=True)
    return (
        pr.orderBy(F.desc("rank"), F.asc("node"))
        .limit(k)
        .select(F.col("node").alias("keyword"), "rank")
    )
