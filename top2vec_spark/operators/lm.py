"""Self-trained bigram language-model quality scoring.

CCNet-parity quality signal (Wenzek et al. 2020 filter Common Crawl by
KenLM perplexity; the public C4/Gopher recipes use related fluency
heuristics): estimate an add-k-smoothed bigram LM from the corpus
itself, then score every document by its mean per-bigram
log-likelihood and perplexity. Low-perplexity docs read like the
corpus; high-perplexity docs are gibberish/boilerplate outliers. The
reference has no LM scoring (beyond-reference pipeline operator, like
dedup) — the contract is the textbook estimator:

    P(w2 | w1) = (c(w1, w2) + k) / (c(w1, ·) + k * V)
    doc score  = sum over doc bigrams of ln P / n_bigrams
    perplexity = exp(-score)

with V = # distinct tokens in the corpus, c(w1, ·) = # bigram
occurrences starting with w1.

Scale notes (10^12 tokens):
- the LM is two groupBy counts over (w1, w2) and (w1): Catalyst
  two-phase hash agg, map-side combined — head bigrams ("of the")
  never skew a reducer because partials combine upstream.
- documents join the model on their DISTINCT bigrams (per-doc tf
  carried as a weight), not on every token — join cardinality is
  sum of per-doc distinct bigrams, far below corpus token count.
  Frequent-bigram join keys are skewed; the model side is one row
  per bigram (uniform), so AQE skew-join splits the probe side.
- no Python in the plan: arrays_zip/slice bigram construction,
  JVM ln/exp, codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_bigrams(tokens_arr: DataFrame) -> DataFrame:
    """(doc_id, w1, w2, tf) — per-document distinct bigram counts.
    tokens_arr: (doc_id, tokens array<string>)."""
    n = F.size("tokens")
    pairs = F.arrays_zip(
        F.slice("tokens", 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice("tokens", 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
    )
    return (
        tokens_arr.select("doc_id", F.explode(pairs).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bigram_lm(tokens_arr: DataFrame) -> tuple[DataFrame, DataFrame, int]:
    """Corpus bigram model: (c2 = (w1, w2, c2), c1 = (w1, c1), V).
    c1 counts bigram OCCURRENCES starting with w1 (the conditional's
    denominator), V is the corpus unigram vocabulary size."""
    bg = doc_bigrams(tokens_arr)
    c2 = bg.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    # c(w1, ·) = sum over w2 of c(w1, w2): aggregate the GLOBAL bigram
    # table (distinct corpus bigrams), not the much larger per-doc
    # table a second time — identical counts, smaller shuffle
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    v = (
        tokens_arr.select(F.explode("tokens").alias("t"))
        .agg(F.countDistinct("t"))
        .first()[0]
    )
    return c2, c1, int(v)


def lm_contrast_scores(
    tokens_arr: DataFrame,
    target_tokens_arr: DataFrame,
    k: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """DSIR-style importance score (Xie et al. 2023 sample by an
    n-gram-model likelihood RATIO; CCNet contrasts a target-domain LM
    against the crawl): per document, the mean per-bigram

        ln P_target(w2 | w1) - ln P_corpus(w2 | w1)

    under two add-k bigram LMs — one estimated from
    ``target_tokens_arr`` (the domain you want more of), one from the
    corpus itself. Positive = reads more like the target than like the
    average crawl page. Returns (doc_id, n_bigrams, contrast);
    documents with no bigrams get NULL contrast.

    Bigrams absent from the target model fall back to pure smoothing
    mass (c2=0, and c1=0 for an unseen w1 -> P = 1/V_target), so the
    score is total and the left joins below are coalesce-safe. Same
    plan shape as :func:`bigram_lm_scores` twice over: the corpus
    never shuffles; the doc side joins both models on its distinct
    bigrams."""
    c2t, c1t, vt = bigram_lm(target_tokens_arr)
    c2c, c1c, vc = bigram_lm(tokens_arr)
    bg = doc_bigrams(tokens_arr)
    logp_t = F.log(
        (F.coalesce("c2t", F.lit(0)) + F.lit(k))
        / (F.coalesce("c1t", F.lit(0)) + F.lit(k * vt))
    )
    logp_c = F.log(
        (F.col("c2c") + F.lit(k)) / (F.col("c1c") + F.lit(k * vc))
    )
    scored = (
        bg.join(c2t.withColumnRenamed("c2", "c2t"), ["w1", "w2"], "left")
        .join(c1t.withColumnRenamed("c1", "c1t"), "w1", "left")
        .join(c2c.withColumnRenamed("c2", "c2c"), ["w1", "w2"])
        .join(c1c.withColumnRenamed("c1", "c1c"), "w1")
        .withColumn("d", logp_t - logp_c)
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            (F.sum(F.col("tf") * F.col("d")) / F.sum("tf")).alias("raw"),
        )
    )
    return (
        tokens_arr.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round("raw", round_digits).alias("contrast"),
        )
    )


def bigram_lm_scores(
    tokens_arr: DataFrame, k: float = 0.1, round_digits: int = 6
) -> DataFrame:
    """Score every document under the corpus's own add-k bigram LM:
    (doc_id, n_bigrams, avg_logp, perplexity). Documents with fewer
    than 2 tokens get n_bigrams = 0 and NULL scores (nothing to
    score, not a zero — the filter caller decides their fate)."""
    c2, c1, v = bigram_lm(tokens_arr)
    bg = doc_bigrams(tokens_arr)
    logp = F.log(
        (F.col("c2") + F.lit(k)) / (F.col("c1") + F.lit(k * v))
    )
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .withColumn("logp", logp)
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            (F.sum(F.col("tf") * F.col("logp")) / F.sum("tf")).alias("raw"),
        )
    )
    return (
        tokens_arr.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round("raw", round_digits).alias("avg_logp"),
            F.round(F.exp(-F.col("raw")), round_digits).alias("perplexity"),
        )
    )


def perplexity_buckets(
    tokens_arr: DataFrame, k: float = 0.1, round_digits: int = 6
) -> DataFrame:
    """CCNet-style head/middle/tail perplexity bucketing (Wenzek 2020
    §4.3: after LM scoring, each language's documents are split into
    equal thirds by perplexity rank; 'head' = most-fluent third, the
    part public recipes keep or up-weight).

    Returns (doc_id, perplexity, ppl_rank, bucket) for every SCORED
    document (docs with < 2 tokens have no bigrams and no perplexity —
    the reference recipe cannot rank them; they are absent here, the
    filter caller decides their fate, same contract as
    :func:`bigram_lm_scores`).

    Rank is the global row number under (perplexity, doc_id) — a total
    order with an integer tie-break, so any engine reproduces the
    bucketing bit-identically. Buckets by integer arithmetic
    (rank*3 < n, rank*3 < 2n), never float quantiles.

    Scale shape: scoring is :func:`bigram_lm_scores`; the global rank
    is the two-phase scan of operators/numbering.py (range partition,
    driver prefix offsets over one row per partition, partition-local
    window — no single-partition global window); the bucket label is
    one codegen projection."""
    from top2vec_spark.operators.numbering import two_phase_row_number

    scored = bigram_lm_scores(tokens_arr, k=k, round_digits=round_digits)
    scored = scored.filter(F.col("perplexity").isNotNull()).select(
        "doc_id", "perplexity"
    )
    ranked = two_phase_row_number(
        scored,
        [F.col("perplexity"), F.col("doc_id")],
        "ppl_rank",
        persist_input=True,
    )
    n = ranked.count()
    return ranked.select(
        "doc_id",
        "perplexity",
        "ppl_rank",
        F.when(F.col("ppl_rank") * 3 < n, F.lit("head"))
        .when(F.col("ppl_rank") * 3 < 2 * n, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
