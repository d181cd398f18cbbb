"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Float policy: score-bearing queries round to 4 decimals on BOTH sides
(Spark and DuckDB sum float64 addends in different orders; rounding
absorbs the last-bit noise) and order by the ROUNDED score with
doc_id tie-break so LIMIT selects identical rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top2vec_spark.config import BM25_B, BM25_K1, MAX_TOKEN_LEN, MIN_TOKEN_LEN
from top2vec_spark.functions.tokenizer import duckdb_tokens_sql
from top2vec_spark.operators.bm25 import bm25_scores, term_weights
from top2vec_spark.operators.corpus_stats import (
    build_doc_stats,
    build_vocab,
    compute_globals,
)
from top2vec_spark.operators.tokens import tokenize_docs
from top2vec_spark.operators.textquality import _STOPWORDS_EN

# Exact stopword pattern the quality rubric uses (textquality.py:65) —
# interpolated into the domain_quota oracle so both engines count the
# same group-1 matches.
_STOP_PAT = r"(?i)\b(" + "|".join(sorted(_STOPWORDS_EN)) + r")\b"


# ---------------------------------------------------------------------------
# Shared DuckDB fragments (the ASCII tokenizer contract — identical to
# top2vec_spark.functions.tokenizer.sql_tokens_expr; the full unicode
# contract is pytest-oracled in tests/test_tokenizer.py instead).
# ---------------------------------------------------------------------------
_TOKENS_CTE = f"""
tokens AS (
  SELECT doc_id,
         unnest(list_filter(
           regexp_extract_all(lower(regexp_replace(text, '<[^>]+>', '', 'g')), '[a-z_]+'),
           t -> len(t) BETWEEN {MIN_TOKEN_LEN} AND {MAX_TOKEN_LEN} AND NOT starts_with(t, '_')
         )) AS term
  FROM documents
)"""

_STATS_CTES = f"""{_TOKENS_CTE},
doc_stats AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id),
globals AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doc_stats),
vocab AS (SELECT term, count(*) AS cf, count(DISTINCT doc_id) AS df FROM tokens GROUP BY term)"""


def _bm25_oracle_sql(
    pos: list[str],
    neg: list[str],
    k: int,
    *,
    exclude: tuple[int, ...] = (),
    skip_ranks: int = 0,
    q_from_doc_ids: tuple[int, ...] = (),
    q_mlt: tuple[int, int] | None = None,
) -> str:
    """Full-corpus BM25 ranking oracle. ``q_from_doc_ids`` replaces the
    keyword list with the DISTINCT terms of the given docs (the
    search_documents_by_documents query construction, api._doc_terms);
    ``exclude`` drops given doc_ids from the result (self-exclusion);
    ``skip_ranks`` drops the top-N ranked rows (the delete-oracle: mark
    -deleted docs keep contributing to corpus stats, so the post-delete
    top-k is exactly the full ranking minus the deleted ranks)."""
    if q_mlt is not None:
        # MoreLikeThis selection: top max_terms of the source doc by
        # tf x idf ROUNDED to 6 decimals (the Spark side rounds the
        # same way, so a 1-ulp ln() divergence cannot flip the
        # cutoff), ties term ASC — q_cte sits after _STATS_CTES so it
        # can read tokens/vocab/globals
        mlt_doc, mlt_max = q_mlt
        q_cte = f"""q(term, sign) AS (
  SELECT term, 1.0 FROM (
    SELECT s.term,
           row_number() OVER (
             ORDER BY round(s.tf * ln(1.0 + (g.n_docs - v.df + 0.5)
                                        / (v.df + 0.5)), 6) DESC,
                      s.term ASC) AS rn
    FROM (SELECT term, count(*) AS tf FROM tokens
          WHERE doc_id = {int(mlt_doc)} GROUP BY term) s
    JOIN vocab v USING (term) CROSS JOIN globals g
  ) WHERE rn <= {int(mlt_max)}
)"""
    elif q_from_doc_ids:
        ids = ", ".join(str(int(i)) for i in q_from_doc_ids)
        q_cte = (
            "q(term, sign) AS ("
            f"SELECT DISTINCT term, 1.0 FROM tokens WHERE doc_id IN ({ids}))"
        )
    else:
        values = ", ".join(
            [f"('{t}', 1.0)" for t in pos] + [f"('{t}', -1.0)" for t in neg]
        )
        q_cte = f"q(term, sign) AS (VALUES {values})"
    excl = ""
    if exclude:
        excl = "WHERE doc_id NOT IN (%s)" % ", ".join(
            str(int(i)) for i in exclude
        )
    if skip_ranks:
        final = f""",
ranked AS (
  SELECT doc_id, round(score, 4) AS score,
         row_number() OVER (ORDER BY round(score, 4) DESC, doc_id ASC) AS rn
  FROM scored {excl}
)
SELECT doc_id, score FROM ranked WHERE rn > {skip_ranks}
ORDER BY score DESC, doc_id ASC LIMIT {k}"""
    else:
        final = f"""
SELECT doc_id, round(score, 4) AS score
FROM scored {excl} ORDER BY round(score, 4) DESC, doc_id ASC LIMIT {k}"""
    return f"""
WITH {_STATS_CTES},
{q_cte},
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
scored AS (
  SELECT tf.doc_id,
         sum(q.sign
             * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
             * (tf.tf * ({BM25_K1} + 1.0))
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
         ) AS score
  FROM tf
  JOIN q USING (term) JOIN vocab USING (term) JOIN doc_stats USING (doc_id)
  CROSS JOIN globals
  GROUP BY tf.doc_id
){final}
"""


# ---------------------------------------------------------------------------
# Spark-side builders
# ---------------------------------------------------------------------------
def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ascii_fast_path: driver `documents` fixture is ASCII (verified);
    # keeps the whole oracle-gated path JVM-side / codegen.
    return tokenize_docs(_docs(spark, sf_dir), ascii_fast_path=True)


def _bm25_query(pos: list[str], neg: list[str], k: int):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tokens = tokenize_docs(_docs(spark, sf_dir), ascii_fast_path=True).cache()
        vocab = build_vocab(tokens)
        ds = build_doc_stats(tokens)
        g = compute_globals(ds)
        w = term_weights(spark, vocab, pos, neg)
        scored = bm25_scores(tokens, ds, g, w)
        rounded = scored.select(
            "doc_id", F.round("score", 4).alias("score")
        )
        return rounded.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)

    return run


def _input_fingerprint(docs: DataFrame) -> str:
    """Cheap content identity of the input corpus (row count + exact
    xxhash64 sum): folded into the index resume markers so regenerated
    parquet at the same path invalidates a cached index instead of
    silently serving answers from the wrong corpus."""
    r = docs.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor: order-insensitive and overflow-free (ANSI-safe)
        F.expr("bit_xor(xxhash64(doc_id, text))").alias("h"),
    ).collect()[0]
    return f"{r['n']}:{r['h']}"


def _bm25_wand_query(pos: list[str], neg: list[str], k: int):
    """Same contract as _bm25_query but answered by the compressed
    posting index + block-max WAND (operators/wand.py) — proves the
    index path itself against the DuckDB oracle."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        import hashlib

        from top2vec_spark.operators.wand import wand_topk
        from top2vec_spark.plans.build import IndexBuilder

        docs = _docs(spark, sf_dir)
        tokens = tokenize_docs(docs, ascii_fast_path=True).cache()
        vocab = build_vocab(tokens)
        ds = build_doc_stats(tokens)
        # deterministic path + resume=True => the build is a cache;
        # the input fingerprint invalidates it if the data changed
        tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
        index = IndexBuilder(
            spark,
            f"/tmp/t2v_entry_idx_{tag}",
            docs_per_shard=256,
            n_buckets=16,
            input_fingerprint=_input_fingerprint(docs),
        ).build(tokens, vocab, ds, resume=True)
        w = term_weights(spark, index.vocab, pos, neg)
        res = wand_topk(spark, index, w, index.globs, k)
        return (
            res.select("doc_id", F.round("score", 4).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
        )

    return run


def _q_bm25_wand_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query serving (wand_topk_many — MANY queries in
    ONE job with shared block decodes, the amortized serving path)
    under the same DuckDB BM25 oracle as the single-query rows: three
    fixture queries, output (query_id, doc_id, score)."""
    import hashlib

    from top2vec_spark.operators.bm25 import resolve_query_terms
    from top2vec_spark.operators.wand import wand_topk_many
    from top2vec_spark.plans.build import IndexBuilder

    docs = _docs(spark, sf_dir)
    tokens = tokenize_docs(docs, ascii_fast_path=True).cache()
    vocab = build_vocab(tokens)
    ds = build_doc_stats(tokens)
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    index = IndexBuilder(
        spark,
        f"/tmp/t2v_entry_idx_{tag}",
        docs_per_shard=256,
        n_buckets=16,
        input_fingerprint=_input_fingerprint(docs),
    ).build(tokens, vocab, ds, resume=True)
    vmap = {r["term"]: (r["term_id"], r["df"]) for r in index.vocab.collect()}
    qmap = {
        "q0": resolve_query_terms(vmap, ["table", "spark"], []),
        "q1": resolve_query_terms(vmap, ["query", "window"], ["batch"]),
        "q2": resolve_query_terms(vmap, ["vector"], []),
    }
    res = wand_topk_many(spark, index, qmap, index.globs, 10)
    return res.select(
        "query_id", "doc_id", F.round("score", 4).alias("score")
    )


def _q_pages_ingest_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule ingest path end-to-end: documents re-shaped into the
    Iceberg-page schema (url, warc_ts, html, text, lang) with text
    NULL so extraction decodes html; Top2VecSpark.from_pages assigns
    deterministic url-ordered doc_ids (JVM two-phase numbering —
    zero-padded urls reproduce the original ids), builds the postings
    index, and answers with WAND. Oracled against the same DuckDB BM25
    SQL as bm25_wand_top10 — proving byte-identical extracted text per
    url and the whole pages->index->query chain."""
    import hashlib

    from top2vec_spark.api import Top2VecSpark

    docs = _docs(spark, sf_dir)
    pages = docs.select(
        F.format_string("https://example.com/%012d", F.col("doc_id")).alias(
            "url"
        ),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )
    eng = Top2VecSpark.from_pages(spark, pages, ascii_fast_path=True)
    tag = hashlib.sha1(f"pages:{sf_dir}".encode()).hexdigest()[:10]
    eng.build_index(
        f"/tmp/t2v_entry_pages_{tag}",
        resume=True,
        input_fingerprint=_input_fingerprint(docs),
        docs_per_shard=256,
        n_buckets=16,
    )
    res = eng.search_documents_by_keywords(
        ["table", "spark"], 10, return_documents=False, use_index=True
    )
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_vocab(_tokens(spark, sf_dir))


def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_doc_stats(_tokens(spark, sf_dir))


def _q_globals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = build_doc_stats(_tokens(spark, sf_dir))
    return ds.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("dl"), 6).alias("avgdl"),
    )


# ---------------------------------------------------------------------------
# Training-pipeline operators (dedup / text analysis / similarity)
# ---------------------------------------------------------------------------
def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from top2vec_spark.operators.dedup import dedup_exact

    return dedup_exact(_docs(spark, sf_dir)).select("doc_id")


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from top2vec_spark.operators.textquality import token_counts

    return token_counts(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens_ws", "n_tokens_bpe"
    )


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from top2vec_spark.operators.textquality import quality_features

    f = quality_features(_docs(spark, sf_dir))
    return f.select(
        "doc_id",
        "n_chars_q",
        "n_words",
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
        F.round("digit_ratio", 6).alias("digit_ratio"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("uniq_word_ratio", 6).alias("uniq_word_ratio"),
    )


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rows-only check (argmax-over-heuristics not robustly
    # SQL-portable across regex engines)
    from top2vec_spark.operators.textquality import lang_id

    return lang_id(_docs(spark, sf_dir)).select("doc_id", "lang_pred")


def _q_cosine_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from top2vec_spark.operators.similarity import cosine_topk_sql

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 7).first()["embedding"]
    return cosine_topk_sql(emb, [float(x) for x in qvec], 10, round_digits=6)


def _q_ivf_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 under the oracle: IVF-bucketed ANN probed with n_probe =
    n_cells is EXACT by construction (every cell scanned), so its
    top-10 must equal the brute-force cosine oracle — pinning the
    cell-assignment + pruning machinery, while recall at n_probe <
    n_cells is pytest-pinned separately."""
    from top2vec_spark.operators.similarity import ivf_build, ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    assigned, cents = ivf_build(emb, n_cells=8, sample=500, seed=7)
    # over-fetch unrounded, then round and re-limit: the k boundary is
    # decided on the ROUNDED value like the oracle (memory: float-score
    # oracle queries must round before ranking on both sides)
    res = ivf_topk(assigned, cents, qvec, 20, n_probe=8)
    return (
        res.select("vec_id", F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(10)
    )


def _q_hnsw_full_ef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 true-graph path under the oracle: the from-scratch sharded
    HNSW (operators/hnsw.py; reference hnswlib serving, top2vec.py:
    1710-1825) searched with ef = shard size is provably exhaustive
    (layer-0 backbone edge => connected base layer), so its top-10 must
    equal the brute-force cosine oracle exactly — pinning the graph
    build, blob (de)serialization, per-shard search, and the global
    shard merge. Recall at practical ef is pytest- and bench-pinned."""
    from top2vec_spark.operators.hnsw import hnsw_build, hnsw_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    index = hnsw_build(emb, n_shards=4, M=8, ef_construction=64)
    # over-fetch unrounded, then round and re-limit (same discipline as
    # ivf_full_probe_top10: the k boundary is decided on ROUNDED values
    # like the oracle)
    res = hnsw_topk(index, qvec, 20, ef=None)
    return (
        res.select("vec_id", F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(10)
    )


def _q_hnsw_many_full_ef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched graph serving under the oracle: hnsw_topk_many
    (operators/hnsw.py — many queries answered in ONE job, the
    wand_topk_many twin; reference serving loop over hnswlib
    knn_query, top2vec.py:2627-2640) at ef=None (per-shard exhaustive)
    must equal per-query brute cosine for EVERY query — pinning the
    shared-graph kernel, the per-query window merge, and the
    query_id plumbing. Top-5 per query on rounded scores (over-fetch
    unrounded k=10, round, re-rank — the ivf/hnsw row discipline)."""
    from pyspark.sql import Window as W

    from top2vec_spark.operators.hnsw import hnsw_build, hnsw_topk_many

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrows = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(3, 7, 11)).collect()
    }
    index = hnsw_build(emb, n_shards=4, M=8, ef_construction=64)
    res = hnsw_topk_many(
        index, {f"q{i}": v for i, v in sorted(qrows.items())}, 10, ef=None
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        res.select("query_id", "vec_id", F.round("score", 6).alias("score"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .drop("_rn")
        .orderBy("query_id", F.col("score").desc(), F.col("vec_id").asc())
    )


def _q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval under the oracle: reciprocal-rank fusion
    (operators/fusion.py; Cormack 2009, c=60) of the brute BM25 top-20
    (ranked on round-4 scores — the proven-parity ordering of
    `bm25_top10`) and the exact cosine top-20 (round-6, the
    `cosine_top10` ordering). Rank-based fusion makes the fused score
    a sum of at most two exact rationals — float addition of two terms
    is commutative, so the value is bit-identical cross-engine
    wherever the input RANKINGS agree. No reference analogue
    (Top2Vec searches are single-path, top2vec.py:2421-2495); engine
    addition for the training-data-pipeline brief."""
    from top2vec_spark.operators.fusion import rrf_fuse
    from top2vec_spark.operators.similarity import cosine_topk_sql

    lex = _bm25_query(["table", "spark"], [], 20)(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]
    ]
    vec = cosine_topk_sql(emb, qvec, 20, round_digits=6).select(
        F.col("vec_id").alias("doc_id"), "score"
    )
    fused = rrf_fuse({"lexical": lex, "vector": vec}, 10)
    return fused.select(
        "doc_id",
        F.round("rrf_score", 6).alias("score"),
        F.col("n_lists").cast("long").alias("n_lists"),
    ).orderBy(F.col("score").desc(), F.col("doc_id").asc())


def _q_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA moment pass under the oracle (operators/pca.py
    covariance_table — the distributed stage of the engine's UMAP
    substitute, reference top2vec.py:1541-1551): population covariance
    of the embedding columns, upper triangle, via ONE mapInPandas
    moments pass. DuckDB replays sum(x_i*x_j)/n - mean_i*mean_j with
    the same one-division-per-mean arithmetic; round-6 both sides
    absorbs summation-order ULPs."""
    from top2vec_spark.operators.pca import covariance_table

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # + 0.0 folds IEEE -0.0 to +0.0 (repr-visible to the driver's hash)
    return covariance_table(emb).select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        (F.round("cov", 6) + F.lit(0.0)).alias("cov"),
    )


def _q_hdbscan_core_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDBSCAN stage 1+2 under the oracle (operators/hdbscan.py
    knn_graph + core_distances; sklearn/hdbscan convention — core
    distance = distance to the min_samples-th NN counting self, i.e.
    kNN rank min_samples-1, ties by (dist, dst)). The Spark kernel
    computes d^2 = |q|^2 + |x|^2 - 2 q.x; the DuckDB side mirrors the
    same formula via list_dot_product so both engines share the
    cancellation behavior; round-4 absorbs BLAS-vs-left-fold ULPs."""
    from top2vec_spark.operators.hdbscan import core_distances, knn_graph

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    knn = knn_graph(emb, k=16)
    return core_distances(knn, min_samples=5).select(
        "vec_id", F.round("core_dist", 4).alias("core_dist")
    )


def _q_hdbscan_mutual_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDBSCAN stages 1-3 under the oracle (operators/hdbscan.py
    mutual_reachability; Campello 2013 d_mreach = max(core_a, core_b,
    d(a,b)) on the symmetrized k=16 kNN graph, min_samples=5).
    Stages 4-5 (Boruvka MST -> condense -> EOM) have no SQL
    re-expression and stay pinned by tests/test_hdbscan.py's exactness
    properties against an independent quadratic implementation."""
    from top2vec_spark.operators.hdbscan import (
        core_distances,
        knn_graph,
        mutual_reachability,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    knn = knn_graph(emb, k=16)
    core = core_distances(knn, min_samples=5)
    return mutual_reachability(knn, core).select(
        "src", "dst", F.round("w", 4).alias("w")
    )


def _q_discover_topic_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FULL density-discovery chain
    (top2vec.py:1480-1590) end-to-end: distributed PCA (UMAP
    substitute) -> distributed HDBSCAN (kNN mutual-reachability ->
    Boruvka MST -> EOM) -> original-dim topic centroids -> duplicate
    merge -> nearest-topic assignment -> size-renumbered topic sizes.

    The driver's embeddings table is deliberately isotropic (no dense
    regions — HDBSCAN correctly answers all-noise there), so this row
    PLANTS a clustering instead (the media_features precedent:
    synthesize inputs deterministically from doc_id): cluster c(doc) =
    0 for doc_id%10 in 0-4, 1 for 5-7, 2 for 8-9; embedding = 5*e_c +
    deterministic sub-0.1 noise from splitmix-style arithmetic on
    (doc_id, dim). The planted clusters are orthogonal and tight, so
    the chain must recover the partition EXACTLY — the DuckDB oracle
    is the planted truth (counts per cluster, size-desc renumbering),
    making the whole non-SQL pipeline answerable: any lost doc, split,
    merge, or mis-assignment changes the sizes. MST/EOM internals are
    additionally pinned by tests/test_hdbscan.py's exactness
    properties against an independent quadratic implementation."""
    import numpy as np
    import pandas as pd

    from top2vec_spark.api import Top2VecSpark

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    dim = 16

    def synth(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            ids = pdf["doc_id"].to_numpy().astype(np.int64)
            m = ids % 10
            c = np.where(m <= 4, 0, np.where(m <= 7, 1, 2))
            base = np.zeros((len(ids), dim))
            base[np.arange(len(ids)), c] = 5.0
            # deterministic pseudo-noise in [-0.1, 0.1): pure integer
            # arithmetic on (doc_id, dim index) — reproducible anywhere
            i = np.arange(dim, dtype=np.int64)
            h = (ids[:, None] * 2654435761 + i[None, :] * 40503) % 1000
            base += (h / 1000.0) * 0.2 - 0.1
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(map(list, base))}
            )

    emb = docs.select("doc_id").mapInPandas(
        synth, "vec_id long, embedding array<double>"
    )
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True)
    eng.discover_topics(emb)
    return eng.get_topic_sizes().select(
        F.col("topic_id").cast("long").alias("topic_id"),
        F.col("topic_size").cast("long").alias("topic_size"),
    )


def _q_d2v_subsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The doc2vec trainer's epoch-0 subsampling decisions
    (operators/doc2vec.py: word2vec keep-probability over the
    min-count vocab + the SQL-replayable MINSTD draw per (doc_id,
    sequence-position)) — every kept (doc_id, spos, term_id) row.
    Integer result, so the hash pins the keep-prob float arithmetic
    AND the RNG chain bit-for-bit against DuckDB's replay."""
    import pandas as pd

    from top2vec_spark.operators.doc2vec import keep_probs, subsampled_seq

    tokens = _tokens(spark, sf_dir)
    vocab = build_vocab(tokens)  # strict > DEFAULT_MIN_COUNT
    vrows = vocab.select("term_id", "cf").orderBy("term_id").collect()
    import numpy as np

    cf = np.array([r["cf"] for r in vrows], dtype=np.int64)
    keep = keep_probs(cf, sample=1e-3, total=int(cf.sum()))
    seqs = (
        tokens.join(F.broadcast(vocab.select("term", "term_id")), "term")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "term_id"))),
                lambda s: s["term_id"],
            ).alias("seq")
        )
    )

    def kept(pdfs):
        for pdf in pdfs:
            for did, seq in zip(pdf["doc_id"], pdf["seq"]):
                seq = np.asarray(seq, dtype=np.int64)
                pos = subsampled_seq(int(did), seq, keep, epoch=0, seed=1)
                if len(pos):
                    yield pd.DataFrame(
                        {
                            "doc_id": int(did),
                            "spos": pos,
                            "term_id": seq[pos],
                        }
                    )

    return seqs.mapInPandas(kept, "doc_id long, spos long, term_id long")


def _q_d2v_cluster_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full distributed PV-DBOW training (operators/doc2vec.py, L1 —
    reference top2vec.py:560-622) answered by a planted truth: three
    disjoint 5-word vocabularies assigned by doc_id (sizes 250/150/100
    at sf0.01), 12 deterministic tokens per doc. After training, the
    discovery chain (PCA -> HDBSCAN -> topic sizes) must recover the
    planted partition exactly — a doc vector landing nearer another
    group's docs, any split/merge, any lost doc changes the sizes, so
    the whole non-SQL training pipeline is answerable by the planted
    group counts (same oracle pattern as umap/discover rows)."""
    import numpy as np
    import pandas as pd

    from top2vec_spark.api import Top2VecSpark
    from top2vec_spark.operators.doc2vec import train_doc2vec

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    words = [
        "apple pear plum grape melon".split(),
        "iron copper zinc nickel cobalt".split(),
        "river lake ocean stream pond".split(),
    ]

    def synth(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            ids = pdf["doc_id"].to_numpy().astype(np.int64)
            m = ids % 10
            g = np.where(m <= 4, 0, np.where(m <= 7, 1, 2))
            out_d, out_p, out_t = [], [], []
            for did, gi in zip(ids, g):
                for pos in range(12):
                    out_d.append(did)
                    out_p.append(pos)
                    out_t.append(
                        words[gi][(did * 2654435761 + pos * 40503) % 5]
                    )
            yield pd.DataFrame(
                {"doc_id": out_d, "pos": out_p, "term": out_t}
            )

    tokens = docs.select("doc_id").mapInPandas(
        synth, "doc_id long, pos int, term string"
    )
    vocab = build_vocab(tokens, min_count=0)
    model = train_doc2vec(
        tokens, vocab, dim=12, window=4, sample=0.0, negative=5,
        epochs=80, alpha=0.5, seed=11,
    )
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True)
    eng.discover_topics(model.doc_vectors)
    return eng.get_topic_sizes().select(
        F.col("topic_id").cast("long").alias("topic_id"),
        F.col("topic_size").cast("long").alias("topic_size"),
    )


def _q_d2v_infer_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc2vec INFERENCE (operators/doc2vec.infer_doc_vectors — the
    reference's gensim ``infer_vector`` loop, add_documents
    top2vec.py:2026 / free-text queries 2489, as one distributed map):
    train on the planted corpus, infer vectors for a DISJOINT set of
    new docs (shifted ids, shifted token draws, same planted grouping),
    assign each inferred doc to its nearest TRAINED doc by cosine
    (assign_nearest), and count by the nearest doc's planted group.
    Any inferred vector landing nearer another group's docs changes
    the counts, so the whole frozen-model inference path is answered
    by the planted group sizes."""
    import numpy as np
    import pandas as pd

    from top2vec_spark.operators.doc2vec import (
        infer_doc_vectors,
        train_doc2vec,
    )
    from top2vec_spark.operators.similarity import assign_nearest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    words = [
        "apple pear plum grape melon".split(),
        "iron copper zinc nickel cobalt".split(),
        "river lake ocean stream pond".split(),
    ]

    def synth(shift_id: int, shift_tok: int):
        def gen(pdfs):
            for pdf in pdfs:
                if not len(pdf):
                    continue
                ids = pdf["doc_id"].to_numpy().astype(np.int64)
                m = ids % 10
                g = np.where(m <= 4, 0, np.where(m <= 7, 1, 2))
                d, p, t = [], [], []
                for did, gi in zip(ids, g):
                    for pos in range(12):
                        d.append(did + shift_id)
                        p.append(pos)
                        t.append(
                            words[gi][
                                (did * 2654435761 + pos * 40503 + shift_tok)
                                % 5
                            ]
                        )
                yield pd.DataFrame({"doc_id": d, "pos": p, "term": t})

        return gen

    train_toks = docs.mapInPandas(
        synth(0, 0), "doc_id long, pos int, term string"
    )
    vocab = build_vocab(train_toks, min_count=0)
    model = train_doc2vec(
        train_toks, vocab, dim=12, window=4, sample=0.0, negative=5,
        epochs=80, alpha=0.5, seed=11,
    )
    new_toks = docs.mapInPandas(
        synth(100000, 3), "doc_id long, pos int, term string"
    )
    inferred = infer_doc_vectors(model, new_toks, epochs=40, alpha=0.5)
    centroids = model.doc_vectors.select(
        F.col("vec_id").alias("label"), F.col("embedding").alias("centroid")
    )
    assigned = assign_nearest(inferred, centroids)
    m = F.col("assigned_label") % 10
    group = F.when(m <= 4, 0).when(m <= 7, 1).otherwise(2)
    return (
        assigned.select(group.cast("long").alias("group_id"))
        .groupBy("group_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _q_umap_cluster_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE distributed UMAP (operators/umap.py — the reference's
    actual reducer, top2vec.py:1541-1551, no PCA substitute) driving
    the same discovery chain: kNN -> umap-exact smooth-kNN fuzzy graph
    -> fuzzy-union symmetrization -> cross-entropy layout -> HDBSCAN
    over the 2-D LAYOUT -> topic sizes.

    Same planted-clustering contract as `discover_topic_sizes`
    (orthogonal tight clusters synthesized deterministically from
    doc_id): the layout optimizer is stochastic-free here (seeded
    negatives, PCA init), and the planted partition is the unique
    correct answer — any point flung out of its cluster by the layout,
    any split/merge, any lost doc changes the sizes, so the whole
    non-SQL UMAP pipeline is answerable by the planted truth. Stage
    internals are additionally pinned by tests/test_umap.py
    (bit-identical smooth-kNN vs a scalar umap-learn transcription,
    t-conorm symmetrization, driver==distributed optimizer)."""
    import numpy as np
    import pandas as pd

    from top2vec_spark.api import Top2VecSpark

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    dim = 16

    def synth(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            ids = pdf["doc_id"].to_numpy().astype(np.int64)
            m = ids % 10
            c = np.where(m <= 4, 0, np.where(m <= 7, 1, 2))
            base = np.zeros((len(ids), dim))
            base[np.arange(len(ids)), c] = 5.0
            i = np.arange(dim, dtype=np.int64)
            h = (ids[:, None] * 2654435761 + i[None, :] * 40503) % 1000
            base += (h / 1000.0) * 0.2 - 0.1
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(map(list, base))}
            )

    emb = docs.select("doc_id").mapInPandas(
        synth, "vec_id long, embedding array<double>"
    )
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True)
    eng.discover_topics(
        emb,
        umap_args={
            "n_components": 2,
            "n_neighbors": 15,
            "metric": "euclidean",
            "n_epochs": 120,
            "seed": 3,
        },
        reduction="umap",
    )
    return eng.get_topic_sizes().select(
        F.col("topic_id").cast("long").alias("topic_id"),
        F.col("topic_size").cast("long").alias("topic_size"),
    )


def _q_centroids_by_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    from top2vec_spark.operators.similarity import label_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c = label_centroids(emb)
    return c.select(
        "label", F.posexplode("centroid").alias("pos0", "comp")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.round("comp", 6).alias("comp"),
    )


def _q_assign_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from top2vec_spark.operators.similarity import assign_nearest, label_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return assign_nearest(emb, label_centroids(emb)).select(
        "vec_id", "assigned_label"
    )


def _q_assign_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 per-doc top-N topics (reference get_documents_topics
    num_topics>1, top2vec.py:1873-1958) under a full DuckDB oracle:
    top-3 nearest label centroids per vector, rank 1 = best, ties
    label ASC."""
    from top2vec_spark.operators.similarity import assign_topn, label_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return assign_topn(emb, label_centroids(emb), 3).select(
        "vec_id",
        F.col("rank").cast("int").alias("rank"),
        F.col("label").alias("topic_label"),
        F.round("score", 6).alias("score"),
    )


def _q_similar_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similar_words / search_words_by_keywords (reference
    top2vec.py:2947-3013) through the FULL api path: BM25 top-50 docs
    for the query, then BM25-weighted term co-occurrence, query terms
    excluded (P4 self-exclusion), top-10 words."""
    from top2vec_spark.api import Top2VecSpark

    eng = Top2VecSpark(spark, _docs(spark, sf_dir), ascii_fast_path=True)
    res = eng.search_words_by_keywords(["table", "spark"], 10)
    return res.select("term", F.round("score", 4).alias("score"))


def _q_dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2+D4 end-to-end under a real oracle: the corpus unioned with a
    shifted copy of itself (so every doc has exactly one true
    duplicate), MinHash signatures -> banded LSH candidate pairs ->
    EXACT n-gram Jaccard verification, keeping jaccard == 1.0 (shingle
    -set equality). LSH always buckets identical docs together
    (identical signatures), so recall of true duplicates is exact and
    the verifier discards the near-miss candidates — DuckDB oracles
    the same pairs via string 3-gram shingle-set equality."""
    from top2vec_spark.functions.tokenizer import sql_tokens_expr
    from top2vec_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard,
    )

    docs = _docs(spark, sf_dir)
    both = docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    ta = both.select("doc_id", sql_tokens_expr("text").alias("tokens")).cache()
    sigs = minhash_signatures(ta)
    cands = lsh_candidate_pairs(sigs)
    verified = ngram_jaccard(ta, cands.select("doc_a", "doc_b"))
    return (
        verified.filter(F.col("jaccard") >= 1.0)
        .select("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")
    )


def _q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — exact small-scale
    variant (operators/similarity.embedding_near_duplicates_exact);
    the LSH-bucketed scale path is pytest-pinned for recall against
    this. Threshold 0.35: the synthetic embeddings are well-separated
    (max pairwise cosine 0.51), so a production-style 0.95 threshold
    would make the check vacuous."""
    from top2vec_spark.operators.similarity import embedding_near_duplicates_exact

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_duplicates_exact(
        emb, threshold=0.35, round_digits=6
    ).orderBy("vec_id_a", "vec_id_b")


def _q_events_sliding_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2's rowsBetween frame semantics on the events table: per-user
    sliding mean of `value` over [-2, +2] rows ordered by (ts,
    event_id) — same codegen window-agg shape operators/windows.py
    uses over token vectors (which the DuckDB oracle can't express
    over arrays; scalars pin the frame arithmetic)."""
    from pyspark.sql import Window as W

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 2)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("sliding_mean"),
    )


def _q_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the events table (batch twin of
    the applyInPandasWithState streaming operator, which pytest pins
    against this)."""
    from top2vec_spark.operators.sessions import sessionize_batch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # Project the raw TIMESTAMP bounds to formatted strings: the
    # driver's value-hash serializes Spark and DuckDB timestamps
    # differently (values verified identical in round 2), so — like
    # every other oracled query — avoid raw timestamps in the compared
    # output. date_format on a TIMESTAMP_NTZ is timezone-independent
    # (formats the wall-clock fields), so this is stable regardless of
    # the gate session's spark.sql.session.timeZone.
    sess = sessionize_batch(ev, gap_seconds=1800)
    return sess.select(
        "user_id",
        "session_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias(
            "session_end"
        ),
        "n_events",
        "total_value",
    )


def _q_topic_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+W5 through the oracle: nearest-centroid assignment ->
    per-topic sizes -> renumber 0..k-1 by size desc (tie: old label
    asc)."""
    from top2vec_spark.operators.similarity import assign_nearest, label_centroids
    from top2vec_spark.operators.topics import renumber_topics_by_size, topic_sizes

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dt = assign_nearest(emb, label_centroids(emb)).select(
        F.col("vec_id").alias("doc_id"),
        F.col("assigned_label").alias("topic_id"),
        "score",
    )
    return topic_sizes(renumber_topics_by_size(dt)).select(
        "topic_id", "topic_size"
    )


_TOPIC_ENGINES: dict = {}


def _topic_engine(spark: SparkSession, sf_dir: str):
    """One compute_topics engine per sf_dir, shared READ-ONLY by the
    topic-layer queries (topic_distribution, docs_by_topic,
    docs_topics_top2, incremental_topic_sizes — the last returns a NEW
    engine from add_documents, never mutating this one). Saves 3
    redundant corpus tokenizations per gate run."""
    eng = _TOPIC_ENGINES.get(sf_dir)
    if eng is None:
        from top2vec_spark.api import Top2VecSpark

        eng = Top2VecSpark(spark, _docs(spark, sf_dir), ascii_fast_path=True)
        eng.compute_topics(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        )
        _TOPIC_ENGINES[sf_dir] = eng
    return eng


def _q_sliding_vec_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 sliding_window_mean under a full DuckDB oracle: the
    embeddings table re-keyed as a long-format (doc_id, pos, vec)
    token-vector table (doc_id = vec_id % 23 gives ragged doc lengths
    21-22, exercising the right-aligned last window), window=8
    stride=5 — per-window mean vectors flattened to (doc, window,
    start, dim, value)."""
    from pyspark.sql import Window as W

    from top2vec_spark.operators.windows import sliding_window_mean

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    tok_vecs = emb.select(
        (F.col("vec_id") % 23).alias("doc_id"),
        (
            F.row_number().over(
                W.partitionBy(F.col("vec_id") % 23).orderBy("vec_id")
            )
            - 1
        ).alias("pos"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    sw = sliding_window_mean(tok_vecs, window=8, stride=5)
    return sw.select(
        "doc_id",
        F.col("window_id").cast("long").alias("window_id"),
        F.col("start").cast("long").alias("start"),
        F.posexplode("vec").alias("dim0", "v"),
    ).select(
        "doc_id",
        "window_id",
        "start",
        (F.col("dim0") + 1).cast("long").alias("dim"),
        F.round("v", 5).alias("v"),
    )


def _q_fingerprint_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 fingerprint as a dup-grouping oracle: the corpus unioned
    with a whitespace-perturbed copy of itself (leading/trailing pad +
    doubled internal spaces — content-identical after the
    fingerprint's whitespace normalization), fp64 grouping -> each doc
    mapped to the min doc_id sharing its fingerprint. DuckDB groups by
    the same normalized-text key, so the row is green iff the
    normalization semantics match and xxhash64 is collision-free on
    the corpus."""
    from top2vec_spark.operators.textquality import fingerprint

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    pert = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.lit("  "), F.regexp_replace("text", " ", "  "), F.lit("  ")
        ).alias("text"),
    )
    fp = fingerprint(docs.unionByName(pert))
    canon = fp.groupBy("fp64").agg(F.min("doc_id").alias("canonical_id"))
    return fp.join(canon, "fp64").select("doc_id", "canonical_id")


def _q_quality_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming quality monitor
    (streaming/monitor.quality_window_stats — pytest pins streaming
    output equal to this) under a DuckDB oracle: documents get a
    deterministic synthetic event time (epoch 1767225600 + 37s per
    doc_id, mod 2h), 1-minute event-time windows keyed by lang.
    Window bounds are compared as epoch seconds (timezone- and
    serialization-independent)."""
    from top2vec_spark.streaming.monitor import quality_window_stats

    docs = _docs(spark, sf_dir)
    pages = docs.select(
        F.timestamp_seconds(
            F.lit(1767225600) + (F.col("doc_id") * 37) % 7200
        ).alias("warc_ts"),
        "lang",
        "text",
    )
    qw = quality_window_stats(pages, window="1 minute")
    return qw.select(
        F.col("win.start").cast("long").alias("win_start"),
        "lang",
        "n_pages",
        F.round("avg_chars", 6).alias("avg_chars"),
        F.round("avg_alpha_ratio", 6).alias("avg_alpha_ratio"),
        F.col("n_short").cast("long").alias("n_short"),
    )


def _q_topic_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 get_documents_topic_distribution through the FULL api path
    (compute_topics from the label column -> renumber by size ->
    per-topic centroids of ASSIGNED members -> clipped, sum-normalized
    similarity of each requested doc to every topic centroid). DuckDB
    replicates the whole chain; probabilities rounded to 6."""
    eng = _topic_engine(spark, sf_dir)
    dist = eng.get_documents_topic_distribution([0, 1, 2, 3, 4])
    return dist.select(
        "doc_id",
        F.col("topic_id").cast("long").alias("topic_id"),
        F.round("probability", 6).alias("probability"),
    )


def _q_smooth_vec_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 smooth_adjacent over VECTORS (events_sliding_mean pins the
    frame arithmetic on scalars; this oracles the actual vector path:
    L2-normalize, posexplode, avg over [-2,+2] rows per (doc, dim))."""
    from pyspark.sql import Window as W

    from top2vec_spark.operators.windows import smooth_adjacent

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    tok_vecs = emb.select(
        (F.col("vec_id") % 23).alias("doc_id"),
        (
            F.row_number().over(
                W.partitionBy(F.col("vec_id") % 23).orderBy("vec_id")
            )
            - 1
        ).alias("pos"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    sm = smooth_adjacent(tok_vecs, w=2, normalize=True)
    return sm.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.posexplode("vec").alias("dim0", "v"),
    ).select(
        "doc_id",
        "pos",
        (F.col("dim0") + 1).cast("long").alias("dim"),
        F.round("v", 5).alias("v"),
    )


def _q_simhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 SimHash end-to-end under a token-SET-equality oracle: corpus
    unioned with an exact copy of itself, fingerprints -> 16-bit-band
    LSH candidates -> exact hamming verify at max_hamming=0 -> exact
    token-set verification (hamming-0 is NOT equivalent to set
    equality — near sets can vote to the same fingerprint, so like
    every sketch pipeline the candidates get an exact verify stage,
    the D4 pattern). Identical sets always produce identical
    fingerprints, so recall of true set-duplicates is exact;
    bucket_cap is lifted for the small-scale exactness pin (the capped
    degrade path is pytest-covered). DuckDB pairs docs whose sorted
    distinct token lists are equal."""
    from top2vec_spark.functions.tokenizer import sql_tokens_expr
    from top2vec_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_near_duplicates,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    both = docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    ta = both.select(
        "doc_id", sql_tokens_expr("text").alias("tokens")
    ).cache()
    fps = simhash_fingerprints(ta)
    cands = simhash_near_duplicates(fps, max_hamming=0, bucket_cap=10**6)
    tset = ta.select(
        "doc_id",
        F.array_sort(F.array_distinct("tokens")).alias("tset"),
    )
    return (
        cands.join(tset.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(
            tset.select(
                F.col("doc_id").alias("doc_b"), F.col("tset").alias("tset_b")
            ),
            "doc_b",
        )
        .filter(F.col("tset") == F.col("tset_b"))
        .select("doc_a", "doc_b")
    )


def _q_noise_topic_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 cluster-noise semantics under a full oracle (reference
    top2vec.py:1046-1062 via api.compute_topics, api.py:438-448):
    label 9 is relabeled -1 (HDBSCAN noise) — noise contributes to NO
    centroid, but every doc (noise included) is still assigned to its
    nearest remaining topic; topics renumbered by size."""
    from top2vec_spark.operators.similarity import assign_nearest, label_centroids
    from top2vec_spark.operators.topics import renumber_topics_by_size

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "label",
        F.when(F.col("label") == 9, F.lit(-1)).otherwise(F.col("label")),
    )
    cents = label_centroids(emb.filter(F.col("label") != -1))
    dt = assign_nearest(emb, cents).select(
        F.col("vec_id").alias("doc_id"),
        F.col("assigned_label").alias("topic_id"),
        "score",
    )
    return renumber_topics_by_size(dt).select(
        "doc_id",
        F.col("topic_id").cast("long").alias("topic_id"),
        F.round("score", 6).alias("score"),
    )


def _q_topic_merge_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 duplicate-topic merge (reference top2vec.py:1064-1086:
    dbscan eps=1-threshold over topic vectors == connected components
    of the cosine>threshold graph, merged into the smallest member
    id). Engine: label_centroids -> merge_duplicate_topics union-find
    (topics.py:151). DuckDB recomputes the centroids, the thresholded
    similarity graph, and the components via a recursive
    reachability CTE (min reachable id == union-find root, because
    every union parents the larger root under the smaller).
    threshold=0.2 sits >=0.003 away from every centroid-pair cosine
    at sf0.01/sf0.001, so both engines see the identical graph."""
    import numpy as np

    from top2vec_spark.operators.similarity import label_centroids
    from top2vec_spark.operators.topics import merge_duplicate_topics

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = {
        int(r["label"]): np.array(r["centroid"])
        for r in label_centroids(emb).collect()
    }
    mapping = merge_duplicate_topics(cents, threshold=0.2)
    return spark.createDataFrame(
        sorted(mapping.items()), "topic_id long, merged_id long"
    )


def _q_hierarchy_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7/M4/K6 one-step hierarchical topic reduction under a DuckDB
    oracle (reference top2vec.py:2270-2418): reduce n topics to n-1 —
    the smallest topic (min size, tie -> smaller id; K6's iterative
    min-finding rule) merges into its most-cosine-similar other topic
    (tie -> smaller id) via the size-weighted centroid mean (M4),
    renormalized. DuckDB replays the same step from the embeddings
    table: centroids + sizes -> argmin/argmax selection -> weighted
    mean -> renormalize. Output (label, members, dim, val): surviving
    topics with their member lists and centroid components; round-4
    absorbs cross-engine mean/normalize sum-order noise, and the
    selection margins (distinct synthetic clusters) dwarf 1 ulp —
    pinned by the value hash itself."""
    import numpy as np

    from top2vec_spark.operators import topics as T
    from top2vec_spark.operators.similarity import label_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = {
        int(r["label"]): np.array(r["centroid"])
        for r in label_centroids(emb).collect()
    }
    sizes = {
        int(r["label"]): int(r["n"])
        for r in emb.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    reduced, hierarchy = T.hierarchical_topic_reduction(
        cents, sizes, len(cents) - 1
    )
    rows = []
    for label, members in zip(sorted(reduced), hierarchy):
        mstr = ",".join(str(m) for m in members)
        for d, x in enumerate(reduced[label]):
            rows.append((label, mstr, d, float(x)))
    raw = spark.createDataFrame(
        rows, "label long, members string, dim long, val double"
    )
    # F.round (HALF_UP == half-away-from-zero, like DuckDB), NOT
    # Python round (half-even)
    return raw.withColumn("val", F.round("val", 4))


def _q_wordcloud_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/M5 wordcloud export (reference generate_topic_wordcloud,
    top2vec.py:3188-3236): softmax over topic 0's stored c-TF-IDF
    word scores — the exact frequencies dict the reference feeds
    ``WordCloud().generate_from_frequencies``. Through the FULL api
    path (compute_topics -> topic_words -> generate_topic_wordcloud);
    DuckDB recomputes the whole chain (centroid assign -> renumber ->
    ctfidf -> softmax). round_digits=6 on both sides BEFORE the
    softmax so the exponentials see identical inputs; at sf0.01 the
    vocab (30 terms) is under the top-50 cutoff, so dict membership
    has no rank-boundary sensitivity."""
    eng = _topic_engine(spark, sf_dir)
    d = eng.generate_topic_wordcloud(0, round_digits=6)
    return spark.createDataFrame(
        [(t, round(w, 6)) for t, w in sorted(d.items())],
        "term string, weight double",
    )


def _q_incremental_topic_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 through the FULL api path (reference add_documents extends
    doc_top without retraining topic vectors, top2vec.py:2030-2050):
    compute_topics on the base embeddings, then add_documents with a
    REVERSED-embedding copy of the corpus — new docs are assigned to
    their nearest EXISTING (post-renumber, recomputed) topic centroid
    and sizes grow incrementally; centroids/words are not retrained.
    DuckDB replicates: base chain -> recomputed centroids -> assign
    reversed copies -> summed sizes."""
    docs = _docs(spark, sf_dir)
    eng = _topic_engine(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    new_docs = docs.withColumn(
        "doc_id", (F.col("doc_id") + 100000).cast("long")
    )
    new_emb = emb.select(
        (F.col("vec_id") + 100000).cast("long").alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
    )
    eng2 = eng.add_documents(new_docs, new_embeddings=new_emb)
    return eng2.get_topic_sizes().select(
        F.col("topic_id").cast("long").alias("topic_id"), "topic_size"
    )


def _q_chunks_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7/H3 custom-chunker seam (reference document_chunker callable,
    top2vec.py:365-415) under a DuckDB oracle: a user Python callable
    (fixed 80-char slices) through the Arrow-batched mapInPandas seam;
    the oracle recomputes the slices with substring arithmetic."""
    from top2vec_spark.operators.chunks import custom_chunks

    def chunker(text: str) -> list:
        return [text[i : i + 80] for i in range(0, len(text), 80)]

    ch = custom_chunks(_docs(spark, sf_dir), chunker)
    return ch.select(
        "doc_id", F.col("chunk_id").cast("long").alias("chunk_id"), "chunk_text"
    )


def _q_docs_by_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3+K3 through the api (reference search_documents_by_topic,
    top2vec.py:2832-2847): ALL members of topic 1 by stored assignment
    score — num_docs = the topic's exact size (the reference's
    _validate_topic_search caps at it), so there is no float-boundary
    cut and the order-insensitive hash is stable."""
    eng = _topic_engine(spark, sf_dir)
    size1 = (
        eng.get_topic_sizes().filter(F.col("topic_id") == 1).collect()[0][
            "topic_size"
        ]
    )
    res = eng.search_documents_by_topic(1, int(size1), return_documents=False)
    return res.select("doc_id", F.round("score", 6).alias("score"))


def _q_vocab_custom_tokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 tokenizer hook (reference tokenizer callable,
    top2vec.py:95-133) under a DuckDB oracle: a user Python callable
    (lowercase, split on non-letters, keep len>=3) through the engine's
    row-at-a-time seam; vocab with strict '>' min_count=5 replicated
    with regexp_split arithmetic."""
    import re

    from top2vec_spark.api import Top2VecSpark

    pat = re.compile(r"[^a-z]+")

    def tok(t: str) -> list:
        return [w for w in pat.split((t or "").lower()) if len(w) >= 3]

    eng = Top2VecSpark(spark, _docs(spark, sf_dir), min_count=5, tokenizer=tok)
    return eng.vocab.select("term", "term_id", "df", "cf")


def _q_vocab_sentencized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4/T7 sentencizer seam (reference sentencizer callable,
    top2vec.py:365-370, 550-558, 684-689) under a DuckDB oracle: a
    deterministic '.'-splitter through the engine's pre-tokenize
    sentence seam, each sentence then tokenized as its own chunk-doc
    (composite id doc_id*100000+sent_id) and rolled into a
    min_count=2 vocabulary — df counts SENTENCES, not documents, and
    the delimiter ' table ' is a frequent corpus token (the synthetic
    text has no '.'), so the row only passes if the seam really split
    before tokenizing: 'table' mostly vanishes from the vocab and
    every df shifts from document to sentence granularity."""
    from top2vec_spark.operators.chunks import sentencize
    from top2vec_spark.operators.corpus_stats import build_vocab
    from top2vec_spark.operators.tokens import tokenize_docs

    sents = sentencize(_docs(spark, sf_dir), lambda t: t.split(" table "))
    sdocs = sents.select(
        (F.col("doc_id") * 100000 + F.col("sent_id")).alias("doc_id"),
        F.col("sentence").alias("text"),
    )
    toks = tokenize_docs(sdocs, ascii_fast_path=True)
    return build_vocab(toks, min_count=2).select("term", "term_id", "df", "cf")


def _q_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference get_document_tokens (top2vec.py:1694-1706) through
    the api: ordered per-document token arrays from the long tokens
    table; DuckDB recomputes the same filtered token lists directly
    from text.  The API keeps its typed array<string> return; the
    driver row projects `array_join(tokens, ' ')` because the driver's
    canonicalizer sorts result rows with pandas sort_values, which
    cannot hash list cells (round-4 red row)."""
    from top2vec_spark.api import Top2VecSpark

    eng = Top2VecSpark(spark, _docs(spark, sf_dir), min_count=0)
    return eng.get_document_tokens().select(
        "doc_id", F.array_join("tokens", " ").alias("tokens_joined")
    )


def _q_doc_token_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference get_document_token_topic_assignment
    (top2vec.py:1682-1692) through the FULL api path: topics computed
    from the embeddings label column (nearest-centroid -> renumber by
    size), each TERM assigned its argmax c-TF-IDF topic (rank on the
    6-digit-rounded score so 1-ulp log noise can't flip the argmax
    against DuckDB; tie -> smaller topic_id), joined onto the long
    tokens table — one row per (doc_id, pos) token occurrence."""
    eng = _topic_engine(spark, sf_dir)
    out = eng.get_document_token_topic_assignment(round_digits=6)
    return out.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        "term",
        F.col("topic_id").cast("long").alias("topic_id"),
        "score",
    )


def _q_embed_hook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 embedding-model hook under a DuckDB oracle: a deterministic
    INTEGER-VALUED user callable (dim 4: [len(text), count('a')+1,
    count('e')+1, 7]) registered via set_embedding_model and executed
    distributed through embed_documents (reference _embed_documents,
    top2vec.py:1022-1048: batches of 32 inside mapInPandas, row-wise
    L2 normalize, float32 storage).

    Integer features make the whole numeric chain bit-identical
    cross-engine: the squares and their 4-term sum are exact in
    float64 (< 2^53), IEEE sqrt and divide are correctly rounded, and
    the float32 cast quantizes identically — the oracle mirrors the
    cast with CAST(... AS REAL). Exploded to (vec_id, dim, val)
    because the driver canonicalizer cannot sort array cells
    (round-4 lesson)."""
    import numpy as np

    from top2vec_spark.api import Top2VecSpark

    eng = Top2VecSpark(spark, _docs(spark, sf_dir), min_count=0)

    def model(texts):
        return np.array(
            [
                [
                    float(len(t)),
                    float(t.count("a") + 1),
                    float(t.count("e") + 1),
                    7.0,
                ]
                for t in texts
            ]
        )

    eng.set_embedding_model(model)
    out = eng.embed_documents()
    return out.select(
        "vec_id", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("val").cast("double"), 6).alias("val"),
    )


def _q_ctx_chunk_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 execution seam + W1 chain under a DuckDB oracle (reference
    contextual_token_embeddings embedding.py:51-109 ->
    sliding_window_average embedding.py:112-144, wired at
    top2vec.py:747-760): a deterministic user token-embedding callable
    (tokens = regexp [a-z]+ of lower(text); per-token vec =
    [len, count('a')+1, count('e')+1, 7]) runs distributed through
    embed_document_tokens, then contextual_document_vectors computes
    normalized sliding-window chunk vectors (window 8, stride 5, last
    window right-aligned). DuckDB replays the whole chain from text.

    Exactness: integer token features -> window sums exact in double
    at any accumulation order, ONE correctly-rounded division per
    mean (Spark Average and DuckDB avg both divide the exact sum
    once), and both norms are explicit left-folds over the 4 dims
    (Spark F.aggregate; the oracle's m0*m0 + m1*m1 + ... left-assoc)
    — bit-identical before the shared round-6. Exploded to
    (doc_id, chunk_id, start, dim, val): no array cells (round-4
    canonicalizer lesson)."""
    import re

    from top2vec_spark.api import Top2VecSpark

    eng = Top2VecSpark(spark, _docs(spark, sf_dir), min_count=0)

    def model(texts):
        out = []
        for t in texts:
            toks = re.findall(r"[a-z]+", t.lower())
            out.append(
                (
                    toks,
                    [
                        [
                            float(len(tok)),
                            float(tok.count("a") + 1),
                            float(tok.count("e") + 1),
                            7.0,
                        ]
                        for tok in toks
                    ],
                )
            )
        return out

    eng.set_token_embedding_model(model)
    eng.embed_document_tokens()
    out = eng.contextual_document_vectors(
        window_size=8, stride=5, register=False
    )
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start"),
        F.posexplode("vec").alias("dim", "val"),
    ).select(
        "doc_id",
        "chunk_id",
        "start",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("val"), 6).alias("val"),
    )


def _q_ctx_word_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 execution seam under a DuckDB oracle (reference
    average_embeddings(self.vocab), embedding.py:9-48 at
    top2vec.py:738-740): vocab_word_vectors runs a word-level user
    token model (ONE token per word = the word itself; vec =
    [len, count('a')+1, count('e')+1, 7]) distributed over the vocab
    table, means over its tokens (identity here — integer chain stays
    exact through numpy), L2-normalizes, float32-stores, and registers
    the word-vector table. The oracle recomputes the vocab
    (min_count strict >2, the engine's P1 filter) and every vector
    from the term string; CAST(.. AS REAL) mirrors the float32 store
    (the embed_hook argument). Exploded to (term, dim, val)."""
    from top2vec_spark.api import Top2VecSpark

    eng = Top2VecSpark(spark, _docs(spark, sf_dir), min_count=2)

    def model(texts):
        return [
            (
                [t],
                [
                    [
                        float(len(t)),
                        float(t.count("a") + 1),
                        float(t.count("e") + 1),
                        7.0,
                    ]
                ],
            )
            for t in texts
        ]

    eng.set_token_embedding_model(model)
    out = eng.vocab_word_vectors()
    return out.select(
        "term", F.posexplode("vec").alias("dim", "val")
    ).select(
        "term",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("val").cast("double"), 6).alias("val"),
    )


def _q_ctx_topic_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contextual per-document topic distribution under a DuckDB
    oracle (reference calculate_documents_topic_distributions,
    top2vec.py:805-856, token assignment via
    _calculate_documents_topic top2vec.py:1081-1146): the same
    deterministic token model as ctx_chunk_vectors runs distributed
    through embed_document_tokens; every token is assigned its
    argmax-np.inner topic against three fixed INTEGER topic vectors
    (first-max tie-break = smaller topic_id, pinned by a planted tie
    in pytest); per doc the engine aggregates token_count, probability
    (count / doc token total, reference line 854) and relevance (mean
    token score). DuckDB replays the whole chain from text.

    Exactness: integer token features x integer topic vectors ->
    every token score is an exact small integer in double; counts are
    exact; probability and relevance are each ONE correctly-rounded
    double division of exact integers (Spark Average and DuckDB avg
    both divide the exact sum once) — bit-identical before the shared
    round-6. Long form: absent (doc, topic) pairs are the reference
    dense matrices' zeros (documented shape delta)."""
    import re

    from top2vec_spark.api import Top2VecSpark

    eng = Top2VecSpark(spark, _docs(spark, sf_dir), min_count=0)

    def model(texts):
        out = []
        for t in texts:
            toks = re.findall(r"[a-z]+", t.lower())
            out.append(
                (
                    toks,
                    [
                        [
                            float(len(tok)),
                            float(tok.count("a") + 1),
                            float(tok.count("e") + 1),
                            7.0,
                        ]
                        for tok in toks
                    ],
                )
            )
        return out

    eng.set_token_embedding_model(model)
    eng.embed_document_tokens()
    tv = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 2.0, -1.0, 0.0]),
            (2, [-1.0, 0.0, 3.0, 0.0]),
        ],
        "label long, centroid array<double>",
    )
    out = eng.calculate_documents_topic_distributions(topic_vectors=tv)
    return out.select(
        "doc_id",
        F.col("topic_id").cast("long").alias("topic_id"),
        F.col("token_count").cast("long").alias("token_count"),
        F.round("probability", 6).alias("probability"),
        F.round("relevance", 6).alias("relevance"),
    )


def _q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pretraining sequence packing (operators/packing.py —
    concat-and-chunk: documents in doc_id order, one '<eos>' slot
    after each, stream sliced every 128 slots) under a DuckDB oracle
    that replays the layout from raw text with one window cumsum.
    The engine's two-phase distributed prefix-sum (range partition +
    driver offsets, no single-partition window) must produce the
    EXACT same (seq_id, pos, doc_id, term) assignment as the oracle's
    serial scan — pure integer arithmetic, so the hash pins the whole
    layout. Positions are the engine tokenizer's post-filter
    positions (same CTE as doc_tokens/vocab)."""
    from top2vec_spark.api import Top2VecSpark
    from top2vec_spark.operators.packing import pack_sequences

    eng = Top2VecSpark(spark, _docs(spark, sf_dir), min_count=0)
    out = pack_sequences(eng.tokens, seq_len=128)
    return out.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        F.col("pos").cast("long").alias("pos"),
        "doc_id",
        "term",
    )


def _q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (operators/sampling.py)
    under a DuckDB oracle: the two-round Knuth multiplicative chain
    (every intermediate < 2^63, so BIGINT arithmetic replays it
    bit-identically) bucketed 0..9999, default 98/1/1 cutoffs. Hash
    pins every document's split."""
    from top2vec_spark.operators.sampling import split_corpus

    return split_corpus(_docs(spark, sf_dir))


def _q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pretraining mixture (operators/sampling.py
    mix_corpora — weighted sources with multi-epoch repetition for
    under-sized sources and hash-subsampling for over-sized ones)
    under a DuckDB oracle. Two sources are carved from the documents
    table by doc_id parity; n_tokens is the engine tokenizer count;
    the budget is 4x the corpus total (an INTEGER, and 0.75/0.25
    weights are dyadic), so every epoch/cutoff value is identical
    double arithmetic in both engines; the remainder filter is the
    same pure integer hash as corpus_split. The hash pins every
    (source, epoch, doc) occurrence."""
    from top2vec_spark.api import Top2VecSpark
    from top2vec_spark.operators.sampling import mix_corpora

    eng = Top2VecSpark(spark, _docs(spark, sf_dir), min_count=0)
    lens = eng.tokens.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    total = int(lens.agg(F.sum("n_tokens")).collect()[0][0])
    out = mix_corpora(
        {
            "a": lens.filter(F.col("doc_id") % 2 == 0),
            "b": lens.filter(F.col("doc_id") % 2 != 0),
        },
        {"a": 0.75, "b": 0.25},
        token_budget=4 * total,
    )
    return out.select(
        "source",
        F.col("epoch").cast("long").alias("epoch"),
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


def _q_hashed_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing document vectors (operators/hashing.py — the
    turnkey model-free embedding) under a DuckDB oracle: tf per
    (doc, term) -> vocab term_id (row_number over (df DESC, term)) ->
    integer bucket/sign multiplicative hashes -> per-bucket signed
    sums -> dense L2-normalized float32 vectors, dim=32. Integer tf
    weights make the chain bit-identical cross-engine (exact integer
    bucket sums and squares, correctly-rounded sqrt/divide, CAST AS
    REAL mirroring the float32 store) — the embed_hook argument.
    Exploded to (vec_id, dim, val)."""
    from top2vec_spark.api import Top2VecSpark

    eng = Top2VecSpark(
        spark, _docs(spark, sf_dir), min_count=0, ascii_fast_path=True
    )
    out = eng.hashed_document_vectors(dim=32)
    return out.select(
        "vec_id", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("val").cast("double"), 6).alias("val"),
    )


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 multimodal pipeline under a DuckDB oracle: per doc_id a PPM
    image (4x8, pixel[y,x,c] = (doc_id*7+y*31+x*13+c*97) mod 256) and
    a PCM-16 WAV clip (400 samples at 8 kHz, s[i] = (doc_id*31+i*17)
    mod 4096 - 2048) are ENCODED to real container bytes, pushed
    through the REAL pure-numpy decoders (multimodal.decode_ppm /
    decode_wav_pcm16 — operators/multimodal.py:48,128) inside the
    mapInPandas feature kernels, and the oracle recomputes every
    feature from the generating arithmetic — so the row fails if
    encode, decode, batch shape, or the feature math drifts."""
    import numpy as np
    import pandas as pd

    from top2vec_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        encode_ppm,
        encode_wav_pcm16,
        image_features,
    )

    H, W, N, RATE = 4, 8, 400, 8000

    def mk(pdfs):
        for pdf in pdfs:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                yy, xx, cc = np.meshgrid(
                    np.arange(H), np.arange(W), np.arange(3), indexing="ij"
                )
                img = ((did * 7 + yy * 31 + xx * 13 + cc * 97) % 256).astype(
                    np.uint8
                )
                i = np.arange(N)
                s = ((did * 31 + i * 17) % 4096 - 2048).astype(np.int16)
                rows.append((did * 2, "image", encode_ppm(img), None))
                rows.append((did * 2 + 1, "audio", encode_wav_pcm16(s, RATE), None))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    media = _docs(spark, sf_dir).select("doc_id").mapInPandas(mk, MEDIA_SCHEMA)
    imgf = image_features(media, use_real_decoder=True).select(
        (F.col("media_id") / 2).cast("long").alias("doc_id"),
        *[
            F.round(F.col("features")[i], 6).alias(n)
            for i, n in enumerate(
                ["mean_r", "mean_g", "mean_b", "std_r", "std_g", "std_b"]
            )
        ],
    )
    audf = audio_features(media).select(
        ((F.col("media_id") - 1) / 2).cast("long").alias("doc_id"),
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        F.round("zcr", 6).alias("zcr"),
        F.round("peak", 6).alias("peak"),
    )
    return imgf.join(audf, "doc_id")


def _q_docs_topics_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/W4 through the api (reference get_documents_topics with
    num_topics>1, top2vec.py:1873-1958): top-2 topics per requested
    doc, scored against the RECOMPUTED (post-renumber) topic
    centroids. DuckDB replicates the full chain."""
    eng = _topic_engine(spark, sf_dir)
    res = eng.get_documents_topics(list(range(20)), num_topics=2)
    return res.select(
        "doc_id",
        F.col("rank").cast("int").alias("rank"),
        F.col("topic_id").cast("long").alias("topic_id"),
        F.round("score", 6).alias("score"),
    )


def _q_bigram_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from top2vec_spark.operators.phrases import find_phrases

    ph = find_phrases(_tokens(spark, sf_dir), min_count=2, threshold=0.0005)
    return ph.select(
        "phrase", "pair_count", F.round("score", 6).alias("score")
    )


def _q_chunks_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from top2vec_spark.operators.chunks import sequential_chunks
    from top2vec_spark.functions.tokenizer import sql_tokens_expr

    arr = _docs(spark, sf_dir).select(
        "doc_id", sql_tokens_expr("text").alias("tokens")
    )
    ch = sequential_chunks(arr, chunk_length=20)
    return ch.select(
        "doc_id",
        "chunk_id",
        F.size("chunk").alias("n_chunk_tokens"),
        F.element_at("chunk", 1).alias("first_tok"),
    )


def _q_ctfidf_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c-TF-IDF topic words with lang as the class column (fully
    SQL-expressible; the embedding-cluster variant is pytest-covered)."""
    from top2vec_spark.operators.topics import topic_words_ctfidf

    docs = _docs(spark, sf_dir)
    tf = (
        _tokens(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dt = docs.select("doc_id", F.col("lang").alias("topic_id"))
    words = topic_words_ctfidf(tf, dt, top_n=10, round_digits=6)
    return words.select(
        F.col("topic_id").alias("lang"), "rank", "term", "ctfidf"
    )


def _q_bm25_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ngram_vocab path end-to-end: mined bigrams enter the vocabulary
    and the postings index as first-class terms, so the multi-word
    keyword "table hash" retrieves through WAND exactly like a unigram
    (reference top2vec.py:876-890 re-expression; augment semantics
    documented in operators/phrases.tokens_with_phrases)."""
    import hashlib

    from top2vec_spark.operators.phrases import find_phrases, tokens_with_phrases
    from top2vec_spark.operators.wand import wand_topk
    from top2vec_spark.plans.build import IndexBuilder

    docs = _docs(spark, sf_dir)
    tokens = tokenize_docs(docs, ascii_fast_path=True).cache()
    ph = find_phrases(tokens, min_count=2, threshold=0.0005)
    aug = tokens_with_phrases(tokens, ph).cache()
    vocab = build_vocab(aug)
    ds = build_doc_stats(aug)
    tag = hashlib.sha1(f"phr:{sf_dir}".encode()).hexdigest()[:10]
    index = IndexBuilder(
        spark,
        f"/tmp/t2v_entry_phr_{tag}",
        docs_per_shard=256,
        n_buckets=16,
        input_fingerprint=_input_fingerprint(docs),
    ).build(aug, vocab, ds, resume=True)
    w = term_weights(spark, index.vocab, ["table hash"], [])
    res = wand_topk(spark, index, w, index.globs, 10)
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_bm25_append_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 incremental append under the FULL oracle: build the index on
    docs 0..255 only (4 full 64-doc shards), append_documents docs
    256..499 as an incremental epoch (plans/build.py append path: new
    doc-shards only, vocab merge, exact incremental globals), then
    answer WAND top-10 — which must equal the oracle's ranking over
    the WHOLE corpus, proving append ≡ rebuild through the driver
    gate (reference add_documents, top2vec.py:2003-2062). The epoch is
    named, so re-runs replay as no-ops (crash-safe idempotency)."""
    import hashlib

    from top2vec_spark.operators.wand import wand_topk
    from top2vec_spark.plans.build import IndexBuilder

    docs = _docs(spark, sf_dir)
    base = docs.filter(F.col("doc_id") < 256)
    rest = docs.filter(F.col("doc_id") >= 256).select("doc_id", "text")
    tokens = tokenize_docs(base, ascii_fast_path=True).cache()
    tag = hashlib.sha1(f"app:{sf_dir}".encode()).hexdigest()[:10]
    index = IndexBuilder(
        spark,
        f"/tmp/t2v_entry_app_{tag}",
        docs_per_shard=64,
        n_buckets=16,
        input_fingerprint=_input_fingerprint(base),
    ).build(tokens, build_vocab(tokens), build_doc_stats(tokens), resume=True)
    index = index.append_documents(rest, epoch_id="oracle_append")
    w = term_weights(spark, index.vocab, ["table", "spark"], [])
    res = wand_topk(spark, index, w, index.globs, 10)
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_bm25_delete_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 tombstone delete under the FULL oracle: build on the whole
    corpus, mark the ranking's top-3 docs deleted (chosen from the
    BRUTE scorer so the victim set is stable across re-runs —
    delete_documents is idempotent for the same ids), then WAND top-10
    must equal the oracle's full ranking with the top-3 ranks skipped:
    mark-deleted docs still contribute df/dl/avgdl exactly like the
    reference's hnswlib mark_deleted (top2vec.py:2063-2122)."""
    import hashlib

    from top2vec_spark.operators.wand import wand_topk
    from top2vec_spark.plans.build import IndexBuilder

    docs = _docs(spark, sf_dir)
    tokens = tokenize_docs(docs, ascii_fast_path=True).cache()
    vocab = build_vocab(tokens)
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    w = term_weights(spark, vocab, ["table", "spark"], [])
    victims = [
        int(r["doc_id"])
        for r in bm25_scores(tokens, ds, g, w)
        .select("doc_id", F.round("score", 4).alias("s"))
        .orderBy(F.col("s").desc(), F.col("doc_id").asc())
        .limit(3)
        .collect()
    ]
    tag = hashlib.sha1(f"del:{sf_dir}".encode()).hexdigest()[:10]
    index = IndexBuilder(
        spark,
        f"/tmp/t2v_entry_del_{tag}",
        docs_per_shard=256,
        n_buckets=16,
        input_fingerprint=_input_fingerprint(docs),
    ).build(tokens, vocab, ds, resume=True)
    index.delete_documents(victims)
    wq = term_weights(spark, index.vocab, ["table", "spark"], [])
    res = wand_topk(spark, index, wq, index.globs, 10)
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_bm25_compact_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction under the FULL oracle (plans/build.compact_index):
    build on the whole corpus, tombstone the brute ranking's top-3
    docs (same stable victim rule as bm25_delete_wand), COMPACT —
    folding tombstones into a fresh single-epoch base with statistics
    RECOMPUTED over the survivors (stats_fresh back True; deletes
    finally leave df/dl/avgdl/N, unlike the mark-deleted state the
    reference serves forever, top2vec.py:2063-2122) — then WAND
    top-10. DuckDB replays both passes from text: full-corpus ranking
    -> victim set -> fresh BM25 over the surviving corpus only."""
    import hashlib

    from top2vec_spark.operators.wand import wand_topk
    from top2vec_spark.plans.build import IndexBuilder

    docs = _docs(spark, sf_dir)
    tokens = tokenize_docs(docs, ascii_fast_path=True).cache()
    vocab = build_vocab(tokens)
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    w = term_weights(spark, vocab, ["table", "spark"], [])
    victims = [
        int(r["doc_id"])
        for r in bm25_scores(tokens, ds, g, w)
        .select("doc_id", F.round("score", 4).alias("s"))
        .orderBy(F.col("s").desc(), F.col("doc_id").asc())
        .limit(3)
        .collect()
    ]
    tag = hashlib.sha1(f"cmp:{sf_dir}".encode()).hexdigest()[:10]
    index = IndexBuilder(
        spark,
        f"/tmp/t2v_entry_cmp_{tag}",
        docs_per_shard=256,
        n_buckets=16,
        input_fingerprint=_input_fingerprint(docs),
    ).build(tokens, vocab, ds, resume=False)
    index = index.delete_documents(victims).compact()
    assert index.stats_fresh and index.tombstones == frozenset()
    wq = term_weights(spark, index.vocab, ["table", "spark"], [])
    res = wand_topk(spark, index, wq, index.globs, 10)
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_docs_by_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+P5 through the full api path: search_documents_by_documents
    (reference top2vec.py:3081-3180) — query = DISTINCT terms of docs
    {3, 7}, over-fetch num_docs + len(query docs), exclude the query
    docs themselves, re-limit. Oracled as a full-corpus BM25 ranking
    with q = those docs' terms and self-ids excluded."""
    from top2vec_spark.api import Top2VecSpark

    eng = Top2VecSpark(spark, _docs(spark, sf_dir), ascii_fast_path=True)
    res = eng.search_documents_by_documents([3, 7], 10, return_documents=False)
    return res.select(
        "doc_id", F.round("score", 4).alias("score")
    ).orderBy(F.col("score").desc(), F.col("doc_id").asc())


def _q_search_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword->topic search (reference search_topics re-expression,
    operators/topics.search_topics_scores) with lang as the class
    column — fully SQL-expressible; the embedding-cluster variant is
    pytest-covered (tests/test_topic_api.py)."""
    from top2vec_spark.operators.topics import ctfidf_scores, search_topics_scores

    docs = _docs(spark, sf_dir)
    tf = (
        _tokens(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dt = docs.select("doc_id", F.col("lang").alias("topic_id"))
    ctf = ctfidf_scores(tf, dt)
    res = search_topics_scores(
        ctf, ["table", "spark"], ["slow"], num_topics=None, round_digits=6
    )
    return res.select(F.col("topic_id").alias("lang"), "score")


def _q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (operators/webtext.py) — the
    public Rae et al. 2021 §A.1.1 rules as count-based fractions."""
    from top2vec_spark.operators.webtext import repetition_stats

    rs = repetition_stats(_docs(spark, sf_dir))
    return rs.select(
        "doc_id",
        "n_words",
        F.round("top_word_frac", 6).alias("top_word_frac"),
        F.round("uniq_word_frac", 6).alias("uniq_word_frac"),
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
        F.round("dup_trigram_frac", 6).alias("dup_trigram_frac"),
    )


def _q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite C4/Gopher keep/drop filter (webtext.corpus_filter):
    per-doc keep flag + comma-joined failed-rule names, every rule
    evaluated on round-6 features on both engines."""
    from top2vec_spark.operators.webtext import corpus_filter

    return corpus_filter(_docs(spark, sf_dir))


def _q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-hygiene pipeline (webtext.clean_corpus: exact
    dedup -> corpus-level line dedup -> PII scrub -> quality filter)
    as ONE oracle row. Deterministic construction from `documents`
    exercises every stage: doc_id%10==7 docs are byte-identical
    twins of their predecessor (exact_dup), every doc shares a
    boilerplate header (+footer for %5==0) around two body lines
    sliced from the text, an email is injected per doc and a phone
    for %3==0. DuckDB replays all four stages; md5 of the final text
    pins every byte of the surviving corpus."""
    from top2vec_spark.operators.webtext import clean_corpus

    src = _docs(spark, sf_dir).select("doc_id", "text")
    d = F.col("doc_id")
    b = F.col("bid")
    pages = (
        src.select(
            "doc_id",
            (d - F.when(d % 10 == 7, 1).otherwise(0)).alias("bid"),
        )
        .join(
            src.select(F.col("doc_id").alias("bid"), F.col("text").alias("btext")),
            "bid",
        )
        .select(
            "doc_id",
            F.concat_ws(
                "\n",
                F.lit("subscribe to our newsletter"),
                F.concat(
                    F.substring("btext", 1, 80),
                    F.lit(" contact user"),
                    (b % 89).cast("string"),
                    F.lit("@ex"),
                    (b % 7).cast("string"),
                    F.lit(".org"),
                ),
                F.concat(
                    F.substring("btext", 81, 80),
                    F.when(
                        b % 3 == 0,
                        F.concat(
                            F.lit(" call +1-555-0"),
                            F.lpad((b % 1000).cast("string"), 3, "0"),
                        ),
                    ).otherwise(F.lit("")),
                ),
                F.when(b % 5 == 0, F.lit("copyright example corp")),
            ).alias("text"),
        )
    )
    out = clean_corpus(pages, min_words=20, min_alpha=0.60, max_top_word=0.25)
    return out.select(
        "doc_id",
        "keep",
        "reason",
        F.md5("text_final").alias("final_md5"),
        F.length("text_final").cast("int").alias("final_len"),
        "n_pii",
        "n_lines",
        "n_kept",
    )


def _q_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix-C rule re-expressed):
    the benchmark set is words 3..14 of every doc_id%25==0 document,
    so those documents (and any doc sharing the same 8-word run) must
    flag as contaminated. The corpus side is never shuffled — the
    benchmark n-gram set is broadcast (webtext.decontaminate)."""
    from top2vec_spark.operators.webtext import decontaminate

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    words = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != ""
    )
    bench = docs.filter(F.col("doc_id") % 25 == 0).select(
        F.array_join(F.slice(words, 3, 12), " ").alias("text")
    )
    return decontaminate(docs, bench, n=8)


def _q_sessions_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-safe salted sessionization twin answered against the
    SAME oracle as sessions_by_user — proves the three-phase
    (local -> boundary-merge -> renumber) plan is output-identical to
    the single-window semantics, not just pytest-equal to the batch
    twin."""
    from top2vec_spark.operators.sessions import sessionize_batch_salted

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sess = sessionize_batch_salted(ev, gap_seconds=1800)
    return sess.select(
        "user_id",
        "session_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias(
            "session_end"
        ),
        "n_events",
        "total_value",
    )


def _q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain rollup over the pages shape: urls derived
    deterministically from `documents` (host := source.example.com),
    parsed with Spark's built-in parse_url, aggregated per host."""
    from top2vec_spark.operators.webtext import domain_stats

    pages = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        "text",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/"),
            F.col("lang"),
            F.lit("/docs/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    d = domain_stats(pages)
    return d.select(
        "host",
        "tld",
        F.col("n_pages").cast("long").alias("n_pages"),
        F.col("n_langs").cast("long").alias("n_langs"),
        F.round("avg_chars", 6).alias("avg_chars"),
        F.col("max_path_depth").cast("int").alias("max_path_depth"),
    )


def _q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup: deterministic scheme/www/query/
    trailing-slash variants constructed from doc_id, grouped by the
    canonical form (operators/webtext.canonicalize_url), keeper =
    min doc_id."""
    from top2vec_spark.operators.webtext import url_dedup

    d = F.col("doc_id")
    pages = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.when(d % 2 == 0, F.lit("http://")).otherwise(F.lit("https://")),
            F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
            F.col("source"),
            F.lit(".example.com/p/"),
            (d % 100).cast("string"),
            F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(d % 7 == 0, F.lit("?utm=1")).otherwise(F.lit("")),
        ).alias("url"),
    )
    return url_dedup(pages).select("canon_url", "keeper", "n_dupes")


def _q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (operators/webtext.pii_scrub) under a full-value
    oracle: emails / IPv4s / phone numbers are injected into the
    corpus text deterministically from doc_id, scrubbed by the
    three-stage regexp pipeline, and DuckDB replays the identical
    construction + rules — md5 of the scrubbed text pins every byte
    of every replacement."""
    from top2vec_spark.operators.webtext import pii_scrub

    d = F.col("doc_id")
    pages = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 40),
            F.lit(" contact user"),
            (d % 89).cast("string"),
            F.lit("@ex"),
            (d % 7).cast("string"),
            F.lit(".org now"),
            F.when(
                d % 3 == 0,
                F.concat(
                    F.lit(" call +1-555-0"),
                    F.lpad((d % 1000).cast("string"), 3, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 4 == 0,
                F.concat(
                    F.lit(" from "),
                    ((d % 223) + 1).cast("string"),
                    F.lit(".44."),
                    (d % 250).cast("string"),
                    F.lit(".7"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = pii_scrub(pages)
    return out.select(
        "doc_id",
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_ipv4").cast("int").alias("n_ipv4"),
        F.col("n_phone").cast("int").alias("n_phone"),
        F.md5("scrubbed").alias("scrub_md5"),
        F.length("scrubbed").cast("int").alias("scrub_len"),
    )


def _q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level exact line dedup (C4 §2.2) under a full-value
    oracle: every doc gets a shared boilerplate header (+ a footer for
    doc_id%5==0) around two body lines sliced from its text; the
    operator keeps only the globally-first occurrence of each distinct
    line, and DuckDB replays the construction with a
    row_number-over-(line) window. md5 of the reassembled clean text
    pins content and line order."""
    from top2vec_spark.operators.webtext import line_dedup

    d = F.col("doc_id")
    pages = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("subscribe to our newsletter"),
            F.substring("text", 1, 60),
            F.substring("text", 61, 60),
            F.when(d % 5 == 0, F.lit("copyright example corp")),
        ).alias("text"),
    )
    out = line_dedup(pages)
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.md5("clean").alias("clean_md5"),
        F.length("clean").cast("int").alias("clean_len"),
    )


def _q_index_manifest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule lineage/metrics manifest, checked against the
    corpus: total postings emitted across bucket partitions must equal
    the distinct (doc, term) pairs DuckDB counts from raw text, and
    docs_tokenized (global + summed per-shard) the tokenized-doc
    count. Reuses the cached entry index build (resume=True)."""
    import hashlib

    from top2vec_spark.plans.build import IndexBuilder

    docs = _docs(spark, sf_dir)
    tokens = tokenize_docs(docs, ascii_fast_path=True).cache()
    vocab = build_vocab(tokens)
    ds = build_doc_stats(tokens)
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    path = f"/tmp/t2v_entry_idx_{tag}"
    IndexBuilder(
        spark,
        path,
        docs_per_shard=256,
        n_buckets=16,
        input_fingerprint=_input_fingerprint(docs),
    ).build(tokens, vocab, ds, resume=True)
    m = spark.read.parquet(f"{path}/manifest")
    is_postings = F.col("checkpoint_path").contains("/postings/")
    return m.agg(
        F.max(F.when(is_postings, F.col("docs_tokenized")))
        .cast("long")
        .alias("docs_tokenized"),
        F.sum(F.when(is_postings, F.col("postings_emitted")))
        .cast("long")
        .alias("postings_total"),
        F.sum(F.when(~is_postings, F.col("docs_tokenized")))
        .cast("long")
        .alias("docs_by_shard_total"),
    )


# Shared by sessions_by_user (single-window batch twin) and
# sessions_by_user_salted (three-phase skew-safe twin) — one semantic,
# two physical plans, one oracle.
_SESSIONS_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *, CAST(sum(new_sess) OVER (
    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
  ) AS BIGINT) AS session_id
  FROM ordered
)
SELECT user_id, session_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events, round(sum(value), 6) AS total_value
FROM numbered GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


_TOPIC_CTFIDF_CTE = """
normed AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / greatest(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 1e-12)
         ) AS v
  FROM embeddings
),
assign_scored AS (
  SELECT n.vec_id, c.label, list_dot_product(n.v, c.c) AS s
  FROM normed n CROSS JOIN centroids c
),
assigned AS (
  SELECT vec_id, label FROM (
    SELECT vec_id, label,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, label ASC) AS rn
    FROM assign_scored
  ) WHERE rn = 1
),
renum AS (
  SELECT label, row_number() OVER (
    ORDER BY count(*) DESC, label ASC) - 1 AS topic_id
  FROM assigned GROUP BY label
),
member AS (
  SELECT a.vec_id AS doc_id, r.topic_id FROM assigned a JOIN renum r USING (label)
),
tl AS (SELECT doc_id, {tokens_expr} AS toks FROM documents),
tokens_pos AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) - 1 AS pos
  FROM tl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tokens_pos GROUP BY doc_id, term),
ttf AS (
  SELECT m.topic_id, tf.term, sum(tf.tf) AS ctf
  FROM tf JOIN member m USING (doc_id) GROUP BY m.topic_id, tf.term
),
clen AS (SELECT topic_id, sum(ctf) AS clen FROM ttf GROUP BY topic_id),
al AS (SELECT avg(clen) AS avg_len FROM clen),
cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY term),
ctfidf AS (
  SELECT ttf.topic_id, ttf.term,
         round((ttf.ctf * 1.0 / clen.clen)
               * ln(1.0 + (SELECT avg_len FROM al) / cf.cf), 6) AS score
  FROM ttf JOIN clen USING (topic_id) JOIN cf USING (term)
)
"""

_CENTROIDS_CTE = """
by_pos AS (
  SELECT label, unnest(embedding::DOUBLE[]) AS v,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
),
means AS (
  SELECT label, pos, avg(v) AS m FROM by_pos GROUP BY label, pos
),
cent AS (
  SELECT label, array_agg(m ORDER BY pos) AS c,
         sqrt(sum(m * m)) AS nrm
  FROM means GROUP BY label
),
centroids AS (
  SELECT label, list_transform(c, x -> x / nrm) AS c FROM cent
)"""


def _q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> distributed connected components -> per-doc
    cluster + keeper (operators/graph.py duplicate_clusters): the
    corpus unioned with TWO shifted copies, so every doc sits in an
    (at least) 3-clique; MinHash -> LSH -> exact-Jaccard==1.0 pairs,
    resolved by the large-star/small-star rounds (driver_edge_cap=0
    forces the pure-distributed path the 100 TB story rests on).
    Components are shingle-set-equality classes, which DuckDB can
    compute directly by grouping on the canonical shingle set."""
    from top2vec_spark.functions.tokenizer import sql_tokens_expr
    from top2vec_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard,
    )
    from top2vec_spark.operators.graph import duplicate_clusters

    docs = _docs(spark, sf_dir)
    both = docs.select("doc_id", "text")
    for off in (100000, 200000):
        both = both.unionByName(
            docs.select((F.col("doc_id") + off).alias("doc_id"), "text")
        )
    ta = both.select("doc_id", sql_tokens_expr("text").alias("tokens")).cache()
    sigs = minhash_signatures(ta)
    cands = lsh_candidate_pairs(sigs)
    verified = ngram_jaccard(ta, cands.select("doc_a", "doc_b")).filter(
        F.col("jaccard") >= 1.0
    )
    return (
        duplicate_clusters(both, verified, driver_edge_cap=0)
        .orderBy("doc_id")
    )


def _span_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Input for the exact-substring rows: the corpus plus a shifted
    copy of every 5th document, so cross-document duplicated spans are
    guaranteed to exist on top of any organic phrase repeats in the
    synthetic text."""
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )


def _q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate detection (operators/spans.py — the
    ExactSubstr pass of Lee et al. 2021 re-expressed as O(n) rolling
    128-bit window hashing + ONE hash-groupBy): every occurrence of a
    duplicated 8-token window, with its occurrence count and the
    globally-first-keeper flag. The DuckDB oracle never hashes — it
    groups on the window CONTENT itself (array_to_string of the token
    slice), so the hash pins that the rolling 128-bit key induces
    exactly the content-equality classes."""
    from top2vec_spark.functions.tokenizer import sql_tokens_expr
    from top2vec_spark.operators.spans import duplicate_spans

    ta = _span_docs(spark, sf_dir).select(
        "doc_id", sql_tokens_expr("text").alias("tokens")
    )
    return duplicate_spans(ta, w=8).select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "n_occ", "is_keeper"
    )


def _q_scrub_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring scrubbing (operators/spans.py): remove every
    token covered by a duplicated 8-token window except the globally
    first occurrence (keep='first'); one row per doc with the scrubbed
    token stream and removed-token count. DuckDB replays the interval
    union from window content with BETWEEN-join coverage — the hash
    pins every surviving token and its order."""
    from top2vec_spark.functions.tokenizer import sql_tokens_expr
    from top2vec_spark.operators.spans import scrub_duplicate_spans

    ta = _span_docs(spark, sf_dir).select(
        "doc_id", sql_tokens_expr("text").alias("tokens")
    )
    return scrub_duplicate_spans(ta, w=8, keep="first").select(
        "doc_id",
        F.array_join("tokens", " ").alias("scrubbed"),
        "n_removed",
    )


def _q_components_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-topology transitivity pin for connected_components: a
    deterministic edge set derived from doc_ids — length-10 chains
    (i, i+1) plus long-range links (i, i//2) at i % 40 == 0 that merge
    distant chains — labeled by the distributed star rounds (cap=0).
    The DuckDB oracle walks the same edges with a recursive CTE, so
    multi-hop transitive closure (not just clique grouping) is what
    the hash compares."""
    from top2vec_spark.operators.graph import connected_components

    d = _docs(spark, sf_dir).select("doc_id")
    chain = d.filter((F.col("doc_id") % 10) != 9).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 1).alias("doc_b"),
    )
    longr = d.filter((F.col("doc_id") % 40) == 0).select(
        F.col("doc_id").alias("doc_a"),
        F.floor(F.col("doc_id") / 2).cast("long").alias("doc_b"),
    )
    edges = chain.unionByName(longr)
    return connected_components(edges, driver_edge_cap=0).orderBy("node")


def _q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained bigram-LM scoring (operators/lm.py): add-1/2
    smoothing (k=0.5 keeps k and k*V exactly representable doubles so
    the oracle's arithmetic is bit-identical), per-doc mean bigram
    log-likelihood + perplexity."""
    from top2vec_spark.functions.tokenizer import sql_tokens_expr
    from top2vec_spark.operators.lm import bigram_lm_scores

    toks = _docs(spark, sf_dir).select(
        "doc_id", sql_tokens_expr("text").alias("tokens")
    )
    return bigram_lm_scores(toks, k=0.5).orderBy("doc_id")


def _q_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail perplexity bucketing
    (operators/lm.py perplexity_buckets): global rank under
    (perplexity, doc_id) via the two-phase scan, integer-arithmetic
    thirds. k=0.5 keeps the smoothing arithmetic bit-identical
    cross-engine (same as lm_perplexity), so the DuckDB row_number
    replay must reproduce every rank and bucket exactly."""
    from top2vec_spark.functions.tokenizer import sql_tokens_expr
    from top2vec_spark.operators.lm import perplexity_buckets

    toks = _docs(spark, sf_dir).select(
        "doc_id", sql_tokens_expr("text").alias("tokens")
    )
    return perplexity_buckets(toks, k=0.5)


def _q_lm_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance scoring (operators/lm.py
    lm_contrast_scores): mean per-bigram log-likelihood ratio between
    a target-domain LM (docs with doc_id % 5 == 0 — a deterministic
    'domain sample') and the corpus LM, both add-1/2 smoothed."""
    from top2vec_spark.functions.tokenizer import sql_tokens_expr
    from top2vec_spark.operators.lm import lm_contrast_scores

    toks = _docs(spark, sf_dir).select(
        "doc_id", sql_tokens_expr("text").alias("tokens")
    )
    target = toks.filter((F.col("doc_id") % 5) == 0)
    return lm_contrast_scores(toks, target, k=0.5).orderBy("doc_id")


def _q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host quality quota (operators/ranking.py domain_quota):
    keep the 10 highest-quality pages per synthesized host via the
    exact two-phase salted top-N — the oracle replays the quality
    rubric and a single row_number window."""
    from top2vec_spark.operators.ranking import domain_quota

    pages = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        "text",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/"),
            F.col("lang"),
            F.lit("/docs/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    out = domain_quota(pages, per_host=10)
    return out.select(
        "doc_id", "host", "quality", F.col("rank").cast("int").alias("rank")
    ).orderBy("host", "rank")


# ---------------------------------------------------------------------------
# Positional fulltext rows (operators/positional.py): exact phrase,
# conjunctive AND, minimal cover span, best-window snippet.
# ---------------------------------------------------------------------------
_PTOKENS_CTE = f"""
tl AS (SELECT doc_id, {duckdb_tokens_sql()} AS toks FROM documents),
tokens_pos AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) - 1 AS pos
  FROM tl
)"""


# Shared by phrase_pos_top10 (raw-tokens path) and phrase_indexed_top10
# (positional sidecar path): both must match this ranking exactly.
_PHRASE_ORACLE = f"""
WITH {_PTOKENS_CTE},
doc_stats AS (SELECT doc_id, count(*) AS dl FROM tokens_pos GROUP BY doc_id),
globals AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doc_stats),
occ AS (
  SELECT a.doc_id, a.pos AS start
  FROM tokens_pos a JOIN tokens_pos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'fast' AND b.term = 'table'
),
tfp AS (SELECT doc_id, count(*) AS tf FROM occ GROUP BY doc_id),
dfp AS (SELECT count(*) AS df FROM tfp)
SELECT t.doc_id, t.tf,
       round(ln(1.0 + (g.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (t.tf * ({BM25_K1} + 1.0))
             / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * s.dl / g.avgdl)),
             4) AS score
FROM tfp t JOIN doc_stats s USING (doc_id)
CROSS JOIN globals g CROSS JOIN dfp d
ORDER BY score DESC, t.doc_id ASC LIMIT 10
"""


def _q_phrase_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase BM25 top-10 ("fast table" as ONE pseudo-term).
    The phrase match set is small (tens of docs), so k is set past it
    and the round-4-then-order-then-limit contract is applied here,
    exactly like the bm25 rows."""
    from top2vec_spark.operators.positional import phrase_topk

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    res = phrase_topk(tokens, ds, g, ["fast", "table"], k=1_000_000, vocab=vocab)
    return (
        res.select("doc_id", "tf", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_bool_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) BM25 top-10: docs containing ALL of
    table/spark/query."""
    from top2vec_spark.operators.positional import bool_and_topk

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    res = bool_and_topk(
        spark, tokens, ds, g, vocab, ["table", "spark", "query"], k=1_000_000
    )
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_prox_min_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal positional cover span of {spark, merge, window} per doc
    containing all three — pure integers, so the hash pins the
    two-pointer sweep against DuckDB's brute combinatoric min."""
    from top2vec_spark.operators.positional import min_cover_span

    tokens = _tokens(spark, sf_dir)
    return min_cover_span(tokens, ["spark", "merge", "window"])


def _q_phrase_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same phrase query as phrase_pos_top10 but answered from the
    term-bucketed positional sidecar INDEX (build_position_index ->
    directory-pruned read) — proves the index path against the same
    DuckDB oracle, the bm25_top10 / bm25_wand_top10 pattern."""
    import hashlib
    import os

    from top2vec_spark.operators.positional import (
        build_position_index,
        load_position_postings,
        phrase_topk,
    )

    docs = _docs(spark, sf_dir)
    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    fp = hashlib.sha1(
        f"{sf_dir}|{_input_fingerprint(docs)}".encode()
    ).hexdigest()[:10]
    path = f"/tmp/t2v_entry_posidx_{fp}"
    if not os.path.exists(f"{path}/positions.json"):
        build_position_index(tokens, path, n_buckets=16)
    pruned = load_position_postings(spark, path, ["fast", "table"])
    res = phrase_topk(pruned, ds, g, ["fast", "table"], k=1_000_000)
    return (
        res.select("doc_id", "tf", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_query_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-language row: '"fast table" spark -slow' — one phrase
    pseudo-term plus a positive and a negative bag-of-words term,
    summed per doc; pins the parser + mixed executor end-to-end."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_topk

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    atoms = parse_query('"fast table" spark -slow')
    res = mixed_query_topk(spark, tokens, ds, g, vocab, atoms, k=1_000_000)
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_query_lang_boosted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boosted query-language row: '"fast table"^2 spark^0.5 -slow^1.5
    s*^0.25' — Lucene ^boost weights on a phrase, a term, a negation,
    and a prefix expansion (6 vocab terms at sf0.01); pins that every
    atom contributes sign x boost x BM25 through the mixed executor."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_topk

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    atoms = parse_query('"fast table"^2 spark^0.5 -slow^1.5 s*^0.25')
    res = mixed_query_topk(spark, tokens, ds, g, vocab, atoms, k=1_000_000)
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_query_lang_must(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Required-clause row: '+"fast table" +spark -slow' — Lucene must
    semantics: every atom scores as usual but only docs containing the
    phrase AND the term survive; pins the collect_set(atom_id) gate in
    the mixed executor against a DuckDB IN-subquery replay."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_topk

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    atoms = parse_query('+"fast table" +spark -slow')
    res = mixed_query_topk(spark, tokens, ds, g, vocab, atoms, k=1_000_000)
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_query_lang_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy row: 'sprt~2 quary~1^2 -slow' — Lucene FuzzyQuery shape:
    'sprt~2' expands by classic Levenshtein against the vocabulary
    (sort=1, spark=2, part=2 at this corpus), 'quary~1' to query with
    a 2x boost; each expansion contributes sign x boost x BM25.
    DuckDB replays the expansion with its own levenshtein()."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_topk

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    atoms = parse_query("sprt~2 quary~1^2 -slow")
    res = mixed_query_topk(spark, tokens, ds, g, vocab, atoms, k=1_000_000)
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_query_lang_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-filter row: 'spark "fast table"^2 lang:en lang:fr
    -source:src3' — filter-context semantics: the two lang values OR
    together, the source exclusion ANDs in, scores are bit-identical
    to the unfiltered query (filters gate, never score); executes as
    ONE pushed-predicate metadata scan + a semi-join."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    atoms = parse_query('spark "fast table"^2 lang:en lang:fr -source:src3')
    res = mixed_query_topk(
        spark, tokens, ds, g, vocab, atoms, k=1_000_000, doc_meta=docs
    )
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_query_lang_filter_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-only row: 'lang:(en fr) n_chars:[200 TO 900]' — ES
    bool-filter context: a query with no scoring atoms is match_all
    gated by the metadata filters, every match at constant score 0.0
    (ranking degenerates to doc_id ASC); field value-group sugar ORs
    the two langs, the range ANDs in. No token scan at all — one
    pruned metadata read. DuckDB replays as a plain WHERE."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    atoms = parse_query("lang:(en fr) n_chars:[200 TO 900]")
    res = mixed_query_topk(
        spark, tokens, ds, g, vocab, atoms, k=1_000_000, doc_meta=docs
    )
    return res.select("doc_id", "score").orderBy(F.col("doc_id").asc()).limit(50)


def _q_query_lang_slop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sloppy-phrase row: '"fast table"~2 spark' — unordered span-near
    (SpanNearQuery inOrder=false): tf = hit positions whose window of
    width len+slop contains every phrase term, scored as ONE
    pseudo-term; DuckDB replays the window join + HAVING count
    (DISTINCT term) and the identical BM25 arithmetic."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_topk

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    atoms = parse_query('"fast table"~2 spark')
    res = mixed_query_topk(spark, tokens, ds, g, vocab, atoms, k=1_000_000)
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_query_lang_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-filter row: 'spark "fast table" n_chars:[200 TO 900]
    -source:{src1 TO src3]' — a numeric inclusive range ANDed with a
    lexicographic half-open string-range exclusion; filters gate
    (scores bit-identical to the unfiltered query), predicates stay
    typed bare comparisons pushed into the metadata scan."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    atoms = parse_query(
        'spark "fast table" n_chars:[200 TO 900] -source:{src1 TO src3]'
    )
    res = mixed_query_topk(
        spark, tokens, ds, g, vocab, atoms, k=1_000_000, doc_meta=docs
    )
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet row: terms-aggregation buckets (ES shape) over the FULL
    match set of 'spark "fast table"' — every matching doc bucketed
    by its source, (key, doc_count), doc_count DESC / key ASC, top
    10; DuckDB replays the match union then a plain GROUP BY."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    atoms = parse_query('spark "fast table"')
    scored = mixed_query_scores(spark, tokens, ds, g, vocab, atoms)
    return (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .filter(F.col("source").isNotNull())
        .groupBy(F.col("source").alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(10)
    )


def _q_query_lang_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-keyword row: 'fast AND spark OR window NOT slow' —
    Lucene QueryParser clause conversion: AND upgrades both
    neighbors to must, OR is the default-operator no-op, NOT
    prohibits; identical scoring union to '+fast +spark window
    -slow', gated to docs containing fast AND spark."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_topk

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    atoms = parse_query("fast AND spark OR window NOT slow")
    res = mixed_query_topk(spark, tokens, ds, g, vocab, atoms, k=1_000_000)
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_query_lang_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parenthesized-group row: '+(spark "fast table")^2 sort -slow'
    — the group's ^2 boost distributes into both members at parse
    time and the '+' makes the group a DISJUNCTIVE must (a doc needs
    spark OR the phrase, Lucene's nested-BooleanQuery match rule for
    a should group in must position). DuckDB replays the identical
    weighted union, then gates with a UNION of the two member match
    sets."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_topk

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    atoms = parse_query('+(spark "fast table")^2 sort -slow')
    res = mixed_query_topk(spark, tokens, ds, g, vocab, atoms, k=1_000_000)
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_query_lang_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cursor-pagination row (ES search_after): rank 'spark fast
    -slow', take page 1 (top-10), then ask for the 10 rows strictly
    after page 1's last (score, doc_id) in the global (score DESC,
    doc_id ASC) order — the same one-pass top-k plan as page 1 over
    the cursor-filtered match set, never a from+size re-scan. DuckDB
    replays with row_number over the RAW score (the engine's ranking
    key) and returns ranks 11-20."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_scores

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    scored = mixed_query_scores(
        spark, tokens, ds, g, vocab, parse_query("spark fast -slow")
    ).persist()
    page1 = (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
        .collect()
    )
    cur_s, cur_d = float(page1[-1]["score"]), int(page1[-1]["doc_id"])
    page2 = (
        scored.filter(
            (F.col("score") < F.lit(cur_s))
            | (
                (F.col("score") == F.lit(cur_s))
                & (F.col("doc_id") > F.lit(cur_d))
            )
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )
    return page2.select("doc_id", F.round("score", 4).alias("score"))


def _q_query_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explain row (Lucene IndexSearcher.explain parity): rank
    '+spark "fast table" s* -slow', take the top doc, and return its
    per-atom BM25 contribution breakdown — (atom_id, n_terms,
    contrib): the must term, the phrase pseudo-term, the s* prefix
    expansion (n_terms = matching expansions), and the negation.
    DuckDB replays the atom-tagged contribution union, re-ranks to
    find the same top doc, then aggregates per atom."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import (
        mixed_query_explain,
        mixed_query_topk,
    )

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    atoms = parse_query('+spark "fast table" s* -slow')
    top = mixed_query_topk(spark, tokens, ds, g, vocab, atoms, k=1).collect()
    res = mixed_query_explain(
        spark, tokens, ds, g, vocab, atoms, int(top[0]["doc_id"])
    )
    return res.select(
        "atom_id", "n_terms", F.round("contrib", 4).alias("contrib")
    ).orderBy("atom_id")


def _q_search_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-by-field row (ES sort): the match set of 'spark fast
    -slow' ordered by the n_chars metadata column DESC (doc_id ASC
    tiebreak) instead of relevance, top 10 — score still computed
    and returned. DuckDB replays the scored union then ORDER BY the
    joined metadata."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    scored = mixed_query_scores(
        spark, tokens, ds, g, vocab, parse_query("spark fast -slow")
    )
    return (
        scored.join(docs.select("doc_id", "n_chars"), "doc_id")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(10)
        .select("doc_id", "n_chars", F.round("score", 4).alias("score"))
    )


def _q_histogram_n_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-aggregation row (ES histogram agg): the match set of
    'spark fast -slow' bucketed by floor(n_chars/100)*100, every
    non-empty bucket as (bucket, doc_count), bucket ASC. DuckDB
    replays with the same floor arithmetic."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    scored = mixed_query_scores(
        spark, tokens, ds, g, vocab, parse_query("spark fast -slow")
    )
    bucket = (F.floor(F.col("n_chars") / F.lit(100)) * F.lit(100)).cast(
        "bigint"
    )
    return (
        scored.join(docs.select("doc_id", "n_chars"), "doc_id")
        .filter(F.col("n_chars").isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.col("bucket").asc())
    )


def _q_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suggest row (term-suggester): the 10 most frequent vocabulary
    terms starting with 's', df DESC / term ASC — one pruned vocab
    scan. DuckDB replays from its tokens CTE."""
    tokens = _tokens(spark, sf_dir).cache()
    vocab = build_vocab(tokens)
    return (
        vocab.filter(F.col("term").startswith("s"))
        .select("term", "df")
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(10)
    )


def _q_query_lang_msm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minimum_should_match row: 'spark fast table -slow' with
    min_should_match=2 — ES/Lucene msm: only docs matching >= 2 of
    the three positive should terms survive; scores identical to the
    ungated union. DuckDB gates with a HAVING count(DISTINCT term)
    subquery."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_scores

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    scored = mixed_query_scores(
        spark, tokens, ds, g, vocab, parse_query("spark fast table -slow"),
        min_should_match=2,
    )
    return (
        scored.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_query_lang_wild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard row: 's?ark ta*le^2 -sl*w' — Lucene WildcardQuery
    beyond trailing-*: '?' = one char, '*' = any run, anywhere past
    the first literal char; each pattern expands against the
    vocabulary and contributes sign x boost x BM25 per expansion.
    DuckDB replays the expansion with LIKE ('?' -> '_', '*' ->
    '%')."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_topk

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    atoms = parse_query("s?ark ta*le^2 -sl*w")
    res = mixed_query_topk(spark, tokens, ds, g, vocab, atoms, k=1_000_000)
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_stats_n_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-aggregation row (ES stats agg): one row of (doc_count,
    min, max, avg, sum) of n_chars over the 'spark fast -slow' match
    set. DuckDB replays the match union then plain aggregates."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    scored = mixed_query_scores(
        spark, tokens, ds, g, vocab, parse_query("spark fast -slow")
    )
    return (
        scored.join(docs.select("doc_id", "n_chars"), "doc_id")
        .filter(F.col("n_chars").isNotNull())
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.min("n_chars").alias("min_v"),
            F.max("n_chars").alias("max_v"),
            F.round(F.avg("n_chars"), 6).alias("avg_v"),
            F.sum("n_chars").alias("sum_v"),
        )
    )


def _q_facet_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms-agg + sub-aggregation row (ES nested stats): the 'spark
    fast -slow' match set bucketed by lang with per-bucket doc_count
    and min/max/avg/sum of n_chars. DuckDB replays the match union
    then a grouped aggregate."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    scored = mixed_query_scores(
        spark, tokens, ds, g, vocab, parse_query("spark fast -slow")
    )
    return (
        scored.join(docs.select("doc_id", "lang", "n_chars"), "doc_id")
        .filter(F.col("lang").isNotNull())
        .groupBy(F.col("lang").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.min("n_chars").alias("min_v"),
            F.max("n_chars").alias("max_v"),
            F.round(F.avg("n_chars"), 6).alias("avg_v"),
            F.sum("n_chars").alias("sum_v"),
        )
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(10)
    )


def _q_collapse_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-collapsing row (ES collapse): the single best (score
    DESC, doc_id ASC) document per lang over the 'spark fast -slow'
    match set, groups ranked by their winner's score, top 10. DuckDB
    replays with row_number over (PARTITION BY lang ORDER BY raw
    score DESC, doc_id)."""
    from pyspark.sql import Window

    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    scored = mixed_query_scores(
        spark, tokens, ds, g, vocab, parse_query("spark fast -slow")
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.join(docs.select("doc_id", "lang"), "doc_id")
        .filter(F.col("lang").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
        .select("doc_id", "lang", F.round("score", 4).alias("score"))
    )


def _q_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-aggregation row (ES range agg): explicit [lo, hi)
    buckets of n_chars over the 'spark fast -slow' match set —
    from inclusive, to exclusive, empty buckets kept, requested
    order. DuckDB replays with one conditional-count aggregate per
    bucket, UNION ALL in order."""
    from top2vec_spark.api import Top2VecSpark  # noqa: F401 (parity)
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    scored = mixed_query_scores(
        spark, tokens, ds, g, vocab, parse_query("spark fast -slow")
    )
    joined = scored.join(docs.select("doc_id", "n_chars"), "doc_id")
    ranges = [(None, 200), (200, 500), (500, 800), (800, None)]
    aggs = []
    labels = []
    for i, (lo, hi) in enumerate(ranges):
        p = F.col("n_chars").isNotNull()
        if lo is not None:
            p = p & (F.col("n_chars") >= F.lit(lo))
        if hi is not None:
            p = p & (F.col("n_chars") < F.lit(hi))
        aggs.append(F.sum(F.when(p, 1).otherwise(0)).alias(f"_c{i}"))
        labels.append(
            f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        )
    counts = joined.agg(*aggs).collect()[0]
    rows = [(lab, int(counts[f"_c{i}"] or 0)) for i, lab in enumerate(labels)]
    return spark.createDataFrame(rows, "bucket string, doc_count bigint")


def _q_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Significant-terms row (ES significant_terms, JLH): vocabulary
    terms overrepresented in the 'spark fast -slow' match set vs the
    corpus — score = (fgPct - bgPct) * (fgPct / bgPct), fg_count >= 1,
    score > 0, top 15 by score DESC / term ASC. DuckDB replays the
    identical fraction arithmetic from its own tokens CTE."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_scores

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    scored = mixed_query_scores(
        spark, tokens, ds, g, vocab, parse_query("spark fast -slow")
    ).persist()
    n_fg = scored.count()
    fg = (
        tokens.join(scored.select("doc_id"), "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("fg_count"))
    )
    fg_pct = F.col("fg_count") / F.lit(float(n_fg))
    bg_pct = F.col("df") / F.lit(float(g.n_docs))
    return (
        fg.join(vocab.select("term", "df"), "term")
        .withColumn("score", (fg_pct - bg_pct) * (fg_pct / bg_pct))
        .filter(F.col("score") > 0.0)
        .select(
            "term",
            "fg_count",
            F.col("df").alias("bg_count"),
            F.round("score", 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("term").asc())
        .limit(15)
    )


def _q_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescore row (ES rescore, total mode): first pass 'spark fast'
    (cheap bag-of-words), window = its top 50 docs by raw score,
    second pass the exact phrase '"fast table"' scored ONLY against
    the window, combined = 1.0*first + 2.0*phrase (0 when the phrase
    misses), top 10 by combined. DuckDB replays both passes and the
    window cut with the same raw-score rank."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_scores

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    first = mixed_query_scores(
        spark, tokens, ds, g, vocab, parse_query("spark fast")
    )
    window = (
        first.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(50)
        .collect()
    )
    ids = [int(r["doc_id"]) for r in window]
    second = mixed_query_scores(
        spark, tokens, ds, g, vocab, parse_query('"fast table"')
    ).filter(F.col("doc_id").isin(ids))
    base = spark.createDataFrame(
        [(int(r["doc_id"]), float(r["score"])) for r in window],
        "doc_id long, first_score double",
    )
    return (
        base.join(
            second.withColumnRenamed("score", "rescore_score"),
            "doc_id",
            "left",
        )
        .withColumn(
            "combined",
            F.col("first_score")
            + F.lit(2.0) * F.coalesce(F.col("rescore_score"), F.lit(0.0)),
        )
        .select("doc_id", F.round("combined", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MoreLikeThis row: top-25 tf-x-idf terms of doc 0 (weight
    rounded to 6 decimals before the cutoff so a 1-ulp ln divergence
    cannot flip term selection; ties term ASC) run as a bag-of-words
    OR query, source doc excluded — Lucene MLT shape
    (maxQueryTerms=25). DuckDB replays the selection with row_number
    over the same rounded weight, then the standard BM25 union."""
    from top2vec_spark.operators.bm25 import (
        bm25_topk_bruteforce,
        mlt_top_terms,
        term_weights,
    )

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    terms = mlt_top_terms(tokens, vocab, g, doc_id=0, max_terms=25)
    w = term_weights(spark, vocab, terms)
    res = bm25_topk_bruteforce(tokens, ds, g, w, 10, exclude_doc_ids=[0])
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _q_query_match_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-hits row: the size of the FULL match set of
    'spark "fast table" -slow' (every doc with any scoring
    contribution — the engine's keywords_neg contract counts
    negative-only matches too, exactly as search ranks them)."""
    from top2vec_spark.functions.querylang import parse_query
    from top2vec_spark.operators.positional import mixed_query_scores

    tokens = _tokens(spark, sf_dir).cache()
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens)
    atoms = parse_query('spark "fast table" -slow')
    scored = mixed_query_scores(spark, tokens, ds, g, vocab, atoms)
    return scored.agg(F.count(F.lit(1)).alias("n_matches"))


def _q_snippet_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best width-8 snippet window for {spark, query} per matching doc
    — the snippet STRING pins tokenizer, window arithmetic, and the
    (hits DESC, start ASC) tie-break in one row."""
    from top2vec_spark.operators.positional import best_snippet

    tokens = _tokens(spark, sf_dir)
    return best_snippet(tokens, ["spark", "query"], width=8)


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: multi-term BM25 top-k
    (search_documents_by_keywords re-expression) over `documents`."""
    from top2vec_spark.api import Top2VecSpark

    docs = _docs(spark, "/root/testdata/sf0.001")
    engine = Top2VecSpark(spark, docs, ascii_fast_path=True)
    return engine.search_documents_by_keywords(
        ["table", "spark"], num_docs=10, keywords_neg=["slow"]
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "vocab": _q_vocab,
        "doc_stats": _q_doc_stats,
        "corpus_globals": _q_globals,
        "bm25_top10": _bm25_query(["table", "spark"], [], 10),
        "bm25_top10_neg": _bm25_query(["table", "spark"], ["slow"], 10),
        "bm25_top10_single": _bm25_query(["vector"], [], 10),
        "bm25_wand_top10": _bm25_wand_query(["table", "spark"], [], 10),
        "bm25_wand_top10_neg": _bm25_wand_query(["query", "window"], ["batch"], 10),
        "bm25_wand_many3": _q_bm25_wand_many,
        "bm25_append_wand": _q_bm25_append_wand,
        "bm25_delete_wand": _q_bm25_delete_wand,
        "bm25_compact_wand": _q_bm25_compact_wand,
        "docs_by_docs_top10": _q_docs_by_docs,
        "pages_ingest_wand": _q_pages_ingest_wand,
        "bm25_phrase_top10": _q_bm25_phrase,
        "bigram_phrases": _q_bigram_phrases,
        "chunks_seq": _q_chunks_seq,
        "ctfidf_by_lang": _q_ctfidf_by_lang,
        "search_topics_by_lang": _q_search_topics,
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash_verified": _q_dedup_minhash_verified,
        "token_counts": _q_token_counts,
        "quality_features": _q_quality,
        "lang_id": _q_lang_id,
        "cosine_top10": _q_cosine_top10,
        "emb_near_dup": _q_emb_near_dup,
        "ivf_full_probe_top10": _q_ivf_full_probe,
        "hnsw_full_ef_top10": _q_hnsw_full_ef,
        "hnsw_many_full_ef": _q_hnsw_many_full_ef,
        "hybrid_rrf_top10": _q_hybrid_rrf,
        "pca_covariance": _q_pca_covariance,
        "hdbscan_core_dist": _q_hdbscan_core_dist,
        "hdbscan_mutual_reach": _q_hdbscan_mutual_reach,
        "discover_topic_sizes": _q_discover_topic_sizes,
        "umap_cluster_recovery": _q_umap_cluster_recovery,
        "d2v_subsample": _q_d2v_subsample,
        "d2v_cluster_recovery": _q_d2v_cluster_recovery,
        "d2v_infer_recovery": _q_d2v_infer_recovery,
        "centroids_by_pos": _q_centroids_by_pos,
        "assign_nearest": _q_assign_nearest,
        "assign_top3": _q_assign_top3,
        "similar_words_top10": _q_similar_words,
        "events_sliding_mean": _q_events_sliding_mean,
        "sessions_by_user": _q_sessions,
        "topic_sizes": _q_topic_sizes,
        "sliding_vec_mean": _q_sliding_vec_mean,
        "fingerprint_dups": _q_fingerprint_dups,
        "quality_windows": _q_quality_windows,
        "topic_distribution": _q_topic_distribution,
        "smooth_vec_adjacent": _q_smooth_vec_adjacent,
        "simhash_dup_pairs": _q_simhash_dup_pairs,
        "noise_topic_assign": _q_noise_topic_assign,
        "topic_merge_map": _q_topic_merge_map,
        "hierarchy_step": _q_hierarchy_step,
        "wordcloud_weights": _q_wordcloud_weights,
        "incremental_topic_sizes": _q_incremental_topic_sizes,
        "chunks_custom": _q_chunks_custom,
        "docs_by_topic": _q_docs_by_topic,
        "vocab_custom_tokenizer": _q_vocab_custom_tokenizer,
        "vocab_sentencized": _q_vocab_sentencized,
        "doc_tokens": _q_doc_tokens,
        "doc_token_topics": _q_doc_token_topics,
        "embed_hook": _q_embed_hook,
        "ctx_chunk_vectors": _q_ctx_chunk_vectors,
        "ctx_word_vectors": _q_ctx_word_vectors,
        "ctx_topic_dist": _q_ctx_topic_dist,
        "pack_sequences": _q_pack_sequences,
        "corpus_split": _q_corpus_split,
        "corpus_mix": _q_corpus_mix,
        "hashed_vectors": _q_hashed_vectors,
        "media_features": _q_media_features,
        "docs_topics_top2": _q_docs_topics_top2,
        "repetition_stats": _q_repetition_stats,
        "domain_stats": _q_domain_stats,
        "url_dedup": _q_url_dedup,
        "pii_scrub": _q_pii_scrub,
        "line_dedup": _q_line_dedup,
        "clean_corpus": _q_clean_corpus,
        "decontam": _q_decontam,
        "index_manifest_stats": _q_index_manifest_stats,
        "corpus_filter": _q_corpus_filter,
        "sessions_by_user_salted": _q_sessions_salted,
        "dup_clusters": _q_dup_clusters,
        "dup_spans": _q_dup_spans,
        "scrub_spans": _q_scrub_spans,
        "components_chain": _q_components_chain,
        "lm_perplexity": _q_lm_perplexity,
        "ppl_buckets": _q_ppl_buckets,
        "lm_contrast": _q_lm_contrast,
        "domain_quota": _q_domain_quota,
        "phrase_pos_top10": _q_phrase_pos,
        "phrase_indexed_top10": _q_phrase_indexed,
        "bool_and_top10": _q_bool_and,
        "prox_min_span": _q_prox_min_span,
        "snippet_best": _q_snippet_best,
        "query_lang_top10": _q_query_lang,
        "query_lang_boosted": _q_query_lang_boosted,
        "query_lang_must": _q_query_lang_must,
        "query_lang_fuzzy": _q_query_lang_fuzzy,
        "query_lang_filtered": _q_query_lang_filtered,
        "query_lang_slop": _q_query_lang_slop,
        "query_lang_range": _q_query_lang_range,
        "facet_counts_source": _q_facet_counts,
        "more_like_this_top10": _q_more_like_this,
        "query_match_count": _q_query_match_count,
        "query_lang_bool": _q_query_lang_bool,
        "query_lang_group": _q_query_lang_group,
        "query_lang_page2": _q_query_lang_page2,
        "query_lang_filter_only": _q_query_lang_filter_only,
        "query_explain": _q_query_explain,
        "search_sorted": _q_search_sorted,
        "histogram_n_chars": _q_histogram_n_chars,
        "suggest_top10": _q_suggest,
        "query_lang_msm": _q_query_lang_msm,
        "query_lang_wild": _q_query_lang_wild,
        "stats_n_chars": _q_stats_n_chars,
        "facet_stats_lang": _q_facet_stats,
        "collapse_by_lang": _q_collapse_lang,
        "range_agg_n_chars": _q_range_agg,
        "significant_terms": _q_significant_terms,
        "rescore_phrase": _q_rescore,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "vocab": f"""
WITH {_TOKENS_CTE},
counts AS (SELECT term, count(*) AS cf, count(DISTINCT doc_id) AS df FROM tokens GROUP BY term)
SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) - 1 AS term_id, df, cf
FROM counts
""",
        "doc_stats": f"""
WITH {_TOKENS_CTE}
SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id
""",
        "corpus_globals": f"""
WITH {_STATS_CTES}
SELECT n_docs, round(avgdl, 6) AS avgdl FROM globals
""",
        "bm25_top10": _bm25_oracle_sql(["table", "spark"], [], 10),
        "bm25_top10_neg": _bm25_oracle_sql(["table", "spark"], ["slow"], 10),
        "bm25_top10_single": _bm25_oracle_sql(["vector"], [], 10),
        "bm25_wand_top10": _bm25_oracle_sql(["table", "spark"], [], 10),
        "bm25_wand_top10_neg": _bm25_oracle_sql(["query", "window"], ["batch"], 10),
        "bm25_wand_many3": (
            "SELECT 'q0' AS query_id, * FROM ("
            + _bm25_oracle_sql(["table", "spark"], [], 10)
            + ") UNION ALL SELECT 'q1' AS query_id, * FROM ("
            + _bm25_oracle_sql(["query", "window"], ["batch"], 10)
            + ") UNION ALL SELECT 'q2' AS query_id, * FROM ("
            + _bm25_oracle_sql(["vector"], [], 10)
            + ")"
        ),
        "bm25_append_wand": _bm25_oracle_sql(["table", "spark"], [], 10),
        "bm25_delete_wand": _bm25_oracle_sql(
            ["table", "spark"], [], 10, skip_ranks=3
        ),
        "bm25_compact_wand": f"""
WITH {_STATS_CTES},
q(term, sign) AS (VALUES ('table', 1.0), ('spark', 1.0)),
tfq AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
fullscored AS (
  SELECT tfq.doc_id,
         sum(q.sign
             * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
             * (tfq.tf * ({BM25_K1} + 1.0))
             / (tfq.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
         ) AS score
  FROM tfq
  JOIN q USING (term) JOIN vocab USING (term) JOIN doc_stats USING (doc_id)
  CROSS JOIN globals
  GROUP BY tfq.doc_id
),
victims AS (
  SELECT doc_id FROM fullscored
  ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 3
),
stoks AS (
  SELECT * FROM tokens
  WHERE doc_id NOT IN (SELECT doc_id FROM victims)
),
sds AS (SELECT doc_id, count(*) AS dl FROM stoks GROUP BY doc_id),
sglob AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM sds),
svocab AS (SELECT term, count(DISTINCT doc_id) AS df FROM stoks GROUP BY term),
stf AS (
  SELECT doc_id, term, count(*) AS tf FROM stoks
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
sscored AS (
  SELECT stf.doc_id,
         sum(q.sign
             * ln(1.0 + (sglob.n_docs - svocab.df + 0.5) / (svocab.df + 0.5))
             * (stf.tf * ({BM25_K1} + 1.0))
             / (stf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * sds.dl / sglob.avgdl))
         ) AS score
  FROM stf
  JOIN q USING (term) JOIN svocab USING (term) JOIN sds USING (doc_id)
  CROSS JOIN sglob
  GROUP BY stf.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM sscored ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10
""",
        "docs_by_docs_top10": _bm25_oracle_sql(
            [], [], 10, exclude=(3, 7), q_from_doc_ids=(3, 7)
        ),
        "pages_ingest_wand": _bm25_oracle_sql(["table", "spark"], [], 10),
        "bigram_phrases": f"""
WITH tl AS (
  SELECT doc_id, {duckdb_tokens_sql()} AS toks FROM documents
),
tokens_pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos
  FROM tl
),
uni AS (SELECT term, count(*) AS cnt FROM tokens_pos GROUP BY term),
vs AS (SELECT count(*) AS vocab_size FROM uni),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS pair_count
  FROM tokens_pos a JOIN tokens_pos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY a.term, b.term
),
scored AS (
  SELECT term_a || ' ' || term_b AS phrase, pair_count,
         (pair_count - 2) * (SELECT vocab_size * 1.0 FROM vs)
           / (ua.cnt * ub.cnt) AS score
  FROM pairs
  JOIN uni ua ON ua.term = pairs.term_a
  JOIN uni ub ON ub.term = pairs.term_b
  WHERE pair_count >= 2
)
SELECT phrase, pair_count, round(score, 6) AS score
FROM scored WHERE score > 0.0005
""",
        "chunks_seq": f"""
WITH tl AS (
  SELECT doc_id, {duckdb_tokens_sql()} AS toks FROM documents
),
ex AS (
  SELECT doc_id, toks,
         unnest(range(greatest(cast(ceil(len(toks) / 20.0) AS int), 1)))
           AS chunk_id
  FROM tl
)
SELECT doc_id, cast(chunk_id AS int) AS chunk_id,
       cast(len(toks[chunk_id * 20 + 1 : least((chunk_id + 1) * 20, len(toks))])
            AS int) AS n_chunk_tokens,
       toks[chunk_id * 20 + 1] AS first_tok
FROM ex
""",
        "ctfidf_by_lang": f"""
WITH {_TOKENS_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tokens GROUP BY doc_id, term),
dt AS (SELECT doc_id, lang AS topic_id FROM documents),
ttf AS (
  SELECT topic_id, term, sum(tf) AS ctf
  FROM tf JOIN dt USING (doc_id) GROUP BY topic_id, term
),
clen AS (SELECT topic_id, sum(ctf) AS clen FROM ttf GROUP BY topic_id),
al AS (SELECT avg(clen) AS avg_len FROM clen),
cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY term),
scored AS (
  SELECT ttf.topic_id, ttf.term,
         round((ttf.ctf * 1.0 / clen.clen)
               * ln(1.0 + (SELECT avg_len FROM al) / cf.cf), 6) AS ctfidf
  FROM ttf JOIN clen USING (topic_id) JOIN cf USING (term)
),
ranked AS (
  SELECT topic_id, term, ctfidf,
         row_number() OVER (
           PARTITION BY topic_id ORDER BY ctfidf DESC, term ASC
         ) AS rank
  FROM scored
)
SELECT topic_id AS lang, cast(rank AS int) AS rank, term, ctfidf
FROM ranked WHERE rank <= 10
""",
        "bm25_phrase_top10": f"""
WITH tl AS (
  SELECT doc_id, {duckdb_tokens_sql()} AS toks FROM documents
),
tokens_pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos
  FROM tl
),
uni AS (SELECT term, count(*) AS cnt FROM tokens_pos GROUP BY term),
vs AS (SELECT count(*) AS vocab_size FROM uni),
occ AS (
  SELECT a.doc_id AS doc_id, a.term AS term_a, b.term AS term_b
  FROM tokens_pos a JOIN tokens_pos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
pc AS (SELECT term_a, term_b, count(*) AS pair_count FROM occ GROUP BY term_a, term_b),
phr AS (
  SELECT pc.term_a, pc.term_b
  FROM pc JOIN uni ua ON ua.term = pc.term_a JOIN uni ub ON ub.term = pc.term_b
  WHERE pc.pair_count >= 2
    AND (pc.pair_count - 2) * (SELECT vocab_size * 1.0 FROM vs)
        / (ua.cnt * ub.cnt) > 0.0005
),
tokens AS (
  SELECT doc_id, term FROM tokens_pos
  UNION ALL
  SELECT occ.doc_id, occ.term_a || ' ' || occ.term_b AS term
  FROM occ JOIN phr USING (term_a, term_b)
),
doc_stats AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id),
globals AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doc_stats),
vocab AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokens GROUP BY term),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens
  WHERE term = 'table hash' GROUP BY doc_id, term
),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
             * (tf.tf * ({BM25_K1} + 1.0))
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
         ) AS score
  FROM tf
  JOIN vocab USING (term) JOIN doc_stats USING (doc_id)
  CROSS JOIN globals
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10
""",
        "search_topics_by_lang": f"""
WITH {_TOKENS_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tokens GROUP BY doc_id, term),
dt AS (SELECT doc_id, lang AS topic_id FROM documents),
ttf AS (
  SELECT topic_id, term, sum(tf) AS ctf
  FROM tf JOIN dt USING (doc_id) GROUP BY topic_id, term
),
clen AS (SELECT topic_id, sum(ctf) AS clen FROM ttf GROUP BY topic_id),
al AS (SELECT avg(clen) AS avg_len FROM clen),
cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY term),
scored AS (
  SELECT ttf.topic_id, ttf.term,
         (ttf.ctf * 1.0 / clen.clen)
           * ln(1.0 + (SELECT avg_len FROM al) / cf.cf) AS ctfidf
  FROM ttf JOIN clen USING (topic_id) JOIN cf USING (term)
),
q(term, sign) AS (VALUES ('table', 1.0), ('spark', 1.0), ('slow', -1.0))
SELECT topic_id AS lang, round(sum(sign * ctfidf), 6) AS score
FROM scored JOIN q USING (term)
GROUP BY topic_id
ORDER BY score DESC, lang ASC
""",
        "dedup_exact": """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
""",
        "dedup_minhash_verified": f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents
),
tl AS (
  SELECT doc_id, {duckdb_tokens_sql()} AS toks FROM all_docs
),
sh AS (
  SELECT doc_id,
         list_sort(list_distinct(
           [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
            for i in range(1, greatest(len(toks) - 1, 1))]
         ))::VARCHAR AS sset
  FROM tl
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sh a JOIN sh b ON a.sset = b.sset AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
""",
        "token_counts": r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens_ws,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens_bpe
FROM documents
""",
        "quality_features": r"""
SELECT doc_id,
       len(text) AS n_chars_q,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_words,
       round(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
             / greatest(len(text), 1), 6) AS alpha_ratio,
       round(len(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
             / greatest(len(text), 1), 6) AS digit_ratio,
       round(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0
             / greatest(len(text), 1), 6) AS punct_ratio,
       round(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) * 1.0
             / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 6)
             AS uniq_word_ratio
FROM documents
""",
        "lang_id": r"""
WITH feat AS (
  SELECT doc_id,
         greatest(len(regexp_split_to_array(text, '\s+')), 1) AS n_words,
         len(regexp_extract_all(text,
             '(?i)\b(the|and|of|to|in|is|that|for|with)\b', 1)) AS en_hits,
         len(regexp_extract_all(text,
             '(?i)\b(der|die|und|das|ist|nicht|mit|ein)\b', 1)) AS de_hits,
         len(regexp_extract_all(text,
             '(?i)\b(le|la|les|et|est|une|pour|dans)\b', 1)) AS fr_hits,
         len(regexp_extract_all(text,
             '(?i)\b(el|la|los|que|es|una|por|con)\b', 1)) AS es_hits
  FROM documents
),
scored AS (
  SELECT doc_id,
         list_aggregate([
           {'rate': en_hits / n_words, 'lg': 'en'},
           {'rate': de_hits / n_words, 'lg': 'de'},
           {'rate': fr_hits / n_words, 'lg': 'fr'},
           {'rate': es_hits / n_words, 'lg': 'es'}
         ], 'max') AS best
  FROM feat
)
SELECT doc_id,
       CASE WHEN best.rate > 0 THEN best.lg ELSE 'und' END AS lang_pred
FROM scored
""",
        "cosine_top10": """
WITH q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 7)
SELECT vec_id,
       round(list_dot_product(embedding::DOUBLE[], q.e)
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(q.e, q.e))), 6) AS score
FROM embeddings, q
ORDER BY score DESC, vec_id ASC LIMIT 10
""",
        "ivf_full_probe_top10": """
WITH q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 7)
SELECT vec_id,
       round(list_dot_product(embedding::DOUBLE[], q.e)
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(q.e, q.e))), 6) AS score
FROM embeddings, q
ORDER BY score DESC, vec_id ASC LIMIT 10
""",
        "hnsw_full_ef_top10": """
WITH q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 7)
SELECT vec_id,
       round(list_dot_product(embedding::DOUBLE[], q.e)
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(q.e, q.e))), 6) AS score
FROM embeddings, q
ORDER BY score DESC, vec_id ASC LIMIT 10
""",
        "hybrid_rrf_top10": f"""
WITH {_STATS_CTES},
q(term, sign) AS (VALUES ('table', 1.0), ('spark', 1.0)),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
scored AS (
  SELECT tf.doc_id,
         sum(q.sign
             * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
             * (tf.tf * ({BM25_K1} + 1.0))
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
         ) AS score
  FROM tf
  JOIN q USING (term) JOIN vocab USING (term) JOIN doc_stats USING (doc_id)
  CROSS JOIN globals
  GROUP BY tf.doc_id
),
lex AS (
  SELECT doc_id, r FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY round(score, 4) DESC, doc_id ASC) AS r
    FROM scored
  ) WHERE r <= 20
),
qv AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 7),
cos AS (
  SELECT doc_id, r FROM (
    SELECT vec_id AS doc_id,
           row_number() OVER (
             ORDER BY round(list_dot_product(embedding::DOUBLE[], qv.e)
               / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                  * sqrt(list_dot_product(qv.e, qv.e))), 6) DESC,
             vec_id ASC
           ) AS r
    FROM embeddings, qv
  ) WHERE r <= 20
)
SELECT doc_id, round(sum(1.0 / (60 + r)), 6) AS score,
       count(*) AS n_lists
FROM (SELECT * FROM lex UNION ALL SELECT * FROM cos)
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "pca_covariance": """
WITH ex AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS idx,
         unnest(embedding::DOUBLE[]) AS x
  FROM embeddings
)
SELECT a.idx AS i, b.idx AS j,
       round(sum(a.x * b.x) / count(*)
             - (sum(a.x) / count(*)) * (sum(b.x) / count(*)), 6) + 0.0 AS cov
FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.idx <= b.idx
GROUP BY a.idx, b.idx
""",
        "hdbscan_core_dist": """
WITH d AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         sqrt(greatest(
             list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])
           + list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])
           - 2 * list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]),
           0)) AS dist
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
r AS (
  SELECT src, dst, dist,
         row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rk
  FROM d
)
SELECT src AS vec_id, round(dist, 4) AS core_dist FROM r WHERE rk = 4
""",
        "hdbscan_mutual_reach": """
WITH d AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         sqrt(greatest(
             list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])
           + list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])
           - 2 * list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]),
           0)) AS dist
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
r AS (
  SELECT src, dst, dist,
         row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rk
  FROM d
),
knn AS (SELECT src, dst, dist FROM r WHERE rk <= 16),
core AS (SELECT src AS vec_id, dist AS core_dist FROM r WHERE rk = 4),
e AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b, min(dist) AS dist
  FROM knn GROUP BY 1, 2
)
SELECT e.a AS src, e.b AS dst,
       round(greatest(e.dist, ca.core_dist, cb.core_dist), 4) AS w
FROM e
JOIN core ca ON ca.vec_id = e.a
JOIN core cb ON cb.vec_id = e.b
""",
        "discover_topic_sizes": """
WITH planted AS (
  SELECT CASE WHEN doc_id % 10 <= 4 THEN 0
              WHEN doc_id % 10 <= 7 THEN 1
              ELSE 2 END AS c
  FROM documents
),
sizes AS (SELECT c, count(*) AS topic_size FROM planted GROUP BY c)
SELECT row_number() OVER (ORDER BY topic_size DESC) - 1 AS topic_id,
       topic_size
FROM sizes
""",
        "d2v_subsample": f"""
WITH tl AS (SELECT doc_id, {duckdb_tokens_sql()} AS toks FROM documents),
ptok AS (
  SELECT doc_id,
         cast(unnest(range(len(toks))) AS bigint) AS pos,
         unnest(toks) AS term
  FROM tl
),
counts AS (SELECT term, count(*) AS cf, count(DISTINCT doc_id) AS df
           FROM ptok GROUP BY term),
vocab AS (SELECT term,
                 row_number() OVER (ORDER BY df DESC, term ASC) - 1 AS term_id,
                 cf
          FROM counts),
tot AS (SELECT cast(sum(cf) AS double) * 0.001 AS t FROM vocab),
seq AS (SELECT p.doc_id, v.term_id, cast(v.cf AS double) AS cf,
               row_number() OVER (PARTITION BY p.doc_id ORDER BY p.pos) - 1
                 AS spos
        FROM ptok p JOIN vocab v USING (term)),
draw AS (
  SELECT doc_id, spos, term_id,
         least((sqrt(cf / t) + 1.0) * (t / cf), 1.0) AS kp,
         ((((((doc_id % 2147483647) * 40503
              + (spos % 2147483647) * 104729) % 2147483647
             + 2 * 7919) % 2147483647)
            * 48271 % 2147483647)
           * 48271 % 2147483647) / 2147483647.0 AS u
  FROM seq, tot
)
SELECT doc_id, spos, term_id FROM draw WHERE u < kp
""",
        "d2v_cluster_recovery": """
WITH planted AS (
  SELECT CASE WHEN doc_id % 10 <= 4 THEN 0
              WHEN doc_id % 10 <= 7 THEN 1
              ELSE 2 END AS c
  FROM documents
),
sizes AS (SELECT c, count(*) AS topic_size FROM planted GROUP BY c)
SELECT row_number() OVER (ORDER BY topic_size DESC) - 1 AS topic_id,
       topic_size
FROM sizes
""",
        "d2v_infer_recovery": """
WITH planted AS (
  SELECT CASE WHEN doc_id % 10 <= 4 THEN 0
              WHEN doc_id % 10 <= 7 THEN 1
              ELSE 2 END AS c
  FROM documents
)
SELECT cast(c AS bigint) AS group_id, count(*) AS n_docs
FROM planted GROUP BY c
""",
        "umap_cluster_recovery": """
WITH planted AS (
  SELECT CASE WHEN doc_id % 10 <= 4 THEN 0
              WHEN doc_id % 10 <= 7 THEN 1
              ELSE 2 END AS c
  FROM documents
),
sizes AS (SELECT c, count(*) AS topic_size FROM planted GROUP BY c)
SELECT row_number() OVER (ORDER BY topic_size DESC) - 1 AS topic_id,
       topic_size
FROM sizes
""",
        "hnsw_many_full_ef": """
WITH qs AS (
  SELECT 'q' || vec_id AS query_id, embedding::DOUBLE[] AS e
  FROM embeddings WHERE vec_id IN (3, 7, 11)
),
scored AS (
  SELECT qs.query_id, em.vec_id,
         round(list_dot_product(em.embedding::DOUBLE[], qs.e)
               / (sqrt(list_dot_product(em.embedding::DOUBLE[], em.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(qs.e, qs.e))), 6) AS score
  FROM embeddings em, qs
),
rnk AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, vec_id ASC
         ) AS rn
  FROM scored
)
SELECT query_id, vec_id, score FROM rnk WHERE rn <= 5
ORDER BY query_id, score DESC, vec_id ASC
""",
        "emb_near_dup": """
WITH n AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
         ) AS v
  FROM embeddings
),
p AS (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         round(list_dot_product(a.v, b.v), 6) AS cosine
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT vec_id_a, vec_id_b, cosine FROM p
WHERE cosine >= 0.35 ORDER BY vec_id_a, vec_id_b
""",
        "centroids_by_pos": f"""
WITH {_CENTROIDS_CTE},
flat AS (
  SELECT label, unnest(c) AS comp, generate_subscripts(c, 1) AS pos
  FROM centroids
)
SELECT label, pos, round(comp, 6) AS comp FROM flat
""",
        "assign_nearest": f"""
WITH {_CENTROIDS_CTE},
normed AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / greatest(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 1e-12)
         ) AS v
  FROM embeddings
),
scored AS (
  SELECT n.vec_id, c.label, list_dot_product(n.v, c.c) AS s
  FROM normed n CROSS JOIN centroids c
),
ranked AS (
  SELECT vec_id, label,
         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, label ASC) AS rn
  FROM scored
)
SELECT vec_id, label AS assigned_label FROM ranked WHERE rn = 1
""",
        "assign_top3": f"""
WITH {_CENTROIDS_CTE},
normed AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / greatest(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 1e-12)
         ) AS v
  FROM embeddings
),
scored AS (
  SELECT n.vec_id, c.label, list_dot_product(n.v, c.c) AS s
  FROM normed n CROSS JOIN centroids c
),
ranked AS (
  SELECT vec_id, label, s,
         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, label ASC) AS rn
  FROM scored
)
SELECT vec_id, CAST(rn AS INT) AS rank, label AS topic_label,
       round(s, 6) AS score
FROM ranked WHERE rn <= 3
""",
        "similar_words_top10": f"""
WITH {_STATS_CTES},
q(term, sign) AS (VALUES ('table', 1.0), ('spark', 1.0)),
tfq AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
dscored AS (
  SELECT tfq.doc_id,
         sum(q.sign
             * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
             * (tfq.tf * ({BM25_K1} + 1.0))
             / (tfq.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
         ) AS dscore
  FROM tfq
  JOIN q USING (term) JOIN vocab USING (term) JOIN doc_stats USING (doc_id)
  CROSS JOIN globals
  GROUP BY tfq.doc_id
),
topdocs AS (
  SELECT doc_id, dscore FROM dscored
  ORDER BY dscore DESC, doc_id ASC LIMIT 50
),
cooc AS (
  SELECT t.term, sum(td.dscore) AS score
  FROM tokens t JOIN topdocs td USING (doc_id)
  WHERE t.term NOT IN ('table', 'spark')
  GROUP BY t.term
)
SELECT term, round(score, 4) AS score FROM cooc
ORDER BY score DESC, term ASC LIMIT 10
""",
        "sessions_by_user": _SESSIONS_ORACLE,
        "events_sliding_mean": """
SELECT event_id, user_id,
       round(avg(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
       ), 6) AS sliding_mean
FROM events
""",
        "topic_sizes": f"""
WITH {_CENTROIDS_CTE},
normed AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / greatest(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 1e-12)
         ) AS v
  FROM embeddings
),
scored AS (
  SELECT n.vec_id, c.label, list_dot_product(n.v, c.c) AS s
  FROM normed n CROSS JOIN centroids c
),
assigned AS (
  SELECT vec_id, label FROM (
    SELECT vec_id, label,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, label ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
sizes AS (
  SELECT label, count(*) AS topic_size FROM assigned GROUP BY label
)
SELECT row_number() OVER (ORDER BY topic_size DESC, label ASC) - 1 AS topic_id,
       topic_size
FROM sizes
""",
        "sliding_vec_mean": """
WITH tv AS (
  SELECT vec_id % 23 AS doc_id,
         row_number() OVER (PARTITION BY vec_id % 23 ORDER BY vec_id) - 1 AS pos,
         embedding::DOUBLE[] AS vec
  FROM embeddings
),
d AS (SELECT doc_id, count(*) AS n FROM tv GROUP BY doc_id),
wins AS (
  SELECT doc_id, n,
         unnest([i for i in range(0,
           greatest(CAST(ceil((n - 8) / 5.0) AS INT), 0) + 1)]) AS window_id
  FROM d
),
w2 AS (
  SELECT doc_id, window_id,
         least(window_id * 5, greatest(n - 8, 0)) AS start
  FROM wins
),
flat AS (
  SELECT w.doc_id, w.window_id, w.start,
         generate_subscripts(tv.vec, 1) AS dim, unnest(tv.vec) AS v
  FROM w2 w JOIN tv ON tv.doc_id = w.doc_id
   AND tv.pos >= w.start AND tv.pos < w.start + 8
)
SELECT doc_id, window_id, start, dim,
       -- + 0.0 : DuckDB round preserves -0.0, Spark's returns +0.0
       round(avg(v), 5) + 0.0 AS v
FROM flat GROUP BY doc_id, window_id, start, dim
""",
        "fingerprint_dups": r"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         '  ' || replace(text, ' ', '  ') || '  ' AS text
  FROM documents
),
norm AS (
  SELECT doc_id,
         lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS k
  FROM all_docs
)
SELECT doc_id, min(doc_id) OVER (PARTITION BY k) AS canonical_id
FROM norm
""",
        "quality_windows": r"""
WITH f AS (
  SELECT 1767225600 + (doc_id * 37) % 7200 AS te, lang,
         len(text) AS n_chars,
         len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
           / greatest(len(text), 1) AS alpha_ratio,
         CASE WHEN len(text) < 200 THEN 1 ELSE 0 END AS is_short
  FROM documents
)
SELECT te - te % 60 AS win_start, lang,
       count(*) AS n_pages,
       round(avg(n_chars), 6) AS avg_chars,
       round(avg(alpha_ratio), 6) AS avg_alpha_ratio,
       CAST(sum(is_short) AS BIGINT) AS n_short
FROM f GROUP BY 1, 2
""",
        "topic_distribution": f"""
WITH {_CENTROIDS_CTE},
normed AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / greatest(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 1e-12)
         ) AS v
  FROM embeddings
),
scored AS (
  SELECT n.vec_id, c.label, list_dot_product(n.v, c.c) AS s
  FROM normed n CROSS JOIN centroids c
),
assigned AS (
  SELECT vec_id, label FROM (
    SELECT vec_id, label,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, label ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
renum AS (
  SELECT label, row_number() OVER (
    ORDER BY count(*) DESC, label ASC) - 1 AS topic_id
  FROM assigned GROUP BY label
),
member AS (
  SELECT a.vec_id, r.topic_id FROM assigned a JOIN renum r USING (label)
),
by_pos2 AS (
  SELECT m.topic_id, unnest(e.embedding::DOUBLE[]) AS v,
         generate_subscripts(e.embedding, 1) AS pos
  FROM embeddings e JOIN member m USING (vec_id)
),
means2 AS (
  SELECT topic_id, pos, avg(v) AS m FROM by_pos2 GROUP BY topic_id, pos
),
cent2 AS (
  SELECT topic_id, array_agg(m ORDER BY pos) AS c, sqrt(sum(m * m)) AS nrm
  FROM means2 GROUP BY topic_id
),
centroids2 AS (
  SELECT topic_id, list_transform(c, x -> x / nrm) AS c FROM cent2
),
nt AS (SELECT count(*) AS n FROM centroids2),
q AS (SELECT vec_id, v FROM normed WHERE vec_id IN (0, 1, 2, 3, 4)),
s2 AS (
  SELECT q.vec_id, c.topic_id,
         greatest(list_dot_product(q.v, c.c), 0.0) AS p
  FROM q CROSS JOIN centroids2 c
),
z AS (
  SELECT vec_id, topic_id, p,
         sum(p) OVER (PARTITION BY vec_id) AS z
  FROM s2
)
SELECT vec_id AS doc_id, topic_id,
       round(CASE WHEN z > 0 THEN p / z ELSE 1.0 / nt.n END, 6) AS probability
FROM z CROSS JOIN nt
""",
        "smooth_vec_adjacent": """
WITH tv AS (
  SELECT vec_id % 23 AS doc_id,
         row_number() OVER (PARTITION BY vec_id % 23 ORDER BY vec_id) - 1 AS pos,
         embedding::DOUBLE[] AS vec
  FROM embeddings
),
nv AS (
  SELECT doc_id, pos,
         list_transform(vec, x -> x / sqrt(list_dot_product(vec, vec))) AS v
  FROM tv
),
flat AS (
  SELECT doc_id, pos, generate_subscripts(v, 1) AS dim, unnest(v) AS val
  FROM nv
)
SELECT doc_id, pos, dim,
       -- + 0.0 : DuckDB round preserves -0.0, Spark's returns +0.0
       round(avg(val) OVER (
         PARTITION BY doc_id, dim ORDER BY pos
         ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
       ), 5) + 0.0 AS v
FROM flat
""",
        "simhash_dup_pairs": f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents
),
tl AS (
  SELECT doc_id, {duckdb_tokens_sql()} AS toks FROM all_docs
),
ss AS (
  SELECT doc_id, list_sort(list_distinct(toks))::VARCHAR AS k FROM tl
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM ss a JOIN ss b ON a.k = b.k AND a.doc_id < b.doc_id
""",
        "noise_topic_assign": """
WITH lbl AS (
  SELECT vec_id, embedding,
         CASE WHEN label = 9 THEN -1 ELSE label END AS label
  FROM embeddings
),
by_pos AS (
  SELECT label, unnest(embedding::DOUBLE[]) AS v,
         generate_subscripts(embedding, 1) AS pos
  FROM lbl WHERE label != -1
),
means AS (
  SELECT label, pos, avg(v) AS m FROM by_pos GROUP BY label, pos
),
cent AS (
  SELECT label, array_agg(m ORDER BY pos) AS c, sqrt(sum(m * m)) AS nrm
  FROM means GROUP BY label
),
centroids AS (
  SELECT label, list_transform(c, x -> x / nrm) AS c FROM cent
),
normed AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / greatest(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 1e-12)
         ) AS v
  FROM lbl
),
scored AS (
  SELECT n.vec_id, c.label, list_dot_product(n.v, c.c) AS s
  FROM normed n CROSS JOIN centroids c
),
assigned AS (
  SELECT vec_id, label, s FROM (
    SELECT vec_id, label, s,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, label ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
renum AS (
  SELECT label, row_number() OVER (
    ORDER BY count(*) DESC, label ASC) - 1 AS topic_id
  FROM assigned GROUP BY label
)
SELECT a.vec_id AS doc_id, r.topic_id, round(a.s, 6) AS score
FROM assigned a JOIN renum r USING (label)
""",
        "topic_merge_map": f"""
WITH RECURSIVE {_CENTROIDS_CTE},
edges AS (
  SELECT a.label AS src, b.label AS dst
  FROM centroids a JOIN centroids b ON a.label <> b.label
  WHERE list_dot_product(a.c, b.c) > 0.2
  UNION ALL
  SELECT label, label FROM centroids
),
reach(src, node) AS (
  SELECT label, label FROM centroids
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.node = e.src
)
SELECT src AS topic_id, min(node) AS merged_id
FROM reach GROUP BY src ORDER BY topic_id
""",
        "incremental_topic_sizes": f"""
WITH {_CENTROIDS_CTE},
normed AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / greatest(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 1e-12)
         ) AS v
  FROM embeddings
),
scored AS (
  SELECT n.vec_id, c.label, list_dot_product(n.v, c.c) AS s
  FROM normed n CROSS JOIN centroids c
),
assigned AS (
  SELECT vec_id, label FROM (
    SELECT vec_id, label,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, label ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
renum AS (
  SELECT label, row_number() OVER (
    ORDER BY count(*) DESC, label ASC) - 1 AS topic_id
  FROM assigned GROUP BY label
),
member AS (
  SELECT a.vec_id, r.topic_id FROM assigned a JOIN renum r USING (label)
),
by_pos2 AS (
  SELECT m.topic_id, unnest(e.embedding::DOUBLE[]) AS v,
         generate_subscripts(e.embedding, 1) AS pos
  FROM embeddings e JOIN member m USING (vec_id)
),
means2 AS (
  SELECT topic_id, pos, avg(v) AS m FROM by_pos2 GROUP BY topic_id, pos
),
cent2 AS (
  SELECT topic_id, array_agg(m ORDER BY pos) AS c, sqrt(sum(m * m)) AS nrm
  FROM means2 GROUP BY topic_id
),
centroids2 AS (
  SELECT topic_id, list_transform(c, x -> x / nrm) AS c FROM cent2
),
newv AS (
  SELECT vec_id + 100000 AS vec_id,
         list_transform(list_reverse(embedding::DOUBLE[]),
           x -> x / greatest(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 1e-12)
         ) AS v
  FROM embeddings
),
ns AS (
  SELECT n.vec_id, c.topic_id, list_dot_product(n.v, c.c) AS s
  FROM newv n CROSS JOIN centroids2 c
),
nassign AS (
  SELECT vec_id, topic_id FROM (
    SELECT vec_id, topic_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, topic_id ASC) AS rn
    FROM ns
  ) WHERE rn = 1
),
allm AS (
  SELECT topic_id FROM member UNION ALL SELECT topic_id FROM nassign
)
SELECT topic_id, count(*) AS topic_size FROM allm GROUP BY topic_id
""",
        "chunks_custom": """
WITH c AS (
  SELECT doc_id,
         unnest([{'cid': i, 'ch': substring(text, i * 80 + 1, 80)}
                 for i in range(0, CAST(ceil(len(text) / 80.0) AS INT))]) AS u
  FROM documents
)
SELECT doc_id, CAST(u.cid AS BIGINT) AS chunk_id, u.ch AS chunk_text
FROM c
""",
        "docs_by_topic": """
WITH by_pos AS (
  SELECT label, unnest(embedding::DOUBLE[]) AS v,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
),
means AS (
  SELECT label, pos, avg(v) AS m FROM by_pos GROUP BY label, pos
),
cent AS (
  SELECT label, array_agg(m ORDER BY pos) AS c, sqrt(sum(m * m)) AS nrm
  FROM means GROUP BY label
),
centroids AS (
  SELECT label, list_transform(c, x -> x / nrm) AS c FROM cent
),
normed AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / greatest(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 1e-12)
         ) AS v
  FROM embeddings
),
scored AS (
  SELECT n.vec_id, c.label, list_dot_product(n.v, c.c) AS s
  FROM normed n CROSS JOIN centroids c
),
assigned AS (
  SELECT vec_id, label, s FROM (
    SELECT vec_id, label, s,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, label ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
renum AS (
  SELECT label, row_number() OVER (
    ORDER BY count(*) DESC, label ASC) - 1 AS topic_id
  FROM assigned GROUP BY label
)
SELECT a.vec_id AS doc_id, round(a.s, 6) AS score
FROM assigned a JOIN renum r USING (label)
WHERE r.topic_id = 1
""",
        "vocab_custom_tokenizer": r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(
           regexp_split_to_array(lower(text), '[^a-z]+'),
           w -> len(w) >= 3)) AS term
  FROM documents
),
counts AS (
  SELECT term, count(*) AS cf, count(DISTINCT doc_id) AS df
  FROM toks GROUP BY term HAVING count(*) > 5
)
SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) - 1 AS term_id,
       df, cf
FROM counts
""",
        "vocab_sentencized": f"""
WITH sents AS (
  SELECT doc_id, generate_subscripts(parts, 1) - 1 AS sent_id,
         unnest(parts) AS sentence
  FROM (SELECT doc_id, regexp_split_to_array(text, ' table ') AS parts
        FROM documents)
),
stoks AS (
  SELECT doc_id * 100000 + sent_id AS sid,
         unnest(list_filter(
           regexp_extract_all(lower(regexp_replace(sentence, '<[^>]+>', '', 'g')), '[a-z_]+'),
           t -> len(t) BETWEEN {MIN_TOKEN_LEN} AND {MAX_TOKEN_LEN} AND NOT starts_with(t, '_')
         )) AS term
  FROM sents
),
counts AS (
  SELECT term, count(*) AS cf, count(DISTINCT sid) AS df
  FROM stoks GROUP BY term HAVING count(*) > 2
)
SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) - 1 AS term_id,
       df, cf
FROM counts
""",
        "doc_tokens": f"""
SELECT doc_id,
       array_to_string(list_filter(
         regexp_extract_all(lower(regexp_replace(text, '<[^>]+>', '', 'g')), '[a-z_]+'),
         t -> len(t) BETWEEN {MIN_TOKEN_LEN} AND {MAX_TOKEN_LEN} AND NOT starts_with(t, '_')
       ), ' ') AS tokens_joined
FROM documents
""",
        "ctx_chunk_vectors": """
WITH toks AS (
  SELECT doc_id, t.tok AS term, t.pos - 1 AS pos
  FROM (
    SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS l
    FROM documents
  ), LATERAL (SELECT unnest(l) AS tok, generate_subscripts(l, 1) AS pos) t
),
dls AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
bounds AS (
  SELECT greatest(CAST(ceil((max(n) - 8) / 5.0) AS BIGINT), 0) AS mi FROM dls
),
series AS (SELECT unnest(range(0, (SELECT mi + 1 FROM bounds))) AS i),
rawstarts AS (
  SELECT DISTINCT doc_id, least(i * 5, greatest(n - 8, 0)) AS start
  FROM dls CROSS JOIN series
  WHERE i <= greatest(CAST(ceil((n - 8) / 5.0) AS BIGINT), 0)
),
starts AS (
  SELECT doc_id, start,
         row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1 AS chunk_id
  FROM rawstarts
),
dims AS (
  SELECT s.doc_id, s.chunk_id, s.start,
         avg(CAST(len(t.term) AS DOUBLE)) AS m0,
         avg(CAST(len(t.term) - len(replace(t.term, 'a', '')) + 1 AS DOUBLE)) AS m1,
         avg(CAST(len(t.term) - len(replace(t.term, 'e', '')) + 1 AS DOUBLE)) AS m2,
         avg(CAST(7 AS DOUBLE)) AS m3
  FROM starts s JOIN toks t
    ON t.doc_id = s.doc_id AND t.pos >= s.start AND t.pos < s.start + 8
  GROUP BY s.doc_id, s.chunk_id, s.start
),
normed AS (
  SELECT *, sqrt(m0*m0 + m1*m1 + m2*m2 + m3*m3) AS nrm FROM dims
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(start AS BIGINT) AS start, CAST(d.i - 1 AS BIGINT) AS dim,
       round([m0/nrm, m1/nrm, m2/nrm, m3/nrm][d.i], 6) AS val
FROM normed, (VALUES (1), (2), (3), (4)) d(i)
""",
        "ctx_word_vectors": f"""
WITH {_TOKENS_CTE},
vocab AS (SELECT term FROM tokens GROUP BY term HAVING count(*) > 2),
feats AS (
  SELECT term,
         CAST(len(term) AS DOUBLE) AS m0,
         CAST(len(term) - len(replace(term, 'a', '')) + 1 AS DOUBLE) AS m1,
         CAST(len(term) - len(replace(term, 'e', '')) + 1 AS DOUBLE) AS m2,
         CAST(7 AS DOUBLE) AS m3
  FROM vocab
),
normed AS (
  SELECT *, sqrt(m0*m0 + m1*m1 + m2*m2 + m3*m3) AS nrm FROM feats
)
SELECT term, CAST(d.i - 1 AS BIGINT) AS dim,
       round(CAST(CAST([m0/nrm, m1/nrm, m2/nrm, m3/nrm][d.i] AS REAL) AS DOUBLE), 6) AS val
FROM normed, (VALUES (1), (2), (3), (4)) d(i)
""",
        "ctx_topic_dist": """
WITH toks AS (
  SELECT doc_id, t.tok AS term, t.pos - 1 AS pos
  FROM (
    SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS l
    FROM documents
  ), LATERAL (SELECT unnest(l) AS tok, generate_subscripts(l, 1) AS pos) t
),
feats AS (
  SELECT doc_id, pos,
         CAST(len(term) AS DOUBLE) AS m0,
         CAST(len(term) - len(replace(term, 'a', '')) + 1 AS DOUBLE) AS m1,
         CAST(len(term) - len(replace(term, 'e', '')) + 1 AS DOUBLE) AS m2,
         CAST(7 AS DOUBLE) AS m3
  FROM toks
),
scored AS (
  SELECT doc_id, pos, tv.topic_id,
         m0*tv.c0 + m1*tv.c1 + m2*tv.c2 + m3*tv.c3 AS score
  FROM feats, (VALUES (0, 1.0, 0.0, 0.0, 0.0),
                      (1, 0.0, 2.0, -1.0, 0.0),
                      (2, -1.0, 0.0, 3.0, 0.0)) tv(topic_id, c0, c1, c2, c3)
),
best AS (
  SELECT doc_id, pos, topic_id, score,
         row_number() OVER (
           PARTITION BY doc_id, pos ORDER BY score DESC, topic_id
         ) AS rn
  FROM scored
),
agg AS (
  SELECT doc_id, topic_id,
         count(*) AS token_count, avg(score) AS relevance
  FROM best WHERE rn = 1 GROUP BY doc_id, topic_id
)
SELECT doc_id, CAST(topic_id AS BIGINT) AS topic_id,
       CAST(token_count AS BIGINT) AS token_count,
       round(CAST(token_count AS DOUBLE)
             / CAST(sum(token_count) OVER (PARTITION BY doc_id) AS DOUBLE),
             6) AS probability,
       round(relevance, 6) AS relevance
FROM agg
""",
        "pack_sequences": f"""
WITH toks AS (
  SELECT doc_id, t.tok AS term, t.pos - 1 AS pos
  FROM (
    SELECT doc_id, list_filter(
      regexp_extract_all(lower(regexp_replace(text, '<[^>]+>', '', 'g')), '[a-z_]+'),
      t -> len(t) BETWEEN {MIN_TOKEN_LEN} AND {MAX_TOKEN_LEN} AND NOT starts_with(t, '_')
    ) AS l
    FROM documents
  ), LATERAL (SELECT unnest(l) AS tok, generate_subscripts(l, 1) AS pos) t
),
lens AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
offs AS (
  SELECT doc_id, n,
         sum(n + 1) OVER (ORDER BY doc_id) - (n + 1) AS doc_off
  FROM lens
),
body AS (
  SELECT t.doc_id, o.doc_off + t.pos AS g, t.term
  FROM toks t JOIN offs o ON t.doc_id = o.doc_id
  UNION ALL
  SELECT doc_id, doc_off + n AS g, '<eos>' AS term FROM offs
)
SELECT CAST(g // 128 AS BIGINT) AS seq_id, CAST(g % 128 AS BIGINT) AS pos,
       doc_id, term
FROM body
""",
        "corpus_split": """
SELECT doc_id,
       CASE WHEN b < 9800 THEN 'train'
            WHEN b < 9900 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         (((((doc_id % 2147483648) * 2654435761) % 4294967296
            + (17 * 2654435761 + 40503) % 4294967296)
           * 40503) % 4294967296 * 10000) >> 32 AS b
  FROM documents
)
""",
        "corpus_mix": f"""
WITH {_TOKENS_CTE},
lens AS (SELECT doc_id, count(*) AS n_tokens FROM tokens GROUP BY doc_id),
src AS (
  SELECT doc_id, n_tokens,
         CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS source
  FROM lens
),
tot AS (SELECT sum(n_tokens) AS total FROM src),
plan AS (
  SELECT p.source, p.t_s,
         CAST(floor(p.b / p.t_s) AS BIGINT) AS epochs,
         CAST(floor((p.b - floor(p.b / p.t_s) * p.t_s) / p.t_s * 10000)
              AS BIGINT) AS cut
  FROM (
    SELECT source, sum(n_tokens) AS t_s,
           (CASE WHEN source = 'a' THEN 0.75 ELSE 0.25 END)
             * (4 * (SELECT total FROM tot)) AS b
    FROM src GROUP BY source
  ) p
),
full_eps AS (
  SELECT s.source, CAST(e.x AS BIGINT) AS epoch, s.doc_id, s.n_tokens
  FROM src s JOIN plan p ON s.source = p.source,
       LATERAL (SELECT unnest(range(p.epochs)) AS x) e
),
rem AS (
  SELECT s.source, p.epochs AS epoch, s.doc_id, s.n_tokens
  FROM src s JOIN plan p ON s.source = p.source
  WHERE p.cut > 0 AND
        (((((s.doc_id % 2147483648) * 2654435761) % 4294967296
            + (29 * 2654435761 + 40503) % 4294967296)
          * 40503) % 4294967296 * 10000) >> 32 < p.cut
)
SELECT * FROM full_eps UNION ALL SELECT * FROM rem
""",
        "embed_hook": """
WITH feats AS (
  SELECT doc_id AS vec_id,
         [CAST(length(text) AS DOUBLE),
          CAST(length(text) - length(replace(text, 'a', '')) + 1 AS DOUBLE),
          CAST(length(text) - length(replace(text, 'e', '')) + 1 AS DOUBLE),
          CAST(7 AS DOUBLE)] AS v
  FROM documents
),
normed AS (
  SELECT vec_id, v,
         sqrt(v[1]*v[1] + v[2]*v[2] + v[3]*v[3] + v[4]*v[4]) AS n
  FROM feats
)
SELECT vec_id,
       CAST(d.i - 1 AS BIGINT) AS dim,
       round(CAST(CAST(v[d.i] / n AS REAL) AS DOUBLE), 6) AS val
FROM normed, (VALUES (1), (2), (3), (4)) d(i)
""",
        "hashed_vectors": f"""
WITH {_TOKENS_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tokens GROUP BY doc_id, term),
vstats AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokens GROUP BY term),
vnum AS (SELECT term,
                row_number() OVER (ORDER BY df DESC, term ASC) - 1 AS term_id
         FROM vstats),
w AS (
  SELECT doc_id,
         (term_id * 2654435761) % 32 AS bucket,
         CAST((2 * ((term_id * 40503) % 2) - 1) * tf AS DOUBLE) AS wv
  FROM tf JOIN vnum USING (term)
),
sums AS (SELECT doc_id, bucket, sum(wv) AS val FROM w GROUP BY doc_id, bucket),
dims AS (SELECT CAST(range AS BIGINT) AS i FROM range(32)),
dense AS (
  SELECT d.doc_id, dims.i AS dim, coalesce(s.val, 0.0) AS val
  FROM (SELECT DISTINCT doc_id FROM sums) d
  CROSS JOIN dims
  LEFT JOIN sums s ON s.doc_id = d.doc_id AND s.bucket = dims.i
),
nrm AS (SELECT doc_id, sqrt(sum(val * val)) AS n FROM dense GROUP BY doc_id)
SELECT d.doc_id AS vec_id, d.dim,
       round(CAST(CAST(d.val / n.n AS REAL) AS DOUBLE), 6) AS val
FROM dense d JOIN nrm n USING (doc_id)
WHERE n.n > 0
""",
        "doc_token_topics": f"""
WITH {_CENTROIDS_CTE},
{_TOPIC_CTFIDF_CTE},
best AS (
  SELECT term, topic_id, score FROM (
    SELECT term, topic_id, score,
           row_number() OVER (PARTITION BY term ORDER BY score DESC, topic_id ASC) AS rn
    FROM ctfidf
  ) WHERE rn = 1
)
SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos, t.term,
       CAST(b.topic_id AS BIGINT) AS topic_id, b.score
FROM tokens_pos t JOIN best b USING (term)
""".replace("{tokens_expr}", duckdb_tokens_sql()),
        "hierarchy_step": f"""
WITH {_CENTROIDS_CTE},
sizes AS (SELECT label, count(*) AS sz FROM embeddings GROUP BY label),
cd AS (SELECT label, unnest(c) AS v, generate_subscripts(c, 1) AS pos
       FROM centroids),
small AS (SELECT label, sz FROM sizes ORDER BY sz ASC, label ASC LIMIT 1),
tgt AS (
  SELECT b.label, sum(a.v * b.v) AS sim
  FROM cd a JOIN cd b USING (pos)
  WHERE a.label = (SELECT label FROM small) AND b.label != a.label
  GROUP BY b.label
  ORDER BY sim DESC, b.label ASC LIMIT 1
),
mergedraw AS (
  SELECT b.pos,
         (b.v * (SELECT sz FROM sizes WHERE label = (SELECT label FROM tgt))
          + a.v * (SELECT sz FROM small))
         / ((SELECT sz FROM sizes WHERE label = (SELECT label FROM tgt))
            + (SELECT sz FROM small)) AS mv
  FROM cd a JOIN cd b USING (pos)
  WHERE a.label = (SELECT label FROM small)
    AND b.label = (SELECT label FROM tgt)
),
mnorm AS (SELECT sqrt(sum(mv * mv)) AS n FROM mergedraw),
tgtmem AS (
  SELECT string_agg(CAST(m AS VARCHAR), ',' ORDER BY m) AS s
  FROM (SELECT label AS m FROM small UNION ALL SELECT label FROM tgt)
),
outdims AS (
  SELECT c.label, c.pos,
         CASE WHEN c.label = (SELECT label FROM tgt)
              THEN (SELECT mv FROM mergedraw m WHERE m.pos = c.pos)
                   / (SELECT n FROM mnorm)
              ELSE c.v END AS val
  FROM cd c WHERE c.label != (SELECT label FROM small)
)
SELECT label,
       CASE WHEN label = (SELECT label FROM tgt) THEN (SELECT s FROM tgtmem)
            ELSE CAST(label AS VARCHAR) END AS members,
       CAST(pos - 1 AS BIGINT) AS dim,
       round(val, 4) AS val
FROM outdims
""",
        "wordcloud_weights": f"""
WITH {_CENTROIDS_CTE},
{_TOPIC_CTFIDF_CTE},
t0 AS (
  SELECT term, score FROM (
    SELECT term, score,
           row_number() OVER (ORDER BY score DESC, term ASC) AS rn
    FROM ctfidf WHERE topic_id = 0
  ) WHERE rn <= 50
),
mx AS (SELECT max(score) AS m FROM t0),
ex AS (SELECT term, exp(score - (SELECT m FROM mx)) AS e FROM t0),
z AS (SELECT sum(e) AS zz FROM ex)
SELECT term, round(e / (SELECT zz FROM z), 6) AS weight
FROM ex ORDER BY term
""".replace("{tokens_expr}", duckdb_tokens_sql()),
        "media_features": """
WITH px AS (
  SELECT doc_id,
         (doc_id*7 + y*31 + x*13) % 256 AS r,
         (doc_id*7 + y*31 + x*13 + 97) % 256 AS g,
         (doc_id*7 + y*31 + x*13 + 194) % 256 AS b
  FROM documents, range(0, 4) t1(y), range(0, 8) t2(x)
),
imgf AS (
  SELECT doc_id,
         round(avg(r), 6) AS mean_r, round(avg(g), 6) AS mean_g,
         round(avg(b), 6) AS mean_b,
         round(stddev_pop(r), 6) AS std_r, round(stddev_pop(g), 6) AS std_g,
         round(stddev_pop(b), 6) AS std_b
  FROM px GROUP BY doc_id
),
smp AS (
  SELECT doc_id, i,
         CAST((doc_id*31 + i*17) % 4096 - 2048 AS DOUBLE) AS s
  FROM documents, range(0, 400) t(i)
),
lagged AS (
  SELECT doc_id, s, lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS ps
  FROM smp
),
rmsf AS (
  SELECT doc_id, round(sqrt(avg(s*s)), 6) AS rms,
         round(max(abs(s)), 6) AS peak
  FROM smp GROUP BY doc_id
),
zcrf AS (
  SELECT doc_id,
         round(avg(CASE WHEN (s < 0) != (ps < 0) THEN 1.0 ELSE 0.0 END), 6) AS zcr
  FROM lagged WHERE ps IS NOT NULL GROUP BY doc_id
)
SELECT imgf.doc_id, mean_r, mean_g, mean_b, std_r, std_g, std_b,
       round(400.0 / 8000.0, 6) AS duration_s, rms, zcr, peak
FROM imgf JOIN rmsf USING (doc_id) JOIN zcrf USING (doc_id)
""",
        "docs_topics_top2": f"""
WITH {_CENTROIDS_CTE},
normed AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / greatest(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 1e-12)
         ) AS v
  FROM embeddings
),
scored AS (
  SELECT n.vec_id, c.label, list_dot_product(n.v, c.c) AS s
  FROM normed n CROSS JOIN centroids c
),
assigned AS (
  SELECT vec_id, label FROM (
    SELECT vec_id, label,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, label ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
renum AS (
  SELECT label, row_number() OVER (
    ORDER BY count(*) DESC, label ASC) - 1 AS topic_id
  FROM assigned GROUP BY label
),
member AS (
  SELECT a.vec_id, r.topic_id FROM assigned a JOIN renum r USING (label)
),
by_pos2 AS (
  SELECT m.topic_id, unnest(e.embedding::DOUBLE[]) AS v,
         generate_subscripts(e.embedding, 1) AS pos
  FROM embeddings e JOIN member m USING (vec_id)
),
means2 AS (
  SELECT topic_id, pos, avg(v) AS m FROM by_pos2 GROUP BY topic_id, pos
),
cent2 AS (
  SELECT topic_id, array_agg(m ORDER BY pos) AS c, sqrt(sum(m * m)) AS nrm
  FROM means2 GROUP BY topic_id
),
centroids2 AS (
  SELECT topic_id, list_transform(c, x -> x / nrm) AS c FROM cent2
),
q AS (SELECT vec_id, v FROM normed WHERE vec_id < 20),
s2 AS (
  SELECT q.vec_id, c.topic_id, list_dot_product(q.v, c.c) AS s
  FROM q CROSS JOIN centroids2 c
),
ranked AS (
  SELECT vec_id, topic_id, s,
         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, topic_id ASC) AS rn
  FROM s2
)
SELECT vec_id AS doc_id, CAST(rn AS INT) AS rank, topic_id,
       round(s, 6) AS score
FROM ranked WHERE rn <= 2
""",
        "repetition_stats": r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
  FROM documents
),
lists AS (
  SELECT doc_id, ws AS g1,
         list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS g2,
         list_transform(range(1, len(ws) - 1),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g3
  FROM w
),
longg AS (
  SELECT doc_id, 1 AS n, unnest(g1) AS gram FROM lists
  UNION ALL SELECT doc_id, 2 AS n, unnest(g2) AS gram FROM lists
  UNION ALL SELECT doc_id, 3 AS n, unnest(g3) AS gram FROM lists
),
counts AS (SELECT doc_id, n, gram, count(*) AS c FROM longg GROUP BY ALL),
per AS (
  SELECT doc_id,
    sum(CASE WHEN n=1 THEN c END) AS w_tot, max(CASE WHEN n=1 THEN c END) AS w_top,
    count(CASE WHEN n=1 THEN 1 END) AS w_dist,
    sum(CASE WHEN n=2 THEN c END) AS b_tot, max(CASE WHEN n=2 THEN c END) AS b_top,
    sum(CASE WHEN n=3 THEN c END) AS t_tot, count(CASE WHEN n=3 THEN 1 END) AS t_dist
  FROM counts GROUP BY doc_id
)
SELECT doc_id, cast(coalesce(w_tot, 0) AS BIGINT) AS n_words,
  round(coalesce(w_top * 1.0 / w_tot, 0.0), 6) AS top_word_frac,
  round(coalesce(w_dist * 1.0 / w_tot, 0.0), 6) AS uniq_word_frac,
  round(coalesce(b_top * 1.0 / b_tot, 0.0), 6) AS top_bigram_frac,
  round(coalesce((t_tot - t_dist) * 1.0 / t_tot, 0.0), 6) AS dup_trigram_frac
FROM per
""",
        "corpus_filter": r"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
  FROM documents
),
lists AS (
  SELECT doc_id, text, ws AS g1,
         list_transform(range(1, len(ws) - 1),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g3
  FROM w
),
feats AS (
  SELECT doc_id,
    len(g1) AS n_words,
    round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
          / greatest(length(text), 1), 6) AS alpha_r,
    round((SELECT max(c) FROM (SELECT count(*) AS c
             FROM unnest(g1) AS t(x) GROUP BY x)) * 1.0
          / greatest(len(g1), 1), 6) AS topw_r,
    round(len(list_distinct(g1)) * 1.0 / greatest(len(g1), 1), 6) AS uniq_r,
    round(coalesce((len(g3) - len(list_distinct(g3))) * 1.0
          / nullif(len(g3), 0), 0.0), 6) AS trig_r
  FROM lists WHERE len(g1) > 0
),
flagged AS (
  SELECT doc_id,
    concat_ws(',',
      CASE WHEN NOT (n_words >= 30) THEN 'len' END,
      CASE WHEN NOT (alpha_r >= 0.82) THEN 'alpha' END,
      CASE WHEN NOT (uniq_r >= 0.40) THEN 'uniq' END,
      CASE WHEN NOT (topw_r <= 0.12) THEN 'top_word' END,
      CASE WHEN NOT (trig_r <= 0.10) THEN 'dup_trigram' END
    ) AS fails
  FROM feats
)
SELECT doc_id, fails = '' AS keep, fails FROM flagged
""",
        "sessions_by_user_salted": _SESSIONS_ORACLE,
        "domain_stats": r"""
WITH pages AS (
  SELECT doc_id, lang, text,
         'https://' || source || '.example.com/' || lang || '/docs/'
           || cast(doc_id AS VARCHAR) AS url
  FROM documents
),
parts AS (
  SELECT *, regexp_extract(url, 'https?://([^/?#]+)', 1) AS host,
         regexp_extract(url, 'https?://[^/?#]+(/[^?#]*)', 1) AS path
  FROM pages
)
SELECT host, regexp_extract(host, '([^.]+)$', 1) AS tld,
  cast(count(*) AS BIGINT) AS n_pages,
  cast(count(DISTINCT lang) AS BIGINT) AS n_langs,
  round(avg(length(text)), 6) AS avg_chars,
  cast(max(len(list_filter(string_split(path, '/'), x -> x <> ''))) AS INT)
    AS max_path_depth
FROM parts GROUP BY host
""",
        "url_dedup": r"""
WITH pages AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'https://' END)
    || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
    || source || '.example.com/p/' || cast(doc_id % 100 AS VARCHAR)
    || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 7 = 0 THEN '?utm=1' ELSE '' END) AS url
  FROM documents
),
canon AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(url),
      '^https?://', ''), '^www\.', ''), '[?#].*$', ''), '/+$', '') AS canon_url
  FROM pages
)
SELECT canon_url, cast(min(doc_id) AS BIGINT) AS keeper,
       cast(count(*) - 1 AS BIGINT) AS n_dupes
FROM canon GROUP BY canon_url
""",
        "pii_scrub": r"""
WITH pages AS (
  SELECT doc_id,
    substr(text, 1, 40) || ' contact user' || cast(doc_id % 89 AS VARCHAR)
    || '@ex' || cast(doc_id % 7 AS VARCHAR) || '.org now'
    || (CASE WHEN doc_id % 3 = 0
        THEN ' call +1-555-0' || lpad(cast(doc_id % 1000 AS VARCHAR), 3, '0')
        ELSE '' END)
    || (CASE WHEN doc_id % 4 = 0
        THEN ' from ' || cast(doc_id % 223 + 1 AS VARCHAR) || '.44.'
             || cast(doc_id % 250 AS VARCHAR) || '.7'
        ELSE '' END) AS text
  FROM documents
),
s1 AS (
  SELECT doc_id,
    len(regexp_extract_all(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        '<EMAIL>', 'g') AS t
  FROM pages
),
s2 AS (
  SELECT doc_id, n_email,
    len(regexp_extract_all(t,
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
    regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
        AS t
  FROM s1
),
s3 AS (
  SELECT doc_id, n_email, n_ipv4,
    len(regexp_extract_all(t, '\+\d[\d-]{7,14}\d')) AS n_phone,
    regexp_replace(t, '\+\d[\d-]{7,14}\d', '<PHONE>', 'g') AS scrubbed
  FROM s2
)
SELECT doc_id, cast(n_email AS INT) AS n_email, cast(n_ipv4 AS INT) AS n_ipv4,
       cast(n_phone AS INT) AS n_phone, md5(scrubbed) AS scrub_md5,
       cast(length(scrubbed) AS INT) AS scrub_len
FROM s3
""",
        "line_dedup": r"""
WITH pages AS (
  SELECT doc_id, concat_ws(chr(10),
    'subscribe to our newsletter',
    substr(text, 1, 60),
    substr(text, 61, 60),
    CASE WHEN doc_id % 5 = 0 THEN 'copyright example corp' END) AS text
  FROM documents
),
lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM pages
),
marked AS (
  SELECT doc_id, pos, line,
    (line = ''
     OR row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1)
      AS keep
  FROM lines
)
SELECT doc_id, cast(count(*) AS INT) AS n_lines,
  cast(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS INT) AS n_kept,
  md5(coalesce(
    string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), ''))
    AS clean_md5,
  cast(length(coalesce(
    string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), ''))
    AS INT) AS clean_len
FROM marked GROUP BY doc_id
""",
        "clean_corpus": r"""
WITH src AS (SELECT doc_id, text FROM documents),
pages AS (
  SELECT s.doc_id,
    concat_ws(chr(10),
      'subscribe to our newsletter',
      substr(b.text, 1, 80) || ' contact user'
        || cast(b.doc_id % 89 AS VARCHAR) || '@ex'
        || cast(b.doc_id % 7 AS VARCHAR) || '.org',
      substr(b.text, 81, 80)
        || (CASE WHEN b.doc_id % 3 = 0
            THEN ' call +1-555-0' || lpad(cast(b.doc_id % 1000 AS VARCHAR), 3, '0')
            ELSE '' END),
      CASE WHEN b.doc_id % 5 = 0 THEN 'copyright example corp' END) AS text
  FROM src s JOIN src b
    ON b.doc_id = s.doc_id - (CASE WHEN s.doc_id % 10 = 7 THEN 1 ELSE 0 END)
),
ex AS (
  SELECT doc_id, text,
    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM pages
),
surv AS (SELECT doc_id, text FROM ex WHERE rn = 1),
lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM surv
),
lmarked AS (
  SELECT doc_id, pos, line,
    (line = ''
     OR row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1)
      AS lkeep
  FROM lines
),
ld AS (
  SELECT doc_id, cast(count(*) AS INT) AS n_lines,
    cast(sum(CASE WHEN lkeep THEN 1 ELSE 0 END) AS INT) AS n_kept,
    coalesce(string_agg(CASE WHEN lkeep THEN line END, chr(10) ORDER BY pos),
             '') AS clean
  FROM lmarked GROUP BY doc_id
),
p1 AS (
  SELECT doc_id, n_lines, n_kept,
    len(regexp_extract_all(clean,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
    regexp_replace(clean, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        '<EMAIL>', 'g') AS t
  FROM ld
),
p2 AS (
  SELECT doc_id, n_lines, n_kept, n_email,
    len(regexp_extract_all(t,
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
    regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
        AS t
  FROM p1
),
p3 AS (
  SELECT doc_id, n_lines, n_kept, n_email, n_ipv4,
    len(regexp_extract_all(t, '\+\d[\d-]{7,14}\d')) AS n_phone,
    regexp_replace(t, '\+\d[\d-]{7,14}\d', '<PHONE>', 'g') AS scrubbed
  FROM p2
),
fw AS (
  SELECT doc_id, scrubbed,
    list_filter(regexp_split_to_array(trim(scrubbed), '\s+'), x -> x <> '')
      AS ws
  FROM p3
),
flists AS (
  SELECT doc_id, scrubbed, ws AS g1,
         list_transform(range(1, len(ws) - 1),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g3
  FROM fw
),
feats AS (
  SELECT doc_id,
    len(g1) AS n_words,
    round(length(regexp_replace(scrubbed, '[^A-Za-z]', '', 'g')) * 1.0
          / greatest(length(scrubbed), 1), 6) AS alpha_r,
    round((SELECT max(c) FROM (SELECT count(*) AS c
             FROM unnest(g1) AS t(x) GROUP BY x)) * 1.0
          / greatest(len(g1), 1), 6) AS topw_r,
    round(len(list_distinct(g1)) * 1.0 / greatest(len(g1), 1), 6) AS uniq_r,
    round(coalesce((len(g3) - len(list_distinct(g3))) * 1.0
          / nullif(len(g3), 0), 0.0), 6) AS trig_r
  FROM flists WHERE len(g1) > 0
),
flagged AS (
  SELECT doc_id,
    concat_ws(',',
      CASE WHEN NOT (n_words >= 20) THEN 'len' END,
      CASE WHEN NOT (alpha_r >= 0.60) THEN 'alpha' END,
      CASE WHEN NOT (uniq_r >= 0.40) THEN 'uniq' END,
      CASE WHEN NOT (topw_r <= 0.25) THEN 'top_word' END,
      CASE WHEN NOT (trig_r <= 0.10) THEN 'dup_trigram' END
    ) AS fails
  FROM feats
)
SELECT p3.doc_id,
  coalesce(f.fails = '', FALSE) AS keep,
  coalesce(f.fails, 'empty') AS reason,
  md5(p3.scrubbed) AS final_md5,
  cast(length(p3.scrubbed) AS INT) AS final_len,
  cast(p3.n_email + p3.n_ipv4 + p3.n_phone AS INT) AS n_pii,
  p3.n_lines, p3.n_kept
FROM p3 LEFT JOIN flagged f ON p3.doc_id = f.doc_id
UNION ALL
SELECT doc_id, FALSE AS keep, 'exact_dup' AS reason,
  cast(NULL AS VARCHAR) AS final_md5, cast(NULL AS INT) AS final_len,
  cast(NULL AS INT) AS n_pii, cast(NULL AS INT) AS n_lines,
  cast(NULL AS INT) AS n_kept
FROM ex WHERE rn > 1
""",
        "decontam": r"""
WITH w AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
  FROM documents
),
bench AS (
  SELECT ws[3:14] AS bw FROM w WHERE doc_id % 25 = 0
),
bgrams AS (
  SELECT DISTINCT gram FROM (
    SELECT unnest(list_transform(range(1, len(bw) - 6),
      i -> array_to_string(bw[i:i+7], ' '))) AS gram
    FROM bench WHERE len(bw) >= 8
  )
),
dgrams AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 6),
    i -> array_to_string(ws[i:i+7], ' '))) AS gram
  FROM w WHERE len(ws) >= 8
),
hits AS (
  SELECT d.doc_id, count(*) AS n_hits
  FROM dgrams d JOIN bgrams b USING (gram)
  GROUP BY d.doc_id
)
SELECT w.doc_id, cast(coalesce(h.n_hits, 0) AS INT) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM w LEFT JOIN hits h ON w.doc_id = h.doc_id
""",
        "index_manifest_stats": f"""
WITH {_TOKENS_CTE}
SELECT
  cast((SELECT count(DISTINCT doc_id) FROM tokens) AS BIGINT) AS docs_tokenized,
  cast((SELECT count(*) FROM (SELECT DISTINCT doc_id, term FROM tokens))
       AS BIGINT) AS postings_total,
  cast((SELECT count(DISTINCT doc_id) FROM tokens) AS BIGINT)
       AS docs_by_shard_total
""",
        "dup_clusters": f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents
  UNION ALL SELECT doc_id + 200000 AS doc_id, text FROM documents
),
tl AS (SELECT doc_id, {duckdb_tokens_sql()} AS toks FROM all_docs),
sh AS (
  SELECT doc_id,
         list_sort(list_distinct(
           [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
            for i in range(1, greatest(len(toks) - 1, 1))]
         ))::VARCHAR AS sset
  FROM tl
),
keyed AS (
  SELECT doc_id,
         CASE WHEN sset = '[]' THEN 'empty:' || doc_id ELSE sset END AS k
  FROM sh
)
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY k) AS cluster_id,
       doc_id = min(doc_id) OVER (PARTITION BY k) AS is_keeper
FROM keyed ORDER BY doc_id
""",
        "dup_spans": f"""
WITH both_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
),
tl AS (SELECT doc_id, {duckdb_tokens_sql()} AS toks FROM both_docs),
wins AS (
  SELECT doc_id, g.pos AS pos,
         array_to_string(list_slice(toks, g.pos + 1, g.pos + 8), ' ') AS win
  FROM tl, LATERAL (
    SELECT unnest(range(0, greatest(len(toks) - 7, 0))) AS pos
  ) g
),
occ AS (
  SELECT win, count(*) AS n_occ, min(doc_id * 1000000 + pos) AS keep_key
  FROM wins GROUP BY win HAVING count(*) >= 2
)
SELECT w.doc_id, CAST(w.pos AS BIGINT) AS pos, o.n_occ,
       (w.doc_id * 1000000 + w.pos) = o.keep_key AS is_keeper
FROM wins w JOIN occ o USING (win)
""",
        "scrub_spans": f"""
WITH both_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
),
tl AS (SELECT doc_id, {duckdb_tokens_sql()} AS toks FROM both_docs),
wins AS (
  SELECT doc_id, g.pos AS pos,
         array_to_string(list_slice(toks, g.pos + 1, g.pos + 8), ' ') AS win
  FROM tl, LATERAL (
    SELECT unnest(range(0, greatest(len(toks) - 7, 0))) AS pos
  ) g
),
occ AS (
  SELECT win, count(*) AS n_occ, min(doc_id * 1000000 + pos) AS keep_key
  FROM wins GROUP BY win HAVING count(*) >= 2
),
marked AS (
  SELECT w.doc_id, w.pos FROM wins w JOIN occ o USING (win)
  WHERE (w.doc_id * 1000000 + w.pos) <> o.keep_key
),
tokpos AS (
  SELECT doc_id, t.pos - 1 AS pos, t.tok
  FROM tl, LATERAL (
    SELECT unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  ) t
),
covered AS (
  SELECT DISTINCT tp.doc_id, tp.pos
  FROM tokpos tp JOIN marked m
    ON tp.doc_id = m.doc_id AND tp.pos BETWEEN m.pos AND m.pos + 7
),
kept AS (
  SELECT tp.doc_id, tp.pos, tp.tok
  FROM tokpos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM covered c WHERE c.doc_id = tp.doc_id AND c.pos = tp.pos
  )
)
SELECT d.doc_id,
       coalesce(
         (SELECT string_agg(k.tok, ' ' ORDER BY k.pos)
          FROM kept k WHERE k.doc_id = d.doc_id), '') AS scrubbed,
       coalesce(
         (SELECT count(*) FROM covered c WHERE c.doc_id = d.doc_id), 0
       ) AS n_removed
FROM (SELECT doc_id FROM tl) d
""",
        "components_chain": """
WITH RECURSIVE base AS (
  SELECT doc_id AS a, doc_id + 1 AS b FROM documents WHERE doc_id % 10 <> 9
  UNION ALL
  SELECT doc_id AS a, doc_id // 2 AS b FROM documents WHERE doc_id % 40 = 0
),
e0 AS (SELECT a, b FROM base WHERE a <> b),
edges AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
nodes AS (SELECT DISTINCT a AS n FROM edges),
walk(n, r) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.b, w.r FROM walk w JOIN edges e ON e.a = w.n
)
SELECT n AS node, min(r) AS component FROM walk GROUP BY n ORDER BY node
""",
        "lm_perplexity": f"""
WITH tl AS (SELECT doc_id, {duckdb_tokens_sql()} AS toks FROM documents),
b AS (
  SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1]
                         for i in range(1, greatest(len(toks), 1))]) AS g
  FROM tl
),
dtf AS (SELECT doc_id, g, count(*) AS tf FROM b GROUP BY doc_id, g),
c2 AS (SELECT g, sum(tf) AS c2 FROM dtf GROUP BY g),
c1 AS (SELECT split_part(g, ' ', 1) AS w1, sum(tf) AS c1 FROM dtf GROUP BY 1),
vv AS (SELECT count(DISTINCT t) AS v
       FROM (SELECT unnest(toks) AS t FROM tl)),
scored AS (
  SELECT dtf.doc_id, sum(dtf.tf) AS nb,
         sum(dtf.tf * ln((c2.c2 + 0.5)
                         / (c1.c1 + 0.5 * (SELECT v FROM vv))))
           / sum(dtf.tf) AS raw
  FROM dtf
  JOIN c2 USING (g)
  JOIN c1 ON split_part(dtf.g, ' ', 1) = c1.w1
  GROUP BY dtf.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.nb, 0) AS BIGINT) AS n_bigrams,
       round(s.raw, 6) AS avg_logp,
       round(exp(-s.raw), 6) AS perplexity
FROM documents d LEFT JOIN scored s USING (doc_id)
ORDER BY d.doc_id
""",
        "ppl_buckets": f"""
WITH tl AS (SELECT doc_id, {duckdb_tokens_sql()} AS toks FROM documents),
b AS (
  SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1]
                         for i in range(1, greatest(len(toks), 1))]) AS g
  FROM tl
),
dtf AS (SELECT doc_id, g, count(*) AS tf FROM b GROUP BY doc_id, g),
c2 AS (SELECT g, sum(tf) AS c2 FROM dtf GROUP BY g),
c1 AS (SELECT split_part(g, ' ', 1) AS w1, sum(tf) AS c1 FROM dtf GROUP BY 1),
vv AS (SELECT count(DISTINCT t) AS v
       FROM (SELECT unnest(toks) AS t FROM tl)),
scored AS (
  SELECT dtf.doc_id,
         sum(dtf.tf * ln((c2.c2 + 0.5)
                         / (c1.c1 + 0.5 * (SELECT v FROM vv))))
           / sum(dtf.tf) AS raw
  FROM dtf
  JOIN c2 USING (g)
  JOIN c1 ON split_part(dtf.g, ' ', 1) = c1.w1
  GROUP BY dtf.doc_id
),
ranked AS (
  SELECT doc_id, round(exp(-raw), 6) AS perplexity,
         row_number() OVER (ORDER BY round(exp(-raw), 6), doc_id) - 1
           AS ppl_rank,
         count(*) OVER () AS n
  FROM scored
)
SELECT doc_id, perplexity, ppl_rank,
       CASE WHEN ppl_rank * 3 < n THEN 'head'
            WHEN ppl_rank * 3 < 2 * n THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ranked
""",
        "lm_contrast": f"""
WITH tl AS (SELECT doc_id, {duckdb_tokens_sql()} AS toks FROM documents),
b AS (
  SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1]
                         for i in range(1, greatest(len(toks), 1))]) AS g
  FROM tl
),
dtf AS (SELECT doc_id, g, count(*) AS tf FROM b GROUP BY doc_id, g),
c2c AS (SELECT g, sum(tf) AS c2c FROM dtf GROUP BY g),
c1c AS (SELECT split_part(g, ' ', 1) AS w1, sum(c2c) AS c1c
        FROM c2c GROUP BY 1),
vc AS (SELECT count(DISTINCT t) AS v
       FROM (SELECT unnest(toks) AS t FROM tl)),
tb AS (
  SELECT unnest([toks[i] || ' ' || toks[i+1]
                 for i in range(1, greatest(len(toks), 1))]) AS g
  FROM tl WHERE doc_id % 5 = 0
),
c2t AS (SELECT g, count(*) AS c2t FROM tb GROUP BY g),
c1t AS (SELECT split_part(g, ' ', 1) AS w1, sum(c2t) AS c1t
        FROM c2t GROUP BY 1),
vt AS (SELECT count(DISTINCT t) AS v
       FROM (SELECT unnest(toks) AS t FROM tl WHERE doc_id % 5 = 0)),
scored AS (
  SELECT dtf.doc_id, sum(dtf.tf) AS nb,
         sum(dtf.tf * (
           ln((coalesce(c2t.c2t, 0) + 0.5)
              / (coalesce(c1t.c1t, 0) + 0.5 * (SELECT v FROM vt)))
           - ln((c2c.c2c + 0.5)
                / (c1c.c1c + 0.5 * (SELECT v FROM vc)))
         )) / sum(dtf.tf) AS raw
  FROM dtf
  LEFT JOIN c2t USING (g)
  LEFT JOIN c1t ON split_part(dtf.g, ' ', 1) = c1t.w1
  JOIN c2c USING (g)
  JOIN c1c ON split_part(dtf.g, ' ', 1) = c1c.w1
  GROUP BY dtf.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.nb, 0) AS BIGINT) AS n_bigrams,
       round(s.raw, 6) AS contrast
FROM documents d LEFT JOIN scored s USING (doc_id)
ORDER BY d.doc_id
""",
        "domain_quota": rf"""
WITH feat AS (
  SELECT doc_id,
         source || '.example.com' AS host,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_words,
         len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
           / greatest(len(text), 1) AS alpha_ratio,
         len(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
           / greatest(len(text), 1) AS digit_ratio,
         len(regexp_extract_all(text, '{_STOP_PAT}', 1)) AS n_stop,
         len(list_distinct(regexp_split_to_array(trim(text), '\s+')))
           AS n_uniq
  FROM documents
),
q AS (
  SELECT doc_id, host,
         round(
           0.25 * least(n_words / 100.0, 1.0)
         + 0.25 * alpha_ratio
         + 0.20 * least(n_stop * 1.0 / greatest(n_words, 1) * 4, 1.0)
         + 0.20 * (n_uniq * 1.0 / greatest(n_words, 1))
         + 0.10 * (1.0 - least(digit_ratio * 5, 1.0)), 6) AS quality
  FROM feat
),
r AS (
  SELECT doc_id, host, quality,
         row_number() OVER (
           PARTITION BY host ORDER BY quality DESC, doc_id ASC) AS rank
  FROM q
)
SELECT doc_id, host, quality, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 10 ORDER BY host, rank
""",
        # phrase_indexed_top10 proves the sidecar-index path against
        # the SAME oracle (the bm25_top10 / bm25_wand_top10 pattern)
        "phrase_pos_top10": _PHRASE_ORACLE,
        "phrase_indexed_top10": _PHRASE_ORACLE,
        "bool_and_top10": f"""
WITH {_STATS_CTES},
q(term) AS (VALUES ('table'), ('spark'), ('query')),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
             * (tf.tf * ({BM25_K1} + 1.0))
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
         ) AS score
  FROM tf
  JOIN vocab USING (term) JOIN doc_stats USING (doc_id)
  CROSS JOIN globals
  GROUP BY tf.doc_id
  HAVING count(*) = 3
)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10
""",
        "prox_min_span": f"""
WITH {_PTOKENS_CTE},
h1 AS (SELECT doc_id, pos FROM tokens_pos WHERE term = 'spark'),
h2 AS (SELECT doc_id, pos FROM tokens_pos WHERE term = 'merge'),
h3 AS (SELECT doc_id, pos FROM tokens_pos WHERE term = 'window')
SELECT h1.doc_id AS doc_id,
       cast(min(greatest(h1.pos, h2.pos, h3.pos)
                - least(h1.pos, h2.pos, h3.pos)) AS int) AS span
FROM h1 JOIN h2 ON h1.doc_id = h2.doc_id
JOIN h3 ON h1.doc_id = h3.doc_id
GROUP BY h1.doc_id
""",
        "snippet_best": f"""
WITH {_PTOKENS_CTE},
hits AS (SELECT doc_id, pos FROM tokens_pos WHERE term IN ('spark', 'query')),
counted AS (
  SELECT s.doc_id, s.pos AS start, count(*) AS hits
  FROM hits s JOIN hits h
    ON h.doc_id = s.doc_id AND h.pos >= s.pos AND h.pos < s.pos + 8
  GROUP BY s.doc_id, s.pos
),
best AS (
  SELECT doc_id, start, hits FROM (
    SELECT doc_id, start, hits,
           row_number() OVER (
             PARTITION BY doc_id ORDER BY hits DESC, start ASC) AS rn
    FROM counted
  ) WHERE rn = 1
)
SELECT t.doc_id, cast(b.start AS int) AS start, b.hits,
       string_agg(t.term, ' ' ORDER BY t.pos) AS snippet
FROM tokens_pos t JOIN best b
  ON t.doc_id = b.doc_id AND t.pos >= b.start AND t.pos < b.start + 8
GROUP BY t.doc_id, b.start, b.hits
""",
        "query_lang_top10": f"""
WITH {_PTOKENS_CTE},
doc_stats AS (SELECT doc_id, count(*) AS dl FROM tokens_pos GROUP BY doc_id),
globals AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doc_stats),
occ AS (
  SELECT a.doc_id, a.pos AS start
  FROM tokens_pos a JOIN tokens_pos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'fast' AND b.term = 'table'
),
tfp AS (SELECT doc_id, count(*) AS tf FROM occ GROUP BY doc_id),
dfp AS (SELECT count(*) AS df FROM tfp),
phrase_contrib AS (
  SELECT t.doc_id,
         ln(1.0 + (g.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * ({BM25_K1} + 1.0))
           / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * s.dl / g.avgdl))
           AS contrib
  FROM tfp t JOIN doc_stats s USING (doc_id)
  CROSS JOIN globals g CROSS JOIN dfp d
),
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens_pos GROUP BY term
),
q(term, sign) AS (VALUES ('spark', 1.0), ('slow', -1.0)),
tft AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens_pos
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
term_contrib AS (
  SELECT tft.doc_id,
         q.sign * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
           * (tft.tf * ({BM25_K1} + 1.0))
           / (tft.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
           AS contrib
  FROM tft JOIN q USING (term) JOIN vocab USING (term)
  JOIN doc_stats USING (doc_id) CROSS JOIN globals
),
allc AS (
  SELECT * FROM phrase_contrib UNION ALL SELECT * FROM term_contrib
),
scored AS (SELECT doc_id, sum(contrib) AS score FROM allc GROUP BY doc_id)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10
""",
        # '"fast table"^2 spark^0.5 -slow^1.5 s*^0.25': the ^boost
        # weights multiply each atom's sign; the s* prefix atom is one
        # 0.25-weighted BM25 contribution per vocabulary term starting
        # with 's' (the executor's Lucene PrefixQuery expansion,
        # replayed here as a LIKE over the distinct-token vocabulary —
        # engine min_count default is 0 so no cf filter applies).
        "query_lang_boosted": f"""
WITH {_PTOKENS_CTE},
doc_stats AS (SELECT doc_id, count(*) AS dl FROM tokens_pos GROUP BY doc_id),
globals AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doc_stats),
occ AS (
  SELECT a.doc_id, a.pos AS start
  FROM tokens_pos a JOIN tokens_pos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'fast' AND b.term = 'table'
),
tfp AS (SELECT doc_id, count(*) AS tf FROM occ GROUP BY doc_id),
dfp AS (SELECT count(*) AS df FROM tfp),
phrase_contrib AS (
  SELECT t.doc_id,
         2.0 * ln(1.0 + (g.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * ({BM25_K1} + 1.0))
           / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * s.dl / g.avgdl))
           AS contrib
  FROM tfp t JOIN doc_stats s USING (doc_id)
  CROSS JOIN globals g CROSS JOIN dfp d
),
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens_pos GROUP BY term
),
q(term, sign) AS (
  SELECT * FROM (VALUES ('spark', 0.5), ('slow', -1.5)) v(term, sign)
  UNION ALL
  SELECT term, 0.25 FROM vocab WHERE term LIKE 's%'
),
tft AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens_pos
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
term_contrib AS (
  SELECT tft.doc_id,
         q.sign * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
           * (tft.tf * ({BM25_K1} + 1.0))
           / (tft.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
           AS contrib
  FROM tft JOIN q USING (term) JOIN vocab USING (term)
  JOIN doc_stats USING (doc_id) CROSS JOIN globals
),
allc AS (
  SELECT * FROM phrase_contrib UNION ALL SELECT * FROM term_contrib
),
scored AS (SELECT doc_id, sum(contrib) AS score FROM allc GROUP BY doc_id)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10
""",
        # '+"fast table" +spark -slow': Lucene must clauses — identical
        # scoring to the free query, gated to docs that contain BOTH
        # the phrase (>=1 exact occurrence) and the required term.
        "query_lang_must": f"""
WITH {_PTOKENS_CTE},
doc_stats AS (SELECT doc_id, count(*) AS dl FROM tokens_pos GROUP BY doc_id),
globals AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doc_stats),
occ AS (
  SELECT a.doc_id, a.pos AS start
  FROM tokens_pos a JOIN tokens_pos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'fast' AND b.term = 'table'
),
tfp AS (SELECT doc_id, count(*) AS tf FROM occ GROUP BY doc_id),
dfp AS (SELECT count(*) AS df FROM tfp),
phrase_contrib AS (
  SELECT t.doc_id,
         ln(1.0 + (g.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * ({BM25_K1} + 1.0))
           / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * s.dl / g.avgdl))
           AS contrib
  FROM tfp t JOIN doc_stats s USING (doc_id)
  CROSS JOIN globals g CROSS JOIN dfp d
),
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens_pos GROUP BY term
),
q(term, sign) AS (VALUES ('spark', 1.0), ('slow', -1.0)),
tft AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens_pos
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
term_contrib AS (
  SELECT tft.doc_id,
         q.sign * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
           * (tft.tf * ({BM25_K1} + 1.0))
           / (tft.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
           AS contrib
  FROM tft JOIN q USING (term) JOIN vocab USING (term)
  JOIN doc_stats USING (doc_id) CROSS JOIN globals
),
allc AS (
  SELECT * FROM phrase_contrib UNION ALL SELECT * FROM term_contrib
),
scored AS (
  SELECT doc_id, sum(contrib) AS score FROM allc GROUP BY doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
WHERE doc_id IN (SELECT doc_id FROM tfp)
  AND doc_id IN (SELECT doc_id FROM tft WHERE term = 'spark')
ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10
""",
        # '+(spark "fast table")^2 sort -slow': the group lowers at
        # parse time — ^2 distributes into spark and the phrase, '+'
        # on the group gates DISJUNCTIVELY (spark OR the phrase). The
        # replay is the same weighted union as query_lang_must with
        # the boosted weights, gated by a UNION of the member match
        # sets instead of an intersection.
        "query_lang_group": f"""
WITH {_PTOKENS_CTE},
doc_stats AS (SELECT doc_id, count(*) AS dl FROM tokens_pos GROUP BY doc_id),
globals AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doc_stats),
occ AS (
  SELECT a.doc_id, a.pos AS start
  FROM tokens_pos a JOIN tokens_pos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'fast' AND b.term = 'table'
),
tfp AS (SELECT doc_id, count(*) AS tf FROM occ GROUP BY doc_id),
dfp AS (SELECT count(*) AS df FROM tfp),
phrase_contrib AS (
  SELECT t.doc_id,
         2.0 * ln(1.0 + (g.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * ({BM25_K1} + 1.0))
           / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * s.dl / g.avgdl))
           AS contrib
  FROM tfp t JOIN doc_stats s USING (doc_id)
  CROSS JOIN globals g CROSS JOIN dfp d
),
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens_pos GROUP BY term
),
q(term, sign) AS (VALUES ('spark', 2.0), ('sort', 1.0), ('slow', -1.0)),
tft AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens_pos
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
term_contrib AS (
  SELECT tft.doc_id,
         q.sign * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
           * (tft.tf * ({BM25_K1} + 1.0))
           / (tft.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
           AS contrib
  FROM tft JOIN q USING (term) JOIN vocab USING (term)
  JOIN doc_stats USING (doc_id) CROSS JOIN globals
),
allc AS (
  SELECT * FROM phrase_contrib UNION ALL SELECT * FROM term_contrib
),
scored AS (
  SELECT doc_id, sum(contrib) AS score FROM allc GROUP BY doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
WHERE doc_id IN (
  SELECT doc_id FROM tft WHERE term = 'spark'
  UNION SELECT doc_id FROM tfp
)
ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10
""",
        # cursor pagination: ranks 11-20 of 'spark fast -slow' by the
        # RAW float64 score (the engine's ranking key; rounding only
        # in the projection) — the search_after contract replayed as
        # one row_number window.
        "query_lang_page2": f"""
WITH {_STATS_CTES},
q(term, sign) AS (VALUES ('spark', 1.0), ('fast', 1.0), ('slow', -1.0)),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
scored AS (
  SELECT tf.doc_id,
         sum(q.sign
             * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
             * (tf.tf * ({BM25_K1} + 1.0))
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
         ) AS score
  FROM tf
  JOIN q USING (term) JOIN vocab USING (term) JOIN doc_stats USING (doc_id)
  CROSS JOIN globals
  GROUP BY tf.doc_id
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
)
SELECT doc_id, round(score, 4) AS score
FROM ranked WHERE rn > 10 AND rn <= 20
ORDER BY score DESC, doc_id ASC
""",
        # filter-only (ES bool-filter context): match_all gated by the
        # metadata filters at constant score 0.0 — a plain WHERE over
        # the documents table, no token CTE at all.
        "query_lang_filter_only": """
SELECT doc_id, CAST(0.0 AS DOUBLE) AS score
FROM documents
WHERE lang IN ('en', 'fr') AND n_chars BETWEEN 200 AND 900
ORDER BY doc_id ASC LIMIT 50
""",
        # explain: atom-tagged contribution union for
        # '+spark "fast table" s* -slow', ranked (must-gated) to find
        # the engine's top doc, then per-atom (count, sum) for it.
        "query_explain": f"""
WITH {_PTOKENS_CTE},
doc_stats AS (SELECT doc_id, count(*) AS dl FROM tokens_pos GROUP BY doc_id),
globals AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doc_stats),
occ AS (
  SELECT a.doc_id, a.pos AS start
  FROM tokens_pos a JOIN tokens_pos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'fast' AND b.term = 'table'
),
tfp AS (SELECT doc_id, count(*) AS tf FROM occ GROUP BY doc_id),
dfp AS (SELECT count(*) AS df FROM tfp),
phrase_contrib AS (
  SELECT t.doc_id, 1 AS atom_id,
         ln(1.0 + (g.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * ({BM25_K1} + 1.0))
           / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * s.dl / g.avgdl))
           AS contrib
  FROM tfp t JOIN doc_stats s USING (doc_id)
  CROSS JOIN globals g CROSS JOIN dfp d
),
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens_pos GROUP BY term
),
q(term, atom_id, sign) AS (
  SELECT 'spark', 0, 1.0
  UNION ALL SELECT term, 2, 1.0 FROM vocab WHERE term LIKE 's%'
  UNION ALL SELECT 'slow', 3, -1.0
),
tft AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens_pos
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
term_contrib AS (
  SELECT tft.doc_id, q.atom_id,
         q.sign * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
           * (tft.tf * ({BM25_K1} + 1.0))
           / (tft.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
           AS contrib
  FROM tft JOIN q USING (term) JOIN vocab USING (term)
  JOIN doc_stats USING (doc_id) CROSS JOIN globals
),
allc AS (
  SELECT * FROM phrase_contrib UNION ALL SELECT * FROM term_contrib
),
scored AS (SELECT doc_id, sum(contrib) AS score FROM allc GROUP BY doc_id),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
  WHERE doc_id IN (SELECT doc_id FROM tft WHERE term = 'spark')
)
SELECT atom_id, count(*) AS n_terms, round(sum(contrib), 4) AS contrib
FROM allc
WHERE doc_id = (SELECT doc_id FROM ranked WHERE rn = 1)
GROUP BY atom_id ORDER BY atom_id
""",
        # sort-by-field: the scored 'spark fast -slow' union ordered
        # by joined metadata instead of relevance.
        "search_sorted": f"""
WITH {_STATS_CTES},
q(term, sign) AS (VALUES ('spark', 1.0), ('fast', 1.0), ('slow', -1.0)),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
scored AS (
  SELECT tf.doc_id,
         sum(q.sign
             * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
             * (tf.tf * ({BM25_K1} + 1.0))
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
         ) AS score
  FROM tf
  JOIN q USING (term) JOIN vocab USING (term) JOIN doc_stats USING (doc_id)
  CROSS JOIN globals
  GROUP BY tf.doc_id
)
SELECT s.doc_id, d.n_chars, round(s.score, 4) AS score
FROM scored s JOIN documents d USING (doc_id)
ORDER BY d.n_chars DESC, s.doc_id ASC LIMIT 10
""",
        # histogram agg: floor(n_chars/100)*100 buckets of the same
        # match set.
        "histogram_n_chars": f"""
WITH {_STATS_CTES},
q(term, sign) AS (VALUES ('spark', 1.0), ('fast', 1.0), ('slow', -1.0)),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
matched AS (SELECT DISTINCT doc_id FROM tf)
SELECT CAST(floor(d.n_chars / 100.0) * 100 AS BIGINT) AS bucket,
       count(*) AS doc_count
FROM matched m JOIN documents d USING (doc_id)
WHERE d.n_chars IS NOT NULL
GROUP BY bucket ORDER BY bucket ASC
""",
        # suggest: most frequent vocabulary terms under a prefix.
        "suggest_top10": f"""
WITH {_TOKENS_CTE},
vocab AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokens GROUP BY term)
SELECT term, df FROM vocab WHERE term LIKE 's%'
ORDER BY df DESC, term ASC LIMIT 10
""",
        # minimum_should_match=2 over 'spark fast table -slow'.
        "query_lang_msm": f"""
WITH {_STATS_CTES},
q(term, sign) AS (VALUES ('spark', 1.0), ('fast', 1.0), ('table', 1.0), ('slow', -1.0)),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
scored AS (
  SELECT tf.doc_id,
         sum(q.sign
             * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
             * (tf.tf * ({BM25_K1} + 1.0))
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
         ) AS score
  FROM tf
  JOIN q USING (term) JOIN vocab USING (term) JOIN doc_stats USING (doc_id)
  CROSS JOIN globals
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
WHERE doc_id IN (
  SELECT doc_id FROM tf WHERE term IN ('spark', 'fast', 'table')
  GROUP BY doc_id HAVING count(DISTINCT term) >= 2
)
ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10
""",
        # wildcards: LIKE replay ('?' -> '_', '*' -> '%') of
        # 's?ark ta*le^2 -sl*w'.
        "query_lang_wild": f"""
WITH {_STATS_CTES},
q(term, sign) AS (
  SELECT term, 1.0 FROM vocab WHERE term LIKE 's_ark'
  UNION ALL
  SELECT term, 2.0 FROM vocab WHERE term LIKE 'ta%le'
  UNION ALL
  SELECT term, -1.0 FROM vocab WHERE term LIKE 'sl%w'
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
scored AS (
  SELECT tf.doc_id,
         sum(q.sign
             * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
             * (tf.tf * ({BM25_K1} + 1.0))
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
         ) AS score
  FROM tf
  JOIN q USING (term) JOIN vocab USING (term) JOIN doc_stats USING (doc_id)
  CROSS JOIN globals
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10
""",
        # ES stats agg over the 'spark fast -slow' match set.
        "stats_n_chars": f"""
WITH {_TOKENS_CTE},
matched AS (
  SELECT DISTINCT doc_id FROM tokens
  WHERE term IN ('spark', 'fast', 'slow')
)
SELECT count(*) AS doc_count,
       min(d.n_chars) AS min_v,
       max(d.n_chars) AS max_v,
       round(avg(d.n_chars), 6) AS avg_v,
       CAST(sum(d.n_chars) AS BIGINT) AS sum_v
FROM matched m JOIN documents d USING (doc_id)
WHERE d.n_chars IS NOT NULL
""",
        # ES terms agg + nested stats over the same match set.
        "facet_stats_lang": f"""
WITH {_TOKENS_CTE},
matched AS (
  SELECT DISTINCT doc_id FROM tokens
  WHERE term IN ('spark', 'fast', 'slow')
)
SELECT d.lang AS key,
       count(*) AS doc_count,
       min(d.n_chars) AS min_v,
       max(d.n_chars) AS max_v,
       round(avg(d.n_chars), 6) AS avg_v,
       CAST(sum(d.n_chars) AS BIGINT) AS sum_v
FROM matched m JOIN documents d USING (doc_id)
WHERE d.lang IS NOT NULL
GROUP BY d.lang
ORDER BY doc_count DESC, key ASC LIMIT 10
""",
        # ES collapse: best doc per lang, raw-score window replay.
        "collapse_by_lang": f"""
WITH {_STATS_CTES},
q(term, sign) AS (VALUES ('spark', 1.0), ('fast', 1.0), ('slow', -1.0)),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
scored AS (
  SELECT tf.doc_id,
         sum(q.sign
             * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
             * (tf.tf * ({BM25_K1} + 1.0))
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
         ) AS score
  FROM tf
  JOIN q USING (term) JOIN vocab USING (term) JOIN doc_stats USING (doc_id)
  CROSS JOIN globals
  GROUP BY tf.doc_id
),
ranked AS (
  SELECT s.doc_id, d.lang, s.score,
         row_number() OVER (
           PARTITION BY d.lang ORDER BY s.score DESC, s.doc_id ASC
         ) AS rn
  FROM scored s JOIN documents d USING (doc_id)
  WHERE d.lang IS NOT NULL
)
SELECT doc_id, lang, round(score, 4) AS score
FROM ranked WHERE rn = 1
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # ES range agg: conditional counts per requested bucket.
        "range_agg_n_chars": f"""
WITH {_TOKENS_CTE},
matched AS (
  SELECT DISTINCT doc_id FROM tokens
  WHERE term IN ('spark', 'fast', 'slow')
),
j AS (
  SELECT d.n_chars FROM matched m JOIN documents d USING (doc_id)
)
SELECT '*-200' AS bucket,
       count(*) FILTER (n_chars IS NOT NULL AND n_chars < 200) AS doc_count FROM j
UNION ALL
SELECT '200-500',
       count(*) FILTER (n_chars >= 200 AND n_chars < 500) FROM j
UNION ALL
SELECT '500-800',
       count(*) FILTER (n_chars >= 500 AND n_chars < 800) FROM j
UNION ALL
SELECT '800-*',
       count(*) FILTER (n_chars >= 800) FROM j
""",
        # ES significant_terms (JLH) over the same match set.
        "significant_terms": f"""
WITH {_TOKENS_CTE},
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens GROUP BY term
),
globals AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tokens),
matched AS (
  SELECT DISTINCT doc_id FROM tokens
  WHERE term IN ('spark', 'fast', 'slow')
),
nfg AS (SELECT count(*) AS n_fg FROM matched),
fg AS (
  SELECT t.term, count(DISTINCT t.doc_id) AS fg_count
  FROM tokens t JOIN matched m USING (doc_id)
  GROUP BY t.term
),
scoredt AS (
  SELECT f.term, f.fg_count, v.df AS bg_count,
         ((f.fg_count / CAST(n.n_fg AS DOUBLE))
            - (v.df / CAST(g.n_docs AS DOUBLE)))
         * ((f.fg_count / CAST(n.n_fg AS DOUBLE))
            / (v.df / CAST(g.n_docs AS DOUBLE))) AS score
  FROM fg f JOIN vocab v USING (term)
  CROSS JOIN nfg n CROSS JOIN globals g
)
SELECT term, fg_count, bg_count, round(score, 6) AS score
FROM scoredt WHERE score > 0.0
ORDER BY round(score, 6) DESC, term ASC LIMIT 15
""",
        # ES rescore (total mode): window cut on the raw first-pass
        # score, phrase second pass filtered to the window.
        "rescore_phrase": f"""
WITH {_PTOKENS_CTE},
doc_stats AS (SELECT doc_id, count(*) AS dl FROM tokens_pos GROUP BY doc_id),
globals AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doc_stats),
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens_pos GROUP BY term
),
q(term, sign) AS (VALUES ('spark', 1.0), ('fast', 1.0)),
tft AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens_pos
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
first_scored AS (
  SELECT tft.doc_id,
         sum(q.sign * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
             * (tft.tf * ({BM25_K1} + 1.0))
             / (tft.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
         ) AS first_score
  FROM tft JOIN q USING (term) JOIN vocab USING (term)
  JOIN doc_stats USING (doc_id) CROSS JOIN globals
  GROUP BY tft.doc_id
),
win AS (
  SELECT doc_id, first_score,
         row_number() OVER (ORDER BY first_score DESC, doc_id ASC) AS rn
  FROM first_scored
),
occ AS (
  SELECT a.doc_id, a.pos AS start
  FROM tokens_pos a JOIN tokens_pos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'fast' AND b.term = 'table'
),
tfp AS (SELECT doc_id, count(*) AS tf FROM occ GROUP BY doc_id),
dfp AS (SELECT count(*) AS df FROM tfp),
phrase_scored AS (
  SELECT t.doc_id,
         ln(1.0 + (g.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * ({BM25_K1} + 1.0))
           / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * s.dl / g.avgdl))
           AS rescore_score
  FROM tfp t JOIN doc_stats s USING (doc_id)
  CROSS JOIN globals g CROSS JOIN dfp d
)
SELECT w.doc_id,
       round(w.first_score + 2.0 * coalesce(p.rescore_score, 0.0), 4) AS score
FROM win w LEFT JOIN phrase_scored p USING (doc_id)
WHERE w.rn <= 50
ORDER BY round(w.first_score + 2.0 * coalesce(p.rescore_score, 0.0), 4) DESC,
         w.doc_id ASC
LIMIT 10
""",
        # 'sprt~2 quary~1^2 -slow': fuzzy atoms expand against the
        # vocabulary by classic Levenshtein distance — DuckDB's
        # levenshtein() is the same classic metric as Spark's, so the
        # expansion set (and therefore the weighted union) replays
        # exactly. Each expansion is one (term, sign x boost) row.
        "query_lang_fuzzy": f"""
WITH {_PTOKENS_CTE},
doc_stats AS (SELECT doc_id, count(*) AS dl FROM tokens_pos GROUP BY doc_id),
globals AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doc_stats),
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens_pos GROUP BY term
),
q(term, sign) AS (
  SELECT term, 1.0 FROM vocab WHERE levenshtein(term, 'sprt') <= 2
  UNION ALL
  SELECT term, 2.0 FROM vocab WHERE levenshtein(term, 'quary') <= 1
  UNION ALL
  SELECT 'slow', -1.0
),
tft AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens_pos
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
term_contrib AS (
  SELECT tft.doc_id,
         q.sign * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
           * (tft.tf * ({BM25_K1} + 1.0))
           / (tft.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
           AS contrib
  FROM tft JOIN q USING (term) JOIN vocab USING (term)
  JOIN doc_stats USING (doc_id) CROSS JOIN globals
),
scored AS (
  SELECT doc_id, sum(contrib) AS score FROM term_contrib GROUP BY doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10
""",
        # 'spark "fast table"^2 lang:en lang:fr -source:src3':
        # field filters gate but never score — the oracle computes the
        # UNFILTERED weighted union (identical to query_lang_boosted's
        # shape) then applies the metadata gate as one IN-subquery:
        # same-field values OR together, fields AND together,
        # -source: excludes.
        "query_lang_filtered": f"""
WITH {_PTOKENS_CTE},
doc_stats AS (SELECT doc_id, count(*) AS dl FROM tokens_pos GROUP BY doc_id),
globals AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doc_stats),
occ AS (
  SELECT a.doc_id, a.pos AS start
  FROM tokens_pos a JOIN tokens_pos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'fast' AND b.term = 'table'
),
tfp AS (SELECT doc_id, count(*) AS tf FROM occ GROUP BY doc_id),
dfp AS (SELECT count(*) AS df FROM tfp),
phrase_contrib AS (
  SELECT t.doc_id,
         2.0 * ln(1.0 + (g.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * ({BM25_K1} + 1.0))
           / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * s.dl / g.avgdl))
           AS contrib
  FROM tfp t JOIN doc_stats s USING (doc_id)
  CROSS JOIN globals g CROSS JOIN dfp d
),
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens_pos GROUP BY term
),
q(term, sign) AS (VALUES ('spark', 1.0)),
tft AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens_pos
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
term_contrib AS (
  SELECT tft.doc_id,
         q.sign * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
           * (tft.tf * ({BM25_K1} + 1.0))
           / (tft.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
           AS contrib
  FROM tft JOIN q USING (term) JOIN vocab USING (term)
  JOIN doc_stats USING (doc_id) CROSS JOIN globals
),
allc AS (
  SELECT * FROM phrase_contrib UNION ALL SELECT * FROM term_contrib
),
scored AS (
  SELECT doc_id, sum(contrib) AS score FROM allc GROUP BY doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
WHERE doc_id IN (
  SELECT doc_id FROM documents
  WHERE lang IN ('en', 'fr') AND source NOT IN ('src3')
)
ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10
""",
        # '"fast table"~2 spark': unordered span-near — a start
        # position qualifies iff the width-(2-1+2+1) window holds BOTH
        # terms; tf = qualifying starts, scored as one pseudo-term
        "query_lang_slop": f"""
WITH {_PTOKENS_CTE},
doc_stats AS (SELECT doc_id, count(*) AS dl FROM tokens_pos GROUP BY doc_id),
globals AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doc_stats),
hits AS (
  SELECT doc_id, pos, term FROM tokens_pos WHERE term IN ('fast', 'table')
),
qual AS (
  SELECT s.doc_id, s.pos AS start
  FROM hits s JOIN hits h
    ON h.doc_id = s.doc_id AND h.pos >= s.pos AND h.pos <= s.pos + 3
  GROUP BY s.doc_id, s.pos
  HAVING count(DISTINCT h.term) = 2
),
tfp AS (SELECT doc_id, count(*) AS tf FROM qual GROUP BY doc_id),
dfp AS (SELECT count(*) AS df FROM tfp),
phrase_contrib AS (
  SELECT t.doc_id,
         ln(1.0 + (g.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * ({BM25_K1} + 1.0))
           / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * s.dl / g.avgdl))
           AS contrib
  FROM tfp t JOIN doc_stats s USING (doc_id)
  CROSS JOIN globals g CROSS JOIN dfp d
),
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens_pos GROUP BY term
),
q(term, sign) AS (VALUES ('spark', 1.0)),
tft AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens_pos
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
term_contrib AS (
  SELECT tft.doc_id,
         q.sign * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
           * (tft.tf * ({BM25_K1} + 1.0))
           / (tft.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
           AS contrib
  FROM tft JOIN q USING (term) JOIN vocab USING (term)
  JOIN doc_stats USING (doc_id) CROSS JOIN globals
),
allc AS (
  SELECT * FROM phrase_contrib UNION ALL SELECT * FROM term_contrib
),
scored AS (SELECT doc_id, sum(contrib) AS score FROM allc GROUP BY doc_id)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10
""",
        # 'spark "fast table" n_chars:[200 TO 900] -source:{src1 TO src3]':
        # filters gate, never score — the unfiltered scoring union plus
        # ONE metadata IN-subquery with the same typed predicates
        "query_lang_range": f"""
WITH {_PTOKENS_CTE},
doc_stats AS (SELECT doc_id, count(*) AS dl FROM tokens_pos GROUP BY doc_id),
globals AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doc_stats),
occ AS (
  SELECT a.doc_id, a.pos AS start
  FROM tokens_pos a JOIN tokens_pos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'fast' AND b.term = 'table'
),
tfp AS (SELECT doc_id, count(*) AS tf FROM occ GROUP BY doc_id),
dfp AS (SELECT count(*) AS df FROM tfp),
phrase_contrib AS (
  SELECT t.doc_id,
         ln(1.0 + (g.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * ({BM25_K1} + 1.0))
           / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * s.dl / g.avgdl))
           AS contrib
  FROM tfp t JOIN doc_stats s USING (doc_id)
  CROSS JOIN globals g CROSS JOIN dfp d
),
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens_pos GROUP BY term
),
q(term, sign) AS (VALUES ('spark', 1.0)),
tft AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens_pos
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
term_contrib AS (
  SELECT tft.doc_id,
         q.sign * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
           * (tft.tf * ({BM25_K1} + 1.0))
           / (tft.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
           AS contrib
  FROM tft JOIN q USING (term) JOIN vocab USING (term)
  JOIN doc_stats USING (doc_id) CROSS JOIN globals
),
allc AS (
  SELECT * FROM phrase_contrib UNION ALL SELECT * FROM term_contrib
),
scored AS (SELECT doc_id, sum(contrib) AS score FROM allc GROUP BY doc_id)
SELECT doc_id, round(score, 4) AS score
FROM scored
WHERE doc_id IN (
  SELECT doc_id FROM documents
  WHERE n_chars >= 200 AND n_chars <= 900
    AND source IS NOT NULL
    AND NOT (source > 'src1' AND source <= 'src3')
)
ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10
""",
        # facets over the FULL match set of 'spark "fast table"':
        # every doc with a scoring contribution, bucketed by source
        "facet_counts_source": f"""
WITH {_PTOKENS_CTE},
occ AS (
  SELECT a.doc_id, a.pos AS start
  FROM tokens_pos a JOIN tokens_pos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'fast' AND b.term = 'table'
),
matched AS (
  SELECT doc_id FROM tokens_pos WHERE term = 'spark'
  UNION
  SELECT doc_id FROM occ
)
SELECT d.source AS key, count(*) AS doc_count
FROM matched m JOIN documents d USING (doc_id)
WHERE d.source IS NOT NULL
GROUP BY d.source
ORDER BY doc_count DESC, key ASC LIMIT 10
""",
        "more_like_this_top10": _bm25_oracle_sql(
            [], [], 10, exclude=(0,), q_mlt=(0, 25)
        ),
        # total hits of 'spark "fast table" -slow': every doc with ANY
        # scoring contribution (negative-only matches count, the
        # engine's keywords_neg ranking contract)
        "query_match_count": f"""
WITH {_PTOKENS_CTE},
occ AS (
  SELECT a.doc_id
  FROM tokens_pos a JOIN tokens_pos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'fast' AND b.term = 'table'
),
matched AS (
  SELECT doc_id FROM tokens_pos WHERE term IN ('spark', 'slow')
  UNION
  SELECT doc_id FROM occ
)
SELECT count(*) AS n_matches FROM matched
""",
        # 'fast AND spark OR window NOT slow' == '+fast +spark window
        # -slow': pure-term scoring union gated by the two must terms
        "query_lang_bool": f"""
WITH {_PTOKENS_CTE},
doc_stats AS (SELECT doc_id, count(*) AS dl FROM tokens_pos GROUP BY doc_id),
globals AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doc_stats),
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens_pos GROUP BY term
),
q(term, sign) AS (
  VALUES ('fast', 1.0), ('spark', 1.0), ('window', 1.0), ('slow', -1.0)
),
tft AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens_pos
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
),
term_contrib AS (
  SELECT tft.doc_id,
         q.sign * ln(1.0 + (globals.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
           * (tft.tf * ({BM25_K1} + 1.0))
           / (tft.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doc_stats.dl / globals.avgdl))
           AS contrib
  FROM tft JOIN q USING (term) JOIN vocab USING (term)
  JOIN doc_stats USING (doc_id) CROSS JOIN globals
),
scored AS (SELECT doc_id, sum(contrib) AS score FROM term_contrib GROUP BY doc_id)
SELECT doc_id, round(score, 4) AS score
FROM scored
WHERE doc_id IN (SELECT doc_id FROM tft WHERE term = 'fast')
  AND doc_id IN (SELECT doc_id FROM tft WHERE term = 'spark')
ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10
""",
    }
