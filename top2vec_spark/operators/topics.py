"""Topic capabilities (SURVEY.md §7.6 stretch) — lexical re-expression.

The reference's topic layer is UMAP+HDBSCAN over dense embeddings
(L5/L6, no faithful distributed equivalent — SURVEY.md flags any
substitute as semantics-changing, so this module is explicit about
its deltas):

- topic assignment comes from nearest-centroid over an embedding
  table (operators/similarity.assign_nearest = reference K5), with
  the `embeddings.label` column or IVF cells as the cluster source;
- topic WORDS are c-TF-IDF (class-based TF-IDF, public BERTopic-style
  formulation) over the documents of each topic — the lexical
  re-expression of the reference's topic_vector x word_vectors
  ranking (W3, top2vec.py:1188-1203);
- topic sizes / renumbering / membership / hierarchical reduction are
  exactly the reference's relational ops (A4, W5, P3+K3, L7).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def topic_sizes(doc_topic: DataFrame) -> DataFrame:
    """A4 (reference top2vec.py:1088-1094): docs per topic, desc."""
    return (
        doc_topic.groupBy("topic_id")
        .agg(F.count(F.lit(1)).alias("topic_size"))
        .orderBy(F.col("topic_size").desc(), F.col("topic_id").asc())
    )


def renumber_topics_by_size(doc_topic: DataFrame) -> DataFrame:
    """W5 (top2vec.py:1096-1112): relabel topics 0..k-1 by size desc
    (tie-break old topic_id asc), remap assignments."""
    sizes = topic_sizes(doc_topic)
    w = W.orderBy(F.col("topic_size").desc(), F.col("topic_id").asc())
    mapping = sizes.withColumn(
        "new_topic_id", (F.row_number().over(w) - 1).cast("long")
    ).select("topic_id", "new_topic_id")
    return (
        doc_topic.join(F.broadcast(mapping), "topic_id")
        .drop("topic_id")
        .withColumnRenamed("new_topic_id", "topic_id")
    )


def ctfidf_scores(
    tf: DataFrame, doc_topic: DataFrame, round_digits: int | None = None
) -> DataFrame:
    """Full (topic_id, term, ctfidf) relation — the scoring core
    behind both per-topic top-N words (W3) and keyword->topic search.

    c-TF-IDF(t, c) = tf(t, c)/len(c) * ln(1 + avg_len / cf(t))
    (class-based TF-IDF over topic-concatenated documents — public
    BERTopic formulation). Input tf: (doc_id, term, tf),
    doc_topic: (doc_id, topic_id)."""
    ttf = (
        tf.join(doc_topic, "doc_id")
        .groupBy("topic_id", "term")
        .agg(F.sum("tf").alias("ctf"))
    )
    clen = ttf.groupBy("topic_id").agg(F.sum("ctf").alias("clen"))
    avg_len = clen.agg(F.avg("clen")).collect()[0][0]
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    scored = (
        ttf.join(clen, "topic_id")
        .join(cf, "term")
        .withColumn(
            "ctfidf",
            (F.col("ctf") / F.col("clen"))
            * F.log(F.lit(1.0) + F.lit(float(avg_len)) / F.col("cf")),
        )
    )
    if round_digits is not None:
        # oracle-compare mode: rank on the rounded value so 1-ulp
        # libm-vs-JVM log noise can't flip rank boundaries
        scored = scored.withColumn("ctfidf", F.round("ctfidf", round_digits))
    return scored.select("topic_id", "term", "ctfidf")


def topic_words_ctfidf(
    tf: DataFrame, doc_topic: DataFrame, top_n: int = 50, round_digits: int | None = None
) -> DataFrame:
    """W3 re-expression: top-N words per topic by c-TF-IDF. Ranks via
    row_number window partitioned by topic, like the reference's
    per-topic top-50 (top2vec.py:1188-1203)."""
    scored = ctfidf_scores(tf, doc_topic, round_digits=round_digits)
    w = W.partitionBy("topic_id").orderBy(
        F.col("ctfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("topic_id", "rank", "term", "ctfidf")
    )


def search_topics_scores(
    ctfidf: DataFrame,
    keywords,
    keywords_neg=(),
    num_topics: int | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """Keyword -> topic search (reference search_topics,
    top2vec.py:3015-3079, re-expressed lexically): score(topic) =
    sum of c-TF-IDF of positive keywords minus negative keywords.
    Topics where no query term occurs score 0 and are excluded (the
    reference's cosine ranking likewise never surfaces unrelated
    topics first). Returns (topic_id, score) DESC, topic_id ASC."""
    pos = [k.lower() for k in keywords]
    neg = [k.lower() for k in keywords_neg]
    q = [(t, 1.0) for t in pos] + [(t, -1.0) for t in neg]
    qdf = ctfidf.sparkSession.createDataFrame(q, "term string, sign double")
    scored = (
        ctfidf.join(F.broadcast(qdf), "term")
        .groupBy("topic_id")
        .agg(F.sum(F.col("sign") * F.col("ctfidf")).alias("score"))
    )
    if round_digits is not None:
        scored = scored.select(
            "topic_id", F.round("score", round_digits).alias("score")
        )
    out = scored.orderBy(F.col("score").desc(), F.col("topic_id").asc())
    return out.limit(num_topics) if num_topics is not None else out


def reduced_topic_mapping(
    hierarchy: list[list[int]], sizes: dict[int, int]
) -> tuple[dict[int, int], list[list[int]]]:
    """Original-topic -> reduced-topic id mapping. Reduced topics are
    renumbered by merged size DESC (tie: smallest original member
    ASC), mirroring the reference's size ordering of reduced topics
    (top2vec.py:2365-2376). Returns (mapping, hierarchy reordered by
    the new ids)."""
    groups = [(sum(sizes[t] for t in grp), -min(grp), grp) for grp in hierarchy]
    groups.sort(key=lambda x: (-x[0], -x[1]))
    mapping: dict[int, int] = {}
    ordered = []
    for new_id, (_, _, grp) in enumerate(groups):
        ordered.append(sorted(grp))
        for orig in grp:
            mapping[orig] = new_id
    return mapping, ordered


def merge_duplicate_topics(
    centroids: dict[int, np.ndarray], threshold: float = 0.9
) -> dict[int, int]:
    """U3 (reference top2vec.py:1064-1086): merge topics whose
    (unit-normalized) centroids are near-duplicates — cosine >
    threshold — into the smallest-id member of their connected
    component (union-find over the similarity graph; the reference
    uses dbscan eps=1-threshold over the topic vectors, which on a
    thresholded similarity graph is exactly connected components).
    Driver-side: topic counts are tiny. Returns old_id -> merged_id."""
    ids = sorted(centroids)
    cents = {
        t: centroids[t] / (np.linalg.norm(centroids[t]) or 1.0) for t in ids
    }
    parent = {t: t for t in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if float(np.dot(cents[a], cents[b])) > threshold:
                ra, rb = find(a), find(b)
                if ra != rb:
                    lo, hi = min(ra, rb), max(ra, rb)
                    parent[hi] = lo
    return {t: find(t) for t in ids}


def search_documents_by_topic(
    doc_topic: DataFrame, topic_id: int, num_docs: int
) -> DataFrame:
    """P3+K3 (top2vec.py:2832-2847): docs of one topic by stored
    assignment score desc, doc_id asc."""
    return (
        doc_topic.filter(F.col("topic_id") == topic_id)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(num_docs)
    )


def hierarchical_topic_reduction(
    centroids: dict[int, np.ndarray],
    sizes: dict[int, int],
    num_topics: int,
) -> tuple[dict[int, np.ndarray], list[list[int]]]:
    """L7 (top2vec.py:2270-2418) driver loop: repeatedly merge the
    smallest topic into its most-similar other topic via
    size-weighted centroid mean (M4), tracking the hierarchy.

    Driver-side by design: topic counts are tiny (SURVEY.md K6). The
    distributed part — re-assigning docs to the reduced topics — is
    operators/similarity.assign_nearest over the returned centroids.
    """
    cents = {t: v / (np.linalg.norm(v) or 1.0) for t, v in centroids.items()}
    sz = dict(sizes)
    hierarchy = {t: [t] for t in cents}
    while len(cents) > num_topics:
        smallest = min(sz, key=lambda t: (sz[t], t))
        others = [t for t in cents if t != smallest]
        sims = {t: float(np.dot(cents[smallest], cents[t])) for t in others}
        target = max(others, key=lambda t: (sims[t], -t))
        v = (
            cents[target] * sz[target] + cents[smallest] * sz[smallest]
        ) / (sz[target] + sz[smallest])
        cents[target] = v / (np.linalg.norm(v) or 1.0)
        sz[target] += sz[smallest]
        hierarchy[target].extend(hierarchy[smallest])
        del cents[smallest], sz[smallest], hierarchy[smallest]
    return cents, [sorted(hierarchy[t]) for t in sorted(cents)]
