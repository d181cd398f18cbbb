"""Top2VecSpark — the user-facing façade (SURVEY.md §7.2 step 8).

Mirrors the reference API surface (Top2Vec class, reference
top2vec/top2vec.py:450) re-expressed over the inverted index:

- ``search_documents_by_keywords(keywords, num_docs, keywords_neg)``
  (reference top2vec.py:2855) -> multi-term BM25 top-k.
- ``query_documents(query, num_docs)`` (top2vec.py:2420) -> tokenize
  the free-text query with the reference tokenizer contract, then
  bag-of-words BM25 top-k.
- ``search_words_by_keywords`` / ``similar_words`` (top2vec.py:2947)
  -> top-k terms by BM25-weighted co-occurrence, with the reference's
  over-fetch + self-exclusion arithmetic (top2vec.py:3000-3011).

Reference quirks preserved deliberately (SURVEY.md Appendix A):
keyword lowercasing (T4), strict '>' min_count (P1), over-fetch then
exclude then re-limit (K4/P4/P5). Quirks NOT copied: unstable top-k
tie order (we fix score DESC, doc_id ASC).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top2vec_spark.config import BM25Config, DEFAULT_MIN_COUNT
from top2vec_spark.functions.tokenizer import reference_tokenize
from top2vec_spark.operators import bm25 as bm25_ops
from top2vec_spark.operators.corpus_stats import (
    CorpusGlobals,
    build_doc_stats,
    build_vocab,
    compute_globals,
)
from top2vec_spark.operators.tokens import tokenize_docs


class Top2VecSpark:
    """Inverted-index retrieval engine over a documents DataFrame.

    ``docs`` must carry (doc_id: long, text: string); extra columns
    (url, lang, ...) are kept for projection. ``keep_documents``
    mirrors the reference flag (top2vec.py:501-503): when False,
    search results never include text.
    """

    def __init__(
        self,
        spark: SparkSession,
        docs: DataFrame,
        min_count: int = DEFAULT_MIN_COUNT,
        cfg: BM25Config = BM25Config(),
        keep_documents: bool = True,
        ascii_fast_path: bool = False,
        index_path: str | None = None,
    ) -> None:
        self.spark = spark
        self.cfg = cfg
        self.keep_documents = keep_documents
        self.docs = docs
        self.min_count = min_count
        self.index_path = index_path
        self.tokens = tokenize_docs(docs, ascii_fast_path=ascii_fast_path)
        self.vocab = build_vocab(self.tokens, min_count=min_count)
        self.doc_stats = build_doc_stats(self.tokens)
        self._globals: CorpusGlobals | None = None
        self._index = None  # set by build_index() (postings/WAND path)

    @classmethod
    def from_pages(
        cls,
        spark: SparkSession,
        pages: DataFrame,
        lang_filter: str | None = None,
        **kwargs,
    ) -> "Top2VecSpark":
        """Construct from the north-rule input shape
        (url, warc_ts, html, text, lang): assigns deterministic dense
        doc_ids by url order and extracts text from html where the
        text column is null (the extract must round-trip
        byte-identically with the tokenizer contract — FIXTURES.md §1).
        """
        from top2vec_spark.operators.tokens import assign_doc_ids

        if lang_filter:
            pages = pages.filter(F.col("lang") == lang_filter)
        docs = assign_doc_ids(pages).withColumn(
            "text",
            F.coalesce(F.col("text"), F.decode(F.col("html"), "utf-8")),
        )
        return cls(spark, docs, **kwargs)

    # -- lazy cached globals ------------------------------------------------
    @property
    def globals(self) -> CorpusGlobals:
        if self._globals is None:
            # cache the small stats tables: reused by every query
            self.vocab = self.vocab.cache()
            self.doc_stats = self.doc_stats.cache()
            self._globals = compute_globals(self.doc_stats)
        return self._globals

    def build_index(self, path: str | None = None, resume: bool = True):
        """Build the compressed postings index (checkpoint-resumable).
        Returns the PostingsIndex; queries automatically use WAND once
        built."""
        from top2vec_spark.plans.build import IndexBuilder

        builder = IndexBuilder(
            self.spark, path or self.index_path, cfg=self.cfg
        )
        self._index = builder.build(
            self.tokens, min_count=self.min_count, resume=resume
        )
        if hasattr(self, "_vocab_map"):
            del self._vocab_map  # re-derive from the built index vocab
        return self._index

    # -- queries ------------------------------------------------------------
    _VOCAB_DRIVER_CAP = 2_000_000  # pin vocab on driver below this size

    @property
    def vocab_map(self) -> dict | None:
        """Driver-side term -> (term_id, df) dict for zero-job query
        planning (the reference's word_indexes dict, top2vec.py:673).
        None when the vocabulary exceeds the driver cap — queries then
        fall back to a filtered collect."""
        if not hasattr(self, "_vocab_map"):
            src = self._index.vocab if self._index is not None else self.vocab
            if src.count() <= self._VOCAB_DRIVER_CAP:
                self._vocab_map = {
                    r["term"]: (r["term_id"], r["df"]) for r in src.collect()
                }
            else:
                self._vocab_map = None
        return self._vocab_map

    def _topk(
        self,
        pos: Sequence[str],
        neg: Sequence[str],
        k: int,
        exclude_doc_ids: Sequence[int] = (),
        use_index: bool | None = None,
    ) -> DataFrame:
        lookup = self.vocab_map
        qterms = bm25_ops.resolve_query_terms(
            lookup if lookup is not None else self.vocab, pos, neg
        )
        use_wand = self._index is not None if use_index is None else use_index
        if use_wand:
            from top2vec_spark.operators.wand import wand_topk

            return wand_topk(
                self.spark,
                self._index,
                qterms,
                self.globals,
                k,
                cfg=self.cfg,
                exclude_doc_ids=exclude_doc_ids,
            )
        weights = self.spark.createDataFrame(qterms, bm25_ops.QTERM_SCHEMA)
        return bm25_ops.bm25_topk_bruteforce(
            self.tokens,
            self.doc_stats,
            self.globals,
            weights,
            k,
            cfg=self.cfg,
            exclude_doc_ids=exclude_doc_ids,
        )

    def search_documents_by_keywords(
        self,
        keywords: Sequence[str],
        num_docs: int,
        keywords_neg: Sequence[str] = (),
        return_documents: bool = True,
        use_index: bool | None = None,
    ) -> DataFrame:
        """Reference top2vec.py:2855-2945 re-expressed: positive terms
        add BM25, negative subtract. Returns
        (doc_id, score[, text...]) ordered score DESC, doc_id ASC."""
        self._validate_num(num_docs)
        result = self._topk(keywords, keywords_neg, num_docs, use_index=use_index)
        return self._project(result, return_documents)

    def query_documents(
        self, query: str, num_docs: int, return_documents: bool = True
    ) -> DataFrame:
        """Reference top2vec.py:2420-2495: tokenize the query with the
        T1 contract, then bag-of-words multi-term top-k. Out-of-vocab
        query tokens are dropped (the reference embeds them instead —
        documented re-expression, SURVEY.md §7.4)."""
        if not isinstance(query, str):
            raise ValueError("query must be a string")
        toks = reference_tokenize(query)
        known = {
            r["term"]
            for r in self.vocab.filter(F.col("term").isin(list(set(toks)))).collect()
        }
        terms = [t for t in toks if t in known]
        if not terms:
            raise ValueError("no query tokens found in vocabulary")
        self._validate_num(num_docs)
        result = self._topk(terms, (), num_docs)
        return self._project(result, return_documents)

    def search_documents_by_documents(
        self,
        doc_ids: Sequence[int],
        num_docs: int,
        doc_ids_neg: Sequence[int] = (),
        return_documents: bool = True,
    ) -> DataFrame:
        """Reference top2vec.py:3081-3180: similar documents. Query =
        the terms of the positive docs (bag-of-words), minus terms of
        negative docs; over-fetch num_docs + len(query docs), exclude
        the query docs themselves, re-limit (exact arithmetic of
        top2vec.py:3167-3177)."""
        all_ids = list(doc_ids) + list(doc_ids_neg)
        self._validate_doc_ids(all_ids)
        pos_terms = self._doc_terms(doc_ids)
        neg_terms = [t for t in self._doc_terms(doc_ids_neg) if t not in set(pos_terms)]
        k_overfetch = num_docs + len(all_ids)
        result = self._topk(
            pos_terms, neg_terms, k_overfetch, exclude_doc_ids=all_ids
        ).limit(num_docs)
        return self._project(result, return_documents)

    def search_words_by_keywords(
        self,
        keywords: Sequence[str],
        num_words: int,
        keywords_neg: Sequence[str] = (),
    ) -> DataFrame:
        """``similar_words`` (reference top2vec.py:2947-3013)
        re-expressed lexically: rank vocabulary terms by BM25-weighted
        co-occurrence with the query terms — for each candidate term
        u, score(u) = sum over top documents d of the query of
        bm25(d, u). Over-fetch num_words + len(query terms), drop the
        query terms, take num_words (top2vec.py:3000-3011)."""
        pos = [t.lower() for t in keywords]
        neg = [t.lower() for t in keywords_neg]
        k_terms = num_words + len(pos) + len(neg)
        # top documents for the query (fixed fan-out keeps this sublinear)
        top_docs = self._topk(pos, neg, max(50, k_terms))
        cooc = (
            self.tokens.join(
                F.broadcast(top_docs.select("doc_id", F.col("score").alias("dscore"))),
                "doc_id",
            )
            .groupBy("term")
            .agg(F.sum("dscore").alias("score"))
            .filter(~F.col("term").isin(pos + neg))
            .orderBy(F.col("score").desc(), F.col("term").asc())
            .limit(num_words)
        )
        return cooc

    similar_words = search_words_by_keywords

    def get_documents_by_ids(self, doc_ids: Sequence[int]) -> DataFrame:
        """J1 (reference doc_id2index probe + array index,
        top2vec.py:1251-1258): fetch documents by id."""
        self._validate_doc_ids(doc_ids)
        return self.docs.filter(F.col("doc_id").isin(list(doc_ids)))

    # -- topic layer (SURVEY.md §7.6; semantics-changing substitute for
    # UMAP+HDBSCAN is documented in operators/topics.py) -----------------
    def compute_topics(self, embeddings: DataFrame, n_topics: int | None = None):
        """Assign docs to topics via nearest-centroid over an
        embeddings table (vec_id == doc_id), centroids from the label
        column. Stores doc_topic + topic words (c-TF-IDF)."""
        from top2vec_spark.operators.similarity import (
            assign_nearest,
            label_centroids,
        )
        from top2vec_spark.operators import topics as T

        self._topic_embeddings = embeddings
        cents = label_centroids(embeddings)
        dt = assign_nearest(embeddings, cents).select(
            F.col("vec_id").alias("doc_id"),
            F.col("assigned_label").alias("topic_id"),
            "score",
        )
        self.doc_topic = T.renumber_topics_by_size(dt).cache()
        tf = (
            self.tokens.groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        self.topic_words = T.topic_words_ctfidf(tf, self.doc_topic).cache()
        return self.doc_topic

    def get_topic_sizes(self) -> DataFrame:
        from top2vec_spark.operators import topics as T

        self._require_topics()
        return T.topic_sizes(self.doc_topic)

    def get_topics(self, num_topics: int | None = None) -> DataFrame:
        self._require_topics()
        out = self.topic_words
        if num_topics is not None:
            out = out.filter(F.col("topic_id") < num_topics)
        return out

    def get_num_topics(self) -> int:
        self._require_topics()
        return self.doc_topic.select("topic_id").distinct().count()

    def search_documents_by_topic(
        self, topic_num: int, num_docs: int, return_documents: bool = True
    ) -> DataFrame:
        from top2vec_spark.operators import topics as T

        self._require_topics()
        res = T.search_documents_by_topic(self.doc_topic, topic_num, num_docs)
        return self._project(res.select("doc_id", "score"), return_documents)

    def hierarchical_topic_reduction(self, num_topics: int):
        """L7 (top2vec.py:2270-2418): driver loop over collected topic
        centroids + one distributed re-assignment."""
        import numpy as np

        from top2vec_spark.operators import topics as T
        from top2vec_spark.operators.similarity import label_centroids

        self._require_topics()
        if not hasattr(self, "_topic_embeddings"):
            raise ValueError("compute_topics(embeddings) must run first")
        emb = self._topic_embeddings
        cents_df = label_centroids(
            emb.join(
                self.doc_topic.select(
                    F.col("doc_id").alias("vec_id"), "topic_id"
                ),
                "vec_id",
            ).select("vec_id", "embedding", F.col("topic_id").alias("label"))
        )
        cents = {
            int(r["label"]): np.array(r["centroid"]) for r in cents_df.collect()
        }
        sizes = {
            int(r["topic_id"]): r["topic_size"]
            for r in self.get_topic_sizes().collect()
        }
        reduced, hierarchy = T.hierarchical_topic_reduction(
            cents, sizes, num_topics
        )
        return reduced, hierarchy

    def _require_topics(self) -> None:
        if not hasattr(self, "doc_topic"):
            raise ValueError(
                "no topics computed — call compute_topics(embeddings) first"
            )

    # -- mutation (U1/U2) ---------------------------------------------------
    def add_documents(self, new_docs: DataFrame) -> "Top2VecSpark":
        """Reference add_documents (top2vec.py:1960-2061): append +
        incremental stats rebuild. Returns a new engine over the
        union; id uniqueness enforced like top2vec.py:512-513.

        With a built index, the postings are appended INCREMENTALLY
        (only the new docs are tokenized/encoded — new doc-shards,
        no existing partition rewritten; plans/build.py
        ``append_documents``). New doc_ids are remapped to start at
        the next shard boundary."""
        if self._index is not None:
            lo = self._index.next_doc_id()
            old_min = new_docs.agg(F.min("doc_id")).collect()[0][0]
            shifted = new_docs.withColumn(
                "doc_id", (F.col("doc_id") - F.lit(old_min) + F.lit(lo)).cast("long")
            )
            merged = self.docs.unionByName(shifted, allowMissingColumns=True)
            out = Top2VecSpark(
                self.spark,
                merged,
                min_count=self.min_count,
                cfg=self.cfg,
                keep_documents=self.keep_documents,
            )
            out._index = self._index.append_documents(shifted, cfg=self.cfg)
            return out
        dup = (
            self.docs.select("doc_id")
            .join(new_docs.select("doc_id"), "doc_id", "inner")
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError("duplicate doc_ids in add_documents")
        merged = self.docs.unionByName(new_docs, allowMissingColumns=True)
        return Top2VecSpark(
            self.spark,
            merged,
            min_count=self.min_count,
            cfg=self.cfg,
            keep_documents=self.keep_documents,
        )

    def delete_documents(self, doc_ids: Sequence[int]) -> "Top2VecSpark":
        """Reference delete_documents (top2vec.py:2063-2122). With a
        built index: tombstone marking (= hnswlib mark_deleted,
        top2vec.py:2104-2110) — queries skip the docs immediately, no
        partition rewrites; stats compact on next full rebuild (the
        reference likewise does not retrain after deletes). The WAND
        path is authoritative post-delete; forcing use_index=False
        bypasses tombstones (like bypassing the reference's index).
        Without an index: engine over the filtered corpus."""
        self._validate_doc_ids(doc_ids)
        if self._index is not None:
            self._index.delete_documents(doc_ids)
            self.docs = self.docs.filter(~F.col("doc_id").isin(list(doc_ids)))
            return self
        remaining = self.docs.filter(~F.col("doc_id").isin(list(doc_ids)))
        return Top2VecSpark(
            self.spark,
            remaining,
            min_count=self.min_count,
            cfg=self.cfg,
            keep_documents=self.keep_documents,
        )

    # -- helpers ------------------------------------------------------------
    def _project(self, result: DataFrame, return_documents: bool) -> DataFrame:
        """Join back url/text like the reference returns
        (documents?, doc_scores, doc_ids) — url plays the role of
        document_ids (SURVEY.md §1.2)."""
        cols = ["doc_id"]
        if "url" in self.docs.columns:
            cols.append("url")
        if return_documents and self.keep_documents and "text" in self.docs.columns:
            cols.append("text")
        if len(cols) == 1:
            return result
        return result.join(self.docs.select(*cols), "doc_id").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )

    def _validate_num(self, k: int) -> None:
        if k < 1:
            raise ValueError("num_docs must be >= 1")

    def _validate_doc_ids(self, ids: Sequence[int]) -> None:
        found = self.docs.filter(F.col("doc_id").isin(list(ids))).count()
        if found != len(set(ids)):
            raise ValueError("doc_ids do not exist")

    def _doc_terms(self, ids: Sequence[int]) -> list[str]:
        if not ids:
            return []
        rows = (
            self.tokens.filter(F.col("doc_id").isin(list(ids)))
            .select("term")
            .distinct()
            .collect()
        )
        return sorted(r["term"] for r in rows)
