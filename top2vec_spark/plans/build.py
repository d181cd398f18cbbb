"""Checkpoint-resumable index build with per-partition lineage +
metrics manifest (north rule; SURVEY.md §7.2 step 6).

The index IS tables (no joblib blob like reference top2vec.py:939):

    {path}/tf/           doc_id, term, tf, dl — the ONE materialized
                         tokenization pass (fused tokenize+count,
                         operators/tokens.doc_term_counts); vocab,
                         doc_stats and postings all derive from it, so
                         the expensive text scan happens exactly once
    {path}/vocab/        term, term_id, df, cf
    {path}/doc_stats/    partitioned by shard -> doc_id, dl (the dl
                         sidecar WAND kernels side-read per shard)
    {path}/postings/     partitioned by bucket=pmod(term_id, n_buckets)
                         -> compressed block rows (operators/postings.py)
    {path}/manifest/     partition_id, docs_tokenized, postings_emitted,
                         bytes_compressed, checkpoint_path, lineage
    {path}/globals.json  n_docs, avgdl, docs_per_shard, n_buckets, k1, b
    {path}/_stages/      one marker JSON per completed stage

Resume semantics: each stage writes its table, THEN its marker (the
marker records a params fingerprint). ``build(resume=True)`` skips any
stage whose marker exists with a matching fingerprint — kill the job
after any stage and a restart reuses completed work, producing an
identical index (tests/test_build_resume.py). Task-level retries
within a stage are handled by Spark's job-commit protocol (parquet
output committer publishes atomically); the marker-after-data ordering
makes the stage boundary itself exactly-once.

Save/load ≡ table paths (replaces reference save/load,
top2vec.py:894-1012 — SURVEY.md S3/S4).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top2vec_spark.config import BM25Config, POSTING_BLOCK_SIZE
from top2vec_spark.operators.corpus_stats import CorpusGlobals, compute_globals
from top2vec_spark.operators.postings import (
    DEFAULT_DOCS_PER_SHARD,
    DEFAULT_N_BUCKETS,
    bucket_col,
    build_postings_from_packed,
    build_postings_from_tf,
)


@dataclass
class PostingsIndex:
    spark: SparkSession
    path: str
    globs: CorpusGlobals
    docs_per_shard: int
    n_buckets: int
    stats_fresh: bool = True  # False after appends shift N/avgdl/df
    _postings: DataFrame = None

    @property
    def postings(self) -> DataFrame:
        if self._postings is None:
            self._postings = self.spark.read.parquet(f"{self.path}/postings")
        return self._postings

    def cache(self) -> "PostingsIndex":
        """Pin the postings blocks in executor memory for warm query
        serving (a long-lived query cluster would do exactly this)."""
        self._postings = self.postings.cache()
        self._postings.count()
        return self

    @property
    def vocab(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/vocab")

    @property
    def doc_stats(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/doc_stats")

    @property
    def doc_stats_path(self) -> str:
        return f"{self.path}/doc_stats"

    @property
    def manifest(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/manifest")

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PostingsIndex":
        with open(f"{path}/globals.json") as f:
            g = json.load(f)
        return cls(
            spark=spark,
            path=path,
            globs=CorpusGlobals(n_docs=g["n_docs"], avgdl=g["avgdl"]),
            docs_per_shard=g["docs_per_shard"],
            n_buckets=g["n_buckets"],
            stats_fresh=g.get("stats_fresh", True),
        )

    # -- tombstone delete (U2, reference delete_documents
    # top2vec.py:2063-2122 / hnswlib mark_deleted) ---------------------------
    @property
    def tombstones(self) -> frozenset[int]:
        """doc_ids marked deleted. Mirrors the reference's ANN
        mark_deleted semantics: postings keep the entries, queries
        skip them; corpus stats keep pre-delete values until a
        rebuild compacts (documented, matches the reference which
        also does not retrain after deletes)."""
        if not hasattr(self, "_tombstones"):
            try:
                rows = self.spark.read.parquet(f"{self.path}/tombstones").collect()
                self._tombstones = frozenset(int(r["doc_id"]) for r in rows)
            except Exception:
                self._tombstones = frozenset()
        return self._tombstones

    def delete_documents(self, doc_ids) -> "PostingsIndex":
        """Mark doc_ids deleted (idempotent append to the tombstone
        table). O(len(doc_ids)) — no partition rewrites."""
        ids = sorted({int(x) for x in doc_ids})
        if not ids:
            return self
        self.spark.createDataFrame(
            [(i,) for i in ids], "doc_id long"
        ).write.mode("append").parquet(f"{self.path}/tombstones")
        if hasattr(self, "_tombstones"):
            del self._tombstones
        return self

    # -- incremental append (U1, reference add_documents
    # top2vec.py:1960-2061) ------------------------------------------------
    def next_doc_id(self) -> int:
        """First doc_id for appended documents: aligned UP to the next
        shard boundary, so appends create only NEW doc-shards and
        never rewrite an existing doc_stats/postings partition
        (doc_id is a surrogate — gaps are free)."""
        row = self.doc_stats.agg(F.max("doc_id").alias("m")).collect()[0]
        hi = int(row["m"]) + 1 if row["m"] is not None else 0
        dps = self.docs_per_shard
        return ((hi + dps - 1) // dps) * dps

    def append_documents(self, new_docs: DataFrame, cfg=None) -> "PostingsIndex":
        """Incremental index append: tokenize ONLY the new docs, write
        their tf/doc_stats/postings into new shard partitions, merge
        vocabulary counts (existing term_ids stay stable — new terms
        get ids after the old max, a documented deviation from the
        fresh-build df-ordering so bucket pruning keeps working), and
        refresh globals. Marks stats_fresh=False: WAND switches to
        stat-independent (block_max_tf, block_min_dl) pruning bounds;
        exact scores are always computed under CURRENT globals, so
        query results equal a full rebuild's (pytest-pinned).

        ``new_docs`` must carry doc_id >= next_doc_id() (use
        assign-then-offset) and a text column.
        """
        from top2vec_spark.config import BM25Config
        from top2vec_spark.operators.tokens import (
            doc_term_counts_packed,
            explode_packed_tf,
        )

        cfg = cfg or BM25Config()
        p = self.path
        spark = self.spark

        lo = self.next_doc_id()
        bad = new_docs.filter(F.col("doc_id") < lo).limit(1).count()
        if bad:
            raise ValueError(
                f"appended doc_ids must be >= {lo} (next shard boundary)"
            )

        packed_new = doc_term_counts_packed(new_docs)
        packed_new.write.mode("append").parquet(f"{p}/tf")

        # merge vocab counts; stable term_ids for existing terms
        old_vocab = self.vocab
        new_counts = (
            explode_packed_tf(spark.read.parquet(f"{p}/tf"))
            .groupBy("term")
            .agg(F.sum("tf").alias("cf"), F.count(F.lit(1)).alias("df"))
        )
        from pyspark.sql import Window as W

        max_id = old_vocab.agg(F.max("term_id")).collect()[0][0] or 0
        joined = new_counts.join(
            old_vocab.select("term", "term_id"), "term", "left"
        )
        w = W.orderBy(F.col("df").desc(), F.col("term").asc())
        merged = joined.withColumn(
            "term_id",
            F.coalesce(
                F.col("term_id"),
                (F.row_number().over(w) + F.lit(int(max_id))).cast("long"),
            ),
        ).select("term", "term_id", "df", "cf")
        merged.write.mode("overwrite").parquet(f"{p}/vocab_new")
        spark.read.parquet(f"{p}/vocab_new").write.mode("overwrite").parquet(
            f"{p}/vocab"
        )

        # new doc_stats shards (append: only new shard partitions)
        (
            packed_new.select("doc_id", "dl")
            .withColumn(
                "shard", (F.col("doc_id") / F.lit(self.docs_per_shard)).cast("int")
            )
            .repartition("shard")
            .write.mode("append")
            .partitionBy("shard")
            .parquet(f"{p}/doc_stats")
        )

        # refresh globals (exact scoring uses these; bounds go
        # stat-independent via stats_fresh=False)
        ds = spark.read.parquet(f"{p}/doc_stats").select("doc_id", "dl")
        globs = compute_globals(ds)

        # encode ONLY the new shards' postings and append
        vocab_t = spark.read.parquet(f"{p}/vocab")
        postings_new = build_postings_from_tf(
            explode_packed_tf(packed_new),
            vocab_t,
            globs,
            cfg=cfg,
            docs_per_shard=self.docs_per_shard,
            block_size=POSTING_BLOCK_SIZE,
        ).withColumn("bucket", bucket_col("term_id", self.n_buckets))
        (
            postings_new.repartition("bucket")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(f"{p}/postings")
        )

        with open(f"{p}/globals.json") as f:
            gj = json.load(f)
        gj.update(
            {"n_docs": globs.n_docs, "avgdl": globs.avgdl, "stats_fresh": False}
        )
        with open(f"{p}/globals.json", "w") as f:
            json.dump(gj, f)

        return PostingsIndex(
            spark=spark,
            path=p,
            globs=globs,
            docs_per_shard=self.docs_per_shard,
            n_buckets=self.n_buckets,
            stats_fresh=False,
        )


class IndexBuilder:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        cfg: BM25Config = BM25Config(),
        docs_per_shard: int = DEFAULT_DOCS_PER_SHARD,
        n_buckets: int = DEFAULT_N_BUCKETS,
        block_size: int = POSTING_BLOCK_SIZE,
    ) -> None:
        if not path:
            raise ValueError("IndexBuilder requires an index path")
        self.spark = spark
        self.path = path
        self.cfg = cfg
        self.docs_per_shard = docs_per_shard
        self.n_buckets = n_buckets
        self.block_size = block_size
        os.makedirs(f"{path}/_stages", exist_ok=True)

    # -- stage markers -------------------------------------------------------
    def _fingerprint(self) -> dict:
        return {
            "k1": self.cfg.k1,
            "b": self.cfg.b,
            "docs_per_shard": self.docs_per_shard,
            "n_buckets": self.n_buckets,
            "block_size": self.block_size,
            "tf_format": "packed-v2",  # invalidates pre-packed indexes
        }

    def _marker(self, stage: str) -> str:
        return f"{self.path}/_stages/{stage}.json"

    def _done(self, stage: str) -> bool:
        m = self._marker(stage)
        if not os.path.exists(m):
            return False
        with open(m) as f:
            return json.load(f).get("fingerprint") == self._fingerprint()

    def _mark(self, stage: str, **metrics) -> None:
        with open(self._marker(stage), "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "fingerprint": self._fingerprint(),
                    "completed_at": time.time(),
                    **metrics,
                },
                f,
            )

    # -- build ---------------------------------------------------------------
    def build_from_docs(
        self,
        docs: DataFrame,
        min_count: int = 0,
        resume: bool = True,
    ) -> PostingsIndex:
        """Primary entry: docs(doc_id, text) -> index. One fused
        tokenize+count Arrow pass materialized as the packed `tf`
        stage (one row/doc with term/tf arrays — ~56x fewer rows than
        the long format through Arrow/parquet/shuffle, which was the
        top non-scaling cost)."""
        from top2vec_spark.operators.tokens import doc_term_counts_packed

        # Compact parquet inputs coalesce into very few splits
        # (spark.sql.files.maxPartitionBytes), starving the
        # CPU-heavy tokenize UDF of parallelism — fan out first.
        # (At petabyte scale inputs arrive in thousands of splits and
        # this is a no-op.)
        target = self.spark.sparkContext.defaultParallelism * 2
        if docs.rdd.getNumPartitions() < target:
            docs = docs.repartition(target)

        return self._build_from_packed(
            lambda: doc_term_counts_packed(docs),
            min_count=min_count,
            resume=resume,
        )

    def build(
        self,
        tokens: DataFrame,
        vocab: DataFrame = None,
        doc_stats: DataFrame = None,
        min_count: int = 0,
        resume: bool = True,
    ) -> PostingsIndex:
        """Build from a long-format tokens(doc_id, pos, term) table.
        vocab/doc_stats args are accepted for backward compatibility
        but recomputed from the materialized tf stage (strict-'>'
        min_count, SURVEY.md P1) so tokenization runs once."""
        from top2vec_spark.operators.tokens import pack_tokens

        return self._build_from_packed(
            lambda: pack_tokens(tokens), min_count=min_count, resume=resume
        )

    def _build_from_packed(
        self, make_packed, min_count: int, resume: bool
    ) -> PostingsIndex:
        from top2vec_spark.operators.tokens import explode_packed_tf

        p = self.path

        if not (resume and self._done("tf")):
            make_packed().write.mode("overwrite").parquet(f"{p}/tf")
            self._mark("tf")
        packed_t = self.spark.read.parquet(f"{p}/tf")
        tf_t = explode_packed_tf(packed_t)

        if not (resume and self._done("vocab")):
            from pyspark.sql import Window as W

            counts = (
                tf_t.groupBy("term")
                .agg(F.sum("tf").alias("cf"), F.count(F.lit(1)).alias("df"))
                .filter(F.col("cf") > min_count)
            )
            w = W.orderBy(F.col("df").desc(), F.col("term").asc())
            vocab_df = counts.withColumn(
                "term_id", (F.row_number().over(w) - F.lit(1)).cast("long")
            ).select("term", "term_id", "df", "cf")
            vocab_df.write.mode("overwrite").parquet(f"{p}/vocab")
            self._mark("vocab")
        vocab_t = self.spark.read.parquet(f"{p}/vocab")

        if not (resume and self._done("doc_stats")):
            (
                packed_t.select("doc_id", "dl")
                .withColumn(
                    "shard",
                    (F.col("doc_id") / F.lit(self.docs_per_shard)).cast("int"),
                )
                .repartition("shard")
                .write.mode("overwrite")
                .partitionBy("shard")
                .parquet(f"{p}/doc_stats")
            )
            self._mark("doc_stats")
        ds_t = self.spark.read.parquet(f"{p}/doc_stats").select("doc_id", "dl")

        if not (resume and self._done("globals")):
            g = compute_globals(ds_t)
            with open(f"{p}/globals.json", "w") as f:
                json.dump(
                    {
                        "n_docs": g.n_docs,
                        "avgdl": g.avgdl,
                        "docs_per_shard": self.docs_per_shard,
                        "n_buckets": self.n_buckets,
                        "block_size": self.block_size,
                        "k1": self.cfg.k1,
                        "b": self.cfg.b,
                    },
                    f,
                )
            self._mark("globals")
        with open(f"{p}/globals.json") as f:
            gj = json.load(f)
        globs = CorpusGlobals(n_docs=gj["n_docs"], avgdl=gj["avgdl"])

        if not (resume and self._done("postings")):
            # JVM explode + repartition-by-(term,shard): Tungsten owns
            # the 90M-row sort/shuffle. The alternative map-side-encode
            # kernel (build_postings_from_packed) shuffles 30x fewer
            # bytes but pays Arrow list<string> -> Python object
            # materialization — a win on network-shuffle clusters, a
            # loss on this single box (measured).
            postings = build_postings_from_tf(
                explode_packed_tf(packed_t),
                vocab_t,
                globs,
                cfg=self.cfg,
                docs_per_shard=self.docs_per_shard,
                block_size=self.block_size,
            ).withColumn("bucket", bucket_col("term_id", self.n_buckets))
            (
                postings.repartition("bucket")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(f"{p}/postings")
            )
            self._mark("postings")

        if not (resume and self._done("manifest")):
            self._write_manifest(globs)
            self._mark("manifest")

        return PostingsIndex(
            spark=self.spark,
            path=p,
            globs=globs,
            docs_per_shard=self.docs_per_shard,
            n_buckets=self.n_buckets,
        )

    def _write_manifest(self, globs: CorpusGlobals) -> None:
        """Per-partition lineage + metrics (north rule): one row per
        postings bucket partition, counting postings emitted and
        compressed bytes; docs_tokenized comes from the shard-level
        doc_stats (docs that produced >= 1 token)."""
        p = self.path
        postings = self.spark.read.parquet(f"{p}/postings")
        ds = self.spark.read.parquet(f"{p}/doc_stats")
        lineage = json.dumps(
            {
                "stages": ["tf", "vocab", "doc_stats", "globals", "postings"],
                "fingerprint": self._fingerprint(),
                "n_docs": globs.n_docs,
                "avgdl": globs.avgdl,
            }
        )
        per_bucket = postings.groupBy("bucket").agg(
            F.sum("n").alias("postings_emitted"),
            (
                F.sum(F.length("doc_ids")) + F.sum(F.length("tfs"))
            ).alias("bytes_compressed"),
        )
        docs_per_shard_df = ds.groupBy("shard").agg(
            F.count(F.lit(1)).alias("docs_tokenized")
        )
        total_docs = globs.n_docs
        manifest = per_bucket.select(
            F.col("bucket").cast("int").alias("partition_id"),
            F.lit(total_docs).cast("long").alias("docs_tokenized"),
            F.col("postings_emitted").cast("long"),
            F.col("bytes_compressed").cast("long"),
            F.concat(F.lit(f"{p}/postings/bucket="), F.col("bucket")).alias(
                "checkpoint_path"
            ),
            F.lit(lineage).alias("lineage"),
        ).unionByName(
            docs_per_shard_df.select(
                F.col("shard").cast("int").alias("partition_id"),
                F.col("docs_tokenized").cast("long"),
                F.lit(0).cast("long").alias("postings_emitted"),
                F.lit(0).cast("long").alias("bytes_compressed"),
                F.concat(F.lit(f"{p}/doc_stats/shard="), F.col("shard")).alias(
                    "checkpoint_path"
                ),
                F.lit(lineage).alias("lineage"),
            )
        )
        manifest.write.mode("overwrite").parquet(f"{p}/manifest")
