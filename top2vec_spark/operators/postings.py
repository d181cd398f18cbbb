"""Posting-list construction (SURVEY.md §7.2 steps 4-5).

Pipeline (all DataFrame ops + one Arrow-grouped encoder):

    tokens ──groupBy(doc_id, term)──> tf
      ⋈ vocab(term -> term_id, df)      (broadcast-able dimension)
      ⋈ doc_stats(doc_id -> dl)
      withColumn shard = doc_id // docs_per_shard     <- THE SALT
      groupBy(term_id, shard).applyInPandas(encode)   <- salted
                                   repartition-by-term (north rule)
      -> postings blocks, written partitionBy(bucket(term_id))

Skew design: a head term (Zipf "the") has rows in EVERY doc-shard, so
its encode work spreads across (term, shard) groups instead of
hot-spotting one reducer — the salt count per term is automatically
proportional to its df (north rule: "salting factor ∝ df"). Because
shards are CONTIGUOUS doc_id ranges, per-(term, shard) runs are
disjoint and ordered, so the global per-term posting list is the
shard-ordered concatenation — the de-salt "merge" is logical (zero
extra shuffle), and queries run document-partitioned WAND per shard
(operators/wand.py) with a final top-k merge.

Block layout per row: <=block_size entries, docID-delta varint +
Elias-gamma tfs (operators/codec.py), skip pointers every
SKIP_EVERY entries as (doc_id, byte_offset into doc_ids bytes),
block_max_tf and block_max_score (exact BM25 contribution upper
bound, computed with true dl at build time) for block-max WAND.

Replaces: the reference has no index — keyword search is a dense
matmul scan (top2vec/top2vec.py:1276-1282); this table + WAND is the
engine's scale path (SURVEY.md J5/K1).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from top2vec_spark.config import BM25Config, POSTING_BLOCK_SIZE
from top2vec_spark.operators.corpus_stats import CorpusGlobals

SKIP_EVERY = 16
DEFAULT_DOCS_PER_SHARD = 131_072
DEFAULT_N_BUCKETS = 64
# vocab sizes up to this ride the driver as a broadcast df map
DF_BROADCAST_CAP = 5_000_000

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term_id", T.LongType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("doc_ids", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField(
            "skips",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("doc_id", T.LongType(), False),
                        T.StructField("offset", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("last_doc_id", T.LongType(), False),
        T.StructField("block_max_tf", T.IntegerType(), False),
        T.StructField("block_max_score", T.DoubleType(), False),
        # min dl in the block: stat-INDEPENDENT, so WAND can recompute
        # an admissible bound idf*tfpart(block_max_tf, block_min_dl)
        # under current globals after incremental appends shift
        # N/avgdl/df (block_max_score is exact but frozen at encode
        # time — unsound for pruning once stats drift)
        T.StructField("block_min_dl", T.LongType(), False),
    ]
)


def _varint_offsets(values: np.ndarray) -> np.ndarray:
    """Byte offset of each value within the varint-encoded stream."""
    v = values.astype(np.uint64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while (tmp > 0).any():
        nbytes[tmp > 0] += 1
        tmp >>= np.uint64(7)
    return np.concatenate(([0], np.cumsum(nbytes)[:-1]))


def encode_sorted_run(
    term_id: int,
    shard: int,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    contrib: np.ndarray,
    dls: np.ndarray,
    block_size: int,
    out: list,
) -> None:
    """Append encoded block rows for ONE (term_id, shard) run whose
    doc_ids are already sorted ascending.

    ALL of the run's blocks encode in one batched codec pass
    (encode_varint_many / encode_gamma_many — byte-identical to
    per-block encodes): head-term runs hold thousands of blocks, and
    the per-block encode_varint/encode_gamma fixed cost was the
    postings stage's dominant term, mirroring the decode-side finding
    on the query path."""
    from top2vec_spark.operators.codec import (
        encode_gamma_many,
        encode_varint_many,
    )

    n = doc_ids.size
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    t = np.ascontiguousarray(tfs, dtype=np.int64)
    block_starts = np.arange(0, n, block_size, dtype=np.int64)
    n_blocks = block_starts.size
    counts = np.minimum(block_starts + block_size, n) - block_starts
    # deltas with a reset at every block start (first value absolute)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = np.uint64(d[0])
    if n > 1:
        deltas[1:] = np.diff(d).astype(np.uint64)
    deltas[block_starts] = d[block_starts].astype(np.uint64)
    doc_bytes_list = encode_varint_many(deltas, counts)
    tf_bytes_list = encode_gamma_many(t.astype(np.uint64), counts)
    max_tf = np.maximum.reduceat(t, block_starts)
    max_c = np.maximum.reduceat(contrib, block_starts)
    min_dl = np.minimum.reduceat(np.ascontiguousarray(dls), block_starts)
    lasts = np.minimum(block_starts + block_size, n) - 1
    from top2vec_spark.operators.codec import _varint_nbytes

    nbytes_all = _varint_nbytes(deltas)
    for blk_i in range(n_blocks):
        lo = int(block_starts[blk_i])
        hi = int(lasts[blk_i]) + 1
        offs = np.concatenate(([0], np.cumsum(nbytes_all[lo:hi])[:-1]))
        skips = [
            {"doc_id": int(d[lo + i]), "offset": int(offs[i])}
            for i in range(0, hi - lo, SKIP_EVERY)
        ]
        out.append(
            (
                term_id,
                shard,
                blk_i,
                hi - lo,
                doc_bytes_list[blk_i],
                tf_bytes_list[blk_i],
                skips,
                int(d[lo]),
                int(d[hi - 1]),
                int(max_tf[blk_i]),
                float(max_c[blk_i]),
                int(min_dl[blk_i]),
            )
        )


_OUT_COLS = [f.name for f in POSTINGS_SCHEMA.fields]


def encode_partition(
    pdfs,
    block_size: int,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    df_map=None,
):
    """mapInPandas kernel: one shuffle partition holds many complete
    (term_id, shard) runs, pre-sorted by (term_id, shard, doc_id) via
    sortWithinPartitions. Arrow batches are concatenated (a run may
    straddle batches), group boundaries found vectorized, idf computed
    once per term — NO per-group pandas DataFrame construction, which
    dominates runtime when groups are small (head-term-salted groups
    at fixture scale are tiny)."""
    import math

    chunks = list(pdfs)
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    tid = pdf["term_id"].to_numpy().astype(np.int64)
    shard = pdf["shard"].to_numpy().astype(np.int64)
    doc = pdf["doc_id"].to_numpy().astype(np.int64)
    tf = pdf["tf"].to_numpy().astype(np.int64)
    # df either shuffles as a column (compat) or arrives as a
    # broadcast dict term_id -> df (saves 8 bytes/row in the big
    # repartition-by-term shuffle)
    dfv = (
        pdf["df"].to_numpy().astype(np.int64)
        if df_map is None
        else None
    )
    dl = pdf["dl"].to_numpy().astype(np.float64)

    # vectorized BM25 contribution for every row (idf via np.log is
    # 1-ulp-risky vs math.log — recompute per-run idf with math.log
    # below and scale, so stored block maxima exactly dominate the
    # WAND kernel's math.log-based scores)
    tf_part = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    # run boundaries where (term_id, shard) changes
    change = np.flatnonzero((tid[1:] != tid[:-1]) | (shard[1:] != shard[:-1]))
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change + 1, [tid.size]))

    out: list = []
    idf_cache: dict[int, float] = {}
    for s, e in zip(starts, ends):
        t_id = int(tid[s])
        idf = idf_cache.get(t_id)
        if idf is None:
            df_val = int(df_map[t_id]) if df_map is not None else int(dfv[s])
            idf = math.log(1.0 + (n_docs - df_val + 0.5) / (df_val + 0.5))
            idf_cache[t_id] = idf
        encode_sorted_run(
            t_id,
            int(shard[s]),
            doc[s:e],
            tf[s:e],
            idf * tf_part[s:e],
            dl[s:e],
            block_size,
            out,
        )
        if len(out) >= 2000:
            yield pd.DataFrame(out, columns=_OUT_COLS)
            out = []
    if out:
        yield pd.DataFrame(out, columns=_OUT_COLS)


def encode_partition_sidecar(
    pdfs,
    block_size: int,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    df_map,
    stats_path: str,
):
    """Slim-shuffle encode kernel: rows arrive as
    (term_id int32, shard int32, doc_id int64, tf int32) — HALF the
    bytes of the dl-carrying form — sorted SHARD-MAJOR
    (shard, term_id, doc_id). Document lengths are side-read from the
    shard-partitioned doc_stats sidecar exactly like the WAND query
    kernel: shard-major ordering means one sidecar (a few MB) is live
    at a time, loaded once per contiguous shard segment — bounded
    memory at any scale, zero dl bytes through the big shuffle."""
    import math

    chunks = list(pdfs)
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    tid = pdf["term_id"].to_numpy().astype(np.int64)
    shard = pdf["shard"].to_numpy().astype(np.int64)
    doc = pdf["doc_id"].to_numpy().astype(np.int64)
    tf = pdf["tf"].to_numpy().astype(np.int64)

    change = np.flatnonzero((shard[1:] != shard[:-1]) | (tid[1:] != tid[:-1]))
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change + 1, [tid.size]))

    out: list = []
    idf_cache: dict[int, float] = {}
    cur_shard, s_ids, s_dl = None, None, None
    for s, e in zip(starts, ends):
        sh = int(shard[s])
        if sh != cur_shard:
            stats_pdf = pd.read_parquet(
                f"{stats_path}/shard={sh}", columns=["doc_id", "dl"]
            )
            ids = stats_pdf["doc_id"].to_numpy().astype(np.int64)
            order = np.argsort(ids)
            s_ids = ids[order]
            s_dl = stats_pdf["dl"].to_numpy().astype(np.float64)[order]
            cur_shard = sh
        t_id = int(tid[s])
        idf = idf_cache.get(t_id)
        if idf is None:
            df_val = int(df_map[t_id])
            idf = math.log(1.0 + (n_docs - df_val + 0.5) / (df_val + 0.5))
            idf_cache[t_id] = idf
        d = doc[s:e]
        t = tf[s:e].astype(np.float64)
        dl = s_dl[np.searchsorted(s_ids, d)]
        tf_part = (t * (k1 + 1.0)) / (t + k1 * (1.0 - b + b * dl / avgdl))
        encode_sorted_run(
            t_id,
            sh,
            d,
            tf[s:e],
            idf * tf_part,
            dl.astype(np.int64),
            block_size,
            out,
        )
        if len(out) >= 2000:
            yield pd.DataFrame(out, columns=_OUT_COLS)
            out = []
    if out:
        yield pd.DataFrame(out, columns=_OUT_COLS)


def build_postings_from_tf(
    tf: DataFrame,
    vocab: DataFrame,
    globs: CorpusGlobals,
    cfg: BM25Config = BM25Config(),
    docs_per_shard: int = DEFAULT_DOCS_PER_SHARD,
    block_size: int = POSTING_BLOCK_SIZE,
    stats_path: str | None = None,
    df_rows: list | None = None,
) -> DataFrame:
    """tf(doc_id, term, tf, dl) + vocab -> compressed postings
    (unsaved). The only join is the vocab dimension (broadcast) and
    the only shuffle is the repartition on (term_id, shard) — the
    salted repartition-by-term.

    ``df_rows``: optional pre-collected (term_id, df) rows (≤ cap+1,
    same shape as the internal collect) — the index builder harvests
    them inside its vocab stage thread so this planning-time job is
    already paid when the postings stage starts.

    Shuffle-row slimming, in preference order:
    - ``stats_path`` given (the index build: doc_stats is already on
      disk) + vocab under the broadcast cap: rows shrink to
      (term_id int32, shard int32, doc_id int64, tf int32) = 20 bytes
      — df rides a broadcast dict, dl is side-read per shard from the
      doc_stats sidecar inside the encode kernel (shard-major sort
      keeps exactly one sidecar live at a time).
    - no stats_path, vocab under cap: dl travels as a column, df via
      broadcast dict.
    - vocab over cap: both df and dl travel as columns (degenerate).
    """
    spark = tf.sparkSession
    k1, b, n_docs, avgdl = cfg.k1, cfg.b, globs.n_docs, globs.avgdl

    df_bc = None
    # ONE job decides broadcastability AND fetches the map: collect up
    # to CAP+1 (term_id, df) rows — len > CAP means the vocab is over
    # the cap (fall back to the column path); the separate count() job
    # this replaces cost a full extra scan per build
    vrows = (
        df_rows
        if df_rows is not None
        else vocab.select("term_id", "df")
        .limit(DF_BROADCAST_CAP + 1)
        .collect()
    )
    small_vocab = len(vrows) <= DF_BROADCAST_CAP
    if small_vocab:
        df_map = {int(r["term_id"]): int(r["df"]) for r in vrows}
        df_bc = spark.sparkContext.broadcast(df_map)
    del vrows

    # THE salted repartition-by-term (north rule): hash-shuffle on
    # (term_id, shard) spreads head terms across partitions; the
    # within-partition sort lines up complete runs so ONE mapInPandas
    # pass encodes every run with vectorized boundary detection —
    # groupBy().applyInPandas() here would build a pandas frame per
    # (term, shard) group, whose constant cost dominates when salting
    # makes groups small (measured 3x slower at fixture scale).
    #
    # Partition count is SCALE-ADAPTIVE, not a constant: 4x
    # overpartitioning vs cores smooths run-size skew stragglers on
    # big inputs (measured: 34s -> 19s at 400k docs / local[32]), but
    # on small inputs the per-task Arrow/Python fixed cost dominates
    # (measured at 50k docs / local[32]: 128 parts 2.4s vs 32 parts
    # 1.3s for the same encode). The exact postings row count is FREE
    # here — sum(df) over the vocab rows already collected for the
    # broadcast — so size partitions to ~64k postings rows each,
    # clamped to [cores, 4*cores]. Over the broadcast cap (no df rows
    # in hand) keep the 4x straggler-smoothing default.
    _cores = max(tf.sparkSession.sparkContext.defaultParallelism, 2)
    if small_vocab:
        n_rows = sum(df_map.values())
        n_encode_parts = max(
            min(_cores * 4, (n_rows + 65_535) // 65_536), _cores, 8
        )
    else:
        n_encode_parts = max(_cores * 4, 8)

    if small_vocab and stats_path is not None:
        enriched = (
            tf.join(F.broadcast(vocab.select("term", "term_id")), "term")
            .select(
                F.col("term_id").cast("int").alias("term_id"),
                (F.col("doc_id") / F.lit(docs_per_shard))
                .cast("int")
                .alias("shard"),
                "doc_id",
                F.col("tf").cast("int").alias("tf"),
            )
        )
        shuffled = enriched.repartition(
            n_encode_parts, "term_id", "shard"
        ).sortWithinPartitions("shard", "term_id", "doc_id")

        def encode_slim(pdfs):
            yield from encode_partition_sidecar(
                pdfs, block_size, k1, b, n_docs, avgdl, df_bc.value, stats_path
            )

        return shuffled.mapInPandas(encode_slim, POSTINGS_SCHEMA)

    if small_vocab:
        enriched = (
            tf.join(F.broadcast(vocab.select("term", "term_id")), "term")
            .withColumn(
                "shard", (F.col("doc_id") / F.lit(docs_per_shard)).cast("int")
            )
            .select("term_id", "shard", "doc_id", "tf", "dl")
        )
    else:
        enriched = (
            tf.join(vocab.select("term", "term_id", "df"), "term")
            .withColumn(
                "shard", (F.col("doc_id") / F.lit(docs_per_shard)).cast("int")
            )
            .select("term_id", "shard", "doc_id", "tf", "df", "dl")
        )

    shuffled = enriched.repartition(
        n_encode_parts, "term_id", "shard"
    ).sortWithinPartitions("term_id", "shard", "doc_id")

    def encode(pdfs):
        yield from encode_partition(
            pdfs,
            block_size,
            k1,
            b,
            n_docs,
            avgdl,
            df_map=df_bc.value if df_bc is not None else None,
        )

    return shuffled.mapInPandas(encode, POSTINGS_SCHEMA)


def encode_shard_partition(
    pdfs,
    vocab_map,  # dict term -> (term_id, df) (broadcast)
    docs_per_shard: int,
    block_size: int,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
):
    """mapInPandas kernel over PACKED tf rows repartitioned by shard:
    each partition holds complete doc-shards; the kernel explodes
    (numpy), maps terms -> term_ids via the broadcast vocab (C-level
    pandas hash map), lexsorts by (term_id, doc_id) and encodes whole
    (term, shard) runs locally.

    This is the map-side-encode architecture of production index
    builders: the big raw (doc, term, tf) relation NEVER shuffles —
    only packed per-doc rows (once, by shard) and the compressed
    blocks (by term bucket, ~30x smaller than raw rows) move."""
    import math

    chunks = list(pdfs)
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]

    vm_terms = vocab_map["terms"]  # pd.Index of terms
    vm_ids = vocab_map["ids"]  # np.int64 array aligned with vm_terms
    vm_df = vocab_map["df"]  # np.int64 array aligned by term_id order

    doc_ids_col = pdf["doc_id"].to_numpy().astype(np.int64)
    dls_col = pdf["dl"].to_numpy().astype(np.int64)
    lens = pdf["terms"].map(len).to_numpy().astype(np.int64)
    flat_terms = pd.Index(
        np.concatenate([np.asarray(t, dtype=object) for t in pdf["terms"]])
        if len(pdf)
        else []
    )
    flat_tfs = (
        np.concatenate([np.asarray(t, dtype=np.int64) for t in pdf["tfs"]])
        if len(pdf)
        else np.empty(0, dtype=np.int64)
    )
    doc_rep = np.repeat(doc_ids_col, lens)
    dl_rep = np.repeat(dls_col, lens)
    # term -> term_id (vectorized hash-join; -1 = filtered by min_count)
    pos = vm_terms.get_indexer(flat_terms)
    keep = pos >= 0
    tid = np.where(keep, vm_ids[np.maximum(pos, 0)], -1)[keep]
    doc_rep, dl_rep, flat_tfs = doc_rep[keep], dl_rep[keep], flat_tfs[keep]
    shard_rep = doc_rep // docs_per_shard

    order = np.lexsort((doc_rep, shard_rep, tid))
    tid, doc_rep, dl_rep, flat_tfs, shard_rep = (
        tid[order],
        doc_rep[order],
        dl_rep[order],
        flat_tfs[order],
        shard_rep[order],
    )

    dl_f = dl_rep.astype(np.float64)
    tf_part = (flat_tfs * (k1 + 1.0)) / (
        flat_tfs + k1 * (1.0 - b + b * dl_f / avgdl)
    )

    change = np.flatnonzero(
        (tid[1:] != tid[:-1]) | (shard_rep[1:] != shard_rep[:-1])
    )
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change + 1, [tid.size]))

    out: list = []
    idf_cache: dict[int, float] = {}
    for s, e in zip(starts, ends):
        t_id = int(tid[s])
        idf = idf_cache.get(t_id)
        if idf is None:
            df_val = int(vm_df[t_id])
            idf = math.log(1.0 + (n_docs - df_val + 0.5) / (df_val + 0.5))
            idf_cache[t_id] = idf
        encode_sorted_run(
            t_id,
            int(shard_rep[s]),
            doc_rep[s:e],
            flat_tfs[s:e],
            idf * tf_part[s:e],
            dl_rep[s:e],
            block_size,
            out,
        )
        if len(out) >= 2000:
            yield pd.DataFrame(out, columns=_OUT_COLS)
            out = []
    if out:
        yield pd.DataFrame(out, columns=_OUT_COLS)


def build_postings_from_packed(
    packed: DataFrame,
    vocab: DataFrame,
    globs: CorpusGlobals,
    cfg: BM25Config = BM25Config(),
    docs_per_shard: int = DEFAULT_DOCS_PER_SHARD,
    block_size: int = POSTING_BLOCK_SIZE,
) -> DataFrame:
    """Packed tf (doc_id, terms, tfs, dl) -> compressed postings.

    ONE raw shuffle (packed rows by shard — a shard must live whole in
    one partition) + map-side encode; the downstream bucket
    repartition moves only compressed blocks. Vocabulary rides as a
    broadcast (term -> term_id, df); falls back to
    ``build_postings_from_tf`` when the vocab exceeds the cap.
    """
    spark = packed.sparkSession
    VOCAB_BROADCAST_CAP = 5_000_000
    if vocab.count() > VOCAB_BROADCAST_CAP:
        from top2vec_spark.operators.tokens import explode_packed_tf

        return build_postings_from_tf(
            explode_packed_tf(packed), vocab, globs, cfg, docs_per_shard, block_size
        )

    vrows = vocab.select("term", "term_id", "df").collect()
    terms_idx = pd.Index([r["term"] for r in vrows])
    ids = np.array([r["term_id"] for r in vrows], dtype=np.int64)
    df_by_id = np.zeros(int(ids.max()) + 1 if len(ids) else 1, dtype=np.int64)
    for r in vrows:
        df_by_id[int(r["term_id"])] = int(r["df"])
    bc = spark.sparkContext.broadcast(
        {"terms": terms_idx, "ids": ids, "df": df_by_id}
    )

    k1, b, n_docs, avgdl = cfg.k1, cfg.b, globs.n_docs, globs.avgdl
    n_parts = max(spark.sparkContext.defaultParallelism * 2, 8)
    sharded = packed.repartition(
        n_parts, (F.col("doc_id") / F.lit(docs_per_shard)).cast("int")
    )

    def encode(pdfs):
        yield from encode_shard_partition(
            pdfs, bc.value, docs_per_shard, block_size, k1, b, n_docs, avgdl
        )

    return sharded.mapInPandas(encode, POSTINGS_SCHEMA)


def build_postings(
    tokens: DataFrame,
    vocab: DataFrame,
    doc_stats: DataFrame,
    globs: CorpusGlobals,
    cfg: BM25Config = BM25Config(),
    docs_per_shard: int = DEFAULT_DOCS_PER_SHARD,
    block_size: int = POSTING_BLOCK_SIZE,
) -> DataFrame:
    """tokens(doc_id, pos, term) variant (tests / ad-hoc)."""
    tf = (
        tokens.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .join(doc_stats, "doc_id")
        .select("doc_id", "term", "tf", "dl")
    )
    return build_postings_from_tf(
        tf, vocab, globs, cfg, docs_per_shard, block_size
    )


def bucket_col(term_col: str = "term_id", n_buckets: int = DEFAULT_N_BUCKETS):
    return F.pmod(F.col(term_col), F.lit(n_buckets)).cast("int")
