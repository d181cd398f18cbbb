"""Window/frame operators over per-token vector tables — reference
W1/W2 (SURVEY.md §2.6; embedding.py:112-171).

The reference computes these over contextual token embeddings; the
embedding model itself is out of scope (L3), but the window semantics
are engine operators over any long-format (doc_id, pos, vec) table:

- W1 ``sliding_window_mean``: windows of `window` tokens with stride
  `stride`; the LAST window is right-aligned (start = max(0,
  n - window)) exactly like embedding.py:112-144.
- W2 ``smooth_adjacent``: per token, mean of vectors in [pos-w, pos+w]
  clamped to the doc — the canonical rowsBetween frame
  (embedding.py:147-161).

Both are pure DataFrame ops: elementwise array math via
posexplode + groupBy avg (JVM) — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _recollect(df: DataFrame, keys: list[str], pos_col: str, val_col: str) -> DataFrame:
    """(keys..., dim_pos, value) -> (keys..., array) preserving dim order."""
    return (
        df.groupBy(*keys)
        .agg(
            F.array_sort(F.collect_list(F.struct(pos_col, val_col))).alias("pm")
        )
        .select(*keys, F.transform("pm", lambda x: x[val_col]).alias("vec"))
    )


def smooth_adjacent(
    tok_vecs: DataFrame, w: int = 2, normalize: bool = True
) -> DataFrame:
    """W2: (doc_id, pos, vec array<double>) -> (doc_id, pos, vec)
    where out[pos] = mean(vec[pos-w .. pos+w]) clamped per doc.

    Implemented as posexplode to (doc_id, pos, dim, v) then an
    avg OVER (PARTITION BY doc_id, dim ORDER BY pos ROWS BETWEEN w
    PRECEDING AND w FOLLOWING) — whole-stage codegen window agg.
    Optionally L2-normalizes inputs first (embedding.py:151 does).
    """
    vec = F.col("vec")
    if normalize:
        nrm = F.sqrt(
            F.aggregate(F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
        )
        vec = F.transform(vec, lambda x: x / nrm)
    flat = tok_vecs.select(
        "doc_id", "pos", F.posexplode(vec).alias("dim", "v")
    )
    win = (
        W.partitionBy("doc_id", "dim").orderBy("pos").rowsBetween(-w, w)
    )
    smoothed = flat.withColumn("sv", F.avg("v").over(win))
    return _recollect(
        smoothed.select("doc_id", "pos", "dim", "sv"), ["doc_id", "pos"], "dim", "sv"
    )


def sliding_window_mean(
    tok_vecs: DataFrame, window: int = 50, stride: int = 40
) -> DataFrame:
    """W1: per doc, mean vector of token windows starting at
    0, stride, 2*stride, ...; a window overrunning the end is
    right-aligned to (n - window) like embedding.py:131-137. Returns
    (doc_id, window_id, start, vec)."""
    n = F.max("pos").over(W.partitionBy("doc_id")) + 1
    marked = tok_vecs.withColumn("n", n)
    # window starts per doc: 0, stride, ... while start < n; right-align last
    starts = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest(F.ceil((F.col("n") - window) / F.lit(stride)).cast("int"), F.lit(0)),
        ),
        lambda i: F.least(i * stride, F.greatest(F.col("n") - window, F.lit(0))),
    )
    docs = marked.select("doc_id", "n").distinct().withColumn(
        "starts", F.array_distinct(starts)
    )
    wins = docs.select(
        "doc_id", F.posexplode("starts").alias("window_id", "start")
    )
    joined = wins.join(tok_vecs, "doc_id").filter(
        (F.col("pos") >= F.col("start")) & (F.col("pos") < F.col("start") + window)
    )
    flat = joined.select(
        "doc_id", "window_id", "start", F.posexplode("vec").alias("dim", "v")
    )
    means = flat.groupBy("doc_id", "window_id", "start", "dim").agg(
        F.avg("v").alias("m")
    )
    return _recollect(means, ["doc_id", "window_id", "start"], "dim", "m")
