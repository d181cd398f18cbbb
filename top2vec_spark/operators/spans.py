"""Exact-substring (duplicate-span) deduplication.

Beyond the reference's capability surface (Top2Vec has no dedup), but
a first-class stage of every published webtext training-data recipe:
the ExactSubstr pass of Lee et al. 2021 ("Deduplicating Training Data
Makes Language Models Better") removes every span of >= ``w``
consecutive tokens whose content occurs more than once in the corpus.
The published implementation builds ONE suffix array over the whole
concatenated corpus — inherently single-machine and memory-bound.
Re-expressed Spark-first with identical fixed-window semantics:

  per-token hash (JVM xxhash64, codegen — string bytes never reach
  Python)  ->  O(n) vectorized rolling polynomial window hash per
  document (Arrow kernel; TWO independent odd multipliers mod 2^64 =
  a 128-bit effective key, same collision stance as
  dedup._content_keys)  ->  one hash-groupBy over (h1, h2) to find
  repeated windows  ->  inner join back to occurrences  ->  per-doc
  O(len) difference-array coverage scrub.

Fixed-window-vs-suffix-array delta (documented): a suffix array finds
duplicated substrings of ANY length >= w; hashing every length-w
window finds exactly the same *covered token set* for duplicates of
length >= w (a duplicated run of length L >= w is covered by its
L - w + 1 duplicated windows), so the scrubbed output differs from
the suffix-array recipe only in never extending a match below length
w. This is the standard fixed-window approximation used by published
distributed pipelines.

Scale shape (10^12 docs):
- window hashing is a NARROW map (zero shuffle): numpy cumsum/cumprod
  rolling fold, O(n) per document regardless of ``w`` (the fold uses
  the modular inverse of the multiplier, which exists mod 2^64 for
  any odd multiplier).
- the duplicated-window groupBy shuffles one (h1, h2, doc_id, pos)
  row per window occurrence — uniform 128-bit keys, classic two-phase
  partial agg; volume O(total tokens), the same order as the index
  build's own tf shuffle.
- a boilerplate window shared by millions of docs skews only the
  join-back, which stays row-to-row (no collect_list of occurrences
  anywhere); AQE skew-join splits an oversized key range.
- scrub: marked starts per doc (groupBy doc_id — O(marked) rows,
  bounded by the doc's own length), one join onto the token arrays,
  then a per-doc O(len) difference-array mask in one Arrow kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from top2vec_spark.operators.dedup import token_hashes

# Two independent odd multipliers (golden-ratio and xxhash primes).
_MULT1 = np.uint64(0x9E3779B97F4A7C15)
_MULT2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _modinv_u64(m: np.uint64) -> np.uint64:
    """Inverse of an odd ``m`` modulo 2^64 (Newton–Hensel lifting:
    x <- x * (2 - m * x) doubles the number of correct low bits each
    step; x0 = m is correct to 3 bits for any odd m, so 5 steps reach
    96 >= 64 bits)."""
    with np.errstate(over="ignore"):
        x = m
        for _ in range(5):
            x = x * (np.uint64(2) - m * x)
    return x


_INV1 = _modinv_u64(_MULT1)
_INV2 = _modinv_u64(_MULT2)


def _rolling_hashes(t: np.ndarray, w: int, mult: np.uint64, inv: np.uint64) -> np.ndarray:
    """All length-``w`` window hashes of token-hash array ``t`` in
    O(n): h[i] = sum_{j<w} t[i+j] * mult^(w-1-j)  (mod 2^64) — the
    same value as the sequential fold ``acc = acc*mult + t[i+j]``.

    Derivation: with A[k] = t[k] * inv^k and C = cumsum(A),
    h[i] = (C[i+w-1] - C[i-1]) * mult^(i+w-1); every op wraps mod
    2^64, where the odd multiplier is invertible."""
    n = t.size
    m = n - w + 1
    with np.errstate(over="ignore"):
        invpow = np.empty(n, dtype=np.uint64)
        invpow[0] = np.uint64(1)
        if n > 1:
            np.cumprod(np.full(n - 1, inv, dtype=np.uint64), out=invpow[1:])
        c = np.cumsum(t * invpow, dtype=np.uint64)
        s = c[w - 1 :].copy()
        s[1:] -= c[: m - 1]
        mpow = np.empty(m, dtype=np.uint64)
        # mpow[i] = mult^(i+w-1)
        acc = np.uint64(1)
        base = mult
        e = w - 1
        while e:
            if e & 1:
                acc = acc * base
            base = base * base
            e >>= 1
        mpow[0] = acc
        if m > 1:
            np.cumprod(np.full(m - 1, mult, dtype=np.uint64), out=mpow[1:])
            mpow[1:] = mpow[1:] * acc
        return s * mpow


def window_hashes(
    tokens_arr: DataFrame,
    w: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, tokens array<string>) -> (doc_id, pos, h1, h2): one
    row per length-``w`` token window, hashed with two independent
    rolling hashes over the per-token xxhash64 values. Docs shorter
    than ``w`` emit no rows. Zero shuffle — a narrow Arrow map after
    the JVM-side token hashing."""
    if w < 1:
        raise ValueError(f"window length must be >= 1, got {w}")

    def batch(pdfs):
        for pdf in pdfs:
            ids, poss, h1s, h2s = [], [], [], []
            for did, th in zip(pdf["doc_id"], pdf["thash"]):
                if th is None:
                    raise TypeError(
                        f"tokens column contains NULL (doc_id={did}); "
                        "filter or coalesce to [] before span dedup"
                    )
                t = np.asarray(th, dtype=np.int64).astype(np.uint64, copy=False)
                n = t.size
                if n < w:
                    continue
                m = n - w + 1
                ids.append(np.full(m, did, dtype=np.int64))
                poss.append(np.arange(m, dtype=np.int32))
                h1s.append(
                    _rolling_hashes(t, w, _MULT1, _INV1).astype(np.int64)
                )
                h2s.append(
                    _rolling_hashes(t, w, _MULT2, _INV2).astype(np.int64)
                )
            if not ids:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "pos": pd.Series([], dtype="int32"),
                        "h1": pd.Series([], dtype="int64"),
                        "h2": pd.Series([], dtype="int64"),
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids),
                    "pos": np.concatenate(poss),
                    "h1": np.concatenate(h1s),
                    "h2": np.concatenate(h2s),
                }
            )

    return token_hashes(tokens_arr, tokens_col, id_col).mapInPandas(
        batch, "doc_id long, pos int, h1 long, h2 long"
    )


def duplicate_spans(
    tokens_arr: DataFrame,
    w: int = 50,
    min_count: int = 2,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Every occurrence of a length-``w`` token window whose content
    appears >= ``min_count`` times in the corpus (within- and
    cross-document occurrences both count, matching ExactSubstr's
    whole-corpus suffix array): (doc_id, pos, n_occ, is_keeper).
    ``is_keeper`` marks the single globally-first occurrence
    (lexicographic min over (doc_id, pos)) of each distinct window
    content — the occurrence ``scrub_duplicate_spans(keep='first')``
    preserves.

    Plan shape: the explicit ``repartition(h1, h2)`` BEFORE both
    consumers makes the agg branch and the join branch share ONE
    identical Exchange subtree, which Spark's exchange reuse then
    deduplicates — the window-hash kernel runs ONCE and the
    occurrence table shuffles ONCE (without it, the agg side's
    exchange wraps a partial aggregate, nothing canonicalizes equal,
    and the whole scan+hash subtree executes twice — the same
    single-Exchange trick as the IVF kNN merge in hdbscan.py).
    Occurrence counts and the keeper min stay a two-phase-safe
    aggregation; a boilerplate window hot key concentrates only its
    own occurrence rows, never a collect_list."""
    wh = window_hashes(tokens_arr, w, tokens_col, id_col).repartition(
        "h1", "h2"
    )
    dup = (
        wh.groupBy("h1", "h2")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min(F.struct("doc_id", "pos")).alias("keep"),
        )
        .filter(F.col("n_occ") >= min_count)
    )
    return wh.join(dup, ["h1", "h2"]).select(
        "doc_id",
        "pos",
        "n_occ",
        (
            (F.col("doc_id") == F.col("keep.doc_id"))
            & (F.col("pos") == F.col("keep.pos"))
        ).alias("is_keeper"),
    )


def scrub_duplicate_spans(
    tokens_arr: DataFrame,
    w: int = 50,
    keep: str = "first",
    min_count: int = 2,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove every token covered by a duplicated length-``w`` window:
    (doc_id, tokens array<string> scrubbed, n_removed). One row per
    input doc (docs with nothing to scrub pass through, n_removed=0).

    keep='first' preserves the globally-first occurrence of each
    distinct window content (its tokens stay unless some OTHER
    duplicated non-keeper window also covers them); keep='none'
    removes every occurrence. Overlapping duplicated windows scrub as
    their interval union (the difference-array mask below)."""
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    spans = duplicate_spans(tokens_arr, w, min_count, tokens_col, id_col)
    if keep == "first":
        spans = spans.filter(~F.col("is_keeper"))
    starts = spans.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("starts")
    )
    src = tokens_arr.select(
        F.col(id_col).alias("doc_id"), F.col(tokens_col).alias("tokens")
    ).join(starts, "doc_id", "left")

    def batch(pdfs):
        for pdf in pdfs:
            out_tokens, out_removed = [], []
            for did, toks, st in zip(pdf["doc_id"], pdf["tokens"], pdf["starts"]):
                if toks is None:
                    raise TypeError(
                        f"tokens column contains NULL (doc_id={did}); "
                        "filter or coalesce to [] before span dedup"
                    )
                toks = np.asarray(toks, dtype=object)
                if st is None or len(st) == 0:
                    out_tokens.append(toks.tolist())
                    out_removed.append(0)
                    continue
                n = toks.size
                st = np.asarray(st, dtype=np.int64)
                diff = np.zeros(n + 1, dtype=np.int64)
                np.add.at(diff, st, 1)
                np.add.at(diff, np.minimum(st + w, n), -1)
                covered = np.cumsum(diff[:n]) > 0
                out_tokens.append(toks[~covered].tolist())
                out_removed.append(int(covered.sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "tokens": out_tokens,
                    "n_removed": pd.Series(out_removed, dtype="int64"),
                }
            )

    return src.mapInPandas(
        batch, "doc_id long, tokens array<string>, n_removed long"
    )
