"""Document chunkers — reference T5/T6 (SURVEY.md §2.2).

T5 ``get_chunks`` (top2vec/top2vec.py:134-167): sequential windows of
``chunk_length`` tokens, stride ``int(chunk_length * (1 -
chunk_overlap_ratio))`` (min 1), capped at
``min(max_num_chunks, ceil(n / chunk_length))`` chunks; an empty token
list yields one empty chunk ([""] in the reference — here an empty
array row).

T6 ``get_random_chunks`` (top2vec.py:170-205): ``num_chunks =
max(1, ceil(n * coverage / chunk_length))`` random start positions —
the reference uses UNSEEDED np.random.choice (SURVEY.md Appendix A);
we seed deterministically per (seed, doc_id).

Both are pure DataFrame ops: F.sequence -> F.transform(slice) ->
posexplode. No Python in the row path (T6's randomness comes from a
hash-based uniform, all column expressions).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ceil_div(a: Column, b: int) -> Column:
    return F.ceil(a / F.lit(float(b))).cast("int")


def sequential_chunks(
    tokens_arr: DataFrame,
    chunk_length: int,
    max_num_chunks: int | None = None,
    chunk_overlap_ratio: float = 0.0,
    tokens_col: str = "tokens",
) -> DataFrame:
    """(doc_id, tokens) -> (doc_id, chunk_id, chunk tokens array).

    Matches the reference arithmetic exactly: stride =
    max(1, int(chunk_length * (1 - overlap))); n_chunks =
    ceil(n / chunk_length) capped by max_num_chunks; chunk i covers
    tokens[i*stride : i*stride + chunk_length].
    """
    stride = max(1, int(chunk_length * (1.0 - chunk_overlap_ratio)))
    n = F.size(F.col(tokens_col))
    n_chunks = _ceil_div(n, chunk_length)
    if max_num_chunks is not None:
        n_chunks = F.least(n_chunks, F.lit(int(max_num_chunks)))
    n_chunks = F.greatest(n_chunks, F.lit(1))  # empty doc -> 1 empty chunk
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1), lambda i: i * stride
    )
    chunks = F.transform(
        starts, lambda s: F.slice(F.col(tokens_col), s + 1, chunk_length)
    )
    return tokens_arr.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "chunk")
    )


def custom_chunks(
    docs: DataFrame,
    chunker,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """H3 hook parity (reference document_chunker callable,
    top2vec.py:365-415): a user Python callable str -> list[str]
    applied per document. This is the documented SLOW path — the
    callable runs row-at-a-time inside an Arrow-batched mapInPandas
    (batch transfer amortized, per-row Python not); the built-in
    sequential/random chunkers stay pure column expressions."""
    import pandas as pd

    def batch(pdfs):
        for pdf in pdfs:
            ids, cids, chunks = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for ci, ch in enumerate(chunker(text or "")):
                    ids.append(did)
                    cids.append(ci)
                    chunks.append(ch)
            yield pd.DataFrame(
                {"doc_id": ids, "chunk_id": cids, "chunk_text": chunks}
            )

    return docs.select(id_col, text_col).mapInPandas(
        batch, "doc_id long, chunk_id int, chunk_text string"
    )


def sentencize(
    docs: DataFrame,
    sentencizer,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """H4/T7 sentencizer seam (reference ``sentencizer`` callable,
    top2vec.py:365-370, validated at 550-558, applied at 684-689): a
    user Python callable str -> list[str] that splits each document
    into sentence chunks BEFORE tokenization — the reference feeds
    each sentence to doc2vec as its own chunk, keyed back to the
    parent document. Output (doc_id, sent_id, sentence), sent_id
    0-based in callable order. Same Arrow-batched mapInPandas shape
    as custom_chunks: the callable is the documented slow per-row
    seam, the batch transfer is vectorized."""
    import pandas as pd

    def batch(pdfs):
        for pdf in pdfs:
            ids, sids, sents = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for si, s in enumerate(sentencizer(text or "")):
                    ids.append(did)
                    sids.append(si)
                    sents.append(s)
            yield pd.DataFrame(
                {"doc_id": ids, "sent_id": sids, "sentence": sents}
            )

    return docs.select(id_col, text_col).mapInPandas(
        batch, "doc_id long, sent_id int, sentence string"
    )


def random_chunks(
    tokens_arr: DataFrame,
    chunk_length: int,
    chunk_len_coverage_ratio: float = 1.0,
    max_num_chunks: int | None = None,
    seed: int = 42,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Seeded re-expression of the reference's unseeded random chunker:
    start positions are hash-derived uniforms over [0, max(n -
    chunk_length, 0)] — deterministic per (seed, doc_id, chunk_id)."""
    n = F.size(F.col(tokens_col))
    n_chunks = F.greatest(
        _ceil_div(n * F.lit(chunk_len_coverage_ratio), chunk_length), F.lit(1)
    )
    if max_num_chunks is not None:
        n_chunks = F.least(n_chunks, F.lit(int(max_num_chunks)))
    hi = F.greatest(n - F.lit(chunk_length), F.lit(0))
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.pmod(
            F.xxhash64(F.col("doc_id"), i, F.lit(seed)), hi + 1
        ).cast("int"),
    )
    chunks = F.transform(
        starts, lambda s: F.slice(F.col(tokens_col), s + 1, chunk_length)
    )
    return tokens_arr.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "chunk")
    )
