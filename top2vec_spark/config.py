"""Engine-wide constants, frozen in one module so the engine, the
pytest oracles, and the DuckDB oracle SQL all share the same numbers
(SURVEY.md §4.2 "BM25 scoring").
"""

from __future__ import annotations

from dataclasses import dataclass

# BM25 constants mandated by the north rule (BASELINE.json).
BM25_K1: float = 1.2
BM25_B: float = 0.75

# Tokenizer contract (gensim simple_preprocess defaults, reference
# top2vec/top2vec.py:131): token length in [MIN_TOKEN_LEN, MAX_TOKEN_LEN],
# tokens starting with '_' dropped.
MIN_TOKEN_LEN: int = 2
MAX_TOKEN_LEN: int = 15

# Vocabulary filter: corpus frequency strictly greater than MIN_COUNT
# (strict '>' — reference top2vec.py:869). Default 0 keeps every term
# so small fixtures are fully retrievable; Top2Vec's own default is 50.
DEFAULT_MIN_COUNT: int = 0

# Posting-list block size: docIDs per compressed block. 128 is the
# standard block size in block-max indexes (e.g. PISA / Lucene BKD
# literature); small enough for tight block-max bounds, large enough
# to amortize skip-pointer overhead.
POSTING_BLOCK_SIZE: int = 128

# Head-term skew is handled by the (term_id, doc-shard) encode keys
# (operators/postings.py): a term's salt count is implicitly
# proportional to how many doc-shards it appears in — no separate
# salting constants needed.


@dataclass(frozen=True)
class BM25Config:
    """BM25 scoring parameters (north rule: k1=1.2, b=0.75)."""

    k1: float = BM25_K1
    b: float = BM25_B

    def idf_sql(self, n_docs_expr: str = "N", df_expr: str = "df") -> str:
        """ANSI-SQL idf expression shared with the DuckDB oracle."""
        return f"ln(1.0 + ({n_docs_expr} - {df_expr} + 0.5) / ({df_expr} + 0.5))"
