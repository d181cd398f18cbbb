"""Tokenization — the byte-identical invariant surface.

The reference tokenizer is ``default_tokenizer`` at
top2vec/top2vec.py:117-131:
``simple_preprocess(strip_tags(document), deacc=True)`` with gensim
semantics. We vendor a pure-Python reimplementation of exactly those
semantics (public gensim.utils / gensim.parsing.preprocessing
behavior) as the contract AND the pytest oracle — gensim itself is not
a dependency. Contract (SURVEY.md §2.2, frozen):

1. strip tags: regex ``<[^>]+>`` removed (gensim ``strip_tags``).
2. lowercase (``str.lower``) — BEFORE deaccenting, as in
   ``gensim.utils.tokenize(lower=True, deacc=True)``.
3. deaccent: NFD normalize, drop combining marks (category 'Mn'),
   NFC re-normalize (gensim ``deaccent``).
4. tokens = matches of ``PAT_ALPHABETIC = (((?![\\d])\\w)+)`` (unicode):
   maximal runs of word characters whose first char is not a digit.
5. keep tokens with 2 <= len <= 15 that do not start with '_'
   (``simple_preprocess(min_len=2, max_len=15)``).

Two execution paths share this contract:

- ``reference_tokenize`` — pure Python, the oracle; also used
  driver-side for query-string tokenization (top2vec.py:2487).
- ``tokenize_udf`` — Arrow-vectorized pandas UDF for the bulk path
  (per input_hint: "no per-row Python" in the row dimension — the
  regex work is C-level via pandas ``.str`` ops on Arrow batches).

A third, JVM-only path ``sql_tokens_expr`` expresses the same
contract for ASCII-lowercase corpora entirely in Spark SQL functions
(whole-stage codegen, zero Python) — used when the corpus is known
ASCII (e.g. the driver `documents` fixture) and as the DuckDB-oracle
bridge.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from top2vec_spark.config import MAX_TOKEN_LEN, MIN_TOKEN_LEN

# gensim.parsing.preprocessing.RE_TAGS
RE_TAGS = re.compile(r"<([^>]+)>", re.UNICODE)
# gensim.utils.PAT_ALPHABETIC
PAT_ALPHABETIC = re.compile(r"(((?![\d])\w)+)", re.UNICODE)
# Single-pass vectorized equivalent of PAT_ALPHABETIC + the
# simple_preprocess filters (len 2..15, no leading '_'): token chars
# are non-digit word chars ([^\W\d]); boundaries assert the previous/
# next char is NOT a token char, so only maximal runs match and a
# >15-char run matches nothing (instead of a 15-char prefix).
# Equality with reference_tokenize is pinned by tests.
PAT_TOKEN_FILTERED = re.compile(
    r"(?<![^\W\d])(?!_)(?:(?!\d)\w){2,15}(?![^\W\d])", re.UNICODE
)


def strip_tags(s: str) -> str:
    """gensim ``strip_tags``: remove ``<...>`` spans."""
    return RE_TAGS.sub("", s)


def deaccent(text: str) -> str:
    """gensim ``deaccent``: NFD → drop combining marks → NFC."""
    norm = unicodedata.normalize("NFD", text)
    result = "".join(ch for ch in norm if unicodedata.category(ch) != "Mn")
    return unicodedata.normalize("NFC", result)


def reference_tokenize(document: str) -> list[str]:
    """Pure-Python reference tokenizer — the byte-identity oracle.

    Semantics of reference top2vec/top2vec.py:117-131
    (``simple_preprocess(strip_tags(document), deacc=True)``).
    """
    text = strip_tags(document)
    text = text.lower()
    text = deaccent(text)
    return [
        m.group()
        for m in PAT_ALPHABETIC.finditer(text)
        if MIN_TOKEN_LEN <= len(m.group()) <= MAX_TOKEN_LEN
        and not m.group().startswith("_")
    ]


def _tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized tokenization of a pandas Series of strings.

    pandas ``.str`` ops run the regex machinery in C over the whole
    Arrow batch; only deaccenting falls back to a per-string Python
    call when a batch actually contains non-ASCII text (checked once
    per batch, so pure-ASCII corpora never enter the Python loop).
    """
    s = texts.fillna("")
    s = s.str.replace(RE_TAGS, "", regex=True)
    s = s.str.lower()
    # Deaccent only if the batch has non-ASCII content.
    joined_is_ascii = s.str.len().eq(s.str.encode("utf-8").str.len()).all()
    if not joined_is_ascii:
        s = s.map(deaccent)
    # one C-level regex pass yields the final filtered tokens — no
    # per-token Python filter loop
    return s.str.findall(PAT_TOKEN_FILTERED)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer UDF: text -> array<string> tokens."""
    return _tokenize_series(texts)


def sql_tokens_expr(col: str | Column) -> Column:
    """JVM-side tokenizer for ASCII corpora (whole-stage codegen).

    Equivalent to the reference contract when the input is ASCII:
    strip tags, lowercase, extract runs matching ``[a-z_]+`` — gensim's
    ``PAT_ALPHABETIC`` repeats the single-char pattern ``(?!\\d)\\w``,
    so a digit TERMINATES a token; on lowercased ASCII the non-digit
    word chars are exactly ``[a-z_]``. Filter length 2..15 and leading
    '_'. Mirrors the DuckDB oracle SQL in ``__spark_entry__.oracle_sql``.
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.lower(F.regexp_replace(c, "<[^>]+>", ""))
    toks = F.regexp_extract_all(stripped, F.lit("[a-z_]+"), 0)
    return F.filter(
        toks,
        lambda t: (F.length(t) >= MIN_TOKEN_LEN)
        & (F.length(t) <= MAX_TOKEN_LEN)
        & (~t.startswith("_")),
    )


# DuckDB-side rendering of the same ASCII contract, used by oracle_sql.
DUCKDB_TOKENS_SQL = (
    "list_filter(regexp_extract_all(lower(regexp_replace({col}, '<[^>]+>', '', 'g')), "
    "'[a-z_]+'), t -> len(t) BETWEEN {min_len} AND {max_len} AND NOT starts_with(t, '_'))"
)


def duckdb_tokens_sql(col: str = "text") -> str:
    return DUCKDB_TOKENS_SQL.format(
        col=col, min_len=MIN_TOKEN_LEN, max_len=MAX_TOKEN_LEN
    )
