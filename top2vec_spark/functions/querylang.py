"""Minimal fulltext query language: bare terms, ``-`` negation, and
``"quoted phrases"``.

The reference exposes keyword lists (top2vec.py:2855 keywords /
keywords_neg); production fulltext engines expose a query string. This
parser maps one onto the engine's scorers:

    'spark "fast table" -slow st*'
      -> + BM25(spark)  (bag-of-words term, sign +1)
         + BM25("fast table" as ONE pseudo-term)  (exact phrase)
         - BM25(slow)   (negated term, the keywords_neg contract)
         + sum of BM25 over vocabulary terms starting with 'st'
           (trailing-* prefix expansion, Lucene PrefixQuery shape;
           expansion happens at execution against the vocab table)

Semantics are additive Lucene-style: every atom contributes its BM25
score with its sign; duplicate atoms contribute once each (a repeated
term boosts, as in Lucene). No boolean operators — conjunction is the
separate ``search_documents_by_keywords_all`` API (F3).

An atom is ``(sign, terms)``: ``len(terms) == 1`` is a bag-of-words
term (a trailing ``*`` marks it a prefix atom — the star is kept in
the term and expanded by the executor), ``> 1`` an exact consecutive
phrase; ``*`` is only legal at the end of a bare word. Parsing lowercases (the T4
query-time contract) but does NOT tokenize — each whitespace-separated
word inside a phrase must already be a vocabulary term, and the
vocabulary check happens at execution (message parity with keyword
validation).
"""

from __future__ import annotations


def parse_query(query: str) -> list[tuple[float, tuple[str, ...]]]:
    """Parse a query string into [(sign, terms)] atoms.

    Raises ValueError on: non-string, empty/atom-less query, unclosed
    quote, empty phrase (""), or a bare '-'.
    """
    if not isinstance(query, str):
        raise ValueError("Query needs to be a string.")
    atoms: list[tuple[float, tuple[str, ...]]] = []
    i = 0
    n = len(query)
    while i < n:
        c = query[i]
        if c.isspace():
            i += 1
            continue
        sign = 1.0
        if c == "-":
            sign = -1.0
            i += 1
            if i >= n or query[i].isspace():
                raise ValueError("dangling '-' in query")
            c = query[i]
        if c == '"':
            end = query.find('"', i + 1)
            if end < 0:
                raise ValueError("unclosed quote in query")
            words = query[i + 1 : end].split()
            if not words:
                raise ValueError("empty phrase in query")
            if any("*" in w for w in words):
                raise ValueError("wildcards are not supported inside phrases")
            atoms.append((sign, tuple(w.lower() for w in words)))
            i = end + 1
        else:
            j = i
            while j < n and not query[j].isspace():
                j += 1
            word = query[i:j]
            star = word.find("*")
            if star >= 0 and (star != len(word) - 1 or len(word) == 1):
                raise ValueError(
                    "'*' is only supported as a trailing wildcard on a term"
                )
            atoms.append((sign, (word.lower(),)))
            i = j
    if not atoms:
        raise ValueError("query contains no terms")
    return atoms
