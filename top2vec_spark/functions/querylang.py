"""Minimal fulltext query language: bare terms, ``-`` negation,
``+`` required clauses, ``"quoted phrases"``, trailing-``*``
prefixes, ``~N`` fuzzy terms, ``field:value`` filters, and
``^boost`` weights.

The reference exposes keyword lists (top2vec.py:2855 keywords /
keywords_neg); production fulltext engines expose a query string. This
parser maps one onto the engine's scorers:

    'spark "fast table"^2 -slow st*^0.5'
      -> + BM25(spark)  (bag-of-words term, sign +1)
         + 2 * BM25("fast table" as ONE pseudo-term)  (boosted phrase)
         - BM25(slow)   (negated term, the keywords_neg contract)
         + 0.5 * sum of BM25 over vocabulary terms starting with 'st'
           (trailing-* prefix expansion, Lucene PrefixQuery shape;
           expansion happens at execution against the vocab table)

Semantics are additive Lucene-style: every atom contributes its BM25
score scaled by its sign (= ±1 × boost); duplicate atoms contribute
once each (a repeated term boosts, as in Lucene). A ``+`` prefix
(``+spark``, ``+"fast table"``, ``+st*``) marks the atom REQUIRED:
it scores exactly like the bare atom, but only documents matching
every ``+`` atom appear in the result — Lucene must-clause semantics
(``+`` and ``-`` cannot combine; bare atoms remain pure-OR
should-clauses).

UPPERCASE ``AND`` / ``OR`` / ``NOT`` keywords are accepted with
Lucene QueryParser semantics (lowercase forms stay ordinary terms):
``OR`` is the default operator (a validated no-op), ``NOT x`` ==
``-x``, and ``a AND b`` upgrades BOTH neighbors to must clauses —
prohibited (``-``) neighbors stay prohibited and filter atoms are
left as-is (they always gate), exactly Lucene's clause-conversion
rules. There is no grouping: parentheses are not supported
(documented delta); all-terms conjunction is also available as the
separate ``search_documents_by_keywords_all`` API (F3).

A ``~`` suffix on a bare word (``sprk~``, ``sprk~1``) marks the atom
FUZZY — Lucene FuzzyQuery shape: the executor expands it against the
vocabulary by Levenshtein edit distance (``~`` alone means distance
2, Lucene's default; explicit ``~0``/``~1``/``~2`` allowed, > 2
rejected exactly as Lucene's LevenshteinAutomata does), and each
expansion contributes sign x boost x BM25 like a prefix expansion.
Delta vs Lucene: classic Levenshtein (no transposition — Lucene's
``transpositions=true`` default counts 'ab'->'ba' as 1 edit, we
count 2) because Spark's ``levenshtein`` and DuckDB's
``levenshtein`` both implement the classic metric, which keeps the
oracle replay exact. ``~`` cannot combine with ``*`` or appear on a
phrase.

A ``field:value`` word (``lang:en``, ``-source:spam``) is a FILTER
atom — Lucene/Elasticsearch filter-context semantics: it never
scores, it gates the result set. Values on the SAME field OR
together; different fields AND together; ``-field:value`` excludes.
Boost/fuzzy/star/``+`` are rejected on filters (a filter is already
a must). The value is matched EXACTLY (case preserved, not
lowercased) — keyword-field semantics, the Elasticsearch norm — so
the comparison stays a plain column predicate that pushes into the
metadata parquet scan (a lower()/contains wrap would defeat
PushedFilters and force a full metadata read at 10^12 docs). Delta
vs Lucene: Lucene scores ``field:value`` term queries in should
context; filter context (constant-score gating) is the production
faceted-search norm and is what this language means.

An atom is ``(sign, terms)``: ``len(terms) == 1`` is a bag-of-words
term (a trailing ``*`` marks it a prefix atom — the star is kept in
the term and expanded by the executor), ``> 1`` an exact consecutive
phrase; ``*`` is only legal at the end of a bare word. A trailing
``^<number>`` (after the closing quote / the star) multiplies the
atom's sign — Lucene boost syntax; the number must be a plain
positive decimal (``2``, ``0.5``, ``2.5`` — no exponents/inf/nan, so
the weight survives bit-identical through SQL oracles). Parsing
lowercases (the T4 query-time contract) but does NOT tokenize — each
whitespace-separated word inside a phrase must already be a
vocabulary term, and the vocabulary check happens at execution
(message parity with keyword validation).
"""

from __future__ import annotations

import re
from typing import NamedTuple

_BOOST_RE = re.compile(r"^(?:\d+(?:\.\d+)?|\.\d+)$")
_FIELD_RE = re.compile(r"^[a-z_][a-z0-9_]*$")


class Atom(NamedTuple):
    """One parsed query atom. ``sign`` is ±1 × boost, ``terms`` is one
    bag-of-words/prefix term or a >1-word phrase, ``must`` marks a
    Lucene ``+``-required clause: the atom still scores normally, but
    only documents matching EVERY must atom appear in the result
    (bare atoms stay pure-OR, the Lucene should-clause default).
    ``fuzz`` (0-2) marks a fuzzy term expanded by Levenshtein distance
    at execution; ``field`` marks a non-scoring metadata filter whose
    single value is ``terms[0]`` (sign -1 = exclusion); ``slop`` on a
    phrase marks it a sloppy phrase (unordered span-near with that
    slop); ``rng`` on a filter atom is a range filter
    ``(lo, hi, lo_inc, hi_inc)`` with ``None`` for an open end."""

    sign: float
    terms: tuple[str, ...]
    must: bool = False
    fuzz: int | None = None
    field: str | None = None
    slop: int | None = None
    rng: tuple | None = None


def _parse_boost(text: str) -> float:
    """Validate and parse the number after '^'. Plain positive decimal
    only; 0 is rejected (a silent atom delete is kinder as an error)."""
    if not _BOOST_RE.match(text):
        raise ValueError(f"invalid boost '^{text}' in query")
    boost = float(text)
    if boost <= 0.0:
        raise ValueError("boost must be > 0")
    return boost


def parse_query(query: str) -> list[Atom]:
    """Parse a query string into [Atom(sign, terms, must)] atoms.

    Raises ValueError on: non-string, empty/atom-less query, unclosed
    quote, empty phrase (""), a bare '-' or '+', a '+-' combination,
    or a malformed '^boost'.
    """
    if not isinstance(query, str):
        raise ValueError("Query needs to be a string.")
    atoms: list[Atom] = []
    i = 0
    n = len(query)
    # pending boolean-operator state (Lucene QueryParser keywords:
    # UPPERCASE-only; lowercase 'and'/'or'/'not' stay ordinary terms)
    pending_not = False  # NOT: negate the next atom
    pending_and = False  # AND: next scoring atom becomes must
    pending_or = False  # OR: an atom must still follow

    def _retro_must() -> None:
        # AND retro-applies must to the PREVIOUS atom — Lucene keeps
        # prohibited (-) clauses prohibited and filters already gate,
        # so only a positive scoring atom is upgraded
        if not atoms:
            raise ValueError("'AND' needs an atom on both sides")
        last = atoms[-1]
        if last.field is None and last.sign > 0:
            atoms[-1] = last._replace(must=True)

    while i < n:
        c = query[i]
        if c.isspace():
            i += 1
            continue
        # standalone UPPERCASE boolean keywords (never inside quotes:
        # the phrase branch consumes those characters wholesale)
        if c in "AON":
            j = i
            while j < n and not query[j].isspace():
                j += 1
            word = query[i:j]
            if word in ("AND", "OR", "NOT"):
                if word == "OR":
                    # OR is the default operator — a validated no-op
                    if not atoms or pending_not or pending_and or pending_or:
                        raise ValueError("'OR' needs an atom on both sides")
                    pending_or = True
                elif word == "NOT":
                    if pending_not:
                        raise ValueError("'NOT NOT' is not supported")
                    pending_not = True
                else:  # AND
                    if pending_not or pending_and or pending_or:
                        raise ValueError(
                            f"'{word}' cannot follow another operator"
                        )
                    _retro_must()
                    pending_and = True
                i = j
                continue
        sign = 1.0
        must = False
        if pending_not:
            pending_not = False
            if c == "-" or c == "+":
                raise ValueError("'NOT' cannot combine with '-' or '+'")
            sign = -1.0
            # fall through: the atom parses normally with sign flipped
        if c == "+":
            must = True
            i += 1
            if i >= n or query[i].isspace():
                raise ValueError("dangling '+' in query")
            c = query[i]
            if c == "-":
                raise ValueError("'+' and '-' cannot combine on one atom")
        if c == "-":
            sign = -1.0
            i += 1
            if i >= n or query[i].isspace():
                raise ValueError("dangling '-' in query")
            c = query[i]
            if c == "+":
                raise ValueError("'+' and '-' cannot combine on one atom")
        # AND upgrades this atom to must — unless it is prohibited
        # (Lucene keeps MUST_NOT) or a filter (filters always gate)
        and_must = pending_and
        pending_and = False
        pending_or = False  # an atom follows — the OR is satisfied
        if c == '"':
            end = query.find('"', i + 1)
            if end < 0:
                raise ValueError("unclosed quote in query")
            words = query[i + 1 : end].split()
            if not words:
                raise ValueError("empty phrase in query")
            if any("*" in w for w in words):
                raise ValueError("wildcards are not supported inside phrases")
            i = end + 1
            slop = None
            if i < n and query[i] == "~":
                j = i + 1
                while j < n and query[j].isdigit():
                    j += 1
                if j == i + 1:
                    raise ValueError(
                        "phrase slop needs an explicit number"
                        ' (e.g. "a b"~2)'
                    )
                slop = int(query[i + 1 : j])
                i = j
            if i < n and query[i] == "^":
                j = i + 1
                while j < n and not query[j].isspace():
                    j += 1
                sign *= _parse_boost(query[i + 1 : j])
                i = j
            elif i < n and not query[i].isspace():
                raise ValueError("unexpected text after closing quote")
            atoms.append(
                Atom(
                    sign,
                    tuple(w.lower() for w in words),
                    must or (and_must and sign > 0),
                    slop=slop,
                )
            )
        else:
            j = i
            while j < n and not query[j].isspace():
                j += 1
            word = query[i:j]
            colon = word.find(":")
            if colon >= 0:
                # field:value filter atom — no boost/fuzzy/star/must
                field, value = word[:colon], word[colon + 1 :]
                if not _FIELD_RE.match(field):
                    raise ValueError(f"invalid filter field '{field}'")
                if must:
                    raise ValueError(
                        "'+' is redundant on a field filter (filters always gate)"
                    )
                if value[:1] in ("[", "{"):
                    # field:[lo TO hi] range filter — the bounds may
                    # span whitespace, so re-scan the raw query for the
                    # closing bracket (Lucene range syntax: [] = both
                    # ends inclusive, {} exclusive, mixed allowed, '*'
                    # = open end)
                    open_pos = i + colon + 1
                    close_pos = -1
                    for jj in range(open_pos + 1, n):
                        if query[jj] in "]}":
                            close_pos = jj
                            break
                    if close_pos < 0:
                        raise ValueError(
                            f"unclosed range bracket on field '{field}'"
                        )
                    if close_pos + 1 < n and not query[close_pos + 1].isspace():
                        raise ValueError(
                            "unexpected text after range bracket"
                        )
                    body = query[open_pos + 1 : close_pos]
                    parts = body.split(" TO ")
                    if len(parts) != 2:
                        raise ValueError(
                            f"range on field '{field}' must be "
                            "[lo TO hi] (uppercase TO)"
                        )
                    lo, hi = parts[0].strip(), parts[1].strip()
                    if not lo or not hi:
                        raise ValueError(
                            f"empty range bound on field '{field}' "
                            "(use '*' for an open end)"
                        )
                    if any(ch in lo + hi for ch in '^~:"[]{}'):
                        raise ValueError(
                            f"invalid character in range bound on "
                            f"field '{field}'"
                        )
                    if ("*" in lo and lo != "*") or ("*" in hi and hi != "*"):
                        raise ValueError(
                            "'*' in a range bound must stand alone "
                            "(open end)"
                        )
                    rng = (
                        None if lo == "*" else lo,
                        None if hi == "*" else hi,
                        query[open_pos] == "[",
                        query[close_pos] == "]",
                    )
                    atoms.append(
                        Atom(sign, (), False, None, field, rng=rng)
                    )
                    i = close_pos + 1
                    continue
                if not value:
                    raise ValueError(f"empty value for filter field '{field}'")
                if any(ch in value for ch in "^~*:"):
                    raise ValueError(
                        "boost/fuzzy/wildcard are not supported on field filters"
                    )
                # value kept as-typed: keyword-field exact match
                atoms.append(Atom(sign, (value,), False, None, field))
                i = j
                continue
            caret = word.find("^")
            if caret >= 0:
                if caret == 0:
                    raise ValueError("dangling '^' in query")
                sign *= _parse_boost(word[caret + 1 :])
                word = word[:caret]
            fuzz = None
            tilde = word.find("~")
            if tilde >= 0:
                if tilde == 0:
                    raise ValueError("dangling '~' in query")
                suffix = word[tilde + 1 :]
                if suffix == "":
                    fuzz = 2  # Lucene's bare-~ default
                elif suffix in ("0", "1", "2"):
                    fuzz = int(suffix)
                else:
                    raise ValueError(
                        f"invalid fuzzy distance '~{suffix}' (0, 1 or 2)"
                    )
                word = word[:tilde]
                if "*" in word:
                    raise ValueError("'~' cannot combine with '*'")
            star = word.find("*")
            if star >= 0 and (star != len(word) - 1 or len(word) == 1):
                raise ValueError(
                    "'*' is only supported as a trailing wildcard on a term"
                )
            atoms.append(
                Atom(sign, (word.lower(),), must or (and_must and sign > 0), fuzz)
            )
            i = j
    if pending_not:
        raise ValueError("dangling 'NOT' in query")
    if pending_and or pending_or:
        raise ValueError(
            f"'{'AND' if pending_and else 'OR'}' needs an atom on both sides"
        )
    if not atoms:
        raise ValueError("query contains no terms")
    return atoms
