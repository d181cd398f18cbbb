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
rules. All-terms conjunction is also available as the separate
``search_documents_by_keywords_all`` API (F3).

Parenthesized GROUPS are supported and lower at parse time —
``(a b)`` groups clauses; a prefix ``-``/``NOT`` and a suffix
``^boost`` distribute multiplicatively into every member (nesting
composes: ``((a b)^2 c)^3`` weights a,b by 6 and c by 3), and a
required group (``+(a b)``, or adjacency to ``AND``) becomes a
DISJUNCTIVE must: the document must match at least one positive
scoring member (Lucene's nested-BooleanQuery match rule for a pure
should group in must position). ``field:(v1 v2)`` is Lucene field
grouping — sugar for ``field:v1 field:v2`` (same-field values OR
together; a ``-`` prefix excludes each). Documented deltas vs
Lucene's QueryParser: ``+`` and ``AND`` are rejected INSIDE a group
— an inner must clause makes the group's score conditional on a
subset of its members (Lucene scores the nested BooleanQuery only
when its inner musts match), which the engine's flat
sum-of-contributions model deliberately does not express; spell the
requirement at the top level instead (``a AND (b c)``). ``OR`` and
``NOT`` inside groups work normally.

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
phrase. A ``~N`` suffix on a QUOTED phrase (``"a b"~1``) is a sloppy
phrase — unordered span-near with DISTINCT-terms semantics
(documented delta): repeated words are deduplicated, so
``"fast fast"~0`` matches a single ``fast`` occurrence where Lucene's
SpanNearQuery would require two (see operators/positional.span_near_tf).

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


def has_wildcard(term: str) -> bool:
    """True when a bare term carries Lucene wildcard syntax (``*`` any
    run, ``?`` one char) — such atoms expand against the vocabulary
    at execution (WildcardQuery; trailing-``*``-only patterns take
    the prefix fast path)."""
    return "*" in term or "?" in term


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
    ``(lo, hi, lo_inc, hi_inc)`` with ``None`` for an open end;
    ``group`` is a must-group id: atoms sharing a group id come from
    one required ``(...)`` group and a document must match AT LEAST
    ONE of them (the disjunctive counterpart of ``must``)."""

    sign: float
    terms: tuple[str, ...]
    must: bool = False
    fuzz: int | None = None
    field: str | None = None
    slop: int | None = None
    rng: tuple | None = None
    group: int | None = None


def _parse_boost(text: str) -> float:
    """Validate and parse the number after '^'. Plain positive decimal
    only; 0 is rejected (a silent atom delete is kinder as an error)."""
    if not _BOOST_RE.match(text):
        raise ValueError(f"invalid boost '^{text}' in query")
    boost = float(text)
    if boost <= 0.0:
        raise ValueError("boost must be > 0")
    return boost



def _matching_paren(query: str, open_pos: int, limit: int) -> int:
    """Index of the ')' matching the '(' at ``open_pos``, respecting
    nesting and skipping quoted phrases (a ')' inside a phrase is
    text, not structure)."""
    depth = 0
    j = open_pos
    while j < limit:
        c = query[j]
        if c == '"':
            end = query.find('"', j + 1)
            if end < 0 or end >= limit:
                raise ValueError("unclosed quote in query")
            j = end + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return j
        j += 1
    raise ValueError("unclosed '(' in query")


def _require_span(
    atoms: list, start: int, end: int, gid: list, explicit: bool
) -> None:
    """Mark the clause spanning ``atoms[start:end]`` required — Lucene
    clause conversion: only positive scoring members are upgraded
    (prohibited members stay prohibited, filters already gate). A
    single member becomes a plain ``must``; several become one
    disjunctive must-GROUP (the document must match at least one).
    ``explicit`` distinguishes ``+(...)`` (an empty upgrade is a user
    error) from ``AND`` adjacency (Lucene silently keeps a prohibited
    neighbor prohibited)."""
    members = [
        k
        for k in range(start, end)
        if atoms[k].field is None and atoms[k].sign > 0
    ]
    if not members:
        if explicit:
            raise ValueError(
                "a required group needs at least one positive scoring atom"
            )
        return
    if all(atoms[k].must or atoms[k].group is not None for k in members):
        return  # already required (e.g. '+(a b) AND c' retro-applies)
    if len(members) == 1:
        atoms[members[0]] = atoms[members[0]]._replace(must=True)
        return
    g = gid[0]
    gid[0] += 1
    for k in members:
        atoms[k] = atoms[k]._replace(group=g)


def parse_query(query: str) -> list[Atom]:
    """Parse a query string into a flat [Atom] list (groups lower to
    sign/boost distribution + must-group ids at parse time).

    Raises ValueError on: non-string, empty/atom-less query, unclosed
    quote or paren, empty phrase ("") or group (), a bare '-' or '+',
    a '+-' combination, a malformed '^boost', or '+'/'AND' inside a
    group (documented delta — see the module docstring).
    """
    if not isinstance(query, str):
        raise ValueError("Query needs to be a string.")
    atoms: list[Atom] = []
    _parse_clauses(query, 0, len(query), 0, atoms, [0])
    if not atoms:
        raise ValueError("query contains no terms")
    return atoms


def _parse_clauses(
    query: str, i: int, limit: int, depth: int, atoms: list, gid: list
) -> None:
    """Parse one nesting level of ``query[i:limit]``, appending Atoms.
    ``depth`` > 0 means inside a group: '+' and 'AND' are rejected
    there (inner must clauses — documented delta), '(' recurses."""
    n = limit
    # pending boolean-operator state (Lucene QueryParser keywords:
    # UPPERCASE-only; lowercase 'and'/'or'/'not' stay ordinary terms)
    pending_not = False  # NOT: negate the next atom
    pending_and = False  # AND: next scoring atom becomes must
    pending_or = False  # OR: an atom must still follow
    last_span: tuple[int, int] | None = None  # previous clause's atoms

    while i < n:
        c = query[i]
        if c.isspace():
            i += 1
            continue
        # standalone UPPERCASE boolean keywords (never inside quotes:
        # the phrase branch consumes those characters wholesale)
        if c in "AON":
            j = i
            while j < n and not query[j].isspace() and query[j] != ")":
                j += 1
            word = query[i:j]
            if word in ("AND", "OR", "NOT"):
                if word == "OR":
                    # OR is the default operator — a validated no-op
                    if last_span is None or pending_not or pending_and or pending_or:
                        raise ValueError("'OR' needs an atom on both sides")
                    pending_or = True
                elif word == "NOT":
                    if pending_not:
                        raise ValueError("'NOT NOT' is not supported")
                    pending_not = True
                else:  # AND
                    if depth > 0:
                        raise ValueError(
                            "'AND' inside a group is not supported "
                            "(inner must clauses — use top-level AND)"
                        )
                    if pending_not or pending_and or pending_or:
                        raise ValueError(
                            f"'{word}' cannot follow another operator"
                        )
                    if last_span is None:
                        raise ValueError("'AND' needs an atom on both sides")
                    _require_span(atoms, *last_span, gid, explicit=False)
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
            if depth > 0:
                raise ValueError(
                    "'+' inside a group is not supported "
                    "(inner must clauses — use top-level AND)"
                )
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
        if c == ")":
            raise ValueError("unmatched ')' in query")
        if c == "(":
            close = _matching_paren(query, i, n)
            start = len(atoms)
            _parse_clauses(query, i + 1, close, depth + 1, atoms, gid)
            if len(atoms) == start:
                raise ValueError("empty group '()' in query")
            i = close + 1
            boost = 1.0
            if i < n and query[i] == "^":
                j = i + 1
                while j < n and not query[j].isspace():
                    j += 1
                boost = _parse_boost(query[i + 1 : j])
                i = j
            elif i < n and not query[i].isspace():
                raise ValueError("unexpected text after ')'")
            factor = sign * boost
            if factor != 1.0:
                for k in range(start, len(atoms)):
                    atoms[k] = atoms[k]._replace(sign=atoms[k].sign * factor)
            if must or and_must:
                _require_span(atoms, start, len(atoms), gid, explicit=must)
            last_span = (start, len(atoms))
            continue
        if c == '"':
            end = query.find('"', i + 1)
            if end < 0 or end >= n:
                raise ValueError("unclosed quote in query")
            words = query[i + 1 : end].split()
            if not words:
                raise ValueError("empty phrase in query")
            if any("*" in w or "?" in w for w in words):
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
                while j < n and not query[j].isspace() and query[j] != ")":
                    j += 1
                sign *= _parse_boost(query[i + 1 : j])
                i = j
            elif i < n and not query[i].isspace() and query[i] != ")":
                raise ValueError("unexpected text after closing quote")
            atoms.append(
                Atom(
                    sign,
                    tuple(w.lower() for w in words),
                    must or (and_must and sign > 0),
                    slop=slop,
                )
            )
            last_span = (len(atoms) - 1, len(atoms))
        else:
            j = i
            while j < n and not query[j].isspace() and query[j] != ")":
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
                    if (
                        close_pos + 1 < n
                        and not query[close_pos + 1].isspace()
                        and query[close_pos + 1] != ")"
                    ):
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
                    if any(ch in lo + hi for ch in '^~?:"[]{}()'):
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
                    last_span = (len(atoms) - 1, len(atoms))
                    i = close_pos + 1
                    continue
                if value[:1] == "(":
                    # field:(v1 v2) value group — Lucene field
                    # grouping, sugar for field:v1 field:v2 (same
                    # sign on each; same-field values OR together)
                    open_pos = i + colon + 1
                    close_pos = query.find(")", open_pos + 1, n)
                    if close_pos < 0:
                        raise ValueError(
                            f"unclosed value group on field '{field}'"
                        )
                    if close_pos + 1 < n and not query[close_pos + 1].isspace():
                        raise ValueError(
                            "unexpected text after value group"
                        )
                    vals = query[open_pos + 1 : close_pos].split()
                    if not vals:
                        raise ValueError(
                            f"empty value group on field '{field}'"
                        )
                    start = len(atoms)
                    for v in vals:
                        if any(ch in v for ch in '^~*?:"(){}[]'):
                            raise ValueError(
                                "boost/fuzzy/wildcard are not supported "
                                "on field filters"
                            )
                        atoms.append(Atom(sign, (v,), False, None, field))
                    last_span = (start, len(atoms))
                    i = close_pos + 1
                    continue
                if not value:
                    raise ValueError(f"empty value for filter field '{field}'")
                if any(ch in value for ch in "^~*?:"):
                    raise ValueError(
                        "boost/fuzzy/wildcard are not supported on field filters"
                    )
                # value kept as-typed: keyword-field exact match
                atoms.append(Atom(sign, (value,), False, None, field))
                last_span = (len(atoms) - 1, len(atoms))
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
                if "*" in word or "?" in word:
                    raise ValueError("'~' cannot combine with wildcards")
            if ("*" in word or "?" in word) and word[0] in "*?":
                # Lucene QueryParser's allowLeadingWildcard=false
                # default: a leading wildcard forces a full-vocabulary
                # regex walk with no prefix to prune on
                raise ValueError(
                    "leading wildcards are not supported "
                    "(Lucene's allowLeadingWildcard=false default)"
                )
            if "(" in word:
                raise ValueError(
                    f"'(' must start a group, not appear inside '{word}'"
                )
            atoms.append(
                Atom(sign, (word.lower(),), must or (and_must and sign > 0), fuzz)
            )
            last_span = (len(atoms) - 1, len(atoms))
            i = j
    if pending_not:
        raise ValueError("dangling 'NOT' in query")
    if pending_and or pending_or:
        raise ValueError(
            f"'{'AND' if pending_and else 'OR'}' needs an atom on both sides"
        )
