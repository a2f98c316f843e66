"""Text-analysis expression library (north-star surface, BASELINE.json):
tokenization, n-gram shingling, portable 32-bit hashing, quality features,
and a stopword-lexicon language-ID heuristic.

Everything is built from JVM-side ``pyspark.sql.functions`` higher-order
array expressions -- no Python UDFs, so the hot path stays inside
whole-stage codegen and the same logic is mirrorable 1:1 in the DuckDB
oracle (md5 is the portable hash both engines share).

At 100 TB: all of these are embarrassingly parallel per-row projections --
no shuffle at all until an aggregation/join consumes them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny fixed lexicons for the language-ID heuristic (public stopword lists).
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "un"),
    "fr": ("le", "la", "de", "et", "un", "les", "des"),
    "de": ("der", "die", "und", "das", "von", "mit", "den"),
}


def tokenize(col: Column | str, pattern: str = " ") -> Column:
    """Whitespace tokenization to array<string>."""
    return F.split(col, pattern)


def md5_hash32(col: Column, seed: int | None = None) -> Column:
    """Portable 32-bit hash: first 8 hex digits of md5, as BIGINT.

    Chosen over xxhash64 because md5 is bit-identical in DuckDB
    (``('0x'||substr(md5(x),1,8))::UBIGINT``), making MinHash signatures
    oracle-verifiable. Seeded variants prefix ``"{seed}|"``.
    """
    s = F.concat(F.lit(f"{seed}|"), col) if seed is not None else col
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined); documents shorter than ``n``
    tokens collapse to one whole-text shingle.

    The input expression is evaluated exactly ONCE per row: ``tokens`` is
    wrapped in a single-element array and re-bound as a lambda VARIABLE
    before the per-window lambda references it. Without that binding, a
    caller passing an unmaterialized ``tokenize(text)`` puts the split
    INSIDE the window lambda, and Catalyst re-evaluates it per window --
    O(len x windows) per doc, the t04 quadratic class (r14 find: t05 on
    1 MiB docs spent minutes re-splitting; with the binding it is linear).
    Lambda-bound references also survive CollapseProject, which an
    aliased-projection fix at each callsite would not."""

    def over(ws: Column) -> Column:
        make = F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
        )
        return F.when(F.size(ws) >= n, make).otherwise(
            F.array(F.concat_ws(" ", ws))
        )

    return F.element_at(F.transform(F.array(tokens), over), 1)


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col)).cast("long")


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokenize(col))).cast("long")


def avg_token_length(col: Column | str) -> Column:
    """Mean token length: chars excluding separators / token count."""
    no_space = F.length(F.regexp_replace(col, " ", ""))
    return no_space / F.size(tokenize(col))


def stopword_hits(tokens: Column, lexicon: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda x: x.isin(*lexicon))).cast("long")


def lang_id(col: Column | str) -> Column:
    """N-gram/stopword-lexicon language guess. Deterministic tie order
    en > es > fr > de (mirrored exactly in the oracle's CASE chain)."""
    toks = tokenize(col)
    hits = {lang: stopword_hits(toks, lex) for lang, lex in LANG_LEXICONS.items()}
    order = list(LANG_LEXICONS)
    expr = None
    for i, lang in enumerate(order):
        cond = hits[lang] > 0
        for other in order[i + 1 :]:
            cond = cond & (hits[lang] >= hits[other])
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr.otherwise("unknown")


ROLLING_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
ROLLING_BASE = 31


def rolling_hash(tokens: Column) -> Column:
    """Rabin-Karp polynomial rolling hash over per-token md5 hashes:
    ``h = fold(tokens, 0, (acc, t) -> (acc*B + h32(t) mod M) mod M)``.

    Every step stays below 2^36 (``(M-1)*B + M``), safely inside exact
    int64 arithmetic. Elements are pre-reduced mod M so the DuckDB oracle's
    ``list_reduce`` (which seeds the fold with the FIRST element rather
    than 0) produces the identical sequence.
    """
    hb = F.transform(tokens, lambda t: md5_hash32(t) % F.lit(ROLLING_MOD))
    return F.aggregate(
        hb,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLLING_BASE + x) % F.lit(ROLLING_MOD),
    )


# The EXPLICIT whitespace class for normalization -- never a bare `\s`:
# Java's \s includes \x0B (vertical tab), RE2's does not, so any
# normalization that delegates its whitespace CLASS to the engine's \s
# silently diverges between Spark and DuckDB on a document containing
# \x0B (r15 ctrlchars axis -- found by the direct fingerprint probe; the
# class is written in both engines' shared hex-escape syntax and pinned
# byte-for-byte by tests/test_data_drift.py::
# test_whitespace_class_agrees_on_control_chars).
WS_CLASS = "[ \\t\\n\\x0B\\f\\r]"


def doc_fingerprint(col: Column | str, bits_hex: int = 15) -> Column:
    """Deterministic document fingerprint: 60-bit md5 prefix of the
    normalized (trimmed, space-collapsed, lowercased) text. Whitespace
    collapse uses the EXPLICIT class (see WS_CLASS), identical in both
    engines."""
    norm = F.lower(F.regexp_replace(F.trim(col), WS_CLASS + "+", " "))
    return F.conv(F.substring(F.md5(norm), 1, bits_hex), 16, 10).cast("long")
