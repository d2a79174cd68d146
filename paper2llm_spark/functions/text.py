"""Shared text expressions — portable between Spark SQL and DuckDB.

The driver's correctness gate runs each Spark query AND a DuckDB oracle
and hash-compares values, so every hash/shingle function here has a
byte-equal DuckDB twin (documented inline). The portable 60-bit hash is
``bigint(hex(md5(x)[:15]))``:

* Spark : ``conv(substr(md5(x), 1, 15), 16, 10) :: bigint``
* DuckDB : ``('0x' || substr(md5(x), 1, 15)) :: bigint``

15 hex digits = 60 bits keeps the value positive in a signed 64-bit int
in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash60(col: Column) -> Column:
    """60-bit md5-derived hash, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def sql_hash60(expr: str) -> str:
    """DuckDB twin of :func:`portable_hash60`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped.

    DuckDB twin: ``list_filter(string_split_regex(lower(x), '\\s+'),
    t -> length(t) > 0)``.
    """
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


SQL_TOKENS = (
    "list_filter(string_split_regex(lower({expr}), '\\s+'), t -> length(t) > 0)"
)


def word_trigrams(tokens_col: Column) -> Column:
    """Word 3-gram shingles (space-joined); < 3 tokens -> empty array.

    DuckDB twin (1-indexed lists)::

        case when len(tok) >= 3 then
          list_transform(range(1, len(tok) - 1),
                         i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])
        else [] end
    """
    return F.when(
        F.size(tokens_col) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(tokens_col, i),
                F.element_at(tokens_col, i + 1),
                F.element_at(tokens_col, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


SQL_TRIGRAMS = (
    "(case when len({tok}) >= 3 then "
    "list_transform(range(1, len({tok}) - 1), "
    "i -> {tok}[i] || ' ' || {tok}[i+1] || ' ' || {tok}[i+2]) "
    "else [] end)"
)


def word_ngrams(tokens_col: Column, n: int) -> Column:
    """Word n-gram shingles (space-joined); < n tokens -> empty array.

    Generalizes :func:`word_trigrams`; same 1-indexed `element_at`
    arithmetic so :func:`sql_ngrams` is the byte-equal DuckDB twin.
    """
    if n == 1:
        return tokens_col
    return F.when(
        F.size(tokens_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tokens_col, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def sql_ngrams(tok_expr: str, n: int) -> str:
    """DuckDB twin of :func:`word_ngrams` (1-indexed lists)."""
    if n == 1:
        return tok_expr
    joined = " || ' ' || ".join(
        f"{tok_expr}[i]" if j == 0 else f"{tok_expr}[i+{j}]" for j in range(n)
    )
    return (
        f"(case when len({tok_expr}) >= {n} then "
        f"list_transform(range(1, len({tok_expr}) - {n - 2}), i -> {joined}) "
        f"else [] end)"
    )
