"""Text normalization/tokenization expressions (native, UDF-free).

Shared by the dedup and text-analysis operator families. Tokenization
is a deliberate lowest-common-denominator (lowercase, split on
whitespace runs) so the DuckDB oracle can reproduce it exactly:

    spark:  split(lower(trim(text)), '\\\\s+')
    duckdb: string_split_regex(lower(trim(text)), '\\s+')
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"


def normalized_text(col: Column) -> Column:
    return F.lower(F.trim(col))


def tokens(col: Column) -> Column:
    """Whitespace tokens of the lowercased, trimmed text."""
    return F.split(normalized_text(col), TOKEN_SPLIT_RE)


def sql_tokens(expr: str) -> str:
    return f"string_split_regex(lower(trim({expr})), '\\s+')"


def word_shingles(tok: Column, n: int) -> Column:
    """n-token shingles as space-joined strings; single whole-text
    shingle if < n tokens.

    Pure Catalyst and row-local (no explode/shuffle) — and ``tok``
    appears ONLY as a higher-order-function ARGUMENT (the n slices
    zipped elementwise), never inside a lambda body: every caller
    passes the tokens() split EXPRESSION, and a lambda-bound
    ``slice(tok, i+1, n)`` would defeat Catalyst's subexpression
    elimination and re-run the split once PER SHINGLE — O(tokens^2)
    per document (the round-10 BPE finding; measured ~6x on the same
    expansion shape). The zip form evaluates ``tok`` a constant ~2n
    times per row regardless of document length.
    """
    m = F.size(tok) - (n - 1)  # shingle count when size >= n
    joined = F.slice(tok, 1, m)
    for i in range(1, n):
        joined = F.zip_with(
            joined,
            F.slice(tok, i + 1, m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(F.size(tok) >= n, joined).otherwise(
        F.array(F.concat_ws(" ", tok))
    )


def sql_word_shingles(tokens_expr: str, n: int) -> str:
    """DuckDB fragment mirroring word_shingles (1-based list slicing)."""
    return (
        f"CASE WHEN len({tokens_expr}) >= {n} THEN "
        f"list_transform(generate_series(1, len({tokens_expr}) - {n} + 1), "
        f"i -> array_to_string(({tokens_expr})[i:i+{n - 1}], ' ')) "
        f"ELSE [array_to_string({tokens_expr}, ' ')] END"
    )
