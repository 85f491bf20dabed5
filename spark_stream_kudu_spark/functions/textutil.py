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
    """n-token shingles as space-joined strings; empty array if < n tokens.

    Pure Catalyst: sequence + transform + slice, no explode — the
    shingle array stays row-local so no shuffle is introduced.
    """
    return F.when(
        F.size(tok) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tok) - n),
            lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", tok)))


def sql_word_shingles(tokens_expr: str, n: int) -> str:
    """DuckDB fragment mirroring word_shingles (1-based list slicing)."""
    return (
        f"CASE WHEN len({tokens_expr}) >= {n} THEN "
        f"list_transform(generate_series(1, len({tokens_expr}) - {n} + 1), "
        f"i -> array_to_string(({tokens_expr})[i:i+{n - 1}], ' ')) "
        f"ELSE [array_to_string({tokens_expr}, ' ')] END"
    )
