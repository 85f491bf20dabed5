"""Deterministic, engine-portable hashing expressions.

The dedup family (MinHash, SimHash, fingerprinting) needs a hash that
is (a) computed JVM-side as native Catalyst expressions — no Python
worker in the hot path — and (b) reproducible in ANSI SQL so the DuckDB
oracle can verify results. Spark's ``F.hash`` (murmur3) fails (b), so
the portable primitive here is the first 8 hex chars of md5 as an
unsigned 32-bit int:

    spark:  conv(substr(md5(s), 1, 8), 16, 10)::long
    duckdb: CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)

Universal-hash family for MinHash: h_k(x) = (a_k * x + b_k) mod p with
p = 2^61 - 1 (Mersenne prime) and a_k, b_k derived deterministically
from the seed index — a*x stays under 2^63 because x < 2^32 and
a < 2^30, so no overflow in either engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Keep a*x below 2^63: x < 2^32 (md5_int32), a < 2^30.
MERSENNE_P = (1 << 61) - 1
_A_MULT = 1_103_515_245  # < 2^31; classic LCG multiplier
_B_MULT = 12_345


def md5_int32(col: Column) -> Column:
    """Unsigned 32-bit int from the md5 prefix of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_k, b_k) pairs for the universal hash family.

    Same arithmetic is embedded in the oracle SQL, so the coefficients
    must be plain integer functions of k.
    """
    out = []
    for k in range(num_hashes):
        a = (_A_MULT * (k + 1) + 17) % (1 << 30) | 1  # odd, < 2^30
        b = (_B_MULT * (k + 1) + 7) % MERSENNE_P
        out.append((a, b))
    return out


def sql_md5_int32(expr: str) -> str:
    """DuckDB SQL fragment equivalent of md5_int32."""
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"
