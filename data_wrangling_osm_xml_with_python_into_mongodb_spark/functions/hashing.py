"""Deterministic, engine-portable hashing primitives.

Everything here is reproducible in ANSI SQL (DuckDB oracle) so that
hash-based operators (minhash, simhash, fingerprints) can be
correctness-gated, not just eyeballed.  The base primitive is
md5 -> first 15 hex chars -> int64 (60 bits), which both Spark
(``conv(substring(md5(x),1,15),16,10)``) and DuckDB
(``cast(concat('0x', substr(md5(x),1,15)) as bigint)``) compute
identically.

The per-permutation mixers are classic universal hashes
h_i(x) = (a_i * x + b_i) mod p over a 31-bit prime, with x first
reduced mod p so products stay inside int64 in every engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^31 - 1 (Mersenne prime): keeps a*x + b inside int64.
HASH_PRIME = 2_147_483_647

# Deterministic (a, b) parameters for the permutation family; generated
# once from small odd constants so both engines share them as literals.
def perm_params(n: int) -> list[tuple[int, int]]:
    params = []
    a, b = 1_103_515_245, 12_345
    for i in range(n):
        # LCG-step the seeds; force a != 0 mod p.
        a = (a * 1_103_515_245 + 12_345) % HASH_PRIME
        b = (b * 69_069 + 1) % HASH_PRIME
        params.append((a or 1, b))
    return params


def md5_int64(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative int64 (portable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_int64_sql(expr: str) -> str:
    """DuckDB SQL computing the same value as :func:`md5_int64`."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def universal_hash(x_mod_p: Column, a: int, b: int) -> Column:
    """(a * x + b) mod p for x already reduced mod p."""
    return (x_mod_p * F.lit(a) + F.lit(b)) % F.lit(HASH_PRIME)


def universal_hash_sql(x_expr: str, a: int, b: int) -> str:
    return f"(({x_expr}) * {a} + {b}) % {HASH_PRIME}"
