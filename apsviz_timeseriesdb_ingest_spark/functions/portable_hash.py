"""Portable deterministic hashing shared by Spark and ANSI-SQL oracles.

Spark's builtin ``hash``/``xxhash64`` are Spark-specific; to make hashed
operators (MinHash, SimHash, LSH buckets) verifiable against a DuckDB
oracle we derive integers from md5 hex digests, which both engines compute
identically:

    Spark : conv(substring(md5(s), 1, 15), 16, 10) cast bigint
    DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

15 hex chars = 60 bits, always positive, no overflow ambiguity.

This is the *parity* path. At 100 TB scale you'd swap in ``F.xxhash64``
(one JVM call, no md5 string materialization) via the ``fast=`` switch —
semantics are identical, only the hash family changes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: number of leading md5 hex chars used for the 60-bit integer
HEX_CHARS = 15


def md5_hash_str(col: Column | str, seed: int | str | None = None) -> Column:
    """md5 hex digest of (optionally seed-prefixed) string column."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}|"), c)
    return F.md5(c.cast("string"))


def md5_hash64(col: Column | str, seed: int | str | None = None, *, fast: bool = False) -> Column:
    """Deterministic positive 60-bit integer hash of a string column.

    ``fast=True`` switches to xxhash64 (not oracle-comparable, ~10x cheaper;
    use in production paths where no DuckDB parity is needed).
    """
    c = F.col(col) if isinstance(col, str) else col
    if fast:
        if seed is not None:
            c = F.concat(F.lit(f"{seed}|"), c.cast("string"))
        return F.abs(F.xxhash64(c))
    return F.conv(F.substring(md5_hash_str(c, seed), 1, HEX_CHARS), 16, 10).cast("bigint")


def md5_hash64_sql(expr: str, seed: int | str | None = None) -> str:
    """The DuckDB-SQL twin of :func:`md5_hash64` (parity mode)."""
    inner = f"({expr})::VARCHAR"
    if seed is not None:
        inner = f"'{seed}|' || {inner}"
    return f"('0x' || substr(md5({inner}), 1, {HEX_CHARS}))::BIGINT"
