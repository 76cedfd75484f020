"""Cross-engine deterministic hashing primitives.

The correctness gate runs every Spark query side-by-side with a DuckDB
oracle, so every hash used by the dedup/similarity operators must be
computable identically in BOTH engines. `xxhash64`/`hash` differ between
Spark and DuckDB; md5 does not — so the shared 60-bit integer hash is
"first 15 hex chars of md5, parsed base-16" (60 bits keeps it positive in
an int64 in both engines).

Spark side: `F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast(LongType)`.
DuckDB side: `('0x' || substr(md5(x), 1, 15))::BIGINT`.

This is the engine-agnostic analog of moonlink's splitmix64 lookup-key
hashing (reference: src/moonlink/src/storage/index/persisted_bucket_hash_map.rs:25-54)
— there the hash feeds a bucketed file index; here it feeds shingle/token
hashing, MinHash permutations, SimHash bits, and LSH bucket ids.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# 60-bit hash: positive in int64 for both engines
HEX_CHARS = 15
HASH_BITS = 4 * HEX_CHARS

# Mersenne prime 2^31 - 1: universal-hashing modulus for MinHash
# permutations. DuckDB RAISES on int64 overflow (Spark wraps, Java-style),
# so every intermediate must fit: with a,b,h' < P, a*h'+b < 2^62 — exact
# and identical in both engines.
MERSENNE_31 = (1 << 31) - 1


def hex_int(col: Column | str, chars: int = HEX_CHARS) -> Column:
    """Shared 60-bit hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, chars), 16, 10).cast("long")


def sql_hex_int(expr: str, chars: int = HEX_CHARS) -> str:
    """Shared 60-bit hash of a string expression (DuckDB oracle side)."""
    return f"(('0x' || substr(md5({expr}), 1, {chars}))::BIGINT)"


def spark_sql_hex_int(expr: str, chars: int = HEX_CHARS) -> str:
    """Shared 60-bit hash of a string expression, as a Spark SQL string —
    the F.expr twin of hex_int, for call sites that build MANY hash
    expressions (one server-side parse each instead of ~10 py4j
    round-trips per expression)."""
    return f"cast(conv(substring(md5({expr}), 1, {chars}), 16, 10) as bigint)"


def perm_coeff(kind: str, i: int, mod: int) -> int:
    """Deterministic permutation coefficient for MinHash: derived from the
    shared hash itself (no RNG, no wall clock) so Spark, DuckDB, and tests
    all regenerate the identical permutation family."""
    import hashlib

    h = int(hashlib.md5(f"moonlink-perm-{kind}-{i}".encode()).hexdigest()[:HEX_CHARS], 16)
    v = h % mod
    if kind == "a" and v == 0:  # multiplier must be non-zero
        v = 1
    return v
