"""Cross-engine deterministic hashing primitives.

The correctness gate runs every query on Spark AND DuckDB; any hash the two
engines compute differently (xxhash64, murmur, crc32 seeds) would fail the
value-hash compare. md5 is the one hash both engines agree on bit-for-bit, so
every hashed operator (minhash, simhash, fingerprints, LSH buckets) derives
its integers from md5 hex:

    Spark : conv(substring(md5(c), 1, 15), 16, 10) :: long
    DuckDB: ('0x' || substr(md5(c), 1, 15)) :: BIGINT

15 hex digits = 60 bits, always positive, fits a signed 64-bit long. Derived
seeded hashes stay below 2^62 so Spark's ANSI overflow checking never fires:
h is first reduced mod 2^30 before multiplying by a small seed.

At 100 TB: md5 is ~2x slower than xxhash64 per call but both are
whole-stage-codegen JVM expressions; the cost is dwarfed by the shuffle the
hash feeds. Production deployments can swap xxhash64 in behind this module
once cross-engine parity testing is no longer needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD30 = 1 << 30  # pre-reduction modulus keeping seeded products in range
MERSENNE31 = (1 << 31) - 1  # prime modulus for seeded hash families


def md5_long(c: Column | str) -> Column:
    """60-bit non-negative integer hash of a string column (Spark side)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB SQL emitting the identical integer for the same string."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def seeded_hash(c: Column, a: int, b: int) -> Column:
    """Universal-hash family member: ((a * (h mod 2^30) + b) mod p).

    Identical arithmetic on both engines; a stays < 2^20 so the product is
    < 2^50 (no int64 overflow under ANSI mode).
    """
    return (F.lit(a) * (md5_long(c) % MOD30) + F.lit(b)) % F.lit(MERSENNE31)


def seeded_hash_sql(expr: str, a: int, b: int) -> str:
    return f"(({a} * ({md5_long_sql(expr)} % {MOD30}) + {b}) % {MERSENNE31})"


def hash_seeds(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for a k-member hash family."""
    # Small odd multipliers + spread offsets; fixed so Spark and DuckDB build
    # the same family without sharing state.
    return [(1_000_003 + 2 * i * 4_099, 7_919 * (i + 1)) for i in range(k)]
