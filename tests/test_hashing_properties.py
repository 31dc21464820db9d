"""Property-based tests (hypothesis) for the pure-Python twins of the
cross-engine primitives: the Morton interleave and the seeded md5 hash
family. These twins are what the oracles embed literally (JL sign matrix,
CMS probe buckets), so their algebraic properties ARE correctness
surface — a bug here would corrupt both engines identically and pass every
cross-engine hash compare.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from phabricator_etl_spark.functions.hashing import MERSENNE31, MOD30, hash_seeds

U16 = st.integers(min_value=0, max_value=(1 << 16) - 1)


def _py_morton(p: int, s: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((p >> i) & 1) << (2 * i + 1)
        z |= ((s >> i) & 1) << (2 * i)
    return z


def _demorton(z: int, bits: int = 16) -> tuple[int, int]:
    p = s = 0
    for i in range(bits):
        p |= ((z >> (2 * i + 1)) & 1) << i
        s |= ((z >> (2 * i)) & 1) << i
    return p, s


@given(U16, U16)
def test_morton_is_a_bijection(p, s):
    assert _demorton(_py_morton(p, s)) == (p, s)


@given(U16, U16, U16, U16)
def test_morton_is_monotone_on_shared_prefixes(p1, s1, p2, s2):
    # if (p1,s1) dominates (p2,s2) coordinate-wise it cannot have a smaller
    # z-value unless they are equal — the partial-order compatibility that
    # makes min/max z-range stats usable for rectangle pruning
    if p1 >= p2 and s1 >= s2 and (p1, s1) != (p2, s2):
        assert _py_morton(p1, s1) > _py_morton(p2, s2) or not (
            p1 == p2 or s1 == s2
        )  # strict dominance along an axis forces strict z increase
        if p1 == p2 or s1 == s2:
            assert _py_morton(p1, s1) > _py_morton(p2, s2)


@given(st.integers(min_value=0, max_value=3), st.integers(min_value=0, max_value=3))
def test_aligned_tiles_are_contiguous(ti, tj):
    # every 2^k-aligned square tile maps to one contiguous z-range (k=4)
    k = 4
    zs = sorted(
        _py_morton(ti * (1 << k) + di, tj * (1 << k) + dj)
        for di in range(1 << k)
        for dj in range(1 << k)
    )
    assert zs[-1] - zs[0] == len(zs) - 1


@given(st.text(max_size=64))
@settings(max_examples=200)
def test_seeded_family_stays_in_range(s):
    h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    for a, b in hash_seeds(8):
        v = (a * (h % MOD30) + b) % MERSENNE31
        assert 0 <= v < MERSENNE31
        # no int64 overflow before the modulus (the ANSI-mode guarantee)
        assert a * (h % MOD30) + b < 1 << 62


def test_hash_seeds_are_distinct_and_stable():
    s1, s2 = hash_seeds(16), hash_seeds(16)
    assert s1 == s2
    assert len(set(s1)) == 16
