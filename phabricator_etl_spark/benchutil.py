"""Shared measurement discipline for the bench harnesses.

Both bench.py (per-round sf0.1) and tools/scale_bench.py (sf1..sf30 curve)
repeat queries min-of-N in controlled sessions. Two session-model caches
complicate that:

- clustering._FIT_CACHE  — the k-means Lloyd fit (kmeans_cells owns it;
  ann_ivf_kmeans / dedup_semantic_kmeans reuse it: documented layering)
- dedup._POSTINGS_CACHE  — the shingle postings index

Min-of-N must NOT let a repeat reuse a model the timed query itself built
(the recorded number would silently become "apply with a warm model"), but
a query DOWNSTREAM of a model it didn't build must keep seeing the
pre-populated cache at every repeat. Snapshot/rollback gives both: evict
only the keys added since the snapshot. The r8 advisor found the contended
-retry rerun skipping this reset entirely (its rep 0 measured with the
first run's warm model under a '+fit-included' tag) — hence rollback now
runs before EVERY rep, including rep 0 of a rerun, where it is a no-op on
the very first attempt and a cold-start reset on any later one.
"""

from __future__ import annotations

# Queries whose registry number deliberately isolates the APPLY stage of a
# model that ANOTHER query builds. A measurement harness running such a
# query in a session where the dep has not run must execute the dep UNTIMED
# first, or the cell silently flips to fit-included and round-over-round /
# cross-SF comparisons mix methodologies (the r6 SCALE_BENCH artifact
# recorded exactly that: dedup_semantic_kmeans 14.5x on a 3.33x step
# because one cell was warm-model and the other cold-fit).
WARM_DEPS: dict[str, str] = {
    "dedup_semantic_kmeans": "kmeans_cells",
    "ann_ivf_kmeans": "kmeans_cells",
}


def model_caches() -> list[dict]:
    from .operators import clustering, dedup

    return [clustering._FIT_CACHE, dedup._POSTINGS_CACHE]


def cache_snapshot() -> list[set]:
    return [set(c) for c in model_caches()]


def cache_rollback(snap: list[set]) -> None:
    """Evict cache keys ADDED since the snapshot, keep pre-existing ones."""
    for cache, before in zip(model_caches(), snap):
        for key in [k for k in cache if k not in before]:
            del cache[key]
