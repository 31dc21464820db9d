#!/usr/bin/env python
"""Deterministic scale-factor data generator for the scale-curve bench.

The driver ships read-only testdata at sf<=0.1 (17 MB), where ~60% of every
query is fixed Spark overhead — too small to MEASURE the scale design
(VERDICT r4 "next round" #1). This generator synthesizes sf1/sf3 (and a
skewed variant) with the exact schemas of /root/testdata (TESTDATA.md),
seed-stable (numpy PCG64 seeded from (table, sf, skew) — regeneration is
bit-identical), written under /root/repo/scaledata/.

These tables are for THROUGHPUT measurement and skew-robustness tests; the
sf0.01 driver data remains the correctness gate. Value distributions mirror
the driver's generator closely enough that every registered query runs
unmodified (same dtypes, same categorical domains, same doc vocabulary,
clustered embeddings, ~5% exact + ~5% near duplicate documents).

Scale rule (rows per table at scale factor sf):
  lineitem 6,000,000*sf   orders 1,500,000*sf   customer 150,000*sf
  part 200,000*sf         supplier 10,000*sf    events 1,000,000*sf
  documents 50,000*sf     embeddings 50,000*sf  nation/region fixed

--skew adds a hot-key variant used by the skew-robustness tests:
  * orders: one customer receives HOT_FRAC of all orders
  * events: one user emits HOT_FRAC of all events
  * documents: HOT_FRAC of docs share one 8-token hot prefix (hot shingles)

Usage:
  python tools/gen_scale_data.py --sf 1
  python tools/gen_scale_data.py --sf 0.1 --skew        # skewed sf0.1
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOT_FRAC = 0.30

SEGMENTS = ["MACHINERY", "BUILDING", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD"]
STATUSES = ["P", "O", "F"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["O", "F"]
EVENT_TYPES = ["click", "signup", "purchase", "error", "view"]
PTYPE = ["ECONOMY", "SMALL", "MEDIUM", "LARGE", "PROMO", "STANDARD"]
PCOLOR = ["small", "red", "blue", "green", "large", "dim", "navy", "plum"]
PNOUN = ["ring", "widget", "bolt", "gear", "cog", "spring", "plate", "rod"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA", "FRANCE",
    "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN", "JORDAN", "KENYA",
    "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA", "ROMANIA", "SAUDI ARABIA",
    "VIETNAM", "RUSSIA", "UNITED KINGDOM", "UNITED STATES",
]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
# same working vocabulary as the driver's documents table (observed tokens)
VOCAB = [
    "a", "the", "key", "agg", "row", "scan", "slow", "fast", "table", "value",
    "part", "hash", "merge", "batch", "line", "sort", "window", "spark",
    "order", "data", "column", "join", "small", "customer", "query", "big",
    "stream", "group", "filter",
]
EMB_DIM = 64
N_LABELS = 10

EPOCH_1995 = np.datetime64("1995-01-01")
EPOCH_2024 = np.datetime64("2024-01-01")


def _rng(table: str, sf: float, skew: bool) -> np.random.Generator:
    # md5, NOT the built-in hash(): str hashing is salted per process
    # (PYTHONHASHSEED), which silently broke the "regeneration is
    # bit-identical" guarantee this module promises — data written by one
    # process could never be reproduced by another.
    import hashlib

    key = f"{table}|{round(sf * 1000)}|{skew}".encode()
    return np.random.default_rng(int.from_bytes(hashlib.md5(key).digest()[:8], "big"))


def _ts_col(days_from, epoch):
    return (epoch + days_from.astype("timedelta64[s]")).astype("datetime64[us]")


def gen_region() -> pa.Table:
    return pa.table(
        {
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": pa.array(REGIONS),
        }
    )


def gen_nation() -> pa.Table:
    return pa.table(
        {
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": pa.array(NATIONS),
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }
    )


def gen_customer(n: int, sf: float, skew: bool) -> pa.Table:
    r = _rng("customer", sf, skew)
    return pa.table(
        {
            "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
            "c_nationkey": pa.array(r.integers(0, 25, n).astype(np.int32)),
            "c_acctbal": pa.array(np.round(r.uniform(-999.99, 9999.99, n), 2)),
            "c_mktsegment": pa.array(np.array(SEGMENTS)[r.integers(0, 5, n)]),
        }
    )


def gen_supplier(n: int, sf: float, skew: bool) -> pa.Table:
    r = _rng("supplier", sf, skew)
    return pa.table(
        {
            "s_suppkey": pa.array(np.arange(n, dtype=np.int64)),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
            "s_nationkey": pa.array(r.integers(0, 25, n).astype(np.int32)),
            "s_acctbal": pa.array(np.round(r.uniform(-999.99, 9999.99, n), 2)),
        }
    )


def gen_part(n: int, sf: float, skew: bool) -> pa.Table:
    r = _rng("part", sf, skew)
    color = np.array(PCOLOR)[r.integers(0, len(PCOLOR), n)]
    noun = np.array(PNOUN)[r.integers(0, len(PNOUN), n)]
    return pa.table(
        {
            "p_partkey": pa.array(np.arange(n, dtype=np.int64)),
            "p_name": pa.array([f"{c} {w}" for c, w in zip(color, noun)]),
            "p_brand": pa.array([f"Brand#{b}" for b in r.integers(1, 26, n)]),
            "p_type": pa.array(np.array(PTYPE)[r.integers(0, len(PTYPE), n)]),
            "p_size": pa.array(r.integers(1, 51, n).astype(np.int32)),
            "p_retailprice": pa.array(np.round(r.uniform(100.0, 2000.0, n), 2)),
        }
    )


def _hot_keys(r: np.random.Generator, n: int, n_keys: int, hot: bool) -> np.ndarray:
    """Uniform keys, or HOT_FRAC of rows pinned to key 0 when hot."""
    keys = r.integers(0, n_keys, n)
    if hot:
        keys[r.random(n) < HOT_FRAC] = 0
    return keys.astype(np.int64)


def gen_orders(n: int, n_cust: int, sf: float, skew: bool) -> pa.Table:
    r = _rng("orders", sf, skew)
    days = r.integers(0, 2400 * 86400, n)
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
            "o_custkey": pa.array(_hot_keys(r, n, n_cust, skew)),
            "o_orderstatus": pa.array(np.array(STATUSES)[r.integers(0, 3, n)]),
            "o_totalprice": pa.array(np.round(r.uniform(1000.0, 500000.0, n), 2)),
            "o_orderdate": pa.array(_ts_col(days, EPOCH_1995)),
            "o_orderpriority": pa.array(np.array(PRIORITIES)[r.integers(0, 5, n)]),
        }
    )


def gen_lineitem(n: int, n_orders: int, n_part: int, n_supp: int, sf: float, skew: bool) -> pa.Table:
    r = _rng("lineitem", sf, skew)
    days = r.integers(86400, 2500 * 86400, n)
    return pa.table(
        {
            "l_orderkey": pa.array(_hot_keys(r, n, n_orders, skew)),
            "l_partkey": pa.array(r.integers(0, n_part, n).astype(np.int64)),
            "l_suppkey": pa.array(r.integers(0, n_supp, n).astype(np.int64)),
            "l_linenumber": pa.array((r.integers(1, 8, n)).astype(np.int32)),
            "l_quantity": pa.array(r.integers(1, 51, n).astype(np.float64)),
            "l_extendedprice": pa.array(np.round(r.uniform(900.0, 105000.0, n), 2)),
            "l_discount": pa.array(np.round(r.integers(0, 11, n) * 0.01, 2)),
            "l_tax": pa.array(np.round(r.integers(0, 9, n) * 0.01, 2)),
            "l_returnflag": pa.array(np.array(RETURNFLAGS)[r.integers(0, 3, n)]),
            "l_linestatus": pa.array(np.array(LINESTATUSES)[r.integers(0, 2, n)]),
            "l_shipdate": pa.array(_ts_col(days, EPOCH_1995)),
        }
    )


def gen_events(n: int, sf: float, skew: bool) -> pa.Table:
    r = _rng("events", sf, skew)
    secs = np.sort(r.integers(0, 30 * 86400 * 10**6, n))  # microseconds, 30 days
    n_users = max(150, int(150 * (n / 10_000) ** 0.5))
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array((EPOCH_2024 + secs.astype("timedelta64[us]")).astype("datetime64[us]")),
            "user_id": pa.array(_hot_keys(r, n, n_users, skew)),
            "event_type": pa.array(np.array(EVENT_TYPES)[r.integers(0, 5, n)]),
            "value": pa.array(np.round(r.uniform(0.0, 100.0, n), 3)),
            "props": pa.array([f'{{"k": {k}}}' for k in r.integers(0, 100, n)]),
        }
    )


def gen_documents(n: int, sf: float, skew: bool) -> pa.Table:
    r = _rng("documents", sf, skew)
    # Vocabulary grows with corpus size (Heaps' law): the driver's 29-token
    # vocab is fine at <=5k docs, but frozen at 50k+ docs EVERY 3-gram
    # shingle's document frequency crosses the dedup posting cap and the
    # corpus degenerates (all shingles = stopwords). Synthetic tail tokens
    # keep shingle df realistic while the 29 base words stay the head.
    tail = [f"tok{i:04d}" for i in range(max(0, n // 50 - len(VOCAB)))]
    vocab = np.array(VOCAB + tail)
    # Zipf-ish token frequencies like the driver corpus
    w = 1.0 / np.arange(1, len(vocab) + 1) ** 0.8
    w /= w.sum()
    lengths = r.integers(20, 100, n)
    texts: list[str] = []
    for i in range(n):
        toks = vocab[r.choice(len(vocab), lengths[i], p=w)]
        texts.append(" ".join(toks))
    # ~5% exact duplicates: copy an earlier doc verbatim
    n_dup = n // 20
    dup_to = r.integers(0, n, n_dup)
    dup_from = r.integers(0, n, n_dup)
    for t, s in zip(dup_to, dup_from):
        texts[t] = texts[s]
    # ~5% near-duplicates: copy with one token appended
    near_to = r.integers(0, n, n_dup)
    near_from = r.integers(0, n, n_dup)
    for t, s in zip(near_to, near_from):
        if t != s:
            texts[t] = texts[s] + " " + vocab[r.integers(0, len(vocab))]
    if skew:
        # hot 8-token prefix on HOT_FRAC of docs -> hot shingles in the
        # posting-list join (the skew the MAX_SHINGLE_DF cap must absorb)
        hot_prefix = " ".join(vocab[r.choice(len(vocab), 8, p=w)])
        for i in np.where(r.random(n) < HOT_FRAC)[0]:
            texts[i] = hot_prefix + " " + texts[i]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(np.where(r.random(n) < 0.9, "en", "xx")),
            "source": pa.array([f"src{k}" for k in r.integers(0, 20, n)]),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        }
    )


def gen_embeddings(n: int, sf: float, skew: bool) -> pa.Table:
    """Random unit vectors with non-geometric labels — matching the driver's
    measured distribution (same-label mean cosine == cross-label == 0; see
    operators/similarity.py ann_ivf_probe1 docstring) — plus ~2% injected
    true near-duplicates (copy + small noise, cos ~0.98) so near-dup
    dedup at production thresholds has real pairs to find at every SF."""
    r = _rng("embeddings", sf, skew)
    labels = r.integers(0, N_LABELS, n).astype(np.int32)
    vecs = r.normal(0.0, 1.0, (n, EMB_DIM))
    n_dup = n // 50
    dup_to = r.integers(0, n, n_dup)
    dup_from = r.integers(0, n, n_dup)
    # base vectors have norm ~sqrt(EMB_DIM)=8, so sigma=0.2 noise gives
    # relative perturbation ~0.2 => cosine ~1/sqrt(1+0.04) ~ 0.98
    vecs[dup_to] = vecs[dup_from] + r.normal(0.0, 0.2, (n_dup, EMB_DIM))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    flat = pa.array(vecs.reshape(-1), pa.float32())
    embedding = pa.FixedSizeListArray.from_arrays(flat, EMB_DIM).cast(pa.list_(pa.float32()))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": embedding,
            "label": pa.array(labels),
        }
    )


def generate(
    sf: float,
    out_dir: str,
    skew: bool = False,
    file_rows: int = 250_000,
    tables: set[str] | None = None,
) -> None:
    """file_rows: rows per output file. Tables larger than this are written
    as a DIRECTORY of part files (the shape 100 TB inputs actually have):
    multiple files = multiple scan tasks = multiple shuffle MAPPERS, which
    is what lets AQE split a skewed reduce partition (a partition written
    by a single mapper is unsplittable — splits happen at mapper
    granularity). Spark reads file and directory transparently; DuckDB
    needs a /*.parquet glob for directories (see tools/duckdb_glob)."""
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = max(100, int(10_000 * sf))
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_line = int(6_000_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = int(50_000 * sf)

    def write(name: str, tbl_fn) -> None:
        # `tables` narrows generation to the named subset (per-table PCG64
        # seeding makes each table's bytes independent of which others are
        # generated, so a subset run is bit-identical to the full run);
        # tbl_fn defers the numpy work so skipped tables cost nothing.
        if tables is not None and name not in tables:
            return
        tbl = tbl_fn()
        n = tbl.num_rows
        dest = os.path.join(out_dir, f"{name}.parquet")
        rg = min(100_000, max(10_000, n // 8 or 1))
        if n <= file_rows:
            pq.write_table(tbl, dest, row_group_size=rg)
        else:
            os.makedirs(dest, exist_ok=True)
            n_files = (n + file_rows - 1) // file_rows
            for i in range(n_files):
                pq.write_table(
                    tbl.slice(i * file_rows, file_rows),
                    os.path.join(dest, f"part-{i:05d}.parquet"),
                    row_group_size=rg,
                )
        print(f"  {name}: {n} rows")

    write("region", gen_region)
    write("nation", gen_nation)
    write("customer", lambda: gen_customer(n_cust, sf, skew))
    write("supplier", lambda: gen_supplier(n_supp, sf, skew))
    write("part", lambda: gen_part(n_part, sf, skew))
    write("orders", lambda: gen_orders(n_orders, n_cust, sf, skew))
    write("lineitem", lambda: gen_lineitem(n_line, n_orders, n_part, n_supp, sf, skew))
    write("events", lambda: gen_events(n_events, sf, skew))
    write("documents", lambda: gen_documents(n_docs, sf, skew))
    write("embeddings", lambda: gen_embeddings(n_docs, sf, skew))


def duckdb_glob(sf_dir: str, table: str) -> str:
    """Path expression DuckDB can read for a generated table (directory
    tables need an explicit glob)."""
    p = os.path.join(sf_dir, f"{table}.parquet")
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--skew", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--file-rows", type=int, default=250_000)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset to generate (bit-identical to the same "
        "tables from a full run; per-table seeding)",
    )
    a = ap.parse_args()
    tag = f"sf{a.sf:g}" + ("-skew" if a.skew else "")
    out = a.out or os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scaledata", tag)
    print(f"generating {tag} -> {out}")
    generate(
        a.sf,
        out,
        skew=a.skew,
        file_rows=a.file_rows,
        tables=set(a.tables.split(",")) if a.tables else None,
    )


if __name__ == "__main__":
    main()
