"""Edge-case oracle parity for the r11 one-pass corpus rewrites.

corpus_pmi_collocations now derives unigram counts, bigram counts and N
from a single (token, next-token-or-null) GROUPING SETS pass (the r10
text_bigram_lm_score move), and corpus_oov_rate derives the vocabulary and
the per-language coverage from a single (lang, w) aggregation. The corners
those rewrites own — single-token docs (all-sentinel), empty-string docs
(one "" token), null text (no rows), repeated bigrams, a vocabulary larger
than VOCAB_K with count ties at the cut — are absent from or incidental in
the sf fixtures, so this pins them against the same DuckDB oracles the
registry uses, on a crafted documents table.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

import __spark_entry__ as entry

# PMI_MIN_COUNT = 5 and VOCAB_K = 20: "a b" repeats >= 5 times so one
# bigram clears the PMI floor; 22 distinct filler words (f01..f22) push the
# vocabulary past K so the OOV arm is non-trivial, with a count tie at the
# vocab boundary (every filler appears exactly once -> the w ASC tiebreak
# decides the cut, same rule both engines).
DOCS = [
    (1, "a b a b a b a b a b", "en"),  # repeated bigram, clears PMI_MIN_COUNT
    (2, "solo", "en"),                 # single token: only the null sentinel
    (3, "", "de"),                     # empty string: one "" token
    (4, None, "de"),                   # null text: contributes nothing
    (5, "a a a a a a", "de"),          # self-bigram runs
    (6, "f01 f02 f03 f04 f05 f06 f07 f08 f09 f10 f11", "en"),
    (7, "f12 f13 f14 f15 f16 f17 f18 f19 f20 f21 f22", "fr"),
]


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NULL" if math.isnan(v) else repr(float(v))
    return repr(v)


def _key(pdf):
    cols = sorted(pdf.columns)
    return [
        tuple(_norm(v) for v in t)
        for t in sorted(pdf[cols].itertuples(index=False, name=None))
    ], cols


def _world(tmp_path) -> str:
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
            "text": pa.array([d[1] for d in DOCS], pa.string()),
            "lang": pa.array([d[2] for d in DOCS], pa.string()),
            "source": pa.array(["test"] * len(DOCS), pa.string()),
            "n_chars": pa.array(
                [len(d[1]) if d[1] is not None else 0 for d in DOCS], pa.int64()
            ),
        }
    )
    out = str(tmp_path / "world")
    (tmp_path / "world").mkdir()
    pq.write_table(tbl, f"{out}/documents.parquet")
    return out


def _oracle(out: str, name: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{out}/documents.parquet'")
    return con.execute(entry.oracle_sql()[name]).df()


def test_pmi_onepass_edges_match_oracle(spark, tmp_path):
    out = _world(tmp_path)
    spdf = entry.queries()["corpus_pmi_collocations"](spark, out).toPandas()
    # rewrite-specific invariant before full parity: exactly two bigrams
    # clear PMI_MIN_COUNT — ("a","b") x5 from doc 1 and the self-bigram
    # ("a","a") x5 from doc 5 — ranked by the exact rational (N=40:
    # 40*5/(11*5) > 40*5/(11*11)); the sentinel rows (doc-final tokens)
    # and sub-threshold bigrams must not leak
    assert [(r.x, r.y, r.cxy) for r in spdf.itertuples()] == [
        ("a", "b", 5),
        ("a", "a", 5),
    ]
    assert _key(spdf) == _key(_oracle(out, "corpus_pmi_collocations"))


def test_oov_onepass_edges_match_oracle(spark, tmp_path):
    out = _world(tmp_path)
    spdf = entry.queries()["corpus_oov_rate"](spark, out).toPandas()
    # rewrite-specific invariants: per-lang token totals are count-weighted
    # sums over the (lang, w) aggregate — en = 10 + 1 + 11, de = 1 + 6
    # (null text contributes nothing; "" is a real token), fr = 11
    got = {r.lang: (r.n_tokens, r.n_oov) for r in spdf.itertuples()}
    assert got["en"][0] == 22 and got["de"][0] == 7 and got["fr"][0] == 11
    assert _key(spdf) == _key(_oracle(out, "corpus_oov_rate"))
