"""Edge-case oracle parity for the r10 one-pass bigram-LM model build.

text_bigram_lm_score now derives unigram counts, bigram counts and |V|
from a single (token, next-token-or-null) GROUPING SETS pass: the doc-final
token of every document carries a null sentinel instead of being emitted
by a separate unigram arm. The corners that rewrite owns — single-token
docs (all-sentinel), empty-string docs (one "" token), null text (no rows),
repeated bigrams inside one doc — are absent from or incidental in the sf
fixtures, so this pins them against the same DuckDB oracle the registry
uses, on a crafted documents table.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

import __spark_entry__ as entry

DOCS = [
    (1, "a b c a b"),        # repeated bigram "a b" within one doc
    (2, "solo"),             # single token: emits only the null sentinel
    (3, ""),                 # empty string: one "" token (split semantics)
    (4, None),               # null text: contributes nothing
    (5, "a a a a"),          # self-bigram runs
    (6, "c b a"),            # shares vocabulary across docs
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


def test_bigram_lm_sentinel_edges_match_oracle(spark, tmp_path):
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
            "text": pa.array([d[1] for d in DOCS], pa.string()),
            "lang": pa.array(["en"] * len(DOCS), pa.string()),
            "source": pa.array(["test"] * len(DOCS), pa.string()),
            "n_chars": pa.array(
                [len(d[1]) if d[1] is not None else 0 for d in DOCS], pa.int64()
            ),
        }
    )
    out = str(tmp_path / "world")
    (tmp_path / "world").mkdir()
    pq.write_table(tbl, f"{out}/documents.parquet")

    spdf = entry.queries()["text_bigram_lm_score"](spark, out).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{out}/documents.parquet'")
    dpdf = con.execute(entry.oracle_sql()["text_bigram_lm_score"]).df()
    # rewrite-specific invariants before full parity: the single-token and
    # null-text docs must not appear (no scoreable bigram), doc 1's repeated
    # "a b" bigram must count twice
    scored = set(spdf["doc_id"].tolist())
    assert 2 not in scored and 4 not in scored
    assert int(spdf.loc[spdf.doc_id == 1, "n_bigrams"].iloc[0]) == 4
    assert _key(spdf) == _key(dpdf)
