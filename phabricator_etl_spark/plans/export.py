"""Deterministic training-shard export: content-hash sharding + manifest.

The last step of a training-data pipeline is physically exporting the
curated corpus as N balanced, reproducible shards with an audit manifest.
The reference ships rows in fixed 500-row chunks whose membership depends
on scan order (stats.py:1004 insert_rows chunking) — fine for one MySQL
cursor, meaningless on a distributed scan. The warehouse-scale answer is
CONTENT-defined membership: shard = h(doc_id) mod N, so shard assignment is
reproducible across runs, partitionings and row orders, any worker can
route any row without coordination, and a re-export after an upstream fix
touches only the shards whose documents changed.

The manifest is the audit half: per-shard doc/token/CHARACTER counts (the
``n_chars`` column is F.length, i.e. code points, which both engines agree
on; byte counts would need octet_length and diverge from this on no
metric that matters for token accounting) plus an
order-free integrity signature (XOR of per-document content hashes — XOR
because it is commutative/associative, so executor summation order cannot
change it, and any single-document corruption flips it). Downstream
training jobs verify a shard read against the manifest row without trusting
the transport.

Scale: one narrow projection + ONE hash shuffle on the shard id (16
groups); the physical write would be `df.write.partitionBy("shard")` over
the same assignment (exercised by sink_partitioned_roundtrip — not repeated
here so the registry query measures the manifest computation, not disk).
Everything is integer-exact via the md5 hash family shared with the DuckDB
oracle (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, md5_long_sql
from ..query import Q
from ..sources.catalog import load_table as _t

N_SHARDS = 16


def export_train_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    rows = d.select(
        (md5_long(F.col("doc_id").cast("string")) % N_SHARDS).alias("shard"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        md5_long(F.concat_ws(":", F.col("doc_id").cast("string"), F.col("text"))).alias("sig"),
    )
    return (
        rows.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.expr("bit_xor(sig)").alias("xor_sig"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard")
    )


EXPORT_SHARDS_ORACLE = f"""
WITH rows AS (
  SELECT {md5_long_sql("CAST(doc_id AS VARCHAR)")} % {N_SHARDS} AS shard,
         doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens,
         {md5_long_sql("CAST(doc_id AS VARCHAR) || ':' || text")} AS sig
  FROM documents
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(bit_xor(sig) AS BIGINT) AS xor_sig,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM rows
GROUP BY shard
ORDER BY shard
"""


EXPORT_QUERIES = [
    Q(
        "export_train_shards",
        export_train_shards,
        EXPORT_SHARDS_ORACLE,
        "content-hash shard manifest: balanced reproducible export units with XOR integrity signature",
    ),
]
