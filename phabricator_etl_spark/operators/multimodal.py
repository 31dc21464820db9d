"""Multimodal (binary-column) plumbing: decode / feature-extract / frame-
sample over opaque ``binary`` payloads with typed metadata.

Greenfield LLM-pipeline operators (SURVEY.md §7 Phase 8). The container has
no image/audio codecs, so the DECODE step is stubbed two ways:

- ``decode_image_real`` raises NotImplementedError behind an import-try for
  Pillow — the clearly-marked production seam;
- the registered queries use a DETERMINISTIC FAKE decode (byte length,
  header bytes, fake dimensions derived from the payload hash) so the
  Spark-side plumbing — BinaryType schema, Arrow batch transfer through
  mapInPandas, multi-row frame explosion, partition-preserving shapes — is
  real and oracle-checked end to end.

Binary payloads are synthesized as utf-8 bytes of ``documents.text`` (the
driver data has no binary column); everything downstream treats them as
opaque bytes, exactly as it would JPEG/WAV buffers.

Scale: mapInPandas streams Arrow record batches through one Python worker
per core with constant memory (no collect, no per-row pickling). Decode-type
workloads are CPU-bound per row, so they scale linearly with executors; the
plan keeps them in the same stage as the scan (no shuffle before or after).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..query import Q
from ..sources.catalog import load_table as _t
from .dedup import _spread

FRAME_BYTES = 64  # fake "frame" stride for the frame-sampler


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Production decode seam: returns (width, height). Requires Pillow,
    which this container does not ship — the registered queries use the
    deterministic fake below instead."""
    try:
        from io import BytesIO

        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - codec not installed
        raise NotImplementedError("image codec not available in this environment") from exc
    with Image.open(BytesIO(payload)) as im:  # pragma: no cover
        return im.size


def _binary_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, payload binary, meta struct) — the canonical
    multimodal table shape: opaque bytes + typed metadata."""
    d = _spread(_t(spark, sf_dir, "documents"))
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
            F.lit("fake/utf8").alias("mime"),
        ).alias("meta"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("header_hex", T.StringType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
        T.StructField("origin", T.StringType()),
    ]
)


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched fake decode via mapInPandas: per payload, byte length,
    4-byte header hex, and fake dimensions derived from the byte length
    (stands in for the codec's metadata read). Runs in the scan stage —
    mapInPandas adds no shuffle."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "header_hex": payloads.map(lambda b: b[:4].hex().upper()),
                    "fake_width": n_bytes % 640 + 1,
                    "fake_height": n_bytes % 480 + 1,
                    "origin": pdf["meta"].map(lambda m: m["origin"]),
                }
            )

    return _binary_docs(spark, sf_dir).mapInPandas(decode_batches, _DECODE_SCHEMA)


MM_DECODE_ORACLE = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       substr(hex(encode(text)), 1, 8) AS header_hex,
       CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS fake_width,
       CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) AS fake_height,
       source AS origin
FROM documents
"""


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one input payload fans out to ceil(n/64) frame rows
    (mapInPandas yielding more rows than it consumes — the video-frame
    explode shape). Checksum = sum of the frame's bytes: deterministic,
    codec-free, and cheap to verify in SQL."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, sums = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for fno, off in enumerate(range(0, len(payload), FRAME_BYTES)):
                    chunk = payload[off : off + FRAME_BYTES]
                    ids.append(doc_id)
                    frame_nos.append(fno)
                    sums.append(sum(chunk))
            yield pd.DataFrame({"doc_id": ids, "frame_no": frame_nos, "frame_checksum": sums})

    return _binary_docs(spark, sf_dir).mapInPandas(sample_batches, _FRAME_SCHEMA)


# The payload is BYTES (zh docs are multi-byte utf-8), so the oracle works
# over the hex encoding — 2 hex chars per byte — rather than character substr.
MM_FRAME_ORACLE = f"""
WITH hexed AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS nb
  FROM documents
), frames AS (
  SELECT doc_id,
         CAST(unnest(range(0, CAST(ceil(nb / {FRAME_BYTES}.0) AS BIGINT))) AS BIGINT) AS frame_no,
         hx, nb
  FROM hexed
)
SELECT doc_id, frame_no,
       CAST(list_sum(list_transform(
              range(0, least({FRAME_BYTES}, nb - frame_no * {FRAME_BYTES})),
              i -> ('0x' || substr(hx, 1 + (frame_no * {FRAME_BYTES} + i) * 2, 2))::BIGINT)) AS BIGINT)
         AS frame_checksum
FROM frames
"""


def mm_modality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata rollup: the pure-JVM side of the multimodal table
    (no Python) — group by metadata fields over the binary column, proving
    binary columns flow through shuffles/aggregations untouched."""
    b = _binary_docs(spark, sf_dir)
    return (
        b.groupBy(F.col("meta.origin").alias("origin"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("payload")).cast("long").alias("total_bytes"),
            F.max(F.length("payload")).cast("long").alias("max_bytes"),
        )
        .orderBy("origin")
    )


MM_STATS_ORACLE = """
SELECT source AS origin, COUNT(*) AS n_docs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents
GROUP BY source
ORDER BY source
"""


def mm_dedup_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of opaque BINARY payloads: md5 over the raw bytes (JVM
    built-in, codegen — the hash never leaves the scan stage), then a
    per-origin duplication report. The content-addressed-storage primitive
    for multimodal corpora: identical images/audio dedupe regardless of
    file name or metadata. DuckDB oracle hashes the same byte sequence
    (md5 of the utf-8 VARCHAR == md5 of its encoded bytes)."""
    b = _binary_docs(spark, sf_dir)
    hashed = b.select(F.col("meta.origin").alias("origin"), F.md5("payload").alias("h"))
    per_hash = hashed.groupBy("origin", "h").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_hash.groupBy("origin")
        .agg(
            F.sum("c").cast("long").alias("n_payloads"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.max("c").cast("long").alias("max_dup_count"),
        )
        .orderBy("origin")
    )


MM_DEDUP_ORACLE = """
WITH per_hash AS (
  SELECT source AS origin, md5(text) AS h, COUNT(*) AS c
  FROM documents GROUP BY 1, 2
)
SELECT origin,
       CAST(SUM(c) AS BIGINT) AS n_payloads,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(MAX(c) AS BIGINT) AS max_dup_count
FROM per_hash
GROUP BY origin
ORDER BY origin
"""


MULTIMODAL_QUERIES = [
    Q("mm_decode_features", mm_decode_features, MM_DECODE_ORACLE, "Arrow-batched fake decode"),
    Q("mm_frame_sample", mm_frame_sample, MM_FRAME_ORACLE, "frame-sampling row fan-out"),
    Q("mm_modality_stats", mm_modality_stats, MM_STATS_ORACLE, "binary column + typed metadata rollup"),
    Q("mm_dedup_binary", mm_dedup_binary, MM_DEDUP_ORACLE, "content-addressed exact dedup of binary payloads"),
]
