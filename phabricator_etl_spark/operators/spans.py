"""Span-level corpus operators: substring dedup, passage chunking, entropy.

Greenfield LLM-data-pipeline operators (the families Lee et al.'s
"Deduplicating Training Data Makes Language Models Better" and RAG-style
chunking pipelines run between crawl and training):

- dedup_common_spans:  cross-document duplicated word-5-gram spans — the
  exact-substring-dedup signal (which spans of a doc also occur in >= T
  other docs). The reference engine has no analog; this is the corpus
  extension family.
- corpus_chunk_sliding: sliding-window passage chunking (size/stride in
  words) — the doc -> passage explosion every retrieval index and
  long-context packing pipeline performs.
- text_word_entropy:   per-doc word-unigram Shannon entropy — the classic
  gibberish/boilerplate quality signal.

Scale design:
- dedup_common_spans is the search-engine inverted-index shape: explode
  distinct spans, ONE shuffle on the 60-bit span hash to count document
  frequency, then a broadcast-or-shuffled semi-join of the (small) common
  set back onto per-doc spans. No pairwise comparisons anywhere: the output
  is per-document duplication stats, linear in corpus size.
- corpus_chunk_sliding is a pure projection + bounded explode (n_chunks per
  doc = O(n_tokens/stride)); no shuffle at all — stays in the scan stage.
- text_word_entropy shuffles (doc_id, word) counts once; partial
  aggregation (map-side combine) bounds the shuffle by distinct words per
  doc, not token count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query import Q
from ..sources.catalog import load_table as _t
from ..functions.hashing import md5_long, md5_long_sql
from .dedup import _shingles, _shingles_sql, _spread

_TOKEN_RE = r"\s+"

SPAN_W = 5  # word span width
SPAN_MIN_DOCS = 3  # spans in >= this many distinct docs are "common"

CHUNK_SIZE = 64  # words per passage
CHUNK_STRIDE = 48  # overlap = CHUNK_SIZE - CHUNK_STRIDE


# ---------------------------------------------------------------------------
# Cross-document duplicated spans (exact-substring dedup signal).
# ---------------------------------------------------------------------------

def dedup_common_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(_t(spark, sf_dir, "documents"))
    spans = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(_shingles("text", SPAN_W)).alias("span"),
    ).select("doc_id", md5_long(F.col("span")).alias("sh"))
    # Document frequency per span hash. The common set (df >= T) is usually
    # a small fraction of all spans but CAN be huge on boilerplate-heavy
    # corpora, so it is NOT broadcast-hinted: AQE converts the tagging join
    # to broadcast at runtime when the set fits, and keeps a shuffled hash
    # join (on the same 60-bit key the DF count already shuffled on) when
    # it does not.
    common = (
        spans.groupBy("sh")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= SPAN_MIN_DOCS)
        .select("sh", F.lit(1).alias("is_common"))
    )
    tagged = spans.join(common, "sh", "left")
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.coalesce(F.col("is_common"), F.lit(0)).cast("long")).alias("n_common"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_common",
            F.floor(F.lit(1000) * F.col("n_common") / F.col("n_spans")).alias("common_ratio_x1000"),
        )
    )


COMMON_SPANS_ORACLE = f"""
WITH spans AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         {md5_long_sql('s.sp')} AS sh
  FROM documents, UNNEST({_shingles_sql('text', SPAN_W)}) AS s(sp)
), common AS (
  SELECT sh FROM spans GROUP BY sh HAVING COUNT(DISTINCT doc_id) >= {SPAN_MIN_DOCS}
), tagged AS (
  SELECT sp.doc_id, sp.sh, CASE WHEN c.sh IS NULL THEN 0 ELSE 1 END AS is_common
  FROM spans sp LEFT JOIN common c USING (sh)
)
SELECT doc_id,
       COUNT(*) AS n_spans,
       CAST(SUM(is_common) AS BIGINT) AS n_common,
       CAST(FLOOR(1000 * SUM(is_common) / COUNT(*)) AS BIGINT) AS common_ratio_x1000
FROM tagged GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Sliding-window passage chunking: size 64 words, stride 48 (16-word
# overlap). Chunk count and boundaries from pure integer arithmetic so both
# engines agree exactly; chunk identity is the md5-hash of the joined words.
# ---------------------------------------------------------------------------

def corpus_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(_t(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), _TOKEN_RE)
    n = F.size(toks)
    # n_chunks = 1 + ceil(max(0, n - SIZE) / STRIDE), exact integer form.
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - F.lit(CHUNK_SIZE), F.lit(0)) + F.lit(CHUNK_STRIDE - 1)) / F.lit(CHUNK_STRIDE)
    ).cast("int")
    base = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        toks.alias("toks"),
        n.alias("n_tokens"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_idx") * CHUNK_STRIDE + 1, CHUNK_SIZE)
    return base.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        md5_long(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


CHUNK_ORACLE = rf"""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         regexp_split_to_array(text, '\s+') AS toks,
         len(regexp_split_to_array(text, '\s+')) AS n
  FROM documents
), fan AS (
  SELECT doc_id, toks, n, UNNEST(range(0,
           1 + CAST(FLOOR((GREATEST(n - {CHUNK_SIZE}, 0) + {CHUNK_STRIDE - 1})
                          / {CHUNK_STRIDE}) AS INT))) AS chunk_idx
  FROM base
), sliced AS (
  SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         toks[(chunk_idx * {CHUNK_STRIDE} + 1):(chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE})] AS chunk
  FROM fan
)
SELECT doc_id, chunk_idx,
       CAST(len(chunk) AS BIGINT) AS chunk_tokens,
       {md5_long_sql("array_to_string(chunk, ' ')")} AS chunk_hash
FROM sliced
"""


# ---------------------------------------------------------------------------
# Word-unigram entropy: H = log2(n) - sum(c*log2(c)) / n. Computed in that
# exact algebraic form on both engines (one floating division at the end of
# an integer-weighted sum) and rounded to 4 decimals per the repo's
# floating-result convention.
# ---------------------------------------------------------------------------

def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(_t(spark, sf_dir, "documents"))
    words = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.split(F.col("text"), _TOKEN_RE)).alias("w"),
    )
    counts = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("c").cast("double") * F.log2("c")).alias("clogc"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.round(F.log2("n_tokens") - F.col("clogc") / F.col("n_tokens"), 4).alias("entropy_bits"),
        )
    )


ENTROPY_ORACLE = r"""
WITH words AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, UNNEST(regexp_split_to_array(text, '\s+')) AS w
  FROM documents
), counts AS (
  SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_distinct,
       ROUND(log2(SUM(c)) - SUM(CAST(c AS DOUBLE) * log2(c)) / SUM(c), 4) AS entropy_bits
FROM counts GROUP BY doc_id
"""


SPAN_QUERIES = [
    Q(
        "dedup_common_spans",
        dedup_common_spans,
        COMMON_SPANS_ORACLE,
        "cross-doc duplicated word-5-gram spans (exact-substring dedup signal)",
    ),
    Q(
        "corpus_chunk_sliding",
        corpus_chunk_sliding,
        CHUNK_ORACLE,
        "sliding-window passage chunking (size 64 / stride 48)",
    ),
    Q(
        "text_word_entropy",
        text_word_entropy,
        ENTROPY_ORACLE,
        "per-doc word-unigram Shannon entropy quality signal",
    ),
]
