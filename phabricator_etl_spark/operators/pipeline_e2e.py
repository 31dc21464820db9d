"""End-to-end pretraining-corpus pipeline: the composed flagship.

The individual stages live as operators (normalize, quality, exact dedup,
decontamination, mixing); a real corpus run composes them, and the
composition has its own failure modes (stage ordering, survivor flags,
count bookkeeping). corpus_e2e_funnel runs the canonical chain

    normalize -> token-count quality gate -> exact dedup (keep min doc_id)
              -> eval-set 5-gram decontamination

over `documents` in ONE DataFrame DAG and reports the per-(lang, source)
survivor funnel — the stage-by-stage doc counts a dataset card publishes.

Scale shape: the whole chain is flags-not-filters until the final
aggregation (each stage adds a boolean column instead of materializing a
filtered copy), so Spark plans one pass over the corpus plus exactly two
narrow shuffles: the 60-bit-hash window for dedup rank and the broadcast
eval-shingle semi-join probe. Counters come out of the same aggregation
that would write the surviving shard manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..query import Q
from ..sources.catalog import load_table as _t
from ..functions.hashing import md5_long, md5_long_sql
from .corpus import EVAL_DOCS, SHINGLE_W
from .dedup import _spread

_TOKEN_RE = r"\s+"
MIN_TOKENS = 10
MAX_TOKENS = 2000


def corpus_e2e_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(_t(spark, sf_dir, "documents"))
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", " "),
            r"\s+",
            " ",
        )
    )
    base = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        "source",
        norm.alias("norm"),
        F.size(F.split(norm, _TOKEN_RE)).cast("long").alias("n_tok"),
        md5_long(norm).alias("h"),
    )
    staged = base.withColumn(
        "pass_quality", (F.col("n_tok") >= MIN_TOKENS) & (F.col("n_tok") <= MAX_TOKENS)
    )

    # Exact dedup among quality survivors: rank within identical norm-hash,
    # lowest doc_id is canonical. Non-survivors keep rank NULL (excluded).
    wdup = Window.partitionBy("pass_quality", "h").orderBy("doc_id")
    staged = staged.withColumn(
        "is_canonical",
        F.when(F.col("pass_quality"), F.row_number().over(wdup) == 1).otherwise(F.lit(False)),
    )

    # Decontamination probe: distinct normalized 5-grams of the eval slice
    # (doc_id < EVAL_DOCS) broadcast against each candidate's shingles.
    toks = F.split(F.col("norm"), _TOKEN_RE)
    shingles = F.when(
        F.size(toks) >= SHINGLE_W,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (SHINGLE_W - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, SHINGLE_W)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = staged.select("doc_id", F.explode(shingles).alias("sh"))
    eval_sh = sh.filter(F.col("doc_id") < EVAL_DOCS).select("sh").distinct()
    dirty = (
        sh.filter(F.col("doc_id") >= EVAL_DOCS)
        .join(F.broadcast(eval_sh), "sh")
        .select("doc_id")
        .distinct()
        .withColumn("is_dirty", F.lit(True))
    )
    flagged = staged.join(dirty, "doc_id", "left").withColumn(
        "survives",
        F.col("pass_quality")
        & F.col("is_canonical")
        & (F.col("doc_id") >= EVAL_DOCS)
        & F.col("is_dirty").isNull(),
    )

    return (
        flagged.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("pass_quality").cast("long")).cast("long").alias("n_quality"),
            F.sum((F.col("pass_quality") & F.col("is_canonical")).cast("long"))
            .cast("long")
            .alias("n_unique"),
            F.sum(F.col("survives").cast("long")).cast("long").alias("n_final"),
            F.sum(F.when(F.col("survives"), F.col("n_tok")).otherwise(F.lit(0)))
            .cast("long")
            .alias("final_tokens"),
        )
    )


E2E_ORACLE = rf"""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source,
         TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9\s]', ' ', 'g'),
                             '\s+', ' ', 'g')) AS norm
  FROM documents
), meta AS (
  SELECT *,
         CAST(len(regexp_split_to_array(norm, '\s+')) AS BIGINT) AS n_tok,
         {md5_long_sql('norm')} AS h
  FROM base
), staged AS (
  SELECT *,
         (n_tok >= {MIN_TOKENS} AND n_tok <= {MAX_TOKENS}) AS pass_quality,
         CASE WHEN (n_tok >= {MIN_TOKENS} AND n_tok <= {MAX_TOKENS})
              THEN ROW_NUMBER() OVER (
                     PARTITION BY (n_tok >= {MIN_TOKENS} AND n_tok <= {MAX_TOKENS}), h
                     ORDER BY doc_id) = 1
              ELSE FALSE END AS is_canonical
  FROM meta
), sh AS (
  SELECT DISTINCT doc_id, s AS sh
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - {SHINGLE_W - 2}),
                                 i -> array_to_string(t[i:i + {SHINGLE_W - 1}], ' '))) AS s
    FROM (SELECT doc_id, regexp_split_to_array(norm, '\s+') AS t FROM staged)
    WHERE len(t) >= {SHINGLE_W}
  )
), ev AS (
  SELECT DISTINCT sh FROM sh WHERE doc_id < {EVAL_DOCS}
), dirty AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (sh) WHERE s.doc_id >= {EVAL_DOCS}
), flagged AS (
  SELECT st.*,
         (st.pass_quality AND st.is_canonical AND st.doc_id >= {EVAL_DOCS}
          AND d.doc_id IS NULL) AS survives
  FROM staged st LEFT JOIN dirty d ON st.doc_id = d.doc_id
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN pass_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(SUM(CASE WHEN pass_quality AND is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(SUM(CASE WHEN survives THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
       CAST(SUM(CASE WHEN survives THEN n_tok ELSE 0 END) AS BIGINT) AS final_tokens
FROM flagged
GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# Dataset card: the summary artifact every published dataset ships with —
# composition stats (docs/chars per language and per source), duplication
# rate, and token totals, emitted as ONE long (metric, dim, value) table
# from ONE DataFrame DAG. Three independent aggregations over one scan
# lineage, unioned; each branch is the minimal shuffle for its key. The
# long key/value shape is deliberate: a card gains metrics over time without
# schema migration.
# ---------------------------------------------------------------------------


def corpus_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(_t(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
        "lang",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    toks = F.size(F.split(F.col("text"), r"\s+")).cast("long")
    by_lang = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_chars").alias("chars"), F.sum(toks).alias("tokens")
    )
    lang_long = by_lang.select(
        F.explode(
            F.array(
                F.struct(F.lit("docs_per_lang").alias("metric"), F.col("lang").alias("dim"), F.col("docs").cast("long").alias("value")),
                F.struct(F.lit("chars_per_lang").alias("metric"), F.col("lang").alias("dim"), F.col("chars").cast("long").alias("value")),
                F.struct(F.lit("tokens_per_lang").alias("metric"), F.col("lang").alias("dim"), F.col("tokens").cast("long").alias("value")),
            )
        ).alias("r")
    ).select("r.metric", "r.dim", "r.value")
    by_src = d.groupBy("source").agg(F.count(F.lit(1)).alias("docs"))
    src_long = by_src.select(
        F.lit("docs_per_source").alias("metric"),
        F.col("source").alias("dim"),
        F.col("docs").cast("long").alias("value"),
    )
    from ..functions.hashing import md5_long

    dup = d.select(md5_long(F.col("text")).alias("h")).groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    dup_long = dup.agg(
        # coalesce: SUM over an empty corpus is NULL, but the oracle's
        # COUNT(*) is 0 — the card must agree on empty input
        F.coalesce(F.sum("c"), F.lit(0)).alias("total"),
        F.count(F.lit(1)).alias("distinct_"),
    ).select(
        F.explode(
            F.array(
                F.struct(F.lit("total_docs").alias("metric"), F.lit("*").alias("dim"), F.col("total").cast("long").alias("value")),
                F.struct(F.lit("distinct_texts").alias("metric"), F.lit("*").alias("dim"), F.col("distinct_").cast("long").alias("value")),
                F.struct(
                    F.lit("duplicate_docs").alias("metric"),
                    F.lit("*").alias("dim"),
                    (F.col("total") - F.col("distinct_")).cast("long").alias("value"),
                ),
            )
        ).alias("r")
    ).select("r.metric", "r.dim", "r.value")
    return lang_long.unionByName(src_long).unionByName(dup_long).orderBy("metric", "dim")


DATASET_CARD_ORACLE = rf"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,
         CAST(n_chars AS BIGINT) AS n_chars,
         CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS toks
  FROM documents
), by_lang AS (
  SELECT lang, COUNT(*) AS docs, SUM(n_chars) AS chars, SUM(toks) AS tokens
  FROM d GROUP BY lang
), dup AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total, CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS dist
  FROM d
)
SELECT 'docs_per_lang' AS metric, lang AS dim, CAST(docs AS BIGINT) AS value FROM by_lang
UNION ALL
SELECT 'chars_per_lang', lang, CAST(chars AS BIGINT) FROM by_lang
UNION ALL
SELECT 'tokens_per_lang', lang, CAST(tokens AS BIGINT) FROM by_lang
UNION ALL
SELECT 'docs_per_source', source, CAST(COUNT(*) AS BIGINT) FROM d GROUP BY source
UNION ALL
SELECT 'total_docs', '*', total FROM dup
UNION ALL
SELECT 'distinct_texts', '*', dist FROM dup
UNION ALL
SELECT 'duplicate_docs', '*', total - dist FROM dup
ORDER BY metric, dim
"""


PIPELINE_E2E_QUERIES = [
    Q(
        "corpus_e2e_funnel",
        corpus_e2e_funnel,
        E2E_ORACLE,
        "normalize -> quality -> dedup -> decontaminate composed; survivor funnel",
    ),
    Q(
        "corpus_dataset_card",
        corpus_dataset_card,
        DATASET_CARD_ORACLE,
        "dataset-card stats (composition, tokens, dup rate) as one long-form DAG",
    ),
]
