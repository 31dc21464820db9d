"""Full-text retrieval operators: BM25 ranking and positional phrase match.

The retrieval side of a training-data platform (reference scope: the corpus
QUERY operators a user of a 100 TB document store runs daily — "find the
documents about X", "find exact phrase occurrences"). Spark-first shapes:

- BM25 top-k:      the classic probabilistic ranking function (Robertson &
                   Spärck Jones / Okapi BM25, public literature) expressed as
                   two aggregations + one broadcast of the (tiny) query-term
                   statistics. The corpus-side posting list shuffles once on
                   term; document lengths ride along as an integer column.
- phrase match:    positional inverted index — posexplode gives (term, pos);
                   a phrase of length n becomes an n-way self-equi-join on
                   (doc_id, pos + offset). Spark executes hash joins keyed on
                   doc_id+position; no regex scan over the raw text at query
                   time, which is the point of a positional index at scale.

Zero Python UDFs; every expression is whole-stage-codegen. Both queries are
fully SQL-expressible, so they carry exact DuckDB oracles.

Scale notes:
- BM25: df/idf statistics for the query terms are a handful of rows —
  broadcast. The per-(doc, term) tf aggregation is the only big shuffle and
  it is keyed on (doc_id, term): uniform, no skew. Final top-k is a single
  ORDER BY ... LIMIT k — Spark executes TakeOrderedAndProject (per-partition
  partial top-k, then a k-row driver merge), never a full sort.
- Phrase match: each join leg filters to ONE term before joining, so the
  joined relations are posting lists (tiny fraction of the corpus), not the
  full token stream. At 100 TB this is the difference between scanning
  everything and touching two posting lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query import Q
from ..sources.catalog import load_table as _t
from .dedup import _spread

_TOKEN_RE = r"\s+"

# Fixed query-term sets: deterministic (no runtime randomness) and present in
# the synthetic documents vocabulary at every SF.
BM25_QUERY_TERMS = ["data", "spark", "vector", "stream"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20

# Bigram of two high-frequency words from the synthetic vocabulary (the
# generator draws uniformly from a fixed word list, so any common-word pair
# occurs at every SF).
PHRASE = ["table", "value"]


def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k document ranking for a fixed term-set query.

    score(d) = Σ_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)).

    Output is (rank, doc_id, n_terms_matched, score-rounded-to-4): ranking is
    computed on the full-precision expression identically on both engines;
    only the displayed score is rounded (cross-engine hash convention, see
    query.py docstring).
    """
    scored = _bm25_scored(spark, sf_dir)
    return (
        scored.orderBy(F.desc("score_full"), F.asc("doc_id"))
        .limit(BM25_TOP_K)
        .select(
            "doc_id",
            "n_terms_matched",
            F.round(F.col("score_full"), 4).alias("bm25"),
        )
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_terms_matched, score_full) for every matching document —
    the shared scoring core consumed by the plain top-k and the hybrid
    re-rank."""
    d = _spread(_t(spark, sf_dir, "documents"))

    # (doc_id, term, tf) for query terms only + per-doc length. Filtering to
    # the query terms BEFORE the groupBy keeps the shuffle at posting-list
    # size. r10 (guide §2.3/§2.4): document length is size(split(text)) — a
    # narrow per-row projection — NOT an aggregation over the exploded token
    # stream. The previous form localCheckpointed every token of every
    # document (a corpus-token-sized materialization) and shuffled it whole
    # for the dl groupBy; both disappear. Semantics are identical: split on
    # non-null text always yields >= 1 element (so COUNT(*) over its explode
    # == size), and null-text docs are excluded from dl exactly as explode
    # emitted no rows for them.
    dl = d.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split(F.col("text"), _TOKEN_RE)).cast("long").alias("dl"),
    )
    tf = (
        d.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(F.split(F.col("text"), _TOKEN_RE)).alias("term"),
        )
        .filter(F.col("term").isin(BM25_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = d.count()  # parquet-metadata count; a literal in the plan
    # df per query term: ≤ len(BM25_QUERY_TERMS) rows — broadcast side.
    dfx = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    per_term = (
        tf.join(F.broadcast(dfx), "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            "term",
            (
                idf
                * (F.col("tf") * F.lit(BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(BM25_K1)
                    * (
                        F.lit(1.0 - BM25_B)
                        + F.lit(BM25_B) * F.col("dl") / F.lit(1.0) / _avgdl_col(dl)
                    )
                )
            ).alias("s"),
        )
    )
    # Fixed-order float addition: SUM() order differs between engines (not
    # associative in IEEE double), so instead pivot the ≤4 per-term scores
    # into columns (each a single row per doc) and add them left-to-right —
    # bit-identical on both engines.
    term_cols = [
        F.max(F.when(F.col("term") == t, F.col("s"))).alias(f"s{i}")
        for i, t in enumerate(BM25_QUERY_TERMS)
    ]
    pivoted = per_term.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_matched"), *term_cols
    )
    score = F.lit(0.0)
    for i in range(len(BM25_QUERY_TERMS)):
        score = score + F.coalesce(F.col(f"s{i}"), F.lit(0.0))
    return pivoted.select("doc_id", "n_terms_matched", score.alias("score_full"))


def _avgdl_col(dl: DataFrame):
    """Average document length as a broadcast scalar subquery.

    Computed as exact-integer sum/count then divided once — the same single
    division happens in the oracle, so the double is bit-identical.
    """
    row = dl.agg(
        F.sum("dl").cast("long").alias("s"), F.count(F.lit(1)).cast("long").alias("c")
    ).collect()[0]
    if not row["c"]:  # empty corpus: avgdl never reaches a score (no postings)
        return F.lit(0.0)
    return F.lit(float(row["s"]) / float(row["c"]))


def _bm25_scored_ctes() -> str:
    """The WITH-clause body producing `scored(doc_id, n_terms_matched,
    score_full)` — shared by the top-k oracle and the hybrid-rerank oracle."""
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    pivot_cols = ",\n         ".join(
        f"MAX(CASE WHEN term = '{t}' THEN s END) AS s{i}"
        for i, t in enumerate(BM25_QUERY_TERMS)
    )
    fixed_sum = "0.0"
    for i in range(len(BM25_QUERY_TERMS)):
        fixed_sum = f"({fixed_sum} + COALESCE(s{i}, 0.0))"
    return rf"""tok AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         unnest(regexp_split_to_array(text, '\s+')) AS term
  FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), stats AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl FROM dl
), nd AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ({terms}) GROUP BY doc_id, term
), dfx AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), per_term AS (
  SELECT tf.doc_id, tf.term,
         LN(1.0 + (nd.n - dfx.df + 0.5) / (dfx.df + 0.5))
           * (tf.tf * {BM25_K1 + 1.0})
           / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl.dl / 1.0 / stats.avgdl))
           AS s
  FROM tf
  JOIN dfx USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats CROSS JOIN nd
), pivoted AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
         {pivot_cols}
  FROM per_term GROUP BY doc_id
), scored AS (
  -- fixed-order addition, matching the Spark side exactly (see docstring)
  SELECT doc_id, n_terms_matched, {fixed_sum} AS score_full FROM pivoted
)"""


def _bm25_oracle() -> str:
    return f"""
WITH {_bm25_scored_ctes()}
SELECT doc_id, n_terms_matched, ROUND(score_full, 4) AS bm25
FROM scored
ORDER BY score_full DESC, doc_id
LIMIT {BM25_TOP_K}
"""


HYBRID_SHORTLIST = 50
HYBRID_TOP_K = 10
HYBRID_QUERY_VEC_ID = 0  # the query embedding: a fixed corpus vector
EMB_SCALE = 10_000  # fixed-point quantization (shared repo convention)


def search_hybrid_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: lexical BM25 shortlist → dense embedding re-rank —
    the standard two-stage search architecture (cheap sparse recall, exact
    dense precision on a bounded candidate set).

    Stage 1 takes the top-50 BM25 documents; stage 2 joins their embeddings
    (doc_id == vec_id in the synthetic corpus; documents without a vector
    simply can't be re-ranked — inner join) and scores an exact int64 dot
    product against a fixed query vector, broadcast as 64 literals. The
    expensive dense scoring touches 50 rows, never the corpus — which is the
    entire point of the architecture at 100 TB.
    """
    shortlist = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("score_full"), F.asc("doc_id"))
        .limit(HYBRID_SHORTLIST)
        .select("doc_id", "n_terms_matched", F.round("score_full", 4).alias("bm25"))
    )
    e = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("doc_id"),
        F.transform(
            F.col("embedding"), lambda x: F.round(x.cast("double") * EMB_SCALE).cast("long")
        ).alias("qe"),
    )
    qrows = e.filter(F.col("doc_id") == HYBRID_QUERY_VEC_ID).collect()
    if not qrows:  # empty corpus: no query vector, no rerank (== oracle)
        return spark.createDataFrame(
            [], "doc_id long, n_terms_matched long, bm25 double, dot_q long"
        )
    qvec = [int(v) for v in qrows[0]["qe"]]
    qlit = F.array(*[F.lit(v) for v in qvec])
    dot = F.aggregate(
        F.zip_with(F.col("qe"), qlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        shortlist.join(e, "doc_id")
        .select("doc_id", "n_terms_matched", "bm25", dot.alias("dot_q"))
        .orderBy(F.desc("dot_q"), F.asc("doc_id"))
        .limit(HYBRID_TOP_K)
    )


def _hybrid_oracle() -> str:
    return f"""
WITH {_bm25_scored_ctes()}, short AS (
  SELECT doc_id, n_terms_matched, ROUND(score_full, 4) AS bm25
  FROM scored ORDER BY score_full DESC, doc_id LIMIT {HYBRID_SHORTLIST}
), e AS (
  SELECT CAST(vec_id AS BIGINT) AS doc_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {EMB_SCALE}) AS BIGINT)) AS qe
  FROM embeddings
), q AS (
  SELECT qe AS qv FROM e WHERE doc_id = {HYBRID_QUERY_VEC_ID}
), pairs AS (
  SELECT s.doc_id, CAST(generate_subscripts(e.qe, 1) AS BIGINT) AS i, unnest(e.qe) AS v
  FROM short s JOIN e USING (doc_id)
), qtok AS (
  SELECT CAST(generate_subscripts(qv, 1) AS BIGINT) AS i, unnest(qv) AS qv_i FROM q
), dot AS (
  SELECT doc_id, SUM(v * qv_i) AS dot_q FROM pairs JOIN qtok USING (i) GROUP BY doc_id
)
SELECT s.doc_id, s.n_terms_matched, s.bm25, CAST(d.dot_q AS BIGINT) AS dot_q
FROM short s JOIN dot d USING (doc_id)
ORDER BY d.dot_q DESC, s.doc_id
LIMIT {HYBRID_TOP_K}
"""


def search_phrase_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase occurrence counting via a positional inverted index.

    posexplode(tokens) -> (doc_id, pos, term); the 2-term phrase
    (``PHRASE = ['table', 'value']``) matches wherever posting(PHRASE[0])
    holds a position p with p+1 in posting(PHRASE[1]) — evaluated as an
    in-row intersection of the per-document posting-list arrays.
    Output: per-document occurrence count + first match position, for every
    document containing the phrase at least once.
    """
    d = _spread(_t(spark, sf_dir, "documents"))
    # r10 (guide §2.3/§2.4): ONE tokenization pass and ONE posting-list-sized
    # shuffle. The previous form filtered the un-materialized position stream
    # twice (two full corpus scans+tokenizations, one per phrase term) and
    # self-joined the posting lists (a second shuffle). Now the per-term
    # posting lists are built per document in a single conditional
    # aggregation (map-side partial combine) and intersected in-place with
    # array functions: a position p matches when p+1 appears in the
    # second-term list — exactly the join predicate, and positions are
    # unique per doc so the counts are identical.
    pos = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(F.split(F.col("text"), _TOKEN_RE)).alias("pos", "term"),
    ).filter(F.col("term").isin(PHRASE))
    lists = pos.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.when(F.col("term") == PHRASE[0], F.col("pos")))
        ).alias("p0s"),
        F.array_sort(
            F.collect_list(F.when(F.col("term") == PHRASE[1], F.col("pos")))
        ).alias("p1s"),
    )
    matches = F.filter(
        F.col("p0s"), lambda p: F.array_contains(F.col("p1s"), p + F.lit(1))
    )
    return (
        lists.select(
            "doc_id",
            F.size(matches).cast("long").alias("n_occurrences"),
            F.element_at(matches, 1).cast("long").alias("first_pos"),
        )
        .filter(F.col("n_occurrences") > 0)
        .orderBy("doc_id")
    )


def _phrase_oracle() -> str:
    return rf"""
WITH tok AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         unnest(regexp_split_to_array(text, '\s+')) AS term,
         CAST(generate_subscripts(regexp_split_to_array(text, '\s+'), 1) AS BIGINT) - 1 AS pos
  FROM documents
), a AS (
  SELECT doc_id, pos AS p0 FROM tok WHERE term = '{PHRASE[0]}'
), b AS (
  SELECT doc_id, pos AS p1 FROM tok WHERE term = '{PHRASE[1]}'
)
SELECT a.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MIN(a.p0) AS BIGINT) AS first_pos
FROM a JOIN b ON a.doc_id = b.doc_id AND b.p1 = a.p0 + 1
GROUP BY a.doc_id
ORDER BY a.doc_id
"""


SEARCH_QUERIES = [
    Q(
        "search_bm25_topk",
        search_bm25_topk,
        _bm25_oracle(),
        "Okapi BM25 top-20 ranking for a fixed 4-term query (broadcast term stats)",
    ),
    Q(
        "search_phrase_positions",
        search_phrase_positions,
        _phrase_oracle(),
        "exact-phrase match via positional posting-list intersection",
    ),
    Q(
        "search_hybrid_rerank",
        search_hybrid_rerank,
        _hybrid_oracle(),
        "two-stage hybrid retrieval: BM25 shortlist → exact-int dense re-rank",
    ),
]
