"""Text-analysis operators over the ``documents`` table.

Greenfield LLM-training-pipeline operators (no reference counterpart; scoped
in SURVEY.md §7 Phase 8): token statistics, heuristic language ID, quality
scoring, and document fingerprinting. All pure JVM-side expressions — zero
Python UDFs — so they stay inside whole-stage codegen and scale linearly with
input splits: every query here is a single narrow projection (+ one shuffle
when aggregating), the shape that survives 100 TB untouched.

Cross-engine conventions follow query.py: exact integer outputs, doubles only
when derived from exact integer ratios, md5-based hashing (functions/hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query import Q
from ..sources.catalog import load_table as _t
from ..operators.dedup import _spread
from .hashing import md5_long_sql

# Tokenization: split on whitespace runs. Spark split(col, '\\s+') and DuckDB
# regexp_split_to_array(col, '\s+') agree (verified: no empty tokens on runs).
_TOKEN_RE = r"\s+"

# Marker stopwords per language for the n-gram-free heuristic language ID.
# Deterministic scoring: occurrence count of marker tokens; ties broken by
# the fixed order below (first wins).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and"],
    "es": ["el", "la", "de", "y"],
    "fr": ["le", "la", "de", "et"],
    "de": ["der", "die", "und", "das"],
    "zh": ["的", "了", "是", "在"],
}

FINGERPRINT_MOD = 1 << 31


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.col(col), _TOKEN_RE)


def _token_in(markers: list[str]):
    # single-arg lambda factory: a default-arg lambda would look like a
    # two-arg (value, index) HOF callback to F.filter
    return lambda t: t.isin(*markers)


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + length stats: one narrow projection, no shuffle."""
    d = _spread(_t(spark, sf_dir, "documents"))
    toks = _tokens()
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        # exact int/int ratio in double: bit-identical across engines
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("distinct_ratio"),
        F.length(F.regexp_replace("text", r"[^.,!?;:]", "")).cast("long").alias("n_punct"),
    )


TOKEN_STATS_ORACLE = r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS n_distinct_tokens,
       CAST(len(list_distinct(regexp_split_to_array(text, '\s+'))) AS DOUBLE)
           / len(regexp_split_to_array(text, '\s+')) AS distinct_ratio,
       CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS BIGINT) AS n_punct
FROM documents
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: marker-token occurrence counts, argmax with a
    fixed tie order. Pure expressions — the per-language score columns are
    computed in one pass over the token array (no explode, no shuffle)."""
    d = _spread(_t(spark, sf_dir, "documents"))
    toks = _tokens()
    scored = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("lang").alias("lang_true"),
        *[
            F.size(F.filter(toks, _token_in(markers))).alias(f"score_{lang}")
            for lang, markers in LANG_MARKERS.items()
        ],
    )
    langs = list(LANG_MARKERS)
    # argmax via strict-> comparison chain: first language whose score beats
    # all later ones; ties resolve to the earlier language in LANG_MARKERS.
    best = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        later = [f"score_{x}" for x in langs[langs.index(lang) + 1 :]]
        cond = None
        for x in later:
            c = F.col(f"score_{lang}") >= F.col(x)
            cond = c if cond is None else (cond & c)
        best = F.when(cond, F.lit(lang)).otherwise(best)
    return scored.select(
        "doc_id",
        "lang_true",
        best.alias("lang_pred"),
        F.greatest(*[F.col(f"score_{x}") for x in langs]).cast("long").alias("best_score"),
    )


def _lang_id_oracle() -> str:
    score = {
        lang: f"len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t IN ({', '.join(repr(m) for m in markers)})))"
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    pred = repr(langs[-1])
    for lang in reversed(langs[:-1]):
        later = langs[langs.index(lang) + 1 :]
        cond = " AND ".join(f"s_{lang} >= s_{x}" for x in later)
        pred = f"CASE WHEN {cond} THEN '{lang}' ELSE {pred} END"
    scores_sql = ",\n       ".join(f"{expr} AS s_{lang}" for lang, expr in score.items())
    greatest = ", ".join(f"s_{x}" for x in langs)
    return f"""
WITH scored AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang AS lang_true,
       {scores_sql}
  FROM documents
)
SELECT doc_id, lang_true, {pred} AS lang_pred,
       CAST(greatest({greatest}) AS BIGINT) AS best_score
FROM scored
"""


LANG_ID_ORACLE = _lang_id_oracle()


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring with exact integer arithmetic: length component
    (capped), vocabulary-diversity component, punctuation penalty. The score
    is an integer so the cross-engine compare is bit-exact."""
    d = _spread(_t(spark, sf_dir, "documents"))
    toks = _tokens()
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_punct = F.length(F.regexp_replace("text", r"[^.,!?;:]", ""))
    length_comp = F.least(F.length("text"), F.lit(500)) / F.lit(5)  # 0..100
    diversity_comp = F.round(F.lit(100.0) * n_distinct / n_tokens)  # 0..100
    punct_pen = F.least(n_punct * F.lit(5), F.lit(50))
    score = (F.floor(length_comp) + diversity_comp - punct_pen).cast("long")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        score.alias("quality_score"),
        (score >= 100).alias("keep"),
    )


QUALITY_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(text, '\s+')) AS n_tokens,
         len(list_distinct(regexp_split_to_array(text, '\s+'))) AS n_distinct,
         length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct,
         length(text) AS n_chars
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(floor(least(n_chars, 500) / 5)
            + round(100.0 * n_distinct / n_tokens)
            - least(n_punct * 5, 50) AS BIGINT) AS quality_score,
       (floor(least(n_chars, 500) / 5)
            + round(100.0 * n_distinct / n_tokens)
            - least(n_punct * 5, 50)) >= 100 AS keep
FROM t
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: polynomial rolling hash over the token stream,
    h <- (h * 31 + md5_long(token) mod 2^30) mod 2^31. F.aggregate folds the
    token array left-to-right inside codegen — same fold order as DuckDB's
    list_reduce, so the fingerprints agree exactly."""
    d = _spread(_t(spark, sf_dir, "documents"))
    toks = _tokens()
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda h, t: (h * F.lit(31) + F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % F.lit(1 << 30))
        % F.lit(FINGERPRINT_MOD),
    )
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        fp.alias("fingerprint"),
    )


FINGERPRINT_ORACLE = rf"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(regexp_split_to_array(text, '\s+'),
                          t -> {md5_long_sql('t')} % {1 << 30})),
         (h, x) -> (h * 31 + x) % {FINGERPRINT_MOD}
       ) AS fingerprint
FROM documents
"""


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition signals — the Gopher-class quality filter
    (Rae et al. 2021 §A1.1: documents dominated by a repeated n-gram are
    boilerplate/spam): per doc, the duplicate-token fraction and the
    coverage of the single most frequent bigram, both as exact x1000
    integers.

    Shape at scale: one explode -> (doc_id, bigram) count -> per-doc MAX.
    Both aggregations hash-partition on doc_id (the explode output is
    already doc-local), partial-aggregate map-side, and the result is one
    row per doc — linear shuffle, no window, no skew risk beyond document
    length itself (bounded upstream by ingest-side truncation)."""
    d = _spread(_t(spark, sf_dir, "documents"))
    toks = _tokens()
    base = d.select(F.col("doc_id").cast("long").alias("doc_id"), toks.alias("toks"))
    stats = base.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    )
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(" ", F.element_at("toks", i), F.element_at("toks", i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top_bg = (
        base.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    return (
        stats.join(top_bg, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.lit(1000.0) * (F.col("n_tokens") - F.col("n_distinct")) / F.col("n_tokens"))
            .cast("long")
            .alias("dup_token_x1000"),
            F.coalesce(
                F.round(F.lit(1000.0) * F.lit(2) * F.col("top_c") / F.col("n_tokens")).cast("long"),
                F.lit(0),
            ).alias("top_bigram_x1000"),
        )
    )


REPETITION_ORACLE = r"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         regexp_split_to_array(text, '\s+') AS toks
  FROM documents
), stats AS (
  SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct FROM t
), bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bg
  FROM t
), top AS (
  SELECT doc_id, MAX(c) AS top_c
  FROM (SELECT doc_id, bg, COUNT(*) AS c FROM bi GROUP BY 1, 2)
  GROUP BY 1
)
SELECT s.doc_id,
       CAST(round(1000.0 * (n_tokens - n_distinct) / n_tokens) AS BIGINT) AS dup_token_x1000,
       COALESCE(CAST(round(1000.0 * 2 * top_c / n_tokens) AS BIGINT), 0) AS top_bigram_x1000
FROM stats s LEFT JOIN top USING (doc_id)
"""


def text_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: decile-bucket the corpus by the integer quality
    score (easy→hard ordering for curriculum-style training schedules).

    ntile over a TOTAL order — (quality_score, doc_id) — so bucket boundaries
    are deterministic across engines even where scores tie. One global sort
    is acceptable for a decile assignment; at 100 TB swap the window for
    approx-percentile cutpoints broadcast as a CASE (noted so the operator's
    scale path is explicit), which drops the sort entirely.
    """
    from pyspark.sql import Window

    scored = text_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    w = Window.orderBy(F.asc("quality_score"), F.asc("doc_id"))
    return (
        scored.withColumn("bin", F.ntile(10).over(w).cast("long"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("quality_score").cast("long").alias("min_score"),
            F.max("quality_score").cast("long").alias("max_score"),
        )
        .orderBy("bin")
    )


CURRICULUM_ORACLE = rf"""
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(text, '\s+')) AS n_tokens,
         len(list_distinct(regexp_split_to_array(text, '\s+'))) AS n_distinct,
         length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct,
         length(text) AS n_chars
  FROM documents
), scored AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(floor(least(n_chars, 500) / 5)
              + round(100.0 * n_distinct / n_tokens)
              - least(n_punct * 5, 50) AS BIGINT) AS quality_score
  FROM t
), binned AS (
  SELECT quality_score,
         NTILE(10) OVER (ORDER BY quality_score, doc_id) AS bin
  FROM scored
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(quality_score) AS BIGINT) AS min_score,
       CAST(MAX(quality_score) AS BIGINT) AS max_score
FROM binned
GROUP BY bin
ORDER BY bin
"""




# ---------------------------------------------------------------------------
# Bigram language-model quality scoring: train add-one-smoothed bigram
# probabilities ON THE CORPUS ITSELF, then score each document's average
# negative log-likelihood — the model-based quality filter (high NLL = the
# document doesn't look like the corpus), with no external model needed.
#
# Float determinism: ln() is implementation-defined in the last ulp and a
# SUM's order differs between engines, so per-bigram NLL is QUANTIZED to
# integer MILLI-nats (floor(-1e3*ln p)) and summed as exact int64 —
# order-free; only the final displayed average divides. The quantizer grid
# is deliberately coarse: floor() flips between engines only when
# -SCALE*ln(p) lands within ~1 ulp of an integer, and that probability is
# proportional to SCALE (absolute ulp of SCALE*14 nats). At 1e3 the
# per-bigram flake odds are ~2e-12 — negligible even at 1e9 bigrams —
# where 1e6 would reach percent-level odds at corpus scale. The residual
# risk is documented, not zero: a bit-exact alternative would rank on the
# exact rational (cb+1, cw+V) pairs, at the cost of no longer being an NLL.
#
# Scale: unigram/bigram count tables are vocabulary-sized — broadcast; the
# scoring pass is one explode + two broadcast joins + one doc_id
# aggregation. Linear, no corpus self-join anywhere.
#
# Model build is ONE corpus pass (r10): a (w1, next-token-or-null) stream
# aggregated by GROUPING SETS ((w1), (w1, w2)) yields unigram counts (every
# token appears exactly once as w1, the doc-final token with a null w2),
# bigram counts (the (w1, w2) set minus the null-w2 sentinel groups) and
# |V| (group count of the (w1) set) from ONE scan+tokenize+aggregate —
# replacing three separate corpus arms. The aggregate is materialized with
# localCheckpoint because plan sharing cannot do it: Catalyst pushes each
# consumer's gid/null filter through the aggregate onto the Expand output
# (grouping keys are filter-pushable), specializing all three subtrees so
# neither ReusedExchange nor AQE stage reuse ever fires (verified in the
# r10 plan capture). The checkpointed relation is model-sized — the same
# distinct-unigram + distinct-bigram rows the un-materialized plan
# broadcast TWICE — not corpus-sized, and it stays stats-free so join
# strategy against it remains AQE's runtime-size decision (the no-forced-
# broadcast rule below).
# ---------------------------------------------------------------------------


def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(_t(spark, sf_dir, "documents"))
    toks = _tokens()
    # F.get is 0-based and null-on-out-of-bounds (ANSI-safe), so element i
    # pairs with its successor and the doc-final token gets a null sentinel.
    pair_stream = d.select(
        F.explode(
            F.transform(
                toks,
                lambda x, i: F.struct(x.alias("w1"), F.get(toks, i + 1).alias("w2")),
            )
        ).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    model = (
        pair_stream.groupingSets([["w1"], ["w1", "w2"]], "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"), F.grouping_id().alias("gid"))
        .localCheckpoint(eager=True)
    )
    # gid bit set = column ABSENT from the grouping set: (w1) -> 1, (w1, w2) -> 0
    uni = model.filter(F.col("gid") == 1).select(
        F.col("w1").alias("w"), F.col("c").alias("cw")
    )
    # |V| for add-one smoothing as a broadcast 1-row scalar (one job, the
    # sanctioned pattern) instead of an eager driver .count()
    vocab = uni.agg(F.count(F.lit(1)).cast("long").alias("vs"))
    big_counts = model.filter((F.col("gid") == 0) & F.col("w2").isNotNull()).select(
        "w1", "w2", F.col("c").alias("cb")
    )
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"), F.element_at(toks, i + 1).alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    doc_bi = d.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.explode(bigrams).alias("b")
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    p = (F.col("cb") + 1).cast("double") / (F.col("cw") + F.col("vs")).cast("double")
    nll_milli = F.floor(F.lit(-1_000.0) * F.log(p)).cast("long")
    # NO forced broadcast on the count tables: distinct-bigram cardinality
    # grows with the corpus (Heaps' law squared), so hinting broadcast here
    # is a scale bomb — at sf10 (500k docs, ~10k vocab) the bigram table is
    # millions of rows and the forced build side dominated wall-clock
    # (measured 250s; ~35s once AQE picks the join strategy from actual
    # runtime sizes: broadcast while small, shuffle hash join when not).
    scored = (
        doc_bi.join(big_counts, ["w1", "w2"])
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", nll_milli.alias("q"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("q").cast("long").alias("nll_milli_sum"),
            F.round(
                F.sum("q").cast("double") / (F.lit(1_000.0) * F.count(F.lit(1))), 4
            ).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


def _bigram_lm_oracle() -> str:
    return r"""
WITH tok AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, regexp_split_to_array(text, '\s+') AS t
  FROM documents
), uni AS (
  SELECT w, COUNT(*) AS cw FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w
), v AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS vs FROM uni
), big AS (
  SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS cb FROM (
    SELECT unnest(list_transform(range(1, len(t)), i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS p FROM tok
  ) GROUP BY 1, 2
), doc_bi AS (
  SELECT doc_id, p.w1, p.w2 FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS p
    FROM tok
  )
), scored AS (
  SELECT d.doc_id,
         CAST(FLOOR(-1000.0 * LN((big.cb + 1) / (uni.cw + v.vs))) AS BIGINT) AS q
  FROM doc_bi d
  JOIN big USING (w1, w2)
  JOIN uni ON uni.w = d.w1
  CROSS JOIN v
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(q) AS BIGINT) AS nll_milli_sum,
       ROUND(CAST(SUM(q) AS DOUBLE) / (1000.0 * COUNT(*)), 4) AS avg_nll
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# BPE-style pre-tokenization: the GPT-2 pre-tokenizer regex, simplified to
# the intersection of Java regex (Spark) and RE2 (DuckDB) — no lookahead
# (RE2 lacks it), ASCII classes (unicode case/category tables can differ
# between engines). Whitespace is the EXPLICIT class [ \t\n\f\r], never \s:
# Java's \s is [ \t\n\x0B\f\r] while RE2's omits vertical tab, so on text
# containing \x0b the engines would tokenize differently (r6 ADVICE) —
# spelling the class out makes \x0b a punct byte on BOTH engines.
# Token-COUNT statistics are what a training pipeline
# needs per document (sequence budgeting, packing, cost estimation); the
# merges step of real BPE is model-specific and out of scope — this is the
# deterministic, vocabulary-free prefix every BPE tokenizer shares.
# Pure codegen projection: one regexp_extract_all + array filters, no
# shuffle, no Python.
# ---------------------------------------------------------------------------

_BPE_WS = " \\t\\n\\f\\r"  # shared ASCII whitespace class — see note above
BPE_PRETOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
    rf"| ?[^A-Za-z0-9{_BPE_WS}]+|[{_BPE_WS}]+"
)
_BPE_CLASSES = {
    "n_word": r"^ ?[A-Za-z]+$",
    "n_digit": r"^ ?[0-9]+$",
    "n_punct": rf"^ ?[^A-Za-z0-9{_BPE_WS}]+$",
    "n_contraction": r"^'(s|t|re|ve|m|ll|d)$",
    "n_ws": rf"^[{_BPE_WS}]+$",
}


def text_bpe_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(_t(spark, sf_dir, "documents"))
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_PRETOKEN_RE), 0)
    base = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("n_chars"),
        toks.alias("toks"),
    )
    def _matcher(pat: str):
        # single-arg lambda factory (same reason as _token_in above: a
        # default-arg lambda reads as a two-arg (value, index) HOF callback)
        return lambda t: t.rlike(pat)

    counts = [
        F.size(F.filter(F.col("toks"), _matcher(pat))).cast("long").alias(name)
        for name, pat in _BPE_CLASSES.items()
    ]
    return base.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_pretokens"),
        *counts,
        # exact integer milli chars-per-pretoken: non-negative div == floor
        F.when(
            F.size("toks") > 0,
            F.expr("(1000 * n_chars) div size(toks)"),
        ).cast("long").alias("chars_per_token_milli"),
    )


def _bpe_oracle() -> str:
    esc = lambda p: p.replace("'", "''")  # noqa: E731 — SQL string-literal quoting
    cls = ",\n       ".join(
        f"CAST(len(list_filter(toks, t -> regexp_matches(t, '{esc(pat)}'))) AS BIGINT) AS {name}"
        for name, pat in _BPE_CLASSES.items()
    )
    return rf"""
WITH tok AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         regexp_extract_all(text, '{esc(BPE_PRETOKEN_RE)}') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_pretokens,
       {cls},
       CASE WHEN len(toks) > 0
            THEN CAST((1000 * n_chars) // len(toks) AS BIGINT)
            ELSE NULL END AS chars_per_token_milli
FROM tok
"""


# ---------------------------------------------------------------------------
# Naive-Bayes text classifier trained AND applied in-engine: the
# fasttext-style linear-filter shape every production corpus pipeline runs
# (CCNet / LLaMA quality and language filters) — a per-token weight table
# learned from labeled data, broadcast-joined against the corpus, summed per
# document. Here the label is lang == 'en' (the corpus carries its own
# labels), so train == apply corpus and the oracle needs no side model.
#
# Float determinism: same contract as the bigram LM above — each log term
# is QUANTIZED to integer milli-nats (floor(1e3 * ln p), ~2e-12 per-term
# engine-flake odds at this grid), weights and priors are exact int64 from
# there on, and the document score is an order-free integer sum.
#
# Scale: the weight table is vocabulary-sized (Heaps' law) — NO forced
# broadcast, AQE picks the join strategy from runtime sizes (the measured
# text_bigram_lm_score lesson); scoring is one explode + one join + one
# doc_id aggregation. Linear, no corpus self-join.
#
# Honest accuracy note: the driver's synthetic documents draw every lang
# from ONE shared vocabulary (a zh doc contains "the" as readily as an en
# doc), so train accuracy here is ~0.62 vs a 0.56 majority baseline — the
# corpus, not the model, is the ceiling. Learning capability is proven in
# tests/test_corpus.py::test_nb_classifier_learns_separable_corpus on a
# class-distinct-vocabulary fixture (same injected-signal pattern as the
# near-dup recall tests).
# ---------------------------------------------------------------------------

NB_POS_LANG = "en"


def text_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(_t(spark, sf_dir, "documents"))
    tok = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("lang").alias("lang_true"),
        (F.col("lang") == NB_POS_LANG).alias("pos"),
        F.explode(_tokens()).alias("w"),
    )
    cls = tok.groupBy("w").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).cast("long").alias("c0"),
    )
    # class token totals + |V| + doc-count priors: two tiny aggregates on a
    # broadcast 1-row scalar each (the sanctioned pattern, no driver count)
    totals = cls.agg(
        F.sum("c1").cast("long").alias("t1"),
        F.sum("c0").cast("long").alias("t0"),
        F.count(F.lit(1)).cast("long").alias("vs"),
    )
    priors = d.agg(
        F.sum(F.when(F.col("lang") == NB_POS_LANG, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("lang") == NB_POS_LANG, 0).otherwise(1)).cast("long").alias("n0"),
    )
    q = lambda p: F.floor(F.lit(1_000.0) * F.log(p)).cast("long")  # noqa: E731
    weights = cls.crossJoin(F.broadcast(totals)).select(
        "w",
        (
            q((F.col("c1") + 1).cast("double") / (F.col("t1") + F.col("vs")).cast("double"))
            - q((F.col("c0") + 1).cast("double") / (F.col("t0") + F.col("vs")).cast("double"))
        ).alias("wq"),
    )
    prior_q = q((F.col("n1") + 1).cast("double") / (F.col("n0") + 1).cast("double"))
    return (
        tok.join(weights, "w")
        .groupBy("doc_id", "lang_true")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("wq").cast("long").alias("evidence_milli"),
        )
        .crossJoin(F.broadcast(priors.select(prior_q.alias("pq"))))
        .select(
            "doc_id",
            "lang_true",
            "n_tokens",
            (F.col("evidence_milli") + F.col("pq")).alias("score_milli"),
            F.when(F.col("evidence_milli") + F.col("pq") >= 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("pred_pos"),
        )
    )


NB_CLASSIFIER_ORACLE = rf"""
WITH tok AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang AS lang_true,
         lang = '{NB_POS_LANG}' AS pos,
         unnest(regexp_split_to_array(text, '\s+')) AS w
  FROM documents
), cls AS (
  SELECT w,
         CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS c0
  FROM tok GROUP BY w
), totals AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS t1, CAST(SUM(c0) AS BIGINT) AS t0,
         CAST(COUNT(*) AS BIGINT) AS vs
  FROM cls
), priors AS (
  SELECT CAST(SUM(CASE WHEN lang = '{NB_POS_LANG}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN lang = '{NB_POS_LANG}' THEN 0 ELSE 1 END) AS BIGINT) AS n0
  FROM documents
), weights AS (
  SELECT w,
         CAST(FLOOR(1000.0 * LN(CAST(c1 + 1 AS DOUBLE) / CAST(t1 + vs AS DOUBLE))) AS BIGINT)
       - CAST(FLOOR(1000.0 * LN(CAST(c0 + 1 AS DOUBLE) / CAST(t0 + vs AS DOUBLE))) AS BIGINT) AS wq
  FROM cls CROSS JOIN totals
), scored AS (
  SELECT t.doc_id, t.lang_true,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(wq) AS BIGINT) AS evidence_milli
  FROM tok t JOIN weights USING (w)
  GROUP BY t.doc_id, t.lang_true
)
SELECT doc_id, lang_true, n_tokens,
       evidence_milli + pq AS score_milli,
       CAST(CASE WHEN evidence_milli + pq >= 0 THEN 1 ELSE 0 END AS BIGINT) AS pred_pos
FROM scored CROSS JOIN (
  SELECT CAST(FLOOR(1000.0 * LN(CAST(n1 + 1 AS DOUBLE) / CAST(n0 + 1 AS DOUBLE))) AS BIGINT) AS pq
  FROM priors
)
"""


TEXT_QUERIES = [
    Q("text_token_stats", text_token_stats, TOKEN_STATS_ORACLE, "token/char/punct counting"),
    Q("text_lang_id", text_lang_id, LANG_ID_ORACLE, "marker-token language ID"),
    Q("text_quality_score", text_quality_score, QUALITY_ORACLE, "integer quality scoring"),
    Q("text_fingerprint", text_fingerprint, FINGERPRINT_ORACLE, "rolling-hash fingerprint"),
    Q("text_repetition_stats", text_repetition_stats, REPETITION_ORACLE, "Gopher-style intra-doc repetition signals"),
    Q("text_curriculum_bins", text_curriculum_bins, CURRICULUM_ORACLE, "deterministic quality-decile curriculum binning"),
    Q("text_bigram_lm_score", text_bigram_lm_score, _bigram_lm_oracle(), "self-trained bigram-LM NLL quality score (integer milli-nats)"),
    Q("text_nb_classifier", text_nb_classifier, NB_CLASSIFIER_ORACLE, "in-engine naive-Bayes language classifier (train + apply, integer milli-nats)"),
    Q("text_bpe_pretokenize", text_bpe_pretokenize, _bpe_oracle(), "GPT-2-style BPE pre-tokenizer counts (cross-engine regex subset)"),
]
