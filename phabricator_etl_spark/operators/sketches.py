"""Mergeable-sketch operators: HyperLogLog distinct and Bloom-prefilter join.

Greenfield scale-technique family: the two sketches every 100 TB pipeline
leans on, built so their results are *deterministically identical* across
Spark and DuckDB (both run the same arithmetic on the same md5-derived
integers), which lets the driver's value-hash gate verify them exactly —
something a library HLL (engine-private hashing, float register sums) can
never offer.

- sketch_hll_distinct: classic Flajolet HLL (m=256 registers) per group.
  The register sum is kept as an EXACT 64-bit integer (sum of
  2^(SCALE - rho), SCALE=53) so no floating accumulation order can differ
  between engines; the single float division at the end is bit-identical.
  Emitted next to the exact COUNT(DISTINCT) so relative error is visible in
  the result itself. At 100 TB the HLL path is one narrow shuffle of
  (group, bucket, max-rho) partial states — registers merge with MAX, the
  textbook mergeable-sketch property — while the exact side shuffles every
  distinct key.

- join_bloom_prefilter: build a 2^17-bit Bloom filter (k=3) over the small
  side's join keys with a distributed groupBy(word) -> BIT_OR aggregation,
  collect the CONSTANT-sized bitmap (2048 longs, 16 KB — model, not data;
  same justification as the k-means centroid collect) and pin it into the
  probe scan as a LITERAL-array Filter ahead of the exact confirm join. At
  100 TB this is Spark's own runtime bloom-filter join reified as an
  explicit, testable operator. The final result is exact (the confirm join
  removes false positives), so the oracle is the plain semi-join — the
  sketch must be invisible in results.

Bloom hashing uses xxhash64 (JVM codegen, no cross-engine parity needed —
the oracle never sees the filter); HLL hashing uses md5 (functions/hashing)
because its register VALUES are part of the output contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query import Q
from ..sources.catalog import load_table as _t
from ..functions.hashing import md5_long, md5_long_sql

# --- HLL parameters --------------------------------------------------------
HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
HLL_SCALE = 53  # 2^(SCALE - rho) stays an exact int64: rho <= 53, m*2^52 < 2^61
# alpha_256 * m^2 * 2^SCALE. The DuckDB oracle folds the literal expression
# left-to-right in IEEE doubles; Python folds the same expression to the
# same bits, and Spark gets that value as a double literal (an F.expr of the
# string would NOT work: Spark SQL parses `0.7213` as a DECIMAL literal and
# the decimal division rounds differently in the last ulp).
_HLL_NUM = f"(0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0 * {float(1 << HLL_SCALE):.1f}"
_HLL_NUM_VALUE = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M * float(1 << HLL_SCALE)

# --- Bloom parameters ------------------------------------------------------
BLOOM_BITS = 1 << 17  # m = 131072 bits
BLOOM_WORDS = BLOOM_BITS // 64  # 2048 longs = 16 KB bitmap
BLOOM_K = 3  # hash functions


def hll_bucket_rho(key: F.Column) -> tuple[F.Column, F.Column]:
    """(bucket, rho) register update for one key. rho = (trailing zeros of
    the hash's upper bits) + 1, derived loop-free: lsb = w & -w is an exact
    power of two, log2 of it is exact in a double."""
    h = md5_long(key)
    w = F.shiftright(h, HLL_P)
    rho = F.when(w == 0, F.lit(HLL_SCALE)).otherwise(
        (F.log2(w.bitwiseAND(-w)).cast("int") + F.lit(1)).cast("long")
    )
    return (h % HLL_M).alias("bucket"), rho.alias("rho")


def finalize_hll(regs: DataFrame, group_col: str) -> DataFrame:
    """(group, bucket, mj) registers -> per-group estimate columns. Shared
    by the batch sketch and the streaming register build (the registers ARE
    the mergeable state; finalization is the same arithmetic either way)."""
    per_group = (
        regs.withColumn("term", F.expr(f"shiftleft(1L, {HLL_SCALE} - cast(mj as int))"))
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_used"), F.sum("term").alias("s_used"))
    )
    zeros = F.lit(HLL_M) - F.col("n_used")
    # Absent registers hold rho=0 -> contribute 2^SCALE each to the scaled sum.
    s_total = F.col("s_used") + zeros * F.lit(1 << HLL_SCALE)
    est_raw = F.lit(_HLL_NUM_VALUE) / s_total.cast("double")
    estimate = F.when(
        (est_raw <= 2.5 * HLL_M) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(est_raw)
    return per_group.select(
        group_col,
        F.col("n_used").cast("long").alias("n_registers_used"),
        s_total.cast("long").alias("reg_sum_scaled"),
        # floor(x * 10^4) on bit-identical doubles is deterministic;
        # ROUND is not (Spark re-rounds via BigDecimal HALF_UP, DuckDB
        # rounds the double directly — they disagree on .xxxx5 edges).
        F.floor(estimate * 10000).cast("long").alias("hll_estimate_x10000"),
    )


def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order priority: HLL estimate next to exact."""
    bucket, rho = hll_bucket_rho(F.col("o_custkey").cast("string"))
    regs = (
        _t(spark, sf_dir, "orders")
        .select("o_orderpriority", bucket, rho)
        .groupBy("o_orderpriority", "bucket")
        .agg(F.max("rho").alias("mj"))
    )
    exact = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").cast("long").alias("exact_distinct"))
    )
    return finalize_hll(regs, "o_orderpriority").join(exact, "o_orderpriority")


HLL_ORACLE = f"""
WITH hashed AS (
  SELECT o_orderpriority, {md5_long_sql('CAST(o_custkey AS VARCHAR)')} AS h FROM orders
), rhod AS (
  SELECT o_orderpriority, h % {HLL_M} AS bucket,
         CASE WHEN (h >> {HLL_P}) = 0 THEN {HLL_SCALE}
              ELSE CAST(log2((h >> {HLL_P}) & (-(h >> {HLL_P}))) AS INT) + 1 END AS rho
  FROM hashed
), regs AS (
  SELECT o_orderpriority, bucket, MAX(rho) AS mj FROM rhod GROUP BY 1, 2
), per_group AS (
  SELECT o_orderpriority, COUNT(*) AS n_used,
         SUM((1::BIGINT) << ({HLL_SCALE} - mj))::BIGINT AS s_used
  FROM regs GROUP BY 1
), exact AS (
  SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
  FROM orders GROUP BY 1
), scored AS (
  SELECT o_orderpriority, n_used,
         s_used + ({HLL_M} - n_used) * ((1::BIGINT) << {HLL_SCALE}) AS s_total
  FROM per_group
)
SELECT s.o_orderpriority,
       CAST(s.n_used AS BIGINT) AS n_registers_used,
       CAST(s.s_total AS BIGINT) AS reg_sum_scaled,
       CAST(FLOOR((CASE WHEN ({_HLL_NUM} / CAST(s.s_total AS DOUBLE)) <= {2.5 * HLL_M}
                        AND ({HLL_M} - s.n_used) > 0
                   THEN {HLL_M}.0 * ln({HLL_M}.0 / CAST({HLL_M} - s.n_used AS DOUBLE))
                   ELSE {_HLL_NUM} / CAST(s.s_total AS DOUBLE) END) * 10000) AS BIGINT)
         AS hll_estimate_x10000,
       e.exact_distinct
FROM scored s JOIN exact e USING (o_orderpriority)
"""


def _bloom_positions(key: F.Column) -> list[F.Column]:
    """BLOOM_K bit positions in [0, BLOOM_BITS) per key (xxhash64 seeded by
    a literal second column; % then +M fixes Java's signed remainder)."""
    out = []
    for i in range(BLOOM_K):
        h = F.xxhash64(key, F.lit(i))
        out.append((h % BLOOM_BITS + BLOOM_BITS) % BLOOM_BITS)
    return out


def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of lineitems belonging to URGENT orders, with the orders->
    lineitem semi-join prefiltered by a Bloom bitmap built on the fly."""
    orders = _t(spark, sf_dir, "orders")
    keys = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")

    # Build: explode k positions -> (word, OR of masks) distributed agg, then
    # collect the bitmap to the driver. The collect is CONSTANT-sized by
    # construction — at most BLOOM_WORDS = 2048 longs (16 KB) no matter the
    # data scale — the same model-not-data justification as the k-means
    # centroid collect in operators/clustering.assign_cells. It must become
    # a literal (not a broadcast-joined row): a 1-row crossJoin carrying the
    # bitmap gives Catalyst a join to reorder, and it happily pushes the
    # exact confirm semi-join BELOW the bloom test (observed in the AQE
    # plan), executing the expensive join first and reducing the bloom to
    # dead code. A literal in a Filter is pinned to the scan stage.
    pos = keys.select(
        F.explode(F.array(*_bloom_positions(F.col("o_orderkey")))).alias("pos")
    )
    words = (
        pos.select(
            F.shiftright(F.col("pos"), 6).cast("int").alias("word"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .collect()
    )
    dense = [0] * BLOOM_WORDS
    for r in words:
        dense[r["word"]] = r["bits"]
    bloom = F.lit(dense)

    # Probe: the 3 bit tests are a codegen Filter inside the lineitem scan
    # stage — zero shuffle, no join the optimizer could move it above.
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    cond = F.lit(True)
    for i in range(BLOOM_K):
        pos = f"((xxhash64(l_orderkey, {i}) % {BLOOM_BITS} + {BLOOM_BITS}) % {BLOOM_BITS})"
        word = F.expr(f"cast({pos} div 64 as int)")
        mask = F.expr(f"shiftleft(1L, cast({pos} % 64 as int))")
        cond = cond & (F.element_at(bloom, word + 1).bitwiseAND(mask) != 0)
    survivors = li.filter(cond)

    # Exact confirm (removes false positives); AQE picks broadcast/shuffled.
    confirmed = survivors.join(keys, survivors.l_orderkey == keys.o_orderkey, "left_semi")
    return (
        confirmed.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")).alias(
                "revenue_cents"
            ),
        )
    )


BLOOM_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""


# --- Histogram quantile sketch --------------------------------------------
HIST_BINS = 256
QUANTILES = [(500, "p50"), (950, "p95"), (990, "p99")]  # per-mille


def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram quantile sketch per l_returnflag.

    The warehouse-standard percentile sketch: B fixed-width bins over a
    shared domain; per-group state is an integer count vector that merges
    by addition (map-side combinable — the whole sketch is ONE groupBy of
    (group, bin) counts). Quantile estimates interpolate linearly inside
    the covering bin. All arithmetic is integer cents until one final
    division, so Spark and DuckDB agree bit-for-bit — a determinism no
    library t-digest/KLL offers cross-engine.

    The domain [min, max] is measured first (a 2-value scalar aggregate —
    at 100 TB you would pin the domain from metadata instead; both are one
    cheap pass)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    mn, mx = li.agg(F.min("cents"), F.max("cents")).first()
    if mn is None:  # empty table: no domain, no bins — width is never used
        mn, mx = 0, 0
    width = (mx - mn) // HIST_BINS + 1  # ceil-ish: bin of mx stays < HIST_BINS
    binned = li.select(
        "l_returnflag",
        F.floor((F.col("cents") - F.lit(mn)) / F.lit(width)).cast("long").alias("bin"),
    )
    hist = binned.groupBy("l_returnflag", "bin").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window as W

    wcum = W.partitionBy("l_returnflag").orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy("l_returnflag")
    cum = (
        hist.withColumn("cumc", F.sum("c").over(wcum))
        .withColumn("n", F.sum("c").over(wall))
    )
    outs = []
    for pm, name in QUANTILES:
        # target rank (1-based): ceil(pm/1000 * n) via integer arithmetic
        target = F.ceil(F.col("n") * pm / 1000).cast("long")
        hit = cum.filter(F.col("cumc") >= target).withColumn(
            "rk", F.row_number().over(W.partitionBy("l_returnflag").orderBy("bin"))
        ).filter(F.col("rk") == 1)
        est = (
            F.lit(mn)
            + F.col("bin") * F.lit(width)
            + F.floor(
                (target - (F.col("cumc") - F.col("c"))).cast("double")
                / F.col("c").cast("double")
                * F.lit(width)
            )
        )
        outs.append(
            hit.select(
                "l_returnflag",
                F.lit(name).alias("quantile"),
                F.col("n").cast("long").alias("n_rows"),
                est.cast("long").alias("est_cents"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def _hist_oracle() -> str:
    # Domain bounds are data-derived constants in the Spark path; the SQL
    # derives them in a CTE (same values, exact integers).
    arms = []
    for pm, name in QUANTILES:
        arms.append(f"""
SELECT l_returnflag, '{name}' AS quantile, CAST(n AS BIGINT) AS n_rows,
       CAST(mn + bin * width
            + FLOOR(CAST(target - (cumc - c) AS DOUBLE) / CAST(c AS DOUBLE) * width)
            AS BIGINT) AS est_cents
FROM (
  SELECT *, CAST(CEIL(n * {pm} / 1000.0) AS BIGINT) AS target,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag, (cumc >= CAST(CEIL(n * {pm} / 1000.0) AS BIGINT)) ORDER BY bin) AS rk
  FROM cum
)
WHERE cumc >= target AND rk = 1""")
    union = "\nUNION ALL\n".join(arms)
    return f"""
WITH base AS (
  SELECT l_returnflag, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem
), dom AS (
  SELECT MIN(cents) AS mn, ((MAX(cents) - MIN(cents)) // {HIST_BINS} + 1) AS width FROM base
), hist AS (
  SELECT l_returnflag, ((cents - mn) // width) AS bin, mn, width, COUNT(*) AS c
  FROM base, dom GROUP BY 1, 2, 3, 4
), cum AS (
  SELECT *,
    SUM(c) OVER (PARTITION BY l_returnflag ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
    SUM(c) OVER (PARTITION BY l_returnflag) AS n
  FROM hist
)
{union}
"""


HIST_QUANTILE_ORACLE = _hist_oracle()


# ---------------------------------------------------------------------------
# Count-Min Sketch (Cormode & Muthukrishnan): DEPTH seeded hash rows × WIDTH
# counters; point-frequency estimate = min over rows of the probed counter.
# Built as one explode(DEPTH)+groupBy — the sketch IS a (row, bucket, count)
# relation, trivially mergeable across partitions/days by summing counters
# (the property that makes CMS the streaming-frequency workhorse). Estimates
# are biased UP only (collisions add, never subtract) — asserted in pytest;
# the gate compares estimates AND exact truths per probe key cross-engine.
# Deterministic: the seeded md5 family shared with minhash/bloom.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_PROBE_KEYS = list(range(1, 11))


def sketch_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import hash_seeds, seeded_hash

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("string").alias("key")
    )
    seeds = hash_seeds(CMS_DEPTH)
    rows = F.array(
        *[
            F.struct(
                F.lit(d).cast("long").alias("d"),
                (seeded_hash(F.col("key"), a, b) % CMS_WIDTH).cast("long").alias("bucket"),
            )
            for d, (a, b) in enumerate(seeds)
        ]
    )
    counters = (
        li.select(F.explode(rows).alias("r"))
        .groupBy(F.col("r.d").alias("d"), F.col("r.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # probe buckets are compile-time constants: the same Python hash twin
    # used by the oracle computes them once on the driver
    probe_rows = [
        (k, d, _cms_bucket(str(k), a, b))
        for k in CMS_PROBE_KEYS
        for d, (a, b) in enumerate(seeds)
    ]
    pb = spark.createDataFrame(probe_rows, "probe_key long, d long, bucket long")
    est = (
        F.broadcast(pb)
        .join(counters, ["d", "bucket"], "left")
        .groupBy("probe_key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cms_estimate"))
    )
    truth = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey").isin(CMS_PROBE_KEYS))
        .groupBy(F.col("l_partkey").cast("long").alias("probe_key"))
        .agg(F.count(F.lit(1)).cast("long").alias("true_count"))
    )
    return (
        est.join(truth, "probe_key", "left")
        .select(
            "probe_key",
            F.coalesce("true_count", F.lit(0)).cast("long").alias("true_count"),
            "cms_estimate",
        )
        .orderBy("probe_key")
    )


def _cms_bucket(key: str, a: int, b: int) -> int:
    """Python twin of hashing.seeded_hash % CMS_WIDTH (same md5 arithmetic)."""
    import hashlib

    h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
    mod30 = 1 << 30
    mersenne31 = (1 << 31) - 1
    return ((a * (h % mod30) + b) % mersenne31) % CMS_WIDTH


def _cms_oracle() -> str:
    from ..functions.hashing import hash_seeds, seeded_hash_sql

    seeds = hash_seeds(CMS_DEPTH)
    row_selects = "\nUNION ALL\n".join(
        f"SELECT {d} AS d, ({seeded_hash_sql('CAST(l_partkey AS VARCHAR)', a, b)}) % {CMS_WIDTH} AS bucket FROM lineitem"
        for d, (a, b) in enumerate(seeds)
    )
    probe_rows = ",\n".join(
        f"({k}, {d}, {_cms_bucket(str(k), a, b)})"
        for k in CMS_PROBE_KEYS
        for d, (a, b) in enumerate(seeds)
    )
    keys = ", ".join(str(k) for k in CMS_PROBE_KEYS)
    return f"""
WITH sk AS (
{row_selects}
), counters AS (
  SELECT d, bucket, COUNT(*) AS c FROM sk GROUP BY d, bucket
), probes(probe_key, d, bucket) AS (VALUES
{probe_rows}
), est AS (
  SELECT p.probe_key, CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS cms_estimate
  FROM probes p LEFT JOIN counters c USING (d, bucket)
  GROUP BY p.probe_key
), truth AS (
  SELECT CAST(l_partkey AS BIGINT) AS probe_key, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM lineitem WHERE l_partkey IN ({keys}) GROUP BY 1
)
SELECT e.probe_key, CAST(COALESCE(t.true_count, 0) AS BIGINT) AS true_count, e.cms_estimate
FROM est e LEFT JOIN truth t USING (probe_key)
ORDER BY e.probe_key
"""


SKETCH_QUERIES = [
    Q(
        "sketch_histogram_quantiles",
        sketch_histogram_quantiles,
        HIST_QUANTILE_ORACLE,
        "mergeable equi-width histogram quantile sketch (integer-exact)",
    ),
    Q(
        "sketch_hll_distinct",
        sketch_hll_distinct,
        HLL_ORACLE,
        "deterministic cross-engine HyperLogLog (exact-integer registers)",
    ),
    Q(
        "join_bloom_prefilter",
        join_bloom_prefilter,
        BLOOM_ORACLE,
        "Bloom-bitmap join prefilter with exact confirm (result sketch-invisible)",
    ),
    Q(
        "sketch_countmin_freq",
        sketch_countmin_freq,
        _cms_oracle(),
        "Count-Min sketch point-frequency estimates vs exact truths (mergeable counters)",
    ),
]
