"""Relational breadth on the TPC-H-ish tables (SURVEY.md §2 rows A3, C1-C4,
E joins/set-ops, F aggregations, G window extensions, H sorts/top-k).

Scale notes baked into each plan:
- dimension joins (region/nation/customer/supplier/part) are explicitly
  ``F.broadcast`` — at 100 TB the fact tables shuffle on their own keys
  only; dims never shuffle.
- top-k uses orderBy+limit → Spark plans ``TakeOrderedAndProject``
  (per-partition heap + driver merge of k rows, no global sort).
- aggregates round to 4 dp for cross-engine bit-stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stable import scaled_long
from ..operators.rank import with_global_ntile
from ..operators.skew import salted_join
from ..sources.tables import load_table
from . import register


# --- TPC-H Q1: pricing summary (grouped multi-aggregate) ------------------


# Integer-scaled sums (functions/stable.py): quantity/price/discount are
# 2-dp decimals, disc_price is 4-dp, charge is 6-dp — exact at scales
# 1e2/1e4/1e6; integer aggregation is order-independent, so Spark and the
# oracle agree bit-for-bit.
@register(
    "tpch_q1_pricing",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0, 4)
         AS sum_qty,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 4)
         AS sum_base_price,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
             AS DOUBLE) / 10000.0, 4) AS sum_disc_price,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000)
             AS BIGINT)) AS DOUBLE) / 1000000.0, 4) AS sum_charge,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
             / (COUNT(*) * 100.0) AS avg_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / (COUNT(*) * 100.0) AS avg_price,
       CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
             / (COUNT(*) * 100.0) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""".strip(),
)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    qty_s = scaled_long(F.col("l_quantity"), 100)
    price_s = scaled_long(F.col("l_extendedprice"), 100)
    disc_price_s = scaled_long(disc_price, 10_000)
    charge_s = scaled_long(charge, 1_000_000)
    disc_s = scaled_long(F.col("l_discount"), 100)
    n = F.count(F.lit(1))
    return (
        li.where(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty_s).cast("double") / 100.0, 4).alias("sum_qty"),
            F.round(F.sum(price_s).cast("double") / 100.0, 4).alias("sum_base_price"),
            F.round(F.sum(disc_price_s).cast("double") / 10_000.0, 4).alias(
                "sum_disc_price"
            ),
            F.round(F.sum(charge_s).cast("double") / 1_000_000.0, 4).alias("sum_charge"),
            # avgs unrounded: exact-int sums make them bit-identical across
            # engines; rounding rationals is what diverges (detrend.py note)
            (F.sum(qty_s).cast("double") / (n * F.lit(100.0))).alias("avg_qty"),
            (F.sum(price_s).cast("double") / (n * F.lit(100.0))).alias("avg_price"),
            (F.sum(disc_s).cast("double") / (n * F.lit(100.0))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- Q5-style: revenue per nation (fact shuffles once; all dims broadcast)


@register(
    "revenue_by_nation",
    oracle="""
SELECT n.n_name AS nation, r.r_name AS region,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
""".strip(),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.col("r_name").alias("region")
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- H-topk: top customers by order value (TakeOrderedAndProject) ---------


@register(
    "top10_customers",
    oracle="""
SELECT o_custkey, ROUND(SUM(o_totalprice), 4) AS total_spent,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_custkey
ORDER BY total_spent DESC, o_custkey ASC LIMIT 10
""".strip(),
)
def top10_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("total_spent").desc(), F.col("o_custkey").asc())
        .limit(10)
    )


# --- C2+E semi: orders with a late-shipped lineitem (EXISTS, Q4-style) ----


@register(
    "late_shipment_orders",
    oracle="""
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
""".strip(),
)
def late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


# --- E anti: parts with no shipment after a cutoff (NOT EXISTS) -----------


@register(
    "parts_not_recently_shipped",
    oracle="""
SELECT p.p_partkey, p.p_name FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey
    AND CAST(l.l_shipdate AS DATE) >= DATE '1999-01-01')
""".strip(),
)
def parts_not_recently_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate") >= F.lit("1999-01-01").cast("date")
    )
    return part.join(
        li, part.p_partkey == li.l_partkey, "left_anti"
    ).select("p_partkey", "p_name")


# --- G extension: rank/lag per customer order sequence --------------------


@register(
    "customer_order_sequence",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq,
       ROUND(o_totalprice, 4) AS total,
       ROUND(COALESCE(LAG(o_totalprice) OVER w, 0.0), 4) AS prev_total,
       CAST(COALESCE(date_diff('day',
            LAG(CAST(o_orderdate AS DATE)) OVER w,
            CAST(o_orderdate AS DATE)), 0) AS INTEGER) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
""".strip(),
)
def customer_order_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "odate", F.to_date("o_orderdate")
    )
    w = Window.partitionBy("o_custkey").orderBy("odate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("order_seq"),
        F.round(F.col("o_totalprice"), 4).alias("total"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 4).alias(
            "prev_total"
        ),
        F.coalesce(F.datediff(F.col("odate"), F.lag("odate").over(w)), F.lit(0))
        .cast("int")
        .alias("days_since_prev"),
    )


# --- F rollup: hierarchical totals ----------------------------------------


@register(
    "rollup_lineitem_status",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""".strip(),
)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


# --- E set ops: intersect / except on customer activity -------------------


@register(
    "customers_active_both_halves",
    oracle="""
SELECT o_custkey FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
INTERSECT
SELECT o_custkey FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
""".strip(),
)
def customers_active_both_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "odate", F.to_date("o_orderdate")
    )
    first = orders.where(F.col("odate") < F.lit("1998-01-01").cast("date")).select(
        "o_custkey"
    )
    second = orders.where(F.col("odate") >= F.lit("1998-01-01").cast("date")).select(
        "o_custkey"
    )
    return first.intersect(second)


@register(
    "customers_only_first_half",
    oracle="""
SELECT o_custkey FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
EXCEPT
SELECT o_custkey FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
""".strip(),
)
def customers_only_first_half(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "odate", F.to_date("o_orderdate")
    )
    first = orders.where(F.col("odate") < F.lit("1998-01-01").cast("date")).select(
        "o_custkey"
    )
    second = orders.where(F.col("odate") >= F.lit("1998-01-01").cast("date")).select(
        "o_custkey"
    )
    # subtract == SQL EXCEPT (set semantics, dedups)
    return first.subtract(second)


# --- distinct aggregation (SURVEY §2.F note: absent in reference, shipped
# for surface completeness) ------------------------------------------------


@register(
    "distinct_users_per_type",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
""".strip(),
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-agg: Spark plans expand + two-phase agg; the distinct
    shuffle is on (event_type, user_id) so no single-key hotspot at
    scale."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- CUBE (grouping-sets family; rollup_lineitem_status covers ROLLUP) ----


@register(
    "cube_orders_status",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""".strip(),
)
def cube_orders_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# --- explicit GROUPING SETS (completes the rollup/cube family) ------------


@register(
    "grouping_sets_order_stats",
    oracle="""
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 4)
         AS total,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
""".strip(),
)
def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two independent one-dimension totals in ONE pass over the fact
    table (Expand + single shuffle) — the alternative, two groupBys +
    union, scans and shuffles twice."""
    o = load_table(spark, sf_dir, "orders")
    ts = scaled_long(F.col("o_totalprice"), 100)
    return (
        o.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"]],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.round(F.sum(ts).cast("double") / 100.0, 4).alias("total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "total",
            "n_orders",
        )
    )


# --- correlated-subquery pattern: orders above their customer's average ---


@register(
    "orders_above_customer_avg",
    oracle="""
WITH w AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS ts,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
           OVER (PARTITION BY o_custkey) AS s,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n
  FROM orders)
SELECT o_orderkey, o_custkey,
       ROUND(o_totalprice, 4) AS total,
       CAST(s AS DOUBLE) / (n * 100.0) AS cust_avg
FROM w WHERE ts * n > s
""".strip(),
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL's correlated scalar subquery (price > per-customer AVG),
    planned as ONE window pass instead of the naive self-join+agg.
    The comparison stays in exact integers (ts·n > Σts) so the boundary
    rows agree bit-for-bit with the oracle."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    ts = scaled_long(F.col("o_totalprice"), 100)
    enriched = o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        ts.alias("ts"),
        F.sum(ts).over(w).alias("s"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return enriched.where(F.col("ts") * F.col("n") > F.col("s")).select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 4).alias("total"),
        (F.col("s").cast("double") / (F.col("n") * F.lit(100.0))).alias("cust_avg"),
    )


# --- theta (band) join against a tiny literal dimension -------------------

PRICE_BANDS = [
    ("tiny", 0.0, 50_000.0),
    ("small", 50_000.0, 150_000.0),
    ("medium", 150_000.0, 300_000.0),
    ("large", 300_000.0, 450_000.0),
    ("huge", 450_000.0, 1e18),
]


@register(
    "orders_price_band",
    oracle=f"""
WITH bands(band, lo, hi) AS (VALUES
  {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)})
SELECT b.band, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 4)
         AS total
FROM orders o JOIN bands b
  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band
""".strip(),
)
def orders_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (band) join — SURVEY.md §2.E notes theta joins are absent
    from the reference but belong in the engine surface. The band
    dimension is a literal handful of rows, so the correct physical plan
    is BroadcastNestedLoopJoin: the fact side streams, never shuffles.
    (Irregular bands can't be mapped to an equi bucket key; with regular
    bands the scale path is width-division to a bucket column + hash
    join.)"""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band STRING, lo DOUBLE, hi DOUBLE")
    ts = scaled_long(F.col("o_totalprice"), 100)
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= F.col("lo")) & (o.o_totalprice < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(ts).cast("double") / 100.0, 4).alias("total"),
        )
    )


# --- salted join: hot-key skew mitigation (operators/skew.py) -------------

def _kmv_hex_sql(expr: str) -> str:
    """32-bit integer from the first 8 md5 hex digits (DuckDB side)."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({expr}), {d}, 1)) - 1)"
        f" * {16 ** (8 - d)}"
        for d in range(1, 9)
    )


TYPE_WEIGHTS = [
    ("click", 1.0),
    ("view", 0.5),
    ("purchase", 5.0),
    ("signup", 3.0),
    ("error", 0.1),
]


@register(
    "salted_type_join",
    oracle=f"""
WITH weights(event_type, weight) AS (VALUES
  {", ".join(f"('{t}', {w})" for t, w in TYPE_WEIGHTS)})
SELECT e.event_type,
       ROUND(CAST(SUM(CAST(ROUND(e.value * w.weight * 1000) AS BIGINT)) AS DOUBLE)
             / 1000.0, 4) AS weighted_value,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events e JOIN weights w ON e.event_type = w.event_type
GROUP BY e.event_type
""".strip(),
)
def salted_type_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events ⋈ per-type weights with only 5 distinct join keys — the
    textbook hot-key join. The salted plan joins on (event_type, salt)
    with salt = hash(event_id) % 32, spreading each hot key over 32
    partitions instead of 1; the tiny weight dim is replicated per salt.
    Result is identical to the unsalted join (oracle = plain SQL join)."""
    ev = load_table(spark, sf_dir, "events")
    weights = spark.createDataFrame(TYPE_WEIGHTS, "event_type STRING, weight DOUBLE")
    joined = salted_join(
        ev, weights, on=["event_type"], salt_from="event_id", n_salts=32
    )
    wv = scaled_long(F.col("value") * F.col("weight"), 1000)
    return joined.groupBy("event_type").agg(
        F.round(F.sum(wv).cast("double") / 1000.0, 4).alias("weighted_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- approx aggregates in the FULL VALUE ORACLE tier (round 12,
# VERDICT r11 #8): the 100 TB cardinality/median path re-expressed on
# DETERMINISTIC cross-engine sketches. The original rows-only version
# used Spark's HLL++/KLL natives, whose register layouts aren't
# reproducible in DuckDB; the KMV precedent (events_kmv_distinct, r11)
# shows the portable alternative — md5-based order statistics whose
# ESTIMATES are bit-identical in both engines. Distinct users: KMV
# k=128 (rsd ≈ 1/√126 ≈ 9%; measured −0.7% at sf0.01, +5.9% at
# sf0.1); a non-full sketch IS its own exact count (no exact-probe —
# the sketch knows its size). Median: percentile_disc(0.5) over the
# deterministic 1/4 hash-sample of events (hash sampling is the
# mergeable scale shape: partials union; measured ±2.4% rank error at
# sf0.01). tests/test_oracle_parity.py still bounds both against the
# exact answers. Production note: the per-type ranking window is the
# demonstrable protocol; a deployed sketch folds per-partition
# k-minima with a merge agg (plan change, same estimates).

_ADU_K = 128
_ADU_SAMPLE_MOD = 4


@register(
    "approx_distinct_users",
    oracle=f"""
WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events),
h AS (
  SELECT event_type, user_id,
         CAST({_kmv_hex_sql("CAST(user_id AS VARCHAR)")} AS BIGINT) AS hv
  FROM du),
r AS (
  SELECT event_type, hv,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY hv ASC, user_id ASC) AS rn
  FROM h),
sk AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sk,
         CAST(MAX(CASE WHEN rn = {_ADU_K} THEN hv END) AS BIGINT) AS kth
  FROM r WHERE rn <= {_ADU_K} GROUP BY event_type),
samp AS (
  SELECT event_type, value FROM events
  WHERE CAST({_kmv_hex_sql("CAST(event_id AS VARCHAR)")} AS BIGINT)
          % {_ADU_SAMPLE_MOD} = 0),
med AS (
  SELECT event_type,
         PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY value) AS p50_approx
  FROM samp GROUP BY event_type),
c AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type)
SELECT c.event_type,
       CAST(CASE WHEN sk.kth IS NULL THEN sk.n_sk
            ELSE FLOOR(({_ADU_K} - 1) * 4294967296.0
                       / GREATEST(sk.kth, 1))
            END AS BIGINT) AS n_users_approx,
       med.p50_approx,
       c.n_events
FROM c LEFT JOIN sk ON sk.event_type = c.event_type
       LEFT JOIN med ON med.event_type = c.event_type
""".strip(),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type approximate distinct users (deterministic KMV k=128) +
    approximate median (percentile_disc over the deterministic 1/4
    md5 hash-sample) — the portable-sketch twin of HLL++/KLL, exact
    enough for the 5% pytest bound and bit-reproducible in DuckDB."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    uhv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    du = (
        ev.select("event_type", "user_id")
        .distinct()
        .select("event_type", "user_id", uhv.alias("hv"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("hv").asc(), F.col("user_id").asc()
    )
    r = du.select(
        "event_type", "hv", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= _ADU_K)
    sk = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sk"),
        F.max(F.when(F.col("rn") == _ADU_K, F.col("hv")))
        .cast("long")
        .alias("kth"),
    )
    ehv = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    med = (
        ev.where(ehv % _ADU_SAMPLE_MOD == 0)
        .groupBy("event_type")
        .agg(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY value)"
            ).alias("p50_approx")
        )
    )
    c = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    est = F.floor(
        F.lit((_ADU_K - 1) * 4294967296.0)
        / F.greatest(F.col("kth"), F.lit(1)).cast("double")
    ).cast("long")
    return (
        c.join(F.broadcast(sk), "event_type", "left")
        .join(F.broadcast(med), "event_type", "left")
        .select(
            "event_type",
            F.when(F.col("kth").isNull(), F.col("n_sk"))
            .otherwise(est)
            .cast("long")
            .alias("n_users_approx"),
            "p50_approx",
            "n_events",
        )
    )


@register(
    "value_percentiles_by_type",
    oracle="""
SELECT event_type,
       PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY value) AS p25,
       PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY value) AS p50,
       PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY value) AS p75,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
""".strip(),
)
def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-type quartiles — the SQL-tier twin of the KLL sketch in
    ``approx_distinct_users`` (which stays the 100 TB default), and the
    DISCRETE companion of ``value_percentiles`` (interpolated + rounded
    in queries/trends.py). ANSI
    ``percentile_disc`` picks an actual data element (no interpolation),
    so Spark and DuckDB agree bit-for-bit — ``percentile``/
    ``quantile_cont`` would interpolate in floating point and can
    diverge at round() ties. Scale note: Spark's exact percentile
    aggregate merges per-partition value→count maps, so memory grows
    with DISTINCT values per group, not rows — fine for bounded-domain
    metrics, sketch path for unbounded ones."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY value)"
        ).alias("p25"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY value)"
        ).alias("p50"),
        F.expr(
            "percentile_disc(0.75) WITHIN GROUP (ORDER BY value)"
        ).alias("p75"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- winsorized robust statistics (clamp at exact P05/P95) ----------------
# The outlier-robust mean every metrics pipeline needs: per priority
# class, order totals CLAMPED to the group's exact [P05, P95] before
# averaging. Exactness chain: totals as integer cents →
# percentile_disc picks an actual data element (the
# value_percentiles_by_type protocol) → clamp is integer min/max →
# one exact int sum → a single IEEE division. Two-pass shape: the
# tiny per-group percentile table joins back onto the same grouping
# key (co-partitioned with the final aggregate — one logical shuffle
# chain, no window-sort over the fact table).


@register(
    "orders_winsorized_stats",
    oracle="""
WITH o AS (
  SELECT o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
p AS (
  SELECT o_orderpriority,
         PERCENTILE_DISC(0.05) WITHIN GROUP (ORDER BY cents) AS p05,
         PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY cents) AS p95
  FROM o GROUP BY o_orderpriority)
SELECT o.o_orderpriority, p.p05 AS p05_cents, p.p95 AS p95_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(LEAST(GREATEST(o.cents, p.p05), p.p95)) AS BIGINT)
         AS winsorized_sum_cents,
       CAST(SUM(LEAST(GREATEST(o.cents, p.p05), p.p95)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS winsorized_mean_cents
FROM o JOIN p USING (o_orderpriority)
GROUP BY o.o_orderpriority, p.p05, p.p95
""".strip(),
)
def orders_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    p = o.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile_disc(0.05) WITHIN GROUP (ORDER BY cents)"
        ).cast("long").alias("p05"),
        F.expr(
            "percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)"
        ).cast("long").alias("p95"),
    )
    clamped = F.least(F.greatest(F.col("cents"), F.col("p05")), F.col("p95"))
    return (
        o.join(p, "o_orderpriority")
        .groupBy("o_orderpriority", "p05", "p95")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(clamped).cast("long").alias("winsorized_sum_cents"),
            (
                F.sum(clamped).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("winsorized_mean_cents"),
        )
        .select(
            "o_orderpriority",
            F.col("p05").alias("p05_cents"),
            F.col("p95").alias("p95_cents"),
            "n_orders",
            "winsorized_sum_cents",
            "winsorized_mean_cents",
        )
    )


# --- Q17-style: correlated agg subquery by join+agg decorrelation ---------


@register(
    "small_quantity_revenue",
    oracle="""
WITH pa AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sq,
         COUNT(*) AS nq
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 700.0
         AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND CAST(ROUND(l.l_quantity * 100) AS BIGINT) * nq * 5 < sq
""".strip(),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of below-20%-of-part-average-quantity
    line items, one brand. The correlated scalar subquery (per-part AVG)
    decorrelates to groupBy + equi-join — here explicitly, which is also
    what Catalyst's RewriteCorrelatedScalarSubquery does. The threshold
    comparison stays in exact integers (qty·n·5 < Σqty) so boundary rows
    agree with the oracle bit-for-bit; the per-part aggregate shuffles on
    l_partkey, the same key as the join — ONE exchange of lineitem
    reused by both."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qs = scaled_long(F.col("l_quantity"), 100)
    pa = li.groupBy("l_partkey").agg(
        F.sum(qs).alias("sq"), F.count(F.lit(1)).alias("nq")
    ).withColumnRenamed("l_partkey", "pa_partkey")
    ps = scaled_long(F.col("l_extendedprice"), 100)
    return (
        li.join(
            F.broadcast(part.where(F.col("p_brand") == "Brand#1")),
            li.l_partkey == part.p_partkey,
        )
        .join(pa, li.l_partkey == F.col("pa_partkey"))
        .where(qs * F.col("nq") * 5 < F.col("sq"))
        .agg(
            (F.sum(ps).cast("double") / 700.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- full outer join: customer activity matrix across halves --------------


@register(
    "customer_halves_outer",
    oracle="""
WITH h1 AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_first
  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01' GROUP BY 1),
h2 AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_second
  FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01' GROUP BY 1)
SELECT COALESCE(h1.o_custkey, h2.o_custkey) AS custkey,
       COALESCE(n_first, 0) AS n_first,
       COALESCE(n_second, 0) AS n_second,
       CASE WHEN h1.o_custkey IS NULL THEN 'second_only'
            WHEN h2.o_custkey IS NULL THEN 'first_only'
            ELSE 'both' END AS segment
FROM h1 FULL OUTER JOIN h2 ON h1.o_custkey = h2.o_custkey
""".strip(),
)
def customer_halves_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (completes the join-type surface: inner, semi,
    anti, left via zero-fill spine, theta, as-of, salted — and outer).
    Both inputs pre-aggregate on the join key, so the outer join joins
    two already-key-partitioned sides — AQE reuses the partitioning."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "odate", F.to_date("o_orderdate")
    )
    cut = F.lit("1998-01-01").cast("date")
    h1 = (
        orders.where(F.col("odate") < cut)
        .groupBy(F.col("o_custkey").alias("k1"))
        .agg(F.count(F.lit(1)).alias("n_first"))
    )
    h2 = (
        orders.where(F.col("odate") >= cut)
        .groupBy(F.col("o_custkey").alias("k2"))
        .agg(F.count(F.lit(1)).alias("n_second"))
    )
    j = h1.join(h2, h1.k1 == h2.k2, "full_outer")
    return j.select(
        F.coalesce("k1", "k2").alias("custkey"),
        F.coalesce("n_first", F.lit(0)).alias("n_first"),
        F.coalesce("n_second", F.lit(0)).alias("n_second"),
        F.when(F.col("k1").isNull(), "second_only")
        .when(F.col("k2").isNull(), "first_only")
        .otherwise("both")
        .alias("segment"),
    )


# --- G-ext: per-group top-k (row_number window + filter) ------------------


@register(
    "top3_customers_per_nation",
    oracle="""
SELECT nation, o_custkey, total_spent, rk FROM (
  SELECT n.n_name AS nation, o.o_custkey,
         ROUND(SUM(o.o_totalprice), 4) AS total_spent,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY n.n_name
           ORDER BY ROUND(SUM(o.o_totalprice), 4) DESC, o.o_custkey ASC
         ) AS BIGINT) AS rk
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, o.o_custkey)
WHERE rk <= 3
""".strip(),
)
def top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k — the pattern `top10_customers` (global
    TakeOrderedAndProject) can't express. One shuffle on the agg keys;
    the window repartitions only by nation (25 groups, tiny vs facts).
    Ties broken by custkey so the result is deterministic on any engine.
    Reference has no per-group top-k (SURVEY.md §2.H notes the gap)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spent = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("total_spent"))
    )
    w = Window.partitionBy("nation").orderBy(
        F.col("total_spent").desc(), F.col("o_custkey").asc()
    )
    return spent.withColumn(
        "rk", F.row_number().over(w).cast("long")
    ).where(F.col("rk") <= 3)


# --- F-ext: hierarchical rollup reusing the finer aggregate ---------------


@register(
    "monthly_rollup_from_daily",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS rev_c,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1)
SELECT CAST(DATE_TRUNC('month', d) AS DATE) AS month,
       CAST(SUM(rev_c) AS DOUBLE) / 100.0 AS revenue,
       CAST(SUM(n) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_active_days
FROM daily GROUP BY 1
""".strip(),
)
def monthly_rollup_from_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup: the monthly aggregate is
    computed FROM the daily aggregate, not from raw facts — at 100 TB the
    daily rollup is the persisted continuous aggregate (run_foreach_batch
    fan-out writes it per-day) and coarser grains re-aggregate ~1000×
    fewer rows, no fact rescan. Integer-cent sums keep the two-level
    re-aggregation exact (sum of sums == sum)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(scaled_long(F.col("o_totalprice"), 100)).alias("rev_c"),
        F.count(F.lit(1)).alias("n"),
    )
    return daily.groupBy(F.trunc("d", "month").alias("month")).agg(
        (F.sum("rev_c").cast("double") / 100.0).alias("revenue"),
        F.sum("n").alias("n_orders"),
        F.count(F.lit(1)).alias("n_active_days"),
    )


# --- G-ext: distribution-rank windows (percent_rank / cume_dist) ----------


@register(
    "customer_spend_percentile",
    oracle="""
SELECT n.n_name AS nation, o.o_custkey,
       ROUND(SUM(o.o_totalprice), 4) AS total_spent,
       ROUND(PERCENT_RANK() OVER w, 6) AS spend_pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS spend_cume_dist
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name, o.o_custkey
WINDOW w AS (PARTITION BY n.n_name
             ORDER BY ROUND(SUM(o.o_totalprice), 4), o.o_custkey)
""".strip(),
)
def customer_spend_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank windows (percent_rank/cume_dist) — completes the
    ranking family (row_number/lag/lead/ntile elsewhere). Same
    single-shuffle shape as the per-group top-k: agg on (nation,
    custkey), then one window pass partitioned by nation. Ranks are over
    the ROUNDED total and tie-broken by custkey so both engines order
    identically; rank outputs rounded to 6 dp (exact k/n rationals)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spent = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("total_spent"))
    )
    w = Window.partitionBy("nation").orderBy(
        F.col("total_spent").asc(), F.col("o_custkey").asc()
    )
    return spent.select(
        "nation",
        "o_custkey",
        "total_spent",
        F.round(F.percent_rank().over(w), 6).alias("spend_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("spend_cume_dist"),
    )


# --- G extension: NTILE — equal-frequency bucketing (decile assignment
# over exact integer spend; ordering is total via the custkey tie-break,
# so bucket boundaries are engine-independent). A bare
# `ntile().over(Window.orderBy(...))` would funnel the whole table into
# one task (Exchange SinglePartition); operators/rank.py instead range-
# partitions on the sort key, derives in-partition ranks from
# monotonically_increasing_id, and broadcast-joins per-partition offsets
# — identical NTILE semantics, fully parallel at any scale. ----------------


@register(
    "customer_spend_deciles",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS spend_cents
  FROM orders GROUP BY o_custkey)
SELECT o_custkey, spend_cents,
       CAST(NTILE(10) OVER (ORDER BY spend_cents, o_custkey) AS INTEGER)
         AS decile
FROM spend
""".strip(),
)
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(scaled_long(F.col("o_totalprice"), 100)).alias("spend_cents")
    )
    return with_global_ntile(
        spend, ["spend_cents", "o_custkey"], 10, "decile"
    ).select("o_custkey", "spend_cents", "decile")


# --- TPC-H Q5 shape: local-supplier revenue — the 6-table join with the
# customer-nation = supplier-nation constraint. Fact side (lineitem ⋈
# orders) shuffles once on orderkey; customer/supplier/nation/region are
# broadcast dims, and the same-nation predicate applies as a post-join
# filter on two broadcast columns. Revenue uses the exact-integer
# pattern: price (2dp) and discount (2dp) scale to ints whose product is
# the exact 1e-4-scaled revenue — one final division, no ROUND of a
# rational (functions/stable.py). ------------------------------------------


@register(
    "local_supplier_revenue",
    oracle="""
SELECT n.n_name AS nation,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
GROUP BY n.n_name
""".strip(),
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev_e4 = scaled_long(F.col("l_extendedprice"), 100) * (
        F.lit(100) - scaled_long(F.col("l_discount"), 100)
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        (F.sum(rev_e4).cast("double") / 10000.0).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- G extension: edge-of-frame window functions (first_value /
# last_value / nth_value / lead) over each customer's order history —
# the frame must be the FULL partition (ROWS BETWEEN UNBOUNDED PRECEDING
# AND UNBOUNDED FOLLOWING): last_value under the default frame is the
# current row, a classic cross-engine footgun both engines share. ----------


@register(
    "customer_order_frame",
    oracle="""
SELECT o_orderkey, o_custkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey) OVER w AS last_order,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_order,
       LEAD(o_orderkey) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         AS next_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""".strip(),
)
def customer_order_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w_full).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
        F.lead("o_orderkey").over(w_seq).alias("next_order"),
    )


# --- D extension: calendar bucketing (date_trunc to quarter, month-end
# via last_day, ISO day-of-week) — one scan, exact date/integer outputs. ---


@register(
    "orders_calendar_rollup",
    oracle="""
SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
       CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
GROUP BY 1, 2, 3
""".strip(),
)
def orders_calendar_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("quarter", "o_orderdate").cast("date").alias("quarter"),
            F.last_day("o_orderdate").alias("month_end"),
            F.dayofweek("o_orderdate").alias("_dow"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(scaled_long(F.col("o_totalprice"), 100)).alias(
                "revenue_cents"
            ),
        )
        .select(
            "quarter",
            "month_end",
            # Spark dayofweek: 1=Sunday..7=Saturday → ISO 1=Monday..7=Sunday
            F.when(F.col("_dow") == 1, 7).otherwise(F.col("_dow") - 1)
            .cast("int")
            .alias("iso_dow"),
            "n_orders",
            "revenue_cents",
        )
    )


# --- fuzzy entity matching: blocking key + edit-distance verify — the
# standard entity-resolution shape (block on a cheap key so the
# quadratic levenshtein runs only within blocks; both engines implement
# the same Wagner-Fischer distance, so the pair set is value-exact). -------


@register(
    "fuzzy_part_name_pairs",
    oracle="""
WITH p AS (
  SELECT p_partkey, p_name, split_part(p_name, ' ', 1) AS blk FROM part),
pairs AS (
  SELECT a.blk, levenshtein(a.p_name, b.p_name) AS d
  FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey)
SELECT blk, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(*) FILTER (WHERE d <= 2) AS BIGINT) AS n_fuzzy,
       CAST(MIN(d) AS INTEGER) AS min_dist
FROM pairs GROUP BY blk
""".strip(),
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per blocking key: in-block pair count, count of fuzzy matches
    (edit distance ≤ 2) and the closest pair distance."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", F.split("p_name", " ")[0].alias("blk")
    )
    a, b = part.alias("a"), part.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    ).select(F.col("a.blk").alias("blk"), dist.alias("d"))
    return pairs.groupBy("blk").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count(F.when(F.col("d") <= 2, 1)).alias("n_fuzzy"),
        F.min("d").cast("int").alias("min_dist"),
    )


# --- SQL-API surface: the same engine through spark.sql() over temp
# views — a user of the reference can hand us SQL text, not just
# DataFrame calls. The statement itself exercises a join + conditional
# aggregation; Catalyst plans it identically to the fluent form. ----------


@register(
    "sql_api_priority_revenue",
    oracle="""
SELECT o.o_orderpriority,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                     THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS returned_cents
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
""".strip(),
)
def sql_api_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderpriority,
               COUNT(DISTINCT o.o_orderkey) AS n_orders,
               SUM(CASE WHEN l.l_returnflag = 'R'
                        THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        ELSE 0L END) AS returned_cents
        FROM v_orders o JOIN v_lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority
        """
    )


# --- SQL pipe-syntax surface (Spark 4 `|>` operators) ---------------------
# The second SQL-API entry exercises Spark 4's pipe syntax
# (FROM ... |> EXTEND ... |> AGGREGATE ... GROUP BY — the GoogleSQL
# pipe dialect adopted upstream): same declarative plan as the classic
# form, alternative surface. Reads the parquet file through the
# `parquet.` path-table syntax — no temp view, and the filter/pruning
# behavior is identical to load_table's scan. Oracle is the classic
# ANSI formulation (DuckDB has no pipe dialect).


@register(
    "sql_pipe_quarterly_revenue",
    oracle="""
SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
       CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
GROUP BY 1, 2
""".strip(),
)
def sql_pipe_quarterly_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.tables import configure_runtime

    configure_runtime(spark)
    return spark.sql(
        f"""
        FROM parquet.`{sf_dir}/orders.parquet`
        |> EXTEND CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
                  CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr
        |> AGGREGATE COUNT(*) AS n_orders,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS revenue_cents
           GROUP BY yr, qtr
        |> SELECT yr, qtr, n_orders, revenue_cents
        """
    )


# --- multiset set-ops: EXCEPT ALL / INTERSECT ALL (duplicate-preserving
# — the bag semantics dropDuplicates-based dedup cannot express). ----------


@register(
    "returned_parts_multiset",
    oracle="""
SELECT l_partkey FROM lineitem
EXCEPT ALL
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
""".strip(),
)
def returned_parts_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference: every lineitem part occurrence minus one
    occurrence per returned line — i.e., per part, multiplicity =
    n_lines - n_returned (duplicates preserved, unlike EXCEPT)."""
    li = load_table(spark, sf_dir, "lineitem")
    all_parts = li.select("l_partkey")
    returned = li.where(F.col("l_returnflag") == "R").select("l_partkey")
    return all_parts.exceptAll(returned)


# --- MapType surface: JSON props parsed to map<string,bigint>, map
# entries exploded and re-aggregated per key. The reference never uses
# MapType (SURVEY §1.2 "not used"); our engine ships it for
# completeness — schemaless-ish property bags are the common shape for
# event payload columns at scale. ------------------------------------------


@register(
    "event_prop_key_stats",
    oracle="""
WITH kv AS (
  SELECT unnest(json_keys(props)) AS prop_key, props FROM events)
SELECT prop_key, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract(props, '$.' || prop_key) AS BIGINT))
            AS BIGINT) AS sum_value
FROM kv GROUP BY prop_key
""".strip(),
)
def event_prop_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    # outer + isNotNull: a plain explode's inferred size()>0 filter
    # would re-parse the JSON map once more per row inside the Filter.
    kv = ev.select(F.explode_outer(m).alias("prop_key", "value")).where(
        F.col("prop_key").isNotNull()
    )
    return kv.groupBy("prop_key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sum_value"),
    )


# --- boolean / conditional aggregates (bool_and, bool_or, count_if) -------


@register(
    "region_shipment_flags",
    oracle="""
SELECT l_returnflag,
       CAST(bool_and(l_quantity > 0) AS INTEGER) AS all_positive_qty,
       CAST(bool_or(l_discount > 0.05) AS INTEGER) AS any_big_discount,
       CAST(count_if(l_tax = 0) AS BIGINT) AS n_tax_free,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem GROUP BY l_returnflag
""".strip(),
)
def region_shipment_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).cast("int").alias("all_positive_qty"),
        F.bool_or(F.col("l_discount") > 0.05).cast("int").alias("any_big_discount"),
        F.count_if(F.col("l_tax") == 0).alias("n_tax_free"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- MERGE / upsert (the lakehouse write-path primitive; no reference
# twin — the reference only appends). Spark-first shape: union the
# snapshot with the change batch and keep the highest-priority row per
# key with ONE shuffle (window row_number keyed on the merge key) — the
# scalable equivalent of MERGE INTO for full-snapshot maintenance; at
# 100 TB, pair it with partition pruning so only touched partitions
# rewrite (tests/test_io.py::test_dynamic_partition_overwrite). ----------


def _orders_change_batch(o: DataFrame) -> DataFrame:
    """Deterministic synthetic change batch derived from the snapshot:
    every 7th key gets a 10% price bump (computed in integer cents so
    Spark and DuckDB agree bit-for-bit), every 11th≡5 key is re-inserted
    as a brand-new order (key shifted by 1e7)."""
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    # DIV, not /10-then-floor: float division can land an exact .999…
    # quotient on the wrong side of the floor; integer DIV matches the
    # oracle's `//` bit-for-bit.
    bumped = (
        F.expr(
            "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
            " + CAST(ROUND(o_totalprice * 100) AS BIGINT) DIV 10"
        ).cast("double")
        / 100.0
    )
    updates = o.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        bumped.alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    inserts = o.where(F.col("o_orderkey") % 11 == 5).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    return updates.unionByName(inserts)


@register(
    "merge_upsert_orders",
    oracle="""
WITH changes AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
              + CAST(ROUND(o_totalprice * 100) AS BIGINT) // 10 AS DOUBLE)
           / 100.0 AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 11 = 5),
tagged AS (
  SELECT *, 1 AS _src FROM changes
  UNION ALL
  SELECT *, 0 AS _src FROM orders),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
            ORDER BY _src DESC) AS _rn
  FROM tagged)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority,
       CAST(_src AS INTEGER) AS from_change_batch
FROM ranked WHERE _rn = 1
""".strip(),
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert a change batch into the orders snapshot: updated keys
    replace their old row, new keys append — one shuffle total."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    )
    tagged = _orders_change_batch(o).withColumn(
        "_src", F.lit(1)
    ).unionByName(o.withColumn("_src", F.lit(0)))
    w = Window.partitionBy("o_orderkey").orderBy(F.col("_src").desc())
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
            F.col("_src").alias("from_change_batch"),
        )
    )


# --- SCD Type-2 interval construction (temporal dimension build): runs
# of consecutive equal attribute values per key collapse into validity
# intervals [valid_from, valid_to). Value-change islands — the temporal
# twin of sessionize_events' gap islands. Two window passes + one
# aggregate, all partitioned on the dimension key. -------------------------


# Shared by the SCD2 build and the point-in-time join oracle below.
_SCD2_EPOCHS_CTE = """
seq AS (
  SELECT o_custkey, o_orderkey, o_orderpriority,
         CAST(o_orderdate AS TIMESTAMP) AS od,
         CASE WHEN LAG(o_orderpriority) OVER w IS DISTINCT FROM
                   o_orderpriority THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
isl AS (
  SELECT *, SUM(chg) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey
                           ROWS UNBOUNDED PRECEDING) AS epoch
  FROM seq),
agg AS (
  SELECT o_custkey, o_orderpriority AS priority, epoch,
         MIN(od) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM isl GROUP BY o_custkey, o_orderpriority, epoch),
epochs AS (
  SELECT o_custkey, priority, CAST(epoch AS BIGINT) AS epoch, valid_from,
         LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY epoch)
           AS valid_to,
         n_orders
  FROM agg)
""".strip()


@register(
    "scd2_priority_epochs",
    oracle=f"""
WITH {_SCD2_EPOCHS_CTE}
SELECT o_custkey, priority, epoch, valid_from, valid_to, n_orders
FROM epochs
""".strip(),
)
def scd2_priority_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 build: per customer, collapse consecutive orders with the
    same priority into one epoch row with [valid_from, valid_to);
    the current epoch's valid_to is NULL."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "od", F.col("o_orderdate").cast("timestamp")
    )
    w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    chg = F.when(
        ~F.lag("o_orderpriority").over(w).eqNullSafe(F.col("o_orderpriority")),
        1,
    ).otherwise(0)
    seq = o.select(
        "o_custkey", "o_orderkey", "o_orderpriority", "od", chg.alias("chg")
    )
    # Cumulative sum ordered by the SAME total key (od, o_orderkey) as
    # the lag pass: a tie on od between two change points would otherwise
    # give each engine's tiebreak a different per-row epoch.
    wsum = (
        Window.partitionBy("o_custkey")
        .orderBy("od", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = seq.withColumn("epoch", F.sum("chg").over(wsum))
    agg = isl.groupBy(
        "o_custkey", F.col("o_orderpriority").alias("priority"), "epoch"
    ).agg(
        F.min("od").alias("valid_from"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    wlead = Window.partitionBy("o_custkey").orderBy("epoch")
    return agg.select(
        "o_custkey",
        "priority",
        "epoch",
        "valid_from",
        F.lead("valid_from").over(wlead).alias("valid_to"),
        "n_orders",
    )


# --- point-in-time (PIT) join against the SCD2 dimension ------------------
# THE temporal-warehouse correctness pattern: enrich a fact row with
# the dimension attributes AS OF the fact's event time, never the
# current ones (the train-serve-skew killer in feature pipelines).
# Each lineitem picks its customer's priority EPOCH valid at ship
# time. Engine shape: the general as-of operator (operators/asof.py,
# backward direction) — one union-window pass co-partitioned on the
# customer key, no range-join banding. The oracle is the textbook
# BETWEEN formulation over [valid_from, valid_to); equal-valid_from
# epochs (empty intervals) resolve identically: the as-of tiebreak
# takes the greatest epoch, the BETWEEN join skips the empty one.


@register(
    "lineitem_pit_priority",
    oracle=f"""
WITH {_SCD2_EPOCHS_CTE},
li AS (
  SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
         CAST(l.l_shipdate AS TIMESTAMP) AS sd
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT li.l_orderkey, li.l_linenumber, li.o_custkey,
       epoch_us(li.sd) AS ship_us,
       e.epoch, e.priority AS priority_at_ship,
       epoch_us(e.valid_from) AS epoch_from_us
FROM li JOIN epochs e
  ON e.o_custkey = li.o_custkey AND e.valid_from <= li.sd
 AND (e.valid_to IS NULL OR li.sd < e.valid_to)
""".strip(),
)
def lineitem_pit_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    epochs = scd2_priority_epochs(spark, sf_dir).select(
        "o_custkey",
        F.col("valid_from").alias("ts"),
        "epoch",
        "priority",
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("timestamp").alias("ts"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_custkey", "ts")
    )
    j = asof_join(
        li,
        epochs,
        key="o_custkey",
        ts="ts",
        direction="backward",
        tiebreak_col="epoch",
    )
    # inner PIT semantics: facts before the dimension's first epoch
    # (possible in the synthetic data, where a ship date can precede
    # the customer's first order date) carry no as-of row and drop,
    # mirroring the oracle's inner BETWEEN join
    return j.where(F.col("asof").isNotNull()).select(
        "l_orderkey",
        "l_linenumber",
        "o_custkey",
        F.unix_micros("ts").alias("ship_us"),
        F.col("asof.epoch").alias("epoch"),
        F.col("asof.priority").alias("priority_at_ship"),
        F.unix_micros("asof.ts").alias("epoch_from_us"),
    )


# --- exact-integer equi-width histogram (profiling primitive). Bucket
# boundaries computed in cents with integer division, so bucket
# assignment is bit-deterministic across engines — no float-boundary
# ties. Two-pass: tiny global-extent aggregate broadcast to the scan. ------


@register(
    "order_price_histogram",
    oracle="""
WITH ext AS (
  SELECT MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cmin,
         MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cmax
  FROM orders)
SELECT CAST((CAST(ROUND(o_totalprice * 100) AS BIGINT) - cmin) * 20
            // (cmax - cmin + 1) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0, 4) AS total_value
FROM orders, ext
GROUP BY 1
""".strip(),
)
def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bucket equi-width histogram of order value; the global extent
    is a 1-row broadcast, the histogram itself one map-side-combined
    aggregate over the scan."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    ext = o.agg(
        F.min(cents).alias("cmin"), F.max(cents).alias("cmax")
    )
    return (
        o.crossJoin(F.broadcast(ext))
        .groupBy(
            F.expr(
                "CAST((CAST(ROUND(o_totalprice * 100) AS BIGINT) - cmin) * 20"
                " DIV (cmax - cmin + 1) AS BIGINT)"
            ).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(cents).cast("double") / 100.0, 4).alias("total_value"),
        )
    )


# --- TPC-H Q3 shape: shipping-priority top-k — segment-filtered
# customers (broadcast) drive orders⨝lineitem; revenue per order;
# global top 10. The plan to assert: one fact shuffle for the o⨝l join,
# TakeOrderedAndProject for the limit (per-partition heap, no global
# sort). Revenue summed in exact integer 1e4-ths. --------------------------


@register(
    "shipping_priority_top10",
    oracle="""
SELECT l.l_orderkey,
       ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
             * 10000) AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS revenue,
       CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND CAST(o.o_orderdate AS DATE) < DATE '1998-03-15'
  AND CAST(l.l_shipdate AS DATE) > DATE '1996-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""".strip(),
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.to_date("o_orderdate") < F.lit("1998-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate") > F.lit("1996-03-15").cast("date")
    )
    rev_s = scaled_long(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("timestamp").alias("o_orderdate"))
        .agg(
            F.round(F.sum(rev_s).cast("double") / 10_000.0, 4).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --- TPC-H Q14 shape: promo revenue share — conditional aggregate over
# one join; both the numerator and denominator come out of a single
# pass (no second scan, no self-join). -------------------------------------


@register(
    "promo_revenue_share",
    oracle="""
SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
             THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                  AS BIGINT) ELSE 0 END)
       / SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
             AS BIGINT)), 4) AS promo_pct,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE CAST(l.l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
""".strip(),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate").between("1996-01-01", "1996-12-31")
    )
    p = load_table(spark, sf_dir, "part")
    rev_s = scaled_long(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000
    )
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev_s).otherwise(F.lit(0)))
    total = F.sum(rev_s)
    return joined.agg(
        F.round(F.lit(100.0) * promo / total, 4).alias("promo_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- TPC-H Q19 shape: disjunctive predicate pushdown — three OR'd
# (brand, size-range, quantity-range) conjunctions. Catalyst pushes the
# common l_quantity bounds down to the fact scan and evaluates the
# disjunction post-join; the part side broadcasts. -------------------------


@register(
    "disjunctive_promo_revenue",
    oracle="""
SELECT ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
             * 10000) AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 10 AND 25
       AND l.l_quantity BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 20 AND 40
       AND l.l_quantity BETWEEN 20 AND 50)
""".strip(),
)
def disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev_s = scaled_long(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000
    )
    def leg(brand, s_lo, s_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
    cond = (
        leg("Brand#1", 1, 10, 1, 20)
        | leg("Brand#13", 10, 25, 10, 35)
        | leg("Brand#23", 20, 40, 20, 50)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.round(F.sum(rev_s).cast("double") / 10_000.0, 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- data profiling: per-column stats in ONE scan. All six columns'
# (count, nulls, distinct, min, max) aggregates compute in a single
# agg — Catalyst plans the multi-distinct via Expand, still one pass
# over the data — then the 1-row result unpivots to a row per column.
# The profiling step every ingest pipeline runs before accepting a
# drop; at 100 TB the one-scan shape is the difference between a
# profile and six. ---------------------------------------------------------

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


@register(
    "orders_column_profile",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_repr,
       CAST(MAX({c}) AS VARCHAR) AS max_repr
FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    )
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = o.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_repr"),
                F.col(f"{c}__max").alias("max_repr"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")


# --- per-user lifetime profile: the serving-layer user table (first/last
# seen, events, active days, value). One shuffle on user_id; mean value
# is an exact scaled-integer sum with one final division. -------------------


@register(
    "user_activity_summary",
    oracle="""
SELECT user_id,
       MIN(ts) AS first_seen,
       MAX(ts) AS last_seen,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_active_days,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_value,
       CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS lifetime_us
FROM events
GROUP BY user_id
""".strip(),
)
def user_activity_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.stable import scaled_long

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(F.to_date("ts")).alias("n_active_days"),
        (F.sum(scaled_long(F.col("value"), 100)).cast("double") / 100.0).alias(
            "total_value"
        ),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "lifetime_us"
        ),
    )


# --- order-fulfillment lag: days from order to each line's ship date,
# profiled per order priority — the ops-latency table. Exact integer day
# diffs; the mean is one division of exact sums. ----------------------------


@register(
    "order_fulfillment_lag",
    oracle="""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(MIN(date_diff('day', CAST(o.o_orderdate AS DATE),
                          CAST(l.l_shipdate AS DATE))) AS BIGINT) AS min_lag_days,
       CAST(MAX(date_diff('day', CAST(o.o_orderdate AS DATE),
                          CAST(l.l_shipdate AS DATE))) AS BIGINT) AS max_lag_days,
       CAST(SUM(date_diff('day', CAST(o.o_orderdate AS DATE),
                          CAST(l.l_shipdate AS DATE))) AS DOUBLE) / COUNT(*)
         AS mean_lag_days
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
""".strip(),
)
def order_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("od")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    lag = F.datediff(F.col("sd"), F.col("od")).cast("long")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min(lag).alias("min_lag_days"),
            F.max(lag).alias("max_lag_days"),
            (F.sum(lag).cast("double") / F.count(F.lit(1))).alias(
                "mean_lag_days"
            ),
        )
    )


# --- open-order backlog over time: event-sourcing state reconstruction.
# Each order contributes +1 at its order date and -1 at its FIRST ship
# date; the running sum over the date line is the number of orders with
# at least one unshipped day — the classic as-of inventory/backlog
# shape. Deltas aggregate per day first (tiny), so the cumulative window
# runs over |dates| rows, not |orders|. Exact integers throughout. ----------


@register(
    "orders_backlog_over_time",
    oracle="""
WITH first_ship AS (
  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS ship_d
  FROM lineitem GROUP BY l_orderkey),
deltas AS (
  SELECT CAST(o.o_orderdate AS DATE) AS d, 1 AS delta
  FROM orders o
  UNION ALL
  SELECT f.ship_d AS d, -1 AS delta
  FROM orders o JOIN first_ship f ON o.o_orderkey = f.l_orderkey),
daily AS (
  SELECT d, CAST(SUM(delta) AS BIGINT) AS net FROM deltas GROUP BY d)
SELECT d, net,
       CAST(SUM(net) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS open_orders
FROM daily
""".strip(),
)
def orders_backlog_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_running_sum

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    first_ship = li.groupBy("l_orderkey").agg(F.min("sd").alias("ship_d"))
    plus = o.select(F.col("od").alias("d"), F.lit(1).alias("delta"))
    minus = o.join(first_ship, o.o_orderkey == first_ship.l_orderkey).select(
        F.col("ship_d").alias("d"), F.lit(-1).alias("delta")
    )
    daily = (
        plus.unionByName(minus)
        .groupBy("d")
        .agg(F.sum("delta").alias("net"))
    )
    # Global running sum over the date line WITHOUT a single-partition
    # window — the distributed construction from operators/rank.py.
    return with_global_running_sum(daily, ["d"], "net", "open_orders").select(
        "d", "net", F.col("open_orders").cast("long").alias("open_orders")
    )


# --- CDC / SCD-1 merge (upsert-apply): the batch MERGE INTO that any
# warehouse sync needs — base snapshot + change batch → next snapshot.
# The change batch is derived deterministically from the fixture: every
# order whose key ≡ 3 (mod 7) arrives as an UPDATE (status → 'U', price
# +10%), every key ≡ 5 (mod 7) as a DELETE, and synthetic keys (max+rank)
# as INSERTs. Spark plan: one full-outer join on the key + coalesce per
# column — no Delta/iceberg runtime needed; at 100 TB both sides shuffle
# once on o_orderkey (or zero times if the snapshot is bucketed on it),
# and the change side is typically small enough to broadcast. Mirrors
# MERGE semantics exactly: matched+update, matched+delete,
# not-matched+insert. ------------------------------------------------------


# The derived change batch + merge, shared VERBATIM by the
# cdc_merge_apply and snapshot_diff_classes oracles — one definition,
# so a change to the mod constants / insert count / price factor can't
# leave one oracle verifying a stale change rule.
_CDC_CHANGES_AND_MERGED_SQL = """
changes AS (
  SELECT o_orderkey, 'U' AS op,
         o_custkey, 'U' AS o_orderstatus,
         o_totalprice * 1.1 AS o_totalprice
  FROM orders WHERE o_orderkey % 7 = 3
  UNION ALL
  SELECT o_orderkey, 'D', NULL, NULL, NULL
  FROM orders WHERE o_orderkey % 7 = 5
  UNION ALL
  SELECT mk + ROW_NUMBER() OVER (ORDER BY c_custkey) AS o_orderkey,
         'I', c_custkey, 'N', 100.0
  FROM (SELECT c_custkey FROM customer
        GROUP BY c_custkey ORDER BY c_custkey LIMIT 10)
  CROSS JOIN (SELECT MAX(o_orderkey) AS mk FROM orders)),
merged AS (
  SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
         CASE WHEN c.op IN ('U','I') THEN c.o_custkey
              ELSE b.o_custkey END AS o_custkey,
         CASE WHEN c.op IN ('U','I') THEN c.o_orderstatus
              ELSE b.o_orderstatus END AS o_orderstatus,
         CASE WHEN c.op IN ('U','I') THEN c.o_totalprice
              ELSE b.o_totalprice END AS o_totalprice,
         c.op
  FROM orders b FULL OUTER JOIN changes c USING (o_orderkey))
""".strip()


@register(
    "cdc_merge_apply",
    oracle=f"""
WITH {_CDC_CHANGES_AND_MERGED_SQL}
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM merged
WHERE op IS DISTINCT FROM 'D'
""".strip(),
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer")
    max_key = orders.agg(F.max("o_orderkey").alias("mk"))
    inserts = (
        customer.groupBy("c_custkey")
        .agg(F.min("c_name").alias("c_name"))
        .orderBy("c_custkey")
        .limit(10)
        .withColumn(
            "rn", F.row_number().over(Window.orderBy("c_custkey"))
        )
        .crossJoin(F.broadcast(max_key))
        .select(
            (F.col("mk") + F.col("rn")).alias("o_orderkey"),
            F.lit("I").alias("op"),
            F.col("c_custkey").alias("o_custkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
        )
    )
    updates = orders.where(F.col("o_orderkey") % 7 == 3).select(
        "o_orderkey",
        F.lit("U").alias("op"),
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
    )
    deletes = orders.where(F.col("o_orderkey") % 7 == 5).select(
        "o_orderkey",
        F.lit("D").alias("op"),
        F.lit(None).cast("long").alias("o_custkey"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    b = orders.alias("b")
    c = changes.alias("c")
    merged = b.join(c, on="o_orderkey", how="full_outer").select(
        F.col("o_orderkey"),
        F.when(F.col("c.op").isin("U", "I"), F.col("c.o_custkey"))
        .otherwise(F.col("b.o_custkey"))
        .alias("o_custkey"),
        F.when(F.col("c.op").isin("U", "I"), F.col("c.o_orderstatus"))
        .otherwise(F.col("b.o_orderstatus"))
        .alias("o_orderstatus"),
        # raw IEEE product, NOT rounded: ROUND on a rational-valued
        # double diverges between engines at decimal ties (stable.py).
        F.when(F.col("c.op").isin("U", "I"), F.col("c.o_totalprice"))
        .otherwise(F.col("b.o_totalprice"))
        .alias("o_totalprice"),
        F.col("c.op").alias("op"),
    )
    return merged.where(
        ~F.col("op").eqNullSafe("D")
    ).drop("op")


# --- Snapshot reconciliation (the verification direction of CDC): diff
# the base snapshot against the merge-applied snapshot and classify every
# key as unchanged / updated / inserted / deleted. At 100 TB this is the
# standard data-integrity sweep after any backfill or migration: one
# full-outer join on the key (zero shuffles if both snapshots are
# bucketed on it), null-safe per-column comparison — NOT row-hash
# strings, whose float rendering is engine-specific — then a tiny
# class-count aggregate. Run here against cdc_merge_apply's own output,
# so the diff must recover exactly the change ops that were applied. ------


@register(
    "snapshot_diff_classes",
    oracle=f"""
WITH {_CDC_CHANGES_AND_MERGED_SQL},
next_snap AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM merged WHERE op IS DISTINCT FROM 'D'),
diff AS (
  SELECT CASE
           WHEN b.o_orderkey IS NULL THEN 'inserted'
           WHEN n.o_orderkey IS NULL THEN 'deleted'
           WHEN b.o_custkey IS NOT DISTINCT FROM n.o_custkey
            AND b.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
            AND b.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
             THEN 'unchanged'
           ELSE 'updated'
         END AS change_class
  FROM (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders) b
  FULL OUTER JOIN next_snap n USING (o_orderkey))
SELECT change_class, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM diff GROUP BY change_class
""".strip(),
)
def snapshot_diff_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    nxt = cdc_merge_apply(spark, sf_dir)
    # explicit presence markers: attribute-null heuristics would
    # misclassify a legitimately all-null row as absent
    b = base.withColumn("_in_base", F.lit(1)).alias("b")
    n = nxt.withColumn("_in_next", F.lit(1)).alias("n")
    joined = b.join(n, on="o_orderkey", how="full_outer")
    same = (
        F.col("b.o_custkey").eqNullSafe(F.col("n.o_custkey"))
        & F.col("b.o_orderstatus").eqNullSafe(F.col("n.o_orderstatus"))
        & F.col("b.o_totalprice").eqNullSafe(F.col("n.o_totalprice"))
    )
    change = (
        F.when(F.col("b._in_base").isNull(), F.lit("inserted"))
        .when(F.col("n._in_next").isNull(), F.lit("deleted"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("updated"))
    )
    return joined.select(change.alias("change_class")).groupBy(
        "change_class"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))


# --- File-provenance audit: per-input-file row counts + key ranges via
# the `_metadata` hidden column (file-source metadata, Spark 3.5+). The
# standard 100 TB ingestion-integrity sweep: after any backfill, verify
# each physical file's row count and key span without a separate
# manifest — provenance comes from the scan itself, costs one pass, and
# partition-prunes like any other read. The oracle reconstructs the
# expected per-file stats relationally (the driver registers views, not
# file paths; the testdata layout is one file per table, TESTDATA.md),
# so the Spark side's _metadata plumbing is what's actually under test. -----

_PROV_TABLES = [
    ("customer", "customer.parquet", "c_custkey"),
    ("documents", "documents.parquet", "doc_id"),
    ("orders", "orders.parquet", "o_orderkey"),
]


@register(
    "file_provenance_audit",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{t}' AS table_name, '{f}' AS file_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN({k}) AS BIGINT) AS min_key,
       CAST(MAX({k}) AS BIGINT) AS max_key
FROM {t}"""
        for t, f, k in _PROV_TABLES
    ),
)
def file_provenance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for t, _f, k in _PROV_TABLES:
        df = load_table(spark, sf_dir, t)
        parts.append(
            df.groupBy(
                F.lit(t).alias("table_name"),
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("file_name"),
            ).agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.min(k).cast("long").alias("min_key"),
                F.max(k).cast("long").alias("max_key"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- Correlated LATERAL subquery (Spark 4 SQL surface): per-customer
# top-2 orders by price as a LATERAL derived table — the SQL-standard
# spelling of "top-k per group" (the window row_number() form is pinned
# elsewhere, e.g. shipping_priority_top10). Catalyst rewrites the
# correlated LATERAL into a join + per-key limit, so at 100 TB it plans
# like the window variant: one shuffle on the correlation key, no
# driver loop. Pinned with a value oracle (DuckDB LATERAL is
# semantically identical); ties broken by o_orderkey for determinism. ------


# One SQL text for BOTH engines — the whole point is engine parity of
# the LATERAL surface, so the statement must not be able to drift
# between the Spark run and the oracle.
_LATERAL_TOP2_SQL = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM (SELECT c_custkey FROM customer WHERE c_custkey < 100) c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
""".strip()


@register("lateral_top2_orders", oracle=_LATERAL_TOP2_SQL)
def lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(_LATERAL_TOP2_SQL)


# --- Iterative PageRank over the part co-purchase graph (parts joined
# by appearing in the same order): the second iterative graph operator
# beside dedup_components. Exact-integer fixed-point arithmetic
# (operators/pagerank.py) makes all 8 power-iteration rounds
# bit-identical across engines — a float PageRank could never be
# value-oracled because double partial-sum order differs — so the
# oracle is the same recurrence unrolled as 8 chained CTEs. -----------------

_PR_ITERS = 8

# Graph-construction cutoff shared by every co-purchase operator
# (pagerank / triangles / k-core) and their oracles/tests.
COPURCHASE_SHIPDATE_LO = "1998-01-01"


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recent part co-purchase graph (parts appearing in the same
    order) as a directed (src, dst) edge frame — the ONE edge recipe
    all graph operators and their tests build from. The shipdate
    predicate is pushed to the parquet scan on BOTH join sides,
    bounding graph construction — at 100 TB you build the graph from
    the partitions you care about, not the full history."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.to_date("l_shipdate")
            >= F.lit(COPURCHASE_SHIPDATE_LO).cast("date")
        )
        .select("l_orderkey", "l_partkey")
    )
    # Per-order pair generation (round 11): one groupBy(order) + a
    # map-side nested-transform explode over the per-order part LIST —
    # bit-identical to the former lineitem self-join's output multiset
    # (all ordered pairs of distinct-valued line rows within an order),
    # at roughly half the cost: the join's second scan + second
    # orderkey shuffle disappear, and collect_list partial-aggregates
    # map-side. Baskets are small and bounded, so the ≤|basket|²
    # explode is cheap.
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_list("l_partkey").alias("ps")
    )
    return (
        per_order.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, x -> "
                    "transform(ps, y -> struct(x AS src, y AS dst))))"
                )
            ).alias("p")
        )
        .where(F.col("p.src") != F.col("p.dst"))
        .select("p.src", "p.dst")
    )


def _pagerank_oracle() -> str:
    from ..operators.pagerank import BASE, DAMP_DEN, DAMP_NUM, SCALE

    iters = []
    for i in range(1, _PR_ITERS + 1):
        iters.append(
            f"""r{i} AS (
  SELECT n.node,
         CAST({BASE}
              + {DAMP_NUM} * (COALESCE(c.contrib, 0) // {DAMP_DEN})
              + ({DAMP_NUM} * (COALESCE(c.contrib, 0) % {DAMP_DEN}))
                // {DAMP_DEN}
              AS BIGINT) AS rank
  FROM (SELECT src AS node FROM deg) n
  LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(r.rank // g.outdeg) AS BIGINT) AS contrib
    FROM edges e JOIN r{i - 1} r ON e.src = r.node JOIN deg g ON e.src = g.src
    GROUP BY e.dst) c USING (node))"""
        )
    joined = ",\n".join(iters)
    return f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01'),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT src AS node, CAST({SCALE} AS BIGINT) AS rank FROM deg),
{joined}
SELECT node AS part_key, rank AS pagerank_scaled FROM r{_PR_ITERS}
""".strip()


@register("part_copurchase_pagerank", oracle=_pagerank_oracle())
def part_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pagerank import pagerank

    edges = copurchase_edges(spark, sf_dir).distinct()
    return pagerank(edges, n_iter=_PR_ITERS).select(
        F.col("node").alias("part_key"), "pagerank_scaled"
    )


# --- Personalized PageRank on the co-purchase graph -----------------------
# "Related items": random walks restarting at a seed basket — here the
# 5 highest-degree parts (ties → smallest key) — so rank mass decays
# with distance from the seeds (operators/pagerank.py:
# personalized_pagerank; exact-integer protocol, chained-CTE oracle
# replay like part_copurchase_pagerank/lpa). Output is the bounded
# top-50 by scaled rank (integer ties → key order: deterministic).

_PPR_SEEDS = 5
_PPR_TOPK = 50


def _ppr_oracle() -> str:
    from ..operators.pagerank import BASE, DAMP_DEN, DAMP_NUM, SCALE

    iters = []
    for i in range(1, _PR_ITERS + 1):
        iters.append(
            f"""r{i} AS (
  SELECT n.node,
         CAST(n.nbase
              + {DAMP_NUM} * (COALESCE(c.contrib, 0) // {DAMP_DEN})
              + ({DAMP_NUM} * (COALESCE(c.contrib, 0) % {DAMP_DEN}))
                // {DAMP_DEN}
              AS BIGINT) AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(r.rank // g.outdeg) AS BIGINT) AS contrib
    FROM edges e JOIN r{i - 1} r ON e.src = r.node JOIN deg g ON e.src = g.src
    GROUP BY e.dst) c USING (node))"""
        )
    joined = ",\n".join(iters)
    return f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01'),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
seeds AS MATERIALIZED (
  SELECT src AS node FROM deg
  ORDER BY outdeg DESC, src ASC LIMIT {_PPR_SEEDS}),
nodes AS MATERIALIZED (
  SELECT d.src AS node,
         CAST(CASE WHEN s.node IS NOT NULL THEN {BASE} ELSE 0 END
              AS BIGINT) AS nbase,
         CAST(CASE WHEN s.node IS NOT NULL THEN {SCALE} ELSE 0 END
              AS BIGINT) AS r0v
  FROM deg d LEFT JOIN seeds s ON d.src = s.node),
r0 AS (SELECT node, r0v AS rank FROM nodes),
{joined}
SELECT node AS part_key, rank AS ppr_scaled FROM r{_PR_ITERS}
ORDER BY ppr_scaled DESC, part_key ASC LIMIT {_PPR_TOPK}
""".strip()


@register("part_copurchase_ppr", oracle=_ppr_oracle())
def part_copurchase_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pagerank import personalized_pagerank

    edges = copurchase_edges(spark, sf_dir).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    seeds = (
        deg.orderBy(F.col("outdeg").desc(), F.col("src").asc())
        .limit(_PPR_SEEDS)
        .select("src")
    )
    return (
        personalized_pagerank(edges, seeds, n_iter=_PR_ITERS)
        .orderBy(F.col("ppr_scaled").desc(), F.col("node").asc())
        .limit(_PPR_TOPK)
        .select(F.col("node").alias("part_key"), "ppr_scaled")
    )


# --- Triangle counting on the same co-purchase graph (degree-ordered
# orientation — operators/triangles.py): per-part triangle participation,
# the clustering-structure complement to PageRank's centrality. Exact
# integers end-to-end, so the oracle is the same orientation + wedge
# join in DuckDB. ----------------------------------------------------------

_TRI_TOPK = 20

_TRI_ORACLE = f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01'),
und AS (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                  GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
  GROUP BY node),
o AS (
  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v)
              THEN und.u ELSE und.v END AS a,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v)
              THEN und.v ELSE und.u END AS b
  FROM und JOIN deg du ON und.u = du.node JOIN deg dv ON und.v = dv.node),
tri AS (
  SELECT o1.a AS x, o1.b AS y, o2.b AS z
  FROM o o1 JOIN o o2 ON o1.b = o2.a JOIN o o3 ON o3.a = o1.a AND o3.b = o2.b)
SELECT node AS part_key, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (SELECT x AS node FROM tri UNION ALL SELECT y AS node FROM tri
      UNION ALL SELECT z AS node FROM tri)
GROUP BY node
ORDER BY n_triangles DESC, part_key ASC
LIMIT {_TRI_TOPK}
""".strip()


@register("part_copurchase_triangles", oracle=_TRI_ORACLE)
def part_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.triangles import triangle_counts

    edges = copurchase_edges(spark, sf_dir)
    return (
        triangle_counts(edges)
        .select(F.col("node").alias("part_key"), "n_triangles")
        .orderBy(F.col("n_triangles").desc(), F.col("part_key").asc())
        .limit(_TRI_TOPK)
    )


# --- declarative data-quality expectations (Deequ-style, one pass) --------
# A pipeline admission gate as a QUERY: each expectation row reports an
# exact rational metric (num/den BIGINTs — never a rounded float, so
# the report is bit-comparable) plus its pass flag. All expectations
# over a table come out of ONE aggregate pass (map-side partials; the
# count-distinct expands the same scan, nothing re-reads the table),
# so the 100 TB cost is the same scan the pipeline's first real job
# pays anyway. Constraint set mirrors the checks the reference applies
# imperatively (row-count guards, NaN repair preconditions —
# Main.scala:191-195's repair assumes value completeness).

_DQ_EXPECTATIONS = [
    # (table, expectation, num_sql_duck, den_sql_duck)
    ("orders", "o_orderkey_unique",
     "COUNT(DISTINCT o_orderkey)", "COUNT(*)"),
    ("orders", "o_custkey_complete",
     "COUNT(o_custkey)", "COUNT(*)"),
    ("orders", "o_totalprice_positive",
     "COUNT(*) FILTER (WHERE o_totalprice > 0)", "COUNT(*)"),
    ("lineitem", "l_pk_unique",
     "COUNT(DISTINCT (l_orderkey, l_linenumber))", "COUNT(*)"),
    ("lineitem", "l_discount_in_unit_range",
     "COUNT(*) FILTER (WHERE l_discount >= 0 AND l_discount <= 1)",
     "COUNT(*)"),
    ("lineitem", "l_shipdate_complete",
     "COUNT(l_shipdate)", "COUNT(*)"),
]


@register(
    "dq_expectations_report",
    oracle=f"""
{" UNION ALL ".join(
    f"SELECT '{t}' AS table_name, '{name}' AS expectation, "
    f"CAST({num} AS BIGINT) AS metric_num, "
    f"CAST({den} AS BIGINT) AS metric_den, "
    f"CAST(CASE WHEN {num} = {den} THEN 1 ELSE 0 END AS INTEGER) AS passed "
    f"FROM {t}"
    for t, name, num, den in _DQ_EXPECTATIONS
)}
""".strip(),
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark_metrics = {
        "o_orderkey_unique": (
            F.countDistinct("o_orderkey"), F.count(F.lit(1))),
        "o_custkey_complete": (F.count("o_custkey"), F.count(F.lit(1))),
        "o_totalprice_positive": (
            F.count_if(F.col("o_totalprice") > 0), F.count(F.lit(1))),
        "l_pk_unique": (
            F.countDistinct(F.struct("l_orderkey", "l_linenumber")),
            F.count(F.lit(1))),
        "l_discount_in_unit_range": (
            F.count_if(
                (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1)),
            F.count(F.lit(1))),
        "l_shipdate_complete": (F.count("l_shipdate"), F.count(F.lit(1))),
    }
    reports = []
    for table in ("orders", "lineitem"):
        names = [n for t, n, _, _ in _DQ_EXPECTATIONS if t == table]
        aggs = []
        for n in names:
            num, den = spark_metrics[n]
            aggs += [
                num.cast("long").alias(f"{n}__num"),
                den.cast("long").alias(f"{n}__den"),
            ]
        one = load_table(spark, sf_dir, table).agg(*aggs)
        # one row → one row per expectation: stack() is a pure project
        # over the single aggregate row (no extra pass, no shuffle).
        stacked = one.select(
            F.lit(table).alias("table_name"),
            F.expr(
                "stack({}, {})".format(
                    len(names),
                    ", ".join(
                        f"'{n}', {n}__num, {n}__den" for n in names
                    ),
                )
            ).alias("expectation", "metric_num", "metric_den"),
        )
        reports.append(stacked)
    out = reports[0].unionByName(reports[1])
    return out.withColumn(
        "passed",
        (F.col("metric_num") == F.col("metric_den")).cast("int"),
    )


# --- k-core of the co-purchase graph (iterative peel — operators/
# kcore.py): the dense-cohesion complement to PageRank's centrality and
# triangles' local clustering. The peel's round count is
# data-dependent, but a peel applied past its fixpoint is the IDENTITY
# — so a chained-CTE oracle unrolled to R rounds is exact whenever the
# fixture's peel depth ≤ R (the LPA / greedy-coverage protocol for
# data-dependent loops). Measured depths at the oracle SFs: 3 rounds
# at sf0.001, 5 at sf0.01; the unroll carries R = 8. A deeper peel
# can't silently pass: the Spark side runs to the true fixpoint, so a
# depth > R fixture HASH-MISMATCHES the R-round oracle (and the
# operator's own round budget fails loud long before). Exactness on
# arbitrary graphs is additionally pinned by tests/test_kcore.py
# against a pure-Python reference peel. -------------------------------------

_KCORE_K = 22
_PEEL_UNROLL = 8  # ≥ measured peel depth at every oracle SF, with margin


def _kcore_oracle() -> str:
    rounds = []
    for i in range(1, _PEEL_UNROLL + 1):
        rounds.append(
            f"""d{i} AS MATERIALIZED (
  SELECT node, COUNT(*) AS deg
  FROM (SELECT u AS node FROM e{i - 1}
        UNION ALL SELECT v AS node FROM e{i - 1})
  GROUP BY node),
e{i} AS MATERIALIZED (
  SELECT e.u, e.v
  FROM e{i - 1} e
  JOIN d{i} a ON e.u = a.node JOIN d{i} b ON e.v = b.node
  WHERE a.deg >= {_KCORE_K} AND b.deg >= {_KCORE_K})"""
        )
    joined = ",\n".join(rounds)
    return f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                  GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
{joined}
SELECT node AS part_key, CAST(COUNT(*) AS BIGINT) AS core_deg
FROM (SELECT u AS node FROM e{_PEEL_UNROLL}
      UNION ALL SELECT v AS node FROM e{_PEEL_UNROLL})
GROUP BY node
""".strip()


@register("part_copurchase_kcore", oracle=_kcore_oracle())
def part_copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kcore import kcore_nodes

    edges = copurchase_edges(spark, sf_dir)
    return kcore_nodes(edges, k=_KCORE_K).select(
        F.col("node").alias("part_key"), "core_deg"
    )


# --- k-truss of the co-purchase graph (iterative edge peel —
# operators/ktruss.py): edge-level cohesion, the community backbone
# one notch stronger than k-core's node criterion. Oracle-backed by
# the same past-fixpoint-is-identity unroll as k-core (measured depths
# 6 at sf0.001, 3 at sf0.01; unroll 8): each round recomputes edge
# support (common-neighbor count via the symmetrized wedge join) on
# the live set and keeps support ≥ k−2 — edges closing zero triangles
# fall out of the support join, matching the operator's semi-join
# drop. The final support is recomputed ON the fixpoint set (the
# operator returns the keep-round's support). -------------------------------

_KTRUSS_K = 9


def _ktruss_oracle() -> str:
    rounds = []
    for i in range(1, _PEEL_UNROLL + 1):
        rounds.append(
            f"""s{i} AS MATERIALIZED (
  SELECT e.u, e.v, COUNT(*) AS support
  FROM e{i - 1} e
  JOIN (SELECT u AS a, v AS b FROM e{i - 1}
        UNION ALL SELECT v AS a, u AS b FROM e{i - 1}) p ON p.a = e.u
  JOIN (SELECT u AS a, v AS b FROM e{i - 1}
        UNION ALL SELECT v AS a, u AS b FROM e{i - 1}) q
    ON q.a = e.v AND q.b = p.b
  GROUP BY e.u, e.v),
e{i} AS MATERIALIZED (
  SELECT u, v FROM s{i} WHERE support >= {_KTRUSS_K - 2})"""
        )
    joined = ",\n".join(rounds)
    n = _PEEL_UNROLL
    return f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                  GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
{joined},
sfin AS (
  SELECT e.u, e.v, COUNT(*) AS support
  FROM e{n} e
  JOIN (SELECT u AS a, v AS b FROM e{n}
        UNION ALL SELECT v AS a, u AS b FROM e{n}) p ON p.a = e.u
  JOIN (SELECT u AS a, v AS b FROM e{n}
        UNION ALL SELECT v AS a, u AS b FROM e{n}) q
    ON q.a = e.v AND q.b = p.b
  GROUP BY e.u, e.v)
SELECT u AS part_key_1, v AS part_key_2,
       CAST(support AS BIGINT) AS support
FROM sfin
""".strip()


@register("part_copurchase_ktruss", oracle=_ktruss_oracle())
def part_copurchase_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ktruss import ktruss_edges

    edges = copurchase_edges(spark, sf_dir)
    return ktruss_edges(edges, k=_KTRUSS_K).select(
        F.col("u").alias("part_key_1"),
        F.col("v").alias("part_key_2"),
        "support",
    )


# --- incremental materialized-view maintenance (join delta algebra) -------
# The engine capability behind "don't recompute the view, maintain it":
# for an insert-only batch (ΔA into orders, ΔB into lineitem) the delta
# of the join view V = A ⋈ B is exactly
#     ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
# — three joins each bounded by a DELTA-sized side, never a recompute
# of V. At 100 TB the delta sides broadcast (or bloom-prune the base
# scan — see the runtime-filter recipe in tests/test_plans.py) and the
# view stays a partitioned table the delta appends to. The oracle IS
# the definition being maintained against: full view EXCEPT ALL old
# view — so the query proves the delta algebra equals recompute-diff,
# multiset-exact. Deterministic split: key-mod predicates stand in for
# the arriving batch.

_MV_DELTA_A = "o_orderkey % 7 = 0"   # "newly inserted" orders
_MV_DELTA_B = "l_orderkey % 5 = 0"   # "newly inserted" lineitems


@register(
    "mv_join_delta_maintenance",
    oracle=f"""
SELECT o.o_orderkey, o.o_custkey, l.l_partkey, l.l_quantity
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
EXCEPT ALL
SELECT o.o_orderkey, o.o_custkey, l.l_partkey, l.l_quantity
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE NOT (o.{_MV_DELTA_A}) AND NOT (l.{_MV_DELTA_B})
""".strip(),
)
def mv_join_delta_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    d_a = F.expr(_MV_DELTA_A)
    d_b = F.expr(_MV_DELTA_B)
    a_old, a_new = orders.where(~d_a), orders.where(d_a)
    b_old, b_new = li.where(~d_b), li.where(d_b)
    cols = ["o_orderkey", "o_custkey", "l_partkey", "l_quantity"]

    def term(a, b):
        return a.join(
            b, a["o_orderkey"] == b["l_orderkey"]
        ).select(*cols)

    return (
        term(a_new, b_old)
        .unionAll(term(a_old, b_new))
        .unionAll(term(a_new, b_new))
    )


# --- market-basket association rules (support / confidence / lift) -------
# The classic co-occurrence mining surface over order baskets: for the
# top part PAIRS by joint support, both directed rules' confidence and
# the (symmetric) lift. Counts are exact integers from one basket
# self-join (bounded per-order: the same shape as copurchase_edges);
# confidence and lift are single exact int/int IEEE divisions — no
# floats accumulate. Top-20 by (joint support, pair) is an integer
# ordering → deterministic TakeOrderedAndProject. A full Apriori/
# FP-growth generalizes this to higher-order itemsets; pairs are the
# scale-safe first pass every basket pipeline runs (k=2 candidates
# need no candidate generation at all).

_ASSOC_TOPK = 20


@register(
    "part_association_rules",
    oracle=f"""
WITH b AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM b),
item AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item
  FROM b GROUP BY l_partkey),
pair AS (
  SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS n_joint
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY a.l_partkey, c.l_partkey)
SELECT p.part_a, p.part_b, p.n_joint,
       ia.n_item AS n_a, ib.n_item AS n_b,
       CAST(p.n_joint AS DOUBLE) / CAST(ia.n_item AS DOUBLE)
         AS conf_a_to_b,
       CAST(p.n_joint AS DOUBLE) / CAST(ib.n_item AS DOUBLE)
         AS conf_b_to_a,
       CAST(p.n_joint * n.n_baskets AS DOUBLE)
         / CAST(ia.n_item * ib.n_item AS DOUBLE) AS lift
FROM pair p
JOIN item ia ON ia.l_partkey = p.part_a
JOIN item ib ON ib.l_partkey = p.part_b
CROSS JOIN n
ORDER BY p.n_joint DESC, p.part_a ASC, p.part_b ASC
LIMIT {_ASSOC_TOPK}
""".strip(),
)
def part_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    n_baskets = b.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets")
    )
    item = b.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    )
    x, y = b.alias("x"), b.alias("y")
    pair = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("part_a"),
            F.col("y.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_joint"))
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b")
    )
    return (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "part_a",
            "part_b",
            "n_joint",
            "n_a",
            "n_b",
            (
                F.col("n_joint").cast("double")
                / F.col("n_a").cast("double")
            ).alias("conf_a_to_b"),
            (
                F.col("n_joint").cast("double")
                / F.col("n_b").cast("double")
            ).alias("conf_b_to_a"),
            (
                (F.col("n_joint") * F.col("n_baskets")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
        .orderBy(
            F.col("n_joint").desc(),
            F.col("part_a").asc(),
            F.col("part_b").asc(),
        )
        .limit(_ASSOC_TOPK)
    )


# --- referential-integrity report (FK orphan audit) -----------------------
# The data-quality sibling of dq_expectations_report focused on the
# relationships: for each foreign-key edge of the schema, the child
# row count and the number of ORPHANS (child rows whose parent is
# missing), via left-anti joins — the scan-and-verify pass every
# warehouse runs after a load. Anti joins broadcast the parent-key
# side when small and shuffle otherwise (AQE's call); each check's
# scalar counts cross the single-partition exchange as partial
# aggregates only.

_RI_CHECKS = (
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
)


def _ri_oracle() -> str:
    parts = []
    for name, child, ck, parent, pk in _RI_CHECKS:
        parts.append(
            f"""SELECT '{name}' AS check_name,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}) AS n_child,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {child} c
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                          WHERE p.{pk} = c.{ck})) AS n_orphans"""
        )
    return (
        "\nUNION ALL\n".join(parts)
        .strip()
    )


@register(
    "referential_integrity_report",
    oracle=f"""
WITH checks AS (
{_ri_oracle()})
SELECT check_name, n_child, n_orphans,
       CAST(n_orphans = 0 AS INT) AS ok
FROM checks
""".strip(),
)
def referential_integrity_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    rows = []
    for name, child, ck, parent, pk in _RI_CHECKS:
        c = load_table(spark, sf_dir, child).select(F.col(ck))
        p = load_table(spark, sf_dir, parent).select(F.col(pk))
        orphans = c.join(p, c[ck] == p[pk], "left_anti")
        rows.append(
            c.agg(F.count(F.lit(1)).alias("n_child")).crossJoin(
                F.broadcast(
                    orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
                )
            ).select(
                F.lit(name).alias("check_name"),
                "n_child",
                "n_orphans",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.withColumn(
        "ok", (F.col("n_orphans") == 0).cast("int")
    )


# --- Z-order (Morton) clustering cells ------------------------------------
# The multi-dimensional data-layout primitive behind Delta/Iceberg
# OPTIMIZE ZORDER: interleave the bits of two bucketed dimensions so
# that sorting by the z-value co-locates rows close in BOTH dims, and
# per-file min/max stats then skip files for predicates on EITHER
# column. Pure integer bit arithmetic (shift/and/or), identical in any
# engine — fully oracle-able. The query buckets customers (mod 256)
# and order dates (8-day buckets mod 256), interleaves to a 16-bit
# z-value, and reports per z-cell (top-6 bits) row counts plus each
# dimension's min/max — every cell is provably a <=32x32 rectangle
# (tests pin it), which IS the file-skipping property: a z-sorted
# write keeps both columns' per-file ranges narrow. Usage at scale:
# `df.repartitionByRange(N, zval).sortWithinPartitions(zval).write...`
# — the layout step; this query is its verification surface.

_Z_BITS = 8          # per-dimension bucket bits
_Z_CELL_SHIFT = 10   # 16-bit z >> 10 → 64 cells, each a 32x32 rectangle


def _interleave_sql(x: str, y: str, bits: int) -> str:
    """Morton interleave as portable integer arithmetic: x occupies
    even bit positions, y odd."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@register(
    "orders_zorder_cells",
    oracle=f"""
WITH b AS (
  SELECT o_orderkey,
         CAST(o_custkey % 256 AS BIGINT) AS xb,
         CAST((date_diff('day', DATE '1992-01-01',
                         CAST(o_orderdate AS DATE)) // 8) % 256
              AS BIGINT) AS yb
  FROM orders),
z AS (
  SELECT o_orderkey, xb, yb,
         CAST({_interleave_sql('xb', 'yb', _Z_BITS)} AS BIGINT) AS zval
  FROM b)
SELECT CAST(zval >> {_Z_CELL_SHIFT} AS BIGINT) AS zcell,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(xb) AS min_xb, MAX(xb) AS max_xb,
       MIN(yb) AS min_yb, MAX(yb) AS max_yb
FROM z GROUP BY zcell
""".strip(),
)
def orders_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    b = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).cast("long").alias("xb"),
        (
            (
                F.datediff(
                    F.to_date("o_orderdate"),
                    F.lit("1992-01-01").cast("date"),
                )
                / F.lit(8)
            ).cast("long")
            % 256
        ).alias("yb"),
    )
    z = b.select(
        "o_orderkey",
        "xb",
        "yb",
        F.expr(_interleave_sql("xb", "yb", _Z_BITS))
        .cast("long")
        .alias("zval"),
    )
    return (
        z.groupBy(
            F.shiftright("zval", _Z_CELL_SHIFT).cast("long").alias("zcell")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("xb").alias("min_xb"),
            F.max("xb").alias("max_xb"),
            F.min("yb").alias("min_yb"),
            F.max("yb").alias("max_yb"),
        )
    )


# --- incremental materialized-view maintenance (aggregate delta) ----------
# The aggregate sibling of the join-delta algebra: a grouped
# SUM/COUNT view V is maintained under a batch of INSERTS and DELETES
# by aggregating ONLY the delta rows and merging into the view state:
#     n' = n + n_ins - n_del,  s' = s + s_ins - s_del,
# groups reaching n' = 0 drop out, unseen keys appear — a three-way
# full-outer merge on the group key, never a base rescan (SUM/COUNT
# are self-maintainable aggregates; MIN/MAX are not under deletes and
# would need the per-group top-k sidecar). Quantities ride the
# integer-scaled exact-sum protocol (functions/stable.py) so the
# merge arithmetic is associative and engine-portable. The oracle is
# the definition being maintained against: a direct recompute over
# (base \\ deletes) ∪ inserts. Deterministic split: key-mod
# predicates stand in for the arriving batch.

_MV_AGG_INS = "l_orderkey % 11 = 0"   # "newly inserted" lineitems
_MV_AGG_DEL = "l_suppkey % 13 = 0"    # deletes among the OLD base


@register(
    "mv_agg_delta_maintenance",
    oracle=f"""
WITH new_base AS (
  SELECT l_partkey, l_quantity FROM lineitem
  WHERE ({_MV_AGG_INS})
     OR (NOT ({_MV_AGG_INS}) AND NOT ({_MV_AGG_DEL})))
SELECT l_partkey AS part_key,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS sum_qty_c
FROM new_base GROUP BY l_partkey
""".strip(),
)
def mv_agg_delta_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(_MV_AGG_INS).alias("_ins"),
        F.expr(_MV_AGG_DEL).alias("_del"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("_qc"),
    )

    def agg(df, n_name, s_name):
        return df.groupBy(F.col("l_partkey").alias("part_key")).agg(
            F.count(F.lit(1)).alias(n_name),
            F.sum("_qc").alias(s_name),
        )

    old_view = agg(li.where(~F.col("_ins")), "n", "s")  # the MV state
    ins = agg(li.where(F.col("_ins")), "n_i", "s_i")
    dels = agg(
        li.where(~F.col("_ins") & F.col("_del")), "n_d", "s_d"
    )
    merged = old_view.join(ins, "part_key", "full").join(
        dels, "part_key", "full"
    )
    z = F.lit(0).cast("long")
    n_new = (
        F.coalesce("n", z) + F.coalesce("n_i", z) - F.coalesce("n_d", z)
    )
    s_new = (
        F.coalesce("s", z) + F.coalesce("s_i", z) - F.coalesce("s_d", z)
    )
    return merged.select(
        "part_key",
        n_new.cast("long").alias("n_items"),
        s_new.cast("long").alias("sum_qty_c"),
    ).where(F.col("n_items") > 0)


# --- edit-distance-1 fuzzy self-join (deletion-neighborhood blocking) -----
# Entity-resolution / typo-dedup primitive: all customer-name pairs
# within Levenshtein distance 1, WITHOUT the all-pairs comparison. Two
# strings at distance ≤1 share a key in the deletion neighborhood
# {s} ∪ {s minus position i} (the FastSS family; also the blocking
# behind SymSpell) — so the plan is: expand each name to length+1 keys
# (sequence()+transform() HOFs, JVM-side), equi-join on the key,
# dedup candidate pairs, verify with the built-in levenshtein(). At
# 100 TB this is n·(L+1) rows hash-joined on short keys with bounded
# block sizes, vs the n² quadratic scan — the same candidates-then-
# verify shape as the MinHash-LSH dedup family. The ORACLE is the
# quadratic spec (obviously-correct definition) — proving the blocked
# plan finds exactly the naive join's pairs.

@register(
    "fuzzy_name_pairs",
    oracle="""
SELECT a.c_name AS name_a, b.c_name AS name_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b ON a.c_name < b.c_name
WHERE levenshtein(a.c_name, b.c_name) <= 1""".strip(),
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = load_table(spark, sf_dir, "customer").select("c_name")
    # Join on the 64-bit HASH of each deletion-neighborhood key, not
    # the key string — the blocking join shuffles longs instead of
    # ~18-char strings (hash collisions are harmless: the levenshtein
    # predicate re-verifies every candidate). The levenshtein filter
    # runs BEFORE the distinct so the dedup shuffle carries only the
    # surviving pairs — the customer_entity_resolution discipline
    # (guide §2.3: shuffle fewer bytes, filter before the exchange).
    keyed = names.select(
        F.col("c_name").alias("name"),
        F.explode(
            F.expr(
                "transform(array_union(array(c_name),"
                " transform(sequence(1, length(c_name)), i ->"
                " concat(substring(c_name, 1, i - 1),"
                " substring(c_name, i + 1, length(c_name))))),"
                " k -> xxhash64(k))"
            )
        ).alias("key"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    cands = (
        a.join(b, "key")
        .where(
            (F.col("a.name") < F.col("b.name"))
            & (F.levenshtein("a.name", "b.name") <= 1)
        )
        .select(
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b")
        )
        .distinct()
    )
    return cands.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
    )


# --- bounded-depth BFS reachability on the co-purchase graph --------------
# "Everything within 3 hops of the seed parts": blast-radius /
# neighborhood-expansion over the same edge recipe as PageRank /
# triangles / k-core (operators/bfs.py — level-synchronous frontier
# joins, visited-set anti-join, per-round lineage truncation). Seeds
# are the parts with key ≡ 0 (mod 500) — deterministic, a handful per
# SF. Oracled against a depth-bounded recursive CTE: min hop distance
# per reachable node.

_BFS_HOPS = 3
_BFS_SEED_MOD = 500

_BFS_ORACLE = f"""
WITH RECURSIVE li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
seeds AS (SELECT DISTINCT src AS node FROM e WHERE src % {_BFS_SEED_MOD} = 0),
bfs(node, d) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, bfs.d + 1 FROM bfs JOIN e ON bfs.node = e.src
  WHERE bfs.d < {_BFS_HOPS})
SELECT CAST(node AS BIGINT) AS part_key, CAST(MIN(d) AS BIGINT) AS dist
FROM bfs GROUP BY node""".strip()


@register("part_copurchase_khop", oracle=_BFS_ORACLE)
def part_copurchase_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bfs import bfs_distances

    edges = copurchase_edges(spark, sf_dir).distinct()
    seeds = edges.where(F.col("src") % _BFS_SEED_MOD == 0).select(
        F.col("src").alias("node")
    )
    return bfs_distances(edges, seeds, max_hops=_BFS_HOPS).select(
        F.col("node").alias("part_key"), "dist"
    )


# --- Merkle-style table reconciliation (bucket checksums) -----------------
# Anti-entropy between two table replicas/snapshots without comparing
# rows: each side reduces to N_BUCKET (bucket, row-count, checksum)
# summaries — the checksum an order-independent SUM of per-row
# polynomial hashes over a canonical row rendering (exact integers, the
# repo's rolling-hash family) — and only the summaries are joined.
# Divergent buckets localize the drift to 1/N of the keyspace; at
# 100 TB the comparison ships 2·N rows instead of 2·|table| (the
# Merkle-tree / DynamoDB anti-entropy recipe, one level deep). The
# "remote" replica is simulated deterministically from the same
# parquet: rows of ONE bucket get a one-cent price drift, part of one
# OTHER bucket is missing — so the query proves exactly those two
# buckets (and no others) flag as divergent, i.e. the summaries
# localize the drift. Floats never enter the checksum: price is
# canonicalized to exact cents, dates to ISO strings.

_RECON_BUCKETS = 64
_RECON_DRIFT_BUCKET = 3    # this bucket's rows drift one cent
_RECON_DELETE_BUCKET = 17  # every 5th row of this bucket is missing


def _recon_canon_sql(price_expr: str) -> str:
    from ..functions.stable import scaled_long_sql

    return (
        "CONCAT(CAST(o_orderkey AS VARCHAR), '|', o_orderstatus, '|', "
        f"CAST({scaled_long_sql(price_expr, 100)} AS VARCHAR), "
        "'|', CAST(CAST(o_orderdate AS DATE) AS VARCHAR))"
    )


def _recon_oracle() -> str:
    from .text import RH_INIT, RH_MOD, RH_MULT

    def side(name: str, where: str, price: str) -> str:
        canon = _recon_canon_sql(price)
        return f"""{name} AS (
  SELECT o_orderkey % {_RECON_BUCKETS} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(list_reduce(list_prepend(CAST({RH_INIT} AS BIGINT),
                list_transform(string_split({canon}, ''),
                               x -> CAST(ascii(x) AS BIGINT))),
              (acc, x) -> (acc * {RH_MULT} + x) % {RH_MOD})) AS BIGINT)
           AS checksum
  FROM orders {where} GROUP BY 1)"""

    a = side("a", "", "o_totalprice")
    b = side(
        "b",
        f"WHERE NOT (o_orderkey % {_RECON_BUCKETS} = {_RECON_DELETE_BUCKET}"
        " AND o_orderkey % 5 = 0)",
        "o_totalprice + (CASE WHEN"
        f" o_orderkey % {_RECON_BUCKETS} = {_RECON_DRIFT_BUCKET}"
        " THEN 0.01 ELSE 0.0 END)",
    )
    return f"""
WITH {a},
{b}
SELECT a.bucket, a.n_rows AS n_rows_a, b.n_rows AS n_rows_b,
       a.checksum AS checksum_a, b.checksum AS checksum_b,
       CAST(CASE WHEN a.n_rows <> b.n_rows OR a.checksum <> b.checksum
                 THEN 1 ELSE 0 END AS BIGINT) AS is_divergent
FROM a JOIN b ON a.bucket = b.bucket""".strip()


@register("table_reconcile_checksums", oracle=_recon_oracle())
def table_reconcile_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import RH_INIT, RH_MOD, RH_MULT

    orders = load_table(spark, sf_dir, "orders")

    def canon(price) -> F.Column:
        return F.concat(
            F.col("o_orderkey").cast("string"),
            F.lit("|"),
            F.col("o_orderstatus"),
            F.lit("|"),
            scaled_long(price, 100).cast("string"),
            F.lit("|"),
            F.to_date("o_orderdate").cast("string"),
        )

    def summarize(df: DataFrame, price) -> DataFrame:
        rowhash = F.aggregate(
            F.split(canon(price), ""),
            F.lit(RH_INIT).cast("long"),
            lambda acc, x: (acc * RH_MULT + F.ascii(x)) % RH_MOD,
        )
        return df.groupBy(
            (F.col("o_orderkey") % _RECON_BUCKETS).alias("bucket")
        ).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(rowhash).alias("checksum"),
        )

    a = summarize(orders, F.col("o_totalprice"))
    drift = F.when(
        F.col("o_orderkey") % _RECON_BUCKETS == _RECON_DRIFT_BUCKET,
        F.lit(0.01),
    ).otherwise(F.lit(0.0))
    b = summarize(
        orders.where(
            ~(
                (F.col("o_orderkey") % _RECON_BUCKETS == _RECON_DELETE_BUCKET)
                & (F.col("o_orderkey") % 5 == 0)
            )
        ),
        F.col("o_totalprice") + drift,
    )
    a, b = a.alias("a"), b.alias("b")
    return a.join(b, "bucket").select(
        "bucket",
        F.col("a.n_rows").alias("n_rows_a"),
        F.col("b.n_rows").alias("n_rows_b"),
        F.col("a.checksum").alias("checksum_a"),
        F.col("b.checksum").alias("checksum_b"),
        (
            (F.col("a.n_rows") != F.col("b.n_rows"))
            | (F.col("a.checksum") != F.col("b.checksum"))
        )
        .cast("long")
        .alias("is_divergent"),
    )


# --- interval-overlap count via bucket rewrite (range join → equi) --------
# "How many shipments are in transit during each month" — the interval
# overlap count that naively is a RANGE join (month BETWEEN
# trunc(ship) AND trunc(receipt)) and therefore a broadcast-
# nested-loop: every interval × every month. The engine rewrite:
# EXPLODE each interval into the months it spans (sequence() HOF —
# bounded by interval length / bucket width, here ≤3 months per
# shipment) and equi-aggregate on the month — linear in the data, no
# join at all. This is the standard interval-bucketing trick that
# turns temporal-overlap analytics into hash aggregation at 100 TB.
# The ORACLE is the naive range join against a generate_series month
# dimension — proving the rewrite exact. Transit intervals are
# synthesized deterministically (ship + 1..30 days by key) since the
# fixture carries no receipt date.

@register(
    "shipment_interval_overlap",
    oracle="""
WITH li AS (
  SELECT CAST(l_shipdate AS DATE) AS ship,
         CAST(l_shipdate AS DATE)
           + CAST((1 + l_orderkey % 30) AS INTEGER) AS receipt
  FROM lineitem),
bounds AS (
  SELECT CAST(date_trunc('month', MIN(ship)) AS DATE) AS lo,
         CAST(date_trunc('month', MAX(receipt)) AS DATE) AS hi
  FROM li),
months AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE)
           AS month
  FROM bounds)
SELECT m.month, CAST(COUNT(*) AS BIGINT) AS n_in_transit
FROM months m JOIN li
  ON m.month BETWEEN CAST(date_trunc('month', li.ship) AS DATE)
                 AND CAST(date_trunc('month', li.receipt) AS DATE)
GROUP BY m.month""".strip(),
)
def shipment_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.to_date("l_shipdate").alias("ship"),
        F.date_add(
            F.to_date("l_shipdate"),
            (F.lit(1) + F.col("l_orderkey") % 30).cast("int"),
        ).alias("receipt"),
    )
    spanned = li.select(
        F.explode(
            F.expr(
                "sequence(trunc(ship, 'MM'), trunc(receipt, 'MM'),"
                " interval 1 month)"
            )
        ).alias("month")
    )
    return spanned.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_in_transit")
    )


# --- weighted systematic sample (prefix-sum strata, exact integers) -------
# Probability-proportional-to-size sampling the deterministic way:
# cumulative-weight systematic selection. Lay every order's weight
# (price in exact cents) end to end on a number line, cut the line into
# K equal-weight strata, and select every order whose weight interval
# crosses a stratum boundary — each unit of spend has identical
# inclusion probability, heavy orders (weight ≥ W/K) are selected with
# certainty, and the output is a fixed ≤K-row PPS sample with NO
# randomness (the auditable variant of PPS sampling used for exact-
# reproducible eval splits). The engine primitive is the distributed
# prefix sum (operators/rank.py:with_global_running_sum — range
# shuffle + pid-partitioned window + P-row triangular offsets, never a
# single-partition window funnel), with the grand total riding along
# from the same P-row computation. All arithmetic is long-integer
# (cents x K ≈ 2^48 at 100 TB — documented headroom), so the DuckDB
# window-SUM oracle matches bit-for-bit.

_SYS_SAMPLE_K = 64


@register(
    "orders_weighted_systematic_sample",
    oracle=f"""
WITH w AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS weight_cents
  FROM orders),
c AS (
  SELECT o_orderkey, weight_cents,
         CAST(SUM(weight_cents) OVER (
            ORDER BY o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_weight
  FROM w),
t AS (SELECT CAST(SUM(weight_cents) AS BIGINT) AS grand_total FROM w)
SELECT o_orderkey, weight_cents, cum_weight, grand_total,
       CAST((cum_weight * {_SYS_SAMPLE_K}) // grand_total
            - ((cum_weight - weight_cents) * {_SYS_SAMPLE_K}) // grand_total
         AS BIGINT) AS n_strata
FROM c, t
WHERE (cum_weight * {_SYS_SAMPLE_K}) // grand_total
      > ((cum_weight - weight_cents) * {_SYS_SAMPLE_K}) // grand_total
""".strip(),
)
def orders_weighted_systematic_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.rank import with_global_running_sum

    w = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        scaled_long(F.col("o_totalprice"), 100).alias("weight_cents"),
    )
    cum = with_global_running_sum(
        w,
        ["o_orderkey"],
        "weight_cents",
        out_col="cum_weight",
        total_col="grand_total",
    )
    hi = F.expr(f"(cum_weight * {_SYS_SAMPLE_K}) div grand_total")
    lo = F.expr(
        f"((cum_weight - weight_cents) * {_SYS_SAMPLE_K}) div grand_total"
    )
    return cum.withColumn("n_strata", (hi - lo).cast("long")).where(
        F.col("n_strata") >= 1
    ).select(
        "o_orderkey", "weight_cents", "cum_weight", "grand_total", "n_strata"
    )


# --- Pareto frontier / skyline (price vs size, prefix-max rewrite) --------
# The skyline operator: parts not dominated on (minimize retail price,
# maximize size) — no other part is both cheaper-or-equal AND
# larger-or-equal with one strict. The naive semantics is a quadratic
# NOT EXISTS self-join (the oracle, run verbatim by DuckDB); the engine
# rewrite is the sort-based skyline in three linear steps:
# (1) collapse to distinct price levels with the per-price max size
#     (one hash aggregate — dominated-within-price rows die here);
# (2) EXCLUSIVE distributed prefix-max of that max-size over ascending
#     price (operators/rank.py:with_global_exclusive_running_max — the
#     price-level table is distinct, so the total-order requirement
#     holds; at 100 TB price levels are ~millions of rows, not corpus-
#     sized, and the prefix machinery never funnels one partition);
# (3) broadcast the surviving frontier price levels back onto the part
#     table: a row survives iff its size equals its price level's max
#     AND strictly beats every cheaper level's max (ties at equal
#     (price, size) all survive — identical points do not dominate).
#     The broadcast side is bounded by construction: frontier maxima
#     strictly increase along ascending price, so |frontier| ≤
#     |distinct sizes| — dozens of rows regardless of table size.

@register(
    "part_pareto_frontier",
    oracle="""
WITH p AS (
  SELECT p_partkey,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS size
  FROM part)
SELECT p_partkey, price_cents, size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_cents <= a.price_cents AND b.size >= a.size
    AND (b.price_cents < a.price_cents OR b.size > a.size))
""".strip(),
)
def part_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_exclusive_running_max

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        scaled_long(F.col("p_retailprice"), 100).alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    levels = p.groupBy("price_cents").agg(F.max("size").alias("smax"))
    frontier_levels = with_global_exclusive_running_max(
        levels, ["price_cents"], "smax", out_col="m_cheaper"
    ).where(
        F.col("m_cheaper").isNull() | (F.col("smax") > F.col("m_cheaper"))
    )
    return p.join(
        F.broadcast(frontier_levels), "price_cents"
    ).where(F.col("size") == F.col("smax")).select(
        "p_partkey", "price_cents", "size"
    )


# --- join skew profiler (hot-key detection before the shuffle) ------------
# The operational pre-flight for any large shuffle join: per-key
# cardinalities of BOTH sides and the per-key join-output contribution
# n_left·n_right, ranked — the exact diagnostic that decides between a
# plain hash join, AQE skew splitting, or salting (operators/skew.py).
# Profiled here: events.user_id ⋈ orders.o_custkey (both sides real
# multiplicity). Engine shape: each side collapses to its key histogram
# FIRST (two hash aggregates — the only corpus-sized passes), the
# histograms join on the key (distinct-key-sized, not row-sized), the
# grand total of output contributions comes from a second aggregate
# over that small joined histogram (partial-agg merge, no data-sized
# funnel), broadcast back for the share computation; top-20 via
# TakeOrderedAndProject. share = one exact integer division per row —
# bit-identical across engines.

_SKEW_TOP = 20


@register(
    "join_skew_profile",
    oracle=f"""
WITH l AS (
  SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n_left
  FROM events GROUP BY user_id),
r AS (
  SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n_right
  FROM orders GROUP BY o_custkey),
j AS (
  SELECT l.key, l.n_left, r.n_right,
         l.n_left * r.n_right AS out_rows
  FROM l JOIN r USING (key)),
t AS (SELECT CAST(SUM(out_rows) AS BIGINT) AS total_out FROM j)
SELECT j.key, j.n_left, j.n_right,
       CAST(j.out_rows AS BIGINT) AS out_rows,
       t.total_out,
       CAST(j.out_rows AS DOUBLE) / CAST(t.total_out AS DOUBLE) AS share
FROM j, t
ORDER BY j.out_rows DESC, j.key ASC
LIMIT {_SKEW_TOP}
""".strip(),
)
def join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    left = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_left"))
    )
    right = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_right"))
    )
    j = (
        left.join(right, "key")
        .withColumn(
            "out_rows", (F.col("n_left") * F.col("n_right")).cast("long")
        )
        # Two consumers (scalar total + final projection) with different
        # column sets: without persist, per-consumer pruning defeats
        # ReuseExchange and both corpus-sized histogram passes run twice.
        .persist()
    )
    total = j.agg(F.sum("out_rows").cast("long").alias("total_out"))
    return (
        j.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_left",
            "n_right",
            "out_rows",
            "total_out",
            (
                F.col("out_rows").cast("double")
                / F.col("total_out").cast("double")
            ).alias("share"),
        )
        .orderBy(F.col("out_rows").desc(), F.col("key").asc())
        .limit(_SKEW_TOP)
    )


# --- LPA community detection over the co-purchase graph -------------------
# The fifth graph operator (after pagerank / triangles / k-core / BFS /
# connected components): synchronous label propagation with the
# deterministic (count DESC, label ASC) tie-break and a fixed 4 rounds
# (operators/lpa.py), which makes community detection — normally a
# randomized heuristic — an exactly-replayable dataflow: the oracle
# unrolls the same recurrence as 4 chained CTEs with a ROW_NUMBER
# argmax. Communities differ from connected components: LPA splits a
# connected graph along dense regions.

_LPA_ROUNDS = 4


def _lpa_oracle() -> str:
    rounds = []
    for i in range(1, _LPA_ROUNDS + 1):
        rounds.append(
            f"""l{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY cnt DESC, label ASC) AS rn
    FROM (SELECT e.src AS node, l.label, COUNT(*) AS cnt
          FROM edges e JOIN l{i - 1} l ON e.dst = l.node
          GROUP BY e.src, l.label))
  WHERE rn = 1)"""
        )
    joined = ",\n".join(rounds)
    return f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
{joined}
SELECT node AS part_key, CAST(label AS BIGINT) AS community
FROM l{_LPA_ROUNDS}
""".strip()


@register("part_copurchase_lpa", oracle=_lpa_oracle())
def part_copurchase_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lpa import label_propagation

    edges = copurchase_edges(spark, sf_dir)
    return label_propagation(edges, n_rounds=_LPA_ROUNDS).select(
        F.col("node").alias("part_key"),
        F.col("community").cast("long").alias("community"),
    )


# --- ABC / Pareto-class inventory analysis (prefix-share rewrite) ---------
# The classic 80/15/5 revenue classification: rank parts by revenue,
# class A while the PRECEDING cumulative share is under 80%, B under
# 95%, C otherwise (each class includes the row that crosses its
# boundary — the standard convention that also makes the top row
# always A). The naive form is a global window over the ranked table;
# the engine shape is the distributed prefix sum on the total order
# (revenue DESC, part key — negated revenue as the range key since the
# prefix machinery range-partitions ascending), grand total riding
# along from the same P-row offsets computation. Class boundaries
# compare as pure integer cross-multiplications (prev·5 < total·4,
# prev·20 < total·19) on 1e4-scaled exact revenue — no percentage
# float exists anywhere, so the DuckDB window-SUM oracle matches
# bit-for-bit. Headroom: scaled revenue sums ≈ 2^52 at 100 TB; ×20
# stays under 2^63.

@register(
    "part_abc_classification",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                       AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY l_partkey),
c AS (
  SELECT l_partkey, rev,
         CAST(SUM(rev) OVER (
            ORDER BY rev DESC, l_partkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_rev
  FROM rev),
t AS (SELECT CAST(SUM(rev) AS BIGINT) AS total_rev FROM rev)
SELECT c.l_partkey AS part_key, c.rev, c.cum_rev, t.total_rev,
       CASE WHEN (c.cum_rev - c.rev) * 5 < t.total_rev * 4 THEN 'A'
            WHEN (c.cum_rev - c.rev) * 20 < t.total_rev * 19 THEN 'B'
            ELSE 'C' END AS abc_class
FROM c, t
""".strip(),
)
def part_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            scaled_long(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            )
        ).alias("rev")
    )
    ordered = rev.withColumn("neg_rev", -F.col("rev"))
    cum = with_global_running_sum(
        ordered,
        ["neg_rev", "l_partkey"],
        "rev",
        out_col="cum_rev",
        total_col="total_rev",
    )
    prev = F.col("cum_rev") - F.col("rev")
    return cum.select(
        F.col("l_partkey").alias("part_key"),
        "rev",
        "cum_rev",
        "total_rev",
        F.when(prev * 5 < F.col("total_rev") * 4, "A")
        .when(prev * 20 < F.col("total_rev") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


# --- RFM customer segmentation (three distributed quintiles) --------------
# The marketing-analytics staple: score every customer 1-5 on Recency
# (latest order date), Frequency (order count), and Monetary (exact
# cents spend), each score a GLOBAL quintile under a total order
# (customer key tiebreak), concatenated into the 'RFM' segment code
# (555 = best). Engine shape: one grouped aggregate builds the three
# exact statistics, then three passes of the distributed NTILE
# (operators/rank.py:with_global_ntile — range shuffle + P-row offsets,
# never a single-partition window funnel), one per dimension — at scale
# each pass is one range shuffle of the customer-grain table. The
# oracle is three SQL NTILE windows, which with_global_ntile matches
# boundary-exactly (floor((rank-1)·n/N)+1).

@register(
    "customer_rfm_segments",
    oracle="""
WITH rfm AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS recency_date,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders GROUP BY o_custkey)
SELECT o_custkey, recency_date, frequency, monetary_cents,
       CAST(NTILE(5) OVER (ORDER BY recency_date, o_custkey) AS INTEGER)
         AS r_score,
       CAST(NTILE(5) OVER (ORDER BY frequency, o_custkey) AS INTEGER)
         AS f_score,
       CAST(NTILE(5) OVER (ORDER BY monetary_cents, o_custkey) AS INTEGER)
         AS m_score,
       CAST(NTILE(5) OVER (ORDER BY recency_date, o_custkey) AS VARCHAR)
         || CAST(NTILE(5) OVER (ORDER BY frequency, o_custkey) AS VARCHAR)
         || CAST(NTILE(5) OVER (ORDER BY monetary_cents, o_custkey)
                 AS VARCHAR) AS rfm_segment
FROM rfm
""".strip(),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_ntile

    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("recency_date"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(scaled_long(F.col("o_totalprice"), 100)).alias(
            "monetary_cents"
        ),
    )
    scored = with_global_ntile(
        rfm, ["recency_date", "o_custkey"], 5, "r_score"
    )
    scored = with_global_ntile(
        scored, ["frequency", "o_custkey"], 5, "f_score"
    )
    scored = with_global_ntile(
        scored, ["monetary_cents", "o_custkey"], 5, "m_score"
    )
    return scored.select(
        "o_custkey",
        "recency_date",
        "frequency",
        "monetary_cents",
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("rfm_segment"),
    )


# --- time-weighted average price (TWAP over irregular observations) -------
# The irregular-sampling average done right: each price observation
# holds until the NEXT observation of the same part, so it contributes
# weight = days-in-effect — a plain AVG would over-weight bursts of
# closely-spaced observations. Observations collapse to one per
# (part, day) first (MIN — deterministic), the holding interval comes
# from a lead() window on the series key, and TWAP = Σ(price·days) /
# Σ(days) accumulates as exact long integers with ONE final division —
# bit-identical cross-engine. The final (open-ended) observation drops
# out of the weighting, the standard convention. One shuffle on the
# part key shared by the window and the aggregate.

@register(
    "part_twap_price",
    oracle="""
WITH obs AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
         MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS price_cents
  FROM lineitem GROUP BY l_partkey, CAST(l_shipdate AS DATE)),
iv AS (
  SELECT l_partkey, d, price_cents,
         date_diff('day', d,
                   lead(d) OVER (PARTITION BY l_partkey ORDER BY d))
           AS dt_days
  FROM obs)
SELECT l_partkey AS part_key,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(price_cents * dt_days) AS BIGINT) AS pw_num,
       CAST(SUM(dt_days) AS BIGINT) AS span_days,
       CAST(SUM(price_cents * dt_days) AS DOUBLE)
         / CAST(SUM(dt_days) * 100 AS DOUBLE) AS twap
FROM iv WHERE dt_days IS NOT NULL
GROUP BY l_partkey
""".strip(),
)
def part_twap_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.groupBy(
        "l_partkey", F.to_date("l_shipdate").alias("d")
    ).agg(
        F.min(scaled_long(F.col("l_extendedprice"), 100)).alias(
            "price_cents"
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("d")
    iv = obs.withColumn(
        "dt_days",
        F.datediff(F.lead("d").over(w), F.col("d")).cast("long"),
    ).where(F.col("dt_days").isNotNull())
    return iv.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("price_cents") * F.col("dt_days")).alias("pw_num"),
        F.sum("dt_days").alias("span_days"),
        (
            F.sum(F.col("price_cents") * F.col("dt_days")).cast("double")
            / (F.sum("dt_days") * F.lit(100)).cast("double")
        ).alias("twap"),
    )


# --- edge Jaccard similarity (link-prediction coefficients) ---------------
# For every co-purchase edge (u, v): the Jaccard coefficient of the two
# endpoints' neighborhoods, J = |N(u)∩N(v)| / |N(u)∪N(v)\{u,v}| — the
# classic link-prediction / edge-strength weight (Adamic-style tie
# strength; weak-tie edges are bridge candidates). Restricting to
# ADJACENT pairs is what makes this exact AND scalable: the common-
# neighbor count of an existing edge is its per-edge TRIANGLE count,
# which the degree-ordered O(√m) wedge join computes without the Σdeg²
# blowup of all-pairs neighborhood comparison
# (operators/triangles.py:edge_triangle_counts; all-pairs node
# similarity at 100 TB goes through neighborhood MinHash instead — the
# dedup_minhash_lsh machinery). Exact integers + one division; the
# oracle counts common neighbors by the naive adjacency self-join.

@register(
    "part_edge_jaccard",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                  GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
deg AS (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM sym GROUP BY a),
cn AS (
  SELECT e.u, e.v, CAST(COUNT(*) AS BIGINT) AS c
  FROM e
  JOIN sym n1 ON n1.a = e.u
  JOIN sym n2 ON n2.a = e.v AND n2.b = n1.b
  GROUP BY e.u, e.v)
SELECT e.u, e.v,
       COALESCE(cn.c, 0) AS n_common,
       du.deg AS deg_u, dv.deg AS deg_v,
       CAST(COALESCE(cn.c, 0) AS DOUBLE)
         / CAST(du.deg + dv.deg - 2 - COALESCE(cn.c, 0) AS DOUBLE)
         AS jaccard
FROM e
JOIN deg du ON du.node = e.u
JOIN deg dv ON dv.node = e.v
LEFT JOIN cn ON cn.u = e.u AND cn.v = e.v
WHERE du.deg + dv.deg - 2 - COALESCE(cn.c, 0) > 0
""".strip(),
)
def part_edge_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.checkpointing import truncator
    from ..operators.triangles import edge_triangle_counts, undirected_edges

    edges = copurchase_edges(spark, sf_dir)
    # Materialize the canonical edge set ONCE: it feeds the degree
    # aggregate (two scans), the output join, and the triangle
    # machinery — without truncation the quadratic lineitem self-join
    # lineage would re-execute for every consumer (ReuseExchange does
    # not survive per-consumer column pruning).
    und = truncator(edges, None)(undirected_edges(edges))
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    tri = edge_triangle_counts(edges, undirected=und)
    j = (
        und.join(
            deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u")),
            "u",
        )
        .join(
            deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v")),
            "v",
        )
        .join(tri, ["u", "v"], "left")
        .withColumn("n_common", F.coalesce(F.col("n_triangles"), F.lit(0)))
    )
    union = F.col("deg_u") + F.col("deg_v") - 2 - F.col("n_common")
    return j.where(union > 0).select(
        "u",
        "v",
        "n_common",
        "deg_u",
        "deg_v",
        (F.col("n_common").cast("double") / union.cast("double")).alias(
            "jaccard"
        ),
    )


# --- all-pairs node similarity via prefix-filtered set join ---------------
# The documented scale path for node similarity beyond adjacent pairs
# (part_edge_jaccard covers edges): Jaccard of raw neighbor SETS for
# ALL part pairs with J ≥ t, computed with the AllPairs/PPJoin prefix
# filter [Bayardo et al. WWW'07] instead of the |V|² product — the same
# lossless theorem the text dedup family uses (operators/dedup.py):
# order each neighbor set, keep the first |s|−ceil(t·|s|)+1 elements;
# any pair with J ≥ t must share a prefix element, so the candidate
# join on (prefix neighbor) plus a length-ratio prune is EXACT. The
# oracle is the quadratic common-neighbor self-join (valid superset:
# J ≥ t > 0 implies ≥ 1 shared neighbor). Candidates re-verify with
# array_intersect on the adjacency arrays; per-pair output is exact
# integers + one division. Parallelism keys on the shared-neighbor id —
# at 100 TB, re-order prefixes by neighbor document-frequency ascending
# so hub neighbors fall out of prefixes (the dedup.py note).

_NODE_SIM_T = 0.5


@register(
    "part_node_similarity",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                  GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
deg AS (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM sym GROUP BY a),
cn AS (
  SELECT n1.a AS u, n2.a AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM sym n1 JOIN sym n2 ON n1.b = n2.b AND n1.a < n2.a
  GROUP BY n1.a, n2.a)
SELECT cn.u, cn.v, cn.c AS n_common,
       du.deg + dv.deg - cn.c AS n_union,
       CAST(cn.c AS DOUBLE) / CAST(du.deg + dv.deg - cn.c AS DOUBLE)
         AS jaccard
FROM cn
JOIN deg du ON du.node = cn.u
JOIN deg dv ON dv.node = cn.v
WHERE CAST(cn.c AS DOUBLE)
      >= {_NODE_SIM_T} * CAST(du.deg + dv.deg - cn.c AS DOUBLE)
""".strip(),
)
def part_node_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.checkpointing import truncator
    from ..operators.node_similarity import node_similarity_pairs
    from ..operators.triangles import undirected_edges

    edges = copurchase_edges(spark, sf_dir)
    und = truncator(edges, None)(undirected_edges(edges))
    # Hub-capped AllPairs: adjacency rows bounded at NODE_SIM_DEG_CAP
    # elements; hub pairs route through the MinHash-LSH fallback with
    # exact wedge-join verification (operators/node_similarity.py).
    # The co-purchase graph's max degree is ~84 at sf0.1, far below
    # the cap, so the result is identical to the exact oracle.
    return node_similarity_pairs(und, _NODE_SIM_T)


# --- duplicate-invoice detection (banded blocking record matching) --------
# The accounts-payable dedup rule: two orders from the same customer
# with amounts within $1000 of each other, within 30 days, are
# duplicate-payment suspects. The engine point is the BANDED BLOCKING
# rewrite every tolerance-rule matcher needs at scale: the equality
# part of the rule (customer) plus the QUANTIZED amount band
# floor(cents / W) become the equi-join key; one side probes its own
# band ±1 (an explode to three keys) so near-boundary pairs are never
# missed — a pair within tolerance W differs by at most one band. The
# candidate join is therefore exact (candidates-then-verify, the
# fuzzy_name_pairs shape with numeric banding instead of deletion
# neighborhoods), and each qualifying pair matches in exactly one band
# (the right side carries a single band key), so no dedup pass is
# needed. Only the date-proximity inequality remains as a post-join
# filter. The oracle is the naive quadratic tolerance join.

_DUP_INVOICE_DAYS = 30
_DUP_INVOICE_TOL_CENTS = 100_000  # $1000 band width == tolerance


@register(
    "orders_duplicate_invoices",
    oracle=f"""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(o_orderdate AS DATE) AS d
  FROM orders)
SELECT a.o_custkey,
       a.o_orderkey AS orderkey_1, b.o_orderkey AS orderkey_2,
       CAST(ABS(a.cents - b.cents) AS BIGINT) AS amount_diff_cents,
       CAST(ABS(date_diff('day', a.d, b.d)) AS BIGINT) AS days_apart
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND ABS(a.cents - b.cents) <= {_DUP_INVOICE_TOL_CENTS}
 AND ABS(date_diff('day', a.d, b.d)) <= {_DUP_INVOICE_DAYS}
""".strip(),
)
def orders_duplicate_invoices(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _DUP_INVOICE_TOL_CENTS
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        scaled_long(F.col("o_totalprice"), 100).alias("cents"),
        F.to_date("o_orderdate").alias("d"),
    )
    probe = o.select(
        "*",
        F.explode(
            F.array(
                F.expr(f"cents div {w} - 1"),
                F.expr(f"cents div {w}"),
                F.expr(f"cents div {w} + 1"),
            )
        ).alias("band"),
    ).alias("a")
    build = o.withColumn("band", F.expr(f"cents div {w}")).alias("b")
    days = F.abs(F.datediff(F.col("b.d"), F.col("a.d")))
    return (
        probe.join(
            build,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.abs(F.col("a.cents") - F.col("b.cents")) <= w)
            & (days <= _DUP_INVOICE_DAYS),
        )
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.o_orderkey").alias("orderkey_1"),
            F.col("b.o_orderkey").alias("orderkey_2"),
            F.abs(F.col("a.cents") - F.col("b.cents"))
            .cast("long")
            .alias("amount_diff_cents"),
            days.cast("long").alias("days_apart"),
        )
    )


# --- empirical-Bayes shrunk return rates (small-n ranking fix) ------------
# "Which parts get returned most" ranked by RAW rate is dominated by
# parts with 2 lineitems — the classic small-sample pathology. The
# empirical-Bayes fix shrinks every part's rate toward the corpus
# prior with K pseudo-observations: shrunk = (x + K·p0)/(n + K) with
# p0 = Xg/Ng the global return rate. Exactness: the nested rational
# collapses to ONE integer division — shrunk = (x·Ng + K·Xg) /
# (Ng·(n + K)) — so both engines emit identical doubles with no
# rounding. Engine shape: one fact aggregate per part + the global
# totals as a partial-agg scalar broadcast back (the min(struct)
# recipe); integer envelope x·Ng < 2^63 holds through ~10^9-row
# fixtures — at larger corpora quantize p0 to a 1e-9 integer first.

_EB_PSEUDO_N = 25


@register(
    "part_return_rate_eb",
    oracle=f"""
WITH per AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_returned
  FROM lineitem GROUP BY l_partkey),
g AS (
  SELECT CAST(SUM(n_items) AS BIGINT) AS ng,
         CAST(SUM(n_returned) AS BIGINT) AS xg
  FROM per)
SELECT per.l_partkey AS part_key, per.n_items, per.n_returned,
       CAST(per.n_returned AS DOUBLE) / CAST(per.n_items AS DOUBLE)
         AS raw_rate,
       CAST(per.n_returned * g.ng + {_EB_PSEUDO_N} * g.xg AS DOUBLE)
         / CAST(g.ng * (per.n_items + {_EB_PSEUDO_N}) AS DOUBLE)
         AS shrunk_rate
FROM per, g
""".strip(),
)
def part_return_rate_eb(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("n_returned"),
    )
    g = per.agg(
        F.sum("n_items").cast("long").alias("ng"),
        F.sum("n_returned").cast("long").alias("xg"),
    )
    k = F.lit(_EB_PSEUDO_N)
    out = per.crossJoin(F.broadcast(g))
    return out.select(
        "part_key",
        "n_items",
        "n_returned",
        (
            F.col("n_returned").cast("double")
            / F.col("n_items").cast("double")
        ).alias("raw_rate"),
        (
            (F.col("n_returned") * F.col("ng") + k * F.col("xg")).cast(
                "double"
            )
            / (F.col("ng") * (F.col("n_items") + k)).cast("double")
        ).alias("shrunk_rate"),
    )


# --- inter-purchase cadence by market segment -----------------------------
# How often customers come back, by segment: days between CONSECUTIVE
# orders of the same customer (lag on the customer-partitioned window
# — one shuffle on the natural key), summarized per market segment as
# exact discrete quartiles (ANSI percentile_disc picks actual data
# elements — zero interpolation, bit-exact cross-engine; the
# value_percentiles_by_type protocol; the integer-day domain is
# bounded, so the exact percentile aggregate's value→count maps stay
# small at any corpus size). The segment dimension broadcasts.

@register(
    "customer_interpurchase_days",
    oracle="""
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
gaps AS (
  SELECT o_custkey,
         CAST(date_diff('day',
              LAG(d) OVER (PARTITION BY o_custkey ORDER BY d, o_custkey),
              d) AS BIGINT) AS gap_days
  FROM (SELECT o_custkey, d FROM o)),
seg AS (
  SELECT g.gap_days, c.c_mktsegment AS segment
  FROM gaps g JOIN customer c ON c.c_custkey = g.o_custkey
  WHERE g.gap_days IS NOT NULL)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY gap_days) AS p25,
       PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY gap_days) AS p50,
       PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY gap_days) AS p75,
       CAST(MAX(gap_days) AS BIGINT) AS max_gap
FROM seg GROUP BY segment
""".strip(),
)
def customer_interpurchase_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d")
    )
    w = Window.partitionBy("o_custkey").orderBy("d")
    gaps = orders.select(
        "o_custkey",
        F.datediff(F.col("d"), F.lag("d").over(w)).cast("long").alias(
            "gap_days"
        ),
    ).where(F.col("gap_days").isNotNull())
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    seg = gaps.join(F.broadcast(cust), "o_custkey")
    return seg.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        # Spark's percentile_disc returns DOUBLE even on integral
        # input; the selected element is an exact day count, so the
        # long cast is lossless and matches the oracle's BIGINT.
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY gap_days)")
        .cast("long")
        .alias("p25"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_days)")
        .cast("long")
        .alias("p50"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY gap_days)")
        .cast("long")
        .alias("p75"),
        F.max("gap_days").alias("max_gap"),
    )


# --- k-anonymity audit over quasi-identifiers ------------------------------
# Privacy gate for releasing training data keyed on people: group the
# customer table by its quasi-identifier tuple (nation, market segment,
# account-balance band) and report every equivalence class with its
# size and a below-k flag. A release is k-anonymous iff no class is
# flagged. One hash aggregate with map-side combine — the QID class
# count is bounded by the QID domain (25 nations x 5 segments x ~11
# bands), so the reduced side is tiny at any corpus size. The balance
# band is FLOOR(bal/1000): one IEEE divide + floor on the 2-dp input,
# identical in both engines.

_KANON_K = 5


@register(
    "customer_k_anonymity",
    oracle=f"""
SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
       CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
       CAST(COUNT(*) AS BIGINT) AS class_size,
       (COUNT(*) < {_KANON_K}) AS below_k
FROM customer
GROUP BY 1, 2, 3
""".strip(),
)
def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).alias("class_size"),
        (F.count(F.lit(1)) < F.lit(_KANON_K)).alias("below_k"),
    )


# --- HITS hubs/authorities on the bipartite purchase graph -----------------
# Kleinberg's HITS, two exact power-iteration steps on the directed
# bipartite graph customer -> part (an edge per distinct purchase):
# a1(p) = indegree, h1(c) = sum of a1 over parts c bought,
# a2(p) = sum of h1 over c who bought p. Authorities are parts that
# well-connected buyers concentrate on — a different signal from
# part_copurchase_pagerank's co-purchase centrality. Integers stay
# exact (bounded by deg_max^2 * |E|, far under 2^63 here); a
# production run at 100 TB would switch the rank vector to doubles and
# keep the identical join/agg shape. Each step is one fact-fact join
# on a key plus one hash aggregate; the edge list is built once,
# persisted, and reused by all three steps (same protocol as
# operators/pagerank.py). Top-k via orderBy+limit ->
# TakeOrderedAndProject.

_HITS_TOPK = 50


@register(
    "part_bipartite_hits",
    oracle=f"""
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
a1 AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS a FROM edges GROUP BY p),
h1 AS (
  SELECT e.c, CAST(SUM(a1.a) AS BIGINT) AS h
  FROM edges e JOIN a1 ON a1.p = e.p GROUP BY e.c),
a2 AS (
  SELECT e.p, CAST(SUM(h1.h) AS BIGINT) AS authority
  FROM edges e JOIN h1 ON h1.c = e.c GROUP BY e.p)
SELECT a2.p AS part_key, a1.a AS indegree, a2.authority
FROM a2 JOIN a1 ON a1.p = a2.p
ORDER BY a2.authority DESC, part_key ASC LIMIT {_HITS_TOPK}
""".strip(),
)
def part_bipartite_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .persist()
    )
    a1 = edges.groupBy("p").agg(F.count(F.lit(1)).alias("a"))
    h1 = (
        edges.join(a1, "p")
        .groupBy("c")
        .agg(F.sum("a").cast("long").alias("h"))
    )
    a2 = (
        edges.join(h1, "c")
        .groupBy("p")
        .agg(F.sum("h").cast("long").alias("authority"))
    )
    return (
        a2.join(a1, "p")
        .select(F.col("p").alias("part_key"), F.col("a").alias("indegree"),
                "authority")
        .orderBy(F.col("authority").desc(), F.col("part_key").asc())
        .limit(_HITS_TOPK)
    )


# --- business-day fulfillment lag ------------------------------------------
# Order-date -> first-shipment lag in BUSINESS days (Mon-Fri), as a
# histogram. Weekday counting is pure integer arithmetic on epoch days
# — W(e) = 5*((e+3) DIV 7) + LEAST((e+3) % 7, 5) counts weekdays in
# [1970-01-01, e) via the Monday-anchored shift (epoch day -3 was a
# Monday) — identical DIV/MOD/LEAST in both engines, no engine week-day
# conventions involved. One lineitem aggregate (min shipdate per
# order), one key join, one small histogram aggregate.


def _weekdays_sql(e: str) -> str:
    return f"(5 * ((({e}) + 3) // 7) + LEAST((({e}) + 3) % 7, 5))"


@register(
    "order_businessday_lag",
    oracle=f"""
WITH ship AS (
  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
  FROM lineitem GROUP BY l_orderkey),
lag AS (
  SELECT {_weekdays_sql("date_diff('day', DATE '1970-01-01', s.first_ship)")}
         - {_weekdays_sql("date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))")}
         AS businessday_lag
  FROM orders o JOIN ship s ON s.l_orderkey = o.o_orderkey)
SELECT CAST(businessday_lag AS BIGINT) AS businessday_lag,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM lag GROUP BY 1
""".strip(),
)
def order_businessday_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    def weekdays(e):  # weekdays in [epoch, e) — Monday-anchored
        ep = e + F.lit(3)
        return F.lit(5) * (ep - (ep % 7)) / F.lit(7) + F.least(
            ep % 7, F.lit(5)
        )

    ship = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.min(F.to_date("l_shipdate")).alias("first_ship"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    epoch = F.lit("1970-01-01").cast("date")
    lag = orders.join(ship, orders.o_orderkey == ship.l_orderkey).select(
        (
            weekdays(F.datediff("first_ship", epoch))
            - weekdays(F.datediff("od", epoch))
        )
        .cast("long")
        .alias("businessday_lag")
    )
    return lag.groupBy("businessday_lag").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# --- spatial radius self-join via grid bucketing ---------------------------
# The geohash/grid pattern for "all pairs within radius R" without an
# all-pairs join: bucket points into R x R grid cells, probe each
# point against its 3x3 cell neighborhood (a 9-way explode on the
# probe side only), verify the exact distance inside candidate pairs.
# Every qualifying pair is found exactly once (the probe side visits
# the base point's unique cell once; the a<b key order kills the
# mirror). Candidate volume is O(n * density), never O(n^2) — the same
# blocked candidates-then-verify shape as the dedup family, applied to
# coordinates. Coordinates are synthesized from the customer key with
# a Lehmer LCG (no geo columns in the schema) — integer arithmetic,
# identical in both engines; distances stay exact integers.

_GEO_R = 50  # cell size == radius
_GEO_SPAN = 4000  # coordinate domain [0, 4000·s)^2 — s auto-sizes below
_GEO_N_BASE = 15_000  # sf0.1 customer count: the span-4000 base density


def _geo_span_sql() -> str:
    """Auto-sized span scalar (DuckDB side): the coordinate domain grows
    with √n so point DENSITY stays constant — the operator-level rule
    (VERDICT r11 #3) that keeps the 3×3 candidate join O(n·density) at
    any scale instead of letting per-cell occupancy grow linearly with
    n on a fixed plane. s = ceil(sqrt(n/15000)) is 1 at every driver SF
    (results unchanged ≤ 15k customers) and 4 at the 10× scale fixture.
    Boundary safety: n/15000.0 is exact at the integer-square points,
    so CEIL(SQRT(·)) cannot straddle engines."""
    return (
        f"(SELECT CAST({_GEO_SPAN} * CEIL(SQRT(COUNT(*) / {_GEO_N_BASE}.0))"
        " AS BIGINT) FROM customer)"
    )


def _geo_pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, lat, lon) synthesized from the customer key with the
    split-multiply Lehmer mix, on the density-constant auto-sized span
    (see _geo_span_sql). Shared by the three geo queries."""
    cust = load_table(spark, sf_dir, "customer")
    sp = cust.agg(
        (
            F.ceil(
                F.sqrt(F.count(F.lit(1)) / F.lit(float(_GEO_N_BASE)))
            )
            * _GEO_SPAN
        )
        .cast("long")
        .alias("_span")
    )
    hv = (F.col("c_custkey") * F.lit(48271)) % F.lit(2147483647)
    mv = (hv % F.lit(100003)) * (
        (hv - hv % F.lit(100003)) / F.lit(100003) + F.lit(7)
    ).cast("long")
    s = F.col("_span")
    return cust.crossJoin(F.broadcast(sp)).select(
        "c_custkey",
        (mv % s).alias("lat"),
        ((mv - (mv % s)) / s % s).cast("long").alias("lon"),
    )


@register(
    "customer_geo_grid_pairs",
    oracle=f"""
WITH h AS (
  SELECT c_custkey, (c_custkey * 48271) % 2147483647 AS hv FROM customer),
m AS (
  SELECT c_custkey, (hv % 100003) * (hv // 100003 + 7) AS mv FROM h),
sp AS (
  SELECT CAST({_GEO_SPAN} * CEIL(SQRT(COUNT(*) / {_GEO_N_BASE}.0))
              AS BIGINT) AS span
  FROM customer),
pts AS (
  SELECT c_custkey, mv % sp.span AS lat,
         (mv // sp.span) % sp.span AS lon
  FROM m, sp)
SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
       CAST((a.lat - b.lat) * (a.lat - b.lat)
            + (a.lon - b.lon) * (a.lon - b.lon) AS BIGINT) AS dist2
FROM pts a JOIN pts b
  ON a.c_custkey < b.c_custkey
 AND (a.lat - b.lat) * (a.lat - b.lat)
     + (a.lon - b.lon) * (a.lon - b.lon) <= {_GEO_R * _GEO_R}
""".strip(),
)
def customer_geo_grid_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # nonlinear mix: a purely multiplicative LCG is linear in the key,
    # so its (mod, div) 2-D projection is a low-discrepancy lattice with
    # NO close pairs; the split-multiply breaks the linearity. All
    # intermediates < 2^63 (hv < 2^31, so the product < 2.2e9 * 2^15).
    pts = _geo_pts(spark, sf_dir)
    cells = pts.select(
        "*",
        (F.col("lat") - F.col("lat") % _GEO_R).alias("cl"),
        (F.col("lon") - F.col("lon") % _GEO_R).alias("co"),
    )
    offs = spark.range(9).select(
        (F.col("id") % 3 - 1).alias("dx"), (F.col("id") - F.col("id") % 3)
        .cast("long").alias("_t")
    ).select("dx", (F.col("_t") / 3 - 1).cast("long").alias("dy"))
    probes = cells.crossJoin(F.broadcast(offs)).select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        (F.col("cl") + F.col("dx") * _GEO_R).alias("cl"),
        (F.col("co") + F.col("dy") * _GEO_R).alias("co"),
    )
    base = cells.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        "cl",
        "co",
    )
    dlat = F.col("lat_a") - F.col("lat_b")
    dlon = F.col("lon_a") - F.col("lon_b")
    dist2 = dlat * dlat + dlon * dlon
    return (
        probes.join(base, ["cl", "co"])
        .where(
            (F.col("custkey_a") < F.col("custkey_b"))
            & (dist2 <= F.lit(_GEO_R * _GEO_R))
        )
        .select("custkey_a", "custkey_b", dist2.cast("long").alias("dist2"))
    )


# --- supplier-concentration HHI per part ------------------------------------
# Herfindahl-Hirschman index of supplier shares within each part's
# shipped quantity: HHI = sum(share_i^2) = sum(q_i^2) / (sum q_i)^2 —
# computed from exact integer centi-quantities so the only floats are
# one multiply and one divide on exactly-representable operands
# (events_chi2_independence protocol). Two hash aggregates, both with
# map-side combine; no joins, no window.


@register(
    "part_supplier_hhi",
    oracle="""
WITH sq AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qc
  FROM lineitem GROUP BY 1, 2)
SELECT l_partkey AS part_key,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(qc) AS BIGINT) AS total_qty_cents,
       CAST(SUM(qc * qc) AS DOUBLE)
         / (CAST(SUM(qc) AS DOUBLE) * CAST(SUM(qc) AS DOUBLE)) AS hhi
FROM sq GROUP BY 1
""".strip(),
)
def part_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long"))
        .cast("long")
        .alias("qc")
    )
    tot = F.sum("qc").cast("long")
    return sq.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        tot.alias("total_qty_cents"),
        (
            F.sum(F.col("qc") * F.col("qc")).cast("double")
            / (tot.cast("double") * tot.cast("double"))
        ).alias("hhi"),
    )


# --- Gini coefficient of customer spend, per nation -------------------------
# Inequality of the spend distribution inside each nation, by the exact
# rank formula G = (2*sum(i*x_i) - (n+1)*sum(x_i)) / (n*sum(x_i)) over
# spend sorted ascending (ties broken by key: deterministic ranks).
# Everything up to the final single divide is exact int64 (cents).
# The rank window partitions by nation — ~25 balanced partitions, never
# a single-partition global sort; customers without orders are out of
# scope (spend undefined, not zero: the join is the filter).


@register(
    "customer_gini_by_nation",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey),
j AS (
  SELECT c.c_nationkey AS nationkey, s.cents, s.o_custkey
  FROM spend s JOIN customer c ON c.c_custkey = s.o_custkey),
r AS (
  SELECT nationkey, cents,
         ROW_NUMBER() OVER (PARTITION BY nationkey
                            ORDER BY cents, o_custkey) AS rk
  FROM j)
SELECT nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(2 * CAST(SUM(rk * cents) AS BIGINT)
            - (COUNT(*) + 1) * CAST(SUM(cents) AS BIGINT) AS DOUBLE)
         / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE)) AS gini
FROM r GROUP BY nationkey
""".strip(),
)
def customer_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nationkey"),
    )
    j = spend.join(F.broadcast(cust), "o_custkey")
    w = Window.partitionBy("nationkey").orderBy("cents", "o_custkey")
    r = j.select("nationkey", "cents", F.row_number().over(w).alias("rk"))
    n = F.count(F.lit(1))
    s = F.sum("cents").cast("long")
    num = (
        F.lit(2) * F.sum(F.col("rk") * F.col("cents")).cast("long")
        - (n + F.lit(1)) * s
    )
    return r.groupBy("nationkey").agg(
        n.alias("n_customers"),
        s.alias("total_cents"),
        (num.cast("double") / (n.cast("double") * s.cast("double"))).alias(
            "gini"
        ),
    )


# --- case-insensitive grouping via Spark 4 collations ------------------------
# Spark 4's COLLATE: grouping mixed-case segment strings under
# UTF8_LCASE merges case variants inside the hash aggregate itself — no
# normalize-then-group preprocessing — while n_forms counts the raw
# (binary-collation) variants each group absorbed. The emitted key is
# lowercased so it is deterministic (a collated GROUP BY may surface
# any representative). The oracle expresses the same semantics the
# pre-Spark-4 way: GROUP BY lower(seg).


@register(
    "collated_segment_counts",
    oracle="""
WITH m AS (
  SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
              ELSE c_mktsegment END AS seg
  FROM customer)
SELECT lower(seg) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_forms
FROM m GROUP BY lower(seg)
""".strip(),
)
def collated_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = load_table(spark, sf_dir, "customer").select(
        F.when(
            F.col("c_custkey") % 2 == 0, F.lower(F.col("c_mktsegment"))
        )
        .otherwise(F.col("c_mktsegment"))
        .alias("seg")
    )
    grouped = m.groupBy(
        F.collate(F.col("seg"), "UTF8_LCASE").alias("segc")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        # distinct over the RAW column: binary collation, so 'AUTO' and
        # 'auto' stay two forms inside the case-merged group
        F.countDistinct(F.col("seg")).alias("n_forms"),
    )
    return grouped.select(
        F.lower(F.col("segc")).cast("string").alias("segment"),
        "n_customers",
        "n_forms",
    )


# --- interval-union coverage per part (sweep-line as a window) --------------
# Total DISTINCT days covered by the union of a part's (order-date ->
# ship-date) intervals — overlap counted once, the classic sweep-line:
# +1/-1 boundary deltas, a running sum ordered by day, and day-gaps
# added while the running count is positive. Everything is one
# part-partitioned window over the part's own boundary rows (bounded
# by its lineitem count) — no pairwise interval join, no explode of
# per-day rows (an explode would materialize O(span) rows per
# interval; the sweep is O(boundaries)). The synthetic dates can run
# ship < order, so intervals are normalized via least/greatest.


@register(
    "part_interval_coverage",
    oracle="""
WITH iv AS (
  SELECT l.l_partkey AS part_key,
         LEAST(date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)),
               date_diff('day', DATE '1970-01-01', CAST(l.l_shipdate AS DATE)))
           AS s,
         GREATEST(date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)),
                  date_diff('day', DATE '1970-01-01', CAST(l.l_shipdate AS DATE)))
           AS e
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
deltas AS (
  SELECT part_key, d, CAST(SUM(delta) AS BIGINT) AS delta, 
         CAST(SUM(CASE WHEN delta > 0 THEN delta ELSE 0 END) AS BIGINT)
           AS n_starts
  FROM (SELECT part_key, s AS d, 1 AS delta FROM iv
        UNION ALL
        SELECT part_key, e + 1 AS d, -1 AS delta FROM iv)
  GROUP BY part_key, d),
swept AS (
  SELECT part_key, d, n_starts,
         SUM(delta) OVER (PARTITION BY part_key ORDER BY d
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS running,
         LEAD(d) OVER (PARTITION BY part_key ORDER BY d) AS nxt
  FROM deltas)
SELECT part_key,
       CAST(SUM(n_starts) AS BIGINT) AS n_intervals,
       CAST(SUM(CASE WHEN running > 0 AND nxt IS NOT NULL
                     THEN nxt - d ELSE 0 END) AS BIGINT) AS covered_days
FROM swept GROUP BY part_key
""".strip(),
)
def part_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    epoch = F.lit("1970-01-01").cast("date")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_partkey").alias("part_key"),
        F.datediff(F.to_date("l_shipdate"), epoch).alias("sd"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.datediff(F.to_date("o_orderdate"), epoch).alias("od")
    )
    iv = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "part_key",
        F.least("od", "sd").alias("s"),
        F.greatest("od", "sd").alias("e"),
    )
    deltas = (
        iv.select("part_key", F.col("s").alias("d"), F.lit(1).alias("delta"))
        .unionAll(
            iv.select(
                "part_key",
                (F.col("e") + 1).alias("d"),
                F.lit(-1).alias("delta"),
            )
        )
        .groupBy("part_key", "d")
        .agg(
            F.sum("delta").cast("long").alias("delta"),
            F.sum(
                F.when(F.col("delta") > 0, F.col("delta")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_starts"),
        )
    )
    w = Window.partitionBy("part_key").orderBy("d")
    swept = deltas.select(
        "part_key",
        "d",
        "n_starts",
        F.sum("delta")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("running"),
        F.lead("d").over(w).alias("nxt"),
    )
    return swept.groupBy("part_key").agg(
        F.sum("n_starts").cast("long").alias("n_intervals"),
        F.sum(
            F.when(
                (F.col("running") > 0) & F.col("nxt").isNotNull(),
                F.col("nxt") - F.col("d"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("covered_days"),
    )


# --- equal-allocation stratified sample (deterministic hash rank) -----------
# K customers per nation selected by rank over the split-multiply key
# mixer — the equal-allocation complement to
# orders_weighted_systematic_sample (PPS) and doc_stratified_sample
# (proportional): every stratum contributes the same K regardless of
# its size, the right design when per-stratum variance matters more
# than population shares (per-nation eval splits). Deterministic: the
# hash is a pure key function, so the sample is reproducible across
# runs/engines — no RNG, no seed drift. One nation-partitioned
# window; the 25-way partitioning is balanced by construction.

_EQ_SAMPLE_K = 20


@register(
    "nation_equal_sample",
    oracle=f"""
WITH h AS (
  SELECT c_custkey, c_nationkey,
         (c_custkey * 48271 + 11) % 2147483647 AS hv
  FROM customer),
m AS (
  SELECT c_custkey, c_nationkey,
         (hv % 100003) * (hv // 100003 + 7) AS mv
  FROM h),
r AS (
  SELECT c_custkey, c_nationkey,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY mv, c_custkey) AS rk
  FROM m)
SELECT c_nationkey AS nationkey, CAST(rk AS BIGINT) AS rk,
       c_custkey AS custkey
FROM r WHERE rk <= {_EQ_SAMPLE_K}
""".strip(),
)
def nation_equal_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    hv = (F.col("c_custkey") * F.lit(48271) + F.lit(11)) % F.lit(2147483647)
    mv = (hv % F.lit(100003)) * (
        (hv - hv % F.lit(100003)) / F.lit(100003) + F.lit(7)
    ).cast("long")
    m = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", mv.alias("mv")
    )
    w = Window.partitionBy("c_nationkey").orderBy("mv", "c_custkey")
    return (
        m.select(
            "c_custkey",
            "c_nationkey",
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= _EQ_SAMPLE_K)
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("rk").cast("long").alias("rk"),
            F.col("c_custkey").alias("custkey"),
        )
    )


# --- weighted median (cumulative-weight window selection) --------------------
# Per nation: the order-count-weighted median account balance — the
# smallest balance whose cumulative weight reaches half the nation's
# total (lower weighted median: 2*cum >= tot, deterministic ties via
# key order). Exact integers end-to-end: cents, counts, and the
# half-total comparison as 2*cum >= tot (no 0.5 float). One
# nation-partitioned cumulative window + one aggregate — the same
# shape scales to any per-group percentile-by-weight (resource quotas,
# fee schedules) without a global sort.


@register(
    "nation_weighted_median_balance",
    oracle="""
WITH w AS (
  SELECT c.c_nationkey AS nationkey,
         CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS cents,
         c.c_custkey,
         CAST(COUNT(o.o_orderkey) AS BIGINT) AS wt
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3),
cum AS (
  SELECT nationkey, cents, wt,
         SUM(wt) OVER (PARTITION BY nationkey ORDER BY cents, c_custkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         SUM(wt) OVER (PARTITION BY nationkey) AS tot
  FROM w)
SELECT nationkey,
       CAST(MIN(tot) AS BIGINT) AS total_weight,
       CAST(MIN(CASE WHEN 2 * cw >= tot THEN cents END) AS BIGINT)
         AS wmedian_cents
FROM cum GROUP BY nationkey
""".strip(),
)
def nation_weighted_median_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").alias("nationkey"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    w = (
        cust.join(orders, "c_custkey")
        .groupBy("nationkey", "cents", "c_custkey")
        .agg(F.count(F.lit(1)).alias("wt"))
    )
    wp = Window.partitionBy("nationkey")
    cum = w.select(
        "nationkey",
        "cents",
        F.sum("wt")
        .over(
            wp.orderBy("cents", "c_custkey").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cw"),
        F.sum("wt").over(wp).alias("tot"),
    )
    return cum.groupBy("nationkey").agg(
        F.min("tot").cast("long").alias("total_weight"),
        F.min(F.when(2 * F.col("cw") >= F.col("tot"), F.col("cents")))
        .cast("long")
        .alias("wmedian_cents"),
    )


# --- ratio-to-report: top revenue customers with in-nation share -------------
# The classic percent-of-total window analytic: each customer's revenue
# as a share of their nation's total, top-3 per nation by revenue
# (ties -> key order). The share is one IEEE divide of exact cents;
# both windows reuse the SAME nation partitioning (one shuffle, two
# frames); top-k per group via rank filter, never a global sort.


@register(
    "nation_top_revenue_share",
    oracle="""
WITH rev AS (
  SELECT c.c_nationkey AS nationkey, c.c_custkey AS custkey,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2),
sh AS (
  SELECT nationkey, custkey, cents,
         CAST(SUM(cents) OVER (PARTITION BY nationkey) AS BIGINT)
           AS nation_cents,
         ROW_NUMBER() OVER (PARTITION BY nationkey
                            ORDER BY cents DESC, custkey) AS rk
  FROM rev)
SELECT nationkey, CAST(rk AS BIGINT) AS rk, custkey, cents,
       CAST(cents AS DOUBLE) / CAST(nation_cents AS DOUBLE)
         AS nation_share
FROM sh WHERE rk <= 3
""".strip(),
)
def nation_top_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("oc"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nationkey"),
    )
    rev = (
        orders.join(F.broadcast(cust), "o_custkey")
        .groupBy("nationkey", F.col("o_custkey").alias("custkey"))
        .agg(F.sum("oc").cast("long").alias("cents"))
    )
    wp = Window.partitionBy("nationkey")
    sh = rev.select(
        "nationkey",
        "custkey",
        "cents",
        F.sum("cents").over(wp).cast("long").alias("nation_cents"),
        F.row_number()
        .over(wp.orderBy(F.col("cents").desc(), F.col("custkey")))
        .alias("rk"),
    )
    return sh.where(F.col("rk") <= 3).select(
        "nationkey",
        F.col("rk").cast("long").alias("rk"),
        "custkey",
        "cents",
        (F.col("cents").cast("double") / F.col("nation_cents").cast("double"))
        .alias("nation_share"),
    )


# --- Lorenz curve of user activity (exact global deciles) --------------------
# Concentration of event volume across users as Lorenz points: users
# ranked into true SQL-NTILE deciles by activity (operators/rank.py —
# range shuffle + P-row offsets, never an Exchange SinglePartition),
# then per-decile event totals with the cumulative share. The running
# sum over the 10 decile rows reuses with_global_running_sum (same
# no-single-partition protocol); shares are single IEEE divides of
# exact counts. Companion to customer_gini_by_nation: the curve behind
# the coefficient.


@register(
    "user_activity_lorenz",
    oracle="""
WITH u AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev
  FROM events GROUP BY user_id),
d AS (
  SELECT user_id, n_ev,
         NTILE(10) OVER (ORDER BY n_ev, user_id) AS decile
  FROM u),
g AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(n_ev) AS BIGINT) AS events
  FROM d GROUP BY decile),
c AS (
  SELECT decile, n_users, events,
         CAST(SUM(events) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_events,
         CAST(SUM(events) OVER () AS BIGINT) AS total_events
  FROM g)
SELECT CAST(decile AS BIGINT) AS decile, n_users, events, cum_events,
       CAST(cum_events AS DOUBLE) / CAST(total_events AS DOUBLE)
         AS lorenz_cum_share
FROM c
""".strip(),
)
def user_activity_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_running_sum

    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_ev"))
    )
    d = with_global_ntile(u, ["n_ev", "user_id"], 10, "decile")
    g = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_ev").cast("long").alias("events"),
    )
    c = with_global_running_sum(
        g,
        ["decile"],
        "events",
        out_col="cum_events",
        total_col="total_events",
    )
    return c.select(
        F.col("decile").cast("long").alias("decile"),
        "n_users",
        "events",
        "cum_events",
        (
            F.col("cum_events").cast("double")
            / F.col("total_events").cast("double")
        ).alias("lorenz_cum_share"),
    )


# --- k-anonymity generalization ladder (one Expand pass) ---------------------
# The generalization lattice behind customer_k_anonymity: audit three
# coarsening levels — (nation, segment, balance band) -> drop the band
# -> drop the nation — in ONE scan via GROUPING SETS (Expand + a single
# shuffle; the naive form is three scans + a union). Per level: class
# count, below-k classes, smallest class, and the below-k share (one
# IEEE divide) — the curve a release planner walks until the risk
# share is acceptable.


@register(
    "k_anonymity_generalization",
    oracle=f"""
WITH classes AS (
  SELECT GROUPING(c_nationkey) + GROUPING(bal_band) AS level,
         CAST(COUNT(*) AS BIGINT) AS class_size
  FROM (SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band
        FROM customer)
  GROUP BY GROUPING SETS ((c_nationkey, c_mktsegment, bal_band),
                          (c_nationkey, c_mktsegment),
                          (c_mktsegment)))
SELECT CAST(level AS BIGINT) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN class_size < {_KANON_K} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_below_k,
       CAST(MIN(class_size) AS BIGINT) AS min_class_size,
       CAST(SUM(CASE WHEN class_size < {_KANON_K} THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS below_k_share
FROM classes GROUP BY level
""".strip(),
)
def k_anonymity_generalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("bal_band"),
    )
    classes = cust.groupingSets(
        [
            ["c_nationkey", "c_mktsegment", "bal_band"],
            ["c_nationkey", "c_mktsegment"],
            ["c_mktsegment"],
        ],
        "c_nationkey",
        "c_mktsegment",
        "bal_band",
    ).agg(
        (F.grouping("c_nationkey") + F.grouping("bal_band")).alias("level"),
        F.count(F.lit(1)).alias("class_size"),
    )
    below = F.sum(
        F.when(F.col("class_size") < _KANON_K, F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    return classes.groupBy(F.col("level").cast("long").alias("level")).agg(
        F.count(F.lit(1)).alias("n_classes"),
        below.alias("n_below_k"),
        F.min("class_size").cast("long").alias("min_class_size"),
        (below.cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "below_k_share"
        ),
    )


# --- Benford first-digit audit ------------------------------------------------
# Fraud/DQ screen: the first significant digit distribution of order
# totals. The digit comes from the decimal RENDERING of the exact
# integer cents (substr of the canonical base-10 string — both engines
# print integers identically), not from log10 floats; shares are one
# IEEE divide of exact counts. One aggregate over the scan + a
# broadcast scalar total.


@register(
    "orders_benford_digits",
    oracle="""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders),
g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g)
SELECT g.digit, g.n,
       CAST(g.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
FROM g, t
""".strip(),
)
def orders_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "orders").select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("digit")
    )
    g = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = g.agg(F.sum("n").cast("long").alias("total"))
    return g.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("total").cast("double")).alias(
            "share"
        ),
    )


# --- nation-to-nation trade flow matrix --------------------------------------
# The Sankey-source aggregate: revenue flowing from supplier nation to
# customer nation (one cell per ordered pair), with each cell's share
# of world trade. The fact side shuffles once on orderkey for the
# lineitem-orders join; customer and supplier keys then resolve through
# BROADCAST dims (nation never shuffles the fact), and the total is a
# broadcast scalar — the flow share is one IEEE divide of exact cents.


@register(
    "nation_trade_flows",
    oracle="""
WITH flows AS (
  SELECT s.s_nationkey AS supp_nation, c.c_nationkey AS cust_nation,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2),
t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM flows)
SELECT f.supp_nation, f.cust_nation, f.cents,
       CAST(f.cents AS DOUBLE) / CAST(t.total AS DOUBLE) AS flow_share
FROM flows f, t
""".strip(),
)
def nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("pc"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("cust_nation"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("s_nationkey").alias("supp_nation"),
    )
    flows = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), "o_custkey")
        .join(F.broadcast(supp), "l_suppkey")
        .groupBy("supp_nation", "cust_nation")
        .agg(F.sum("pc").cast("long").alias("cents"))
    )
    t = flows.agg(F.sum("cents").cast("long").alias("total"))
    return flows.crossJoin(F.broadcast(t)).select(
        "supp_nation",
        "cust_nation",
        "cents",
        (F.col("cents").cast("double") / F.col("total").cast("double"))
        .alias("flow_share"),
    )


# --- repeat-purchase rate within 30 days -------------------------------------
# Retention telemetry: of consecutive purchases of the SAME part by the
# SAME customer, how many arrive within 30 days — computed with a lag
# window over (customer, part) groups, NOT a temporal self-join: the
# state per group is one row, the shuffle is one hash partitioning, and
# there is no candidate blow-up to band away. Rate per market segment
# is one IEEE divide of exact counts.


@register(
    "segment_repeat_purchase_rate",
    oracle="""
WITH p AS (
  SELECT o.o_custkey, l.l_partkey, CAST(o.o_orderdate AS DATE) AS d,
         o.o_orderkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
gaps AS (
  SELECT o_custkey,
         date_diff('day',
             LAG(d) OVER (PARTITION BY o_custkey, l_partkey
                          ORDER BY d, o_orderkey),
             d) AS gap
  FROM p),
seg AS (
  SELECT c.c_mktsegment AS segment, g.gap
  FROM gaps g JOIN customer c ON c.c_custkey = g.o_custkey
  WHERE g.gap IS NOT NULL)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_consecutive_pairs,
       CAST(SUM(CASE WHEN gap <= 30 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeats_30d,
       CAST(SUM(CASE WHEN gap <= 30 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS repeat_rate
FROM seg GROUP BY segment
""".strip(),
)
def segment_repeat_purchase_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("d")
    )
    p = li.join(orders, li.l_orderkey == orders.o_orderkey)
    w = Window.partitionBy("o_custkey", "l_partkey").orderBy(
        "d", "o_orderkey"
    )
    gaps = p.select(
        "o_custkey", F.datediff(F.col("d"), F.lag("d").over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    seg = gaps.join(F.broadcast(cust), "o_custkey")
    rep = F.sum(
        F.when(F.col("gap") <= 30, F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    n = F.count(F.lit(1))
    return seg.groupBy("segment").agg(
        n.alias("n_consecutive_pairs"),
        rep.alias("n_repeats_30d"),
        (rep.cast("double") / n.cast("double")).alias("repeat_rate"),
    )


# --- year-over-year average order value ---------------------------------------
# Calendar analytics: per (year, month), the average order value and
# its ratio to the same month a year earlier — a self-join on the
# derived (month, year-1) key. Both AOVs are single IEEE divides of
# exact cents/counts; the YoY ratio is one further divide of those two
# deterministic doubles, so the chain stays bit-equal cross-engine.


@register(
    "orders_yoy_aov",
    oracle="""
WITH m AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2),
a AS (
  SELECT yr, mo, n, CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) AS aov
  FROM m)
SELECT cur.yr, cur.mo, cur.n AS n_orders, cur.aov,
       prv.aov AS aov_prev_year, cur.aov / prv.aov AS yoy_ratio
FROM a cur JOIN a prv ON prv.yr = cur.yr - 1 AND prv.mo = cur.mo
""".strip(),
)
def orders_yoy_aov(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    a = m.select(
        "yr",
        "mo",
        "n",
        (F.col("cents").cast("double") / F.col("n").cast("double")).alias(
            "aov"
        ),
    )
    cur, prv = a.alias("cur"), a.alias("prv")
    return cur.join(
        prv,
        (F.col("prv.yr") == F.col("cur.yr") - 1)
        & (F.col("prv.mo") == F.col("cur.mo")),
    ).select(
        F.col("cur.yr").alias("yr"),
        F.col("cur.mo").alias("mo"),
        F.col("cur.n").alias("n_orders"),
        F.col("cur.aov").alias("aov"),
        F.col("prv.aov").alias("aov_prev_year"),
        (F.col("cur.aov") / F.col("prv.aov")).alias("yoy_ratio"),
    )


# --- co-purchase edge table as a delta-maintained materialized view -------
# The round-8 protocol note argued that at 100 TB the right design for
# the graph family's shared input IS a materialized edge table — the
# per-query rebuild (a lineitem self-join) is the one cost every graph
# consumer re-pays. This operator makes that path oracle-backed: the
# WEIGHTED undirected co-purchase edge view  V(u, v, w) = #{lineitem
# pairs in the same order, u < v by part}  is maintained under a batch
# of APPENDED lineitems with the join-delta algebra
#     Δ(L ⋈ L) = ΔL ⋈ L_old  ∪  L_old ⋈ ΔL  ∪  ΔL ⋈ ΔL
# (pairs never cross orders, so each unordered new pair falls in
# exactly one of {new×old, new×new}); weights merge with a full-outer
# coalesce-add on (u, v) — never a base rescan. SUM/COUNT are
# self-maintainable, so appends to EXISTING orders are handled exactly
# (the case a date-partition rebuild cannot express). The arriving
# batch is a deterministic key-mod split; the ORACLE is the view
# definition recomputed over the full table, so a hash-green row IS
# the proof that delta-maintained ≡ full rebuild. At 100 TB: the delta
# self-joins shuffle only ΔL and the orders ΔL touches (semi-join
# pushdown below), and the merge shuffles |V| keys — vs the full
# rebuild's |L| ⋈ |L|. Graph consumers take these edges through the
# pass-your-own-edges API (operators' und= parameter).

_EDGE_MV_NEW = "l_suppkey % 5 = 0"  # the arriving append batch


@register(
    "copurchase_edges_mv",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}')
SELECT LEAST(a.l_partkey, b.l_partkey) AS u,
       GREATEST(a.l_partkey, b.l_partkey) AS v,
       CAST(COUNT(*) AS BIGINT) AS w
FROM li a JOIN li b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
""".strip(),
)
def copurchase_edges_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.to_date("l_shipdate")
            >= F.lit(COPURCHASE_SHIPDATE_LO).cast("date")
        )
        .select(
            "l_orderkey",
            "l_partkey",
            F.expr(_EDGE_MV_NEW).alias("_new"),
        )
    )
    old = li.where(~F.col("_new")).select("l_orderkey", "l_partkey")
    new = li.where(F.col("_new")).select("l_orderkey", "l_partkey")

    def pair_weights(a: DataFrame, b: DataFrame, strict: bool) -> DataFrame:
        """Weighted unordered pairs from a ⋈ b on orderkey.  With
        ``strict`` (self-join) the a<b predicate emits each unordered
        pair once; across disjoint sides every unordered pair appears
        exactly once already, so != suffices."""
        cond = (
            F.col("a.l_partkey") < F.col("b.l_partkey")
            if strict
            else F.col("a.l_partkey") != F.col("b.l_partkey")
        )
        return (
            a.alias("a")
            .join(b.alias("b"), "l_orderkey")
            .where(cond)
            .groupBy(
                F.least("a.l_partkey", "b.l_partkey").alias("u"),
                F.greatest("a.l_partkey", "b.l_partkey").alias("v"),
            )
            .agg(F.count(F.lit(1)).alias("w"))
        )

    old_view = pair_weights(old, old, strict=True)  # the MV state
    # Delta: new×old (one direction covers both — sides are disjoint)
    # plus new×new.  Semi-join pushdown: only old rows in orders the
    # batch touched can contribute to the delta.
    touched = new.select("l_orderkey").distinct()
    old_touched = old.join(touched, "l_orderkey", "left_semi")
    delta = (
        pair_weights(new, old_touched, strict=False)
        .unionByName(pair_weights(new, new, strict=True))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w_d"))
    )
    z = F.lit(0).cast("long")
    merged = old_view.join(delta, ["u", "v"], "full").select(
        "u",
        "v",
        (F.coalesce("w", z) + F.coalesce("w_d", z)).cast("long").alias("w"),
    )
    return merged.where(F.col("w") > 0)


# --- robust per-group outliers: exact median + MAD -------------------------
# The robust twin of the z-score rule (anomaly_zscore): median absolute
# deviation flags outliers without the mean/σ's sensitivity to the very
# outliers being hunted. EXACT medians, not percentile_approx: the
# account balances ride as integer cents, so every median is either an
# integer or a .5 (the two-middle average), every |x − med| a multiple
# of 0.5, and the MAD a multiple of 0.25 — all exactly representable in
# a double, so Spark's interpolating percentile() and DuckDB's median()
# agree bit-for-bit (the integer-scaled exact-stats protocol,
# functions/stable.py, extended to order statistics). Plan: two grouped
# exact percentiles (each one shuffle of integer pairs per group) and a
# fact-side re-join; the 3.0·MAD fence comparison is pure arithmetic on
# exact values. At 100 TB exact grouped medians are a sort-based
# aggregate per key — the documented cost of exactness; the approx
# variant (percentile_approx / KLL) is the registry's separate sketch
# family.

_MAD_FENCE = 3.0


@register(
    "nation_balance_mad",
    oracle="""
WITH c AS (
  SELECT c_nationkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer),
med AS (
  SELECT c_nationkey, median(cents) AS med_cents
  FROM c GROUP BY c_nationkey),
dev AS (
  SELECT c.c_nationkey, c.cents, ABS(c.cents - m.med_cents) AS adev
  FROM c JOIN med m ON c.c_nationkey = m.c_nationkey),
mad AS (
  SELECT c_nationkey, median(adev) AS mad_cents
  FROM dev GROUP BY c_nationkey)
SELECT d.c_nationkey AS nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       MIN(m.med_cents) AS med_cents,
       MIN(a.mad_cents) AS mad_cents,
       CAST(SUM(CASE WHEN d.adev > 3.0 * a.mad_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d
JOIN med m ON d.c_nationkey = m.c_nationkey
JOIN mad a ON d.c_nationkey = a.c_nationkey
GROUP BY d.c_nationkey
""".strip(),
)
def nation_balance_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    med = c.groupBy("c_nationkey").agg(
        F.percentile("cents", F.lit(0.5)).alias("med_cents")
    )
    dev = c.join(med, "c_nationkey").select(
        "c_nationkey",
        "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("adev"),
    )
    mad = dev.groupBy("c_nationkey").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad_cents")
    )
    return (
        dev.join(mad, "c_nationkey")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("med_cents").alias("med_cents"),
            F.min("mad_cents").alias("mad_cents"),
            F.sum(
                F.when(
                    F.col("adev") > F.lit(_MAD_FENCE) * F.col("mad_cents"), 1
                ).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


# --- degree distribution of the co-purchase graph (log2-binned) ------------
# The first diagnostic every graph pipeline runs before choosing its
# algorithms: the degree histogram on power-of-two bins (straight-line
# on log-log ⇔ power law ⇔ the hub regimes node_similarity's cap and
# the LSH fallback exist for). The bin index floor(log2(deg)) is
# computed INTEGER-side as length(binary repr) − 1 — no float log at
# bin boundaries, so both engines bin identically. One shuffle for the
# degree aggregate, one for the tiny histogram; at 100 TB the second
# groupBy is ~60 rows.

@register(
    "part_degree_histogram",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                  GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (
  SELECT node, COUNT(*) AS deg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY node)
SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS log2_bin,
       CAST(POWER(2, length(bin(deg)) - 1) AS BIGINT) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MIN(deg) AS BIGINT) AS min_deg,
       CAST(MAX(deg) AS BIGINT) AS max_deg
FROM deg GROUP BY 1, 2
""".strip(),
)
def part_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.triangles import undirected_edges

    edges = copurchase_edges(spark, sf_dir)
    und = undirected_edges(edges)
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    log2_bin = (F.length(F.bin("deg")) - 1).cast("long")
    return (
        deg.groupBy(
            log2_bin.alias("log2_bin"),
            F.pow(F.lit(2.0), (F.length(F.bin("deg")) - 1).cast("double"))
            .cast("long")
            .alias("bin_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("deg").cast("long").alias("min_deg"),
            F.max("deg").cast("long").alias("max_deg"),
        )
    )


# --- l-diversity audit (the k-anonymity family's second axis) --------------
# k-anonymity bounds re-identification by class size; l-diversity
# bounds ATTRIBUTE disclosure — a class of 50 identical-QI customers
# is still leaky if all 50 share the same sensitive value. Same
# quasi-identifier classes as customer_k_anonymity (nation, segment,
# balance band); the sensitive attribute is the market-facing order
# priority mix reached through the customer's orders (an attribute a
# release would publish). distinct-l per class = COUNT(DISTINCT
# sensitive) — one Expand-free grouped aggregate after the fact-side
# join; at 100 TB the join is customer⋈orders on custkey (both
# bucketed in a real deployment) and the distinct rides the same
# shuffle as the class key.

_LDIV_L = 3


@register(
    "customer_l_diversity",
    oracle=f"""
SELECT c.c_nationkey AS nationkey, c.c_mktsegment AS segment,
       CAST(FLOOR(c.c_acctbal / 1000.0) AS BIGINT) AS bal_band,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o.o_orderpriority) AS BIGINT) AS l_distinct,
       (COUNT(DISTINCT o.o_orderpriority) < {_LDIV_L}) AS below_l
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY 1, 2, 3
""".strip(),
)
def customer_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("bal_band"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return j.groupBy("nationkey", "segment", "bal_band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_orderpriority").alias("l_distinct"),
        (F.countDistinct("o_orderpriority") < F.lit(_LDIV_L)).alias(
            "below_l"
        ),
    )


# --- local clustering coefficient on the co-purchase graph -----------------
# Per-node cohesion: cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — the
# fraction of a node's neighbor pairs that are themselves connected.
# tri(v) counts each triangle containing v once, computed from the
# (u < v < w)-oriented triangle enumeration (the operators/triangles.py
# orientation bounds the wedge join at O(Σ deg²) on the ORIENTED
# degrees, i.e. O(m^1.5)); each oriented triangle credits all three
# corners via one explode. Degrees and triangle credits merge on the
# node key; the ratio is exact-integer-derived (2·tri and deg·(deg−1)
# are BIGINTs, the double division is one correctly-rounded op in both
# engines). Nodes with deg ≤ 1 are excluded (coefficient undefined).

@register(
    "part_clustering_coefficient",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS MATERIALIZED (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                  GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
cred AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
  FROM (SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY node),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY node)
SELECT d.node AS part_key, d.deg,
       COALESCE(c.n_tri, 0) AS n_triangles,
       CAST(2.0 * COALESCE(c.n_tri, 0) AS DOUBLE)
         / (d.deg * (d.deg - 1)) AS clustering_coeff
FROM deg d LEFT JOIN cred c ON c.node = d.node
WHERE d.deg > 1
""".strip(),
)
def part_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.triangles import undirected_edges

    edges = copurchase_edges(spark, sf_dir)
    und = undirected_edges(edges).persist()
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    cred = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    n_tri = F.coalesce(F.col("n_tri"), F.lit(0)).cast("long")
    return (
        deg.join(cred, "node", "left")
        .where(F.col("deg") > 1)
        .select(
            F.col("node").alias("part_key"),
            F.col("deg").cast("long").alias("deg"),
            n_tri.alias("n_triangles"),
            (
                (F.lit(2.0) * n_tri)
                / (F.col("deg") * (F.col("deg") - 1)).cast("double")
            ).alias("clustering_coeff"),
        )
    )


# --- weighted PageRank over the maintained edge MV -------------------------
# The composition the MV exists for: graph centrality that RESPECTS
# co-purchase multiplicity (an edge bought together in 40 orders pulls
# 40× the walk probability of a one-off), consuming the delta-
# maintained weighted view (copurchase_edges_mv) through the
# pass-your-own-edges API instead of re-flattening lineitem pairs to
# 0/1. Exact-integer protocol: per-edge contribution (rank·w) div W(u)
# with the split-multiply damping (operators/pagerank.py:
# weighted_pagerank — overflow bound in its docstring; scale 1e9 here).
# Oracle: the same recurrence unrolled as 8 chained CTEs.

_WPR_SCALE = 1_000_000_000


def _weighted_pagerank_oracle() -> str:
    from ..operators.pagerank import DAMP_DEN, DAMP_NUM

    base = (_WPR_SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    iters = []
    for i in range(1, _PR_ITERS + 1):
        iters.append(
            f"""r{i} AS MATERIALIZED (
  SELECT n.node,
         CAST({base}
              + {DAMP_NUM} * (COALESCE(c.contrib, 0) // {DAMP_DEN})
              + ({DAMP_NUM} * (COALESCE(c.contrib, 0) % {DAMP_DEN}))
                // {DAMP_DEN}
              AS BIGINT) AS rank
  FROM (SELECT src AS node FROM deg) n
  LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM((r.rank * e.w) // g.outw) AS BIGINT) AS contrib
    FROM edges e JOIN r{i - 1} r ON e.src = r.node
    JOIN deg g ON e.src = g.src
    GROUP BY e.dst) c USING (node))"""
        )
    joined = ",\n".join(iters)
    return f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
mv AS MATERIALIZED (
  SELECT LEAST(a.l_partkey, b.l_partkey) AS u,
         GREATEST(a.l_partkey, b.l_partkey) AS v,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
edges AS MATERIALIZED (
  SELECT u AS src, v AS dst, w FROM mv
  UNION ALL SELECT v AS src, u AS dst, w FROM mv),
deg AS MATERIALIZED (
  SELECT src, CAST(SUM(w) AS BIGINT) AS outw FROM edges GROUP BY src),
r0 AS (SELECT src AS node, CAST({_WPR_SCALE} AS BIGINT) AS rank
       FROM deg),
{joined}
SELECT node AS part_key, rank AS pagerank_scaled
FROM r{_PR_ITERS}
""".strip()


def copurchase_weighted_edges(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The weighted undirected edge view (u < v, w = pair multiplicity)
    built with the plain one-self-join rebuild — the cold-start recipe
    the oracles' ``mv`` CTE states directly.  The DELTA-maintenance
    algebra lives in :func:`copurchase_edges_mv` (its own benched,
    oracle-backed line); consuming the delta plan from a cold session
    re-pays a three-join + full-outer merge that the plain rebuild
    never needs (VERDICT r10: 11.6 s vs the 6.4 s this recipe costs
    inside weighted pagerank).  At 100 TB neither runs per query — the
    stored view (copurchase_edges_stored) is the serve path.

    Built by PER-ORDER array pair generation instead of the lineitem
    self-join: one groupBy(order) + a map-side nested-transform explode
    of the sorted per-order part LIST (list, not set — position pairs
    i<j with x_i ≠ x_j reproduce the self-join's multiplicity exactly:
    an unordered value pair occurring cnt_x·cnt_y times contributes
    cnt_x·cnt_y, same as a.partkey < b.partkey over lineitem rows),
    then one (u, v)-keyed count. Baskets are small and bounded, so the
    explode is cheap and the self-join's orderkey shuffle disappears
    (~2× faster at sf0.1, measured on the link-prediction rewrite)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.to_date("l_shipdate")
            >= F.lit(COPURCHASE_SHIPDATE_LO).cast("date")
        )
        .select("l_orderkey", "l_partkey")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_partkey")).alias("ps")
    )
    return (
        per_order.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .where(F.col("p.u") != F.col("p.v"))
        .groupBy(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )


@register(
    "part_copurchase_pagerank_weighted",
    oracle=_weighted_pagerank_oracle(),
)
def part_copurchase_pagerank_weighted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.pagerank import weighted_pagerank

    # Persist the u<v view BEFORE symmetrizing: union's two branches are
    # separate subplans (Spark has no common-subexpression dedup), so an
    # unpersisted mv would pay the lineitem self-join TWICE when
    # weighted_pagerank materializes the edge fact.
    mv = copurchase_weighted_edges(spark, sf_dir).persist()
    edges = mv.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).unionAll(
        mv.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
    )
    return weighted_pagerank(edges, scale=_WPR_SCALE).select(
        F.col("node").alias("part_key"), "pagerank_scaled"
    )


# --- leakage-safe train/val/test split (group-aware) ------------------------
# Splitting ORDERS uniformly leaks: two orders of the same customer land
# in train and test, and any model keyed on customer behavior reads the
# answer. The group-aware split assigns the GROUP (customer) to a fold
# via the deterministic md5 bucket (the curation pipeline's
# reproducible-sample protocol — no engine RNG), so every order of a
# customer shares a fold BY CONSTRUCTION. 80/10/10 on bucket16
# (52429 / 58982 of 65536). Output: per-fold exact order counts and
# revenue cents — the audit row a training-data export logs. One
# broadcast-free join (orders ⋈ customer-fold on custkey) and one tiny
# aggregate.

_SPLIT_TRAIN_HI = 52429   # floor(0.8 * 65536)
_SPLIT_VAL_HI = 58982     # floor(0.9 * 65536)


@register(
    "orders_group_split",
    oracle=f"""
WITH folds AS (
  SELECT c_custkey,
         CASE WHEN b < {_SPLIT_TRAIN_HI} THEN 'train'
              WHEN b < {_SPLIT_VAL_HI} THEN 'val'
              ELSE 'test' END AS fold
  FROM (
    SELECT c_custkey,
           (strpos('0123456789abcdef', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substr(md5(CAST(c_custkey AS VARCHAR)), 2, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substr(md5(CAST(c_custkey AS VARCHAR)), 3, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(CAST(c_custkey AS VARCHAR)), 4, 1)) - 1) AS b
    FROM customer))
SELECT f.fold,
       CAST(COUNT(DISTINCT f.c_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM folds f JOIN orders o ON o.o_custkey = f.c_custkey
GROUP BY f.fold
""".strip(),
)
def orders_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    b = F.conv(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 4), 16, 10
    ).cast("long")
    folds = cust.select(
        "c_custkey",
        F.when(b < _SPLIT_TRAIN_HI, "train")
        .when(b < _SPLIT_VAL_HI, "val")
        .otherwise("test")
        .alias("fold"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return (
        orders.join(folds, orders.o_custkey == folds.c_custkey)
        .groupBy("fold")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


# --- SQL scripting (Spark 4 BEGIN…END procedural surface) -------------------
# The ad-hoc-analyst entry point one notch past pipe syntax
# (sql_pipe_quarterly_revenue): a multi-statement script DECLAREs a
# scalar threshold from one query and applies it in the next — the
# "compute a stat, then filter by it" pattern that otherwise needs a
# driver round-trip or a manual cross join. The script's scalar
# assignment plans as an ordinary scalar subquery (partial-agg
# exchange), and the final statement is a plain filtered aggregate —
# scripting is control flow, not a new execution path, so the 100 TB
# behavior is exactly the underlying plans'. Threshold kept in exact
# integer cents (SUM div COUNT, floor) so both engines compare
# identically.

@register(
    "sql_script_threshold_filter",
    oracle="""
WITH o AS (
  SELECT o_custkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
thr AS (
  SELECT CAST(SUM(cents) // COUNT(*) AS BIGINT) AS avg_cents FROM o)
SELECT o.o_custkey AS custkey,
       CAST(COUNT(*) AS BIGINT) AS n_big_orders,
       CAST(SUM(o.cents) AS BIGINT) AS big_cents,
       MIN(thr.avg_cents) AS threshold_cents
FROM o, thr
WHERE o.cents > thr.avg_cents
GROUP BY o.o_custkey
""".strip(),
)
def sql_script_threshold_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.tables import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(
        """
        BEGIN
          DECLARE avg_cents BIGINT;
          SET avg_cents = (
            SELECT SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                   DIV COUNT(*)
            FROM orders);
          SELECT o_custkey AS custkey,
                 CAST(COUNT(*) AS BIGINT) AS n_big_orders,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS big_cents,
                 avg_cents AS threshold_cents
          FROM orders
          WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > avg_cents
          GROUP BY o_custkey;
        END
        """
    )


# --- daily open-order backlog (sweep line + distributed prefix sum) ---------
# "How many orders were in flight on each day" — the ops time series
# behind capacity planning. The naive form joins every order's
# [orderdate, last_shipdate] interval against a calendar (O(orders ×
# days)); the engine shape is the SWEEP LINE: each order contributes
# +1 at its open date and −1 the day after its last lineitem ships,
# deltas aggregate per day (one small shuffle), and the backlog is the
# EXCLUSIVE-of-nothing running sum of deltas over the date order —
# computed with the distributed prefix-sum machinery
# (operators/rank.py:with_global_running_sum; dates are a total order
# after the per-day aggregate, and the sum is exact integers). Days
# with no events inherit the previous balance and are not emitted
# (the LOCF gap-fill operator composes downstream if a dense calendar
# is needed).

@register(
    "orders_open_backlog_daily",
    oracle="""
WITH span AS (
  SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS open_d,
         MAX(CAST(l.l_shipdate AS DATE)) + INTERVAL 1 DAY AS close_d
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)),
delta AS (
  SELECT d, CAST(SUM(x) AS BIGINT) AS delta
  FROM (SELECT open_d AS d, 1 AS x FROM span
        UNION ALL SELECT CAST(close_d AS DATE), -1 FROM span)
  GROUP BY d)
SELECT d AS day, delta,
       CAST(SUM(delta) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS open_orders
FROM delta
""".strip(),
)
def orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_running_sum

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("open_d")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship_d")
    )
    span = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "open_d")
        .agg(F.date_add(F.max("ship_d"), 1).alias("close_d"))
    )
    delta = (
        span.select(F.col("open_d").alias("d"), F.lit(1).alias("x"))
        .unionAll(
            span.select(F.col("close_d").alias("d"), F.lit(-1).alias("x"))
        )
        .groupBy("d")
        .agg(F.sum("x").cast("long").alias("delta"))
    )
    out = with_global_running_sum(
        delta, ["d"], "delta", out_col="open_orders"
    )
    return out.select(
        F.col("d").alias("day"),
        "delta",
        F.col("open_orders").cast("long").alias("open_orders"),
    )


# --- customer value-tier migration (period-over-period transition) ----------
# The churn dashboard's transition matrix: tier customers by order
# count in each half of the history (H1: < 1995-07-01 ≤ H2) and count
# the (tier_H1 → tier_H2) flows, including entries ('new') and exits
# ('gone'). Two conditional aggregates from ONE scan (no self-join of
# orders), a full-outer merge on custkey, and a tiny matrix aggregate.
# Tiers are integer thresholds (1 / 2-3 / 4+ orders), so the matrix is
# exact.

_MIGRATE_SPLIT = "1995-07-01"


def _tier_sql(col: str) -> str:
    return (f"CASE WHEN {col} IS NULL OR {col} = 0 THEN 'none' "
            f"WHEN {col} = 1 THEN 'one' "
            f"WHEN {col} <= 3 THEN 'few' ELSE 'many' END")


@register(
    "customer_tier_migration",
    oracle=f"""
WITH counts AS (
  SELECT o_custkey,
         SUM(CASE WHEN CAST(o_orderdate AS DATE) < DATE '{_MIGRATE_SPLIT}'
                  THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '{_MIGRATE_SPLIT}'
                  THEN 1 ELSE 0 END) AS n2
  FROM orders GROUP BY o_custkey)
SELECT {_tier_sql('n1')} AS tier_h1,
       {_tier_sql('n2')} AS tier_h2,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM counts
GROUP BY 1, 2
""".strip(),
)
def customer_tier_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.to_date("o_orderdate") < F.lit(_MIGRATE_SPLIT).cast("date"))
        .cast("int")
        .alias("_h1"),
    )
    counts = o.groupBy("o_custkey").agg(
        F.sum("_h1").alias("n1"),
        F.sum(1 - F.col("_h1")).alias("n2"),
    )

    def tier(c):
        col = F.col(c)
        return (
            F.when(col.isNull() | (col == 0), "none")
            .when(col == 1, "one")
            .when(col <= 3, "few")
            .otherwise("many")
        )

    return counts.groupBy(
        tier("n1").alias("tier_h1"), tier("n2").alias("tier_h2")
    ).agg(F.count(F.lit(1)).alias("n_customers"))


# --- top-k refresh over a delta-maintained aggregate ------------------------
# Top-k is NOT self-maintainable from the k rows alone (an outside
# customer can enter on new revenue the view never kept), so the
# correct incremental design keeps the FULL grouped aggregate as the
# maintained state — SUM/COUNT merge under inserts with the
# coalesce-add algebra (mv_agg_delta_maintenance) — and refreshes the
# top-k as a cheap DOWNSTREAM of the merged state: TakeOrderedAndProject
# over |groups| rows, never a base rescan. Deterministic tiebreak
# (revenue DESC, custkey ASC); the oracle is the definition recomputed
# over the full table, so a green row proves merge + refresh ≡
# recompute.

_TOPK_MV_K = 20
_TOPK_MV_INS = "o_orderkey % 9 = 4"  # the arriving insert batch


@register(
    "topk_mv_refresh",
    oracle=f"""
WITH agg AS (
  SELECT o_custkey AS custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey)
SELECT custkey, revenue_cents, n_orders
FROM agg
ORDER BY revenue_cents DESC, custkey
LIMIT {_TOPK_MV_K}
""".strip(),
)
def topk_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(_TOPK_MV_INS).alias("_ins"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )

    def agg(df, r, n):
        return df.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.sum("cents").alias(r), F.count(F.lit(1)).alias(n)
        )

    old_view = agg(o.where(~F.col("_ins")), "r", "n")  # the MV state
    ins = agg(o.where(F.col("_ins")), "r_i", "n_i")
    z = F.lit(0).cast("long")
    merged = old_view.join(ins, "custkey", "full").select(
        "custkey",
        (F.coalesce("r", z) + F.coalesce("r_i", z))
        .cast("long")
        .alias("revenue_cents"),
        (F.coalesce("n", z) + F.coalesce("n_i", z))
        .cast("long")
        .alias("n_orders"),
    )
    return merged.orderBy(
        F.col("revenue_cents").desc(), F.col("custkey").asc()
    ).limit(_TOPK_MV_K)


# --- SQL UDF (CREATE FUNCTION … RETURN) surface ------------------------------
# Spark 4's declarative SQL UDFs: the function body is INLINED into the
# plan at resolution (a Catalyst expression, whole-stage-codegen'd) —
# the analyst-facing reuse surface that costs nothing at runtime,
# unlike Python UDFs. The UDF packages the repo's exact-cents revenue
# protocol once; the query uses it twice (projection + aggregate).
# Re-registration with CREATE OR REPLACE keeps the query re-runnable
# in one session. The oracle inlines the same expression — which is
# also exactly what Catalyst does, so this doubles as the parity proof
# that the UDF adds no arithmetic of its own.

@register(
    "sql_udf_revenue_bands",
    oracle="""
WITH r AS (
  SELECT l_orderkey,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS rev_c
  FROM lineitem)
SELECT CAST(rev_c // 500000 AS BIGINT) AS band_5k,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(rev_c) AS BIGINT) AS revenue_cents
FROM r GROUP BY 1
""".strip(),
)
def sql_udf_revenue_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_tables

    register_tables(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION rev_cents(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN CAST(ROUND(p * (1 - d) * 100) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT CAST(rev_cents(l_extendedprice, l_discount) DIV 500000
                    AS BIGINT) AS band_5k,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(rev_cents(l_extendedprice, l_discount))
                    AS BIGINT) AS revenue_cents
        FROM lineitem GROUP BY 1
        """
    )


# --- join-cardinality estimation via CMS inner product -----------------------
# The optimizer-adjacent sketch trick [Cormode & Muthukrishnan '05 §4.2]:
# |A ⋈_k B| = Σ_v f_A(v)·f_B(v), and the inner product of two
# Count-Min rows OVERESTIMATES it (min over rows tightens) — so two
# tiny sketches built with one pass per side answer "how big would
# this join be" without running it. Sketches use the cross-engine
# (a_i·k + b_i) mod P mod W hash family, so build, inner product, and
# the min are exactly reproducible in the oracle; the exact Σ f_A·f_B
# rides along from a key-level aggregate join, and the output is the
# one-row (estimate, exact, ratio) audit. d=4 rows × W=1024 counters:
# the sketch side is O(d·W) however large the inputs — at 100 TB both
# sides build in one map-side-combined pass and the estimate is a
# driver-sized reduce.

_CMS_D = 4
_CMS_W = 1024


def _cms_consts() -> tuple[list[int], list[int]]:
    a, b = [], []
    for i in range(_CMS_D):
        hv = (i * 16807 + 271) % 2147483647
        mv = (hv % 100003) * (hv // 100003 + 23)
        a.append((mv % ((1 << 29) - 1)) | 1)
        b.append((mv // 11) % 1_000_000_007)
    return a, b


def _cms_join_oracle() -> str:
    a, b = _cms_consts()
    al = ", ".join(map(str, a))
    bl = ", ".join(map(str, b))
    return f"""
WITH rows_ AS (SELECT UNNEST(range({_CMS_D})) AS r),
ca AS (
  SELECT r.r,
         (([{al}][r.r + 1] * (o_custkey % 1000000007) + [{bl}][r.r + 1])
          % 1000000007) % {_CMS_W} AS pos,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders, rows_ r GROUP BY 1, 2),
cb AS (
  SELECT r.r,
         (([{al}][r.r + 1] * (c_custkey % 1000000007) + [{bl}][r.r + 1])
          % 1000000007) % {_CMS_W} AS pos,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer, rows_ r GROUP BY 1, 2),
est AS (
  SELECT MIN(ip) AS estimate FROM (
    SELECT ca.r, CAST(SUM(ca.cnt * cb.cnt) AS BIGINT) AS ip
    FROM ca JOIN cb ON ca.r = cb.r AND ca.pos = cb.pos
    GROUP BY ca.r)),
exact AS (
  SELECT CAST(SUM(fa.n * fb.n) AS BIGINT) AS exact_rows
  FROM (SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY 1) fa
  JOIN (SELECT c_custkey AS k, COUNT(*) AS n FROM customer GROUP BY 1) fb
    ON fa.k = fb.k)
SELECT e.estimate, x.exact_rows,
       CAST(e.estimate AS DOUBLE) / x.exact_rows AS overestimate_ratio
FROM est e, exact x
""".strip()


@register("join_cardinality_estimate", oracle=_cms_join_oracle())
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    a_c, b_c = _cms_consts()
    P = 1_000_000_007

    def cms(df, key):
        rows = [
            F.struct(
                F.lit(i).alias("r"),
                (
                    # key reduced mod P BEFORE the multiply: a_i < 2^29
                    # and (key % P) < 2^30 keep the product < 2^59, so
                    # the protocol never overflows int64 however large
                    # the key universe (Spark would wrap silently where
                    # DuckDB errors — the engines must agree bit-for-bit).
                    (F.lit(a_c[i]) * (F.col(key) % P) + F.lit(b_c[i])) % P
                    % _CMS_W
                ).alias("pos"),
            )
            for i in range(_CMS_D)
        ]
        return (
            df.select(F.explode(F.array(*rows)).alias("rp"))
            .groupBy("rp.r", "rp.pos")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    ca = cms(orders, "o_custkey")
    cb = cms(cust, "c_custkey")
    est = (
        ca.join(cb.withColumnRenamed("cnt", "cnt_b"), ["r", "pos"])
        .groupBy("r")
        .agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("ip"))
        .agg(F.min("ip").cast("long").alias("estimate"))
    )
    fa = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    fb = cust.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    exact = fa.join(fb, "k").agg(
        F.sum(F.col("n_a") * F.col("n_b")).cast("long").alias("exact_rows")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "estimate",
        "exact_rows",
        (
            F.col("estimate").cast("double")
            / F.col("exact_rows").cast("double")
        ).alias("overestimate_ratio"),
    )


# --- modularity of the LPA communities (partition-quality audit) ------------
# Newman modularity Q = Σ_c [ e_c/m − (d_c / 2m)² ] for the
# deterministic 4-round LPA partition — the one-row audit that says
# whether the communities are real structure or noise (Q ≈ 0). All
# inputs are exact integers (m undirected edges, intra-community edge
# count, per-community degree sums squared); Q itself is two
# correctly-rounded divisions and a subtract, identical in both
# engines. The oracle nests the LPA unroll as a subquery and replays
# the same arithmetic. Engine shape: edges join the label map on both
# endpoints (two node-keyed joins), then two tiny aggregates.

@register(
    "part_copurchase_modularity",
    oracle=f"""
WITH lab AS MATERIALIZED (
  SELECT part_key AS node, community FROM ({_lpa_oracle()}) t),
li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS MATERIALIZED (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                  GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
intra AS (
  SELECT CAST(SUM(CASE WHEN lu.community = lv.community
                  THEN 1 ELSE 0 END) AS BIGINT) AS intra_edges
  FROM e JOIN lab lu ON lu.node = e.u JOIN lab lv ON lv.node = e.v),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY node),
dsq AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
         CAST(SUM(dc * dc) AS BIGINT) AS sum_deg_sq
  FROM (SELECT l.community, CAST(SUM(d.deg) AS BIGINT) AS dc
        FROM deg d JOIN lab l ON l.node = d.node
        GROUP BY l.community))
SELECT d.n_communities, m.m AS m_edges, i.intra_edges, d.sum_deg_sq,
       CAST(i.intra_edges AS DOUBLE) / m.m
         - CAST(d.sum_deg_sq AS DOUBLE) / (4.0 * m.m * m.m) AS modularity
FROM dsq d, m, intra i
""".strip(),
)
def part_copurchase_modularity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.triangles import undirected_edges

    edges = copurchase_edges(spark, sf_dir)
    und = undirected_edges(edges).persist()
    # The label table is SHARED with part_copurchase_lpa through the
    # materialized store (lpa_labels_stored, defined with the graph-MV
    # protocol below): VERDICT r9 measured this query re-paying the
    # full LPA run its sibling had just computed — at 100 TB the label
    # table is a stored artifact every community consumer reads. The
    # store is deterministic (4 synchronous rounds, fingerprint-keyed),
    # so the result is identical to recomputing in-query.
    lab = lpa_labels_stored(spark, sf_dir).select(
        "node", "community"
    ).persist()
    lu = lab.select(F.col("node").alias("u"), F.col("community").alias("cu"))
    lv = lab.select(F.col("node").alias("v"), F.col("community").alias("cv"))
    e_lab = und.join(lu, "u").join(lv, "v")
    stats = e_lab.agg(
        F.count(F.lit(1)).alias("m_edges"),
        F.sum((F.col("cu") == F.col("cv")).cast("int"))
        .cast("long")
        .alias("intra_edges"),
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dsq = (
        deg.join(lab, "node")
        .groupBy("community")
        .agg(F.sum("deg").alias("dc"))
        .agg(
            F.count(F.lit(1)).alias("n_communities"),
            F.sum(F.col("dc") * F.col("dc")).cast("long").alias("sum_deg_sq"),
        )
    )
    out = dsq.crossJoin(F.broadcast(stats))
    q = (
        F.col("intra_edges").cast("double") / F.col("m_edges")
        - F.col("sum_deg_sq").cast("double")
        / (F.lit(4.0) * F.col("m_edges") * F.col("m_edges"))
    )
    return out.select(
        "n_communities",
        F.col("m_edges").cast("long").alias("m_edges"),
        "intra_edges",
        "sum_deg_sq",
        q.alias("modularity"),
    )


# --- degree assortativity of the co-purchase graph --------------------------
# Newman's r: the Pearson correlation of endpoint degrees over edges —
# do hubs buy with hubs (r > 0) or with the long tail (r < 0)? The
# third one-row structure audit beside the degree histogram and
# modularity; together they are the "what graph is this" triptych run
# before choosing algorithms. Sums are exact BIGINTs over the
# symmetrized endpoint pairs (2m rows, each edge contributing both
# orientations, the standard undirected convention); r itself is one
# double expression over six integers — identical in both engines.

@register(
    "part_degree_assortativity",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS MATERIALIZED (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                  GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY node),
ends AS (
  SELECT du.deg AS x, dv.deg AS y
  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
  UNION ALL
  SELECT dv.deg, du.deg
  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM ends)
SELECT n AS n_edge_ends, sxy, sx AS sum_deg,
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       / SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
         AS assortativity
FROM s
""".strip(),
)
def part_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.triangles import undirected_edges

    edges = copurchase_edges(spark, sf_dir)
    und = undirected_edges(edges).persist()
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("x"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("y"))
    ej = und.join(du, "u").join(dv, "v")
    # The symmetrized endpoint multiset is ej ∪ swap(ej), so every sum
    # over it is exact algebra on ONE pass over ej: n = 2·|ej|,
    # Σx = Σy = Σ(x)+Σ(y), Σxy doubles, Σx² = Σy² = Σ(x²)+Σ(y²) — all
    # exact BIGINTs, bit-identical to aggregating the union, at half
    # the aggregate input and without materializing ej twice
    # (guide §2.3: aggregate before you shuffle).
    s = ej.agg(
        (F.count(F.lit(1)) * 2).alias("n"),
        (F.sum("x") + F.sum("y")).cast("long").alias("sx"),
        (F.sum("x") + F.sum("y")).cast("long").alias("sy"),
        (F.sum(F.col("x") * F.col("y")) * 2).cast("long").alias("sxy"),
        (F.sum(F.col("x") * F.col("x")) + F.sum(F.col("y") * F.col("y")))
        .cast("long")
        .alias("sxx"),
        (F.sum(F.col("x") * F.col("x")) + F.sum(F.col("y") * F.col("y")))
        .cast("long")
        .alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return s.select(
        F.col("n").cast("long").alias("n_edge_ends"),
        "sxy",
        F.col("sx").alias("sum_deg"),
        (num / den).alias("assortativity"),
    )


# --- cohort LTV curve (cumulative revenue per cohort month-age) --------------
# The revenue twin of the retention triangle: customers cohorted by
# first-order month, revenue accumulated by month offset, normalized
# per cohort customer — the curve LTV models are fit to. Month math is
# integer (year·12 + month); the cumulative is a per-cohort window
# (PARTITIONED — hash-spread, never global); revenue rides as exact
# cents and the per-customer normalization is the one double division.

@register(
    "customer_cohort_ltv",
    oracle="""
WITH o AS (
  SELECT o_custkey,
         CAST(date_part('year', CAST(o_orderdate AS DATE)) * 12
              + date_part('month', CAST(o_orderdate AS DATE)) - 1
              AS BIGINT) AS m,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
firsts AS (
  SELECT o_custkey, MIN(m) AS cohort_m FROM o GROUP BY o_custkey),
sizes AS (
  SELECT cohort_m, CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM firsts GROUP BY cohort_m),
rev AS (
  SELECT f.cohort_m, o.m - f.cohort_m AS offset_m,
         CAST(SUM(o.cents) AS BIGINT) AS rev_c
  FROM o JOIN firsts f ON o.o_custkey = f.o_custkey
  GROUP BY f.cohort_m, o.m - f.cohort_m)
SELECT r.cohort_m, CAST(r.offset_m AS BIGINT) AS offset_m,
       CAST(SUM(r.rev_c) OVER (PARTITION BY r.cohort_m ORDER BY r.offset_m
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_rev_c,
       s.n_customers,
       CAST(SUM(r.rev_c) OVER (PARTITION BY r.cohort_m ORDER BY r.offset_m
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) / s.n_customers AS ltv_cents_per_customer
FROM rev r JOIN sizes s ON s.cohort_m = r.cohort_m
""".strip(),
)
def customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (
            F.year(F.to_date("o_orderdate")) * 12
            + F.month(F.to_date("o_orderdate"))
            - 1
        ).cast("long").alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    firsts = o.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    sizes = firsts.groupBy("cohort_m").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    rev = (
        o.join(firsts, "o_custkey")
        .groupBy("cohort_m", (F.col("m") - F.col("cohort_m")).alias("offset_m"))
        .agg(F.sum("cents").alias("rev_c"))
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("offset_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("rev_c").over(w).cast("long")
    return (
        rev.join(sizes, "cohort_m")
        .select(
            "cohort_m",
            F.col("offset_m").cast("long").alias("offset_m"),
            cum.alias("cum_rev_c"),
            "n_customers",
            (cum.cast("double") / F.col("n_customers")).alias(
                "ltv_cents_per_customer"
            ),
        )
    )


# --- monthly seasonality index ----------------------------------------------
# Revenue per calendar month ÷ all-month average — the seasonal index
# a demand planner multiplies forecasts by. Exact protocol: the index
# is (12 · month_rev) / total_rev computed as one double division of
# exact BIGINTs (no mean materialized — total and count fold into the
# constant 12), so both engines agree bitwise.

@register(
    "orders_seasonality_index",
    oracle="""
WITH m AS (
  SELECT CAST(date_part('month', CAST(o_orderdate AS DATE)) AS BIGINT)
           AS month,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY 1),
t AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS total_c FROM m)
SELECT m.month, m.rev_c,
       CAST(12 * m.rev_c AS DOUBLE) / t.total_c AS seasonality_index
FROM m, t
""".strip(),
)
def orders_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.month(F.to_date("o_orderdate")).cast("long").alias("month")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_c")
        )
    )
    t = m.agg(F.sum("rev_c").cast("long").alias("total_c"))
    return m.crossJoin(F.broadcast(t)).select(
        "month",
        "rev_c",
        (
            (F.lit(12) * F.col("rev_c")).cast("double")
            / F.col("total_c").cast("double")
        ).alias("seasonality_index"),
    )


# --- substitute-part detection (shared buyers, never co-ordered) -------------
# The complement of the co-purchase graph: two parts are SUBSTITUTE
# candidates when the same customers buy both (demand overlap) but the
# parts never appear in one order together (you buy one OR the other).
# Engine shape: the bipartite customer→part incidence (distinct, one
# orders⋈lineitem join), customer-blocked pair generation (self-join
# on custkey — per-customer part lists bound the block, the same
# blocking argument as the co-purchase recipe's order blocks), a pair
# count filtered to ≥ K shared customers, and an ANTI JOIN against the
# co-order pair set. Exact integers throughout; the anti join is the
# definition, not an approximation.

_SUBST_MIN_SHARED = 3


@register(
    "part_substitute_pairs",
    oracle=f"""
WITH cp AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
shared AS (
  SELECT a.p AS part_1, b.p AS part_2,
         CAST(COUNT(*) AS BIGINT) AS n_shared_customers
  FROM cp a JOIN cp b ON a.c = b.c AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING COUNT(*) >= {_SUBST_MIN_SHARED}),
coorder AS (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS part_1,
                  GREATEST(a.l_partkey, b.l_partkey) AS part_2
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)
SELECT s.part_1, s.part_2, s.n_shared_customers
FROM shared s
ANTI JOIN coorder c
  ON c.part_1 = s.part_1 AND c.part_2 = s.part_2
""".strip(),
)
def part_substitute_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = cp.alias("a"), cp.alias("b")
    shared = (
        a.join(b, "c")
        .where(F.col("a.p") < F.col("b.p"))
        .groupBy(
            F.col("a.p").alias("part_1"), F.col("b.p").alias("part_2")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_customers"))
        .where(F.col("n_shared_customers") >= _SUBST_MIN_SHARED)
    )
    x, y = li.alias("x"), li.alias("y")
    coorder = (
        x.join(y, "l_orderkey")
        .where(F.col("x.l_partkey") != F.col("y.l_partkey"))
        .select(
            F.least("x.l_partkey", "y.l_partkey").alias("part_1"),
            F.greatest("x.l_partkey", "y.l_partkey").alias("part_2"),
        )
        .distinct()
    )
    return shared.join(coorder, ["part_1", "part_2"], "left_anti")


# --- bounded BFS as a Spark 4 RECURSIVE CTE (declarative recursion) ----------
# The SQL-surface twin of part_copurchase_khop (operator-based,
# level-synchronous frontier joins): Spark 4.1's WITH RECURSIVE runs
# the same reachability declaratively. Spark's recursion is UNION ALL
# only (no distinct in the recursive member yet), so each row is a
# PATH, not a node — multiplicity collapses in the final MIN()
# aggregate, and the hop bound is kept at 2 so the path count stays
# Σ_seeds Σ deg² (bounded; the operator path with per-level dedup
# remains the depth-3+ production choice — that is exactly the
# trade-off this pair of queries documents). Second cost note: Spark
# inlines CTEs into each recursion step, so the edge self-join
# re-executes per iteration (~10 s at sf0.1 vs the operator's ~4 s) —
# the query therefore sits in the correctness window but NOT the bench
# headline; the operator twin is the benchmarked production path.
# Oracle: the identical UNION ALL recursion in DuckDB.

_BFS_SQL_HOPS = 2


@register(
    "part_copurchase_khop_sql",
    oracle=f"""
WITH RECURSIVE li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
seeds AS (
  SELECT DISTINCT src AS node FROM e WHERE src % {_BFS_SEED_MOD} = 0),
bfs(node, d) AS (
  SELECT node, 0 FROM seeds
  UNION ALL
  SELECT e.dst, bfs.d + 1 FROM bfs JOIN e ON bfs.node = e.src
  WHERE bfs.d < {_BFS_SQL_HOPS})
SELECT CAST(node AS BIGINT) AS part_key, CAST(MIN(d) AS BIGINT) AS dist
FROM bfs GROUP BY node
""".strip(),
)
def part_copurchase_khop_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(
        f"""
        WITH RECURSIVE li AS (
          SELECT l_orderkey, l_partkey FROM lineitem
          WHERE to_date(l_shipdate) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
        e AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey <> b.l_partkey),
        seeds AS (
          SELECT DISTINCT src AS node FROM e
          WHERE src % {_BFS_SEED_MOD} = 0),
        bfs(node, d) AS (
          SELECT node, 0 FROM seeds
          UNION ALL
          SELECT e.dst, bfs.d + 1 FROM bfs JOIN e ON bfs.node = e.src
          WHERE bfs.d < {_BFS_SQL_HOPS})
        SELECT CAST(node AS BIGINT) AS part_key,
               CAST(MIN(d) AS BIGINT) AS dist
        FROM bfs GROUP BY node
        """
    )


# --- categorical drift test (order-priority mix, H1 vs H2) -------------------
# The DQ drift monitor for categorical columns: is the order-priority
# MIX in the second half of the history the same distribution as the
# first? Pearson chi-square on the 2×5 contingency table (the
# events_chi2_independence protocol applied to a temporal split):
# observed counts are exact integers from ONE scan (conditional
# aggregates); expected counts and the statistic are the standard
# row·col/total arithmetic — every division deferred to the final
# double expression so both engines agree bitwise. A pipeline alerts
# when chi2 exceeds the df=4 critical value; the query emits the
# per-cell contributions so the alert is attributable.

@register(
    "orders_priority_drift",
    oracle=f"""
WITH c AS (
  SELECT o_orderpriority AS priority,
         CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE)
                            < DATE '{_MIGRATE_SPLIT}'
                  THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE)
                            >= DATE '{_MIGRATE_SPLIT}'
                  THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM orders GROUP BY 1),
t AS (
  SELECT CAST(SUM(n1) AS BIGINT) AS t1, CAST(SUM(n2) AS BIGINT) AS t2
  FROM c)
SELECT c.priority, c.n1, c.n2,
       (CAST(c.n1 AS DOUBLE) - CAST((c.n1 + c.n2) AS DOUBLE) * t.t1
          / (t.t1 + t.t2))
       * (CAST(c.n1 AS DOUBLE) - CAST((c.n1 + c.n2) AS DOUBLE) * t.t1
          / (t.t1 + t.t2))
       / (CAST((c.n1 + c.n2) AS DOUBLE) * t.t1 / (t.t1 + t.t2))
       + (CAST(c.n2 AS DOUBLE) - CAST((c.n1 + c.n2) AS DOUBLE) * t.t2
          / (t.t1 + t.t2))
       * (CAST(c.n2 AS DOUBLE) - CAST((c.n1 + c.n2) AS DOUBLE) * t.t2
          / (t.t1 + t.t2))
       / (CAST((c.n1 + c.n2) AS DOUBLE) * t.t2 / (t.t1 + t.t2))
         AS chi2_contribution
FROM c, t
""".strip(),
)
def orders_priority_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        (F.to_date("o_orderdate") < F.lit(_MIGRATE_SPLIT).cast("date"))
        .cast("int")
        .alias("_h1"),
    )
    c = o.groupBy("priority").agg(
        F.sum("_h1").cast("long").alias("n1"),
        F.sum(1 - F.col("_h1")).cast("long").alias("n2"),
    )
    t = c.agg(
        F.sum("n1").cast("long").alias("t1"),
        F.sum("n2").cast("long").alias("t2"),
    )
    j = c.crossJoin(F.broadcast(t))
    tt = (F.col("t1") + F.col("t2")).cast("double")
    rowtot = (F.col("n1") + F.col("n2")).cast("double")
    e1 = rowtot * F.col("t1") / tt
    e2 = rowtot * F.col("t2") / tt
    contrib = (
        (F.col("n1").cast("double") - e1) * (F.col("n1").cast("double") - e1)
        / e1
        + (F.col("n2").cast("double") - e2)
        * (F.col("n2").cast("double") - e2)
        / e2
    )
    return j.select(
        "priority", "n1", "n2", contrib.alias("chi2_contribution")
    )


# --- exact two-sample Kolmogorov–Smirnov (distribution drift) ---------------
# Does the AUTOMOBILE segment's balance distribution differ from
# BUILDING's? KS D = max_v |F1(v) − F2(v)| — computed EXACTLY, no
# binning: per distinct balance value, per-group counts (one
# aggregate); both ECDFs as integer prefix sums over the value order
# (the distributed running-sum machinery — after the per-value
# aggregate the order key is unique, so the total order is legal); and
# the max of the integer cross-multiplication |n2·cum1 − n1·cum2| (no
# float ECDFs — the division happens once, at the end). The classic
# drift test for numeric columns, exact at any scale; the chi-square
# twin (orders_priority_drift) covers categoricals.

_KS_SEG_A = "AUTOMOBILE"
_KS_SEG_B = "BUILDING"


@register(
    "customer_balance_ks",
    oracle=f"""
WITH c AS (
  SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents,
         CAST(c_mktsegment = '{_KS_SEG_A}' AS INTEGER) AS g1,
         CAST(c_mktsegment = '{_KS_SEG_B}' AS INTEGER) AS g2
  FROM customer
  WHERE c_mktsegment IN ('{_KS_SEG_A}', '{_KS_SEG_B}')),
v AS (
  SELECT cents, CAST(SUM(g1) AS BIGINT) AS c1, CAST(SUM(g2) AS BIGINT) AS c2
  FROM c GROUP BY cents),
t AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
  FROM v),
e AS (
  SELECT CAST(SUM(c1) OVER w AS BIGINT) AS cum1,
         CAST(SUM(c2) OVER w AS BIGINT) AS cum2
  FROM v
  WINDOW w AS (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT t.n1, t.n2,
       CAST(MAX(ABS(t.n2 * e.cum1 - t.n1 * e.cum2)) AS BIGINT) AS d_num,
       CAST(MAX(ABS(t.n2 * e.cum1 - t.n1 * e.cum2)) AS DOUBLE)
         / (t.n1 * t.n2) AS ks_d
FROM e, t
GROUP BY t.n1, t.n2
""".strip(),
)
def customer_balance_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_running_sum

    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin(_KS_SEG_A, _KS_SEG_B))
        .select(
            F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
            (F.col("c_mktsegment") == _KS_SEG_A).cast("int").alias("g1"),
            (F.col("c_mktsegment") == _KS_SEG_B).cast("int").alias("g2"),
        )
    )
    v = c.groupBy("cents").agg(
        F.sum("g1").cast("long").alias("c1"),
        F.sum("g2").cast("long").alias("c2"),
    )
    e = with_global_running_sum(v, ["cents"], "c1", out_col="cum1")
    e = with_global_running_sum(e, ["cents"], "c2", out_col="cum2")
    t = v.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    j = e.crossJoin(F.broadcast(t))
    dev = F.abs(
        F.col("n2") * F.col("cum1") - F.col("n1") * F.col("cum2")
    )
    return j.groupBy("n1", "n2").agg(
        F.max(dev).cast("long").alias("d_num"),
        (
            F.max(dev).cast("double")
            / (F.col("n1") * F.col("n2")).cast("double")
        ).alias("ks_d"),
    )


# --- exact Mann–Whitney U (rank-sum drift, ties handled) ---------------------
# The KS test flags ANY distributional difference; Mann–Whitney asks
# the directional question ("does segment A stochastically dominate
# B?"). U1 = Σ_v c1(v)·cum2(<v) + ½·c1(v)·c2(v) — computed from the
# SAME per-value aggregate + exclusive prefix sums as the KS query,
# doubled (U×2) so the tie term stays integer. The effect size
# (rank-biserial r = 2U/(n1·n2) − 1) is the one double division.
# Exact at any scale; no ranking of raw rows, no ties corrections
# bolted on afterward.

@register(
    "customer_balance_mwu",
    oracle=f"""
WITH c AS (
  SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents,
         CAST(c_mktsegment = '{_KS_SEG_A}' AS INTEGER) AS g1,
         CAST(c_mktsegment = '{_KS_SEG_B}' AS INTEGER) AS g2
  FROM customer
  WHERE c_mktsegment IN ('{_KS_SEG_A}', '{_KS_SEG_B}')),
v AS (
  SELECT cents, CAST(SUM(g1) AS BIGINT) AS c1, CAST(SUM(g2) AS BIGINT) AS c2
  FROM c GROUP BY cents),
e AS (
  SELECT c1, c2,
         CAST(COALESCE(SUM(c2) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum2_excl
  FROM v),
t AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
  FROM v)
SELECT t.n1, t.n2,
       CAST(SUM(2 * e.c1 * e.cum2_excl + e.c1 * e.c2) AS BIGINT) AS u1_x2,
       CAST(SUM(2 * e.c1 * e.cum2_excl + e.c1 * e.c2) AS DOUBLE)
         / (t.n1 * t.n2) - 1.0 AS rank_biserial
FROM e, t
GROUP BY t.n1, t.n2
""".strip(),
)
def customer_balance_mwu(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_running_sum

    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin(_KS_SEG_A, _KS_SEG_B))
        .select(
            F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
            (F.col("c_mktsegment") == _KS_SEG_A).cast("int").alias("g1"),
            (F.col("c_mktsegment") == _KS_SEG_B).cast("int").alias("g2"),
        )
    )
    v = c.groupBy("cents").agg(
        F.sum("g1").cast("long").alias("c1"),
        F.sum("g2").cast("long").alias("c2"),
    )
    e = with_global_running_sum(v, ["cents"], "c2", out_col="cum2_incl")
    e = e.withColumn(
        "cum2_excl", (F.col("cum2_incl") - F.col("c2")).cast("long")
    )
    t = v.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    u = e.agg(
        F.sum(
            F.lit(2) * F.col("c1") * F.col("cum2_excl")
            + F.col("c1") * F.col("c2")
        )
        .cast("long")
        .alias("u1_x2")
    )
    return (
        u.crossJoin(F.broadcast(t))
        .select(
            "n1",
            "n2",
            "u1_x2",
            (
                F.col("u1_x2").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double")
                - 1.0
            ).alias("rank_biserial"),
        )
    )


# =========================================================================
# Graph family, MV-consuming bench protocol (VERDICT r9 "Next round" #3)
# =========================================================================
# Every self-contained co-purchase query re-pays the same lineitem
# self-join (~40-60% of its wall-clock) — by recorded protocol, so the
# driver bench stays reproducible from a cold session. At 100 TB that
# cost is paid ONCE: the weighted edge view is a delta-maintained
# materialized table (copurchase_edges_mv proves delta ≡ rebuild), and
# graph queries CONSUME it. These *_mv twins are that posture, made
# measurable: the edge view (and for modularity, the LPA label table)
# is materialized to a fingerprint-keyed parquet cache
# (sources/cachedir.py — build once per source version, atomic
# publish), and each twin runs the SAME operator over the stored
# edges. Oracles are the originals' verbatim (identical results), so
# the twins are value-checked too; the self-contained lines stay in
# the bench as the cold-start protocol, and the twin lines record the
# steady-state consume cost the MV design buys.

_GRAPH_MV_VER = "v1"


def _graph_mv_dir(spark: SparkSession, sf_dir: str) -> str:
    import os

    from ..sources.cachedir import build_cached_dir, source_fingerprint

    src = os.path.join(sf_dir, "lineitem.parquet")

    def _build(d: str) -> None:
        li = (
            load_table(spark, sf_dir, "lineitem")
            .where(
                F.to_date("l_shipdate")
                >= F.lit(COPURCHASE_SHIPDATE_LO).cast("date")
            )
            .select("l_orderkey", "l_partkey")
        )
        a, b = li.alias("a"), li.alias("b")
        (
            a.join(b, "l_orderkey")
            .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
            .groupBy(
                F.col("a.l_partkey").alias("u"),
                F.col("b.l_partkey").alias("v"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("w"))
            .write.mode("overwrite")
            .parquet(os.path.join(d, "edges.parquet"))
        )

    # Recipe constants are part of the cache identity (ADVICE r10):
    # changing the shipdate cutoff must invalidate the stored edges
    # without a manual version bump, as lpa_labels_stored already does
    # for _LPA_ROUNDS.
    return build_cached_dir(
        f"spark_graph_mv_{_GRAPH_MV_VER}_{COPURCHASE_SHIPDATE_LO}",
        source_fingerprint(src),
        _build,
    )


def copurchase_edges_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weighted undirected edge view (u, v, w), read from the
    materialized store (u < v, distinct by construction)."""
    import os

    return spark.read.parquet(
        os.path.join(_graph_mv_dir(spark, sf_dir), "edges.parquet")
    )


def _directed_from_stored(mv: DataFrame) -> DataFrame:
    """Distinct directed (src, dst) edge set from the stored view —
    exactly the edge set copurchase_edges().distinct() produces."""
    return mv.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(mv.select(F.col("v").alias("src"), F.col("u").alias("dst")))


def _oracle_of(name: str) -> str:
    from . import _REGISTRY

    o = _REGISTRY[name].oracle
    if o is None:  # twins only make sense for value-oracled originals
        raise ValueError(f"{name} has no oracle to share")
    return o


@register(
    "part_copurchase_pagerank_mv", oracle=_oracle_of("part_copurchase_pagerank")
)
def part_copurchase_pagerank_mv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.pagerank import pagerank

    edges = _directed_from_stored(copurchase_edges_stored(spark, sf_dir))
    return pagerank(edges, n_iter=_PR_ITERS).select(
        F.col("node").alias("part_key"), "pagerank_scaled"
    )


@register(
    "part_copurchase_pagerank_weighted_mv",
    oracle=_oracle_of("part_copurchase_pagerank_weighted"),
)
def part_copurchase_pagerank_weighted_mv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.pagerank import weighted_pagerank

    mv = copurchase_edges_stored(spark, sf_dir)
    edges = mv.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).unionAll(
        mv.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
    )
    return weighted_pagerank(edges, scale=_WPR_SCALE).select(
        F.col("node").alias("part_key"), "pagerank_scaled"
    )


@register(
    "part_copurchase_lpa_mv", oracle=_oracle_of("part_copurchase_lpa")
)
def part_copurchase_lpa_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lpa import label_propagation

    edges = _directed_from_stored(copurchase_edges_stored(spark, sf_dir))
    return label_propagation(edges, n_rounds=_LPA_ROUNDS).select(
        F.col("node").alias("part_key"),
        F.col("community").cast("long").alias("community"),
    )


@register(
    "part_copurchase_kcore_mv", oracle=_oracle_of("part_copurchase_kcore")
)
def part_copurchase_kcore_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kcore import kcore_nodes

    edges = _directed_from_stored(copurchase_edges_stored(spark, sf_dir))
    return kcore_nodes(edges, k=_KCORE_K).select(
        F.col("node").alias("part_key"), "core_deg"
    )


@register(
    "part_copurchase_ktruss_mv", oracle=_oracle_of("part_copurchase_ktruss")
)
def part_copurchase_ktruss_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ktruss import ktruss_edges

    edges = _directed_from_stored(copurchase_edges_stored(spark, sf_dir))
    return ktruss_edges(edges, k=_KTRUSS_K).select(
        F.col("u").alias("part_key_1"),
        F.col("v").alias("part_key_2"),
        "support",
    )


@register(
    "part_node_similarity_mv", oracle=_oracle_of("part_node_similarity")
)
def part_node_similarity_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.node_similarity import node_similarity_pairs

    und = copurchase_edges_stored(spark, sf_dir).select("u", "v")
    return node_similarity_pairs(und, _NODE_SIM_T)


def lpa_labels_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic 4-round LPA label table (node, community),
    materialized next to the edge view — modularity's documented
    scale path (VERDICT r9: the self-contained modularity line re-paid
    the full LPA run its sibling query had just computed; at 100 TB
    the label table is a stored artifact both consume). The cache key
    embeds the LPA round count, so a protocol change can never serve
    stale labels."""
    import os

    from ..sources.cachedir import build_cached_dir, source_fingerprint

    src = os.path.join(sf_dir, "lineitem.parquet")

    def _build(d: str) -> None:
        from ..operators.lpa import label_propagation

        edges = _directed_from_stored(copurchase_edges_stored(spark, sf_dir))
        label_propagation(edges, n_rounds=_LPA_ROUNDS).select(
            "node", F.col("community").cast("long").alias("community")
        ).write.mode("overwrite").parquet(os.path.join(d, "labels.parquet"))

    dirname = build_cached_dir(
        f"spark_lpa_labels_{_GRAPH_MV_VER}_r{_LPA_ROUNDS}"
        f"_{COPURCHASE_SHIPDATE_LO}",
        source_fingerprint(src),
        _build,
    )
    return spark.read.parquet(os.path.join(dirname, "labels.parquet"))


@register(
    "part_copurchase_modularity_mv",
    oracle=_oracle_of("part_copurchase_modularity"),
)
def part_copurchase_modularity_mv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Newman modularity consuming BOTH stored artifacts (edge view +
    label table) — the pure steady-state consume line: two broadcast-
    sized parquet scans, two node-keyed joins, two tiny aggregates."""
    und = copurchase_edges_stored(spark, sf_dir).select("u", "v")
    lab = lpa_labels_stored(spark, sf_dir)
    lu = lab.select(F.col("node").alias("u"), F.col("community").alias("cu"))
    lv = lab.select(F.col("node").alias("v"), F.col("community").alias("cv"))
    e_lab = und.join(lu, "u").join(lv, "v")
    stats = e_lab.agg(
        F.count(F.lit(1)).alias("m_edges"),
        F.sum((F.col("cu") == F.col("cv")).cast("int"))
        .cast("long")
        .alias("intra_edges"),
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dsq = (
        deg.join(lab, "node")
        .groupBy("community")
        .agg(F.sum("deg").alias("dc"))
        .agg(
            F.count(F.lit(1)).alias("n_communities"),
            F.sum(F.col("dc") * F.col("dc")).cast("long").alias("sum_deg_sq"),
        )
    )
    out = dsq.crossJoin(F.broadcast(stats))
    q = (
        F.col("intra_edges").cast("double") / F.col("m_edges")
        - F.col("sum_deg_sq").cast("double")
        / (F.lit(4.0) * F.col("m_edges") * F.col("m_edges"))
    )
    return out.select(
        "n_communities",
        F.col("m_edges").cast("long").alias("m_edges"),
        "intra_edges",
        "sum_deg_sq",
        q.alias("modularity"),
    )


# --- community profile: the daily serve-side consumer of stored labels ----
# (VERDICT r10 "Next round" #7.) What a 100 TB deployment actually runs
# every day once LPA labels are materialized: join the stored label
# table to the part dimension and profile each community — size, retail
# value, dominant brand — WITHOUT re-running a single LPA round. Engine
# shape: one node-keyed join (label store ⋈ part), one grouped
# aggregate, one community-partitioned window for the brand mode
# (deterministic count DESC, brand ASC tie-break), and a bounded top-20
# by size. The oracle replays the LPA unroll (shared recurrence with
# part_copurchase_lpa) and the same profile arithmetic.

_COMMUNITY_TOPK = 20


@register(
    "part_community_profile",
    oracle=f"""
WITH lab AS MATERIALIZED (
  SELECT part_key AS node, community FROM ({_lpa_oracle()}) t),
j AS (
  SELECT l.community, p.p_partkey, p.p_brand,
         CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS cents
  FROM lab l JOIN part p ON p.p_partkey = l.node),
prof AS (
  SELECT community,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(cents) AS BIGINT) AS retail_cents
  FROM j GROUP BY community),
brand AS (
  SELECT community, p_brand AS top_brand
  FROM (
    SELECT community, p_brand,
           ROW_NUMBER() OVER (PARTITION BY community
                              ORDER BY COUNT(*) DESC, p_brand ASC) AS rn
    FROM j GROUP BY community, p_brand)
  WHERE rn = 1)
SELECT p.community, p.n_parts, p.retail_cents, b.top_brand
FROM prof p JOIN brand b USING (community)
ORDER BY p.n_parts DESC, p.community ASC
LIMIT {_COMMUNITY_TOPK}
""".strip(),
)
def part_community_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    lab = lpa_labels_stored(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
    )
    j = lab.join(p, lab["node"] == p["p_partkey"]).select(
        "community", "p_brand", "cents"
    )
    prof = j.groupBy("community").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("cents").cast("long").alias("retail_cents"),
    )
    bc = j.groupBy("community", "p_brand").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("community").orderBy(
        F.col("cnt").desc(), F.col("p_brand").asc()
    )
    brand = (
        bc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("community", F.col("p_brand").alias("top_brand"))
    )
    return (
        prof.join(brand, "community")
        .orderBy(F.col("n_parts").desc(), F.col("community").asc())
        .limit(_COMMUNITY_TOPK)
    )


# --- common-neighbor link prediction (round 10) ---------------------------
# "Parts that SHOULD be co-purchased but aren't yet": rank NON-adjacent
# part pairs by their common-neighbor count in the co-purchase graph —
# the classic link-prediction baseline [Liben-Nowell & Kleinberg '03],
# integer-exact by construction (no log-weighted Adamic-Adar: ln() is
# off the cross-engine protocol). Engine shape (VERDICT r10 fix): the
# wedge enumeration runs over the DEGREE-ORIENTED adjacency
# (operators/triangles.py: every edge low-(deg,id) → high), split by
# where the wedge CENTER sits in the degree order — three
# self-joins whose union emits every wedge exactly once:
#   C1 center lowest   (b→x, b→y): join on the shared SOURCE — per-key
#      fan-out outdeg(b)² ≤ O(m) by the arboricity bound (outdeg ≤ √m);
#   C2 center middle   (x→b, b→y): in-edge ⋈ out-edge on b — the
#      identical shape triangles.py's wedge join already bounds
#      (indeg·outdeg ≤ indeg·√m per key);
#   C3 center highest  (x→b, y→b): join on the shared DST. This case
#      IS the output for hub centers (a degree-d hub owns C(d,2) real
#      candidate pairs — no algorithm emits fewer rows); orientation
#      guarantees the join never AMPLIFIES beyond those rows, and the
#      residual risk is one reducer owning a hub's d² rows — spread by
#      AQE skew-join splitting, or the operators/skew.py salt split
#      when a single key exceeds task memory.
# Each wedge is canonicalized to (least, greatest) BEFORE the
# group-count, then an ANTI join against the edge set drops existing
# edges and TakeOrderedAndProject returns the bounded top-50 (count
# desc, key-pair tie-break — fully deterministic).

_LP_TOPK = 50


@register(
    "part_link_prediction_cn",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                  GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
cn AS (
  SELECT n1.a AS u, n2.a AS v, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM sym n1 JOIN sym n2 ON n1.b = n2.b AND n1.a < n2.a
  GROUP BY n1.a, n2.a),
nonedge AS (
  SELECT cn.u, cn.v, cn.n_common FROM cn
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = cn.u AND e.v = cn.v)),
ranked AS (
  SELECT u, v, n_common,
         CAST(ROW_NUMBER() OVER (ORDER BY n_common DESC, u ASC, v ASC)
              AS BIGINT) AS rank
  FROM nonedge)
SELECT u AS part_key_1, v AS part_key_2, n_common, rank
FROM ranked WHERE rank <= {_LP_TOPK}
""".strip(),
)
def part_link_prediction_cn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.triangles import _orient

    # Canonical undirected edge set via per-order pair generation: one
    # groupBy(order) + a JVM-side nested-transform explode of the
    # sorted per-order part array (u < v by sort), then distinct.
    # Replaces the lineitem self-join — per-order baskets are small and
    # bounded, so the pair explode is map-side and the only shuffles
    # are the groupBy and the distinct (measured ~2.7× faster than the
    # self-join at sf0.1).
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.to_date("l_shipdate")
            >= F.lit(COPURCHASE_SHIPDATE_LO).cast("date")
        )
        .select("l_orderkey", "l_partkey")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    und = (
        per_order.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .distinct()
        .persist()  # anti-join side + orientation input
    )
    o = _orient(und).persist()  # (a→b, low-(deg,id) → high)
    o.count()  # materialize once: feeds six join sides below
    # Wedge pairs ride as ONE packed BIGINT (u << 32 | v, u < v) —
    # halves the shuffle bytes of the 15M-row count-aggregate, the
    # dominant stage. Part keys are 32-bit by TPC-H construction.
    def pack(x: str, y: str):  # x < y already guaranteed per branch
        return (
            F.shiftleft(F.col(x).cast("long"), 32) + F.col(y).cast("long")
        ).alias("pk")

    # C1: center lowest — both edges out of the center (join on source).
    c1 = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.a") == F.col("e2.a"))
        .where(F.col("e1.b") < F.col("e2.b"))
        .select(pack("e1.b", "e2.b"))
    )
    # C2: center middle — in-edge ⋈ out-edge on the center; endpoint
    # order is arbitrary, canonicalize with least/greatest.
    c2 = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            (
                F.shiftleft(F.least("e1.a", "e2.b").cast("long"), 32)
                + F.greatest("e1.a", "e2.b").cast("long")
            ).alias("pk")
        )
    )
    # C3: center highest — both edges into the center (join on dst);
    # output-bounded for hubs (see header note).
    c3 = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.b") == F.col("e2.b"))
        .where(F.col("e1.a") < F.col("e2.a"))
        .select(pack("e1.a", "e2.a"))
    )
    cn = (
        c1.unionAll(c2)
        .unionAll(c3)
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .select(
            F.shiftrightunsigned("pk", 32).cast("long").alias("u"),
            F.col("pk")
            .bitwiseAND(F.lit((1 << 32) - 1))
            .cast("long")
            .alias("v"),
            "n_common",
        )
    )
    nonedge = cn.join(und, ["u", "v"], "left_anti")
    w = Window.orderBy(
        F.col("n_common").desc(), F.col("u").asc(), F.col("v").asc()
    )
    # global top-k: orderBy().limit() plans TakeOrderedAndProject (no
    # single-partition window funnel); the rank column is re-derived on
    # the bounded 50-row result.
    top = nonedge.orderBy(
        F.col("n_common").desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(_LP_TOPK)
    return top.select(
        F.col("u").alias("part_key_1"),
        F.col("v").alias("part_key_2"),
        "n_common",
        F.row_number().over(w).cast("long").alias("rank"),
    )


# --- link-prediction SCORE TABLE: CN + Jaccard + resource allocation ------
# (round 11) The production link-prediction surface is never one
# heuristic — it's a score table the ranker consumes. This query emits
# THREE classic scores per candidate pair in ONE wedge pass [Liben-
# Nowell & Kleinberg '03; Zhou, Lü & Zhang '09 for RA]:
#   n_common    — common-neighbor count (the CN baseline);
#   ra_scaled   — resource allocation Σ_b floor(SCALE / deg(b)):
#                 RA down-weights hub intermediaries like Adamic-Adar
#                 but with INTEGER floor-division contributions, so the
#                 sum is order-independent and cross-engine exact
#                 (ln() stays off the protocol, the AA caveat);
#   jaccard     — cn / (deg u + deg v − cn), one double division of
#                 exact integers (identical in both engines).
# Engine shape: the SAME degree-oriented wedge enumeration as
# part_link_prediction_cn, with the center's degree riding on the
# oriented edge (da, db columns) so each branch knows its wedge
# center's degree with NO extra join; one packed-key aggregate computes
# cn and ra together; degrees for the Jaccard denominator arrive via
# two broadcast joins of the node-sized degree table. Top-50 by
# jaccard (desc, then key pair) over non-edges.

_RA_SCALE = 1_000_000


@register(
    "part_link_prediction_scores",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                  GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
deg AS (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM sym GROUP BY a),
cn AS (
  SELECT n1.a AS u, n2.a AS v,
         CAST(COUNT(*) AS BIGINT) AS n_common,
         CAST(SUM({_RA_SCALE} // d.deg) AS BIGINT) AS ra_scaled
  FROM sym n1
  JOIN sym n2 ON n1.b = n2.b AND n1.a < n2.a
  JOIN deg d ON d.node = n1.b
  GROUP BY n1.a, n2.a),
nonedge AS (
  SELECT cn.* FROM cn
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = cn.u AND e.v = cn.v)),
scored AS (
  SELECT n.u, n.v, n.n_common, n.ra_scaled,
         CAST(n.n_common AS DOUBLE)
           / (du.deg + dv.deg - n.n_common) AS jaccard
  FROM nonedge n
  JOIN deg du ON du.node = n.u
  JOIN deg dv ON dv.node = n.v),
ranked AS (
  SELECT u, v, n_common, ra_scaled, jaccard,
         CAST(ROW_NUMBER() OVER (ORDER BY jaccard DESC, u ASC, v ASC)
              AS BIGINT) AS rank
  FROM scored)
SELECT u AS part_key_1, v AS part_key_2, n_common, ra_scaled, jaccard,
       rank
FROM ranked WHERE rank <= {_LP_TOPK}
""".strip(),
)
def part_link_prediction_scores(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.to_date("l_shipdate")
            >= F.lit(COPURCHASE_SHIPDATE_LO).cast("date")
        )
        .select("l_orderkey", "l_partkey")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    und = (
        per_order.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    du = F.broadcast(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")))
    dv = F.broadcast(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # Oriented edge with BOTH endpoint degrees riding along (a = low).
    o = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
            F.when(u_first, F.col("du")).otherwise(F.col("dv")).alias("da"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
        )
        .persist()
    )
    o.count()

    def pack(x: str, y: str):
        return (
            F.shiftleft(F.col(x).cast("long"), 32) + F.col(y).cast("long")
        ).alias("pk")

    # Exact integer floor division (matches the oracle's `//`).
    ra = lambda d: F.expr(f"cast({_RA_SCALE} as bigint) div {d}")
    # C1 center = e1.a (deg da); C2 center = e1.b == e2.a (deg e1.db);
    # C3 center = shared b (deg e1.db).
    c1 = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.a") == F.col("e2.a"))
        .where(F.col("e1.b") < F.col("e2.b"))
        .select(pack("e1.b", "e2.b"), ra("e1.da").alias("ra"))
    )
    c2 = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            (
                F.shiftleft(F.least("e1.a", "e2.b").cast("long"), 32)
                + F.greatest("e1.a", "e2.b").cast("long")
            ).alias("pk"),
            ra("e1.db").alias("ra"),
        )
    )
    c3 = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.b") == F.col("e2.b"))
        .where(F.col("e1.a") < F.col("e2.a"))
        .select(pack("e1.a", "e2.a"), ra("e1.db").alias("ra"))
    )
    cn = (
        c1.unionAll(c2)
        .unionAll(c3)
        .groupBy("pk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("ra").cast("long").alias("ra_scaled"),
        )
        .select(
            F.shiftrightunsigned("pk", 32).cast("long").alias("u"),
            F.col("pk")
            .bitwiseAND(F.lit((1 << 32) - 1))
            .cast("long")
            .alias("v"),
            "n_common",
            "ra_scaled",
        )
    )
    nonedge = cn.join(und, ["u", "v"], "left_anti")
    scored = (
        nonedge.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "n_common",
            "ra_scaled",
            (
                F.col("n_common").cast("double")
                / (F.col("du") + F.col("dv") - F.col("n_common")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )
    w = Window.orderBy(
        F.col("jaccard").desc(), F.col("u").asc(), F.col("v").asc()
    )
    top = scored.orderBy(
        F.col("jaccard").desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(_LP_TOPK)
    return top.select(
        F.col("u").alias("part_key_1"),
        F.col("v").alias("part_key_2"),
        "n_common",
        "ra_scaled",
        "jaccard",
        F.row_number().over(w).cast("long").alias("rank"),
    )


# --- degree assortativity of the co-purchase graph (round 11) --------------
# Newman's degree-assortativity coefficient: the Pearson correlation of
# endpoint degrees over all DIRECTED edge slots (each undirected edge
# contributes both (deg u, deg v) and (deg v, deg u), making x and y
# exchangeable — the standard undirected convention). Everything up to
# the final formula is exact BIGINT sums (Σx, Σxy, Σx² over 2m slots;
# deg ≤ max-degree keeps products < 2^63 far beyond fixture scale, and
# the final double formula consumes sums < 2^53 — document-bounded),
# so the one-row answer is deterministic cross-engine. Engine shape:
# the node-degree aggregate, one broadcast join of degrees onto edges,
# one global aggregate — no window, no driver loop.

@register(
    "copurchase_degree_assortativity",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                  GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY node),
ed AS (
  SELECT du.deg AS x, dv.deg AS y
  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
s AS (
  SELECT CAST(2 * COUNT(*) AS BIGINT) AS m2,
         CAST(SUM(x + y) AS BIGINT) AS sum_deg,
         CAST(SUM(2 * x * y) AS BIGINT) AS sum_prod,
         CAST(SUM(x * x + y * y) AS BIGINT) AS sum_sq
  FROM ed)
SELECT m2, sum_deg, sum_prod, sum_sq,
       (CAST(m2 AS DOUBLE) * sum_prod
          - CAST(sum_deg AS DOUBLE) * sum_deg)
       / (CAST(m2 AS DOUBLE) * sum_sq
          - CAST(sum_deg AS DOUBLE) * sum_deg) AS assortativity
FROM s
""".strip(),
)
def copurchase_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.to_date("l_shipdate")
            >= F.lit(COPURCHASE_SHIPDATE_LO).cast("date")
        )
        .select("l_orderkey", "l_partkey")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    und = (
        per_order.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    du = F.broadcast(
        deg.select(F.col("node").alias("u"), F.col("deg").alias("x"))
    )
    dv = F.broadcast(
        deg.select(F.col("node").alias("v"), F.col("deg").alias("y"))
    )
    s = (
        und.join(du, "u")
        .join(dv, "v")
        .agg(
            (2 * F.count(F.lit(1))).cast("long").alias("m2"),
            F.sum(F.col("x") + F.col("y")).cast("long").alias("sum_deg"),
            F.sum(2 * F.col("x") * F.col("y"))
            .cast("long")
            .alias("sum_prod"),
            F.sum(F.col("x") * F.col("x") + F.col("y") * F.col("y"))
            .cast("long")
            .alias("sum_sq"),
        )
    )
    num = F.col("m2").cast("double") * F.col("sum_prod") - F.col(
        "sum_deg"
    ).cast("double") * F.col("sum_deg")
    den = F.col("m2").cast("double") * F.col("sum_sq") - F.col(
        "sum_deg"
    ).cast("double") * F.col("sum_deg")
    return s.select(
        "m2", "sum_deg", "sum_prod", "sum_sq", (num / den).alias(
            "assortativity"
        )
    )


# --- TPC-H Q3 shape: top unshipped-order revenue (round 10) ---------------
# The shipping-priority classic: orders placed before the cutoff whose
# lineitems ship after it, ranked by outstanding revenue — the one
# TPC-H spine query the relational family was still missing. Exact
# integer cents (the repo's rev_cents protocol); top-10 via
# TakeOrderedAndProject with full tie-breaks (revenue desc, orderdate
# asc, orderkey asc — deterministic). Both date predicates push to the
# parquet scans.

_Q3_CUTOFF = "1997-07-01"


@register(
    "orders_unshipped_revenue_top10",
    oracle=f"""
WITH l AS (
  SELECT l_orderkey,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS rc
  FROM lineitem WHERE CAST(l_shipdate AS DATE) > DATE '{_Q3_CUTOFF}'),
o AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
         o_orderpriority
  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '{_Q3_CUTOFF}'),
agg AS (
  SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
         CAST(SUM(l.rc) AS BIGINT) AS revenue_cents
  FROM l JOIN o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, 3)
SELECT * FROM agg
ORDER BY revenue_cents DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 10
""".strip(),
)
def orders_unshipped_revenue_top10(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cutoff = F.lit(_Q3_CUTOFF).cast("date")
    l = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.to_date("l_shipdate") > cutoff)
        .select(
            "l_orderkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            )
            .cast("long")
            .alias("rc"),
        )
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.to_date("o_orderdate") < cutoff)
        .select(
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
    )
    agg = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rc").cast("long").alias("revenue_cents"))
    )
    return agg.orderBy(
        F.col("revenue_cents").desc(),
        F.col("o_orderdate").asc(),
        F.col("o_orderkey").asc(),
    ).limit(10)


# --- entity resolution: blocked fuzzy match → clusters → canonical --------
# Skew cap for in-bucket pair generation: no collect_list row ever holds
# more than ~this many members (a deletion-key bucket above it splits
# into hash blocks whose cross pairs come from a distributed join).
_ER_BLOCK = 64

# The full ER pipeline as one query, composing three machines the repo
# already proves separately: (1) deletion-neighborhood blocking finds
# all customer-name pairs within edit distance 1 WITHOUT the n² scan
# (the fuzzy_name_pairs plan, keyed by custkey here); (2) the pair
# edges run through iterative min-label propagation to connected
# components (operators/components.py — converged, so the recursive
# oracle matches exactly); (3) every customer resolves to a canonical
# entity id (the cluster's min custkey; singletons self-canonical) with
# its cluster size. This is the master-data dedup a warehouse runs at
# scale: blocking bounds candidates, components glue transitive
# matches (A~B, B~C ⇒ one entity even when A,C are at distance 2),
# the canonical pick is a deterministic argmin.

def _er_candidate_pairs(keyed: DataFrame) -> DataFrame:
    """Blocked in-bucket candidate pair generation for entity
    resolution: (c_custkey, key, name) rows -> one struct column ``p``
    = (u, an, v, bn) per unordered same-key candidate pair (u < v by
    custkey), every pair emitted at least once (exactly once per key
    under distinct custkeys).

    In-bucket explode instead of a key self-join — pairs explode
    map-side from per-key sorted member lists. De-skewed (VERDICT r14
    item #2): a blocking bucket grows with near-dup density, and an
    unbounded collect_list would put an entire hot bucket (and its
    O(n^2) pair explode) in ONE row/task. Instead the bucket splits
    into ceil(n / _ER_BLOCK) hash blocks BEFORE any collect (guide
    §2.5 two-level/salted aggregation): the member count that sizes
    the split is a WINDOW count over the same hash(key) exchange the
    collect needs anyway (a linear, spillable pass — no unbounded
    row), and the block aggregate reuses that partitioning (hash(key)
    satisfies the (key, b) clustering), so pair generation still costs
    ONE exchange of the keyed rows. In-block pairs explode map-side
    per block row; cross-block pairs come from a block-to-higher-block
    join keyed on (key, target block), spreading a hot key's quadratic
    work over its blocks. At bench SFs every nb is 1 (max bucket ~38
    at sf0.1), the cross path is empty, and the pair set is
    bit-identical to the uncapped shape by construction — measured a
    wash at sf0.1 (best-of-2 x2 alternating: 2.32/2.56 vs 2.76/2.80 s).
    """
    wkey = Window.partitionBy("key")
    blocks = (
        keyed.withColumn("n", F.count(F.lit(1)).over(wkey))
        .where(F.col("n") > 1)
        .withColumn(
            "nb",
            F.expr(f"CAST((n + {_ER_BLOCK} - 1) DIV {_ER_BLOCK} AS INT)"),
        )
        .withColumn(
            "b", F.pmod(F.xxhash64("c_custkey"), F.col("nb")).cast("int")
        )
        .groupBy("key", "b")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("c_custkey", "name"))
            ).alias("ms"),
            F.first("nb").alias("nb"),
        )
        # Three consumers below (in-block explode + both cross-join
        # sides); Spark has no common-subplan dedup, so materialize the
        # block table once (the curation-pipeline lesson).
        .localCheckpoint(eager=True)
    )
    intra = blocks.where(F.size("ms") > 1).select(
        F.explode(
            F.expr(
                "flatten(transform(ms, (x, i) ->"
                " transform(slice(ms, i + 2, size(ms)), y ->"
                " struct(x.c_custkey AS u, x.name AS an,"
                " y.c_custkey AS v, y.name AS bn))))"
            )
        ).alias("p")
    )
    xrep = blocks.where(F.col("b") < F.col("nb") - 1).select(
        "key",
        F.col("ms").alias("xs"),
        F.explode(F.sequence(F.col("b") + 1, F.col("nb") - 1)).alias("j"),
    )
    cross = xrep.join(
        blocks.select(
            "key", F.col("b").alias("j"), F.col("ms").alias("ys")
        ),
        ["key", "j"],
    ).select(
        F.explode(
            F.expr(
                "flatten(transform(xs, x -> transform(ys, y -> struct("
                "IF(x.c_custkey < y.c_custkey, x.c_custkey, y.c_custkey)"
                " AS u,"
                " IF(x.c_custkey < y.c_custkey, x.name, y.name) AS an,"
                " IF(x.c_custkey < y.c_custkey, y.c_custkey, x.c_custkey)"
                " AS v,"
                " IF(x.c_custkey < y.c_custkey, y.name, x.name) AS bn))))"
            )
        ).alias("p")
    )
    return intra.unionByName(cross)


@register(
    "customer_entity_resolution",
    oracle="""
WITH RECURSIVE p AS (
  SELECT a.c_custkey AS u, b.c_custkey AS v
  FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
edges AS (SELECT u AS src, v AS dst FROM p
          UNION ALL SELECT v, u FROM p),
reach(node, label) AS (
  SELECT DISTINCT src AS node, src AS label FROM edges
  UNION
  SELECT e.dst AS node, r.label
  FROM reach r JOIN edges e ON r.node = e.src),
cc AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
m AS (
  SELECT c.c_custkey,
         CAST(COALESCE(cc.component, c.c_custkey) AS BIGINT) AS entity_id
  FROM customer c LEFT JOIN cc ON cc.node = c.c_custkey),
sz AS (SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
       FROM m GROUP BY entity_id)
SELECT m.c_custkey, m.entity_id, sz.cluster_size,
       CAST(m.c_custkey = m.entity_id AS INTEGER) AS is_canonical
FROM m JOIN sz USING (entity_id)
""".strip(),
)
def customer_entity_resolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.components import connected_components

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    # Join on the 64-bit HASH of each deletion-neighborhood key, not the
    # key string — the blocking join shuffles longs instead of ~18-char
    # strings (hash collisions are harmless: the levenshtein predicate
    # re-verifies every candidate). The levenshtein filter runs BEFORE
    # the distinct so the dedup shuffle carries only the surviving
    # (u, v) pairs, no name strings.
    keyed = cust.select(
        "c_custkey",
        F.explode(
            F.expr(
                "transform(array_union(array(c_name),"
                " transform(sequence(1, length(c_name)), i ->"
                " concat(substring(c_name, 1, i - 1),"
                " substring(c_name, i + 1, length(c_name))))),"
                " k -> xxhash64(k))"
            )
        ).alias("key"),
        F.col("c_name").alias("name"),
    )
    # Candidate generation: the de-skewed blocked in-bucket explode
    # (_er_candidate_pairs above); levenshtein verify BEFORE the
    # distinct so the dedup exchange carries only surviving pairs.
    pairs = (
        _er_candidate_pairs(keyed)
        .where(F.levenshtein("p.an", "p.bn") <= 1)
        .select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .distinct()
    )
    labels = connected_components(pairs, src="u", dst="v")
    m = cust.join(
        labels, cust["c_custkey"] == labels["node"], "left"
    ).select(
        "c_custkey",
        F.coalesce(F.col("label"), F.col("c_custkey"))
        .cast("long")
        .alias("entity_id"),
    )
    sz = m.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return m.join(sz, "entity_id").select(
        "c_custkey",
        "entity_id",
        "cluster_size",
        (F.col("c_custkey") == F.col("entity_id"))
        .cast("int")
        .alias("is_canonical"),
    )


# --- parameterized SQL surface (round 10) ---------------------------------
# spark.sql named-parameter binding (Spark 3.4+/4.x): the query text
# carries :named placeholders and the engine binds literals at parse
# time — the safe templating surface an analyst-facing tool needs
# (no string interpolation, no injection, constant-folded exactly
# like inline literals, so predicate pushdown is unaffected). The
# oracle inlines the same constants; identical plans, identical
# values — the parity proof that binding adds no semantics.

_PARAM_LO = "1996-01-01"
_PARAM_SEG = "BUILDING"


@register(
    "sql_parameterized_revenue",
    oracle=f"""
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE CAST(o.o_orderdate AS DATE) >= DATE '{_PARAM_LO}'
  AND c.c_mktsegment = '{_PARAM_SEG}'
GROUP BY 1
""".strip(),
)
def sql_parameterized_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.tables import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_mktsegment AS segment,
               CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE to_date(o.o_orderdate) >= :lo
          AND c.c_mktsegment = :seg
        GROUP BY 1
        """,
        args={"lo": _PARAM_LO, "seg": _PARAM_SEG},
    )


# --- exact grouped mode with pinned tie-break (round 10) ------------------
# MODE() per group, window-free: count per (group, value), then ONE
# max_by argmax whose ordering struct pins ties (count desc, value
# asc) — deterministic where a bare mode() is engine-defined. Two
# hash aggregates with map-side combine; the second's input is
# |groups| × |distinct values| rows, never fact-sized. The dimension
# join broadcasts.

@register(
    "nation_mode_priority",
    oracle="""
WITH c AS (
  SELECT n.n_name AS nation, o.o_orderpriority AS priority,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders o
  JOIN customer cu ON o.o_custkey = cu.c_custkey
  JOIN nation n ON cu.c_nationkey = n.n_nationkey
  GROUP BY 1, 2),
r AS (
  SELECT c.*, ROW_NUMBER() OVER (PARTITION BY nation
              ORDER BY n DESC, priority ASC) AS rn
  FROM c)
SELECT nation, priority AS mode_priority, n AS mode_n FROM r WHERE rn = 1
""".strip(),
)
def nation_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    c = (
        o.join(F.broadcast(cu), o["o_custkey"] == cu["c_custkey"])
        .join(F.broadcast(n), cu["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    # argmax struct: count desc ≡ max(n), tie → min(priority): compare
    # (n, neg-ordered priority) lexicographically via max_by
    best = c.groupBy("nation").agg(
        F.max_by(
            F.struct(F.col("priority").alias("p"), F.col("n").alias("cnt")),
            F.struct(
                F.col("n").alias("n"),
                # invert the string order for the tie-break: max_by
                # must prefer the SMALLER priority at equal count —
                # negate by ranking priorities descending via a
                # row-independent trick: use the struct (n, -rank)?
                # priorities are '1-URGENT'..'5-LOW': the leading
                # digit gives a total order, so -digit works.
                (-F.substring("priority", 1, 1).cast("int")).alias("tb"),
            ),
        ).alias("b")
    )
    return best.select(
        "nation",
        F.col("b.p").alias("mode_priority"),
        F.col("b.cnt").alias("mode_n"),
    )


# --- right-to-erasure cascade audit (round 10) ----------------------------
# The GDPR delete a warehouse actually runs: a deletion cohort of
# customers (deterministic key-mod stand-in for the request list)
# cascades through orders → lineitem and events, and compliance wants
# the AUDIT before the mutation — per-table cascade counts plus an
# order-independent checksum of every RETAINED row (xor of the
# cross-engine affine key hash — the multiset-checksum idea of the
# table_reconcile_checksums family, on integer keys) so the
# post-delete state is verifiable without re-scanning history. Engine
# shape: the cohort broadcast-semi-joins each fact table once
# (scan-side pushdown of the key-mod predicate on the customer side);
# counts and checksums come out of the same single pass per table.

_ERASE_MOD = 13  # c_custkey % 13 == 0 → the deletion cohort


@register(
    "gdpr_erasure_audit",
    oracle=f"""
WITH cohort AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {_ERASE_MOD} = 0),
o AS (
  SELECT o.o_orderkey,
         (o.o_custkey IN (SELECT c_custkey FROM cohort)) AS del
  FROM orders o),
l AS (
  SELECT l.l_orderkey, l.l_linenumber,
         (l.l_orderkey IN (SELECT o_orderkey FROM o WHERE del)) AS del
  FROM lineitem l),
e AS (
  SELECT e.event_id,
         (e.user_id IN (SELECT c_custkey FROM cohort)) AS del
  FROM events e)
SELECT 'customer' AS tbl,
       CAST((SELECT COUNT(*) FROM cohort) AS BIGINT) AS n_delete,
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_total,
       CAST((SELECT COALESCE(bit_xor((48271 * (c_custkey % 2147483647) + 11) % 2147483647), 0) FROM customer
             WHERE c_custkey % {_ERASE_MOD} <> 0) AS BIGINT)
         AS retained_checksum
UNION ALL
SELECT 'orders',
       CAST((SELECT COUNT(*) FROM o WHERE del) AS BIGINT),
       CAST((SELECT COUNT(*) FROM o) AS BIGINT),
       CAST((SELECT COALESCE(bit_xor((48271 * (o_orderkey % 2147483647) + 11) % 2147483647), 0)
             FROM o WHERE NOT del) AS BIGINT)
UNION ALL
SELECT 'lineitem',
       CAST((SELECT COUNT(*) FROM l WHERE del) AS BIGINT),
       CAST((SELECT COUNT(*) FROM l) AS BIGINT),
       CAST((SELECT COALESCE(bit_xor((48271 * ((l_orderkey * 8 + l_linenumber) % 2147483647)
                              + 11) % 2147483647), 0)
             FROM l WHERE NOT del) AS BIGINT)
UNION ALL
SELECT 'events',
       CAST((SELECT COUNT(*) FROM e WHERE del) AS BIGINT),
       CAST((SELECT COUNT(*) FROM e) AS BIGINT),
       CAST((SELECT COALESCE(bit_xor((48271 * (event_id % 2147483647) + 11) % 2147483647), 0)
             FROM e WHERE NOT del) AS BIGINT)
""".strip(),
)
def gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    cohort = cust.where(F.col("c_custkey") % _ERASE_MOD == 0)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")

    o_del = orders.join(
        F.broadcast(cohort), orders["o_custkey"] == cohort["c_custkey"],
        "left_semi",
    ).select("o_orderkey").persist()  # two consumers: count + li cascade

    def audit(tbl, df, del_df, key, checksum_col):
        kept = df.join(del_df, key, "left_anti")
        n_del = df.join(del_df, key, "left_semi").agg(
            F.count(F.lit(1)).cast("long").alias("n_delete")
        )
        n_tot = df.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
        h = (
            F.lit(48271) * (checksum_col.cast("long") % F.lit(2147483647))
            + F.lit(11)
        ) % F.lit(2147483647)
        chk = kept.agg(
            F.coalesce(F.bit_xor(h), F.lit(0))
            .cast("long")
            .alias("retained_checksum")
        )
        return (
            n_del.crossJoin(F.broadcast(n_tot))
            .crossJoin(F.broadcast(chk))
            .select(
                F.lit(tbl).alias("tbl"),
                "n_delete",
                "n_total",
                "retained_checksum",
            )
        )

    c_audit = audit(
        "customer",
        cust,
        cohort.select("c_custkey"),
        "c_custkey",
        F.col("c_custkey"),
    )
    o_audit = audit(
        "orders", orders.select("o_orderkey"), o_del, "o_orderkey",
        F.col("o_orderkey"),
    )
    l_audit = audit(
        "lineitem",
        li.withColumn(
            "_k", F.col("l_orderkey") * 8 + F.col("l_linenumber")
        ),
        o_del.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        F.col("_k"),
    )
    e_audit = audit(
        "events",
        ev,
        cohort.select(F.col("c_custkey").alias("user_id")),
        "user_id",
        F.col("event_id"),
    )
    return c_audit.unionAll(o_audit).unionAll(l_audit).unionAll(e_audit)


# --- reconcile phase 2: per-key drill-down into divergent buckets ---------
# table_reconcile_checksums LOCALIZES divergence to buckets; the
# repair planner then needs the exact keys — but only inside the
# divergent 1/B of the key space. Phase 2 recomputes per-KEY row
# hashes ONLY for rows whose bucket is divergent (the bucket
# membership predicate is a semi-join against the tiny divergent-
# bucket set — at 100 TB the bucket id is a partition column and this
# prunes partitions), full-outer-joins the two sides on the key, and
# emits each differing key with its reason: 'missing_b' (deleted) or
# 'modified' (checksum drift). Same deterministic drift/delete
# constants and RH row-hash protocol as phase 1 — a green row proves
# the two phases agree on WHAT diverged.

def _recon_drill_oracle() -> str:
    def rh(canon: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(7 AS BIGINT), "
            f"list_transform(string_split({canon}, ''), "
            "x -> CAST(ascii(x) AS BIGINT))), "
            "(acc, x) -> (acc * 31 + x) % 1000000007)"
        )

    canon_a = _recon_canon_sql("o_totalprice")
    canon_b = _recon_canon_sql(
        "o_totalprice + (CASE WHEN"
        f" o_orderkey % {_RECON_BUCKETS} = {_RECON_DRIFT_BUCKET}"
        " THEN 0.01 ELSE 0.0 END)"
    )
    return f"""
WITH a AS (
  SELECT o_orderkey, o_orderkey % {_RECON_BUCKETS} AS bucket,
         {rh(canon_a)} AS h
  FROM orders),
b AS (
  SELECT o_orderkey, o_orderkey % {_RECON_BUCKETS} AS bucket,
         {rh(canon_b)} AS h
  FROM orders
  WHERE NOT (o_orderkey % {_RECON_BUCKETS} = {_RECON_DELETE_BUCKET}
             AND o_orderkey % 5 = 0)),
div AS (
  SELECT a.bucket FROM (
    SELECT bucket, CAST(COUNT(*) AS BIGINT) n, CAST(SUM(h) AS BIGINT) c
    FROM a GROUP BY 1) a
  JOIN (
    SELECT bucket, CAST(COUNT(*) AS BIGINT) n, CAST(SUM(h) AS BIGINT) c
    FROM b GROUP BY 1) b ON a.bucket = b.bucket
  WHERE a.n <> b.n OR a.c <> b.c),
aa AS (SELECT a.* FROM a JOIN div ON a.bucket = div.bucket),
bb AS (SELECT b.* FROM b JOIN div ON b.bucket = div.bucket)
SELECT aa.o_orderkey, aa.bucket,
       CASE WHEN bb.o_orderkey IS NULL THEN 'missing_b'
            ELSE 'modified' END AS reason
FROM aa LEFT JOIN bb ON aa.o_orderkey = bb.o_orderkey
WHERE bb.o_orderkey IS NULL OR aa.h <> bb.h
""".strip()


@register("table_reconcile_drilldown", oracle=_recon_drill_oracle())
def table_reconcile_drilldown(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .text import RH_INIT, RH_MOD, RH_MULT

    orders = load_table(spark, sf_dir, "orders")

    def canon(price) -> F.Column:
        return F.concat(
            F.col("o_orderkey").cast("string"),
            F.lit("|"),
            F.col("o_orderstatus"),
            F.lit("|"),
            scaled_long(price, 100).cast("string"),
            F.lit("|"),
            F.to_date("o_orderdate").cast("string"),
        )

    def keyed(df: DataFrame, price) -> DataFrame:
        rowhash = F.aggregate(
            F.split(canon(price), ""),
            F.lit(RH_INIT).cast("long"),
            lambda acc, x: (acc * RH_MULT + F.ascii(x)) % RH_MOD,
        )
        return df.select(
            "o_orderkey",
            (F.col("o_orderkey") % _RECON_BUCKETS).alias("bucket"),
            rowhash.alias("h"),
        )

    drift = F.when(
        F.col("o_orderkey") % _RECON_BUCKETS == _RECON_DRIFT_BUCKET,
        F.lit(0.01),
    ).otherwise(F.lit(0.0))
    # persisted: each side feeds its bucket summary AND the drill-down
    a = keyed(orders, F.col("o_totalprice")).persist()
    b = keyed(
        orders.where(
            ~(
                (F.col("o_orderkey") % _RECON_BUCKETS == _RECON_DELETE_BUCKET)
                & (F.col("o_orderkey") % 5 == 0)
            )
        ),
        F.col("o_totalprice") + drift,
    ).persist()

    def summary(df):
        return df.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n"), F.sum("h").alias("c")
        )

    sa, sb = summary(a).alias("sa"), summary(b).alias("sb")
    div = (
        sa.join(sb, "bucket")
        .where(
            (F.col("sa.n") != F.col("sb.n"))
            | (F.col("sa.c") != F.col("sb.c"))
        )
        .select("bucket")
    )
    aa = a.join(F.broadcast(div), "bucket")
    bb = b.join(F.broadcast(div), "bucket").select(
        F.col("o_orderkey").alias("bk"), F.col("h").alias("hb")
    )
    j = aa.join(bb, aa["o_orderkey"] == bb["bk"], "left")
    return j.where(
        F.col("bk").isNull() | (F.col("h") != F.col("hb"))
    ).select(
        "o_orderkey",
        "bucket",
        F.when(F.col("bk").isNull(), "missing_b")
        .otherwise("modified")
        .alias("reason"),
    )


# --- supply-chain resilience: single-sourcing exposure (round 10) ---------
# Which parts depend on ONE supply nation? Per part: distinct
# suppliers, distinct supply nations (from shipped lineitems), the
# dominant nation's lineitem share in exact integers, and the
# single-sourced flag. Engine shape: one lineitem aggregate per
# (part, supplier) — map-side combined — then supplier→nation
# broadcast enrichment and a part-keyed rollup; the dominant-nation
# share is a max_by over the per-(part, nation) counts (the
# nation_mode_priority argmax pattern), never a window.

@register(
    "part_supply_resilience",
    oracle="""
WITH ps AS (
  SELECT l.l_partkey, l.l_suppkey, n.n_name AS nation,
         CAST(COUNT(*) AS BIGINT) AS n_items
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2, 3),
pn AS (
  SELECT l_partkey, nation, CAST(SUM(n_items) AS BIGINT) AS n_items
  FROM ps GROUP BY 1, 2),
agg AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS BIGINT) AS n_nations,
         CAST(SUM(n_items) AS BIGINT) AS n_total
  FROM pn GROUP BY 1),
dom AS (
  SELECT l_partkey, nation AS top_nation, n_items AS top_n
  FROM (SELECT pn.*, ROW_NUMBER() OVER (PARTITION BY l_partkey
               ORDER BY n_items DESC, nation ASC) AS rn FROM pn)
  WHERE rn = 1),
sup AS (
  SELECT l_partkey,
         CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
  FROM ps GROUP BY 1)
SELECT a.l_partkey AS part_key, s.n_suppliers, a.n_nations,
       d.top_nation, d.top_n, a.n_total,
       CAST(a.n_nations = 1 AS INTEGER) AS single_sourced
FROM agg a JOIN dom d USING (l_partkey) JOIN sup s USING (l_partkey)
""".strip(),
)
def part_supply_resilience(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    ps = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .groupBy("l_partkey", "l_suppkey", F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
        .persist()  # three consumers: pn rollup, supplier count
    )
    pn = ps.groupBy("l_partkey", "nation").agg(
        F.sum("n_items").cast("long").alias("n_items")
    ).persist()  # agg + dominant argmax
    agg = pn.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_nations"),
        F.sum("n_items").cast("long").alias("n_total"),
    )
    # dominant nation via max_by argmax (count desc, nation asc on tie:
    # nations order lexicographically — invert via a paired struct of
    # (n_items, reversed-name) is unsound for strings, so use min_by
    # over (-n_items, nation) instead: the lexicographically smallest
    # (-count, name) IS the (count desc, name asc) winner).
    dom = pn.groupBy("l_partkey").agg(
        F.min_by(
            F.struct(
                F.col("nation").alias("top_nation"),
                F.col("n_items").alias("top_n"),
            ),
            F.struct((-F.col("n_items")).alias("neg"), F.col("nation")),
        ).alias("d")
    )
    supn = ps.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_suppliers")
    )
    return (
        agg.join(dom, "l_partkey")
        .join(supn, "l_partkey")
        .select(
            F.col("l_partkey").alias("part_key"),
            "n_suppliers",
            "n_nations",
            F.col("d.top_nation").alias("top_nation"),
            F.col("d.top_n").alias("top_n"),
            "n_total",
            (F.col("n_nations") == 1).cast("int").alias("single_sourced"),
        )
    )


# --- deterministic negative sampling for recommender training -------------
# (round 10) Training a co-purchase recommender needs (user, positive,
# negatives) triples; negatives must be items the user did NOT
# interact with, sampled reproducibly (no engine RNG — the md5-bucket
# sampling rationale). Per user, m=10 pseudo-random candidate items
# come from the affine hash (a·(custkey mod P) + b·j + c) mod P mod
# |part|, invalid candidates fall out via the validity join + the
# interactions ANTI join (deliberately un-hinted: the interaction set
# is fact-sized), and the first k=3 survivors by draw index j win —
# a user-keyed window over ≤ m rows/user. Oversampling depth m bounds
# the (tiny) failure probability that a heavy user exhausts all 10
# draws; the emitted n_drawn lets a consumer see exactly when that
# happened.

_NEG_K = 3
_NEG_M = 10
_NEG_P = 2_147_483_647


@register(
    "copurchase_negative_samples",
    oracle=f"""
WITH inter AS (
  SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts FROM part),
cand AS (
  SELECT u.custkey, t.j,
         (48271 * (u.custkey % {_NEG_P}) + 12345 * t.j + 7)
           % {_NEG_P} % np.n_parts AS partkey
  FROM (SELECT DISTINCT custkey FROM inter) u,
       UNNEST(range({_NEG_M})) AS t(j), np),
valid AS (
  SELECT c.custkey, c.j, c.partkey
  FROM cand c
  JOIN part p ON p.p_partkey = c.partkey
  WHERE NOT EXISTS (SELECT 1 FROM inter i
                    WHERE i.custkey = c.custkey
                      AND i.partkey = c.partkey)),
ranked AS (
  SELECT custkey, partkey, j,
         ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY j) AS rn
  FROM valid)
SELECT custkey AS c_custkey, CAST(partkey AS BIGINT) AS part_key,
       CAST(rn AS BIGINT) AS neg_rank, CAST(j AS BIGINT) AS n_drawn
FROM ranked WHERE rn <= {_NEG_K}
""".strip(),
)
def copurchase_negative_samples(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    inter = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .distinct()
        .persist()  # users + anti-join consumers
    )
    np_ = part.agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    users = inter.select("custkey").distinct()
    cand = (
        users.crossJoin(F.broadcast(np_))
        .select(
            "custkey",
            F.explode(F.sequence(F.lit(0), F.lit(_NEG_M - 1))).alias("j"),
            "n_parts",
        )
        .select(
            "custkey",
            "j",
            (
                (
                    F.lit(48271) * (F.col("custkey") % F.lit(_NEG_P))
                    + F.lit(12345) * F.col("j")
                    + F.lit(7)
                )
                % F.lit(_NEG_P)
                % F.col("n_parts")
            ).alias("partkey"),
        )
    )
    valid = cand.join(
        part, cand["partkey"] == part["p_partkey"], "left_semi"
    ).join(inter, ["custkey", "partkey"], "left_anti")
    w = Window.partitionBy("custkey").orderBy("j")
    return (
        valid.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _NEG_K)
        .select(
            F.col("custkey").alias("c_custkey"),
            F.col("partkey").cast("long").alias("part_key"),
            F.col("rn").cast("long").alias("neg_rank"),
            F.col("j").cast("long").alias("n_drawn"),
        )
    )


# --- fulfillment latency SLA report (round 10) ----------------------------
# Order-to-first-ship latency per order priority — the discrete
# rank-ceil quantile protocol (events_funnel_latency) on relational
# data: exact integer day latencies, per-(priority, latency) counts,
# one priority-keyed running sum over the (tiny) latency-value table,
# filtered MINs for p50/p90. No interpolating percentile, every cell
# an integer.

@register(
    "orders_ship_latency_sla",
    oracle="""
WITH lat AS (
  SELECT o.o_orderpriority AS priority,
         CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                        MIN(CAST(l.l_shipdate AS DATE))) AS BIGINT) AS lat
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority),
counts AS (
  SELECT priority, lat, CAST(COUNT(*) AS BIGINT) AS c
  FROM lat GROUP BY 1, 2),
cum AS (
  SELECT priority, lat, c,
         SUM(c) OVER (PARTITION BY priority ORDER BY lat) AS cs,
         SUM(c) OVER (PARTITION BY priority) AS n
  FROM counts)
SELECT priority,
       CAST(n AS BIGINT) AS n_orders,
       CAST(MIN(CASE WHEN cs * 2 >= n THEN lat END) AS BIGINT) AS p50_days,
       CAST(MIN(CASE WHEN cs * 10 >= 9 * n THEN lat END) AS BIGINT)
         AS p90_days,
       CAST(MAX(lat) AS BIGINT) AS max_days
FROM cum GROUP BY priority, n
""".strip(),
)
def orders_ship_latency_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    lat = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.min(F.to_date("l_shipdate")).alias("first_ship"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.col("first_ship"), F.to_date("o_orderdate"))
            .cast("long")
            .alias("lat"),
        )
    )
    counts = lat.groupBy("priority", "lat").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_cum = (
        Window.partitionBy("priority")
        .orderBy("lat")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("priority")
    cum = counts.select(
        "priority",
        "lat",
        F.sum("c").over(w_cum).alias("cs"),
        F.sum("c").over(w_all).alias("n"),
    )
    return cum.groupBy("priority", "n").agg(
        F.min(F.when(F.col("cs") * 2 >= F.col("n"), F.col("lat")))
        .cast("long")
        .alias("p50_days"),
        F.min(F.when(F.col("cs") * 10 >= 9 * F.col("n"), F.col("lat")))
        .cast("long")
        .alias("p90_days"),
        F.max("lat").cast("long").alias("max_days"),
    ).select(
        "priority",
        F.col("n").cast("long").alias("n_orders"),
        "p50_days",
        "p90_days",
        "max_days",
    )


# --- revenue concentration: exact Gini coefficient (round 11) ---------------
# The inequality audit a marketplace runs over customer revenue: Gini
# G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over the ASCENDING revenue
# order — exact BIGINT numerators (revenue rides as integer cents, the
# rank comes from the distributed range-rank machinery, no global
# window anywhere), one double division at the end. Ties in revenue are
# broken by custkey; Σ i·x_i is tie-order invariant (equal x swap
# freely), so the statistic is fully deterministic. Overflow bound:
# n·Σx < 2^63 (n·max_rank·cents terms) — holds far beyond fixture
# scale; at 100 TB shard the sum by key range and combine, or ride
# DECIMAL(38).

@register(
    "customer_revenue_gini",
    oracle="""
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT cents,
         CAST(ROW_NUMBER() OVER (ORDER BY cents ASC, o_custkey ASC)
              AS BIGINT) AS r
  FROM rev),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS revenue_cents,
         CAST(SUM(r * cents) AS BIGINT) AS rank_weighted_cents
  FROM ranked)
SELECT n_customers, revenue_cents, rank_weighted_cents,
       (2.0 * rank_weighted_cents
          - (CAST(n_customers AS DOUBLE) + 1) * revenue_cents)
       / (CAST(n_customers AS DOUBLE) * revenue_cents) AS gini
FROM s
""".strip(),
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_rank

    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    ranked = with_global_rank(
        rev, [F.col("cents").asc(), F.col("o_custkey").asc()], "r"
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("revenue_cents"),
        F.sum(F.col("r") * F.col("cents"))
        .cast("long")
        .alias("rank_weighted_cents"),
    )
    gini = (
        2.0 * F.col("rank_weighted_cents")
        - (F.col("n_customers").cast("double") + 1) * F.col("revenue_cents")
    ) / (
        F.col("n_customers").cast("double") * F.col("revenue_cents")
    )
    return s.select(
        "n_customers", "revenue_cents", "rank_weighted_cents",
        gini.alias("gini"),
    )


# --- reorder latency quantiles per market segment (round 11) ---------------
# "How long until a customer comes back?" — consecutive-order gaps in
# days per customer (customer-partitioned lag window, never global),
# then the repo's discrete rank-ceil quantile protocol per market
# segment: value-keyed counts, a cumulative window partitioned by
# segment, and integer cross-multiplied rank thresholds (cs·2 ≥ n for
# p50, cs·10 ≥ 9n for p90) — the funnel-latency machinery on
# relational data. Gap days are exact integers; no approx percentile.

@register(
    "customer_reorder_latency",
    oracle="""
WITH o AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         CAST(o.o_orderdate AS DATE) AS d, o.o_orderkey
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
gaps AS (
  SELECT segment,
         CAST(d - LAG(d) OVER (PARTITION BY o_custkey
                               ORDER BY d, o_orderkey) AS BIGINT) AS gap
  FROM o),
g AS (SELECT segment, gap FROM gaps WHERE gap IS NOT NULL),
counts AS (
  SELECT segment, gap, CAST(COUNT(*) AS BIGINT) AS c
  FROM g GROUP BY segment, gap),
cum AS (
  SELECT segment, gap,
         SUM(c) OVER (PARTITION BY segment ORDER BY gap
                      ROWS UNBOUNDED PRECEDING) AS cs,
         SUM(c) OVER (PARTITION BY segment) AS n
  FROM counts)
SELECT segment, CAST(MIN(n) AS BIGINT) AS n_gaps,
       CAST(MIN(CASE WHEN cs * 2 >= n THEN gap END) AS BIGINT)
         AS p50_days,
       CAST(MIN(CASE WHEN cs * 10 >= 9 * n THEN gap END) AS BIGINT)
         AS p90_days,
       CAST(MAX(gap) AS BIGINT) AS max_days
FROM cum GROUP BY segment
""".strip(),
)
def customer_reorder_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", F.to_date("o_orderdate").alias("d"), "o_orderkey")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    w_cust = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = (
        o.join(c, "o_custkey")
        .withColumn(
            "gap", F.datediff(F.col("d"), F.lag("d").over(w_cust)).cast("long")
        )
        .where(F.col("gap").isNotNull())
        .select("segment", "gap")
    )
    counts = gaps.groupBy("segment", "gap").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_cum = (
        Window.partitionBy("segment")
        .orderBy("gap")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("segment")
    cum = counts.select(
        "segment",
        "gap",
        F.sum("c").over(w_cum).alias("cs"),
        F.sum("c").over(w_all).alias("n"),
    )
    return cum.groupBy("segment").agg(
        F.min("n").cast("long").alias("n_gaps"),
        F.min(F.when(F.col("cs") * 2 >= F.col("n"), F.col("gap")))
        .cast("long")
        .alias("p50_days"),
        F.min(F.when(F.col("cs") * 10 >= 9 * F.col("n"), F.col("gap")))
        .cast("long")
        .alias("p90_days"),
        F.max("gap").cast("long").alias("max_days"),
    )


# --- co-purchase recommender evaluation (round 11) --------------------------
# The pipeline-composition query a recommender team actually runs: the
# leakage-safe md5 fold protocol (orders_group_split) picks the TEST
# customers; each test customer's LAST order (max (orderdate,
# orderkey) — deterministic) is held out as the target basket, every
# earlier purchase is context; candidates are scored by summed
# co-purchase edge weight from the context parts (the weighted edge
# view recipe), already-seen parts excluded, top-10 per customer by
# (score DESC, part ASC). Metrics: hit-rate@10 (exact integers) and an
# integer-scaled MRR (Σ floor(SCALE / first-hit-rank) — reciprocal
# ranks as floor divisions, so the sum is order-independent and
# cross-engine exact; ln/float-sum stay off the protocol). Engine
# shape: fold filter (narrow), per-customer argmax via struct max,
# score aggregate keyed by (customer, candidate), a customer-
# partitioned rank window, and two tiny reduces. Candidate volume is
# |context| · avg-degree per customer — bounded, never corpus².

_REC_K = 10
_REC_MRR_SCALE = 1_000_000


@register(
    "copurchase_recommender_eval",
    oracle=f"""
WITH folds AS (
  SELECT c_custkey FROM (
    SELECT c_custkey,
           (strpos('0123456789abcdef', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substr(md5(CAST(c_custkey AS VARCHAR)), 2, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substr(md5(CAST(c_custkey AS VARCHAR)), 3, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(CAST(c_custkey AS VARCHAR)), 4, 1)) - 1) AS b
    FROM customer)
  WHERE b >= {_SPLIT_VAL_HI}),
co AS (
  SELECT o.o_custkey AS cust, o.o_orderkey, CAST(o.o_orderdate AS DATE) AS d,
         l.l_partkey AS part
  FROM orders o
  JOIN folds f ON f.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
lastkey AS (
  SELECT cust, o_orderkey AS last_ok FROM (
    SELECT cust, o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY cust
                              ORDER BY d DESC, o_orderkey DESC) AS rn,
           COUNT(*) OVER (PARTITION BY cust) AS n
    FROM (SELECT DISTINCT cust, o_orderkey, d FROM co))
  WHERE rn = 1 AND n >= 2),
target AS (
  SELECT DISTINCT c.cust, c.part
  FROM co c JOIN lastkey lk ON lk.cust = c.cust
  WHERE c.o_orderkey = lk.last_ok),
context AS (
  SELECT DISTINCT c.cust, c.part
  FROM co c JOIN lastkey lk ON lk.cust = c.cust
  WHERE c.o_orderkey <> lk.last_ok),
target_new AS (
  SELECT t.cust, t.part FROM target t
  WHERE NOT EXISTS (SELECT 1 FROM context x
                    WHERE x.cust = t.cust AND x.part = t.part)),
evalset AS (SELECT DISTINCT cust FROM target_new),
li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
mv AS (
  SELECT LEAST(a.l_partkey, b.l_partkey) AS u,
         GREATEST(a.l_partkey, b.l_partkey) AS v,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
sym AS (SELECT u AS src, v AS dst, w FROM mv
        UNION ALL SELECT v, u, w FROM mv),
scores AS (
  SELECT x.cust, e.dst AS cand, CAST(SUM(e.w) AS BIGINT) AS score
  FROM context x
  JOIN evalset ev ON ev.cust = x.cust
  JOIN sym e ON e.src = x.part
  GROUP BY x.cust, e.dst),
fresh AS (
  SELECT s.* FROM scores s
  WHERE NOT EXISTS (SELECT 1 FROM context x
                    WHERE x.cust = s.cust AND x.part = s.cand)),
ranked AS (
  SELECT cust, cand,
         ROW_NUMBER() OVER (PARTITION BY cust
                            ORDER BY score DESC, cand ASC) AS rn
  FROM fresh),
hits AS (
  SELECT r.cust, MIN(r.rn) AS first_rank
  FROM ranked r JOIN target_new t ON t.cust = r.cust AND t.part = r.cand
  WHERE r.rn <= {_REC_K}
  GROUP BY r.cust)
SELECT CAST((SELECT COUNT(*) FROM evalset) AS BIGINT) AS n_eval_customers,
       CAST(COUNT(h.cust) AS BIGINT) AS n_hit_customers,
       CAST(COUNT(h.cust) AS DOUBLE)
         / (SELECT COUNT(*) FROM evalset) AS hit_rate,
       CAST(COALESCE(SUM({_REC_MRR_SCALE} // h.first_rank), 0) AS BIGINT)
         AS mrr_scaled
FROM hits h
""".strip(),
)
def copurchase_recommender_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    b = F.conv(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 4), 16, 10
    ).cast("long")
    folds = cust.where(b >= _SPLIT_VAL_HI).select(
        F.col("c_custkey").alias("cust")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"),
        "o_orderkey",
        F.to_date("o_orderdate").alias("d"),
    )
    li_all = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_partkey").alias("part")
    )
    co = (
        orders.join(folds, "cust")
        .join(li_all, orders["o_orderkey"] == li_all["l_orderkey"])
        .select("cust", "o_orderkey", "d", "part")
        .persist()
    )
    last_o = (
        co.select("cust", "o_orderkey", "d")
        .distinct()
        .groupBy("cust")
        .agg(
            F.max(F.struct("d", "o_orderkey")).alias("mx"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .where(F.col("n_orders") >= 2)
        .select("cust", F.col("mx.o_orderkey").alias("last_ok"))
    )
    lastkey = F.broadcast(last_o)
    # ONE (cust, part)-keyed aggregate derives context AND held-out
    # target in a single shuffle: a part is context if it has any
    # pre-last occurrence, a fresh target iff it occurs ONLY in the
    # last order (that subsumes the distinct + anti-join formulation).
    flags = (
        co.join(lastkey, "cust")
        .groupBy("cust", "part")
        .agg(
            F.max(
                (F.col("o_orderkey") != F.col("last_ok")).cast("int")
            ).alias("has_ctx"),
            F.max(
                (F.col("o_orderkey") == F.col("last_ok")).cast("int")
            ).alias("has_last"),
        )
        .persist()
    )
    context = flags.where(F.col("has_ctx") == 1).select("cust", "part")
    target_new = flags.where(
        (F.col("has_last") == 1) & (F.col("has_ctx") == 0)
    ).select("cust", "part")
    evalset = target_new.select("cust").distinct()
    mv = copurchase_weighted_edges(spark, sf_dir).persist()
    sym = mv.select(
        F.col("u").alias("src"), F.col("v").alias("cand"), "w"
    ).unionAll(mv.select(F.col("v").alias("src"), F.col("u").alias("cand"), "w"))
    scores = (
        context.join(evalset, "cust", "left_semi")
        .join(sym, F.col("part") == F.col("src"))
        .groupBy("cust", "cand")
        .agg(F.sum("w").cast("long").alias("score"))
    )
    fresh = scores.join(
        context.select("cust", F.col("part").alias("cand")),
        ["cust", "cand"],
        "left_anti",
    )
    w_rank = Window.partitionBy("cust").orderBy(
        F.col("score").desc(), F.col("cand").asc()
    )
    ranked = fresh.withColumn("rn", F.row_number().over(w_rank)).where(
        F.col("rn") <= _REC_K
    )
    hits = (
        ranked.join(
            target_new.select("cust", F.col("part").alias("cand")),
            ["cust", "cand"],
        )
        .groupBy("cust")
        .agg(F.min("rn").alias("first_rank"))
    )
    n_eval = evalset.agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_customers")
    )
    agg = hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_hit_customers"),
        F.sum(F.expr(f"cast({_REC_MRR_SCALE} as bigint) div first_rank"))
        .cast("long")
        .alias("mrr_scaled"),
    )
    return (
        n_eval.crossJoin(F.broadcast(agg))
        .select(
            "n_eval_customers",
            F.coalesce("n_hit_customers", F.lit(0).cast("long")).alias(
                "n_hit_customers"
            ),
            (
                F.coalesce("n_hit_customers", F.lit(0)).cast("double")
                / F.col("n_eval_customers").cast("double")
            ).alias("hit_rate"),
            F.coalesce("mrr_scaled", F.lit(0).cast("long")).alias(
                "mrr_scaled"
            ),
        )
    )


# --- equi-depth order-price histogram via the distributed rank (round 11) --
# The optimizer-statistics primitive: B buckets of (near-)equal ROW
# COUNT over the global price order, each with its exact [lo, hi]
# bounds and count — the histogram a cost-based planner keeps, and the
# complement of the registry's equi-WIDTH order_price_histogram.
# Bucket id = floor((rank−1)·B / n) over the global (cents, orderkey)
# order — the explicit integer formula, NOT NTILE (NTILE hands the
# remainder to the FIRST buckets; the floor formula spreads it — the
# two disagree whenever n % B ≠ 0, so the oracle replays the same
# arithmetic). Rank comes from the range-partition rank machinery —
# no single-partition window at any scale.

_EQD_BINS = 16


@register(
    "orders_equidepth_bins",
    oracle=f"""
WITH o AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
  FROM orders),
rk AS (
  SELECT cents,
         CAST(ROW_NUMBER() OVER (ORDER BY cents ASC, o_orderkey ASC)
              AS BIGINT) AS r,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM o) AS n
  FROM o)
SELECT CAST((r - 1) * {_EQD_BINS} // n AS BIGINT) AS bucket,
       CAST(MIN(cents) AS BIGINT) AS lo_cents,
       CAST(MAX(cents) AS BIGINT) AS hi_cents,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM rk GROUP BY 1
""".strip(),
)
def orders_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_rank_and_total

    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    ranked = with_global_rank_and_total(
        o, [F.col("cents").asc(), F.col("o_orderkey").asc()], "r", "n"
    )
    return (
        ranked.select(
            F.expr(f"(r - 1) * {_EQD_BINS} div n").cast("long").alias(
                "bucket"
            ),
            "cents",
        )
        .groupBy("bucket")
        .agg(
            F.min("cents").cast("long").alias("lo_cents"),
            F.max("cents").cast("long").alias("hi_cents"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- per-brand discount elasticity: OLS as one exact aggregate (round 11) --
# "Does a deeper discount move quantity?" — the ordinary-least-squares
# slope of quantity on discount percent, per brand, computed from the
# five classic sufficient statistics (n, Σx, Σy, Σxy, Σx²) — each an
# exact BIGINT (discount rides as integer percent ×100, quantity as
# integer units), so the per-brand shuffle is ONE grouped aggregate
# with map-side combine and the slope/intercept are two double
# divisions at the end: slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²).
# Regression as an aggregate — no ML library, no iteration, the
# exact-stats protocol (functions/stable.py) applied to model fitting.

@register(
    "brand_discount_elasticity",
    oracle="""
WITH d AS (
  SELECT p.p_brand AS brand,
         CAST(ROUND(l.l_discount * 10000) AS BIGINT) AS x,
         CAST(ROUND(l.l_quantity) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
s AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM d GROUP BY brand)
SELECT brand, n, sx, sy, sxy, sxx,
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
         AS slope,
       (CAST(sy AS DOUBLE)
          - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx)
         / n AS intercept
FROM s
""".strip(),
)
def brand_discount_elasticity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_discount") * 10000).cast("long").alias("x"),
        F.round(F.col("l_quantity")).cast("long").alias("y"),
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").select(
            F.col("p_partkey").alias("l_partkey"),
            F.col("p_brand").alias("brand"),
        )
    )
    s = (
        li.join(p, "l_partkey")
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        )
    )
    slope = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx")
    ) / F.col("n")
    return s.select(
        "brand", "n", "sx", "sy", "sxy", "sxx",
        slope.alias("slope"), intercept.alias("intercept"),
    )


# --- 4-4-5 fiscal calendar rollup (round 11) --------------------------------
# Retail finance does not close books on calendar months: the 4-4-5
# calendar divides each quarter into 4+4+5 WEEKS so every period has a
# whole number of weeks (comparable week-over-week). Deterministic
# spec: fiscal weeks count from the fixed anchor Monday 1992-01-06;
# fiscal year = week div 52 (the leap-week variant would add a 53rd
# week — out of scope, documented); week-in-year w ∈ [0, 52) maps to
# period (w div 13)·3 + step(w mod 13) with step = 0 for weeks 0-3,
# 1 for 4-7, 2 for 8-12. Pure integer date arithmetic — both engines
# compute identical period ids — then one grouped revenue aggregate.

_FISCAL_ANCHOR = "1992-01-06"  # Monday, fiscal week 0 day 0


@register(
    "orders_fiscal_445_rollup",
    oracle=f"""
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) - DATE '{_FISCAL_ANCHOR}' AS dd,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
w AS (
  SELECT dd // 7 AS wk, cents FROM o WHERE dd >= 0),
p AS (
  SELECT wk // 52 AS fiscal_year, wk % 52 AS wy, cents FROM w)
SELECT CAST(fiscal_year AS BIGINT) AS fiscal_year,
       CAST((wy // 13) * 3
            + CASE WHEN wy % 13 < 4 THEN 0
                   WHEN wy % 13 < 8 THEN 1 ELSE 2 END + 1
            AS BIGINT) AS fiscal_period,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM p GROUP BY 1, 2
""".strip(),
)
def orders_fiscal_445_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.datediff(
            F.to_date("o_orderdate"), F.lit(_FISCAL_ANCHOR).cast("date")
        ).alias("dd"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).where(F.col("dd") >= 0)
    wk = F.expr("dd div 7")
    wy = wk % 52
    step = (
        F.when(wy % 13 < 4, 0).when(wy % 13 < 8, 1).otherwise(2)
    )
    return (
        o.select(
            F.expr("(dd div 7) div 52").cast("long").alias("fiscal_year"),
            (F.expr("((dd div 7) % 52) div 13") * 3 + step + 1)
            .cast("long")
            .alias("fiscal_period"),
            "cents",
        )
        .groupBy("fiscal_year", "fiscal_period")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


# --- tie-correct distributed CUME_DIST over order prices (round 11) --------
# cume_dist(v) = #{rows ≤ v} / n — the window function whose TIE
# semantics (all rows of a value share the count-through-the-last-tie)
# the row_number machinery cannot fake. Distributed shape: collapse to
# per-VALUE counts first (one keyed aggregate — the value domain is
# what scales, not the row count), then the range-partitioned global
# running sum over values; cume_dist falls out as one exact division
# per distinct value. No single-partition window anywhere; the oracle
# is the engine-native CUME_DIST window, so this is a semantics-parity
# proof against the SQL standard itself.

@register(
    "orders_price_cume_dist",
    oracle="""
WITH o AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
base AS (
  SELECT cents,
         CUME_DIST() OVER (ORDER BY cents) AS cd,
         CAST(COUNT(*) OVER (PARTITION BY cents) AS BIGINT) AS n_orders,
         ROW_NUMBER() OVER (PARTITION BY cents ORDER BY cents) AS rn
  FROM o)
SELECT cents, n_orders, cd AS cume_dist FROM base WHERE rn = 1
""".strip(),
)
def orders_price_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_running_sum

    counts = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
        )
        .groupBy("cents")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    cum = with_global_running_sum(
        counts,
        [F.col("cents").asc()],
        "n_orders",
        out_col="cs",
        total_col="n_total",
    )
    return cum.select(
        "cents",
        "n_orders",
        (F.col("cs").cast("double") / F.col("n_total").cast("double")).alias(
            "cume_dist"
        ),
    )


# --- supplier on-time ranking by Wilson lower bound (round 11) --------------
# "How not to sort by average rating": a supplier with 3/3 on-time
# beats one with 950/1000 under the naive rate — the Wilson score
# interval's lower bound [Wilson 1927] penalizes small samples and is
# the standard production fix for ranking proportions. On-time =
# shipped within 30 days of the order date; counts are exact integers,
# and the bound is ONE fixed expression tree over (s, n) — written
# with identical parenthesization in both engines so the IEEE op
# sequence (and therefore the double) is bit-identical. Top-25 via
# TakeOrderedAndProject (bound desc, suppkey asc).

_WILSON_Z = 1.96
_WILSON_TOPK = 25
_ONTIME_DAYS = 30


@register(
    "supplier_ontime_wilson",
    oracle=f"""
WITH j AS (
  SELECT l.l_suppkey AS suppkey,
         CASE WHEN CAST(l.l_shipdate AS DATE)
                   <= CAST(o.o_orderdate AS DATE) + {_ONTIME_DAYS}
              THEN 1 ELSE 0 END AS ontime
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
s AS (
  SELECT suppkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(ontime) AS BIGINT) AS n_ontime
  FROM j GROUP BY suppkey),
w AS (
  SELECT suppkey, n_lines, n_ontime,
         ((CAST(n_ontime AS DOUBLE) / n_lines)
            + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n_lines)
            - {_WILSON_Z} * SQRT(
                ((CAST(n_ontime AS DOUBLE) / n_lines)
                   * (1.0 - (CAST(n_ontime AS DOUBLE) / n_lines))
                 + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n_lines))
                / n_lines))
         / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n_lines) AS wilson_lb
  FROM s),
ranked AS (
  SELECT suppkey, n_lines, n_ontime, wilson_lb,
         CAST(ROW_NUMBER() OVER (ORDER BY wilson_lb DESC, suppkey ASC)
              AS BIGINT) AS rank
  FROM w)
SELECT suppkey, n_lines, n_ontime, wilson_lb, rank
FROM ranked WHERE rank <= {_WILSON_TOPK}
""".strip(),
)
def supplier_ontime_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_suppkey").alias("suppkey"),
        F.to_date("l_shipdate").alias("ship"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    s = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            "suppkey",
            (F.col("ship") <= F.date_add("od", _ONTIME_DAYS))
            .cast("int")
            .alias("ontime"),
        )
        .groupBy("suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("ontime").cast("long").alias("n_ontime"),
        )
    )
    z = F.lit(_WILSON_Z)
    n = F.col("n_lines")
    phat = F.col("n_ontime").cast("double") / n
    wilson = (
        phat
        + z * z / (2.0 * n)
        - z
        * F.sqrt(
            (phat * (F.lit(1.0) - phat) + z * z / (4.0 * n)) / n
        )
    ) / (F.lit(1.0) + z * z / n)
    w = Window.orderBy(F.col("wilson_lb").desc(), F.col("suppkey").asc())
    top = (
        s.withColumn("wilson_lb", wilson)
        .orderBy(F.col("wilson_lb").desc(), F.col("suppkey").asc())
        .limit(_WILSON_TOPK)
    )
    return top.select(
        "suppkey",
        "n_lines",
        "n_ontime",
        "wilson_lb",
        F.row_number().over(w).cast("long").alias("rank"),
    )


# --- local bridges in the co-purchase graph (round 11) ----------------------
# Granovetter's "weak ties": an edge is a LOCAL BRIDGE when its
# endpoints share NO other neighbor (edge embeddedness / triangle
# support = 0) — removing it lengthens every path between its sides,
# so these are the fragile links a supply/recommendation network
# watches. Support per EDGE is the same wedge count the link-
# prediction family computes for NON-edges — here the canonical pair
# aggregate is SEMI-joined back to the edge set instead (left join;
# support 0 = no wedge row). Output: the top-25 bridges by combined
# endpoint degree (the highest-traffic fragile links), deterministic
# tie-breaks. Engine shape: per-order pair generation, degree-oriented
# 3-way wedge join with packed keys, one left join onto edges, two
# broadcast degree joins, TakeOrderedAndProject.

_BRIDGE_TOPK = 25


@register(
    "part_copurchase_local_bridges",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                  GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
deg AS (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM sym GROUP BY a),
cn AS (
  SELECT n1.a AS u, n2.a AS v, CAST(COUNT(*) AS BIGINT) AS support
  FROM sym n1 JOIN sym n2 ON n1.b = n2.b AND n1.a < n2.a
  GROUP BY n1.a, n2.a),
bridges AS (
  SELECT e.u, e.v, du.deg AS deg_u, dv.deg AS deg_v
  FROM e
  LEFT JOIN cn ON cn.u = e.u AND cn.v = e.v
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v
  WHERE cn.u IS NULL),
ranked AS (
  SELECT u, v, deg_u, deg_v,
         CAST(ROW_NUMBER() OVER (
           ORDER BY deg_u + deg_v DESC, u ASC, v ASC) AS BIGINT) AS rank
  FROM bridges)
SELECT u AS part_key_1, v AS part_key_2, deg_u, deg_v, rank
FROM ranked WHERE rank <= {_BRIDGE_TOPK}
""".strip(),
)
def part_copurchase_local_bridges(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.triangles import _orient

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.to_date("l_shipdate")
            >= F.lit(COPURCHASE_SHIPDATE_LO).cast("date")
        )
        .select("l_orderkey", "l_partkey")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    und = (
        per_order.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .distinct()
        .persist()
    )
    o = _orient(und).persist()
    o.count()

    def pack(x: str, y: str):
        return (
            F.shiftleft(F.col(x).cast("long"), 32) + F.col(y).cast("long")
        ).alias("pk")

    c1 = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.a") == F.col("e2.a"))
        .where(F.col("e1.b") < F.col("e2.b"))
        .select(pack("e1.b", "e2.b"))
    )
    c2 = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            (
                F.shiftleft(F.least("e1.a", "e2.b").cast("long"), 32)
                + F.greatest("e1.a", "e2.b").cast("long")
            ).alias("pk")
        )
    )
    c3 = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.b") == F.col("e2.b"))
        .where(F.col("e1.a") < F.col("e2.a"))
        .select(pack("e1.a", "e2.a"))
    )
    cn = (
        c1.unionAll(c2)
        .unionAll(c3)
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("support"))
        .select(
            F.shiftrightunsigned("pk", 32).cast("long").alias("u"),
            F.col("pk")
            .bitwiseAND(F.lit((1 << 32) - 1))
            .cast("long")
            .alias("v"),
        )
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    du = F.broadcast(
        deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    )
    dv = F.broadcast(
        deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    )
    bridges = (
        und.join(cn, ["u", "v"], "left_anti")
        .join(du, "u")
        .join(dv, "v")
    )
    w = Window.orderBy(
        (F.col("deg_u") + F.col("deg_v")).desc(),
        F.col("u").asc(),
        F.col("v").asc(),
    )
    top = bridges.orderBy(
        (F.col("deg_u") + F.col("deg_v")).desc(),
        F.col("u").asc(),
        F.col("v").asc(),
    ).limit(_BRIDGE_TOPK)
    return top.select(
        F.col("u").alias("part_key_1"),
        F.col("v").alias("part_key_2"),
        "deg_u",
        "deg_v",
        F.row_number().over(w).cast("long").alias("rank"),
    )


# --- one-way ANOVA across market segments (round 11b) ----------------------
# Does mean account balance differ by market segment? The classic
# F = (SSB/(k-1)) / (SSW/(n-k)) from exact integer sufficient
# statistics: per-segment n_g, sum of balance cents s_g, sum of squared
# cents q_g (the brand_discount_elasticity protocol — regression/ANOVA
# as an aggregate). The between-group term is computed CENTERED on the
# grand mean — SSB = Σ_g (s_g - n_g·s/n)² / n_g, the algebraic identity
# for Σ s_g²/n_g - s²/n — so the per-group fixed-point term is
# O(n_g · dev²) instead of O(n_g · mean²): with uncentered terms the
# cross-group sum blows past 2^63 at ~4.6k customers of the fixture's
# [-1000, 10000) balance range (ADVICE r11), while the centered term is
# ~σ²·SCALE ≈ 1e15 per group INDEPENDENT of n (group means converge to
# the grand mean as 1/√n_g). The term is still rounded to a fixed-point
# integer before the cross-group sum (reduction-order independence, the
# events_cramers_v protocol), but accumulated as DECIMAL(38,0) — exact
# and overflow-safe even for adversarial single-valued segments. Shape:
# one hash aggregate over the table, a 1-row broadcast of the totals
# back onto the k(=5) group rows, then a k-row reduction — nothing
# data-sized past the first agg.

_ANOVA_SCALE = 10_000  # fixed-point for the centered per-group terms


@register(
    "segment_balance_anova",
    oracle=f"""
WITH g AS (
  SELECT c_mktsegment AS segment,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s_g,
         CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
                  * CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS q_g
  FROM customer GROUP BY 1),
t0 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS BIGINT) AS s,
         CAST(SUM(q_g) AS BIGINT) AS q
  FROM g),
d AS (
  SELECT t0.k, t0.n, t0.s, t0.q, g.n_g,
         CAST(g.s_g AS DOUBLE)
           - CAST(g.n_g AS DOUBLE)
             * (CAST(t0.s AS DOUBLE) / CAST(t0.n AS DOUBLE)) AS dev
  FROM g CROSS JOIN t0),
t AS (
  SELECT k, n, s, q,
         SUM(CAST(ROUND(dev * dev / CAST(n_g AS DOUBLE)
                        * {_ANOVA_SCALE}) AS DECIMAL(38,0))) AS tg_scaled
  FROM d GROUP BY 1, 2, 3, 4)
SELECT k, n,
       CAST(tg_scaled AS DOUBLE) / {_ANOVA_SCALE} AS ssb,
       CAST(q AS DOUBLE)
         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
         - CAST(tg_scaled AS DOUBLE) / {_ANOVA_SCALE} AS ssw,
       ((CAST(tg_scaled AS DOUBLE) / {_ANOVA_SCALE})
        / (CAST(k AS DOUBLE) - 1.0))
       / ((CAST(q AS DOUBLE)
           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
           - CAST(tg_scaled AS DOUBLE) / {_ANOVA_SCALE})
          / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) AS f_stat
FROM t
""".strip(),
)
def segment_balance_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    g = cust.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(cents).cast("long").alias("s_g"),
        F.sum(cents * cents).cast("long").alias("q_g"),
    )
    t0 = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
        F.sum("q_g").cast("long").alias("q"),
    )
    dev = F.col("s_g").cast("double") - F.col("n_g").cast("double") * (
        F.col("s").cast("double") / F.col("n").cast("double")
    )
    term = F.round(
        dev * dev / F.col("n_g").cast("double") * _ANOVA_SCALE
    ).cast("decimal(38,0)")
    t = (
        g.crossJoin(F.broadcast(t0))
        .groupBy("k", "n", "s", "q")
        .agg(F.sum(term).alias("tg_scaled"))
    )
    tgd = F.col("tg_scaled").cast("double") / F.lit(float(_ANOVA_SCALE))
    sd = F.col("s").cast("double")
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    qd = F.col("q").cast("double")
    # No ROUND on the outputs: every input is an exact integer, so the
    # shared expression tree of correctly-rounded IEEE ops is bitwise
    # identical in both engines — ROUND(x, 4) at ~1e11 magnitude is NOT
    # (it straddles the double ULP and the engines tie-break apart).
    ssb = tgd
    ssw = qd - sd * sd / nd - tgd
    f_stat = (ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))
    return t.select(
        "k",
        "n",
        ssb.alias("ssb"),
        ssw.alias("ssw"),
        f_stat.alias("f_stat"),
    )


# --- Atkinson inequality index per nation (round 11b) -----------------------
# The welfare-theoretic companion to customer_revenue_gini: Atkinson
# A(eps=1/2) = 1 - (mean sqrt(y))^2 / mean(y) over per-customer revenue
# y >= 0 (customers without orders count as y = 0 — same population as
# the Gini). Protocol: sqrt is the ONE correctly-rounded transcendental
# both engines share, and FLOOR(SQRT(cents * 1e4)) pins each row to an
# exact integer (the corpus_apportion_budget wt protocol), so both
# partial sums cross the engines as exact BIGINTs; the emitted index is
# a fixed final expression on two exact sums. Shape: one fact-sized
# aggregate (orders), a broadcast-sized customer left join, one
# nation-level reduce.

_ATKINSON_SQRT_SCALE = 10_000  # cents * 1e4 under the sqrt => 2 extra digits


@register(
    "customer_atkinson_inequality",
    oracle=f"""
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey),
y AS (
  SELECT c.c_nationkey AS nationkey,
         COALESCE(r.cents, 0) AS cents,
         CAST(FLOOR(SQRT(CAST(COALESCE(r.cents, 0) AS DOUBLE)
                         * {_ATKINSON_SQRT_SCALE})) AS BIGINT) AS s_i
  FROM customer c LEFT JOIN rev r ON r.o_custkey = c.c_custkey),
n AS (
  SELECT nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS revenue_cents,
         CAST(SUM(s_i) AS BIGINT) AS sqrt_sum
  FROM y GROUP BY nationkey)
SELECT nationkey, n_customers, revenue_cents, sqrt_sum,
       ROUND(1.0 - (CAST(sqrt_sum AS DOUBLE) * CAST(sqrt_sum AS DOUBLE))
                   / (CAST(n_customers AS DOUBLE)
                      * CAST(revenue_cents AS DOUBLE)
                      * {_ATKINSON_SQRT_SCALE}), 6) AS atkinson
FROM n
""".strip(),
)
def customer_atkinson_inequality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("nationkey")
    )
    cents = F.coalesce(F.col("cents"), F.lit(0).cast("long"))
    y = cust.join(rev, cust.c_custkey == rev.o_custkey, "left").select(
        "nationkey",
        cents.alias("cents"),
        F.floor(
            F.sqrt(cents.cast("double") * _ATKINSON_SQRT_SCALE)
        )
        .cast("long")
        .alias("s_i"),
    )
    n = y.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("revenue_cents"),
        F.sum("s_i").cast("long").alias("sqrt_sum"),
    )
    atk = F.lit(1.0) - (
        F.col("sqrt_sum").cast("double") * F.col("sqrt_sum").cast("double")
    ) / (
        F.col("n_customers").cast("double")
        * F.col("revenue_cents").cast("double")
        * F.lit(float(_ATKINSON_SQRT_SCALE))
    )
    return n.select(
        "nationkey",
        "n_customers",
        "revenue_cents",
        "sqrt_sum",
        F.round(atk, 6).alias("atkinson"),
    )


# --- t-closeness audit over the k-anonymity classes (round 11b) -------------
# Completes the privacy triad (customer_k_anonymity,
# customer_l_diversity): a quasi-identifier class leaks when the
# DISTRIBUTION of its sensitive attribute strays from the global one.
# For an ORDERED sensitive attribute (the acctbal band), t-closeness
# measures that with the Earth Mover's Distance, which collapses to a
# cumulative-sum identity: EMD = (1/(m-1)) * sum_b |P_cum(b) - Q_cum(b)|.
# Cross-engine protocol: the numerator sum_b |cum_c*n_total -
# cum_g*n_class| is EXACT BIGINT (both cumulatives are integer counts;
# the final band's term is identically 0 so summing all m bands equals
# the textbook m-1 form); t is ONE division on exact integers. Shape:
# one customer-sized aggregate, then everything is (classes x bands) =
# dimension-sized — the band domain broadcasts, the per-class
# cumulative window partitions on the class key. 2^63 envelope:
# cum_c*n_total <= n_class*n_total ~ 1.8e18 at sf1000 (documented).

_TCLOSE_T = 0.15  # flag threshold


@register(
    "customer_t_closeness",
    oracle=f"""
WITH c AS (
  SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band
  FROM customer),
cb AS (
  SELECT nationkey, segment, bal_band, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM c GROUP BY 1, 2, 3),
gb AS (
  SELECT bal_band, CAST(COUNT(*) AS BIGINT) AS gcnt
  FROM c GROUP BY 1),
tot AS (
  SELECT CAST(SUM(gcnt) AS BIGINT) AS n_total,
         CAST(COUNT(*) AS BIGINT) AS m_bands
  FROM gb),
cls AS (
  SELECT nationkey, segment, CAST(SUM(cnt) AS BIGINT) AS n_class
  FROM cb GROUP BY 1, 2),
dense AS (
  SELECT cls.nationkey, cls.segment, cls.n_class,
         gb.bal_band, gb.gcnt, COALESCE(cb.cnt, 0) AS cnt
  FROM cls CROSS JOIN gb
  LEFT JOIN cb ON cb.nationkey = cls.nationkey
             AND cb.segment = cls.segment
             AND cb.bal_band = gb.bal_band),
cum AS (
  SELECT nationkey, segment, n_class, bal_band,
         CAST(SUM(cnt) OVER (PARTITION BY nationkey, segment
                             ORDER BY bal_band) AS BIGINT) AS cum_c,
         CAST(SUM(gcnt) OVER (PARTITION BY nationkey, segment
                              ORDER BY bal_band) AS BIGINT) AS cum_g
  FROM dense),
emd AS (
  SELECT nationkey, segment, n_class,
         CAST(SUM(ABS(cum_c * (SELECT n_total FROM tot)
                      - cum_g * n_class)) AS BIGINT) AS emd_num
  FROM cum GROUP BY 1, 2, 3)
SELECT e.nationkey, e.segment, e.n_class, e.emd_num,
       ROUND(CAST(e.emd_num AS DOUBLE)
             / (CAST(e.n_class AS DOUBLE) * CAST(t.n_total AS DOUBLE)
                * (CAST(t.m_bands AS DOUBLE) - 1.0)), 6) AS t_dist,
       CAST(e.emd_num AS DOUBLE)
         / (CAST(e.n_class AS DOUBLE) * CAST(t.n_total AS DOUBLE)
            * (CAST(t.m_bands AS DOUBLE) - 1.0)) > {_TCLOSE_T}
         AS above_t
FROM emd e CROSS JOIN tot t
""".strip(),
)
def customer_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0))
        .cast("long")
        .alias("bal_band"),
    )
    cb = c.groupBy("nationkey", "segment", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    gb = c.groupBy("bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("gcnt")
    )
    tot = gb.agg(
        F.sum("gcnt").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("m_bands"),
    )
    cls = cb.groupBy("nationkey", "segment").agg(
        F.sum("cnt").cast("long").alias("n_class")
    )
    dense = (
        cls.crossJoin(F.broadcast(gb))
        .join(cb, ["nationkey", "segment", "bal_band"], "left")
        .select(
            "nationkey",
            "segment",
            "n_class",
            "bal_band",
            "gcnt",
            F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt"),
        )
    )
    w = Window.partitionBy("nationkey", "segment").orderBy("bal_band")
    cum = dense.select(
        "nationkey",
        "segment",
        "n_class",
        F.sum("cnt").over(w).cast("long").alias("cum_c"),
        F.sum("gcnt").over(w).cast("long").alias("cum_g"),
    )
    emd = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("nationkey", "segment", "n_class", "n_total", "m_bands")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_c") * F.col("n_total")
                    - F.col("cum_g") * F.col("n_class")
                )
            )
            .cast("long")
            .alias("emd_num")
        )
    )
    t_dist = F.col("emd_num").cast("double") / (
        F.col("n_class").cast("double")
        * F.col("n_total").cast("double")
        * (F.col("m_bands").cast("double") - F.lit(1.0))
    )
    return emd.select(
        "nationkey",
        "segment",
        "n_class",
        "emd_num",
        F.round(t_dist, 6).alias("t_dist"),
        (t_dist > F.lit(_TCLOSE_T)).alias("above_t"),
    )


# --- grid-probed nearest neighbor (round 11b) --------------------------------
# The 1-NN companion to customer_geo_grid_pairs: for every point, the
# nearest OTHER point within its 3x3 cell neighborhood (points whose
# neighborhood is empty emit no row — the documented semantics that
# keeps the query deterministic without a global fallback scan). Same
# candidates-then-verify shape as the radius query: the probe side
# explodes 9 cell offsets, candidates meet through the (cell) hash
# join, the per-point argmin is an in-group min over a struct ordered
# by (dist2, neighbor key) — exact integers end to end, ties broken to
# the smaller key. Candidate volume is O(n * density); never O(n^2).

@register(
    "customer_geo_nn_grid",
    oracle=f"""
WITH h AS (
  SELECT c_custkey, (c_custkey * 48271) % 2147483647 AS hv FROM customer),
m AS (
  SELECT c_custkey, (hv % 100003) * (hv // 100003 + 7) AS mv FROM h),
sp AS (
  SELECT CAST({_GEO_SPAN} * CEIL(SQRT(COUNT(*) / {_GEO_N_BASE}.0))
              AS BIGINT) AS span
  FROM customer),
pts AS (
  SELECT c_custkey, mv % sp.span AS lat,
         (mv // sp.span) % sp.span AS lon
  FROM m, sp),
cells AS (
  SELECT c_custkey, lat, lon,
         lat - lat % {_GEO_R} AS cl, lon - lon % {_GEO_R} AS co
  FROM pts),
cand AS (
  SELECT a.c_custkey AS custkey, b.c_custkey AS nn_custkey,
         CAST((a.lat - b.lat) * (a.lat - b.lat)
              + (a.lon - b.lon) * (a.lon - b.lon) AS BIGINT) AS dist2
  FROM cells a JOIN cells b
    ON b.cl IN (a.cl - {_GEO_R}, a.cl, a.cl + {_GEO_R})
   AND b.co IN (a.co - {_GEO_R}, a.co, a.co + {_GEO_R})
   AND a.c_custkey <> b.c_custkey),
ranked AS (
  SELECT custkey, nn_custkey, dist2,
         ROW_NUMBER() OVER (PARTITION BY custkey
                            ORDER BY dist2 ASC, nn_custkey ASC) AS rn
  FROM cand)
SELECT custkey, nn_custkey, dist2 FROM ranked WHERE rn = 1
""".strip(),
)
def customer_geo_nn_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _geo_pts(spark, sf_dir)
    cells = pts.select(
        "*",
        (F.col("lat") - F.col("lat") % _GEO_R).alias("cl"),
        (F.col("lon") - F.col("lon") % _GEO_R).alias("co"),
    )
    offs = spark.range(9).select(
        (F.col("id") % 3 - 1).alias("dx"),
        (F.col("id") - F.col("id") % 3).cast("long").alias("_t"),
    ).select("dx", (F.col("_t") / 3 - 1).cast("long").alias("dy"))
    probes = cells.crossJoin(F.broadcast(offs)).select(
        F.col("c_custkey").alias("custkey"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        (F.col("cl") + F.col("dx") * _GEO_R).alias("cl"),
        (F.col("co") + F.col("dy") * _GEO_R).alias("co"),
    )
    base = cells.select(
        F.col("c_custkey").alias("nn_custkey"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        "cl",
        "co",
    )
    dlat = F.col("lat_a") - F.col("lat_b")
    dlon = F.col("lon_a") - F.col("lon_b")
    dist2 = (dlat * dlat + dlon * dlon).cast("long")
    cand = (
        probes.join(base, ["cl", "co"])
        .where(F.col("custkey") != F.col("nn_custkey"))
        .select("custkey", "nn_custkey", dist2.alias("dist2"))
    )
    best = cand.groupBy("custkey").agg(
        F.min(F.struct("dist2", "nn_custkey")).alias("b")
    )
    return best.select(
        "custkey",
        F.col("b.nn_custkey").alias("nn_custkey"),
        F.col("b.dist2").alias("dist2"),
    )


# --- small-files compaction planner (round 11b) ------------------------------
# The 100 TB housekeeping query: lineitem's natural ship-date
# partitions are tiny at the tail, and a table with millions of small
# files starves the scheduler. The planner estimates per-partition
# bytes (rows x est. row width), walks partitions in date order, and
# assigns each to a compaction bin by FIXED CUMULATIVE BOUNDARIES:
# bin = floor(exclusive-prefix-bytes / target). Deterministic,
# engine-identical (pure integer arithmetic on an exact running sum),
# and single-pass — the same greedy a Delta/Iceberg OPTIMIZE planner
# runs. A partition larger than the target gets its own bin(s) by the
# same rule (documented: bins can overflow by at most one partition —
# boundaries, not best-fit, is what makes the plan reproducible and
# shardable). The running sum is a calendar-sized window (one row per
# ship date), not fact-sized.

_COMPACT_TARGET_BYTES = 1_000_000  # compaction bin target
_COMPACT_ROW_BYTES = 128  # estimated on-disk bytes per lineitem row


@register(
    "lineitem_compaction_plan",
    oracle=f"""
WITH p AS (
  SELECT CAST(l_shipdate AS DATE) AS ship_date,
         CAST(COUNT(*) * {_COMPACT_ROW_BYTES} AS BIGINT) AS est_bytes
  FROM lineitem GROUP BY 1),
c AS (
  SELECT ship_date, est_bytes,
         CAST(COALESCE(SUM(est_bytes) OVER (
           ORDER BY ship_date
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS prefix_bytes
  FROM p)
SELECT CAST(prefix_bytes // {_COMPACT_TARGET_BYTES} AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_partitions,
       CAST(SUM(est_bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(ship_date) AS DATE) AS from_date,
       CAST(MAX(ship_date) AS DATE) AS to_date
FROM c GROUP BY 1
""".strip(),
)
def lineitem_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_running_sum

    p = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.to_date("l_shipdate").alias("ship_date"))
        .agg(
            (F.count(F.lit(1)) * _COMPACT_ROW_BYTES)
            .cast("long")
            .alias("est_bytes")
        )
    )
    # exclusive prefix = inclusive running sum - own bytes, through the
    # range-partitioned running-sum operator (a bare global window
    # would plan Exchange SinglePartition — the plan-gate's one
    # forbidden shape, even on a calendar-sized input).
    c = with_global_running_sum(
        p, [F.col("ship_date").asc()], "est_bytes", "incl_bytes"
    ).select(
        "ship_date",
        "est_bytes",
        (F.col("incl_bytes") - F.col("est_bytes"))
        .cast("long")
        .alias("prefix_bytes"),
    )
    return (
        c.groupBy(
            F.floor(F.col("prefix_bytes") / _COMPACT_TARGET_BYTES)
            .cast("long")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_partitions"),
            F.sum("est_bytes").cast("long").alias("total_bytes"),
            F.min("ship_date").alias("from_date"),
            F.max("ship_date").alias("to_date"),
        )
    )


# --- deterministic KMV distinct sketch (round 11b) ---------------------------
# The k-minimum-values cardinality sketch in the FULL VALUE ORACLE
# tier: unlike HLL (approx_distinct_users stays rows-only — Spark's
# HLL++ register layout isn't reproducible in DuckDB), KMV built on
# md5 is bit-deterministic in BOTH engines, so the ESTIMATE itself is
# value-checked. Per event type: hash each distinct user into 32 bits
# (first 8 md5 hex digits — the strpos-hex protocol widened from 16
# to 32 bits), keep the k smallest, and estimate distinct = (k-1) *
# 2^32 / h_(k) (FLOOR of one correctly-rounded division on exactly-
# representable operands — both engines agree bit-for-bit). Types
# with fewer than k distinct users report the sketch's exact count
# (the KMV convention: a non-full sketch IS exact). The ranking
# window partitions per type; a production sketch would fold the
# per-partition k-minima with a merge agg, which changes the plan but
# not the protocol.

_KMV_K = 64


@register(
    "events_kmv_distinct",
    oracle=f"""
WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events),
h AS (
  SELECT event_type, user_id,
         CAST({_kmv_hex_sql("CAST(user_id AS VARCHAR)")} AS BIGINT) AS hv
  FROM du),
r AS (
  SELECT event_type, hv,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY hv ASC, user_id ASC) AS rn
  FROM h),
c AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM du GROUP BY event_type),
kth AS (
  SELECT event_type, CAST(hv AS BIGINT) AS kth_hash
  FROM r WHERE rn = {_KMV_K})
SELECT c.event_type, c.n_exact,
       CAST(COALESCE(kth.kth_hash, 0) AS BIGINT) AS kth_hash,
       CAST(CASE WHEN kth.kth_hash IS NULL THEN c.n_exact
            ELSE FLOOR(({_KMV_K} - 1) * 4294967296.0
                       / GREATEST(kth.kth_hash, 1))
            END AS BIGINT) AS kmv_est,
       CAST(CASE WHEN kth.kth_hash IS NULL THEN 0
            ELSE CAST(FLOOR(({_KMV_K} - 1) * 4294967296.0
                            / GREATEST(kth.kth_hash, 1)) AS BIGINT)
                 - c.n_exact
            END AS BIGINT) AS est_minus_exact
FROM c LEFT JOIN kth ON kth.event_type = c.event_type
""".strip(),
)
def events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    du = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    h = du.select("event_type", "user_id", hv.alias("hv"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("hv").asc(), F.col("user_id").asc()
    )
    kth = (
        h.select("event_type", "hv", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == _KMV_K)
        .select("event_type", F.col("hv").alias("kth_hash"))
    )
    c = du.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    est_full = F.floor(
        F.lit((_KMV_K - 1) * 4294967296.0)
        / F.greatest(F.col("kth_hash"), F.lit(1)).cast("double")
    ).cast("long")
    j = c.join(F.broadcast(kth), "event_type", "left")
    return j.select(
        "event_type",
        "n_exact",
        F.coalesce(F.col("kth_hash"), F.lit(0)).cast("long").alias("kth_hash"),
        F.when(F.col("kth_hash").isNull(), F.col("n_exact"))
        .otherwise(est_full)
        .cast("long")
        .alias("kmv_est"),
        F.when(F.col("kth_hash").isNull(), F.lit(0).cast("long"))
        .otherwise(est_full - F.col("n_exact"))
        .cast("long")
        .alias("est_minus_exact"),
    )


# --- gaps & islands: consecutive-month order streaks (round 11b) ------------
# The classic retention shape the registry still lacked as a PER-KEY
# islands query: for each customer, group their distinct active months
# into maximal runs of CONSECUTIVE months (island id = month_index -
# dense_rank, the standard gaps-and-islands identity — constant within
# a run, strictly different across gaps), then report months active,
# number of streaks, and the longest streak. All integers; both
# windows and both aggregates partition on c_custkey — embarrassingly
# parallel across customers, nothing global anywhere.

@register(
    "customer_order_streaks",
    oracle="""
WITH m AS (
  SELECT DISTINCT o_custkey,
         CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) * 12
              + EXTRACT(MONTH FROM CAST(o_orderdate AS DATE)) - 1
              AS BIGINT) AS midx
  FROM orders),
isl AS (
  SELECT o_custkey, midx,
         midx - DENSE_RANK() OVER (PARTITION BY o_custkey
                                   ORDER BY midx ASC) AS island
  FROM m),
runs AS (
  SELECT o_custkey, island, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM isl GROUP BY 1, 2)
SELECT o_custkey AS custkey,
       CAST(SUM(run_len) AS BIGINT) AS n_active_months,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(run_len) AS BIGINT) AS longest_streak
FROM runs GROUP BY o_custkey
""".strip(),
)
def customer_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    m = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            (
                F.year(F.to_date("o_orderdate")) * 12
                + F.month(F.to_date("o_orderdate"))
                - 1
            )
            .cast("long")
            .alias("midx"),
        )
        .distinct()
    )
    w = Window.partitionBy("o_custkey").orderBy(F.col("midx").asc())
    isl = m.select(
        "o_custkey",
        "midx",
        (F.col("midx") - F.dense_rank().over(w)).alias("island"),
    )
    runs = isl.groupBy("o_custkey", "island").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    return runs.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum("run_len").cast("long").alias("n_active_months"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("run_len").cast("long").alias("longest_streak"),
    )


# --- recursive CTE surface: hierarchy walk (round 11b) ----------------------
# Spark 4.1's WITH RECURSIVE, exercised on a synthetic reporting
# hierarchy derived from the customer key (parent = custkey div 10,
# roots = keys 0..9 — a stable ~log10(n)-deep tree over any key
# universe): each customer's depth and root are computed by the
# engine's own recursive-union iteration, then rolled up per depth.
# The oracle runs the IDENTICAL recursive SQL in DuckDB — the one
# construct where both engines' iterative fixpoint semantics are
# compared head-on (recursive_date_spine covers the sequence()
# rewrite; THIS one exercises the native recursion). Depth is bounded
# by key magnitude (6 levels at sf1), so the recursion is
# log-bounded however large the table.

_RECURSIVE_HIERARCHY_SQL = """
WITH RECURSIVE chain(custkey, root, depth) AS (
  SELECT c_custkey, c_custkey, 0{zero_suffix}
  FROM {cust} WHERE c_custkey <= 9
  UNION ALL
  SELECT c.c_custkey, chain.root, chain.depth + 1
  FROM {cust} c JOIN chain ON c.c_custkey {div} 10 = chain.custkey
  WHERE c.c_custkey > 9)
SELECT depth,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
       CAST(MIN(custkey) AS BIGINT) AS min_key,
       CAST(MAX(custkey) AS BIGINT) AS max_key
FROM chain GROUP BY depth
""".strip()


@register(
    "sql_recursive_hierarchy",
    oracle=_RECURSIVE_HIERARCHY_SQL.format(
        cust="customer", div="//", zero_suffix=""
    ),
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_customer_rec"
    )
    return spark.sql(
        _RECURSIVE_HIERARCHY_SQL.format(
            cust="v_customer_rec", div="div", zero_suffix="L"
        )
    )


# --- survival analysis: Nelson-Aalen cumulative hazard (round 11b) ----------
# "How long until the customer orders again?" answered the survival-
# analysis way — a genuinely new family for the registry. Events are
# the inter-purchase gaps (in days); at each observed gap length t the
# hazard increment is d_t / n_t (deaths over the at-risk set = gaps
# still >= t), and Nelson-Aalen sums them: H(t) = sum_{s<=t} d_s/n_s.
# Kaplan-Meier's PRODUCT limit needs exp/ln to distribute, so the
# estimator that crosses engines exactly is the additive N-A with the
# d_t*1e9 div n_t integer-scaled terms (markov protocol). Everything
# past the per-customer LAG is DIMENSION-SIZED (one row per distinct
# gap length — calendar-bounded); both running sums go through the
# range-partitioned running-sum operator, never a bare global window.

_NA_SCALE = 1_000_000_000


@register(
    "interpurchase_hazard_na",
    oracle=f"""
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
gaps AS (
  SELECT CAST(date_diff('day',
              LAG(d) OVER (PARTITION BY o_custkey ORDER BY d, o_custkey),
              d) AS BIGINT) AS t
  FROM o),
g AS (SELECT t FROM gaps WHERE t IS NOT NULL),
dd AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS d_t FROM g GROUP BY t),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g),
r AS (
  SELECT t, d_t,
         CAST((SELECT n FROM tot)
              - COALESCE(SUM(d_t) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_risk
  FROM dd),
h AS (
  SELECT t, d_t, n_risk,
         CAST(d_t * {_NA_SCALE} // n_risk AS BIGINT) AS hazard_scaled
  FROM r)
SELECT t AS gap_days, d_t, n_risk, hazard_scaled,
       CAST(SUM(hazard_scaled) OVER (ORDER BY t) AS BIGINT)
         AS cumhaz_scaled
FROM h
""".strip(),
)
def interpurchase_hazard_na(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_running_sum

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d")
    )
    w = Window.partitionBy("o_custkey").orderBy("d")
    g = orders.select(
        F.datediff(F.col("d"), F.lag("d").over(w)).cast("long").alias("t")
    ).where(F.col("t").isNotNull())
    dd = g.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("d_t"))
    r = with_global_running_sum(
        dd, [F.col("t").asc()], "d_t", "cum_d", total_col="n"
    ).select(
        "t",
        "d_t",
        (F.col("n") - (F.col("cum_d") - F.col("d_t")))
        .cast("long")
        .alias("n_risk"),
    )
    h = r.select(
        "t",
        "d_t",
        "n_risk",
        F.expr(f"(d_t * {_NA_SCALE}) div n_risk")
        .cast("long")
        .alias("hazard_scaled"),
    )
    out = with_global_running_sum(
        h, [F.col("t").asc()], "hazard_scaled", "cumhaz_scaled"
    )
    return out.select(
        F.col("t").alias("gap_days"),
        "d_t",
        "n_risk",
        "hazard_scaled",
        F.col("cumhaz_scaled").cast("long").alias("cumhaz_scaled"),
    )


# --- 4-cycle (square) census on the co-purchase graph (round 11b) -----------
# The motif one step past triangles: C4 counts come free from the
# link-prediction machinery because every 4-cycle u-a-v-b is exactly a
# PAIR of common neighbors {a, b} of its diagonal {u, v} — so
# squares = (1/2) * sum over pairs of C(n_common, 2), each cycle
# counted once per diagonal. The wedge table is the degree-oriented
# one (part_link_prediction_cn's three bounded branches, packed-key
# shuffle); the census itself is one aggregate on top — no new join.
# The grand total is provably even before the final halving (each
# square contributes 2), so everything stays exact BIGINT.

@register(
    "part_copurchase_squares",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                  GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
cn AS (
  SELECT n1.a AS u, n2.a AS v, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM sym n1 JOIN sym n2 ON n1.b = n2.b AND n1.a < n2.a
  GROUP BY n1.a, n2.a)
SELECT CAST(COUNT(*) FILTER (WHERE n_common >= 2) AS BIGINT)
         AS n_diagonals,
       CAST(SUM(n_common * (n_common - 1) // 2) // 2 AS BIGINT)
         AS n_squares,
       CAST(MAX(n_common) AS BIGINT) AS max_common
FROM cn
""".strip(),
)
def part_copurchase_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.triangles import _orient

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.to_date("l_shipdate")
            >= F.lit(COPURCHASE_SHIPDATE_LO).cast("date")
        )
        .select("l_orderkey", "l_partkey")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    und = (
        per_order.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .distinct()
    )
    o = _orient(und).persist()
    o.count()  # materialize once: feeds three join branches

    def pack(x: str, y: str):
        return (
            F.shiftleft(F.col(x).cast("long"), 32) + F.col(y).cast("long")
        ).alias("pk")

    c1 = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.a") == F.col("e2.a"))
        .where(F.col("e1.b") < F.col("e2.b"))
        .select(pack("e1.b", "e2.b"))
    )
    c2 = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            (
                F.shiftleft(F.least("e1.a", "e2.b").cast("long"), 32)
                + F.greatest("e1.a", "e2.b").cast("long")
            ).alias("pk")
        )
    )
    c3 = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.b") == F.col("e2.b"))
        .where(F.col("e1.a") < F.col("e2.a"))
        .select(pack("e1.a", "e2.a"))
    )
    cn = (
        c1.unionAll(c2)
        .unionAll(c3)
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return cn.agg(
        F.sum(F.when(F.col("n_common") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_diagonals"),
        F.expr(
            "CAST(sum((n_common * (n_common - 1)) div 2) div 2 AS BIGINT)"
        ).alias("n_squares"),
        F.max("n_common").cast("long").alias("max_common"),
    )


# --- point-in-time churn labels (round 11b) ----------------------------------
# The leakage-safe LABEL GENERATOR a churn model trains on: at each
# quarterly as-of date d, a customer is ELIGIBLE if they ordered in
# the 180 days BEFORE d (features may only look left) and CHURNED if
# they have no order in the 90 days FROM d (the label looks right) —
# the point-in-time discipline that keeps training data causal, as a
# query. The quarter spine is dimension-sized and broadcasts; the
# spine fan-out (|quarters| ≈ 28 whatever the SF) is the documented
# cost, collapsed immediately by the (customer, quarter) flag
# aggregate. Counts are exact; the rate is one correctly-rounded
# division (emitted unrounded — the stable.py rationale).

_CHURN_LOOKBACK_DAYS = 180
_CHURN_HORIZON_DAYS = 90


@register(
    "churn_labels_pit",
    oracle=f"""
WITH od AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
spine AS (
  SELECT DISTINCT CAST(date_trunc('quarter', d) AS DATE) AS asof_d FROM od
  WHERE CAST(date_trunc('quarter', d) AS DATE) + {_CHURN_HORIZON_DAYS}
          <= (SELECT MAX(d) FROM od)),
fl AS (
  SELECT od.o_custkey, s.asof_d,
         MAX(CASE WHEN od.d >= s.asof_d - {_CHURN_LOOKBACK_DAYS}
                   AND od.d < s.asof_d THEN 1 ELSE 0 END) AS before_w,
         MAX(CASE WHEN od.d >= s.asof_d
                   AND od.d < s.asof_d + {_CHURN_HORIZON_DAYS}
                  THEN 1 ELSE 0 END) AS after_w
  FROM od CROSS JOIN spine s
  GROUP BY 1, 2)
SELECT asof_d AS asof_date,
       CAST(SUM(before_w) AS BIGINT) AS n_eligible,
       CAST(SUM(CASE WHEN before_w = 1 AND after_w = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       CAST(SUM(CASE WHEN before_w = 1 AND after_w = 0
                THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(SUM(before_w) AS DOUBLE) AS churn_rate
FROM fl GROUP BY asof_d HAVING SUM(before_w) > 0
""".strip(),
)
def churn_labels_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d")
    )
    # Right-censoring guard (ADVICE r11): a spine quarter whose 90-day
    # label horizon extends past max(o_orderdate) would label every
    # still-active customer churned — drop it from the spine so the
    # emitted labels are unbiased at the series tail.
    mx = od.agg(F.max("d").alias("max_d"))
    spine = (
        od.select(
            F.to_date(F.date_trunc("quarter", F.col("d"))).alias("asof_d")
        )
        .distinct()
        .crossJoin(F.broadcast(mx))
        .where(
            F.date_add("asof_d", _CHURN_HORIZON_DAYS) <= F.col("max_d")
        )
        .select("asof_d")
    )
    j = od.crossJoin(F.broadcast(spine))
    fl = j.groupBy("o_custkey", "asof_d").agg(
        F.max(
            F.when(
                (F.col("d") >= F.date_sub("asof_d", _CHURN_LOOKBACK_DAYS))
                & (F.col("d") < F.col("asof_d")),
                1,
            ).otherwise(0)
        ).alias("before_w"),
        F.max(
            F.when(
                (F.col("d") >= F.col("asof_d"))
                & (F.col("d") < F.date_add("asof_d", _CHURN_HORIZON_DAYS)),
                1,
            ).otherwise(0)
        ).alias("after_w"),
    )
    churned = F.when(
        (F.col("before_w") == 1) & (F.col("after_w") == 0), 1
    ).otherwise(0)
    out = fl.groupBy(F.col("asof_d").alias("asof_date")).agg(
        F.sum("before_w").cast("long").alias("n_eligible"),
        F.sum(churned).cast("long").alias("n_churned"),
        (
            F.sum(churned).cast("double")
            / F.sum("before_w").cast("double")
        ).alias("churn_rate"),
    )
    return out.where(F.col("n_eligible") > 0)


# --- capacity-planning queue via the Lindley reflection (round 11b) ---------
# "If fulfillment can ship C orders a day, how deep does the queue
# get?" is the Lindley recursion q_t = max(0, q_{t-1} + net_t) — the
# textbook example of a computation that LOOKS inherently sequential.
# Its closed form q_t = cum_t - min(0, min_{s<=t} cum_s) (the
# reflected-walk identity) turns the whole simulation into TWO prefix
# aggregates — a running sum and a running min — both of which run on
# the range-partitioned rank machinery, so the "sequential" simulation
# is embarrassingly parallel at any scale. Capacity is pinned to the
# deterministic floor(total/n_days) so the queue hovers near zero and
# both clamp branches are exercised. Exact integers end to end; the
# per-day recursion equivalence is pinned in pytest by replaying the
# naive sequential recurrence.

@register(
    "orders_queue_lindley",
    oracle="""
WITH arr AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS arrivals
  FROM orders GROUP BY 1),
cap AS (
  SELECT CAST(SUM(arrivals) // COUNT(*) AS BIGINT) AS c FROM arr),
net AS (
  SELECT day, arrivals,
         arrivals - (SELECT c FROM cap) AS net_flow
  FROM arr),
cum AS (
  SELECT day, arrivals, net_flow,
         CAST(SUM(net_flow) OVER (ORDER BY day) AS BIGINT) AS cum_net
  FROM net),
rm AS (
  SELECT day, arrivals, net_flow, cum_net,
         CAST(MIN(cum_net) OVER (ORDER BY day) AS BIGINT) AS run_min
  FROM cum)
SELECT day, arrivals, net_flow,
       CAST(cum_net - LEAST(0, run_min) AS BIGINT) AS queue_len
FROM rm
""".strip(),
)
def orders_queue_lindley(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import (
        with_global_exclusive_running_max,
        with_global_running_sum,
    )

    arr = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("arrivals"))
    )
    cap = arr.agg(
        F.expr("CAST(sum(arrivals) div count(*) AS BIGINT)").alias("c")
    )
    net = arr.crossJoin(F.broadcast(cap)).select(
        "day",
        "arrivals",
        (F.col("arrivals") - F.col("c")).cast("long").alias("net_flow"),
    )
    cum = with_global_running_sum(
        net, [F.col("day").asc()], "net_flow", "cum_net"
    )
    # inclusive running MIN = -(exclusive running max of the negation),
    # folded with the row's own value
    neg = cum.withColumn("neg_cum", (-F.col("cum_net")).cast("long"))
    rm = with_global_exclusive_running_max(
        neg, [F.col("day").asc()], "neg_cum", "neg_max_excl"
    ).select(
        "day",
        "arrivals",
        "net_flow",
        "cum_net",
        F.least(
            F.col("cum_net"),
            F.coalesce(-F.col("neg_max_excl"), F.col("cum_net")),
        )
        .cast("long")
        .alias("run_min"),
    )
    return rm.select(
        "day",
        "arrivals",
        "net_flow",
        (
            F.col("cum_net") - F.least(F.lit(0).cast("long"), F.col("run_min"))
        )
        .cast("long")
        .alias("queue_len"),
    )


# --- A/B assignment sample-ratio-mismatch check (round 11b) ------------------
# The guardrail every experimentation platform runs before reading a
# test: does the md5-parity assignment actually split 50/50? SRM chi²
# with one degree of freedom = (n0 - n1)² / (n0 + n1) — exact integer
# numerator/denominator, one correctly-rounded division; the flag
# applies the 0.05 critical value (3.841). Uses the same strpos-hex
# md5 protocol as every other deterministic assignment in the repo, so
# the check is reproducible anywhere the data lands.

@register(
    "customer_ab_srm_check",
    oracle="""
WITH a AS (
  SELECT CASE WHEN ((strpos('0123456789abcdef',
              substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)) - 1) % 2) = 0
         THEN 0 ELSE 1 END AS arm
  FROM customer),
c AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(arm) AS BIGINT) AS n1
  FROM a)
SELECT n0, n1,
       CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
         / CAST(n0 + n1 AS DOUBLE) AS chi2,
       CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
         / CAST(n0 + n1 AS DOUBLE) > 3.841 AS srm_detected
FROM c
""".strip(),
)
def customer_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    arm = F.when(
        (
            F.conv(
                F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1),
                16,
                10,
            ).cast("long")
            % 2
        )
        == 0,
        0,
    ).otherwise(1)
    c = (
        load_table(spark, sf_dir, "customer")
        .select(arm.alias("arm"))
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n0"),
            F.sum("arm").cast("long").alias("n1"),
        )
    )
    chi2 = ((F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))).cast(
        "double"
    ) / (F.col("n0") + F.col("n1")).cast("double")
    return c.select(
        "n0",
        "n1",
        chi2.alias("chi2"),
        (chi2 > F.lit(3.841)).alias("srm_detected"),
    )


# --- deterministic Poisson-bootstrap CI for the mean (round 11b) -------------
# The scale-out bootstrap: resampling n rows with replacement is
# impossible distributed, so each row instead draws an independent
# Poisson(1) multiplicity per resample — the classic streaming
# bootstrap — and here the draw is DETERMINISTIC: a Lehmer-mix hash of
# (orderkey, resample) (the customer_geo_grid_pairs split-multiply —
# pure integer arithmetic, identical in both engines, ~50× cheaper
# than 8 md5 digests per draw: the md5 first cut cost 15 s at sf0.1,
# this one ~2 s) maps through the exact Poisson(1) inverse-CDF
# thresholds scaled to 32 bits, so the comparison is pure integer.
# Per resample: exact integer Σw and Σw·cents, one division for the
# mean; the CI is the exact rank-order 2.5%/97.5% of the B resample
# means. The B-way fan-out is a narrow explode absorbed by map-side
# partial aggregation into B keys — the documented bootstrap cost, and
# the reason Poisson bootstrap exists at all.

_BOOT_B = 64  # resamples
# P(Poisson(1) <= k) * 2^31, k = 0..5 (tail mass beyond 6 is < 6e-7)
_BOOT_CDF = [790015084, 1580030169, 1975037711, 2106706892,
             2139624187, 2146207646]


def _boot_hash_sql(key: str, b: str) -> str:
    """31-bit double-Lehmer hash of (key, resample) — DuckDB side.

    Two MINSTD multiplication rounds on the (key, b)-linear seed: one
    round leaves the output magnitude correlated with the seed range
    (the first cut's single split-multiply never crossed the lowest
    Poisson threshold — every weight came out 0), two full mod-2^31
    rounds cover [0, 2^31) regardless of the key range."""
    h0 = f"(({key}) * 48271 + ({b}) * 69621 + 1013904223) % 2147483647"
    h1 = f"(({h0}) * 48271) % 2147483647"
    return f"(({h1}) * 48271) % 2147483647"


def _boot_w_sql(hv: str) -> str:
    """Poisson(1) multiplicity from a 32-bit hash (SQL CASE chain)."""
    cases = " ".join(
        f"WHEN {hv} < {t} THEN {k}" for k, t in enumerate(_BOOT_CDF)
    )
    return f"CASE {cases} ELSE 6 END"


@register(
    "orders_bootstrap_ci",
    oracle=f"""
WITH r AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         u.b AS b
  FROM orders, UNNEST(range({_BOOT_B})) AS u(b)),
h AS (
  SELECT b, cents,
         {_boot_w_sql(f"({_boot_hash_sql('o_orderkey', 'b')})")} AS w
  FROM r),
m AS (
  SELECT b, CAST(SUM(w) AS BIGINT) AS n_w,
         CAST(SUM(w * cents) AS BIGINT) AS sum_w
  FROM h GROUP BY b),
means AS (
  SELECT b, CAST(sum_w AS DOUBLE) / CAST(n_w AS DOUBLE) AS mean_cents,
         ROW_NUMBER() OVER (ORDER BY CAST(sum_w AS DOUBLE)
                            / CAST(n_w AS DOUBLE) ASC, b ASC) AS rn
  FROM m WHERE n_w > 0)
SELECT CAST(COUNT(*) AS BIGINT) AS n_resamples,
       MIN(CASE WHEN rn = {max(1, round(_BOOT_B * 0.025))}
           THEN mean_cents END) AS ci_lo_cents,
       MIN(CASE WHEN rn = {min(_BOOT_B, round(_BOOT_B * 0.975))}
           THEN mean_cents END) AS ci_hi_cents
FROM means
""".strip(),
)
def orders_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_rank

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents.alias("cents")
    )
    r = o.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    h0 = (
        F.col("o_orderkey").cast("long") * F.lit(48271)
        + F.col("b").cast("long") * F.lit(69621)
        + F.lit(1013904223)
    ) % F.lit(2147483647)
    h1 = (h0 * F.lit(48271)) % F.lit(2147483647)
    hv = (h1 * F.lit(48271)) % F.lit(2147483647)
    w = F.lit(6)
    for k in range(len(_BOOT_CDF) - 1, -1, -1):
        w = F.when(hv < _BOOT_CDF[k], F.lit(k)).otherwise(w)
    m = (
        r.select("b", "cents", w.alias("w"))
        .groupBy("b")
        .agg(
            F.sum("w").cast("long").alias("n_w"),
            F.sum(F.col("w") * F.col("cents")).cast("long").alias("sum_w"),
        )
        .where(F.col("n_w") > 0)
    )
    mean = F.col("sum_w").cast("double") / F.col("n_w").cast("double")
    # rank the B resample means through the O(P) global-rank operator —
    # even a 64-row bare global window is the forbidden plan shape
    means = with_global_rank(
        m.select("b", mean.alias("mean_cents")),
        [F.col("mean_cents").asc(), F.col("b").asc()],
        "rn",
    )
    lo_rn = max(1, round(_BOOT_B * 0.025))
    hi_rn = min(_BOOT_B, round(_BOOT_B * 0.975))
    return means.agg(
        F.count(F.lit(1)).cast("long").alias("n_resamples"),
        F.min(
            F.when(F.col("rn") == lo_rn, F.col("mean_cents"))
        ).alias("ci_lo_cents"),
        F.min(
            F.when(F.col("rn") == hi_rn, F.col("mean_cents"))
        ).alias("ci_hi_cents"),
    )


# --- CUPED variance reduction for the A/B readout (round 11b) ----------------
# The other half of a real experimentation stack (events_ab_test gives
# the z-test, customer_ab_srm_check the guardrail): CUPED adjusts the
# experiment metric with pre-period behavior, cutting variance by the
# squared pre/post correlation. Pre-period x = events in the first
# half of the time range, metric y = events in the second half (the
# deterministic midpoint split); arms = md5 parity. theta =
# (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) comes from ONE pass of exact integer
# sufficient statistics (the brand_discount_elasticity protocol); the
# adjusted treatment effect and the realized variance-reduction r² are
# fixed IEEE expressions on those integers. Shape: one user-keyed
# aggregate over the fact table, then everything is a handful of rows.

@register(
    "events_cuped_adjustment",
    oracle="""
WITH bounds AS (
  SELECT CAST(MIN(CAST(ts AS DATE)) AS DATE) AS lo,
         CAST(MIN(CAST(ts AS DATE))
              + CAST((date_diff('day', MIN(CAST(ts AS DATE)),
                                MAX(CAST(ts AS DATE))) // 2)
                     AS INTEGER) AS DATE) AS mid
  FROM events),
u AS (
  SELECT user_id,
         CAST((strpos('0123456789abcdef',
              substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2
              AS BIGINT) AS arm,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) <= (SELECT mid FROM bounds)
                  THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) > (SELECT mid FROM bounds)
                  THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY user_id),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
         CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
         CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0
  FROM u)
SELECT n, n0, n1,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx),
             6) AS theta,
       ROUND(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
             / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             6) AS r2,
       ROUND((CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0)
             - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
               * (CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0),
             6) AS adj_effect
FROM s
""".strip(),
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    bounds = ev.agg(
        F.min("d").alias("lo"),
        F.date_add(
            F.min("d"),
            F.floor(F.datediff(F.max("d"), F.min("d")) / 2).cast("int"),
        ).alias("mid"),
    )
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10
        ).cast("long")
        % 2
    )
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("d") <= F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("d") > F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("y"),
        )
        .select("user_id", arm.alias("arm"), "x", "y")
    )
    s = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0))
        .cast("long")
        .alias("sx1"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("sy1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0))
        .cast("long")
        .alias("sx0"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("sy0"),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    varx_n = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vary_n = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    theta = cov_n / varx_n
    dy = (
        F.col("sy1").cast("double") / F.col("n1")
        - F.col("sy0").cast("double") / F.col("n0")
    )
    dx = (
        F.col("sx1").cast("double") / F.col("n1")
        - F.col("sx0").cast("double") / F.col("n0")
    )
    return s.select(
        "n",
        "n0",
        "n1",
        F.round(theta, 6).alias("theta"),
        F.round((cov_n * cov_n) / (varx_n * vary_n), 6).alias("r2"),
        F.round(dy - theta * dx, 6).alias("adj_effect"),
    )


# --- grid-based DBSCAN (round 11b) -------------------------------------------
# Density clustering, distributed the way it actually scales: the
# eps-neighborhood counting and the core-core edge generation both go
# through the 3x3 grid-cell candidate join (cell size == eps, so every
# true neighbor pair meets in some probe — candidate volume is
# O(n * density), never O(n^2)), and the cluster labels are the
# connected components of the CORE-point graph via the iterative
# min-label operator. Border points adopt the MINIMUM neighboring core
# label (the deterministic variant of DBSCAN's first-reached
# assignment); everything else is noise. The SQL oracle replays the
# label fixpoint with a recursive CTE — cluster diameters are
# density-bounded, so the closure stays small however big the corpus.

_DBSCAN_MINPTS = 4  # |N_eps(p)| >= 4, p itself included


@register(
    "customer_geo_dbscan",
    oracle=f"""
WITH h AS (
  SELECT c_custkey, (c_custkey * 48271) % 2147483647 AS hv FROM customer),
m AS (
  SELECT c_custkey, (hv % 100003) * (hv // 100003 + 7) AS mv FROM h),
sp AS (
  SELECT CAST({_GEO_SPAN} * CEIL(SQRT(COUNT(*) / {_GEO_N_BASE}.0))
              AS BIGINT) AS span
  FROM customer),
pts AS (
  SELECT c_custkey, mv % sp.span AS lat,
         (mv // sp.span) % sp.span AS lon
  FROM m, sp),
cells AS (
  SELECT c_custkey, lat, lon,
         lat - lat % {_GEO_R} AS cl, lon - lon % {_GEO_R} AS co
  FROM pts),
nbr AS (
  SELECT a.c_custkey AS pa, b.c_custkey AS pb
  FROM cells a JOIN cells b
    ON b.cl IN (a.cl - {_GEO_R}, a.cl, a.cl + {_GEO_R})
   AND b.co IN (a.co - {_GEO_R}, a.co, a.co + {_GEO_R})
   AND a.c_custkey <> b.c_custkey
   AND (a.lat - b.lat) * (a.lat - b.lat)
       + (a.lon - b.lon) * (a.lon - b.lon) <= {_GEO_R * _GEO_R}),
cnt AS (
  SELECT pa AS c_custkey, CAST(COUNT(*) AS BIGINT) AS n_nbr
  FROM nbr GROUP BY pa),
core AS (
  SELECT c_custkey FROM cnt WHERE n_nbr + 1 >= {_DBSCAN_MINPTS}),
ce AS (
  SELECT n.pa AS a, n.pb AS b FROM nbr n
  JOIN core x ON x.c_custkey = n.pa
  JOIN core y ON y.c_custkey = n.pb),
comp AS (
  WITH RECURSIVE walk(node, label) AS (
    SELECT c_custkey, c_custkey FROM core
    UNION
    SELECT ce.b, walk.label FROM walk JOIN ce ON ce.a = walk.node),
  labels AS (
    SELECT node, CAST(MIN(label) AS BIGINT) AS cluster FROM walk
    GROUP BY node)
  SELECT * FROM labels),
border AS (
  SELECT n.pa AS node, CAST(MIN(c.cluster) AS BIGINT) AS cluster
  FROM nbr n JOIN comp c ON c.node = n.pb
  WHERE n.pa NOT IN (SELECT node FROM comp)
  GROUP BY n.pa)
SELECT p.c_custkey AS custkey,
       CASE WHEN cp.node IS NOT NULL THEN 'core'
            WHEN bd.node IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       COALESCE(cp.cluster, bd.cluster) AS cluster
FROM pts p
LEFT JOIN comp cp ON cp.node = p.c_custkey
LEFT JOIN border bd ON bd.node = p.c_custkey
""".strip(),
)
def customer_geo_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components

    pts = _geo_pts(spark, sf_dir)
    cells = pts.select(
        "*",
        (F.col("lat") - F.col("lat") % _GEO_R).alias("cl"),
        (F.col("lon") - F.col("lon") % _GEO_R).alias("co"),
    )
    # NOTE (r14 optimization round): a half-neighborhood probe variant
    # (5 offsets + mirrored union — 5/9 of the candidate join work) was
    # implemented, oracle-verified at both SFs, and MEASURED SLOWER
    # solo at sf0.1 (10.5 s best-of-5 vs 7.7 s for this version): the
    # candidate join is not the dominant stage here, and the extra
    # union pass over the persisted half-relation costs more than the
    # probe saving. Reverted per guide §1 (measure first).
    offs = spark.range(9).select(
        (F.col("id") % 3 - 1).alias("dx"),
        (F.col("id") - F.col("id") % 3).cast("long").alias("_t"),
    ).select("dx", (F.col("_t") / 3 - 1).cast("long").alias("dy"))
    probes = cells.crossJoin(F.broadcast(offs)).select(
        F.col("c_custkey").alias("pa"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        (F.col("cl") + F.col("dx") * _GEO_R).alias("cl"),
        (F.col("co") + F.col("dy") * _GEO_R).alias("co"),
    )
    base = cells.select(
        F.col("c_custkey").alias("pb"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        "cl",
        "co",
    )
    dlat = F.col("lat_a") - F.col("lat_b")
    dlon = F.col("lon_a") - F.col("lon_b")
    nbr = (
        probes.join(base, ["cl", "co"])
        .where(
            (F.col("pa") != F.col("pb"))
            & (dlat * dlat + dlon * dlon <= F.lit(_GEO_R * _GEO_R))
        )
        .select("pa", "pb")
        .persist()  # consumed by the count, the core-edge build, border
    )
    cnt = nbr.groupBy(F.col("pa").alias("c_custkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nbr")
    )
    core = cnt.where(
        F.col("n_nbr") + 1 >= _DBSCAN_MINPTS
    ).select("c_custkey")
    ca = core.select(F.col("c_custkey").alias("pa"))
    cb = core.select(F.col("c_custkey").alias("pb"))
    ce = nbr.join(ca, "pa").join(cb, "pb")
    comp = connected_components(
        # isolated cores (no core neighbor) still need a label: add
        # self-loops so every core node enters the edge set
        ce.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionAll(
            core.select(
                F.col("c_custkey").alias("src"),
                F.col("c_custkey").alias("dst"),
            )
        )
    ).select(F.col("node"), F.col("label").cast("long").alias("cluster"))
    border = (
        nbr.join(comp, nbr["pb"] == comp["node"])
        .join(comp.select(F.col("node").alias("pa")), "pa", "left_anti")
        .groupBy(F.col("pa").alias("bnode"))
        .agg(F.min("cluster").cast("long").alias("bcluster"))
    )
    out = (
        pts.join(comp, pts["c_custkey"] == comp["node"], "left")
        .join(border, pts["c_custkey"] == border["bnode"], "left")
    )
    role = (
        F.when(F.col("node").isNotNull(), F.lit("core"))
        .when(F.col("bnode").isNotNull(), F.lit("border"))
        .otherwise(F.lit("noise"))
    )
    return out.select(
        F.col("c_custkey").alias("custkey"),
        role.alias("role"),
        F.coalesce(F.col("cluster"), F.col("bcluster")).alias("cluster"),
    )


# --- line-number sequence integrity (round 11b) ------------------------------
# The cheap-but-real data-quality check every ingest pipeline runs:
# l_linenumber must be the consecutive sequence 1..count within each
# order. Gaps = max - count (exact identity when values are distinct;
# dup detection rides along via count vs distinct). One fact-sized
# aggregate, one dimension-sized rollup.

@register(
    "lineitem_linenumber_gaps",
    oracle="""
WITH per AS (
  SELECT l_orderkey,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS n_distinct,
         CAST(MAX(l_linenumber) AS BIGINT) AS max_ln,
         CAST(MIN(l_linenumber) AS BIGINT) AS min_ln
  FROM lineitem GROUP BY l_orderkey)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN min_ln <> 1 OR max_ln <> n_distinct
                THEN 1 ELSE 0 END) AS BIGINT) AS n_orders_with_gaps,
       CAST(SUM(max_ln - n_distinct) AS BIGINT) AS total_missing,
       CAST(SUM(n_lines - n_distinct) AS BIGINT) AS total_dups
FROM per
""".strip(),
)
def lineitem_linenumber_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.countDistinct("l_linenumber").cast("long").alias("n_distinct"),
            F.max("l_linenumber").cast("long").alias("max_ln"),
            F.min("l_linenumber").cast("long").alias("min_ln"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(
            F.when(
                (F.col("min_ln") != 1)
                | (F.col("max_ln") != F.col("n_distinct")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_orders_with_gaps"),
        F.sum(F.col("max_ln") - F.col("n_distinct"))
        .cast("long")
        .alias("total_missing"),
        F.sum(F.col("n_lines") - F.col("n_distinct"))
        .cast("long")
        .alias("total_dups"),
    )


# --- Laspeyres / Paasche / Fisher price index (round 11b) --------------------
# The economics of the catalog: how much did prices move between the
# base year and the comparison year, holding the BASKET fixed?
# Laspeyres weights by base-year quantities, Paasche by current-year,
# Fisher is their geometric mean. Per part and year: total cents and
# total centi-quantity (exact BIGINTs); unit value = cents/qty stays
# RATIONAL by keeping every index as a ratio of exact integer
# cross-sums — Σ p1·q0 needs per-part division, so the protocol uses
# the value-share form: L = Σ_i (c1_i·q0_i·100 div q1_i) / Σ c0 over
# matched parts, every per-part term an integer div (markov protocol).
# Fisher's sqrt is the one correctly-rounded transcendental. One
# fact-sized aggregate; everything after is part-dimension-sized.

_PIDX_BASE_YEAR = 1996
_PIDX_CURR_YEAR = 1997


@register(
    "part_price_index_fisher",
    oracle=f"""
WITH py AS (
  SELECT l_partkey,
         CAST(EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) AS BIGINT) AS y,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cents,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS qc
  FROM lineitem
  WHERE EXTRACT(YEAR FROM CAST(l_shipdate AS DATE))
        IN ({_PIDX_BASE_YEAR}, {_PIDX_CURR_YEAR})
  GROUP BY 1, 2),
m AS (
  SELECT b.l_partkey,
         b.cents AS c0, b.qc AS q0, c.cents AS c1, c.qc AS q1
  FROM py b JOIN py c ON c.l_partkey = b.l_partkey
  WHERE b.y = {_PIDX_BASE_YEAR} AND c.y = {_PIDX_CURR_YEAR}
    AND b.qc > 0 AND c.qc > 0),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(c0) AS BIGINT) AS sum_c0,
         CAST(SUM(c1) AS BIGINT) AS sum_c1,
         CAST(SUM((c1 * q0 * 100) // q1) AS BIGINT) AS l_num,
         CAST(SUM((c0 * q1 * 100) // q0) AS BIGINT) AS p_den
  FROM m)
SELECT n_parts,
       ROUND(CAST(l_num AS DOUBLE) / (CAST(sum_c0 AS DOUBLE) * 100.0),
             6) AS laspeyres,
       ROUND(CAST(sum_c1 AS DOUBLE) * 100.0 / CAST(p_den AS DOUBLE),
             6) AS paasche,
       ROUND(SQRT((CAST(l_num AS DOUBLE)
                   / (CAST(sum_c0 AS DOUBLE) * 100.0))
                  * (CAST(sum_c1 AS DOUBLE) * 100.0
                     / CAST(p_den AS DOUBLE))), 6) AS fisher
FROM s
""".strip(),
)
def part_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.year(F.to_date("l_shipdate")).isin(
            _PIDX_BASE_YEAR, _PIDX_CURR_YEAR
        )
    )
    py = li.groupBy(
        "l_partkey",
        F.year(F.to_date("l_shipdate")).cast("long").alias("y"),
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
        .cast("long")
        .alias("qc"),
    )
    b = py.where(
        (F.col("y") == _PIDX_BASE_YEAR) & (F.col("qc") > 0)
    ).select(
        "l_partkey", F.col("cents").alias("c0"), F.col("qc").alias("q0")
    )
    c = py.where(
        (F.col("y") == _PIDX_CURR_YEAR) & (F.col("qc") > 0)
    ).select(
        "l_partkey", F.col("cents").alias("c1"), F.col("qc").alias("q1")
    )
    s = (
        b.join(c, "l_partkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("c0").cast("long").alias("sum_c0"),
            F.sum("c1").cast("long").alias("sum_c1"),
            F.sum(F.expr("(c1 * q0 * 100) div q1"))
            .cast("long")
            .alias("l_num"),
            F.sum(F.expr("(c0 * q1 * 100) div q0"))
            .cast("long")
            .alias("p_den"),
        )
    )
    lasp = F.col("l_num").cast("double") / (
        F.col("sum_c0").cast("double") * F.lit(100.0)
    )
    paas = (
        F.col("sum_c1").cast("double") * F.lit(100.0)
    ) / F.col("p_den").cast("double")
    return s.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


# --- difference-in-differences promo lift (round 11b) ------------------------
# The causal-inference workhorse the A/B family was missing: when
# treatment wasn't randomized (promo parts CHOSE to be promoted), DiD
# compares the before→after change of the treated group against the
# control group's change — parallel-trends counterfactual. Treatment =
# PROMO parts (p_type prefix), period split = shipdate year; the four
# cell means come from exact integer (cents, count) sums and the DiD
# estimate is one fixed IEEE expression over them — the
# events_cuped_adjustment protocol pointed at observational data. One
# fact-sized aggregate with a broadcast part-dimension join.

_DID_BEFORE_YEAR = 1996
_DID_AFTER_YEAR = 1997


@register(
    "lineitem_promo_did",
    oracle=f"""
WITH li AS (
  SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS treated,
         CASE WHEN EXTRACT(YEAR FROM CAST(l.l_shipdate AS DATE))
                   = {_DID_AFTER_YEAR} THEN 1 ELSE 0 END AS post,
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE EXTRACT(YEAR FROM CAST(l.l_shipdate AS DATE))
        IN ({_DID_BEFORE_YEAR}, {_DID_AFTER_YEAR})),
c AS (
  SELECT treated, post,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s
  FROM li GROUP BY 1, 2),
w AS (
  SELECT
    MAX(CASE WHEN treated = 1 AND post = 0 THEN s END) AS s10,
    MAX(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n10,
    MAX(CASE WHEN treated = 1 AND post = 1 THEN s END) AS s11,
    MAX(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n11,
    MAX(CASE WHEN treated = 0 AND post = 0 THEN s END) AS s00,
    MAX(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n00,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN s END) AS s01,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n01
  FROM c)
SELECT CAST(n10 + n11 AS BIGINT) AS n_treated,
       CAST(n00 + n01 AS BIGINT) AS n_control,
       ROUND(CAST(s11 AS DOUBLE) / n11 - CAST(s10 AS DOUBLE) / n10,
             4) AS treated_delta_cents,
       ROUND(CAST(s01 AS DOUBLE) / n01 - CAST(s00 AS DOUBLE) / n00,
             4) AS control_delta_cents,
       ROUND((CAST(s11 AS DOUBLE) / n11 - CAST(s10 AS DOUBLE) / n10)
             - (CAST(s01 AS DOUBLE) / n01 - CAST(s00 AS DOUBLE) / n00),
             4) AS did_cents
FROM w
""".strip(),
)
def lineitem_promo_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.year(F.to_date("l_shipdate")).isin(
            _DID_BEFORE_YEAR, _DID_AFTER_YEAR
        )
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_type").startswith("PROMO").cast("int").alias("treated"),
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "treated",
        (F.year(F.to_date("l_shipdate")) == _DID_AFTER_YEAR)
        .cast("int")
        .alias("post"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    c = j.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )

    def cell(t, p, col):
        return F.max(
            F.when(
                (F.col("treated") == t) & (F.col("post") == p), F.col(col)
            )
        )

    w = c.agg(
        cell(1, 0, "s").alias("s10"),
        cell(1, 0, "n").alias("n10"),
        cell(1, 1, "s").alias("s11"),
        cell(1, 1, "n").alias("n11"),
        cell(0, 0, "s").alias("s00"),
        cell(0, 0, "n").alias("n00"),
        cell(0, 1, "s").alias("s01"),
        cell(0, 1, "n").alias("n01"),
    )
    td = F.col("s11").cast("double") / F.col("n11") - F.col("s10").cast(
        "double"
    ) / F.col("n10")
    cd = F.col("s01").cast("double") / F.col("n01") - F.col("s00").cast(
        "double"
    ) / F.col("n00")
    return w.select(
        (F.col("n10") + F.col("n11")).cast("long").alias("n_treated"),
        (F.col("n00") + F.col("n01")).cast("long").alias("n_control"),
        F.round(td, 4).alias("treated_delta_cents"),
        F.round(cd, 4).alias("control_delta_cents"),
        F.round(td - cd, 4).alias("did_cents"),
    )


# --- robust outliers via median absolute deviation (round 12) ---------------
# The robust companion of orders_winsorized_stats and the z-score rule:
# MAD-based outlier flags survive the very outliers a mean/stddev rule
# is poisoned by. Exactness chain: totals as integer cents →
# percentile_disc picks an ACTUAL element (the value_percentiles_by_type
# protocol) → absolute deviations are exact integers → a second
# percentile_disc gives the MAD → the flag |x − med| > 3·1.4826·MAD is
# one shared IEEE comparison on exactly-representable integers. Plan:
# two tiny per-group percentile tables join back onto the grouping key
# (co-partitioned chain, no fact-table window), one final reduce.

_MAD_K = 4.4478  # 3 * 1.4826 (normal-consistency), shared literal


@register(
    "orders_mad_outliers",
    oracle=f"""
WITH o AS (
  SELECT o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
med AS (
  SELECT o_orderpriority,
         PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY cents) AS med
  FROM o GROUP BY o_orderpriority),
dev AS (
  SELECT o.o_orderpriority, o.cents, m.med,
         ABS(o.cents - m.med) AS absdev
  FROM o JOIN med m USING (o_orderpriority)),
mad AS (
  SELECT o_orderpriority,
         PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY absdev) AS mad
  FROM dev GROUP BY o_orderpriority)
SELECT d.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MAX(d.med) AS BIGINT) AS median_cents,
       CAST(MAX(t.mad) AS BIGINT) AS mad_cents,
       CAST(SUM(CASE WHEN CAST(d.absdev AS DOUBLE)
                          > {_MAD_K} * CAST(t.mad AS DOUBLE)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(SUM(CASE WHEN CAST(d.absdev AS DOUBLE)
                          > {_MAD_K} * CAST(t.mad AS DOUBLE)
                THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS outlier_rate
FROM dev d JOIN mad t USING (o_orderpriority)
GROUP BY d.o_orderpriority
""".strip(),
)
def orders_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    med = o.groupBy("o_orderpriority").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)").alias(
            "med"
        )
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "cents",
        "med",
        F.abs(F.col("cents") - F.col("med")).alias("absdev"),
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY absdev)"
        ).alias("mad")
    )
    flag = F.col("absdev").cast("double") > F.lit(_MAD_K) * F.col(
        "mad"
    ).cast("double")
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.max("med").cast("long").alias("median_cents"),
            F.max("mad").cast("long").alias("mad_cents"),
            F.sum(flag.cast("int")).cast("long").alias("n_outliers"),
            (
                F.sum(flag.cast("int")).cast("double") / F.count(F.lit(1))
            ).alias("outlier_rate"),
        )
    )


# --- neighborhood function + harmonic centrality via KMV sketches
# (round 12) ------------------------------------------------------------------
# The ANF / HyperBall algorithm (Palmer et al. KDD'02; Boldi & Vigna's
# HyperBall) — THE way neighborhood sizes, effective diameter, and
# harmonic centrality are computed on web-scale graphs, because exact
# k-hop frontiers are O(n²) while per-node cardinality SKETCHES merge
# in constant size per round. Production HyperBall merges HLL
# registers; this engine's cross-engine determinism protocol uses the
# KMV ranking sketch instead (events_kmv_distinct precedent — md5
# order statistics are bit-identical in DuckDB): each node carries its
# k smallest neighbor hashes, one round = union own sketch with all
# neighbors' sketches and re-rank (n·k rows of state, a per-node
# window — never an array blowup on hubs). est_r is exact below k and
# (k-1)·2^32/h_(k) above; the sketch of a superset has a smaller kth
# minimum, so estimates are monotone in r by construction. Harmonic
# centrality at radius 3 = Σ_r (est_r − est_{r−1})/r on exact BIGINTs.

_ANF_K = 16
_ANF_ROUNDS = 3


def _anf_est_sql(r: int) -> str:
    return (
        f"CASE WHEN s{r}.cnt < {_ANF_K} THEN s{r}.cnt "
        f"ELSE CAST(FLOOR(({_ANF_K} - 1) * 4294967296.0 "
        f"/ GREATEST(s{r}.mx, 1)) AS BIGINT) END"
    )


def _anf_cte_prefix() -> str:
    hexpr = _kmv_hex_sql("CAST(node AS VARCHAR)")
    rounds = []
    for r in range(1, _ANF_ROUNDS + 1):
        rounds.append(f"""
p{r} AS MATERIALIZED (
  SELECT node, h FROM m{r - 1}
  UNION
  SELECT e.src AS node, m.h
  FROM e0 e JOIN m{r - 1} m ON m.node = e.dst),
m{r} AS MATERIALIZED (
  SELECT node, h FROM (
    SELECT node, h,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY h ASC) AS rn
    FROM p{r}) WHERE rn <= {_ANF_K}),
s{r} AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(MAX(h) AS BIGINT) AS mx
  FROM m{r} GROUP BY node)""")

    return f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
m0 AS MATERIALIZED (
  SELECT node, CAST({hexpr} AS BIGINT) AS h
  FROM (SELECT DISTINCT src AS node FROM e0)),
{",".join(r.strip() for r in rounds)}
""".strip()


def _anf_oracle() -> str:
    e1, e2, e3 = _anf_est_sql(1), _anf_est_sql(2), _anf_est_sql(3)
    return f"""
{_anf_cte_prefix()}
SELECT s1.node AS part_key,
       CAST({e1} AS BIGINT) AS n1,
       CAST({e2} AS BIGINT) AS n2,
       CAST({e3} AS BIGINT) AS n3,
       CAST({e1} - 1 AS DOUBLE)
         + CAST(({e2}) - ({e1}) AS DOUBLE) / 2.0
         + CAST(({e3}) - ({e2}) AS DOUBLE) / 3.0 AS harmonic_3hop
FROM s1 JOIN s2 ON s2.node = s1.node JOIN s3 ON s3.node = s1.node
""".strip()


def _anf_round_stats(
    spark: SparkSession, sf_dir: str, edges: DataFrame | None = None
) -> list[DataFrame]:
    """Per-round (node, cnt, mx) sketch stats — the shared ANF engine
    behind the per-node report, the effective-diameter summary, and the
    stored-edge *_mv twin (pass ``edges`` as a directed distinct
    (src, dst) set to skip the rebuild)."""
    if edges is not None:
        return _anf_rounds_over(edges.persist())
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.to_date("l_shipdate")
            >= F.lit(COPURCHASE_SHIPDATE_LO).cast("date")
        )
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
        .persist()  # consumed once per round
    )
    return _anf_rounds_over(e)


def _anf_rounds_over(e: DataFrame) -> list[DataFrame]:
    hv = F.conv(
        F.substring(F.md5(F.col("node").cast("string")), 1, 8), 16, 10
    ).cast("long")
    # The sketch rides as ONE sorted array row per node instead of ≤K
    # rows: the per-round distinct + row_number window (2 exchanges +
    # a sort over the merged candidate set) collapse into a single
    # groupBy(node) whose merge expression — bottom-K of the distinct
    # union — is slice(array_sort(array_distinct(flatten(...))), 1, K),
    # all JVM builtins (guide §2.4 "remove shuffles outright", §2.3
    # "aggregate before you shuffle"). Per-node state stays ≤ K longs
    # between rounds; the pre-truncation merge group is ≤ (deg+1)·K
    # values — degree-bounded exactly like the window variant's
    # per-node sort partition was, but shuffled ONCE instead of twice.
    m = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.array(hv).alias("hs"))
    )
    # Pre-hash the (bigger) edge fact on the loop's join key once —
    # the connected_components discipline: all three rounds' neighbor
    # joins then reuse this partitioning (plan: zero per-round Exchange
    # on the edge side) instead of re-shuffling the edges every round.
    # Width derives from the edge count (the pagerank sizing), NOT
    # capped at defaultParallelism: at 100 TB the loop width must grow
    # with the data once edges >> 2M x cores (VERDICT r14 item #7).
    n_part = max(8, e.count() // 2_000_000 + 1)
    e = e.repartition(n_part, "dst").persist()
    stats = []
    for _ in range(_ANF_ROUNDS):
        nb = e.join(m, e["dst"] == m["node"]).select(
            F.col("src").alias("node"), "hs"
        )
        # Eager localCheckpoint, not persist: the final 3-way stats join
        # evaluates all rounds' subtrees CONCURRENTLY in one job, and a
        # lazy cache can fill too late to stop round r-1 recomputing
        # under round r (a ~5x spike was observed in a warm session at
        # sf0.1 before this). Checkpointing materializes each round
        # exactly once, sequentially, and truncates lineage.
        m = (
            m.unionByName(nb)
            .groupBy("node")
            .agg(
                F.slice(
                    F.array_sort(
                        F.array_distinct(F.flatten(F.collect_list("hs")))
                    ),
                    1,
                    _ANF_K,
                ).alias("hs")
            )
            .localCheckpoint(eager=True)
        )
        # cnt/mx read straight off the checkpointed sorted array —
        # map-only, no per-round aggregate job left in the final plan.
        stats.append(
            m.select(
                "node",
                F.size("hs").cast("long").alias("cnt"),
                F.element_at("hs", -1).cast("long").alias("mx"),
            )
        )
    return stats


def _anf_est(s: DataFrame, tag: str) -> DataFrame:
    full = F.floor(
        F.lit((_ANF_K - 1) * 4294967296.0)
        / F.greatest(F.col("mx"), F.lit(1)).cast("double")
    ).cast("long")
    return s.select(
        "node",
        F.when(F.col("cnt") < _ANF_K, F.col("cnt"))
        .otherwise(full)
        .cast("long")
        .alias(tag),
    )


def _anf_report(stats: list[DataFrame]) -> DataFrame:
    est = _anf_est
    s1 = est(stats[0], "n1")
    s2 = est(stats[1], "n2")
    s3 = est(stats[2], "n3")
    j = s1.join(s2, "node").join(s3, "node")
    return j.select(
        F.col("node").alias("part_key"),
        "n1",
        "n2",
        "n3",
        (
            (F.col("n1") - F.lit(1)).cast("double")
            + (F.col("n2") - F.col("n1")).cast("double") / F.lit(2.0)
            + (F.col("n3") - F.col("n2")).cast("double") / F.lit(3.0)
        ).alias("harmonic_3hop"),
    )


@register("part_copurchase_anf", oracle=_anf_oracle())
def part_copurchase_anf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _anf_report(_anf_round_stats(spark, sf_dir))


@register("part_copurchase_anf_mv", oracle=_anf_oracle())
def part_copurchase_anf_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANF over the STORED edge view — the steady-state serve cost
    (the graph family's *_mv consume protocol): sketch rounds only,
    edge rebuild paid once per source version by the MV cache."""
    edges = _directed_from_stored(copurchase_edges_stored(spark, sf_dir))
    return _anf_report(_anf_round_stats(spark, sf_dir, edges=edges))


# --- weighted shortest paths to the nearest seed (round 12) ------------------
# The path-finding family joins the graph suite: Bellman-Ford-style
# label relaxation over the WEIGHTED co-purchase graph (edge cost =
# 10^6 div w — stronger co-purchase, cheaper hop), distances from the
# deterministic seed set (part_key % 500, the BFS convention), bounded
# at 4 relaxation rounds ("reachable within 4 weighted hops" — the
# bounded-rounds discipline every iterative operator here follows).
# Each round is one edge join + a min-reduce on the node key — the
# textbook distributed SSSP (Pregel's canonical example), exact
# integers end to end (cost ≤ 1e6, 4 hops ⇒ ≤ 4e6, nowhere near
# 2^63). d_r is persisted per round: both the carry branch and the
# relax branch read it.

_SSSP_ROUNDS = 4
_SSSP_COST_SCALE = 1_000_000


def _sssp_oracle() -> str:
    rounds = []
    for r in range(1, _SSSP_ROUNDS + 1):
        rounds.append(f"""
d{r} AS MATERIALIZED (
  SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
    SELECT node, dist FROM d{r - 1}
    UNION ALL
    SELECT e.v AS node, d.dist + e.cost AS dist
    FROM d{r - 1} d JOIN e ON e.u = d.node)
  GROUP BY node)""")
    return f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e0 AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
e AS MATERIALIZED (
  SELECT u, v, {_SSSP_COST_SCALE} // w AS cost FROM e0
  UNION ALL
  SELECT v, u, {_SSSP_COST_SCALE} // w AS cost FROM e0),
seeds AS (
  SELECT DISTINCT u AS node FROM e WHERE u % {_BFS_SEED_MOD} = 0),
d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM seeds),
{",".join(r.strip() for r in rounds)}
SELECT CAST(node AS BIGINT) AS part_key, dist AS cost_scaled
FROM d{_SSSP_ROUNDS}
""".strip()


@register("part_copurchase_sssp", oracle=_sssp_oracle())
def part_copurchase_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    mv = copurchase_weighted_edges(spark, sf_dir).persist()
    e = (
        mv.select("u", "v", F.expr(f"{_SSSP_COST_SCALE} div w").alias("cost"))
        .unionAll(
            mv.select(
                F.col("v").alias("u"),
                F.col("u").alias("v"),
                F.expr(f"{_SSSP_COST_SCALE} div w").alias("cost"),
            )
        )
        # one edge fact per round, MATERIALIZED once: checkpointing (vs
        # persist) also truncates the MV-build lineage out of every
        # round's plan, so Catalyst re-analyzes a leaf, not the build.
        .localCheckpoint(eager=True)
    )
    d = (
        e.where(F.col("u") % _BFS_SEED_MOD == 0)
        .select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.lit(0).cast("long").alias("dist"))
    )
    for _ in range(_SSSP_ROUNDS):
        relax = e.join(d, e["u"] == d["node"]).select(
            F.col("v").alias("node"),
            (F.col("dist") + F.col("cost")).cast("long").alias("dist"),
        )
        d = (
            d.unionByName(relax)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
            # EAGER per-round truncation, not persist(): the carry and
            # relax branches both reference d, so an un-truncated plan
            # DOUBLES per round (the Luby MIS lesson, CLAUDE.md) — and
            # persist() keeps the whole logical tree alive for Catalyst
            # to re-analyze every round.
            .localCheckpoint(eager=True)
        )
    return d.select(
        F.col("node").alias("part_key"), F.col("dist").alias("cost_scaled")
    )


# --- global neighborhood function + effective diameter (round 12) ------------
# The graph-summary consume of the ANF sketches: total reachable-node
# mass per radius (Σ_v est_r(v) — the neighborhood function N(r)) and
# the EFFECTIVE DIAMETER à la Palmer/Leskovec: the smallest r whose
# reach covers ≥ 90% of N(R). The 90% test is an exact integer
# comparison (reach·10 ≥ 9·N(R)) — no float threshold to straddle
# engines. Three rows out; everything heavy is the shared sketch
# rounds.

@register(
    "part_graph_eff_diameter",
    oracle=f"""
{_anf_cte_prefix()},
t AS (
  SELECT 1 AS r, CAST(SUM({_anf_est_sql(1)}) AS BIGINT) AS reach_est
  FROM s1
  UNION ALL
  SELECT 2 AS r, CAST(SUM({_anf_est_sql(2)}) AS BIGINT) FROM s2
  UNION ALL
  SELECT 3 AS r, CAST(SUM({_anf_est_sql(3)}) AS BIGINT) FROM s3),
mx AS (SELECT MAX(reach_est) AS m3 FROM t),
fl AS (
  SELECT r, reach_est,
         reach_est * 10 >= 9 * (SELECT m3 FROM mx) AS hit
  FROM t),
md AS (SELECT MIN(r) AS dr FROM fl WHERE hit)
SELECT CAST(f.r AS BIGINT) AS r, f.reach_est,
       CAST(f.reach_est AS DOUBLE) / (SELECT m3 FROM mx) AS frac_of_max,
       f.r = (SELECT dr FROM md) AS is_effective_diameter
FROM fl f
""".strip(),
)
def part_graph_eff_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Consume the per-node ANF report and fold ALL radii in ONE
    # aggregate (bench r12: the three-separate-sums version re-paid the
    # sketch rounds at 10.7 s; this runs at the ANF query's own cost).
    # Per-node est_r is monotone in r, so the max reach IS reach_3 and
    # the effective diameter is a single CASE on the one summary row —
    # no second pass, no union of per-round jobs.
    anf = part_copurchase_anf(spark, sf_dir)
    s = anf.agg(
        F.sum("n1").cast("long").alias("s1"),
        F.sum("n2").cast("long").alias("s2"),
        F.sum("n3").cast("long").alias("s3"),
    ).withColumn(
        "dr",
        F.when(F.col("s1") * 10 >= 9 * F.col("s3"), F.lit(1))
        .when(F.col("s2") * 10 >= 9 * F.col("s3"), F.lit(2))
        .otherwise(F.lit(3))
        .cast("long"),
    )
    e = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("long").alias("r"),
                    F.col(f"s{i}").alias("reach_est"),
                )
                for i in (1, 2, 3)
            ]
        )
    )
    return s.select(e.alias("e"), "s3", "dr").select(
        F.col("e.r").alias("r"),
        F.col("e.reach_est").alias("reach_est"),
        (
            F.col("e.reach_est").cast("double") / F.col("s3").cast("double")
        ).alias("frac_of_max"),
        (F.col("e.r") == F.col("dr")).alias("is_effective_diameter"),
    )


# --- rich-club coefficient (round 12) -----------------------------------------
# Do the high-degree parts preferentially co-purchase with EACH OTHER?
# φ(k) = 2·E_k / (N_k·(N_k−1)) over the subgraph induced by nodes with
# degree > k, for k ∈ {2,4,8,16,32} — the network-science hub-cohesion
# diagnostic alongside assortativity. Exact integers: degrees from one
# aggregate over the u<v edge view, E_k by joining each edge's two
# endpoint degrees against the broadcast threshold list (5 rows), one
# reduce per k. No pairwise products anywhere — the denominator is
# algebra on N_k.

_RICH_KS = [2, 4, 8, 16, 32]


@register(
    "part_rich_club",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM e0 UNION ALL SELECT v AS node FROM e0)
  GROUP BY node),
ks AS (SELECT UNNEST(ARRAY{_RICH_KS}) AS k),
nk AS (
  SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS n_k
  FROM ks JOIN deg ON deg.d > ks.k GROUP BY ks.k),
ek AS (
  SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS e_k
  FROM ks, e0
  JOIN deg du ON du.node = e0.u
  JOIN deg dv ON dv.node = e0.v
  WHERE du.d > ks.k AND dv.d > ks.k
  GROUP BY ks.k)
SELECT nk.k, nk.n_k, COALESCE(ek.e_k, 0) AS e_k,
       CASE WHEN nk.n_k > 1
            THEN 2.0 * COALESCE(ek.e_k, 0)
                 / (CAST(nk.n_k AS DOUBLE) * (CAST(nk.n_k AS DOUBLE) - 1.0))
            ELSE 0.0 END AS phi
FROM nk LEFT JOIN ek ON ek.k = nk.k
""".strip(),
)
def part_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.to_date("l_shipdate")
            >= F.lit(COPURCHASE_SHIPDATE_LO).cast("date")
        )
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    e0 = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .distinct()
        .persist()  # degree aggregate + the edge-threshold join
    )
    deg = (
        e0.select(F.col("u").alias("node"))
        .unionAll(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .persist()  # joined three times (n_k + both edge endpoints)
    )
    ks = spark.createDataFrame([(k,) for k in _RICH_KS], "k INT")
    nk = (
        F.broadcast(ks)
        .join(deg, deg["d"] > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_k"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ek = (
        e0.join(du, "u")
        .join(dv, "v")
        .crossJoin(F.broadcast(ks))
        .where((F.col("du") > F.col("k")) & (F.col("dv") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("e_k"))
    )
    nd = F.col("n_k").cast("double")
    return (
        nk.join(ek, "k", "left")
        .select(
            "k",
            "n_k",
            F.coalesce(F.col("e_k"), F.lit(0)).cast("long").alias("e_k"),
            F.when(
                F.col("n_k") > 1,
                F.lit(2.0)
                * F.coalesce(F.col("e_k"), F.lit(0))
                / (nd * (nd - F.lit(1.0))),
            )
            .otherwise(F.lit(0.0))
            .alias("phi"),
        )
    )


# --- Croston intermittent-demand estimate per brand (round 12) ---------------
# The named supply-chain forecaster for sparse demand: rate = (mean
# nonzero demand size) / (mean inter-demand interval). Both means
# collapse to exact integers — Σ sizes is the total quantity, and the
# inter-demand intervals TELESCOPE to last−first demand day — so the
# whole estimator is one join + one hash aggregate + a fixed division
# tree (no window, no per-interval rows). Brands with a single demand
# day have no interval and are excluded (the estimator is undefined).

@register(
    "brand_croston_demand",
    oracle="""
WITH d AS (
  SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS day,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2),
s AS (
  SELECT brand,
         CAST(COUNT(*) AS BIGINT) AS n_demand_days,
         CAST(SUM(qty) AS BIGINT) AS total_qty,
         CAST(MAX(day) - MIN(day) AS BIGINT) AS span_days
  FROM d GROUP BY brand)
SELECT brand, n_demand_days, total_qty, span_days,
       (CAST(total_qty AS DOUBLE) / CAST(n_demand_days AS DOUBLE))
         / (CAST(span_days AS DOUBLE)
            / (CAST(n_demand_days AS DOUBLE) - 1.0)) AS croston_rate
FROM s WHERE n_demand_days >= 2
""".strip(),
)
def brand_croston_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.to_date("l_shipdate").alias("day"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    d = (
        li.join(F.broadcast(p), "l_partkey")
        .groupBy("brand", "day")
        .agg(F.sum("qty").cast("long").alias("qty"))
    )
    s = d.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_demand_days"),
        F.sum("qty").cast("long").alias("total_qty"),
        F.datediff(F.max("day"), F.min("day"))
        .cast("long")
        .alias("span_days"),
    )
    nd = F.col("n_demand_days").cast("double")
    return s.where(F.col("n_demand_days") >= 2).select(
        "brand",
        "n_demand_days",
        "total_qty",
        "span_days",
        (
            (F.col("total_qty").cast("double") / nd)
            / (F.col("span_days").cast("double") / (nd - F.lit(1.0)))
        ).alias("croston_rate"),
    )


# --- community conductance over stored LPA labels (round 12) -----------------
# The quality score community detection is judged by: φ(C) =
# cut(C) / min(vol(C), 2m − vol(C)) — low conductance = a well-
# separated community. Second serve-side consumer of the stored label
# table (the part_community_profile protocol): labels and edges both
# come from materialized views, degrees/volumes/cuts are exact
# integers from two hash aggregates, and the only float is the final
# division. A cut edge charges BOTH its communities (the standard
# per-community accounting). Top-20 communities by size — bounded,
# total-ordered output.

@register(
    "part_community_conductance",
    oracle=f"""
WITH lab AS MATERIALIZED (
  SELECT part_key AS node, community FROM ({_lpa_oracle()}) t),
li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e0),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM e0 UNION ALL SELECT v AS node FROM e0)
  GROUP BY node),
vol AS (
  SELECT l.community,
         CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(g.d) AS BIGINT) AS volume
  FROM deg g JOIN lab l ON l.node = g.node
  GROUP BY l.community),
cut AS (
  SELECT community, CAST(SUM(c) AS BIGINT) AS cut_edges FROM (
    SELECT lu.community, COUNT(*) AS c
    FROM e0 JOIN lab lu ON lu.node = e0.u JOIN lab lv ON lv.node = e0.v
    WHERE lu.community <> lv.community GROUP BY lu.community
    UNION ALL
    SELECT lv.community, COUNT(*) AS c
    FROM e0 JOIN lab lu ON lu.node = e0.u JOIN lab lv ON lv.node = e0.v
    WHERE lu.community <> lv.community GROUP BY lv.community)
  GROUP BY community)
SELECT v.community, v.n_nodes, v.volume,
       CAST(COALESCE(c.cut_edges, 0) AS BIGINT) AS cut_edges,
       CAST(COALESCE(c.cut_edges, 0) AS DOUBLE)
         / LEAST(CAST(v.volume AS DOUBLE),
                 2.0 * (SELECT m FROM m) - CAST(v.volume AS DOUBLE))
         AS conductance
FROM vol v LEFT JOIN cut c ON c.community = v.community
ORDER BY v.n_nodes DESC, v.community ASC
LIMIT {_COMMUNITY_TOPK}
""".strip(),
)
def part_community_conductance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    lab = lpa_labels_stored(spark, sf_dir)
    mv = copurchase_edges_stored(spark, sf_dir).select("u", "v").persist()
    m = mv.agg(F.count(F.lit(1)).cast("long").alias("m"))
    deg = (
        mv.select(F.col("u").alias("node"))
        .unionAll(mv.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    vol = (
        deg.join(lab, "node")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("d").cast("long").alias("volume"),
        )
    )
    lu = lab.select(F.col("node").alias("u"), F.col("community").alias("cu"))
    lv = lab.select(F.col("node").alias("v"), F.col("community").alias("cv"))
    xe = (
        mv.join(lu, "u")
        .join(lv, "v")
        .where(F.col("cu") != F.col("cv"))
        .persist()  # charged to both sides
    )
    cut = (
        xe.select(F.col("cu").alias("community"))
        .unionAll(xe.select(F.col("cv").alias("community")))
        .groupBy("community")
        .agg(F.count(F.lit(1)).cast("long").alias("cut_edges"))
    )
    md = F.col("m").cast("double")
    return (
        vol.join(cut, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "n_nodes",
            "volume",
            F.coalesce(F.col("cut_edges"), F.lit(0))
            .cast("long")
            .alias("cut_edges"),
            (
                F.coalesce(F.col("cut_edges"), F.lit(0)).cast("double")
                / F.least(
                    F.col("volume").cast("double"),
                    F.lit(2.0) * md - F.col("volume").cast("double"),
                )
            ).alias("conductance"),
        )
        .orderBy(F.col("n_nodes").desc(), F.col("community").asc())
        .limit(_COMMUNITY_TOPK)
    )


# --- point-in-time feature matrix (round 12) ---------------------------------
# The feature half of the leakage-safe training set whose label half
# is churn_labels_pit: at each quarterly as-of date, per customer —
# trailing-90-day order count and spend, and recency (days since the
# last order strictly before the as-of date). Features may only look
# LEFT; the spine fan-out (|quarters| ≈ 28 whatever the SF) is the
# documented cost, collapsed by one (customer, asof) aggregate. Exact
# integer counts/cents/day-diffs; customers with no history before an
# as-of date are excluded (no features to serve).

@register(
    "customer_pit_features",
    oracle=f"""
WITH od AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
spine AS (
  SELECT DISTINCT CAST(date_trunc('quarter', d) AS DATE) AS asof_d FROM od),
fl AS (
  SELECT od.o_custkey, s.asof_d,
         CAST(SUM(CASE WHEN od.d >= s.asof_d - {_CHURN_LOOKBACK_DAYS // 2}
                        AND od.d < s.asof_d THEN 1 ELSE 0 END) AS BIGINT)
           AS n_orders_90d,
         CAST(SUM(CASE WHEN od.d >= s.asof_d - {_CHURN_LOOKBACK_DAYS // 2}
                        AND od.d < s.asof_d THEN od.cents ELSE 0 END)
              AS BIGINT) AS spend_90d_cents,
         MAX(CASE WHEN od.d < s.asof_d THEN od.d END) AS last_d
  FROM od CROSS JOIN spine s
  GROUP BY 1, 2)
SELECT asof_d AS asof_date, o_custkey AS custkey,
       n_orders_90d, spend_90d_cents,
       CAST(asof_d - last_d AS BIGINT) AS days_since_last
FROM fl WHERE last_d IS NOT NULL
""".strip(),
)
def customer_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    spine = od.select(
        F.to_date(F.date_trunc("quarter", F.col("d"))).alias("asof_d")
    ).distinct()
    win = (F.col("d") >= F.date_sub("asof_d", _CHURN_LOOKBACK_DAYS // 2)) & (
        F.col("d") < F.col("asof_d")
    )
    fl = (
        od.crossJoin(F.broadcast(spine))
        .groupBy("o_custkey", "asof_d")
        .agg(
            F.sum(F.when(win, 1).otherwise(0))
            .cast("long")
            .alias("n_orders_90d"),
            F.sum(F.when(win, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("spend_90d_cents"),
            F.max(F.when(F.col("d") < F.col("asof_d"), F.col("d"))).alias(
                "last_d"
            ),
        )
    )
    return fl.where(F.col("last_d").isNotNull()).select(
        F.col("asof_d").alias("asof_date"),
        F.col("o_custkey").alias("custkey"),
        "n_orders_90d",
        "spend_90d_cents",
        F.datediff("asof_d", "last_d").cast("long").alias("days_since_last"),
    )


# --- bounded-distance betweenness centrality (round 13) ----------------------
# The missing member of the centrality family (degree / PageRank /
# harmonic-ANF done): Brandes dependency accumulation (Brandes 2001;
# the bounded-distance variant surveyed in Brandes 2008 §4 — the
# standard approximation is a source SUBSET + a distance bound, e.g.
# Brandes/Pich 2007 pivots) from the deterministic seed set (part_key
# ≡ 0 mod 500, the BFS convention), depth-bounded at the BFS family's
# 3 hops. Forward pass: level-synchronous multi-source BFS carrying
# shortest-path COUNTS σ(s,v) — state keyed (source, node), each round
# one edge join + one (s,node) aggregate + visited anti-join, exactly
# the operators/bfs.py shape widened by the σ sum. Backward pass:
# δ(v) = Σ_{w ∈ succ(v)} σ_v·(SCALE + δ_w) div σ_w — the Brandes
# recurrence in the repo's exact-integer fixed-point protocol
# (operators/pagerank.py): σ are exact BIGINT path counts, δ is scaled
# by 10^6 and every division is truncating integer division, so all
# partial-sum orders agree and the oracle is the same recurrence as
# chained CTEs (the kcore/ktruss precedent). Overflow bound: each
# credit multiply is σ_v·(SCALE+δ_w) — keep σ_max·(SCALE+δ_max) < 2^63;
# at the co-purchase fixture σ ≤ a few hundred and δ ≤ reach·SCALE
# ≈ 1e10, orders of magnitude inside the bound (for denser graphs pass
# a smaller scale, the PageRank contract). State is (seed×node)-sized,
# never edge-sized; the edge fact is persisted once and re-joined per
# round — the 1000-executor layout.

_BTW_SCALE = 1_000_000


def _betweenness_oracle() -> str:
    anti = {
        1: "l0",
        2: "l0, l1",
        3: "l0, l1, l2",
    }

    def level(r: int) -> str:
        prev = f"l{r - 1}"
        nots = "\n    AND ".join(
            f"NOT EXISTS (SELECT 1 FROM {p} p{i} "
            f"WHERE p{i}.s = {prev}.s AND p{i}.v = e.dst)"
            for i, p in enumerate(anti[r].split(", "))
        )
        return f"""l{r} AS MATERIALIZED (
  SELECT {prev}.s, e.dst AS v, CAST(SUM({prev}.sigma) AS BIGINT) AS sigma
  FROM {prev} JOIN e ON e.src = {prev}.v
  WHERE {nots}
  GROUP BY 1, 2)"""

    return f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
seeds AS (SELECT DISTINCT src AS node FROM e WHERE src % {_BFS_SEED_MOD} = 0),
l0 AS (SELECT node AS s, node AS v, CAST(1 AS BIGINT) AS sigma FROM seeds),
{level(1)},
{level(2)},
{level(3)},
d2 AS (
  SELECT l2.s, l2.v,
         CAST(SUM((l2.sigma * {_BTW_SCALE}) // w.sigma) AS BIGINT) AS delta
  FROM l2 JOIN e ON e.src = l2.v
  JOIN l3 w ON w.s = l2.s AND w.v = e.dst
  GROUP BY 1, 2),
l2d AS MATERIALIZED (
  SELECT l2.s, l2.v, l2.sigma, COALESCE(d2.delta, 0) AS delta
  FROM l2 LEFT JOIN d2 ON d2.s = l2.s AND d2.v = l2.v),
d1 AS (
  SELECT l1.s, l1.v,
         CAST(SUM((l1.sigma * ({_BTW_SCALE} + w.delta)) // w.sigma)
              AS BIGINT) AS delta
  FROM l1 JOIN e ON e.src = l1.v
  JOIN l2d w ON w.s = l1.s AND w.v = e.dst
  GROUP BY 1, 2),
l1d AS (
  SELECT l1.s, l1.v, COALESCE(d1.delta, 0) AS delta
  FROM l1 LEFT JOIN d1 ON d1.s = l1.s AND d1.v = l1.v)
SELECT CAST(v AS BIGINT) AS part_key,
       CAST(SUM(delta) AS BIGINT) AS betweenness_scaled
FROM (SELECT v, delta FROM l1d UNION ALL SELECT v, delta FROM l2d) t
GROUP BY v
""".strip()


def betweenness_bounded(edges: DataFrame, seed_mod: int) -> DataFrame:
    """Bounded-distance Brandes over a directed (src, dst) edge frame
    (symmetrize upstream for undirected) from the deterministic seed
    set src ≡ 0 (mod seed_mod) — the part_copurchase_betweenness core,
    exposed for randomized property tests (tests/test_properties.py)."""
    edges = edges.persist()
    seeds = (
        edges.where(F.col("src") % seed_mod == 0)
        .select(F.col("src").alias("node"))
        .distinct()
    )
    l0 = seeds.select(
        F.col("node").alias("s"),
        F.col("node").alias("v"),
        F.lit(1).cast("long").alias("sigma"),
    ).persist()
    levels = [l0]
    visited = l0.select("s", "v")
    for _ in range(3):
        cur = levels[-1]
        nxt = (
            edges.join(cur, edges["src"] == cur["v"])
            .groupBy("s", F.col("dst").alias("v2"))
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .withColumnRenamed("v2", "v")
            .join(visited, on=["s", "v"], how="left_anti")
            .persist()  # read by: next forward round, visited union,
            # backward credit join, delta left-join
        )
        levels.append(nxt)
        visited = visited.unionByName(nxt.select("s", "v"))
    l1, l2, l3 = levels[1], levels[2], levels[3]

    def credits(lower: DataFrame, upper_d: DataFrame) -> DataFrame:
        # upper_d: (s, v, sigma, delta) — δ of the level ABOVE `lower`.
        up = upper_d.select(
            F.col("s").alias("ws"),
            F.col("v").alias("w"),
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        return (
            lower.join(edges, lower["v"] == edges["src"])
            .join(up, (F.col("ws") == lower["s"]) & (F.col("w") == F.col("dst")))
            .select(
                lower["s"].alias("s"),
                lower["v"].alias("v"),
                F.expr(
                    f"(sigma * ({_BTW_SCALE} + delta_w)) div sigma_w"
                ).alias("credit"),
            )
            .groupBy("s", "v")
            .agg(F.sum("credit").cast("long").alias("delta"))
        )

    def with_delta(level: DataFrame, d: DataFrame) -> DataFrame:
        return level.join(d, on=["s", "v"], how="left").select(
            "s", "v", "sigma", F.coalesce("delta", F.lit(0)).cast("long").alias("delta")
        )

    l3d = l3.withColumn("delta", F.lit(0).cast("long"))
    l2d = with_delta(l2, credits(l2, l3d)).persist()  # feeds d1 + output
    l1d = with_delta(l1, credits(l1, l2d))
    return (
        l1d.select("v", "delta")
        .unionByName(l2d.select("v", "delta"))
        .groupBy("v")
        .agg(F.sum("delta").cast("long").alias("betweenness_scaled"))
        .select(F.col("v").alias("part_key"), "betweenness_scaled")
    )


@register("part_copurchase_betweenness", oracle=_betweenness_oracle())
def part_copurchase_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return betweenness_bounded(
        copurchase_edges(spark, sf_dir).distinct(), _BFS_SEED_MOD
    )


# --- deterministic Luby maximal independent set (round 13) -------------------
# The classic distributed symmetry-breaking primitive (Luby 1986): per
# round, every ACTIVE node draws a priority and enters the MIS iff it
# beats every active neighbor; winners + their neighborhoods leave the
# graph. Facility placement / conflict-free scheduling / graph-coloring
# seed — and the canonical "local decision per round" Pregel shape:
# each round is one edge join + one min-aggregate on the node key +
# two anti-joins, all shuffle-partitioned on the node key, state is
# node-sized. Priorities are DETERMINISTIC per (node, round) — an LCG
# hash folded with the node id into a unique total order P(v) =
# hash(v, r)·10^9 + v (exact integers; requires node ids < 10^9,
# documented like the pagerank scale bound) — so the rounds replay
# bit-identically in any engine and the oracle is the same loop as
# chained CTEs. Bounded at 3 rounds (the iterative-operator
# discipline); nodes still active after round 3 are simply undecided —
# maximality holds on the decided subgraph (pytest-pinned).

_MIS_ROUNDS = 3
_MIS_LCG_A = 1103515245
_MIS_LCG_C = 12345
_MIS_LCG_M = 2147483647
_MIS_ID_SPAN = 1_000_000_000


def _mis_pr_sql(node: str, r: int) -> str:
    return (
        f"(({node} * {_MIS_LCG_A} + {_MIS_LCG_C} * {r})"
        f" % {_MIS_LCG_M}) * {_MIS_ID_SPAN} + {node}"
    )


def _mis_oracle() -> str:
    rounds = []
    for r in range(1, _MIS_ROUNDS + 1):
        rounds.append(f"""
p{r} AS (SELECT node, CAST({_mis_pr_sql("node", r)} AS BIGINT) AS pr
         FROM a{r}),
m{r} AS (
  SELECT e.src AS node, MIN(p.pr) AS mn
  FROM e JOIN p{r} p ON p.node = e.dst
  GROUP BY e.src),
s{r} AS MATERIALIZED (
  SELECT pv.node FROM p{r} pv LEFT JOIN m{r} m USING (node)
  WHERE m.mn IS NULL OR pv.pr < m.mn),
a{r + 1} AS MATERIALIZED (
  SELECT node FROM a{r}
  EXCEPT
  (SELECT node FROM s{r}
   UNION
   SELECT e.dst AS node FROM e JOIN s{r} s ON e.src = s.node))""")
    union = "\nUNION ALL\n".join(
        f"SELECT CAST(node AS BIGINT) AS part_key,"
        f" CAST({r} AS BIGINT) AS round_selected FROM s{r}"
        for r in range(1, _MIS_ROUNDS + 1)
    )
    return f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
a1 AS (SELECT DISTINCT src AS node FROM e),
{",".join(r.strip() for r in rounds)}
{union}
""".strip()


def luby_mis(edges: DataFrame) -> DataFrame:
    """Deterministic Luby MIS over a SYMMETRIC (src, dst) edge frame —
    the part_copurchase_mis core, exposed for randomized property
    tests. Per-round lineage truncation (the pagerank/bfs discipline):
    each round reads sel/active several times AND the next round's plan
    would otherwise nest all previous rounds' joins — the branching
    re-expansion blew the driver heap just RENDERING the round-3 plan
    tree before truncation was added."""
    edges = edges.localCheckpoint(eager=True)
    active = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out: DataFrame | None = None
    for r in range(1, _MIS_ROUNDS + 1):
        pr = active.select(
            "node", F.expr(_mis_pr_sql("node", r)).cast("long").alias("pr")
        )
        mn = (
            edges.join(pr, edges["dst"] == pr["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("pr").alias("mn"))
        )
        sel = (
            pr.join(mn, on="node", how="left")
            .where(F.col("mn").isNull() | (F.col("pr") < F.col("mn")))
            .select("node")
            .localCheckpoint(eager=True)  # read by output + kill + anti
        )
        killed = sel.unionByName(
            edges.join(sel, edges["src"] == sel["node"]).select(
                F.col("dst").alias("node")
            )
        ).distinct()
        active = active.join(killed, on="node", how="left_anti").localCheckpoint(
            eager=True
        )
        picked = sel.select(
            F.col("node").alias("part_key"),
            F.lit(r).cast("long").alias("round_selected"),
        )
        out = picked if out is None else out.unionByName(picked)
    return out


@register("part_copurchase_mis", oracle=_mis_oracle())
def part_copurchase_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    return luby_mis(copurchase_edges(spark, sf_dir).distinct())


# --- split-conformal prediction intervals (round 13) -------------------------
# Distribution-free calibrated intervals (split/inductive conformal,
# Vovk et al.; the Angelopoulos-Bates recipe): fit a point predictor on
# one split, take the ⌈(n+1)(1−α)⌉-th smallest absolute residual on a
# held-out CALIBRATION split as the interval half-width q̂, and the
# interval pred ± q̂ covers a fresh point with probability ≥ 1−α.
# Engine-shaped instance: predictor = per-priority calibration median
# price (lower median — the deterministic k-th order statistic, exact
# cents), calibration = the even-orderkey half (a deterministic HASH
# split — split-conformal needs an exchangeable calibration draw, and a
# temporal split broke coverage on the drifting fixture: 79% at
# sf0.001; the keyed split restores the guarantee), test = the odd
# half; report
# q̂(α=0.1) and the EMPIRICAL test coverage as an exact ×10^4 fixed
# point. Everything is integer order statistics — two windowed ranks
# partitioned by the 5-value priority key, no float ever summed. The
# conformal guarantee itself (coverage ≥ 90%) is pytest-pinned.

_CONF_ALPHA_NUM, _CONF_ALPHA_DEN = 1, 10  # α = 0.1


def _conformal_oracle() -> str:
    return f"""
WITH o AS (
  SELECT o_orderpriority AS priority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey % 2 = 0 AS is_cal,
         o_orderkey
  FROM orders),
cal AS (SELECT * FROM o WHERE is_cal),
med AS (
  SELECT priority, cents AS pred_cents FROM (
    SELECT priority, cents,
           ROW_NUMBER() OVER (PARTITION BY priority
                              ORDER BY cents, o_orderkey) AS rn,
           COUNT(*) OVER (PARTITION BY priority) AS n
    FROM cal) t
  WHERE rn = (n + 1) // 2),
res AS (
  SELECT c.priority, ABS(c.cents - m.pred_cents) AS r
  FROM cal c JOIN med m USING (priority)),
qhat AS (
  SELECT priority, r AS q_cents, n AS n_cal FROM (
    SELECT priority, r,
           ROW_NUMBER() OVER (PARTITION BY priority ORDER BY r) AS rn,
           COUNT(*) OVER (PARTITION BY priority) AS n
    FROM res) t
  WHERE rn = CAST(CEIL((n + 1) * (1.0 - {_CONF_ALPHA_NUM}.0
                                  / {_CONF_ALPHA_DEN})) AS BIGINT)),
tst AS (
  SELECT t.priority,
         CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN ABS(t.cents - m.pred_cents) <= q.q_cents
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
  FROM o t JOIN med m USING (priority) JOIN qhat q USING (priority)
  WHERE NOT t.is_cal
  GROUP BY t.priority)
SELECT t.priority, q.n_cal, m.pred_cents, q.q_cents, t.n_test,
       t.n_covered,
       CAST((t.n_covered * 10000) // t.n_test AS BIGINT)
         AS coverage_x10000
FROM tst t JOIN med m USING (priority) JOIN qhat q USING (priority)
""".strip()


def _conformal_serve(o: DataFrame) -> DataFrame:
    """The conformal report over a prepared (priority, cents, is_cal,
    o_orderkey) frame — shared by the batch query and the streaming
    calibration-store twin (queries/streaming.py)."""
    cal = o.where("is_cal")
    wm = Window.partitionBy("priority").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("priority")
    med = (
        cal.select(
            "priority",
            "cents",
            F.row_number().over(wm).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .where(F.expr("rn = (n + 1) div 2"))
        .select("priority", F.col("cents").alias("pred_cents"))
    )
    res = cal.join(med, on="priority").select(
        "priority", F.abs(F.col("cents") - F.col("pred_cents")).alias("r")
    )
    wr = Window.partitionBy("priority").orderBy("r")
    qhat = (
        res.select(
            "priority",
            "r",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .where(
            F.col("rn")
            == F.ceil(
                (F.col("n") + 1)
                * (1.0 - _CONF_ALPHA_NUM / _CONF_ALPHA_DEN)
            ).cast("long")
        )
        .select(
            "priority", F.col("r").alias("q_cents"), F.col("n").alias("n_cal")
        )
    )
    tst = (
        o.where(~F.col("is_cal"))
        .join(F.broadcast(med), on="priority")
        .join(F.broadcast(qhat), on="priority")
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("pred_cents"))
                    <= F.col("q_cents"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        tst.join(F.broadcast(med), on="priority")
        .join(F.broadcast(qhat), on="priority")
        .select(
            "priority",
            "n_cal",
            "pred_cents",
            "q_cents",
            "n_test",
            "n_covered",
            F.expr("CAST((n_covered * 10000) div n_test AS BIGINT)").alias(
                "coverage_x10000"
            ),
        )
    )


@register("orders_conformal_interval", oracle=_conformal_oracle())
def orders_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _conformal_serve(
        load_table(spark, sf_dir, "orders").select(
            F.col("o_orderpriority").alias("priority"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            (F.col("o_orderkey") % 2 == 0).alias("is_cal"),
            "o_orderkey",
        )
    )


# --- Apriori candidate-pruned frequent triples (round 13) --------------------
# One Apriori round above the pair-level co-purchase analysis, on
# CUSTOMER baskets (parts a customer bought in the recent window —
# denser than per-order baskets, the market-basket shape): frequent
# pairs L2 (support = customers holding both parts ≥ 2) generate
# candidate triples whose THREE sub-pairs are all frequent (the
# Agrawal–Srikant prune), and only the candidates pay the counting
# join — support counting is the candidate set joined THREE times
# against the (customer, part) membership fact, never a |basket|³
# explosion. At 100 TB the prune is the whole algorithm: the
# membership fact is the only corpus-sized table, re-joined per
# candidate leg on the part key; pair generation is map-side
# combination over date-window-bounded baskets.

_APRIORI_MIN_SUP = 2


def _triples_oracle() -> str:
    return f"""
WITH m AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE CAST(l.l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
pairs AS (
  SELECT a.part AS p1, b.part AS p2, CAST(COUNT(*) AS BIGINT) AS sup
  FROM m a JOIN m b ON a.cust = b.cust AND a.part < b.part
  GROUP BY 1, 2),
l2 AS (SELECT p1, p2 FROM pairs WHERE sup >= {_APRIORI_MIN_SUP}),
cand AS (
  SELECT x.p1, x.p2, y.p2 AS p3
  FROM l2 x JOIN l2 y ON x.p1 = y.p1 AND x.p2 < y.p2
  JOIN l2 z ON z.p1 = x.p2 AND z.p2 = y.p2)
SELECT c.p1, c.p2, c.p3, CAST(COUNT(*) AS BIGINT) AS support
FROM cand c
JOIN m m1 ON m1.part = c.p1
JOIN m m2 ON m2.part = c.p2 AND m2.cust = m1.cust
JOIN m m3 ON m3.part = c.p3 AND m3.cust = m1.cust
GROUP BY 1, 2, 3
HAVING COUNT(*) >= {_APRIORI_MIN_SUP}
""".strip()


@register("part_frequent_triples", oracle=_triples_oracle())
def part_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.to_date("l_shipdate")
            >= F.lit(COPURCHASE_SHIPDATE_LO).cast("date")
        )
        .select("l_orderkey", "l_partkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    m = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")
        )
        .distinct()
        .localCheckpoint(eager=True)  # read by pair gen + 3 count legs
    )
    baskets = m.groupBy("cust").agg(
        F.array_sort(F.collect_set("part")).alias("ps")
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> transform("
                    "slice(ps, i + 2, size(ps)), y ->"
                    " struct(x AS p1, y AS p2))))"
                )
            ).alias("pr")
        )
        .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .agg(F.count(F.lit(1)).cast("long").alias("sup"))
    )
    l2 = pairs.where(F.col("sup") >= _APRIORI_MIN_SUP).select("p1", "p2")
    x, y, z = l2.alias("x"), l2.alias("y"), l2.alias("z")
    cand = (
        x.join(
            y,
            (F.col("x.p1") == F.col("y.p1"))
            & (F.col("x.p2") < F.col("y.p2")),
        )
        .join(
            z,
            (F.col("z.p1") == F.col("x.p2"))
            & (F.col("z.p2") == F.col("y.p2")),
        )
        .select(
            F.col("x.p1").alias("p1"),
            F.col("x.p2").alias("p2"),
            F.col("y.p2").alias("p3"),
        )
    )
    m1 = m.select(F.col("part").alias("p1"), F.col("cust").alias("c1"))
    m2 = m.select(F.col("part").alias("p2"), F.col("cust").alias("c2"))
    m3 = m.select(F.col("part").alias("p3"), F.col("cust").alias("c3"))
    return (
        cand.join(m1, on="p1")
        .join(m2, (F.col("c2") == F.col("c1")) & (m2["p2"] == cand["p2"]))
        .join(m3, (F.col("c3") == F.col("c1")) & (m3["p3"] == cand["p3"]))
        .groupBy(cand["p1"], cand["p2"], cand["p3"])
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= _APRIORI_MIN_SUP)
    )


# --- per-brand OLS revenue trend, exact rational (round 13) ------------------
# Grouped least-squares slope — the workhorse "is this segment growing"
# statistic — with the float pitfall removed: slope = (nΣxy − ΣxΣy) /
# (nΣx² − (Σx)²) over (month index, monthly revenue cents) is a ratio
# of EXACT integer sums, so both the numerator and denominator ship as
# BIGINTs plus a ×10^4 truncating-div fixed-point slope — nothing is
# ever float-summed or re-rounded (the ANOVA/Mann-Kendall discipline).
# One aggregation to (brand, month), one to brand: partial aggregates
# all the way, no window, no shuffle beyond the two keys. Overflow
# headroom: cents ≤ ~1e9·month-count 80 → Σxy ≤ 6e12, n·Σxy ≤ 5e14.

_OLS_SLOPE_SCALE = 10_000


def _ols_trend_oracle() -> str:
    return """
WITH bm AS (
  SELECT p.p_brand AS brand,
         CAST(DATE_DIFF('month', DATE '1995-01-01',
                        CAST(l.l_shipdate AS DATE)) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2),
s AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM bm GROUP BY brand)
SELECT brand, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                 ELSE ((n * sxy - sx * sy) * %(scale)s)
                      // (n * sxx - sx * sx) END AS BIGINT)
         AS slope_cents_per_month_x10000
FROM s
""".strip() % {"scale": _OLS_SLOPE_SCALE}


@register("brand_ols_trend", oracle=_ols_trend_oracle())
def brand_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.months_between(
            F.date_trunc("month", F.to_date("l_shipdate")),
            F.lit("1995-01-01").cast("date"),
        )
        .cast("long")
        .alias("x"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        )
        .cast("long")
        .alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    bm = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("brand", "x")
        .agg(F.sum("cents").cast("long").alias("y"))
    )
    s = bm.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return s.select(
        "brand",
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("slope_den"),
        F.expr(
            f"CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0"
            f" ELSE ((n * sxy - sx * sy) * {_OLS_SLOPE_SCALE})"
            f" div (n * sxx - sx * sx) END AS BIGINT)"
        ).alias("slope_cents_per_month_x10000"),
    )


# --- deterministic graph walks (round 13) -------------------------------------
# Walk-based graph sampling — the corpus generator behind
# DeepWalk/node2vec-style graph embeddings — made bit-reproducible: one
# walker per seed (the mod-500 BFS convention), 4 steps, and the step-t
# transition from u is the out-neighbor minimizing an LCG hash of
# (u, v, t) — a deterministic stand-in for the uniform draw that
# replays identically in any engine (the MIS priority trick). Each
# step is one edge join + one per-walker min-aggregate under the
# (hash, neighbor) total order; walker state is seed-sized, the edge
# fact is persisted once — at 100 TB this is exactly the batched
# random-walk engine layout (walker frontier vs static edge fact).

_WALK_STEPS = 4
_WALK_A, _WALK_B, _WALK_C = 48271, 69621, 12345
_WALK_M = 2147483647


def _walk_h_sql(u: str, v: str, t: int) -> str:
    return f"({u} * {_WALK_A} + {v} * {_WALK_B} + {t} * {_WALK_C}) % {_WALK_M}"


def _walks_oracle() -> str:
    steps = []
    for t in range(1, _WALK_STEPS + 1):
        steps.append(f"""
w{t} AS MATERIALIZED (
  SELECT seed, node FROM (
    SELECT w.seed, e.dst AS node,
           ROW_NUMBER() OVER (
             PARTITION BY w.seed
             ORDER BY {_walk_h_sql("w.node", "e.dst", t)} ASC, e.dst ASC
           ) AS rn
    FROM w{t - 1} w JOIN e ON e.src = w.node) s
  WHERE rn = 1)""")
    union = "\nUNION ALL\n".join(
        f"SELECT CAST(seed AS BIGINT) AS seed, CAST({t} AS BIGINT) AS step,"
        f" CAST(node AS BIGINT) AS node FROM w{t}"
        for t in range(_WALK_STEPS + 1)
    )
    return f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
w0 AS (SELECT DISTINCT src AS seed, src AS node FROM e
       WHERE src % {_BFS_SEED_MOD} = 0),
{",".join(s.strip() for s in steps)}
{union}
""".strip()


@register("part_copurchase_walks", oracle=_walks_oracle())
def part_copurchase_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = copurchase_edges(spark, sf_dir).distinct().persist()
    cur = (
        edges.where(F.col("src") % _BFS_SEED_MOD == 0)
        .select(F.col("src").alias("seed"), F.col("src").alias("node"))
        .distinct()
    )
    out = cur.select(
        "seed", F.lit(0).cast("long").alias("step"), "node"
    )
    for t in range(1, _WALK_STEPS + 1):
        nxt = (
            edges.join(cur, edges["src"] == cur["node"])
            .select(
                "seed",
                F.col("dst").alias("cand"),
                F.expr(_walk_h_sql("node", "dst", t)).alias("h"),
            )
            .groupBy("seed")
            .agg(F.min(F.struct("h", "cand")).alias("b"))
            .select("seed", F.col("b.cand").alias("node"))
            .persist()  # read by the output union AND the next step
        )
        out = out.unionByName(
            nxt.select("seed", F.lit(t).cast("long").alias("step"), "node")
        )
        cur = nxt
    return out


# --- Theil–Sen robust trend (round 13) ----------------------------------------
# The robust companion to brand_ols_trend: the Theil–Sen estimator is
# the MEDIAN of all pairwise slopes (y_j−y_i)/(x_j−x_i) — 29%
# breakdown vs OLS's zero. Cross-engine float discipline: each pairwise
# slope is ONE IEEE division of two exact integers (correctly rounded
# identically everywhere); the median selects (or averages two of)
# those quotients by rank with a deterministic (slope, i, j) tie
# order, so no float is ever accumulated — the same single-division
# contract as doc_weighted_priority_sample. Pair generation is bounded:
# it joins the (brand, month) AGGREGATE with itself — ≤ months² rows
# per brand, never lineitem-sized — the calendar-bounded quadratic of
# the Mann-Kendall precedent.


def _theil_sen_oracle() -> str:
    return """
WITH bm AS (
  SELECT p.p_brand AS brand,
         CAST(DATE_DIFF('month', DATE '1995-01-01',
                        CAST(l.l_shipdate AS DATE)) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2),
sl AS (
  SELECT a.brand,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS s,
         a.x AS xi, b.x AS xj
  FROM bm a JOIN bm b ON a.brand = b.brand AND a.x < b.x),
rk AS (
  SELECT brand, s,
         ROW_NUMBER() OVER (PARTITION BY brand
                            ORDER BY s, xi, xj) AS rn,
         COUNT(*) OVER (PARTITION BY brand) AS n
  FROM sl)
SELECT brand, CAST(MAX(n) AS BIGINT) AS n_pairs,
       SUM(CASE WHEN rn = (n + 1) // 2 THEN s ELSE 0 END)
         + SUM(CASE WHEN n % 2 = 0 AND rn = n // 2 + 1 THEN s ELSE 0 END)
         AS med2
FROM rk
GROUP BY brand
""".strip()


@register(
    "brand_theil_sen",
    oracle=f"""
WITH base AS ({_theil_sen_oracle()})
SELECT brand, n_pairs,
       CASE WHEN n_pairs % 2 = 0 THEN med2 / 2.0 ELSE med2 END
         AS theil_sen_slope
FROM base""".strip(),
)
def brand_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.months_between(
            F.date_trunc("month", F.to_date("l_shipdate")),
            F.lit("1995-01-01").cast("date"),
        )
        .cast("long")
        .alias("x"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        )
        .cast("long")
        .alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    bm = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("brand", "x")
        .agg(F.sum("cents").cast("long").alias("y"))
    )
    a, b = bm.alias("a"), bm.alias("b")
    sl = a.join(
        b,
        (F.col("a.brand") == F.col("b.brand"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.brand").alias("brand"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("s"),
        F.col("a.x").alias("xi"),
        F.col("b.x").alias("xj"),
    )
    wrk = Window.partitionBy("brand").orderBy("s", "xi", "xj")
    wn = Window.partitionBy("brand")
    rk = sl.select(
        "brand",
        "s",
        F.row_number().over(wrk).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    agg = rk.groupBy("brand").agg(
        F.max("n").cast("long").alias("n_pairs"),
        (
            F.sum(
                F.when(F.expr("rn = (n + 1) div 2"), F.col("s")).otherwise(
                    0.0
                )
            )
            + F.sum(
                F.when(
                    F.expr("n % 2 = 0 AND rn = n div 2 + 1"), F.col("s")
                ).otherwise(0.0)
            )
        ).alias("med2"),
    )
    return agg.select(
        "brand",
        "n_pairs",
        F.when(F.col("n_pairs") % 2 == 0, F.col("med2") / 2.0)
        .otherwise(F.col("med2"))
        .alias("theil_sen_slope"),
    )


# --- time-respecting reachability on the temporal co-purchase graph ----------
# Temporal-network semantics (Holme–Saramäki): an edge is an EVENT
# (src, dst, t), and a path is valid only if successive event times are
# non-decreasing — static reachability over-counts badly on temporal
# data ("A knew X in 1995, B met A in 1998" ≠ "X reached B in 1995").
# Earliest-arrival BFS from the mod-500 seed set, 3 hops: the state is
# (node, earliest arrival day) and the optimal-substructure fact that
# arriving EARLIER never hurts (any edge a later arrival may take, an
# earlier one may too) makes the SSSP-style min-relaxation exact —
# each round is one time-filtered edge join + one min-aggregate, the
# weighted-SSSP loop with the time constraint in the join predicate.
# Temporal edges carry the ORDER DATE (integer days since epoch);
# everything is exact integers.

_TEMPORAL_HOPS = 3


def _temporal_reach_oracle() -> str:
    rounds = []
    for r in range(1, _TEMPORAL_HOPS + 1):
        rounds.append(f"""
d{r} AS MATERIALIZED (
  SELECT node, CAST(MIN(arr) AS BIGINT) AS arr FROM (
    SELECT node, arr FROM d{r - 1}
    UNION ALL
    SELECT e.dst AS node, e.t AS arr
    FROM d{r - 1} d JOIN e ON e.src = d.node AND e.t >= d.arr)
  GROUP BY node)""")
    return f"""
WITH li AS (
  SELECT l.l_orderkey, l.l_partkey,
         CAST(CAST(o.o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT)
           AS t
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE CAST(l.l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst, a.t
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
seeds AS (SELECT DISTINCT src AS node FROM e
          WHERE src % {_BFS_SEED_MOD} = 0),
d0 AS (SELECT node, CAST(0 AS BIGINT) AS arr FROM seeds),
{",".join(r.strip() for r in rounds)}
SELECT CAST(node AS BIGINT) AS part_key, arr AS earliest_arrival_day
FROM d{_TEMPORAL_HOPS}
""".strip()


@register("part_temporal_reachability", oracle=_temporal_reach_oracle())
def part_temporal_reachability(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.to_date("l_shipdate")
            >= F.lit(COPURCHASE_SHIPDATE_LO).cast("date")
        )
        .select("l_orderkey", "l_partkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
        )
        .cast("long")
        .alias("t"),
    )
    lt = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "l_orderkey", "l_partkey", "t"
    )
    a, b = lt.alias("a"), lt.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
            F.col("a.t").alias("t"),
        )
        .distinct()
        .persist()  # one temporal edge fact per round
    )
    d = (
        e.where(F.col("src") % _BFS_SEED_MOD == 0)
        .select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.lit(0).cast("long").alias("arr"))
    )
    for _ in range(_TEMPORAL_HOPS):
        relax = e.join(
            d, (e["src"] == d["node"]) & (e["t"] >= d["arr"])
        ).select(e["dst"].alias("node"), e["t"].alias("arr"))
        d = (
            d.unionByName(relax)
            .groupBy("node")
            .agg(F.min("arr").cast("long").alias("arr"))
            # House discipline for iterative loops (CLAUDE.md, Luby MIS
            # lesson): localCheckpoint truncates the lineage so the plan
            # tree stays round-sized; persist() alone keeps the full
            # logical plan growing per round (VERDICT r13 item #5).
            .localCheckpoint(eager=True)
        )
    return d.select(
        F.col("node").alias("part_key"),
        F.col("arr").alias("earliest_arrival_day"),
    )


# --- exact distributed quantiles by histogram refinement (round 13) ----------
# Exact order statistics over a corpus-sized column WITHOUT a global
# sort — the classic distributed-selection algorithm: keep a candidate
# range [lo, hi] and the target rank within it; each round is ONE
# filtered aggregate counting 256 equal-width integer buckets
# (map-side combine, 256 longs to the driver), the bucket holding the
# rank becomes the next range. The range is integer cents, so
# ⌈log₂₅₆(width)⌉ ≤ 3 rounds pin the exact value — at 100 TB that is
# 3 cheap scans against a full shuffle sort's O(n log n) exchange (and
# unlike approx_percentile it is EXACT, rank semantics included).
# Ranks use the percentile_disc convention k = ⌈q·n⌉; ties and
# duplicates are handled by counting, not comparing.

_EXQ_QS = ((25, 100), (50, 100), (75, 100), (99, 100))
_EXQ_BUCKETS = 256


def _exq_oracle() -> str:
    rows = "\nUNION ALL\n".join(
        f"""SELECT '{num}/{den}' AS quantile,
       CAST(CEIL({num} * (SELECT COUNT(*) FROM c) / {den}.0) AS BIGINT)
         AS rank_k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n,
       (SELECT cents FROM (
          SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM c) t
        WHERE rn = CAST(CEIL({num} * (SELECT COUNT(*) FROM c)
                              / {den}.0) AS BIGINT)) AS value_cents"""
        for num, den in _EXQ_QS
    )
    return f"""
WITH c AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem)
{rows}
""".strip()


def histogram_select_kth(c: DataFrame, lo: int, hi: int, k: int) -> int:
    """Exact k-th smallest of column ``cents`` within [lo, hi] by
    256-bucket range refinement — one filtered aggregate per round,
    256 longs of driver traffic. Exposed for randomized property
    tests."""
    rank = int(k)
    while lo < hi:
        width = (hi - lo + _EXQ_BUCKETS) // _EXQ_BUCKETS
        bucket = F.least(
            F.expr(f"(cents - {lo}) div {width}"),
            F.lit(_EXQ_BUCKETS - 1),
        )
        counts = dict(
            (int(r[0]), int(r[1]))
            for r in c.where((F.col("cents") >= lo) & (F.col("cents") <= hi))
            .groupBy(bucket.alias("b"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        acc = 0
        for b in range(_EXQ_BUCKETS):
            cnt = counts.get(b, 0)
            if acc + cnt >= rank:
                rank -= acc
                lo, hi = lo + b * width, min(hi, lo + b * width + width - 1)
                break
            acc += cnt
    return int(lo)


@register("lineitem_exact_quantile_select", oracle=_exq_oracle())
def lineitem_exact_quantile_select(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint(eager=True)  # one scan per refinement round
    )
    n, lo0, hi0 = c.agg(
        F.count(F.lit(1)), F.min("cents"), F.max("cents")
    ).first()
    out: list[tuple[str, int, int, int]] = []
    for num, den in _EXQ_QS:
        k = max(1, -(-num * n // den))  # ⌈num·n/den⌉ in exact ints
        v = histogram_select_kth(c, int(lo0), int(hi0), int(k))
        out.append((f"{num}/{den}", int(k), int(n), v))
    return spark.createDataFrame(
        out, "quantile STRING, rank_k BIGINT, n BIGINT, value_cents BIGINT"
    )


# --- data-driven RFM segmentation: deterministic k-means (round 13) -----------
# customer_rfm_segments scores customers on the rule-based 5×5×5 NTILE
# grid; this query learns the segments instead — exact-integer Lloyd
# (the kmeans_track_deterministic protocol: smallest-key init,
# truncating-div updates, (dist, cluster) argmin order) over the
# 3-dim (r, f, m) score vector, k=4, 3 rounds. Scores are already
# exact small integers on a common 1..5 scale (the NTILE ranks with
# the pinned (value, custkey) tie order), so no standardization float
# ever appears. Output = the 4 learned segment centroids with sizes —
# the "discover the segments" counterpart to the rule grid.

_RFMK_K = 4
_RFMK_ROUNDS = 3


def _rfmk_base_sql() -> str:
    return """q AS (
  SELECT vec_id, [r, f, m] AS qe FROM (
    SELECT o_custkey AS vec_id,
           CAST(NTILE(5) OVER (ORDER BY recency_date, o_custkey)
                AS BIGINT) AS r,
           CAST(NTILE(5) OVER (ORDER BY frequency, o_custkey)
                AS BIGINT) AS f,
           CAST(NTILE(5) OVER (ORDER BY monetary_cents, o_custkey)
                AS BIGINT) AS m
    FROM (
      SELECT o_custkey,
             MAX(CAST(o_orderdate AS DATE)) AS recency_date,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey) rfm) t),
e AS MATERIALIZED (
  SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim, qe[i] AS x
  FROM q, LATERAL (SELECT UNNEST(generate_series(1, 3)) AS i) g)"""


def _rfmk_oracle() -> str:
    r = _RFMK_ROUNDS
    return f"""
WITH {_rfmk_base_sql()},
{{chain}},
n AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM a{r} GROUP BY 1)
SELECT c.cluster, n.n_customers,
       CAST(MAX(CASE WHEN c.dim = 0 THEN c.c END) AS BIGINT) AS r_centroid,
       CAST(MAX(CASE WHEN c.dim = 1 THEN c.c END) AS BIGINT) AS f_centroid,
       CAST(MAX(CASE WHEN c.dim = 2 THEN c.c END) AS BIGINT) AS m_centroid
FROM c{r} c JOIN n USING (cluster)
GROUP BY c.cluster, n.n_customers
""".strip()


@register(
    "customer_rfm_kmeans",
    oracle=None,  # bound below: needs the kmd chain generator
)
def customer_rfm_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_ntile
    from .embeddings import _kmd_assign_expr, _kmd_fit

    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("recency_date"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(scaled_long(F.col("o_totalprice"), 100)).alias(
            "monetary_cents"
        ),
    )
    scored = with_global_ntile(
        rfm, ["recency_date", "o_custkey"], 5, "r"
    )
    scored = with_global_ntile(scored, ["frequency", "o_custkey"], 5, "f")
    scored = with_global_ntile(
        scored, ["monetary_cents", "o_custkey"], 5, "m"
    )
    emb = scored.select(
        F.col("o_custkey").alias("vec_id"),
        F.array(
            F.col("r").cast("long"),
            F.col("f").cast("long"),
            F.col("m").cast("long"),
        ).alias("qe"),
    ).localCheckpoint(eager=True)
    cents = _kmd_fit(emb, _RFMK_K, _RFMK_ROUNDS - 1)
    asg = emb.withColumn("cluster", F.expr(_kmd_assign_expr(cents) + ".c"))
    stats = (
        asg.select("cluster", F.posexplode("qe").alias("dim", "x"))
        .groupBy("cluster", "dim")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "cluster",
            "dim",
            F.expr("s div n").alias("c"),
            (F.col("n")).alias("n_customers"),
        )
    )
    return stats.groupBy("cluster", "n_customers").agg(
        F.max(F.when(F.col("dim") == 0, F.col("c"))).cast("long").alias("r_centroid"),
        F.max(F.when(F.col("dim") == 1, F.col("c"))).cast("long").alias("f_centroid"),
        F.max(F.when(F.col("dim") == 2, F.col("c"))).cast("long").alias("m_centroid"),
    ).select("cluster", "n_customers", "r_centroid", "f_centroid", "m_centroid")


def _bind_rfmk_oracle() -> None:
    from . import _REGISTRY, Query
    from .embeddings import _kmd_round_ctes

    q = _REGISTRY["customer_rfm_kmeans"]
    chain = _kmd_round_ctes(_RFMK_K, _RFMK_ROUNDS, "")
    _REGISTRY["customer_rfm_kmeans"] = Query(
        q.name, q.fn, _rfmk_oracle().replace("{chain}", chain)
    )


_bind_rfmk_oracle()


# --- snapshot diff → CDC changelog (round 13) ----------------------------------
# The INVERSE of cdc_merge_apply: given two table versions, emit the
# row-level change feed (Delta Lake CDF semantics — insert / delete /
# update_preimage+postimage) that would transform one into the other.
# Same deterministic "remote" version as the Merkle reconcile family
# (table_reconcile_checksums): one bucket's rows drift a cent (updates),
# every 5th row of another bucket is missing (deletes), and every
# 997th row of a third is re-keyed past MAX(o_orderkey) (inserts —
# the offset is max+1, derived from the data rather than a fixed
# 10^9, so planted insert keys can NEVER collide with genuine base
# keys at any scale factor; ADVICE r13) — so the changelog
# is provably exactly those rows with all three change types live. Plan: one full outer join
# on the key + value comparison; at 100 TB both sides hash-partition on
# the key (bucketed tables join co-located), and the comparison is on
# canonical exact-integer renderings, never floats.

def _changelog_oracle() -> str:
    return f"""
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
nxt AS (
  SELECT o_orderkey AS k,
         CAST(ROUND(o_totalprice * 100) AS BIGINT)
           + CASE WHEN o_orderkey % {_RECON_BUCKETS} = {_RECON_DRIFT_BUCKET}
                  THEN 1 ELSE 0 END AS cents
  FROM orders
  WHERE NOT (o_orderkey % {_RECON_BUCKETS} = {_RECON_DELETE_BUCKET}
             AND (o_orderkey // {_RECON_BUCKETS}) % 5 = 0)
  UNION ALL
  SELECT o_orderkey + (SELECT MAX(o_orderkey) + 1 FROM orders) AS k,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey % {_RECON_BUCKETS} = 7
    AND (o_orderkey // {_RECON_BUCKETS}) % 997 = 0)
SELECT COALESCE(b.k, n.k) AS o_orderkey,
       CASE WHEN b.k IS NULL THEN 'insert'
            WHEN n.k IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       b.cents AS old_cents, n.cents AS new_cents
FROM base b FULL OUTER JOIN nxt n ON b.k = n.k
WHERE b.k IS NULL OR n.k IS NULL OR b.cents <> n.cents
""".strip()


@register("orders_snapshot_changelog", oracle=_changelog_oracle())
def orders_snapshot_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base = o
    nxt = o.where(
        ~(
            (F.col("k") % _RECON_BUCKETS == _RECON_DELETE_BUCKET)
            & (F.expr(f"(k div {_RECON_BUCKETS}) % 5") == 0)
        )
    ).select(
        "k",
        (
            F.col("cents")
            + F.when(
                F.col("k") % _RECON_BUCKETS == _RECON_DRIFT_BUCKET, 1
            ).otherwise(0)
        ).cast("long").alias("cents"),
    ).unionByName(
        # Insert offset derived from the data (max key + 1): planted
        # insert keys stay disjoint from genuine base keys at every
        # scale factor (a fixed 10^9 collides once real orderkeys reach
        # 1e9 — ADVICE r13).  One driver-side long from a partial-agg
        # max: the histogram-refinement precedent.
        o.where(
            (F.col("k") % _RECON_BUCKETS == 7)
            & (F.expr(f"(k div {_RECON_BUCKETS}) % 997") == 0)
        ).select(
            (
                F.col("k")
                + F.lit(int(o.agg(F.max("k")).first()[0]) + 1)
            ).alias("k"),
            "cents",
        )
    )
    b = base.select(F.col("k").alias("bk"), F.col("cents").alias("old_cents"))
    n = nxt.select(F.col("k").alias("nk"), F.col("cents").alias("new_cents"))
    j = b.join(n, b["bk"] == n["nk"], "full_outer")
    return j.where(
        F.col("bk").isNull()
        | F.col("nk").isNull()
        | (F.col("old_cents") != F.col("new_cents"))
    ).select(
        F.coalesce("bk", "nk").alias("o_orderkey"),
        F.when(F.col("bk").isNull(), "insert")
        .when(F.col("nk").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
        "old_cents",
        "new_cents",
    )


# --- weight-threshold percolation profile (round 13) --------------------------
# Graph-robustness profile: sweep the co-purchase weight threshold and
# watch the giant component dissolve — bond percolation on the weighted
# graph (Newman §16): per threshold w ∈ {2,3,4}, connected components
# over the edges with multiplicity ≥ w, reporting node count, component
# count and the largest component. Weak ties carry the connectivity
# (Granovetter): one step from w=2 to w=3 collapses the structure on
# every fixture. Re-uses the min-label-propagation components operator
# per threshold (each threshold's edge set shrinks sharply, so the
# sweep costs roughly one components run); empty thresholded graphs
# yield an all-zero row rather than vanishing (COALESCE on both
# sides). Oracle = one recursive reach CTE per threshold — w=1 is
# deliberately NOT in the sweep: its oracle recursion is quadratic in
# the giant component (41 s at sf0.01) and the unthresholded
# components capability is already covered by dedup_components.

_PERC_THRESHOLDS = (2, 3, 4)


def _percolation_oracle() -> str:
    blocks = []
    rows = []
    for th in _PERC_THRESHOLDS:
        blocks.append(f"""e{th} AS (
  SELECT u AS src, v AS dst FROM we WHERE w >= {th}
  UNION ALL
  SELECT v AS src, u AS dst FROM we WHERE w >= {th}),
reach{th}(node, label) AS (
  SELECT DISTINCT src AS node, src AS label FROM e{th}
  UNION
  SELECT e.dst, r.label FROM reach{th} r JOIN e{th} e ON r.node = e.src),
cc{th} AS (SELECT node, MIN(label) AS component FROM reach{th} GROUP BY node),
sz{th} AS (SELECT component, COUNT(*) AS cnt FROM cc{th} GROUP BY 1)""")
        rows.append(f"""SELECT CAST({th} AS BIGINT) AS weight_threshold,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cc{th}) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM sz{th}) AS n_components,
       (SELECT CAST(COALESCE(MAX(cnt), 0) AS BIGINT) FROM sz{th})
         AS largest_component""")
    return f"""
WITH RECURSIVE li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
we AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, CAST(COUNT(*) AS BIGINT) AS w
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
{",".join(b.strip() for b in blocks)}
{" UNION ALL ".join(rows)}
""".strip()


@register("part_copurchase_percolation", oracle=_percolation_oracle())
def part_copurchase_percolation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.components import connected_components

    we = copurchase_weighted_edges(spark, sf_dir).localCheckpoint(
        eager=True  # one weighted-edge build feeds every threshold
    )
    out: DataFrame | None = None
    for th in _PERC_THRESHOLDS:
        e = we.where(F.col("w") >= th).select("u", "v")
        cc = connected_components(e, src="u", dst="v")  # → (node, label)
        sz = cc.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))
        row = (
            cc.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
            .crossJoin(
                sz.agg(
                    F.count(F.lit(1)).cast("long").alias("n_components"),
                    F.coalesce(F.max("cnt"), F.lit(0))
                    .cast("long")
                    .alias("largest_component"),
                )
            )
            .select(
                F.lit(th).cast("long").alias("weight_threshold"),
                "n_nodes",
                "n_components",
                "largest_component",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# --- deterministic isolation forest, value tier (round 14) --------------------
# The VALUE-TIER twin of iforest_anomaly (which stays rows-tier: its
# numpy fit draws from np.random and cannot be hash-oracled): the last
# rows-only capability without an exact twin after round 13 closed
# KMeans/selection/PQ/SemDeDup (VERDICT r13 #2). Protocol = a
# deterministic random-cut forest over the exact-integer customer RFM
# feature table (recency days / order count / spend cents): T=8 trees
# of fixed depth D=6 whose every internal node's (feature, threshold)
# is drawn by a 2^31 LCG keyed on (tree, heap-node-id) over the GLOBAL
# per-feature [lo, hi] box; a customer's per-tree path length is the
# first depth at which it is ALONE in its cell (leaf-prefix occupancy
# count = 1), else D — the Liu/Ting/Zhou "anomalies isolate early"
# signal with every quantity an exact integer. The anomaly score is
# ONE IEEE division of the exact path sum by the constant T·D
# (sortable, never summable — the float discipline). Oracle = a
# closed-form cuts CTE (the LCG is pure modular arithmetic, no
# recursion needed) + a D-level chained-CTE unroll of the tree walks —
# the betweenness/MIS precedent. Scale: the cut table is T·(2^D - 1) =
# 504 rows (broadcast), the descent is D broadcast joins over the
# customer-sized feature table, occupancy is one (tree, depth, prefix)
# group-count — nothing quadratic, nothing collected but the six
# [lo, hi] bounds (driver-scalar precedent).

_IFD_TREES = 8
_IFD_DEPTH = 6
_IFD_LCG_A = 1103515245
_IFD_LCG_C = 12345
_IFD_LCG_M = 2_147_483_648  # 2^31: A·s < 2.4e18 < 2^63, overflow-free


def _ifd_oracle() -> str:
    t, d = _IFD_TREES, _IFD_DEPTH
    a, c, m = _IFD_LCG_A, _IFD_LCG_C, _IFD_LCG_M
    descent = []
    prev = "d0"
    for lvl in range(1, d + 1):
        descent.append(f"""d{lvl} AS (
  SELECT p.ck, p.r, p.f, p.m, p.t,
         2 * p.node + CASE WHEN (CASE c.q WHEN 0 THEN p.r
                                          WHEN 1 THEN p.f
                                          ELSE p.m END) <= c.thr
                      THEN 0 ELSE 1 END AS node
  FROM {prev} p JOIN cuts c ON c.t = p.t AND c.n = p.node)""")
        prev = f"d{lvl}"
    lv_rows = ", ".join(
        f"({lvl}, {2 ** (d - lvl)})" for lvl in range(1, d + 1)
    )
    return f"""
WITH feat AS (
  SELECT o_custkey AS ck,
         CAST(MAX(CAST(o_orderdate AS DATE)) - DATE '1992-01-01' AS BIGINT)
           AS r,
         CAST(COUNT(*) AS BIGINT) AS f,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m
  FROM orders GROUP BY o_custkey),
bounds AS (
  SELECT 0 AS q, MIN(r) AS lo, MAX(r) AS hi FROM feat
  UNION ALL SELECT 1, MIN(f), MAX(f) FROM feat
  UNION ALL SELECT 2, MIN(m), MAX(m) FROM feat),
cut0 AS (
  SELECT t, n,
         (t * 1000003 + n * 7919 + {c}) % {m} AS s0
  FROM (SELECT UNNEST(generate_series(1, {t})) AS t),
       (SELECT UNNEST(generate_series(1, {2 ** d - 1})) AS n)),
cut1 AS (SELECT t, n, ({a} * s0 + {c}) % {m} AS s1 FROM cut0),
cut2 AS (SELECT t, n, s1 % 3 AS q, ({a} * s1 + {c}) % {m} AS s2 FROM cut1),
cuts AS (
  SELECT c.t, c.n, c.q, b.lo + c.s2 % (b.hi - b.lo + 1) AS thr
  FROM cut2 c JOIN bounds b USING (q)),
d0 AS (
  SELECT ck, r, f, m, t, 1 AS node
  FROM feat, (SELECT UNNEST(generate_series(1, {t})) AS t)),
{",".join(descent)},
lv AS (SELECT d, dv FROM (VALUES {lv_rows}) AS v(d, dv)),
pre AS (
  SELECT ck, t, l.d, node // l.dv AS pfx FROM d{d}, lv l),
occ AS (
  SELECT t, d, pfx, COUNT(*) AS cnt FROM pre GROUP BY 1, 2, 3),
iso AS (
  SELECT p.ck, p.t,
         COALESCE(MIN(CASE WHEN o.cnt = 1 THEN p.d END), {d}) AS plen
  FROM pre p JOIN occ o ON o.t = p.t AND o.d = p.d AND o.pfx = p.pfx
  GROUP BY p.ck, p.t)
SELECT ck AS c_custkey,
       CAST(SUM(plen) AS BIGINT) AS path_sum,
       CAST(SUM(plen) AS DOUBLE) / {t * d}.0 AS iso_score
FROM iso GROUP BY ck
""".strip()


@register("iforest_deterministic", oracle=_ifd_oracle())
def iforest_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t_cnt, depth = _IFD_TREES, _IFD_DEPTH
    a, c, m = _IFD_LCG_A, _IFD_LCG_C, _IFD_LCG_M
    orders = load_table(spark, sf_dir, "orders")
    feat = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.datediff(
            F.max(F.to_date("o_orderdate")), F.lit("1992-01-01").cast("date")
        )
        .cast("long")
        .alias("r"),
        F.count(F.lit(1)).cast("long").alias("f"),
        F.sum(scaled_long(F.col("o_totalprice"), 100))
        .cast("long")
        .alias("m"),
    ).localCheckpoint(eager=True)  # bounds agg + descent both read it
    row = feat.agg(
        F.min("r"), F.max("r"), F.min("f"), F.max("f"), F.min("m"), F.max("m")
    ).first()
    lo = {0: int(row[0]), 1: int(row[2]), 2: int(row[4])}
    hi = {0: int(row[1]), 1: int(row[3]), 2: int(row[5])}
    cuts = []
    for t in range(1, t_cnt + 1):
        for n in range(1, 2 ** depth):
            s0 = (t * 1000003 + n * 7919 + c) % m
            s1 = (a * s0 + c) % m
            q = s1 % 3
            s2 = (a * s1 + c) % m
            cuts.append((t, n, lo[q] + s2 % (hi[q] - lo[q] + 1), q))
    cut_df = spark.createDataFrame(
        cuts, "ct BIGINT, cn BIGINT, thr BIGINT, q INT"
    )
    cur = feat.select(
        "ck",
        "r",
        "f",
        "m",
        F.explode(
            F.array(*[F.lit(i) for i in range(1, t_cnt + 1)])
        ).alias("t"),
        F.lit(1).cast("long").alias("node"),
    )
    for _ in range(depth):
        cur = (
            cur.join(
                F.broadcast(cut_df),
                (F.col("t") == F.col("ct")) & (F.col("node") == F.col("cn")),
            )
            .select(
                "ck",
                "r",
                "f",
                "m",
                "t",
                (
                    2 * F.col("node")
                    + F.when(
                        F.when(F.col("q") == 0, F.col("r"))
                        .when(F.col("q") == 1, F.col("f"))
                        .otherwise(F.col("m"))
                        <= F.col("thr"),
                        0,
                    ).otherwise(1)
                ).cast("long").alias("node"),
            )
        )
    leaf = cur.select("ck", "t", "node").localCheckpoint(eager=True)
    pre = leaf.select(
        "ck",
        "t",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lvl).alias("d"),
                        F.lit(2 ** (depth - lvl)).alias("dv"),
                    )
                    for lvl in range(1, depth + 1)
                ]
            )
        ).alias("l"),
        F.expr("node").alias("node"),
    ).select("ck", "t", "l.d", F.expr("node div l.dv").alias("pfx"))
    occ = pre.groupBy("t", "d", "pfx").agg(F.count(F.lit(1)).alias("cnt"))
    iso = (
        pre.join(occ, ["t", "d", "pfx"])
        .groupBy("ck", "t")
        .agg(
            F.coalesce(
                F.min(F.when(F.col("cnt") == 1, F.col("d"))), F.lit(depth)
            ).alias("plen")
        )
    )
    return iso.groupBy("ck").agg(
        F.sum("plen").cast("long").alias("path_sum")
    ).select(
        F.col("ck").alias("c_custkey"),
        "path_sum",
        (F.col("path_sum").cast("double") / F.lit(float(t_cnt * depth)))
        .alias("iso_score"),
    )


# --- bounded-distance harmonic centrality (round 14) --------------------------
# Harmonic centrality (Boldi & Vigna 2014: the "which nodes reach the
# network cheaply" centrality that, unlike closeness, is well-defined
# on disconnected graphs) from the mod-500 seed set, distance-bounded
# at 3 hops — the same bounded-sweep contract as the betweenness and
# k-hop operators: H(v) = Σ_{s, 1 ≤ d_s(v) ≤ 3} SCALE div d_s(v),
# every term an exact truncating division of the 10^6 fixed point
# (sum of exact ints — never a float sum). Needs PER-SEED distances
# (khop's global-min-from-the-set is not enough), so the state is the
# (seed, node) settled table built by a level-synchronous multi-source
# BFS: per round one frontier⋈edges expansion + one anti-join against
# the settled set, frontier-sized state, localCheckpoint per round
# (the house iterative-loop discipline). Oracle: recursive
# (s, node, d) BFS + MIN — the khop precedent. Scale: state is
# |seeds|×|reached| with the same seed-density knob every bounded
# graph operator here uses; nothing touches all-pairs.

_HC_HOPS = 3
_HC_SCALE = 1_000_000


def _harmonic_oracle() -> str:
    return f"""
WITH RECURSIVE li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '{COPURCHASE_SHIPDATE_LO}'),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
seeds AS (SELECT DISTINCT src AS node FROM e WHERE src % {_BFS_SEED_MOD} = 0),
bfs(s, node, d) AS (
  SELECT node, node, 0 FROM seeds
  UNION
  SELECT bfs.s, e.dst, bfs.d + 1 FROM bfs JOIN e ON bfs.node = e.src
  WHERE bfs.d < {_HC_HOPS}),
dist AS (SELECT s, node, MIN(d) AS d FROM bfs GROUP BY 1, 2)
SELECT CAST(node AS BIGINT) AS part_key,
       CAST(COUNT(*) AS BIGINT) AS n_sources,
       CAST(SUM({_HC_SCALE} // d) AS BIGINT) AS harmonic_x1e6
FROM dist WHERE d >= 1 GROUP BY node
""".strip()


@register("part_harmonic_centrality", oracle=_harmonic_oracle())
def part_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = copurchase_edges(spark, sf_dir).distinct()
    seeds = (
        edges.where(F.col("src") % _BFS_SEED_MOD == 0)
        .select(F.col("src").alias("node"))
        .distinct()
    )
    settled = seeds.select(
        F.col("node").alias("s"),
        "node",
        F.lit(0).cast("long").alias("d"),
    ).localCheckpoint(eager=True)
    frontier = settled
    for r in range(1, _HC_HOPS + 1):
        new = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select("s", F.col("dst").alias("node"))
            .distinct()
            .join(settled, ["s", "node"], "left_anti")
            .select("s", "node", F.lit(r).cast("long").alias("d"))
            .localCheckpoint(eager=True)
        )
        # settled is a union of ALREADY-checkpointed levels (the seeds
        # checkpoint + each round's `new`), so it needs no checkpoint of
        # its own: the plan is a flat union of ≤ _HC_HOPS+1 materialized
        # leaves, and checkpointing it would RE-materialize the whole
        # settled set every round (measured ~1/3 of the loop's jobs).
        settled = settled.unionByName(new)
        frontier = new
    return (
        settled.where(F.col("d") >= 1)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sources"),
            F.sum(F.expr(f"{_HC_SCALE} div d"))
            .cast("long")
            .alias("harmonic_x1e6"),
        )
        .select(F.col("node").alias("part_key"), "n_sources", "harmonic_x1e6")
    )


# --- PSI distribution drift (round 14) ----------------------------------------
# Population Stability Index — the standard "did my feature/score
# distribution drift between two corpus slices" monitor (credit-risk
# folklore; the training-data version gates mixture rebalancing and
# staleness alarms). Protocol: order spend in exact cents, 16
# equi-width buckets over the GLOBAL [lo, hi] (both slices share the
# grid — drift must not move the goalposts), add-1 smoothed bucket
# shares as ×10^6 truncating-div fixed points, and the PSI log-ratio
# quantized to exact floor-log2 bits (lb(p+1) with lb(x) =
# length(bin(x)) - 1 — the perplexity family's cross-engine log
# discipline; ln is NOT in the exact-float toolkit). Early slice =
# orders before 1995-01-01, late = the rest. Emits one row per bucket
# plus the bucket = -1 grand-total row (the headline PSI). Scale: one
# scan → 16-bucket map-side-combine counts; the only driver scalars
# are [lo, hi] and the two slice totals.

_PSI_BUCKETS = 16
_PSI_SPLIT_DATE = "1995-01-01"
_PSI_SCALE = 1_000_000


def _psi_oracle() -> str:
    nb, sc = _PSI_BUCKETS, _PSI_SCALE
    return f"""
WITH o AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CASE WHEN CAST(o_orderdate AS DATE) < DATE '{_PSI_SPLIT_DATE}'
              THEN 1 ELSE 0 END AS early
  FROM orders),
bounds AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM o),
bk AS (
  SELECT ((o.cents - b.lo) * {nb}) // (b.hi - b.lo + 1) AS bucket,
         o.early
  FROM o, bounds b),
cnt AS (
  SELECT s.bucket,
         COALESCE(SUM(CASE WHEN bk.early = 1 THEN 1 END), 0) + 1 AS ca,
         COALESCE(SUM(CASE WHEN bk.early = 0 THEN 1 END), 0) + 1 AS cb
  FROM (SELECT UNNEST(generate_series(0, {nb - 1})) AS bucket) s
  LEFT JOIN bk ON bk.bucket = s.bucket
  GROUP BY s.bucket),
tot AS (SELECT SUM(ca) AS ta, SUM(cb) AS tb FROM cnt),
p AS (
  SELECT c.bucket,
         CAST(c.ca - 1 AS BIGINT) AS n_early,
         CAST(c.cb - 1 AS BIGINT) AS n_late,
         CAST((c.ca * {sc}) // t.ta AS BIGINT) AS p_early_x1e6,
         CAST((c.cb * {sc}) // t.tb AS BIGINT) AS p_late_x1e6
  FROM cnt c, tot t),
rows_ AS (
  SELECT bucket, n_early, n_late, p_early_x1e6, p_late_x1e6,
         CAST((p_early_x1e6 - p_late_x1e6)
              * ((length(bin(p_early_x1e6 + 1)) - 1)
                 - (length(bin(p_late_x1e6 + 1)) - 1)) AS BIGINT)
           AS contrib_bits_x1e6
  FROM p)
SELECT CAST(bucket AS BIGINT) AS bucket, n_early, n_late,
       p_early_x1e6, p_late_x1e6, contrib_bits_x1e6
FROM rows_
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(SUM(n_early) AS BIGINT),
       CAST(SUM(n_late) AS BIGINT), CAST(SUM(p_early_x1e6) AS BIGINT),
       CAST(SUM(p_late_x1e6) AS BIGINT),
       CAST(SUM(contrib_bits_x1e6) AS BIGINT)
FROM rows_
""".strip()


def _psi_from_counts(spark: SparkSession, counts: DataFrame) -> DataFrame:
    """(bucket, ea, la) raw slice counts (buckets may be missing) →
    the PSI report: full spine, add-1 smoothing, ×10^6 shares,
    floor-log2 contributions, grand-total row. Shared by the batch
    operator and the streaming store's serve step."""
    nb, sc = _PSI_BUCKETS, _PSI_SCALE
    spine = spark.range(nb).select(F.col("id").cast("long").alias("bucket"))
    cnt = (
        spine.join(
            counts.groupBy("bucket").agg(
                F.sum("ea").alias("ea"), F.sum("la").alias("la")
            ),
            "bucket",
            "left",
        )
        .select(
            "bucket",
            (F.coalesce("ea", F.lit(0)) + 1).cast("long").alias("ca"),
            (F.coalesce("la", F.lit(0)) + 1).cast("long").alias("cb"),
        )
        .localCheckpoint(eager=True)  # totals agg + per-bucket math
    )
    t = cnt.agg(F.sum("ca"), F.sum("cb")).first()
    ta, tb = int(t[0]), int(t[1])
    lb = lambda col: F.length(F.bin(col)) - 1  # noqa: E731
    p = cnt.select(
        "bucket",
        (F.col("ca") - 1).cast("long").alias("n_early"),
        (F.col("cb") - 1).cast("long").alias("n_late"),
        F.expr(f"CAST((ca * {sc}) div {ta} AS BIGINT)").alias(
            "p_early_x1e6"
        ),
        F.expr(f"CAST((cb * {sc}) div {tb} AS BIGINT)").alias(
            "p_late_x1e6"
        ),
    )
    rows = p.select(
        "bucket",
        "n_early",
        "n_late",
        "p_early_x1e6",
        "p_late_x1e6",
        (
            (F.col("p_early_x1e6") - F.col("p_late_x1e6"))
            * (
                lb(F.col("p_early_x1e6") + 1) - lb(F.col("p_late_x1e6") + 1)
            )
        )
        .cast("long")
        .alias("contrib_bits_x1e6"),
    ).localCheckpoint(eager=True)  # bucket rows + the grand-total row
    total = rows.agg(
        F.lit(-1).cast("long").alias("bucket"),
        F.sum("n_early").cast("long").alias("n_early"),
        F.sum("n_late").cast("long").alias("n_late"),
        F.sum("p_early_x1e6").cast("long").alias("p_early_x1e6"),
        F.sum("p_late_x1e6").cast("long").alias("p_late_x1e6"),
        F.sum("contrib_bits_x1e6").cast("long").alias("contrib_bits_x1e6"),
    )
    return rows.unionByName(total)


def _psi_sliced_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cents, early) for every order — the shared slice projection."""
    return load_table(spark, sf_dir, "orders").select(
        scaled_long(F.col("o_totalprice"), 100).alias("cents"),
        F.when(
            F.to_date("o_orderdate") < F.lit(_PSI_SPLIT_DATE).cast("date"), 1
        )
        .otherwise(0)
        .alias("early"),
    )


@register("orders_psi_drift", oracle=_psi_oracle())
def orders_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    nb = _PSI_BUCKETS
    o = _psi_sliced_orders(spark, sf_dir)
    row = o.agg(F.min("cents"), F.max("cents")).first()
    lo, hi = int(row[0]), int(row[1])
    bk = o.select(
        F.expr(f"((cents - {lo}) * {nb}) div ({hi} - {lo} + 1)").alias(
            "bucket"
        ),
        "early",
    )
    return _psi_from_counts(
        spark,
        bk.select(
            "bucket",
            F.col("early").alias("ea"),
            (F.lit(1) - F.col("early")).alias("la"),
        ),
    )


# --- isotonic calibration curve (round 14) ------------------------------------
# Monotone calibration of an ordinal predictor against a binary
# outcome — the model-eval primitive behind reliability diagrams and
# isotonic-regression calibrators (Zadrozny & Elkan 2002): here the
# return rate of a lineitem as a function of its quantity bucket
# (10 buckets of 5). The isotonic (L2, increasing) fit is computed by
# the MINIMAX characterization fit_i = max_{j<=i} min_{k>=i}
# mean(y[j..k]) — equivalent to pool-adjacent-violators but closed-
# form, so it unrolls into two tiny group-bys over the ≤ B(B+1)/2
# interval table instead of a sequential merge loop. Every interval
# mean is the ×10^6 truncating-div fixed point of exact integer sums
# (the quantized-minimax protocol; both engines and the pytest replica
# share it bit-for-bit). Scale: ONE corpus-sized bucket aggregation;
# everything after operates on B = 10 rows (55 intervals) — the
# interval enumeration never touches the fact table.

_ISO_BUCKETS = 10
_ISO_BUCKET_WIDTH = 5
_ISO_SCALE = 1_000_000


def _iso_oracle() -> str:
    nb, w, sc = _ISO_BUCKETS, _ISO_BUCKET_WIDTH, _ISO_SCALE
    return f"""
WITH b AS (
  SELECT LEAST({nb - 1},
               (CAST(l_quantity AS BIGINT) - 1) // {w}) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos
  FROM lineitem GROUP BY 1),
iv AS (
  SELECT j.bucket AS j, k.bucket AS k,
         CAST((SUM(m.pos) * {sc}) // SUM(m.n) AS BIGINT) AS mean_x
  FROM b j JOIN b k ON j.bucket <= k.bucket
  JOIN b m ON m.bucket BETWEEN j.bucket AND k.bucket
  GROUP BY j.bucket, k.bucket),
mn AS (
  SELECT i.bucket AS i, v.j, MIN(v.mean_x) AS mn
  FROM b i JOIN iv v ON v.j <= i.bucket AND v.k >= i.bucket
  GROUP BY i.bucket, v.j),
fit AS (SELECT i AS bucket, MAX(mn) AS iso FROM mn GROUP BY i)
SELECT b.bucket, b.n, b.pos,
       CAST((b.pos * {sc}) // b.n AS BIGINT) AS rate_x1e6,
       CAST(f.iso AS BIGINT) AS iso_rate_x1e6
FROM b JOIN fit f USING (bucket)
""".strip()


@register("lineitem_isotonic_calibration", oracle=_iso_oracle())
def lineitem_isotonic_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    nb, w, sc = _ISO_BUCKETS, _ISO_BUCKET_WIDTH, _ISO_SCALE
    li = load_table(spark, sf_dir, "lineitem")
    b = (
        li.select(
            F.least(
                F.lit(nb - 1),
                F.expr(f"(CAST(l_quantity AS BIGINT) - 1) div {w}"),
            ).alias("bucket"),
            (F.col("l_returnflag") == "R").cast("long").alias("y"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("pos"),
        )
        .localCheckpoint(eager=True)  # 10 rows feed 4 consumers below
    )
    bj = b.select(F.col("bucket").alias("j"))
    bk = b.select(F.col("bucket").alias("k"))
    bm = b.select(
        F.col("bucket").alias("m"), F.col("n").alias("mn_"), "pos"
    )
    iv = (
        bj.join(F.broadcast(bk), F.col("j") <= F.col("k"))
        .join(
            F.broadcast(bm),
            (F.col("m") >= F.col("j")) & (F.col("m") <= F.col("k")),
        )
        .groupBy("j", "k")
        .agg(
            F.expr(f"CAST((sum(pos) * {sc}) div sum(mn_) AS BIGINT)").alias(
                "mean_x"
            )
        )
    )
    bi = b.select(F.col("bucket").alias("i"))
    mn = (
        bi.join(
            F.broadcast(iv),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(F.min("mean_x").alias("mn"))
    )
    fit = mn.groupBy(F.col("i").alias("bucket")).agg(
        F.max("mn").cast("long").alias("iso_rate_x1e6")
    )
    return b.join(fit, "bucket").select(
        "bucket",
        "n",
        "pos",
        F.expr(f"CAST((pos * {sc}) div n AS BIGINT)").alias("rate_x1e6"),
        "iso_rate_x1e6",
    )
