"""Trends-pipeline queries (the reference's core workload re-expressed on
the ``events`` table; SURVEY.md §2 rows F1, G1, B5-B9, F2-F5, C7, E1-E3,
M1, plus the as-of merge E6 and sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import month_onehot_cols, month_onehot_sql
from ..functions.stable import (
    scaled_long,
    scaled_long_sql,
    stable_mean,
    stable_mean_sql,
    stable_std,
    stable_std_sql,
)
from ..operators.detrend import (
    DAILY_CTE,
    DETRENDED_CTE,
    MA_CTE,
    daily_aggregate,
    detrend,
    expanding_mean,
)
from ..operators.pivot import KW_VALUES, pivot_wide, pivot_wide_sql
from ..plans.anomaly import (
    ANOMALY_MAP_ORACLE_SQL,
    ANOMALY_MAP_SERIES_ORACLE_SQL,
    ANOMALY_ORACLE_SQL,
    anomaly_map_series_query,
    anomaly_query,
    anomaly_region_map_query,
)
from ..sources.tables import TRENDS_ORACLE_CTE, load_table, trends_view
from . import register

_PREFIX = f"WITH {TRENDS_ORACLE_CTE},\n{DAILY_CTE}"
_PREFIX_DET = f"{_PREFIX},\n{MA_CTE},\n{DETRENDED_CTE}"


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_aggregate(trends_view(spark, sf_dir))


# --- F1 batch twin: tumbling-day aggregation (Main.scala:65-79) -----------


@register(
    "trends_daily_agg",
    oracle=f"{_PREFIX}\nSELECT date, region, kw, value FROM daily",
)
def trends_daily_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _daily(spark, sf_dir)


# --- G1: expanding moving average + detrend (Main.scala:168-195) ----------


@register(
    "trends_detrend",
    oracle=f"{_PREFIX_DET}\n"
    "SELECT date, region, kw, value, moving_avg, detrended FROM det",
)
def trends_detrend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return detrend(expanding_mean(_daily(spark, sf_dir)))


# --- flagship: z-score anomaly flags (notebook cells 13-15) ---------------


register("anomaly_zscore", oracle=ANOMALY_ORACLE_SQL)(anomaly_query)


# --- choropleth feed: sum(|z|) per region over a date window --------------
# (reference `anomaly map.ipynb` cells 3-6 — the published-artifact shape)


register("anomaly_region_map", oracle=ANOMALY_MAP_ORACLE_SQL)(
    anomaly_region_map_query
)


# --- animation-frame feed: per (date, region) total |z| (the reference's
# anim_2020.gif artifact shape) --------------------------------------------


register("anomaly_map_series", oracle=ANOMALY_MAP_SERIES_ORACLE_SQL)(
    anomaly_map_series_query
)


# --- F2: deterministic wide pivot (Main.scala:212-216) --------------------


@register(
    "pivot_wide",
    oracle=f"{_PREFIX}\n{pivot_wide_sql()}",
)
def pivot_wide_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pivot_wide(_daily(spark, sf_dir))


# --- F3: month one-hot, deterministic when-chain (Main.scala:230-238) -----


@register(
    "month_onehot",
    oracle=f"{_PREFIX}\n"
    f"SELECT DISTINCT date, region, {month_onehot_sql('date')} FROM daily",
)
def month_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = _daily(spark, sf_dir).select("date", "region").distinct()
    return keys.select("date", "region", *month_onehot_cols("date"))


# --- E1: features join — wide pivot ⋈ one-hot on (date, region) -----------
# (Main.scala:250). The one-hot side is derived from the same daily keys so
# the join is 1:1; at scale the month side is tiny → broadcast hint.


@register(
    "features_join",
    oracle=f"{_PREFIX},\n"
    f"wide AS ({pivot_wide_sql()}),\n"
    f"onehot AS (SELECT DISTINCT date, region, {month_onehot_sql('date')} FROM daily)\n"
    "SELECT w.*, "
    + ", ".join(
        f"o.is_{m}"
        for m in [
            "January", "February", "March", "April", "May", "June",
            "July", "August", "September", "October", "November", "December",
        ]
    )
    + "\nFROM wide w JOIN onehot o ON w.date = o.date AND w.region = o.region",
)
def features_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    wide = pivot_wide(daily)
    onehot = (
        daily.select("date", "region")
        .distinct()
        .select("date", "region", *month_onehot_cols("date"))
    )
    return wide.join(F.broadcast(onehot), on=["date", "region"], how="inner")


# --- F4: global min/max in ONE pass (vs reference's two jobs,
# spark_main.py:59-60) ------------------------------------------------------


@register(
    "global_minmax_date",
    oracle=f"{_PREFIX}\n"
    "SELECT MIN(date) AS min_date, MAX(date) AS max_date,"
    " CAST(COUNT(*) AS BIGINT) AS n_rows FROM daily",
)
def global_minmax_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _daily(spark, sf_dir).agg(
        F.min("date").alias("min_date"),
        F.max("date").alias("max_date"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --- F5/F8: grouped mean/stddev per region (notebook cell 13) -------------


_VS = scaled_long_sql("value", 100)


@register(
    "value_stats_by_region",
    oracle=f"{_PREFIX}\n"
    f"SELECT region, {stable_mean_sql(_VS, 100)} AS mean_value,"
    f" {stable_std_sql(_VS, 100)} AS std_value,"
    " CAST(COUNT(*) AS BIGINT) AS n FROM daily GROUP BY region",
)
def value_stats_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Raw (unrounded) stable stats: bit-identical across engines; see
    # operators/detrend.py on why rounding rationals is the unstable part.
    vs = scaled_long(F.col("value"), 100)
    return _daily(spark, sf_dir).groupBy("region").agg(
        stable_mean(vs, 100).alias("mean_value"),
        stable_std(vs, 100).alias("std_value"),
        F.count(F.lit(1)).alias("n"),
    )


# --- C7: group-count threshold filter (HAVING + LEFT SEMI JOIN),
# reference producer filter_data (procucer/master/fetch_client.py:88-121) --

_SERIES_MIN_ROWS = 10


@register(
    "series_threshold_filter",
    oracle=f"{_PREFIX}\n"
    "SELECT d.date, d.region, d.kw, d.value FROM daily d\n"
    "WHERE EXISTS (\n"
    "  SELECT 1 FROM daily g WHERE g.region = d.region AND g.kw = d.kw\n"
    f"  GROUP BY g.region, g.kw HAVING COUNT(*) >= {_SERIES_MIN_ROWS})",
)
def series_threshold_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    keep = (
        daily.groupBy("region", "kw")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= _SERIES_MIN_ROWS)
        .select("region", "kw")
    )
    joined = daily.join(F.broadcast(keep), on=["region", "kw"], how="left_semi")
    return joined.select("date", "region", "kw", "value")


# --- E2/E3: union + distinct (Main.scala:151, 283) ------------------------


@register(
    "union_distinct_regions",
    oracle=f"WITH {TRENDS_ORACLE_CTE}\n"
    "SELECT region FROM trends WHERE datetime < TIMESTAMP '2024-01-15'\n"
    "UNION\n"
    "SELECT region FROM trends WHERE datetime >= TIMESTAMP '2024-01-15'",
)
def union_distinct_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = trends_view(spark, sf_dir)
    first = t.where(F.col("datetime") < "2024-01-15").select("region")
    second = t.where(F.col("datetime") >= "2024-01-15").select("region")
    return first.unionByName(second).distinct()


# --- M1: Q-factor correlation normalization (procucer/slave/main.py:17-73)
# re-expressed as a batch query: normalize series kw_1 to kw_0's scale per
# region over their overlapping dates — join → ratio → σ-band filter → mean.


_RS = scaled_long_sql("ratio", 10000)


@register(
    "qfactor_normalization",
    oracle=f"{_PREFIX},\n"
    "ratios AS (\n"
    "  SELECT a.region, a.date, ROUND(a.value / b.value, 4) AS ratio\n"
    "  FROM daily a JOIN daily b ON a.region = b.region AND a.date = b.date\n"
    "  WHERE a.kw = 'kw_0' AND b.kw = 'kw_1' AND a.value <> 0 AND b.value <> 0),\n"
    "stats AS (\n"
    f"  SELECT region, {stable_mean_sql(_RS, 10000)} AS mu,"
    f" {stable_std_sql(_RS, 10000)} AS sigma\n"
    "  FROM ratios GROUP BY region),\n"
    "kept AS (\n"
    "  SELECT r.region, r.ratio\n"
    "  FROM ratios r JOIN stats s ON r.region = s.region\n"
    "  WHERE s.sigma IS NULL OR ABS(r.ratio - s.mu) <= 1.2 * s.sigma)\n"
    f"SELECT region, {stable_mean_sql(_RS, 10000)} AS q_factor,"
    " CAST(COUNT(*) AS BIGINT) AS n_used\n"
    "FROM kept GROUP BY region",
)
def qfactor_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    a = daily.where((F.col("kw") == "kw_0") & (F.col("value") != 0)).select(
        "region", "date", F.col("value").alias("v_old")
    )
    b = daily.where((F.col("kw") == "kw_1") & (F.col("value") != 0)).select(
        "region", "date", F.col("value").alias("v_new")
    )
    ratios = a.join(b, on=["region", "date"]).select(
        "region", "date", F.round(F.col("v_old") / F.col("v_new"), 4).alias("ratio")
    )
    rs = scaled_long(F.col("ratio"), 10000)
    stats = ratios.groupBy("region").agg(
        stable_mean(rs, 10000).alias("mu"), stable_std(rs, 10000).alias("sigma")
    )
    kept = ratios.join(F.broadcast(stats), on="region").where(
        F.col("sigma").isNull()
        | (F.abs(F.col("ratio") - F.col("mu")) <= 1.2 * F.col("sigma"))
    )
    return kept.groupBy("region").agg(
        stable_mean(rs, 10000).alias("q_factor"),
        F.count(F.lit(1)).alias("n_used"),
    )


# --- E6: as-of merge — for each purchase, the most recent prior signup of
# the same user (producer append-only merge, procucer/slave/main.py:210-213,
# generalized). Implemented WITHOUT a join: single window pass using a
# RANGE frame (tie-safe), the scalable as-of idiom.


@register(
    "asof_last_signup",
    oracle="""
WITH tagged AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
         MAX(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END)
           OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup
  FROM events)
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       epoch_us(last_signup) AS last_signup_us
FROM tagged WHERE event_type = 'purchase'
""".strip(),
)
def asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = ev.withColumn(
        "last_signup",
        F.max(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
    )
    return tagged.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("last_signup").alias("last_signup_us"),
    )


# --- exact distinct users per day via bitmap rollup ------------------------
# The bitmap-index trick for EXACT pre-aggregatable distinct counts on
# a bounded id domain (the roaring-bitmap rollup every OLAP cube uses):
# bucket user ids into 63-bit words (word = id div 63, bit = id mod
# 63 — bit 63 stays clear so the signed-int64 shift is portable:
# DuckDB raises on 1<<63 overflow), OR the per-(day, word) masks — an associative, mergeable
# partial — and popcount-sum per day. Two hash aggregates, both with
# map-side combine; no (day, user) distinct shuffle, and day partials
# can roll up further (week/month) by OR-ing stored masks — the
# property approx sketches give up exactness for, here exact because
# the domain is bounded. Cross-engine exact: shiftleft/bit_or/
# bit_count are integer ops in both engines.


@register(
    "daily_user_bitmap_distinct",
    oracle="""
WITH m AS (
  SELECT CAST(ts AS DATE) AS d, user_id // 63 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS mask,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2)
SELECT d AS date, CAST(SUM(bit_count(mask)) AS BIGINT) AS n_distinct_users,
       CAST(SUM(n) AS BIGINT) AS n_events
FROM m GROUP BY d
""".strip(),
)
def daily_user_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(
        F.to_date("ts").alias("date"),
        F.expr("user_id div 63").alias("word"),
    ).agg(
        F.expr(
            "bit_or(shiftleft(1L, CAST(user_id % 63 AS INT)))"
        ).alias("mask"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return m.groupBy("date").agg(
        F.sum(F.bit_count("mask")).cast("long").alias("n_distinct_users"),
        F.sum("n").cast("long").alias("n_events"),
    )


# --- chi-square independence contributions (contingency analysis) ---------
# Is event type independent of day-of-week? The per-cell chi-square
# contribution (O-E)^2/E over the type x dow contingency table,
# computed so every emitted double is CROSS-ENGINE DETERMINISTIC:
# counts and margins are exact int64; the deviation (O*N - rt*ct)
# stays an exact int64 (< 2^53, so its double cast is exact); one
# IEEE multiply and one IEEE divide per cell — both correctly rounded,
# so Spark and DuckDB agree bit-for-bit. The table-level chi2 TOTAL is
# deliberately NOT emitted: a sum of doubles is order-dependent
# (functions/stable.py rationale) — consumers sum the per-cell column
# under their own reduction order. Day-of-week is epoch-day mod 7
# (portable; no engine-specific week-start conventions).

@register(
    "events_chi2_independence",
    oracle="""
WITH e AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
              AS BIGINT) AS dow
  FROM events),
o AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM e GROUP BY event_type, dow),
rt AS (SELECT event_type, CAST(SUM(n_obs) AS BIGINT) AS n_type
       FROM o GROUP BY event_type),
ct AS (SELECT dow, CAST(SUM(n_obs) AS BIGINT) AS n_dow
       FROM o GROUP BY dow),
n AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM o)
SELECT o.event_type, o.dow, o.n_obs, rt.n_type, ct.n_dow,
       CAST(rt.n_type * ct.n_dow AS DOUBLE) / CAST(n.n_total AS DOUBLE)
         AS expected,
       (CAST(o.n_obs * n.n_total - rt.n_type * ct.n_dow AS DOUBLE)
        * CAST(o.n_obs * n.n_total - rt.n_type * ct.n_dow AS DOUBLE))
       / CAST(rt.n_type * ct.n_dow * n.n_total AS DOUBLE) AS chi2_cell
FROM o JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN n
""".strip(),
)
def events_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        (
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            % 7
        )
        .cast("long")
        .alias("dow"),
    )
    o = e.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    # the cell table is tiny (|types| x 7) — persist: three margin
    # consumers would each re-run the corpus aggregate otherwise
    o = o.persist()
    rt = o.groupBy("event_type").agg(
        F.sum("n_obs").cast("long").alias("n_type")
    )
    ct = o.groupBy("dow").agg(F.sum("n_obs").cast("long").alias("n_dow"))
    n = o.agg(F.sum("n_obs").cast("long").alias("n_total"))
    dev = (
        F.col("n_obs") * F.col("n_total")
        - F.col("n_type") * F.col("n_dow")
    ).cast("double")
    return (
        o.join(rt, "event_type")
        .join(ct, "dow")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "dow",
            "n_obs",
            "n_type",
            "n_dow",
            (
                (F.col("n_type") * F.col("n_dow")).cast("double")
                / F.col("n_total").cast("double")
            ).alias("expected"),
            (
                dev * dev
                / (
                    F.col("n_type") * F.col("n_dow") * F.col("n_total")
                ).cast("double")
            ).alias("chi2_cell"),
        )
    )


# --- nearest-direction as-of join with tolerance --------------------------
# The full merge_asof surface (operators/asof.py): for each purchase,
# the NEAREST signup in either direction within 7 days — backward wins
# ties — with the matched timestamp, absolute gap, and direction.
# Same single-window-pass shape as asof_last_signup (no join, no
# range-banding), run in both directions; the oracle mirrors it with
# a RANGE frame per direction.

_ASOF_TOL_US = 7 * 24 * 3600 * 1_000_000


@register(
    "asof_nearest_signup",
    oracle=f"""
WITH tagged AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
         MAX(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END)
           OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bts,
         MIN(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END)
           OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                 RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fts
  FROM events),
sel AS (
  SELECT event_id, user_id, ts,
         CASE
           WHEN bts IS NULL THEN fts
           WHEN fts IS NULL THEN bts
           WHEN epoch_us(fts) - epoch_us(ts)
                < epoch_us(ts) - epoch_us(bts) THEN fts
           ELSE bts END AS mts
  FROM tagged WHERE event_type = 'purchase'),
tol AS (
  SELECT event_id, user_id, ts,
         CASE WHEN mts IS NOT NULL
                   AND ABS(epoch_us(mts) - epoch_us(ts)) <= {_ASOF_TOL_US}
              THEN mts END AS mts
  FROM sel)
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       epoch_us(mts) AS matched_ts_us,
       ABS(epoch_us(mts) - epoch_us(ts)) AS gap_us,
       CASE WHEN mts IS NULL THEN NULL
            WHEN mts <= ts THEN 'backward' ELSE 'forward' END AS direction
FROM tol
""".strip(),
)
def asof_nearest_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.col("event_id").alias("signup_event_id"),
    )
    joined = asof_join(
        purchases,
        signups,
        key="user_id",
        ts="ts",
        direction="nearest",
        tolerance_us=_ASOF_TOL_US,
        tiebreak_col="signup_event_id",
    )
    gap = F.abs(
        F.unix_micros(F.col("asof.ts")) - F.unix_micros(F.col("ts"))
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("asof.ts").alias("matched_ts_us"),
        gap.alias("gap_us"),
        F.when(F.col("asof").isNull(), F.lit(None).cast("string"))
        .when(F.col("asof.ts") <= F.col("ts"), F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )


# --- Sessionization: lag + cumulative-sum session ids (gap > 30 min) ------


@register(
    "sessionize_events",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN CAST(ts AS TIMESTAMP)
                   - LAG(CAST(ts AS TIMESTAMP)) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM ordered)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
FROM sessions GROUP BY user_id, session_id
""".strip(),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    ordered = ev.withColumn(
        "is_new",
        F.when(gap > 30 * 60 * 1_000_000, F.lit(1)).otherwise(F.lit(0)),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = ordered.withColumn("session_id", F.sum("is_new").over(ws))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )


# --- B2/B3: JSON unmarshal of the props payload (Main.scala:47-48 — done
# ONCE with from_json, unlike spark_main.py:42-48's per-field re-parse) ----


@register(
    "json_extract_props",
    oracle="""
SELECT event_id,
       CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS INTEGER) AS k,
       value
FROM events
""".strip(),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("j", F.from_json("props", "k INT"))
    return parsed.select(
        "event_id", F.col("j.k").alias("k"), "value"
    )


# --- B4/A5+B2: Kafka payload marshalling roundtrip ------------------------
# to_json(struct(*)) → CAST-to-binary "Kafka value" → from_json star-expand
# (sources/kafka.py halves). The roundtrip must reproduce the input rows
# exactly, so the oracle is simply the trends projection itself.


@register(
    "json_roundtrip",
    oracle=f"""
WITH {TRENDS_ORACLE_CTE}
SELECT datetime, kw, region, value FROM trends
""".strip(),
)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.kafka import payload_to_records, records_to_payload

    t = trends_view(spark, sf_dir)
    payload = records_to_payload(t).select(
        F.col("value").cast("binary").alias("value")
    )
    return payload_to_records(payload)


# --- M4: zero-padding missing days (producer empty-result padding,
# procucer/slave/main.py:149-177) as a date-spine left join --------------


@register(
    "daily_zero_filled",
    oracle=f"""
WITH {TRENDS_ORACLE_CTE},
{DAILY_CTE},
bounds AS (SELECT MIN(date) AS d0, MAX(date) AS d1 FROM daily),
spine AS (
  SELECT s.date, k.region, k.kw
  FROM (SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS date
        FROM bounds) s
  CROSS JOIN (SELECT DISTINCT region, kw FROM daily) k)
SELECT spine.date, spine.region, spine.kw,
       COALESCE(daily.value, 0.0) AS value,
       CASE WHEN daily.value IS NULL THEN 1 ELSE 0 END AS was_padded
FROM spine LEFT JOIN daily
  ON spine.date = daily.date AND spine.region = daily.region
 AND spine.kw = daily.kw
""".strip(),
)
def daily_zero_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full (date × series) spine with zero-fill for missing days.

    Scale shape: the spine is sequence(min,max) exploded against the
    distinct series list — both tiny relative to the fact table — and
    the left join is hash-partitioned on the series keys; no driver-side
    date loop (the reference pads in Python, procucer/slave/main.py:162-171).
    """
    daily = _daily(spark, sf_dir)
    bounds = daily.agg(
        F.min("date").alias("d0"), F.max("date").alias("d1")
    )
    spine = (
        bounds.select(
            F.explode(F.sequence("d0", "d1")).alias("date")
        )
        .crossJoin(daily.select("region", "kw").distinct())
    )
    return (
        spine.join(daily, on=["date", "region", "kw"], how="left")
        .select(
            "date",
            "region",
            "kw",
            F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
            F.when(F.col("value").isNull(), 1).otherwise(0).alias("was_padded"),
        )
    )


# --- exact percentiles (not in reference; engine-surface completeness) ----


@register(
    "value_percentiles",
    oracle="""
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.9), 4) AS p90,
       ROUND(quantile_cont(value, 0.99), 4) AS p99
FROM events
GROUP BY event_type
""".strip(),
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``: same linear interpolation on the sorted values).
    The scale path for wide cardinalities is ``approx_percentile``
    (KLL/GK sketch) — kept exact here for oracle comparability."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


# --- lead / ntile ranking windows (G-extensions) --------------------------


@register(
    "order_gaps_ntile",
    oracle="""
WITH seq AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS od,
         LEAD(CAST(o_orderdate AS TIMESTAMP))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS next_od
  FROM orders)
SELECT o_custkey, o_orderkey,
       CAST(epoch_us(next_od) - epoch_us(od) AS BIGINT) AS gap_us,
       CAST(NTILE(4) OVER (PARTITION BY o_custkey
            ORDER BY od, o_orderkey) AS INTEGER) AS quartile
FROM seq
""".strip(),
)
def order_gaps_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn(
        "od", F.col("o_orderdate").cast("timestamp")  # parquet NTZ → TS
    )
    w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    nxt = F.lead("od").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.unix_micros(nxt) - F.unix_micros("od")).alias("gap_us"),
        F.ntile(4).over(w).alias("quartile"),
    )


# --- RANGE-frame trailing window (G-extension: value-based frame; the
# reference's G1 uses only a ROWS frame) -----------------------------------


@register(
    "value_7d_range_avg",
    oracle=f"""
{_PREFIX},
scaled AS (
  SELECT region, kw, date, value,
         CAST(ROUND(value * 100) AS BIGINT) AS vs,
         date_diff('day', DATE '1970-01-01', date) AS dd
  FROM daily)
SELECT region, kw, date, value,
       ROUND(CAST(SUM(vs) OVER w AS DOUBLE) / 100.0, 4) AS sum_7d,
       CAST(SUM(vs) OVER w AS DOUBLE) / (COUNT(*) OVER w * 100.0) AS avg_7d,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_days_7d
FROM scaled
WINDOW w AS (PARTITION BY region, kw ORDER BY dd
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""".strip(),
)
def value_7d_range_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day average per series with a RANGE frame keyed on the
    day number — unlike a ROWS frame, missing days shrink the window
    (count what's inside the value range, not the last 7 rows). Exact
    integer window sums keep avg_7d bit-identical to the oracle."""
    daily = _daily(spark, sf_dir)
    w = (
        Window.partitionBy("region", "kw")
        .orderBy(F.unix_date("date"))
        .rangeBetween(-6, Window.currentRow)
    )
    vs = scaled_long(F.col("value"), 100)
    s = F.sum(vs).over(w)
    n = F.count(F.lit(1)).over(w)
    return daily.select(
        "region",
        "kw",
        "date",
        "value",
        F.round(s.cast("double") / 100.0, 4).alias("sum_7d"),
        (s.cast("double") / (n * F.lit(100.0))).alias("avg_7d"),
        n.alias("n_days_7d"),
    )


# --- B-family complement: UNPIVOT (melt) the wide pivot back to long.
# Round-trip semantics: unpivot(pivot(daily)) = the complete
# (date, region) × kw grid with absent combinations filled 0 — exactly
# what na.fill(0) injected on the wide side. Spark plans melt as an
# Expand (no shuffle beyond the pivot's own), so the pair proves both
# directions of the reshape are lossless. ----------------------------------


@register(
    "unpivot_wide",
    oracle=f"{_PREFIX},\n"
    "keys AS (SELECT DISTINCT date, region FROM daily),\n"
    "kws AS (SELECT unnest(["
    + ", ".join(f"'{kw}'" for kw in KW_VALUES)
    + "]) AS kw)\n"
    "SELECT k.date, k.region, s.kw, COALESCE(d.value, 0.0) AS value\n"
    "FROM keys k CROSS JOIN kws s\n"
    "LEFT JOIN daily d ON d.date = k.date AND d.region = k.region"
    " AND d.kw = s.kw",
)
def unpivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = pivot_wide(_daily(spark, sf_dir))
    return wide.unpivot(
        ids=["date", "region"],
        values=list(KW_VALUES),
        variableColumnName="kw",
        valueColumnName="value",
    )


# --- batch interval self-join (the batch twin of stream_interval_join):
# pairs of events by the same user within ±10 minutes. Scale shape: a
# naive |Δt| ≤ w condition on a key-equi-join is fine when per-key
# density is low, but the distributed-correct decomposition buckets time
# into w-sized cells and joins each left row to its own and both
# adjacent cells — the join key becomes (user, cell), equality-only, so
# it shuffles/prunes like any hash join and never degenerates to a
# per-key cross product scan. Each qualifying pair meets exactly once
# (the right row has ONE cell; the left row carries the 3 candidate
# tags, of which exactly one equals it). ----------------------------------


@register(
    "event_pairs_interval_join",
    oracle="""
SELECT a.user_id,
       a.event_id AS event_id_1, b.event_id AS event_id_2,
       a.event_type AS type_1, b.event_type AS type_2,
       CAST(epoch_us(CAST(b.ts AS TIMESTAMP))
            - epoch_us(CAST(a.ts AS TIMESTAMP)) AS BIGINT) AS delta_us
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND abs(epoch_us(CAST(b.ts AS TIMESTAMP))
         - epoch_us(CAST(a.ts AS TIMESTAMP))) <= 600 * 1000000
""".strip(),
)
def event_pairs_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-user event pairs within a ±10-minute band, via the
    bucket-decomposed equi-join (one source scan, self-join)."""
    window_us = 600 * 1_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    # Integer DIV: float division then truncation can misplace a cell
    # boundary by one ulp, letting two in-band events land 2 cells apart
    # and silently dropping the pair.
    cell = F.expr(f"us DIV {window_us}L")
    left = ev.withColumn(
        "cell", F.explode(F.array(cell - 1, cell, cell + 1))
    ).alias("a")
    right = ev.withColumn("cell", cell).alias("b")
    pairs = left.join(
        right,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.cell") == F.col("b.cell"))
        & (F.col("a.event_id") < F.col("b.event_id"))
        & (
            F.abs(F.col("b.us") - F.col("a.us")) <= F.lit(window_us)
        ),
    )
    return pairs.select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_id").alias("event_id_1"),
        F.col("b.event_id").alias("event_id_2"),
        F.col("a.event_type").alias("type_1"),
        F.col("b.event_type").alias("type_2"),
        (F.col("b.us") - F.col("a.us")).alias("delta_us"),
    )


# --- incremental aggregate maintenance (operators/incremental.py): the
# daily rollup maintained as yesterday's STATE merged with the new
# batch's partial aggregate — oracle = the full-recompute daily rollup,
# so the check IS "incremental ≡ from-scratch". The cutoff falls
# mid-day (12:00), so one day's groups genuinely span both partials and
# the merge is exercised, not just unioned disjointly. --------------------

_INCR_CUTOFF = "2024-01-15 12:00:00"


@register(
    "incremental_daily_agg",
    oracle=f"{_PREFIX}\nSELECT date, region, kw, value FROM daily",
)
def incremental_daily_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import merge_partial_aggregates

    trends = trends_view(spark, sf_dir)
    vs = scaled_long(F.col("value"), 100)

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.to_date("datetime").alias("date"), "region", "kw"
        ).agg(F.sum(vs).alias("sum_v"), F.count(F.lit(1)).alias("n"))

    cutoff = F.lit(_INCR_CUTOFF).cast("timestamp")
    state = partial(trends.where(F.col("datetime") < cutoff))
    batch = partial(trends.where(F.col("datetime") >= cutoff))
    merged = merge_partial_aggregates(
        [state, batch], keys=["date", "region", "kw"]
    )
    # identical final expression to daily_aggregate: exact integer sum,
    # one float division, one round
    return merged.select(
        "date",
        "region",
        "kw",
        F.round(F.col("sum_v").cast("double") / 100.0, 4).alias("value"),
    )


# --- funnel / sequence-pattern matching (view → click → purchase, each
# step within 48 h of the previous, anchored at the user's FIRST
# view). One shuffle total: events collect per user into a sorted
# struct array, and every funnel stage is a JVM array expression over
# it (filter → transform → array_min) — no per-stage self-join pass.
# Per-user event counts are bounded in this workload; a pathological
# hot user would call for the salted pre-agg in operators/skew.py. ---------

_FUNNEL_STEP_US = 48 * 3600 * 1_000_000


@register(
    "funnel_view_click_purchase",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events),
v AS (
  SELECT user_id, MIN(us) AS view_us FROM ev
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(e.us) AS click_us
  FROM ev e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click'
    AND e.us BETWEEN v.view_us AND v.view_us + {_FUNNEL_STEP_US}
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, MIN(e.us) AS purchase_us
  FROM ev e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase'
    AND e.us BETWEEN c.click_us AND c.click_us + {_FUNNEL_STEP_US}
  GROUP BY e.user_id)
SELECT u.user_id, v.view_us, c.click_us, p.purchase_us,
       CAST(p.purchase_us IS NOT NULL AS INTEGER) AS converted
FROM (SELECT DISTINCT user_id FROM ev) u
LEFT JOIN v USING (user_id)
LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
""".strip(),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("us", "event_type"))).alias("evs")
    )
    step = _FUNNEL_STEP_US

    def first_in_window(etype: str, lo: str) -> str:
        return (
            f"array_min(transform(filter(evs, e -> e.event_type = '{etype}'"
            f" AND e.us >= {lo} AND e.us <= {lo} + {step}), e -> e.us))"
        )

    return (
        per_user.withColumn(
            "view_us",
            F.expr(
                "array_min(transform(filter(evs,"
                " e -> e.event_type = 'view'), e -> e.us))"
            ),
        )
        .withColumn("click_us", F.expr(first_in_window("click", "view_us")))
        .withColumn(
            "purchase_us", F.expr(first_in_window("purchase", "click_us"))
        )
        .select(
            "user_id",
            "view_us",
            "click_us",
            "purchase_us",
            F.col("purchase_us").isNotNull().cast("int").alias("converted"),
        )
    )


# --- calendar densification + forward fill (gap repair): every series
# gets one row per day between its first and last observation; missing
# days take the last observed value (last_value IGNORE NULLS over an
# expanding frame). The calendar explode is narrow (sequence() per
# series row, no shuffle); the fill is the series' one window pass —
# the same partitioning the detrend pipeline already uses, so at scale
# the exchange is shared. --------------------------------------------------


@register(
    "series_gap_fill_ffill",
    oracle=f"{_PREFIX},\n"
    """
ser AS (
  SELECT region, kw, MIN(date) AS d0, MAX(date) AS d1
  FROM daily GROUP BY region, kw),
cal AS (
  SELECT region, kw,
         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS date
  FROM ser),
joined AS (
  SELECT c.region, c.kw, c.date, d.value
  FROM cal c LEFT JOIN daily d
    ON d.region = c.region AND d.kw = c.kw AND d.date = c.date)
SELECT region, kw, date,
       last_value(value IGNORE NULLS) OVER (
         PARTITION BY region, kw ORDER BY date
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
       CAST(value IS NULL AS INTEGER) AS was_missing
FROM joined
""".strip(),
)
def series_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    ser = daily.groupBy("region", "kw").agg(
        F.min("date").alias("d0"), F.max("date").alias("d1")
    )
    cal = ser.select(
        "region",
        "kw",
        F.explode(F.sequence("d0", "d1")).alias("date"),
    )
    joined = cal.join(daily, ["region", "kw", "date"], "left")
    w = (
        Window.partitionBy("region", "kw")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "region",
        "kw",
        "date",
        F.last("value", ignorenulls=True).over(w).alias("value_filled"),
        F.col("value").isNull().cast("int").alias("was_missing"),
    )


# --- per-series OLS trend slope (closed form): the regression twin of
# the expanding-mean trend estimator. All four moment sums (Σx, Σy,
# Σxy, Σx²) accumulate as exact integers (x = day number, y = value in
# cents), so the final slope/intercept doubles are bit-identical across
# engines with NO rounding — one grouped aggregate, map-side partials,
# one shuffle on the series key. -------------------------------------------


@register(
    "series_trend_slope",
    oracle=f"{_PREFIX},\n"
    """
m AS (
  SELECT region, kw,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(date_diff('day', DATE '2024-01-01', date) AS BIGINT)) AS sx,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sy,
         SUM(CAST(date_diff('day', DATE '2024-01-01', date) AS BIGINT)
             * CAST(ROUND(value * 100) AS BIGINT)) AS sxy,
         SUM(CAST(date_diff('day', DATE '2024-01-01', date) AS BIGINT)
             * CAST(date_diff('day', DATE '2024-01-01', date) AS BIGINT)) AS sxx
  FROM daily GROUP BY region, kw)
SELECT region, kw, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (CAST(n * sxx - sx * sx AS DOUBLE) * 100.0) AS slope_per_day,
       CAST(sy AS DOUBLE) / (n * 100.0)
         - (CAST(n * sxy - sx * sy AS DOUBLE)
            / (CAST(n * sxx - sx * sx AS DOUBLE) * 100.0))
           * (CAST(sx AS DOUBLE) / n) AS intercept
FROM m WHERE n * sxx - sx * sx <> 0
""".strip(),
)
def series_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    x = F.datediff(F.col("date"), F.lit("2024-01-01").cast("date")).cast("long")
    y = scaled_long(F.col("value"), 100)
    m = daily.groupBy("region", "kw").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    det = n * sxx - sx * sx
    slope = (n * sxy - sx * sy).cast("double") / (det.cast("double") * 100.0)
    intercept = sy.cast("double") / (n * F.lit(100.0)) - slope * (
        sx.cast("double") / n
    )
    return m.where(det != 0).select(
        "region",
        "kw",
        "n",
        slope.alias("slope_per_day"),
        intercept.alias("intercept"),
    )


# --- pairwise keyword correlation per region (the Q-factor idea lifted
# to a full correlation matrix): daily series self-joined on
# (region, date) with kw1 < kw2 — the join key is the co-partitioned
# (region, date), so both sides shuffle once and pair expansion happens
# in place; Pearson r comes from exact integer moment sums, sqrt/divide
# on identical doubles both engines. ---------------------------------------


@register(
    "kw_correlation_matrix",
    oracle=f"{_PREFIX},\n"
    """
s AS (
  SELECT region, date, kw, CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM daily),
pairs AS (
  SELECT a.region, a.kw AS kw1, b.kw AS kw2,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(a.v) AS sx, SUM(b.v) AS sy,
         SUM(a.v * b.v) AS sxy,
         SUM(a.v * a.v) AS sxx, SUM(b.v * b.v) AS syy
  FROM s a JOIN s b ON a.region = b.region AND a.date = b.date
                    AND a.kw < b.kw
  GROUP BY a.region, a.kw, b.kw)
SELECT region, kw1, kw2, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
FROM pairs
WHERE n >= 3 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
""".strip(),
)
def kw_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _daily(spark, sf_dir).select(
        "region", "date", "kw", scaled_long(F.col("value"), 100).alias("v")
    )
    a, b = s.alias("a"), s.alias("b")
    joined = a.join(
        b,
        (F.col("a.region") == F.col("b.region"))
        & (F.col("a.date") == F.col("b.date"))
        & (F.col("a.kw") < F.col("b.kw")),
    )
    m = joined.groupBy(
        F.col("a.region").alias("region"),
        F.col("a.kw").alias("kw1"),
        F.col("b.kw").alias("kw2"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a.v").alias("sx"),
        F.sum("b.v").alias("sy"),
        F.sum(F.col("a.v") * F.col("b.v")).alias("sxy"),
        F.sum(F.col("a.v") * F.col("a.v")).alias("sxx"),
        F.sum(F.col("b.v") * F.col("b.v")).alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (
        F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy")
    )
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    r = (n * sxy - sx * sy).cast("double") / (
        F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))
    )
    return m.where((n >= 3) & (vx > 0) & (vy > 0)).select(
        "region", "kw1", "kw2", "n", r.alias("r")
    )


# --- rolling 7-day DISTINCT user count (windowed COUNT DISTINCT — not
# expressible as a Spark window frame). Scale-right shape: each distinct
# (type, day, user) row EXPLODES to the ≤7 anchor days it contributes
# to (one narrow ×7 map), then one distinct-aggregate shuffle on
# (type, anchor day) — no day-range band join, no per-day re-scan, and
# state is bounded by the window length. -----------------------------------


@register(
    "rolling_7d_distinct_users",
    oracle="""
WITH du AS (
  SELECT DISTINCT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         user_id
  FROM events),
days AS (SELECT DISTINCT event_type, day FROM du)
SELECT d.event_type, d.day,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_users_7d
FROM days d JOIN du u
  ON u.event_type = d.event_type AND u.day BETWEEN d.day - 6 AND d.day
GROUP BY d.event_type, d.day
""".strip(),
)
def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    contrib = du.select(
        "event_type",
        # outer: the 7-day sequence is never empty; avoids the inferred
        # size()>0 filter re-evaluating it.
        F.explode_outer(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
        "user_id",
    )
    actual_days = du.select("event_type", "day").distinct()
    return (
        contrib.join(actual_days, ["event_type", "day"], "left_semi")
        .groupBy("event_type", "day")
        .agg(F.countDistinct("user_id").alias("n_users_7d"))
    )


# --- cohort retention: users grouped by first-activity week, activity
# tracked in weeks-since-cohort. Two aggregates: per-user first event
# (one shuffle on user_id), then distinct users per (cohort_week,
# week_offset) — the join back to events is on user_id, the same key as
# the first aggregate, so Catalyst reuses the exchange. Exact integer
# counts; weeks anchored to the Monday of the first event (date_trunc
# 'week' agrees between engines). -----------------------------------------


@register(
    "user_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST((CAST(date_trunc('week', e.ts) AS DATE) - f.cohort_week) // 7
              AS BIGINT) AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id)
SELECT cohort_week, week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM activity GROUP BY cohort_week, week_offset
""".strip(),
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


# --- event-transition matrix (path analysis): per-user consecutive
# event-type bigrams via a lag window partitioned by user (hash-spread,
# never global), counted into the |types|² transition matrix — the
# Sankey/markov-chain input. Ties on identical timestamps broken by
# event_id so the sequence (and thus the matrix) is deterministic. ----------


@register(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type, event_type AS next_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
""".strip(),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


# --- per-series linear forecast: the OLS fit (same exact integer
# moments as series_trend_slope) extrapolated over a 7-day horizon —
# detect (anomaly_zscore) → explain (trend slope) → forecast closes the
# analytics loop. One shuffle (the moments agg); the horizon expansion
# is a lateral explode over 7 literals per series. Predictions are
# intercept + slope·x with both terms bit-identical across engines, so
# the forecast doubles hash-match with no rounding. -------------------------

_FORECAST_H = 7


@register(
    "series_linear_forecast",
    oracle=f"{_PREFIX},\n"
    f"""
m AS (
  SELECT region, kw,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(date_diff('day', DATE '2024-01-01', date) AS BIGINT)) AS sx,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sy,
         SUM(CAST(date_diff('day', DATE '2024-01-01', date) AS BIGINT)
             * CAST(ROUND(value * 100) AS BIGINT)) AS sxy,
         SUM(CAST(date_diff('day', DATE '2024-01-01', date) AS BIGINT)
             * CAST(date_diff('day', DATE '2024-01-01', date) AS BIGINT)) AS sxx,
         MAX(CAST(date_diff('day', DATE '2024-01-01', date) AS BIGINT)) AS max_x
  FROM daily GROUP BY region, kw),
fitted AS (
  SELECT region, kw, max_x,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / (CAST(n * sxx - sx * sx AS DOUBLE) * 100.0) AS slope,
         CAST(sy AS DOUBLE) / (n * 100.0)
           - (CAST(n * sxy - sx * sy AS DOUBLE)
              / (CAST(n * sxx - sx * sx AS DOUBLE) * 100.0))
             * (CAST(sx AS DOUBLE) / n) AS intercept
  FROM m WHERE n * sxx - sx * sx <> 0)
SELECT region, kw,
       CAST(DATE '2024-01-01' + INTERVAL (max_x + h.h) DAY AS DATE)
         AS forecast_date,
       CAST(h.h AS INTEGER) AS horizon_days,
       intercept + slope * CAST(max_x + h.h AS DOUBLE) AS predicted_value
FROM fitted, range(1, {_FORECAST_H} + 1) h(h)
""".strip(),
)
def series_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    x = F.datediff(F.col("date"), F.lit("2024-01-01").cast("date")).cast("long")
    y = scaled_long(F.col("value"), 100)
    m = daily.groupBy("region", "kw").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.max(x).alias("max_x"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    det = n * sxx - sx * sx
    slope = (n * sxy - sx * sy).cast("double") / (det.cast("double") * 100.0)
    intercept = sy.cast("double") / (n * F.lit(100.0)) - slope * (
        sx.cast("double") / n
    )
    fitted = m.where(det != 0).select(
        "region", "kw", "max_x", slope.alias("slope"), intercept.alias("intercept")
    )
    horizon = fitted.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(_FORECAST_H))).alias("h")
    )
    xf = (F.col("max_x") + F.col("h")).cast("long")
    return horizon.select(
        "region",
        "kw",
        F.date_add(F.lit("2024-01-01").cast("date"), xf.cast("int")).alias(
            "forecast_date"
        ),
        F.col("h").cast("int").alias("horizon_days"),
        (F.col("intercept") + F.col("slope") * xf.cast("double")).alias(
            "predicted_value"
        ),
    )


# --- day-of-week seasonality: per-series factor = mean(value | dow)
# / mean(value) — the multiplicative profile a seasonal-adjust stage
# divides out. Both means are exact integer-sum rationals; the factor is
# ONE division of two identically-computed doubles, so no rounding is
# needed for cross-engine equality. dayofweek is ISO-mapped (1=Mon). ---------


@register(
    "series_dow_seasonality",
    oracle=f"{_PREFIX},\n"
    """
s AS (
  SELECT region, kw, isodow(date) AS dow,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM daily),
per_dow AS (
  SELECT region, kw, dow,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         SUM(v) AS sv
  FROM s GROUP BY region, kw, dow)
SELECT region, kw, CAST(dow AS INTEGER) AS dow, n_days,
       (CAST(sv AS DOUBLE) / n_days)
         / (CAST(SUM(sv) OVER w AS DOUBLE) / SUM(n_days) OVER w)
         AS seasonal_factor
FROM per_dow
WINDOW w AS (PARTITION BY region, kw)
QUALIFY SUM(sv) OVER w <> 0
""".strip(),
)
def series_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    # Spark dayofweek: 1=Sunday..7=Saturday → ISO 1=Monday..7=Sunday.
    iso_dow = ((F.dayofweek("date") + 5) % 7) + 1
    s = daily.select(
        "region", "kw", iso_dow.alias("dow"),
        scaled_long(F.col("value"), 100).alias("v"),
    )
    # ONE scan, one shuffle: the per-dow integer partials re-aggregate to
    # the series mean via a window over the ≤7 dow rows per series — no
    # second pass over daily, no join. mean_dow / mean_all from exact
    # integer sums; the series window shares the agg's partitioning.
    per_dow = s.groupBy("region", "kw", "dow").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("v").alias("sv")
    )
    w = Window.partitionBy("region", "kw")
    mean_dow = F.col("sv").cast("double") / F.col("n_days")
    mean_all = F.sum("sv").over(w).cast("double") / F.sum("n_days").over(w)
    return (
        per_dow.withColumn("_all_sv", F.sum("sv").over(w))
        .where(F.col("_all_sv") != 0)
        .select(
            "region",
            "kw",
            F.col("dow").cast("int").alias("dow"),
            "n_days",
            (mean_dow / mean_all).alias("seasonal_factor"),
        )
    )


# --- The producer fleet as an engine-native source (SURVEY §2.A10,
# reference procucer/master/fetch_client.py + README.md:64-87): Spark 4
# Python DataSource emitting the fleet's (date, kw, region, value)
# record shape with one InputPartition per day. The query value-checks
# the CONNECTOR itself — schema, partition fan-out, and every generated
# cell — against a DuckDB generate_series twin, then a companion
# aggregation proves the source composes with the normal query surface. ---


@register(
    "producer_generate",
    oracle="""
WITH days AS (SELECT CAST(i AS INTEGER) AS day_i FROM range(30) t(i)),
kws AS (SELECT CAST(i AS INTEGER) AS kw_i FROM range(20) t(i)),
regions(region_i, region) AS
  (VALUES (0, 'US'), (1, 'CN'), (2, 'IT'), (3, 'IL'), (4, 'UK'))
SELECT DATE '2020-01-01' + day_i AS date,
       'kw_' || CAST(kw_i AS VARCHAR) AS kw,
       region,
       (((day_i * 31 + kw_i * 17 + region_i * 7) % 1000) / 10.0) AS value
FROM days CROSS JOIN kws CROSS JOIN regions
""".strip(),
)
def producer_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.producer_source import register_producer_source

    register_producer_source(spark)
    return spark.read.format("trends_producer").load()


@register(
    "producer_daily_mean",
    oracle="""
WITH days AS (SELECT CAST(i AS INTEGER) AS day_i FROM range(30) t(i)),
kws AS (SELECT CAST(i AS INTEGER) AS kw_i FROM range(20) t(i)),
regions(region_i, region) AS
  (VALUES (0, 'US'), (1, 'CN'), (2, 'IT'), (3, 'IL'), (4, 'UK')),
gen AS (
  SELECT DATE '2020-01-01' + day_i AS date, region,
         CAST((day_i * 31 + kw_i * 17 + region_i * 7) % 1000 AS BIGINT) AS v10
  FROM days CROSS JOIN kws CROSS JOIN regions)
SELECT date, region,
       CAST(SUM(v10) AS BIGINT) AS sum_v10,
       (CAST(SUM(v10) AS DOUBLE) / (10.0 * COUNT(*))) AS mean_value
FROM gen GROUP BY date, region
""".strip(),
)
def producer_daily_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generated stream aggregated per (date, region) — exact-integer
    sums of value×10 keep the mean an IEEE quotient of exact integers
    (functions/stable.py discipline)."""
    from ..sources.producer_source import register_producer_source

    register_producer_source(spark)
    gen = spark.read.format("trends_producer").load()
    v10 = F.round(F.col("value") * 10).cast("long")
    return (
        gen.withColumn("v10", v10)
        .groupBy("date", "region")
        .agg(
            F.sum("v10").alias("sum_v10"),
            (F.sum("v10").cast("double") / (10.0 * F.count(F.lit(1)))).alias(
                "mean_value"
            ),
        )
    )


# --- B2 modern twin: the same props payload through Spark 4's VARIANT
# type (parse_json → variant_get) instead of a fixed from_json schema —
# the open-schema path a semi-structured 100 TB ingest wants when
# producers evolve fields: no schema declaration, shredding stays
# engine-side, and typed access happens per field at query time. The
# oracle reads the identical values with DuckDB's JSON accessors. ---------


@register(
    "json_variant_props",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k,
       CAST(json_extract(props, '$.missing') AS INTEGER) AS missing_field,
       (json_type(json(props)) = 'OBJECT') AS is_object
FROM events
""".strip(),
)
def json_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k"),
        # absent path → NULL, not an error (try semantics)
        F.try_variant_get(v, "$.missing", "int").alias("missing_field"),
        F.schema_of_variant(v).startswith("OBJECT").alias("is_object"),
    )


# --- Recursive-CTE date spine (Spark 4 WITH RECURSIVE surface): the
# calendar spine of the daily series generated by RECURSION instead of
# sequence()+explode, joined to the per-day event totals with gaps
# zero-marked. Declarative SQL-API feature coverage: the anchor is the
# extent's MIN, the recursive member steps one day bounded by a scalar
# subquery, and the DuckDB oracle runs the same WITH RECURSIVE shape.
# Scale note (honest): Spark executes each recursion level as its own
# tiny iteration — fine for calendar-depth recursion (bounded by days,
# cteRecursionLevelLimit raised accordingly), while data-sized spines
# should keep using the sequence()+explode construction
# (daily_zero_filled); this query exists to pin the SQL surface. -----------


@register(
    "recursive_date_spine",
    oracle=f"""
WITH RECURSIVE {TRENDS_ORACLE_CTE},
ev AS (
  SELECT CAST(datetime AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM trends GROUP BY 1),
spine(day) AS (
  SELECT MIN(day) FROM ev
  UNION ALL
  SELECT day + INTERVAL 1 DAY FROM spine
  WHERE day < (SELECT MAX(day) FROM ev)
),
j AS (
  SELECT CAST(s.day AS DATE) AS day,
         COALESCE(ev.n_events, 0) AS n_events
  FROM spine s LEFT JOIN ev ON CAST(s.day AS DATE) = ev.day)
SELECT day, n_events,
       CASE WHEN n_events = 0 THEN 1 ELSE 0 END AS is_gap
FROM j
""".strip(),
)
def recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import trends_view

    trends_view(spark, sf_dir).createOrReplaceTempView("_rds_trends")
    # The recursion limit is enforced when the loop executes, not when
    # the plan is built — so materialize under the raised limit and
    # restore the previous value before returning, instead of leaving a
    # 50× higher limit behind for every later query in the session (a
    # runaway recursive CTE elsewhere should still trip the default).
    # The spine is day-sized (a few thousand rows), so the eager
    # localCheckpoint is cheap.
    key = "spark.sql.cteRecursionLevelLimit"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "5000")
    try:
        return spark.sql(
            """
            WITH RECURSIVE ev AS (
              SELECT CAST(datetime AS DATE) AS day,
                     CAST(COUNT(*) AS BIGINT) AS n_events
              FROM _rds_trends GROUP BY 1),
            spine(day) AS (
              SELECT MIN(day) FROM ev
              UNION ALL
              SELECT date_add(day, 1) FROM spine
              WHERE day < (SELECT MAX(day) FROM ev)
            )
            SELECT s.day AS day,
                   COALESCE(ev.n_events, CAST(0 AS BIGINT)) AS n_events,
                   CASE WHEN COALESCE(ev.n_events, 0) = 0 THEN 1 ELSE 0 END
                     AS is_gap
            FROM spine s LEFT JOIN ev ON s.day = ev.day
            """
        ).localCheckpoint(eager=True)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


# --- per-series OLS trend slope (closed-form regression) ------------------
# The quantitative companion to trends_detrend's moving-average trend
# estimate (Main.scala:168-171): a least-squares slope per
# (region, kw) series — "is this keyword's volume rising, and how
# fast" — computed in ONE grouped aggregation from exact integer sums
# (x = days since epoch, y = 100-scaled daily value; the closed-form
# slope combines the five sums in identical IEEE-double expression
# trees on both engines, so no rounding is needed). Scale: a single
# partial+final hash aggregate over the daily fact — the minimal plan;
# no window, no second pass. Degenerate series (single day) yield NULL
# via the NULLIF-guarded denominator (ANSI-safe).

_SLOPE_EPOCH = "2009-01-01"


@register(
    "trend_slope_by_region",
    oracle=f"""{_PREFIX},
xy AS (
  SELECT region, kw,
         CAST(date - DATE '{_SLOPE_EPOCH}' AS BIGINT) AS x,
         CAST(ROUND(value * 100) AS BIGINT) AS y
  FROM daily),
s AS (
  SELECT region, kw,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx
  FROM xy GROUP BY region, kw)
SELECT region, kw, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / NULLIF((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 100.0, 0.0)
         AS slope_per_day
FROM s""".strip(),
)
def trend_slope_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.detrend import VALUE_SCALE

    daily = _daily(spark, sf_dir)
    xy = daily.select(
        "region",
        "kw",
        F.datediff("date", F.lit(_SLOPE_EPOCH).cast("date"))
        .cast("long")
        .alias("x"),
        scaled_long(F.col("value"), VALUE_SCALE).alias("y"),
    )
    s = xy.groupBy("region", "kw").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy_d, sxx_d = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    den = F.nullif((n_d * sxx_d - sx_d * sx_d) * F.lit(100.0), F.lit(0.0))
    return s.select(
        "region",
        "kw",
        "n",
        ((n_d * sxy_d - sx_d * sy_d) / den).alias("slope_per_day"),
    )


# --- up/down run-length encoding (gaps-and-islands on movement sign) ------
# MATCH_RECOGNIZE-style pattern summarization without the operator:
# consecutive same-direction day-over-day movements of each series
# collapse into runs ("7 straight rising days" is the outbreak-shaped
# signal the reference's z-rule reacts to late). Classic two-window
# gaps-and-islands: direction via lag, island id via a running sum of
# change-points — both windows partitioned on the series key, so the
# whole query is one shuffle on (region, kw) reused across both windows
# and the final aggregate. The series' first day (no predecessor)
# lands in direction 0, identically in both engines (NULL comparisons
# fall through to the flat branch).

@register(
    "value_trend_runs",
    oracle=f"""{_PREFIX},
d AS (
  SELECT region, kw, date,
         CASE WHEN value > LAG(value) OVER w THEN 1
              WHEN value < LAG(value) OVER w THEN -1 ELSE 0 END AS dir
  FROM daily WINDOW w AS (PARTITION BY region, kw ORDER BY date)),
marked AS (
  SELECT region, kw, date, dir,
         CASE WHEN dir IS DISTINCT FROM LAG(dir) OVER w THEN 1 ELSE 0 END
           AS brk
  FROM d WINDOW w AS (PARTITION BY region, kw ORDER BY date)),
runs AS (
  SELECT region, kw, dir, date,
         SUM(brk) OVER (PARTITION BY region, kw ORDER BY date) AS run_id
  FROM marked)
SELECT region, kw, CAST(run_id AS BIGINT) AS run_id,
       CAST(dir AS BIGINT) AS direction,
       MIN(date) AS run_start, CAST(COUNT(*) AS BIGINT) AS run_len
FROM runs GROUP BY region, kw, dir, run_id""".strip(),
)
def value_trend_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("region", "kw").orderBy("date")
    lag_v = F.lag("value").over(w)
    d = daily.select(
        "region",
        "kw",
        "date",
        F.when(F.col("value") > lag_v, F.lit(1))
        .when(F.col("value") < lag_v, F.lit(-1))
        .otherwise(F.lit(0))
        .alias("dir"),
    )
    marked = d.withColumn(
        "brk",
        F.when(F.col("dir").eqNullSafe(F.lag("dir").over(w)), F.lit(0))
        .otherwise(F.lit(1)),
    )
    runs = marked.withColumn("run_id", F.sum("brk").over(w))
    return runs.groupBy("region", "kw", "dir", "run_id").agg(
        F.min("date").alias("run_start"),
        F.count(F.lit(1)).alias("run_len"),
    ).select(
        "region",
        "kw",
        F.col("run_id").cast("long").alias("run_id"),
        F.col("dir").cast("long").alias("direction"),
        "run_start",
        "run_len",
    )


# --- per-series calendar gap-fill + last-observation-carried-forward ------
# The imputation step the reference's notebook does host-side with
# pandas reindex/ffill (M1-M4 masking/stitching family), expressed as a
# distributed operator: each series' calendar spine is generated with
# sequence() FROM ITS OWN bounds aggregate (no global cross join, no
# driver loop), outer-joined to the observations, and filled with
# last(value, ignorenulls) over the series window. One shuffle on the
# series key covers the bounds aggregate, the join, and the fill
# window; spine size is bounded by span × series count (daily grain:
# ~10k rows per series per 30 years — partition-safe at 100 TB).

@register(
    "events_gap_fill_locf",
    oracle=f"""{_PREFIX},
cal AS (
  SELECT b.region, b.kw, CAST(gs.g AS DATE) AS date
  FROM (SELECT region, kw, MIN(date) AS lo, MAX(date) AS hi
        FROM daily GROUP BY 1, 2) b,
       LATERAL (SELECT UNNEST(generate_series(b.lo, b.hi,
                                              INTERVAL 1 DAY)) AS g) gs),
joined AS (
  SELECT c.region, c.kw, c.date, d.value,
         CASE WHEN d.value IS NULL THEN 1 ELSE 0 END AS is_imputed
  FROM cal c LEFT JOIN daily d
    ON c.region = d.region AND c.kw = d.kw AND c.date = d.date)
SELECT region, kw, date,
       LAST_VALUE(value IGNORE NULLS) OVER (
         PARTITION BY region, kw ORDER BY date
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
       CAST(is_imputed AS BIGINT) AS is_imputed
FROM joined""".strip(),
)
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    bounds = daily.groupBy("region", "kw").agg(
        F.min("date").alias("lo"), F.max("date").alias("hi")
    )
    cal = bounds.select(
        "region",
        "kw",
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("date"),
    )
    joined = cal.join(daily, ["region", "kw", "date"], "left")
    w = (
        Window.partitionBy("region", "kw")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "region",
        "kw",
        "date",
        F.last("value", ignorenulls=True).over(w).alias("value_filled"),
        F.when(F.col("value").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_imputed"),
    )


# --- first-order Markov transition counts over user event sequences -------
# Behavioral-model fitting as relational algebra: each user's
# time-ordered event stream yields (prev_type → type) transitions via
# one lag window partitioned on user_id (ties broken by event_id —
# deterministic at any parallelism), then a global count per ordered
# pair. Probabilities are emitted as exact num/den BIGINTs
# (n_trans / n_from) rather than a rounded float — the dq_expectations
# rational-metric convention, so the oracle hash is exact. Scale: the
# lag window shuffles once on user_id; the transition aggregate is over
# a 25-row (|types|²) result — partial aggregation collapses it
# map-side.

@register(
    "markov_event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
t AS (
  SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n_trans
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, event_type, n_trans,
       CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from
FROM t""".strip(),
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    t = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    wf = Window.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "event_type",
        "n_trans",
        F.sum("n_trans").over(wf).alias("n_from"),
    )


# --- 16-day exponentially weighted moving average (exact integers) --------
# EWMA smoothing of each daily series with decay ratio 3/4 over a
# 16-day horizon — the finite-window form s_t = Σ_k w_k·v_{t-k} / Σ w_k
# with w_k = 3^k·4^(15-k) (so w_k/w_0 = (3/4)^k; the infinite-tail mass
# beyond 16 days is (3/4)^16 < 1%). The finite window is what makes the
# statistic EXACT: numerator and denominator are long-integer dot
# products over at most 16 lags (max magnitude Σw_k·v ≈ 2^32·v_cents —
# documented 2^63 envelope), and the emitted double is ONE correctly-
# rounded division of those two integers, so Spark and DuckDB agree
# bit-for-bit with no rounding protocol. Missing days drop out of BOTH
# sums (their weight is excluded, not zero-filled) — the
# irregular-series-safe EWMA. One pid-partitioned window per series,
# no shuffle beyond the (region, kw) hash.

_EWMA_SPAN = 16
_EWMA_W = [3**k * 4 ** (_EWMA_SPAN - 1 - k) for k in range(_EWMA_SPAN)]


@register(
    "series_ewma16",
    oracle=f"{_PREFIX},\n"
    "l AS (\n"
    "  SELECT region, kw, date,\n"
    + ",\n".join(
        f"    lag({scaled_long_sql('value', 100)}, {k}) OVER "
        "(PARTITION BY region, kw ORDER BY date) AS v{0}".format(k)
        for k in range(_EWMA_SPAN)
    )
    + "\n  FROM daily)\n"
    "SELECT region, kw, date,\n"
    "       CAST("
    + " + ".join(
        f"COALESCE(v{k} * {w}, 0)" for k, w in enumerate(_EWMA_W)
    )
    + " AS BIGINT) AS num,\n"
    "       CAST("
    + " + ".join(
        f"(CASE WHEN v{k} IS NULL THEN CAST(0 AS BIGINT)"
        f" ELSE CAST({w} AS BIGINT) END)"
        for k, w in enumerate(_EWMA_W)
    )
    + " AS BIGINT) AS den,\n"
    "       CAST("
    + " + ".join(
        f"COALESCE(v{k} * {w}, 0)" for k, w in enumerate(_EWMA_W)
    )
    + " AS DOUBLE) / CAST(("
    + " + ".join(
        f"(CASE WHEN v{k} IS NULL THEN CAST(0 AS BIGINT)"
        f" ELSE CAST({w} AS BIGINT) END)"
        for k, w in enumerate(_EWMA_W)
    )
    + ") * 100 AS DOUBLE) AS ewma\n"
    "FROM l",
)
def series_ewma16(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("region", "kw").orderBy("date")
    v = scaled_long(F.col("value"), 100)
    lags = [F.lag(v, k).over(w) for k in range(_EWMA_SPAN)]
    num = sum(
        (F.coalesce(lg * F.lit(wk), F.lit(0)) for lg, wk in zip(lags, _EWMA_W)),
        F.lit(0),
    )
    # Weight literals must be LONG: the full-window weight sum
    # (4^16 - 3^16 ≈ 4.25e9) overflows int32.
    den = sum(
        (
            F.when(lg.isNull(), F.lit(0).cast("long")).otherwise(
                F.lit(wk).cast("long")
            )
            for lg, wk in zip(lags, _EWMA_W)
        ),
        F.lit(0).cast("long"),
    )
    return daily.select(
        "region",
        "kw",
        "date",
        num.cast("long").alias("num"),
        den.cast("long").alias("den"),
        (
            num.cast("double") / (den * F.lit(100)).cast("double")
        ).alias("ewma"),
    )


# --- per-series autocorrelation function, lags 1..7 -----------------------
# ACF over each (region, kw) daily series: Pearson r between v_t and
# v_{t-L} for L = 1..7 days — the seasonality detector (a weekly cycle
# shows as an r spike at lag 7). Engine shape: the 7-row lag dimension
# BROADCASTS onto the series to derive each row's lag-L partner date,
# then ONE equi-join back to the daily table on the co-partitioned
# (region, kw, date) key pairs up (v_t, v_{t-L}) — no window, no
# range join, both sides shuffle once on the same key. All five moment
# sums accumulate as exact cents integers (the series_trend_slope
# protocol), so r = (n·sxy − sx·sy) / (√(n·sxx−sx²)·√(n·syy−sy²)) is
# a fixed tree of correctly-rounded double ops — bit-identical across
# engines, no rounding.

_ACF_MAX_LAG = 7


@register(
    "series_autocorr",
    oracle=f"{_PREFIX},\n"
    f"""
s AS (
  SELECT region, kw, date, {scaled_long_sql('value', 100)} AS v
  FROM daily),
lagged AS (
  SELECT a.region, a.kw, g.lag, a.v AS y, b.v AS x
  FROM s a
  JOIN (SELECT UNNEST(generate_series(1, {_ACF_MAX_LAG})) AS lag) g ON TRUE
  JOIN s b ON b.region = a.region AND b.kw = a.kw
          AND b.date = a.date - CAST(g.lag AS INTEGER)),
m AS (
  SELECT region, kw, CAST(lag AS BIGINT) AS lag,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM lagged GROUP BY region, kw, lag)
SELECT region, kw, lag, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
FROM m
WHERE n >= 3 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
""".strip(),
)
def series_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    s = daily.select(
        "region", "kw", "date", scaled_long(F.col("value"), 100).alias("v")
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    probe = s.join(F.broadcast(lags)).select(
        "region",
        "kw",
        "lag",
        F.col("v").alias("y"),
        F.date_sub(F.col("date"), F.col("lag").cast("int")).alias("date"),
    )
    pairs = probe.join(
        s.withColumnRenamed("v", "x"), ["region", "kw", "date"]
    )
    m = pairs.groupBy("region", "kw", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (
        F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy")
    )
    r = (n * sxy - sx * sy).cast("double") / (
        F.sqrt((n * sxx - sx * sx).cast("double"))
        * F.sqrt((n * syy - sy * sy).cast("double"))
    )
    return m.where(
        (n >= 3) & (n * sxx - sx * sx > 0) & (n * syy - sy * sy > 0)
    ).select("region", "kw", "lag", "n", r.alias("r"))


# --- STL-lite seasonal decomposition (trend / weekly seasonal / residual) --
# Classic decomposition of each daily series into trend + day-of-week
# seasonal + residual, with EVERY emitted statistic exact: the trend is
# a centered 7-OBSERVATION moving average (full windows only), the
# seasonal term is the day-of-week mean of the detrended series, the
# residual is what remains — and all three are rationals with exact
# long-integer numerators carried through to a SINGLE correctly-rounded
# division each:
#   trend     = sum7 / (7·100)
#   detrended = (7·v − sum7) / 7                  [cents]
#   seasonal  = Σ_dow(7·v − sum7) / (7·n_dow·100)
#   residual  = (n_dow·(7·v − sum7) − Σ_dow(7·v − sum7)) / (7·n_dow·100)
# No float accumulates across rows, so Spark and DuckDB agree
# bit-for-bit with no rounding protocol. Day-of-week is computed
# portably as pmod(days-since-epoch-anchor, 7). Engine shape: one
# rows-frame window per series (partitioned by the series key — never
# a global window), one (series, dow) aggregate, one co-partitioned
# join back; everything shuffles on the series key it already carries.

_STL_ANCHOR = "2024-01-01"  # Monday; dow 0 = Monday


@register(
    "series_stl_decompose",
    oracle=f"{_PREFIX},\n"
    f"""
s AS (
  SELECT region, kw, date, {scaled_long_sql('value', 100)} AS v,
         CAST(((date_diff('day', DATE '{_STL_ANCHOR}', date) % 7) + 7) % 7
              AS BIGINT) AS dow
  FROM daily),
w AS (
  SELECT region, kw, date, v, dow,
         CAST(SUM(v) OVER f AS BIGINT) AS sum7,
         COUNT(*) OVER f AS n_w
  FROM s
  WINDOW f AS (PARTITION BY region, kw ORDER BY date
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
d AS (
  SELECT region, kw, date, v, dow, sum7, 7 * v - sum7 AS det_num
  FROM w WHERE n_w = 7),
seas AS (
  SELECT region, kw, dow,
         CAST(SUM(det_num) AS BIGINT) AS s_num,
         CAST(COUNT(*) AS BIGINT) AS n_dow
  FROM d GROUP BY region, kw, dow)
SELECT d.region, d.kw, d.date, d.dow,
       CAST(d.sum7 AS DOUBLE) / 700.0 AS trend,
       CAST(s.s_num AS DOUBLE) / CAST(7 * s.n_dow * 100 AS DOUBLE)
         AS seasonal,
       CAST(s.n_dow * d.det_num - s.s_num AS DOUBLE)
         / CAST(7 * s.n_dow * 100 AS DOUBLE) AS residual
FROM d JOIN seas s
  ON s.region = d.region AND s.kw = d.kw AND s.dow = d.dow
""".strip(),
)
def series_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    s = daily.select(
        "region",
        "kw",
        "date",
        scaled_long(F.col("value"), 100).alias("v"),
        F.pmod(
            F.datediff(F.col("date"), F.lit(_STL_ANCHOR).cast("date")),
            F.lit(7),
        )
        .cast("long")
        .alias("dow"),
    )
    f = (
        Window.partitionBy("region", "kw")
        .orderBy("date")
        .rowsBetween(-3, 3)
    )
    w = s.select(
        "*",
        F.sum("v").over(f).alias("sum7"),
        F.count(F.lit(1)).over(f).alias("n_w"),
    )
    d = w.where(F.col("n_w") == 7).withColumn(
        "det_num", F.lit(7) * F.col("v") - F.col("sum7")
    )
    seas = d.groupBy("region", "kw", "dow").agg(
        F.sum("det_num").alias("s_num"),
        F.count(F.lit(1)).cast("long").alias("n_dow"),
    )
    j = d.join(seas, ["region", "kw", "dow"])
    den = (F.lit(7) * F.col("n_dow") * F.lit(100)).cast("double")
    return j.select(
        "region",
        "kw",
        "date",
        "dow",
        (F.col("sum7").cast("double") / F.lit(700.0)).alias("trend"),
        (F.col("s_num").cast("double") / den).alias("seasonal"),
        (
            (F.col("n_dow") * F.col("det_num") - F.col("s_num")).cast(
                "double"
            )
            / den
        ).alias("residual"),
    )


# --- robust z-score outliers (median/MAD, exact half-integer protocol) ----
# The robust twin of anomaly_zscore: the Iglewicz–Hoaglin modified
# z-score M = 0.6745·(v − median)/MAD with the 3.5 outlier cut —
# immune to the outliers a mean/stddev z-score lets poison its own
# baseline. Exactness protocol: a median of integers is a half-integer,
# so DOUBLED medians are exact longs — med2 = 2·median(cents),
# dev2 = |2v − med2| (integers), mad4 = 2·median(dev2) — and
# M = 0.6745 · (2·(2v − med2)/mad4) is a fixed three-op IEEE tree
# (one exact-integer division, one multiply by the same literal) —
# bit-identical across engines with no rounding. Both engines'
# interpolating medians agree exactly because (a+b)/2 on integers is
# representable. Engine shape: two grouped EXACT percentile aggregates
# on the series key + co-partitioned joins back — no window, no
# single-partition funnel; constant series (mad4 = 0) are excluded
# (the statistic is undefined there).

_ROBUST_Z_CUT = 3.5


@register(
    "events_robust_zscore",
    oracle=f"{_PREFIX},\n"
    f"""
s AS (
  SELECT region, kw, date, {scaled_long_sql('value', 100)} AS v
  FROM daily),
med AS (
  SELECT region, kw,
         CAST(2 * quantile_cont(v, 0.5) AS BIGINT) AS med2
  FROM s GROUP BY region, kw),
d AS (
  SELECT s.region, s.kw, s.date, s.v, med.med2,
         ABS(2 * s.v - med.med2) AS dev2
  FROM s JOIN med ON med.region = s.region AND med.kw = s.kw),
mad AS (
  SELECT region, kw,
         CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
  FROM d GROUP BY region, kw)
SELECT d.region, d.kw, d.date, d.v AS v_cents, d.med2, mad.mad4,
       0.6745 * (CAST(2 * (2 * d.v - d.med2) AS DOUBLE)
                 / CAST(mad.mad4 AS DOUBLE)) AS z_mod,
       CAST(CASE WHEN ABS(0.6745 * (CAST(2 * (2 * d.v - d.med2) AS DOUBLE)
                                    / CAST(mad.mad4 AS DOUBLE)))
                      > {_ROBUST_Z_CUT} THEN 1 ELSE 0 END AS BIGINT)
         AS is_outlier
FROM d JOIN mad ON mad.region = d.region AND mad.kw = d.kw
WHERE mad.mad4 > 0
""".strip(),
)
def events_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    s = daily.select(
        "region", "kw", "date", scaled_long(F.col("value"), 100).alias("v")
    )
    med = s.groupBy("region", "kw").agg(
        (F.lit(2) * F.expr("percentile(v, 0.5)")).cast("long").alias("med2")
    )
    d = s.join(med, ["region", "kw"]).withColumn(
        "dev2", F.abs(F.lit(2) * F.col("v") - F.col("med2"))
    )
    mad = d.groupBy("region", "kw").agg(
        (F.lit(2) * F.expr("percentile(dev2, 0.5)"))
        .cast("long")
        .alias("mad4")
    )
    j = d.join(mad, ["region", "kw"]).where(F.col("mad4") > 0)
    z = F.lit(0.6745) * (
        (F.lit(2) * (F.lit(2) * F.col("v") - F.col("med2"))).cast("double")
        / F.col("mad4").cast("double")
    )
    return j.select(
        "region",
        "kw",
        "date",
        F.col("v").alias("v_cents"),
        "med2",
        "mad4",
        z.alias("z_mod"),
        (F.abs(z) > F.lit(_ROBUST_Z_CUT)).cast("long").alias("is_outlier"),
    )


# --- walk-forward forecast backtest (expanding-window regression) ---------
# Model evaluation as a dataflow: at EVERY day of every series, fit the
# OLS trend on all PRIOR days (expanding window) and score the
# prediction against that day's actual — the leakage-free walk-forward
# backtest, the honest way to evaluate series_linear_forecast. The
# engine shape makes "refit at every cutoff" free: the five regression
# moment sums are RUNNING integer sums over a 1-PRECEDING frame
# (series-partitioned window — one shuffle), so each row carries its
# own prior-only model; slope/intercept/prediction/error are a fixed
# tree of IEEE ops on exact integers — bit-identical cross-engine, no
# refit loop, no rounding. Rows need n_prior ≥ 2 and a non-degenerate
# prior design (det > 0).

_BACKTEST_ORACLE = f"{_PREFIX},\n" + f"""
s AS (
  SELECT region, kw, date,
         CAST(date_diff('day', DATE '2024-01-01', date) AS BIGINT) AS x,
         {scaled_long_sql('value', 100)} AS y
  FROM daily),
m AS (
  SELECT region, kw, date, x, y,
         CAST(COUNT(*) OVER wp AS BIGINT) AS n,
         CAST(SUM(x) OVER wp AS BIGINT) AS sx,
         CAST(SUM(y) OVER wp AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER wp AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER wp AS BIGINT) AS sxx
  FROM s
  WINDOW wp AS (PARTITION BY region, kw ORDER BY date
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT region, kw, date, n AS n_prior,
       CAST(y AS DOUBLE) / 100.0 AS actual,
       (CAST(sy AS DOUBLE) / (n * 100.0)
        - (CAST(n * sxy - sx * sy AS DOUBLE)
           / (CAST(n * sxx - sx * sx AS DOUBLE) * 100.0))
          * (CAST(sx AS DOUBLE) / n))
       + (CAST(n * sxy - sx * sy AS DOUBLE)
          / (CAST(n * sxx - sx * sx AS DOUBLE) * 100.0))
         * CAST(x AS DOUBLE) AS predicted,
       CAST(y AS DOUBLE) / 100.0
       - ((CAST(sy AS DOUBLE) / (n * 100.0)
           - (CAST(n * sxy - sx * sy AS DOUBLE)
              / (CAST(n * sxx - sx * sx AS DOUBLE) * 100.0))
             * (CAST(sx AS DOUBLE) / n))
          + (CAST(n * sxy - sx * sy AS DOUBLE)
             / (CAST(n * sxx - sx * sx AS DOUBLE) * 100.0))
            * CAST(x AS DOUBLE)) AS error
FROM m
WHERE n >= 2 AND n * sxx - sx * sx > 0
""".strip()


@register("series_forecast_backtest", oracle=_BACKTEST_ORACLE)
def series_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    s = daily.select(
        "region",
        "kw",
        "date",
        F.datediff(F.col("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        scaled_long(F.col("value"), 100).alias("y"),
    )
    wp = (
        Window.partitionBy("region", "kw")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = s.select(
        "*",
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("x").over(wp).alias("sx"),
        F.sum("y").over(wp).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(wp).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(wp).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    det = n * sxx - sx * sx
    slope = (n * sxy - sx * sy).cast("double") / (det.cast("double") * 100.0)
    intercept = sy.cast("double") / (n * F.lit(100.0)) - slope * (
        sx.cast("double") / n
    )
    pred = intercept + slope * F.col("x").cast("double")
    actual = F.col("y").cast("double") / F.lit(100.0)
    return m.where((n >= 2) & (det > 0)).select(
        "region",
        "kw",
        "date",
        n.alias("n_prior"),
        actual.alias("actual"),
        pred.alias("predicted"),
        (actual - pred).alias("error"),
    )


# --- split-conformal prediction intervals on the backtest ------------------
# Distribution-free uncertainty for the walk-forward forecast: the
# per-series 90th-percentile absolute backtest error becomes the
# interval half-width (split conformal prediction, Vovk et al. /
# Angelopoulos & Bates survey shape), and the report checks its own
# empirical coverage. Determinism chain: backtest errors are IEEE
# trees over exact integers (series_forecast_backtest), the quantile
# is percentile_disc (an actual element, no interpolation), the
# coverage comparison re-reads the same doubles, and coverage is one
# exact division. The backtest frame is persisted — the quantile
# aggregate and the coverage join both consume it.

_CONFORMAL_ORACLE = (
    _BACKTEST_ORACLE.replace(
        "PRECEDING))\nSELECT region, kw, date, n AS n_prior",
        "PRECEDING)),\nbt AS (\nSELECT region, kw, date, n AS n_prior",
        1,
    )
    + """),
q AS (
  SELECT region, kw,
         PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY ABS(error))
           AS q90_abs_error
  FROM bt GROUP BY region, kw)
SELECT bt.region, bt.kw,
       CAST(COUNT(*) AS BIGINT) AS n_backtests,
       q.q90_abs_error,
       CAST(SUM(CASE WHEN ABS(bt.error) <= q.q90_abs_error
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       CAST(SUM(CASE WHEN ABS(bt.error) <= q.q90_abs_error
                     THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS coverage
FROM bt JOIN q USING (region, kw)
GROUP BY bt.region, bt.kw, q.q90_abs_error"""
)


@register("series_conformal_intervals", oracle=_CONFORMAL_ORACLE)
def series_conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    bt = series_forecast_backtest(spark, sf_dir).persist()
    q = bt.groupBy("region", "kw").agg(
        F.expr(
            "percentile_disc(0.9) WITHIN GROUP (ORDER BY abs(error))"
        ).alias("q90_abs_error")
    )
    covered = F.sum(
        F.when(
            F.abs(F.col("error")) <= F.col("q90_abs_error"), 1
        ).otherwise(0)
    )
    return (
        bt.join(q, ["region", "kw"])
        .groupBy("region", "kw", "q90_abs_error")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_backtests"),
            covered.cast("long").alias("n_covered"),
            (
                covered.cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("coverage"),
        )
        .select(
            "region",
            "kw",
            "n_backtests",
            "q90_abs_error",
            "n_covered",
            "coverage",
        )
    )


# --- multi-touch purchase attribution --------------------------------------
# Marketing-style credit assignment: every purchase distributes its
# value over the user's view/click touches in the preceding 7 days —
# last-touch (everything to the most recent touch) and linear (equal
# split) — reported per touch type. The touch<->purchase pairing is the
# banded interval-join pattern (event_pairs_interval_join): touches
# carry their 7-day epoch bucket, purchases probe their own bucket and
# the previous one, so the join is an equi-join on (user, bucket) with
# the exact timestamp range verified inside candidates — never a per-
# user cross join. Money stays exact: integer cents, linear split as
# cents DIV n with the remainder assigned to the last touch (sum of
# shares == purchase cents, no float drift), so the engine and oracle
# agree bit-for-bit.


@register(
    "purchase_attribution",
    oracle="""
WITH p AS (
  SELECT event_id AS p_ev, user_id, ts AS p_ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
t AS (
  SELECT event_id AS t_ev, user_id, ts AS t_ts, event_type AS touch_type
  FROM events WHERE event_type IN ('view', 'click')),
pairs AS (
  SELECT p.p_ev, p.cents, t.t_ev, t.touch_type,
         COUNT(*) OVER (PARTITION BY p.p_ev) AS n,
         ROW_NUMBER() OVER (PARTITION BY p.p_ev
                            ORDER BY t.t_ts DESC, t.t_ev DESC) AS rn
  FROM p JOIN t
    ON t.user_id = p.user_id
   AND t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY)
SELECT touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(CASE WHEN rn = 1 THEN cents ELSE 0 END) AS BIGINT)
         AS lasttouch_cents,
       CAST(SUM(cents // n + CASE WHEN rn = 1 THEN cents % n ELSE 0 END)
            AS BIGINT) AS linear_cents
FROM pairs GROUP BY touch_type
""".strip(),
)
def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    epoch = F.lit("1970-01-01").cast("date")

    def bucket(ts):
        d = F.datediff(F.to_date(ts), epoch)
        return ((d - d % 7) / 7).cast("long")

    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_ev"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        bucket("ts").alias("pb"),
    )
    # probe the touch's own bucket and the previous one (the 7-day
    # lookback spans exactly those two)
    p2 = p.crossJoin(
        F.broadcast(spark.range(2).select(F.col("id").alias("off")))
    ).select("p_ev", "user_id", "p_ts", "cents", (F.col("pb") - F.col("off")).alias("b"))
    t = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("t_ev"),
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
        bucket("ts").alias("b"),
    )
    pairs = p2.join(t, ["user_id", "b"]).where(
        (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAY"))
    )
    w = Window.partitionBy("p_ev")
    wo = w.orderBy(F.col("t_ts").desc(), F.col("t_ev").desc())
    shares = pairs.select(
        "touch_type",
        "cents",
        F.count(F.lit(1)).over(w).alias("n"),
        F.row_number().over(wo).alias("rn"),
    )
    last = F.when(F.col("rn") == 1, F.col("cents")).otherwise(F.lit(0))
    rem = F.when(F.col("rn") == 1, F.col("cents") % F.col("n")).otherwise(
        F.lit(0)
    )
    return shares.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum(last).cast("long").alias("lasttouch_cents"),
        F.sum(
            (F.col("cents") - F.col("cents") % F.col("n")) / F.col("n") + rem
        )
        .cast("long")
        .alias("linear_cents"),
    )


# --- Theil-Sen robust trend slope (bounded pairs window) --------------------
# The robust alternative to series_trend_slope's OLS: the MEDIAN of all
# pairwise slopes over the last 90 days of each event type's daily
# revenue. Pairwise is O(W^2) ONLY within the fixed 90-day tail —
# ~4k pairs per series regardless of corpus size, so the self-join is
# bounded state like series_ewma16's window, never a data-sized
# quadratic. Each slope is one IEEE divide of exact integer deltas;
# percentile_disc picks an actual slope element (bit-exact
# cross-engine — the value_percentiles_by_type protocol).

_TS_WINDOW_DAYS = 90


@register(
    "series_theil_sen_slope",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2),
mx AS (SELECT MAX(d) AS dmax FROM daily),
tail AS (
  SELECT event_type, date_diff('day', DATE '1970-01-01', d) AS di, cents
  FROM daily, mx WHERE d > mx.dmax - INTERVAL {_TS_WINDOW_DAYS} DAY),
slopes AS (
  SELECT a.event_type,
         CAST(b.cents - a.cents AS DOUBLE) / CAST(b.di - a.di AS DOUBLE)
           AS slope
  FROM tail a JOIN tail b
    ON a.event_type = b.event_type AND a.di < b.di)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY slope)
         AS theil_sen_slope
FROM slopes GROUP BY event_type
""".strip(),
)
def series_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    mx = daily.agg(F.max("d").alias("dmax"))
    epoch = F.lit("1970-01-01").cast("date")
    tail = (
        daily.crossJoin(F.broadcast(mx))
        .where(
            F.col("d") > F.date_sub(F.col("dmax"), _TS_WINDOW_DAYS)
        )
        .select(
            "event_type",
            F.datediff("d", epoch).cast("long").alias("di"),
            "cents",
        )
    )
    a, b = tail.alias("a"), tail.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.di") < F.col("b.di")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.cents") - F.col("a.cents")).cast("double")
            / (F.col("b.di") - F.col("a.di")).cast("double")
        ).alias("slope"),
    )
    return slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY slope)").alias(
            "theil_sen_slope"
        ),
    )


# --- session-level bounce/engagement metrics --------------------------------
# Session quality rollup on top of sessionize_events' gap>30min
# sessions: per ENTRY event type (the session's first event —
# min(struct(ts, event_id)) inside the session group, no second
# window), how many sessions start there, how often they bounce
# (single-event sessions), and the mean events per session — bounce
# rate and mean as single IEEE divides of exact counts.


@register(
    "session_bounce_stats",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN CAST(ts AS TIMESTAMP)
                   - LAG(CAST(ts AS TIMESTAMP)) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
sessions AS (
  SELECT user_id, event_type, ts, event_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM ordered),
per_session AS (
  SELECT user_id, session_id,
         (MIN({'ts': ts, 'event_id': event_id, 'et': event_type})).et
           AS entry_type,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM sessions GROUP BY user_id, session_id)
SELECT entry_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS bounce_rate,
       CAST(SUM(n_events) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS mean_events
FROM per_session GROUP BY entry_type
""".strip(),
)
def session_bounce_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    ordered = ev.withColumn(
        "is_new",
        F.when(gap > 30 * 60 * 1_000_000, F.lit(1)).otherwise(F.lit(0)),
    )
    ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = ordered.withColumn("session_id", F.sum("is_new").over(ws))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.min(F.struct("ts", "event_id", "event_type"))["event_type"].alias(
            "entry_type"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounces = F.sum(
        F.when(F.col("n_events") == 1, F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    n = F.count(F.lit(1))
    return per_session.groupBy("entry_type").agg(
        n.alias("n_sessions"),
        bounces.alias("n_bounces"),
        (bounces.cast("double") / n.cast("double")).alias("bounce_rate"),
        (F.sum("n_events").cast("double") / n.cast("double")).alias(
            "mean_events"
        ),
    )


# --- batch CUSUM changepoint estimate (exact-integer protocol) --------------
# The batch twin of stream_cusum_changepoints: per event type, the
# cumulative sum of deviations from the series mean; the day where
# |cusum| peaks is the classic CUSUM single-changepoint estimate.
# Everything stays exact int64 by clearing denominators: dev_i =
# n*x_i - S (cents scaled by n), cusum_i = prefix sum, argmax via
# min(struct(-|cusum|, date)) — no float mean, no order-dependent
# double accumulation; the reported drift_ratio |cusum|/(n*S) is one
# IEEE divide of exact operands. One series-partitioned cumulative
# window + one argmax aggregate.


@register(
    "series_cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s
  FROM daily GROUP BY event_type),
cu AS (
  SELECT d.event_type, d.d, t.n, t.s,
         CAST(SUM(t.n * d.cents - t.s)
           OVER (PARTITION BY d.event_type ORDER BY d.d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cusum
  FROM daily d JOIN tot t ON t.event_type = d.event_type)
SELECT event_type,
       (MIN({'negabs': -abs(cusum), 'd': d, 'c': cusum, 'n': n, 's': s})).d
         AS changepoint_date,
       (MIN({'negabs': -abs(cusum), 'd': d, 'c': cusum, 'n': n, 's': s})).c
         AS cusum_scaled,
       CAST(abs((MIN({'negabs': -abs(cusum), 'd': d, 'c': cusum, 'n': n,
                      's': s})).c) AS DOUBLE)
         / CAST((MIN({'negabs': -abs(cusum), 'd': d, 'c': cusum, 'n': n,
                      's': s})).n
                * (MIN({'negabs': -abs(cusum), 'd': d, 'c': cusum, 'n': n,
                        's': s})).s AS DOUBLE) AS drift_ratio
FROM cu GROUP BY event_type
""".strip(),
)
def series_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").cast("long").alias("s")
    )
    cu = daily.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "d",
        "n",
        "s",
        F.sum(F.col("n") * F.col("cents") - F.col("s"))
        .over(
            Window.partitionBy("event_type")
            .orderBy("d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long")
        .alias("cusum"),
    )
    best = F.min(
        F.struct(
            (-F.abs(F.col("cusum"))).alias("negabs"),
            F.col("d").alias("d"),
            F.col("cusum").alias("c"),
            F.col("n").alias("n"),
            F.col("s").alias("s"),
        )
    )
    return cu.groupBy("event_type").agg(
        best["d"].alias("changepoint_date"),
        best["c"].alias("cusum_scaled"),
        (
            F.abs(best["c"]).cast("double")
            / (best["n"] * best["s"]).cast("double")
        ).alias("drift_ratio"),
    )


# --- ordered funnel conversion (view → click → purchase) -------------------
# The product-analytics funnel with ORDER semantics: a user converts a
# stage only by an event STRICTLY AFTER their previous stage's
# conversion instant — min-after-min, not mere presence (the presence
# version overcounts users who purchased before ever viewing). The
# UNBOUNDED sibling of funnel_view_click_purchase (which windows each
# stage to a step timeout and plans as one per-user collect): with no
# time bound, per-user arrays buy nothing, so the engine shape is
# three per-stage MIN aggregations, each stage joining the previous
# stage's per-user instant and aggregating the conditional min — at
# 100 TB that is three user-keyed shuffles of (user, us) pairs, no
# window over raw events, no self-join of the event table against
# itself. Timestamps ride as unix micros (the sessionize_events
# protocol). Output: one row per user who entered the funnel, with
# per-stage instants and the stage count reached; the stateful
# streaming twin is stream_funnel_transitions.

_FUNNEL_STAGES = ("view", "click", "purchase")


@register(
    "events_funnel",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events),
s1 AS (
  SELECT user_id, MIN(us) AS t1 FROM e
  WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, MIN(e.us) AS t2
  FROM e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.us > s1.t1
  GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, MIN(e.us) AS t3
  FROM e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.us > s2.t2
  GROUP BY e.user_id)
SELECT s1.user_id, s1.t1 AS view_us, s2.t2 AS click_us,
       s3.t3 AS purchase_us,
       CAST(1 + (s2.user_id IS NOT NULL)::INTEGER
              + (s3.user_id IS NOT NULL)::INTEGER AS BIGINT) AS stage
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s2.user_id = s3.user_id
""".strip(),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    v, c, p = _FUNNEL_STAGES
    s1 = (
        ev.where(F.col("event_type") == v)
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == c)
        .join(s1, "user_id")
        .where(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == p)
        .join(s2, "user_id")
        .where(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    out = s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
    return out.select(
        "user_id",
        F.col("t1").alias("view_us"),
        F.col("t2").alias("click_us"),
        F.col("t3").alias("purchase_us"),
        (
            F.lit(1)
            + F.col("t2").isNotNull().cast("int")
            + F.col("t3").isNotNull().cast("int")
        ).cast("long").alias("stage"),
    )


# --- weekly retention cohort matrix ----------------------------------------
# The standard growth-analytics triangle: users cohorted by first-seen
# week, each cohort's active-user count at week offsets 0..k. Two
# grouped aggregations — first-seen per user (min over the scan), then
# (cohort, offset) distinct-user counts — plus retention as an exact
# pair of BIGINTs with one double division. Weeks are epoch-day / 7
# integer arithmetic (no engine week-of-year semantics, which disagree
# across engines and locales). At 100 TB: both shuffles key on
# user_id then (cohort, offset); the distinct rides the second
# aggregate's key (no Expand).

@register(
    "user_retention_matrix",
    oracle="""
WITH e AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(CAST(ts AS TIMESTAMP) AS DATE)) // 7
              AS BIGINT) AS week
  FROM events),
first_seen AS (
  SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id),
cohort_size AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM first_seen GROUP BY cohort_week),
act AS (
  SELECT DISTINCT f.cohort_week, e.week - f.cohort_week AS offset_weeks,
         e.user_id
  FROM e JOIN first_seen f ON e.user_id = f.user_id)
SELECT a.cohort_week,
       CAST(a.offset_weeks AS BIGINT) AS offset_weeks,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       MIN(s.n_users) AS cohort_users,
       CAST(COUNT(*) AS DOUBLE) / MIN(s.n_users) AS retention
FROM act a JOIN cohort_size s ON s.cohort_week = a.cohort_week
GROUP BY a.cohort_week, a.offset_weeks
""".strip(),
)
def user_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            )
            / F.lit(7)
        ).cast("long").alias("week"),
    )
    first_seen = ev.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    cohort_size = first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    act = (
        ev.join(first_seen, "user_id")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("offset_weeks"),
            "user_id",
        )
        .distinct()
    )
    return (
        act.join(cohort_size, "cohort_week")
        .groupBy("cohort_week", "offset_weeks")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.min("n_users").alias("cohort_users"),
            (
                F.count(F.lit(1)).cast("double")
                / F.min("n_users").cast("double")
            ).alias("retention"),
        )
    )


# --- late-arrival audit (watermark sizing from data) ------------------------
# Before picking a streaming watermark delay, measure how late the
# data actually arrives: an event is "late by d" if an event with
# event-time more than d NEWER was already ingested before it
# (arrival order = event_id). The prefix "newest event-time seen so
# far" is the global EXCLUSIVE running max over arrival order —
# computed with the distributed two-shuffle machinery
# (operators/rank.py:with_global_exclusive_running_max), never a bare
# ORDER BY window. One pass scores three candidate delays (1 m / 5 m /
# 30 m) per event type; the output row is what you read to choose
# withWatermark(). Oracle: the same exclusive-frame window MAX.

@register(
    "events_late_arrival_audit",
    oracle="""
WITH e AS (
  SELECT event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events),
m AS (
  SELECT event_type, us,
         MAX(us) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS max_prior_us
  FROM e)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN max_prior_us - us > 60000000
                THEN 1 ELSE 0 END) AS BIGINT) AS late_1m,
       CAST(SUM(CASE WHEN max_prior_us - us > 300000000
                THEN 1 ELSE 0 END) AS BIGINT) AS late_5m,
       CAST(SUM(CASE WHEN max_prior_us - us > 1800000000
                THEN 1 ELSE 0 END) AS BIGINT) AS late_30m
FROM m GROUP BY event_type
""".strip(),
)
def events_late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_exclusive_running_max

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    m = with_global_exclusive_running_max(
        ev, ["event_id"], "us", out_col="max_prior_us"
    )
    def late(th_us):
        return F.sum(
            F.when(F.col("max_prior_us") - F.col("us") > th_us, 1).otherwise(0)
        ).cast("long")
    return m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        late(60_000_000).alias("late_1m"),
        late(300_000_000).alias("late_5m"),
        late(1_800_000_000).alias("late_30m"),
    )


# --- audience overlap between event types (exact Jaccard matrix) -----------
# "Do clickers also purchase?" — the audience-overlap matrix: for each
# ordered pair of event types, |users(A) ∩ users(B)| / |users(A) ∪
# users(B)|. Engine shape: ONE distinct (type, user) pass, a self-join
# on user_id (both sides the same deduplicated frame — ReuseExchange
# covers the scan), per-pair intersection counts, and per-type totals
# broadcast back in. |types| is small so the output is tiny; the only
# data-sized shuffles are the distinct and the user-keyed join. Exact
# integers + one double division.

@register(
    "events_type_overlap",
    oracle="""
WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM du
  GROUP BY event_type),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM du a JOIN du b ON a.user_id = b.user_id
  WHERE a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type)
SELECT i.type_a, i.type_b, i.n_common,
       ta.n + tb.n - i.n_common AS n_union,
       CAST(i.n_common AS DOUBLE) / (ta.n + tb.n - i.n_common) AS jaccard
FROM inter i
JOIN tot ta ON ta.event_type = i.type_a
JOIN tot tb ON tb.event_type = i.type_b
""".strip(),
)
def events_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    du = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .persist()  # three consumers: both join sides + totals
    )
    tot = du.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = du.select(F.col("event_type").alias("type_a"), "user_id")
    b = du.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ta = F.broadcast(tot.select(F.col("event_type").alias("type_a"), F.col("n").alias("na")))
    tb = F.broadcast(tot.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb")))
    uni = F.col("na") + F.col("nb") - F.col("n_common")
    return (
        inter.join(ta, "type_a")
        .join(tb, "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_common").cast("long").alias("n_common"),
            uni.cast("long").alias("n_union"),
            (F.col("n_common").cast("double") / uni.cast("double")).alias(
                "jaccard"
            ),
        )
    )


# --- funnel time-to-convert order statistics (round 10) -------------------
# The analytics a funnel table exists to answer: how LONG do the
# view→click and click→purchase transitions take? Latencies are exact
# integer micros from the min-after-min funnel stages, and both
# quantiles use the DISCRETE order-statistic protocol — the value at
# rank ceil(q·n) — computed distributively: per-(stage, latency)
# counts (the latency-value table is far smaller than the user table),
# one stage-keyed running sum over it, then a filtered MIN. No
# interpolating percentile crosses the engine boundary (interpolation
# weights like 0.9·(b−a) are not exactly representable, unlike the
# exact-median .5 protocol), and every emitted cell is an integer.

@register(
    "events_funnel_latency",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events),
s1 AS (
  SELECT user_id, MIN(us) AS t1 FROM e
  WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, MIN(e.us) AS t2
  FROM e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.us > s1.t1
  GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, MIN(e.us) AS t3
  FROM e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.us > s2.t2
  GROUP BY e.user_id),
lat AS (
  SELECT CAST(2 AS BIGINT) AS stage, s2.t2 - s1.t1 AS lat
  FROM s2 JOIN s1 ON s1.user_id = s2.user_id
  UNION ALL
  SELECT CAST(3 AS BIGINT), s3.t3 - s2.t2
  FROM s3 JOIN s2 ON s2.user_id = s3.user_id),
counts AS (
  SELECT stage, lat, CAST(COUNT(*) AS BIGINT) AS c
  FROM lat GROUP BY 1, 2),
cum AS (
  SELECT stage, lat, c,
         SUM(c) OVER (PARTITION BY stage ORDER BY lat) AS cs,
         SUM(c) OVER (PARTITION BY stage) AS n
  FROM counts)
SELECT stage,
       CAST(n AS BIGINT) AS n_users,
       CAST(MIN(CASE WHEN cs * 2 >= n THEN lat END) AS BIGINT) AS p50_us,
       CAST(MIN(CASE WHEN cs * 10 >= 9 * n THEN lat END) AS BIGINT)
         AS p90_us,
       CAST(MAX(lat) AS BIGINT) AS max_us
FROM cum GROUP BY stage, n
""".strip(),
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    v, c, p = _FUNNEL_STAGES
    s1 = (
        ev.where(F.col("event_type") == v)
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == c)
        .join(s1, "user_id")
        .where(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"), F.first("t1").alias("t1k"))
    )
    s3 = (
        ev.where(F.col("event_type") == p)
        .join(s2.select("user_id", "t2"), "user_id")
        .where(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"), F.first("t2").alias("t2k"))
    )
    lat = (
        s2.select(
            F.lit(2).cast("long").alias("stage"),
            (F.col("t2") - F.col("t1k")).alias("lat"),
        )
    ).unionAll(
        s3.select(
            F.lit(3).cast("long").alias("stage"),
            (F.col("t3") - F.col("t2k")).alias("lat"),
        )
    )
    counts = lat.groupBy("stage", "lat").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_cum = (
        Window.partitionBy("stage")
        .orderBy("lat")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("stage")
    cum = counts.select(
        "stage",
        "lat",
        F.sum("c").over(w_cum).alias("cs"),
        F.sum("c").over(w_all).alias("n"),
    )
    return cum.groupBy("stage", "n").agg(
        F.min(F.when(F.col("cs") * 2 >= F.col("n"), F.col("lat")))
        .cast("long")
        .alias("p50_us"),
        F.min(F.when(F.col("cs") * 10 >= 9 * F.col("n"), F.col("lat")))
        .cast("long")
        .alias("p90_us"),
        F.max("lat").cast("long").alias("max_us"),
    ).select(
        "stage",
        F.col("n").cast("long").alias("n_users"),
        "p50_us",
        "p90_us",
        "max_us",
    )


# --- two-proportion A/B z-test (round 10) ---------------------------------
# The experimentation primitive: users split into two deterministic
# arms (user_id parity — a stand-in for the assignment hash), outcome =
# "reached a purchase event". Counts are exact integers; the pooled
# two-proportion z-statistic is the one emitted double (a single
# sqrt + division chain on exact integer inputs — the cosine-protocol
# shape, rounded to 4 dp). At 100 TB: one per-user aggregate (map-side
# combined) then a two-row reduce.

@register(
    "events_ab_test",
    oracle="""
WITH u AS (
  SELECT user_id, user_id % 2 AS arm,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id),
a AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(conv) AS BIGINT) AS x
  FROM u GROUP BY arm),
w AS (
  SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
         MAX(CASE WHEN arm = 0 THEN x END) AS x0,
         MAX(CASE WHEN arm = 1 THEN n END) AS n1,
         MAX(CASE WHEN arm = 1 THEN x END) AS x1
  FROM a)
SELECT n0, x0, n1, x1,
       ROUND(CAST(x0 AS DOUBLE) / n0, 4) AS rate0,
       ROUND(CAST(x1 AS DOUBLE) / n1, 4) AS rate1,
       ROUND(
         (CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
         / sqrt(
             (CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
             * (1 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
             * (1.0 / n0 + 1.0 / n1)),
         4) AS z
FROM w
""".strip(),
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    ).select((F.col("user_id") % 2).alias("arm"), "conv")
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("x"),
    )
    w = a.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("x"))).alias("x0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("x"))).alias("x1"),
    )
    p0 = F.col("x0").cast("double") / F.col("n0").cast("double")
    p1 = F.col("x1").cast("double") / F.col("n1").cast("double")
    pp = (F.col("x0") + F.col("x1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n0").cast("double")
            + F.lit(1.0) / F.col("n1").cast("double")
        )
    )
    return w.select(
        "n0",
        "x0",
        "n1",
        "x1",
        F.round(p0, 4).alias("rate0"),
        F.round(p1, 4).alias("rate1"),
        F.round((p1 - p0) / se, 4).alias("z"),
    )


# --- Cramér's V effect size (round 10) ------------------------------------
# The one-row companion to events_chi2_independence: the chi² total
# normalized to [0, 1] — V = sqrt(chi² / (n · (min(r, c) − 1))) — so
# drift dashboards can compare association strength across tables of
# different shape. Margins and cells are the same exact integers as
# the cell query; the chi² TOTAL crosses the engines as an EXACT
# integer — each per-cell double is bit-identical cross-engine (exact
# int inputs, two correctly-rounded IEEE ops — the chi2_cell
# guarantee), so rounding every cell to a fixed-point long BEFORE the
# sum makes the total order-independent (the stable.py rationale: a
# raw double sum is reduction-order-dependent, which is exactly why
# events_chi2_independence refuses to emit one). The emitted V is one
# sqrt + division on the exact total, rounded — the cosine-protocol
# shape. The contingency table is |event types| × 7, so everything
# after the first aggregate is driver-trivial however big the events
# table is.

@register(
    "events_cramers_v",
    oracle="""
WITH e AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
              AS BIGINT) AS dow
  FROM events),
o AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM e GROUP BY event_type, dow),
rt AS (SELECT event_type, CAST(SUM(n_obs) AS BIGINT) AS n_type
       FROM o GROUP BY event_type),
ct AS (SELECT dow, CAST(SUM(n_obs) AS BIGINT) AS n_dow
       FROM o GROUP BY dow),
n AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM o),
cells AS (
  SELECT CAST(ROUND(
           (CAST(o.n_obs * n.n_total - rt.n_type * ct.n_dow AS DOUBLE)
            * CAST(o.n_obs * n.n_total - rt.n_type * ct.n_dow AS DOUBLE))
           / CAST(rt.n_type * ct.n_dow * n.n_total AS DOUBLE)
           * 1000000) AS BIGINT) AS cell_u
  FROM o JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN n),
dims AS (
  SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
         CAST(COUNT(DISTINCT dow) AS BIGINT) AS c,
         CAST(COUNT(*) AS BIGINT) AS n_total
  FROM e)
SELECT d.r AS n_rows, d.c AS n_cols, d.n_total,
       s.chi2_u,
       ROUND(sqrt(CAST(s.chi2_u AS DOUBLE) / 1000000
                  / (d.n_total * (LEAST(d.r, d.c) - 1))), 4)
         AS cramers_v
FROM (SELECT CAST(SUM(cell_u) AS BIGINT) AS chi2_u FROM cells) s
CROSS JOIN dims d
""".strip(),
)
def events_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        (
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            % 7
        )
        .cast("long")
        .alias("dow"),
    )
    o = e.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    ).persist()  # three margin consumers + the dims pass
    rt = o.groupBy("event_type").agg(
        F.sum("n_obs").cast("long").alias("n_type")
    )
    ct = o.groupBy("dow").agg(F.sum("n_obs").cast("long").alias("n_dow"))
    n = o.agg(F.sum("n_obs").cast("long").alias("n_total"))
    dev = (
        F.col("n_obs") * F.col("n_total")
        - F.col("n_type") * F.col("n_dow")
    ).cast("double")
    cells = (
        o.join(rt, "event_type")
        .join(ct, "dow")
        .crossJoin(F.broadcast(n))
        .select(
            F.round(
                dev
                * dev
                / (
                    F.col("n_type") * F.col("n_dow") * F.col("n_total")
                ).cast("double")
                * F.lit(1_000_000)
            )
            .cast("long")
            .alias("cell_u")
        )
    )
    s = cells.agg(F.sum("cell_u").cast("long").alias("chi2_u"))
    dims = o.agg(
        F.countDistinct("event_type").cast("long").alias("n_rows"),
        F.countDistinct("dow").cast("long").alias("n_cols"),
        F.sum("n_obs").cast("long").alias("n_total"),
    )
    v = F.sqrt(
        F.col("chi2_u").cast("double")
        / F.lit(1_000_000.0)
        / (
            F.col("n_total")
            * (F.least(F.col("n_rows"), F.col("n_cols")) - 1)
        ).cast("double")
    )
    return s.crossJoin(F.broadcast(dims)).select(
        "n_rows",
        "n_cols",
        "n_total",
        "chi2_u",
        F.round(v, 4).alias("cramers_v"),
    )


# --- exact rolling 7-day distinct users via bitmap OR (round 10) ----------
# Sliding-window COUNT(DISTINCT) is the query approximate sketches
# exist to dodge — exact here because OR-mergeable bitmap partials
# make distinct-ness pre-aggregatable (the daily_user_bitmap_distinct
# protocol, extended with the sliding-window expansion the streaming
# family uses): per-(day, word) masks from ONE aggregate, each mask
# contributes to the 7 window-ending days via a bounded explode, OR
# per (window_day, word), popcount-sum per window_day. No (day, user)
# distinct shuffle at any point, and the per-day masks are the same
# stored partial a week/month rollup would OR — compute once, slide
# anywhere. Window days are anchored to days that actually have
# events (the dense-spine variant is one sequence() join away).
# TWIN of rolling_7d_distinct_users (the explode+distinct plan): same
# window semantics rolled up globally, but distinct-ness rides in
# mergeable masks, so no (day, user) distinct shuffle exists at all —
# the plan that wins when users-per-day is huge and words are few.

@register(
    "rolling_7d_distinct_bitmap",
    oracle="""
WITH m AS (
  SELECT CAST(ts AS DATE) AS d, user_id // 63 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS mask
  FROM events GROUP BY 1, 2),
spine AS (SELECT DISTINCT CAST(ts AS DATE) AS wd FROM events),
contrib AS (
  SELECT (m.d + CAST(t.i AS INTEGER)) AS wd, m.word, m.mask
  FROM m, range(0, 7) t(i)),
wmask AS (
  SELECT c.wd, c.word, bit_or(c.mask) AS mask
  FROM contrib c JOIN spine s ON s.wd = c.wd
  GROUP BY 1, 2)
SELECT wd AS date,
       CAST(SUM(bit_count(mask)) AS BIGINT) AS n_distinct_7d
FROM wmask GROUP BY wd
""".strip(),
)
def rolling_7d_distinct_bitmap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(
        F.to_date("ts").alias("d"),
        F.expr("user_id div 63").alias("word"),
    ).agg(
        F.expr(
            "bit_or(shiftleft(1L, CAST(user_id % 63 AS INT)))"
        ).alias("mask")
    )
    contrib = m.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(6))
        ).alias("i"),
        "d",
        "word",
        "mask",
    ).select(F.date_add("d", F.col("i")).alias("wd"), "word", "mask")
    spine = ev.select(F.to_date("ts").alias("wd")).distinct()
    wmask = (
        contrib.join(F.broadcast(spine), "wd")
        .groupBy("wd", "word")
        .agg(F.bit_or("mask").alias("mask"))
    )
    return wmask.groupBy(F.col("wd").alias("date")).agg(
        F.sum(F.bit_count("mask")).cast("long").alias("n_distinct_7d")
    )


# --- linear-interpolation gap fill (round 10; LOCF's exact twin) ----------
# Between two observed days, fill each missing day on the straight
# line — the imputation a forecasting pipeline usually wants where
# LOCF introduces steps. Exactness protocol: observed values become
# scaled longs (4 dp → ×10⁴), the interpolant at day d between
# (pd, pv) and (nd, nv) is the exact integer rational
#   num = pvs·(nd−d) + nvs·(d−pd),  den = nd−pd
# (emitted as columns — the stable.py rule: never ship an unrounded
# float statistic), and value_filled is the one correctly-rounded
# division. Bracketing observations come from two series windows
# (last/first ignorenulls over the calendar spine); edge gaps fall
# back to the single available side (LOCF/NOCB). Same one-shuffle
# shape as events_gap_fill_locf.

@register(
    "events_gap_fill_linear",
    oracle=f"""{_PREFIX},
cal AS (
  SELECT b.region, b.kw, CAST(gs.g AS DATE) AS date
  FROM (SELECT region, kw, MIN(date) AS lo, MAX(date) AS hi
        FROM daily GROUP BY 1, 2) b,
       LATERAL (SELECT UNNEST(generate_series(b.lo, b.hi,
                                              INTERVAL 1 DAY)) AS g) gs),
j AS (
  SELECT c.region, c.kw, c.date,
         CASE WHEN d.value IS NULL THEN NULL
              ELSE CAST(ROUND(d.value * 10000) AS BIGINT) END AS vs
  FROM cal c LEFT JOIN daily d
    ON c.region = d.region AND c.kw = d.kw AND c.date = d.date),
b AS (
  SELECT region, kw, date, vs,
         LAST_VALUE(vs IGNORE NULLS) OVER wp AS pv,
         LAST_VALUE(CASE WHEN vs IS NOT NULL THEN date END IGNORE NULLS)
           OVER wp AS pd,
         FIRST_VALUE(vs IGNORE NULLS) OVER wn AS nv,
         FIRST_VALUE(CASE WHEN vs IS NOT NULL THEN date END IGNORE NULLS)
           OVER wn AS nd
  FROM j
  WINDOW wp AS (PARTITION BY region, kw ORDER BY date
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY region, kw ORDER BY date
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
f AS (
  SELECT region, kw, date,
         CAST(vs IS NULL AS BIGINT) AS is_imputed,
         CASE
           WHEN vs IS NOT NULL THEN vs
           WHEN pv IS NOT NULL AND nv IS NOT NULL
             THEN NULL
           WHEN pv IS NOT NULL THEN pv
           ELSE nv END AS flat_s,
         CASE WHEN vs IS NULL AND pv IS NOT NULL AND nv IS NOT NULL
              THEN pv * (nd - date) + nv * (date - pd) END AS value_num,
         CASE WHEN vs IS NULL AND pv IS NOT NULL AND nv IS NOT NULL
              THEN nd - pd END AS value_den
  FROM b)
SELECT region, kw, date, is_imputed,
       CAST(value_num AS BIGINT) AS value_num,
       CAST(value_den AS BIGINT) AS value_den,
       ROUND(CASE WHEN value_num IS NOT NULL
                  THEN CAST(value_num AS DOUBLE) / value_den / 10000.0
                  ELSE CAST(flat_s AS DOUBLE) / 10000.0 END, 4)
         AS value_filled
FROM f
""".strip(),
)
def events_gap_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    bounds = daily.groupBy("region", "kw").agg(
        F.min("date").alias("lo"), F.max("date").alias("hi")
    )
    cal = bounds.select(
        "region",
        "kw",
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("date"),
    )
    j = cal.join(daily, ["region", "kw", "date"], "left").select(
        "region",
        "kw",
        "date",
        F.round(F.col("value") * 10000).cast("long").alias("vs"),
    )
    wp = (
        Window.partitionBy("region", "kw")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("region", "kw")
        .orderBy("date")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_date = F.when(F.col("vs").isNotNull(), F.col("date"))
    b = j.select(
        "region",
        "kw",
        "date",
        "vs",
        F.last("vs", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_date, ignorenulls=True).over(wp).alias("pd"),
        F.first("vs", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_date, ignorenulls=True).over(wn).alias("nd"),
    )
    both = (
        F.col("vs").isNull()
        & F.col("pv").isNotNull()
        & F.col("nv").isNotNull()
    )
    num = F.when(
        both,
        F.col("pv") * F.datediff(F.col("nd"), F.col("date"))
        + F.col("nv") * F.datediff(F.col("date"), F.col("pd")),
    )
    den = F.when(both, F.datediff(F.col("nd"), F.col("pd")))
    flat = (
        F.when(F.col("vs").isNotNull(), F.col("vs"))
        .when(both, F.lit(None))
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    return b.select(
        "region",
        "kw",
        "date",
        F.col("vs").isNull().cast("long").alias("is_imputed"),
        num.cast("long").alias("value_num"),
        den.cast("long").alias("value_den"),
        F.round(
            F.when(
                num.isNotNull(),
                num.cast("double") / den / F.lit(10000.0),
            ).otherwise(flat.cast("double") / F.lit(10000.0)),
            4,
        ).alias("value_filled"),
    )


# --- event-sequence pattern match (round 10) ------------------------------
# MATCH_RECOGNIZE-style sequence analytics without the clause: each
# user's event history becomes an ordered initial string (v/c/p/s/e by
# event time, event_id tie-break) and the business pattern — "a signup
# followed only by views/clicks until a purchase" — is one regex over
# it. Engine shape: a single groupBy collecting (ts, event_id,
# initial) structs, array_sort (in-group order pinned — no window, no
# secondary-sort machinery), concat, rlike; per-user state is the
# user's own history (the same bound every sessionizer carries).
# Deterministic cross-engine: both engines see the identical string.

_SEQ_PATTERN = "s[vc]*p"


@register(
    "events_sequence_match",
    oracle=f"""
WITH e AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
              WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
              ELSE 'e' END AS ini
  FROM events),
s AS (
  SELECT user_id,
         string_agg(ini, '' ORDER BY ts, event_id) AS seq
  FROM e GROUP BY user_id)
SELECT user_id, CAST(LENGTH(seq) AS BIGINT) AS seq_len,
       CAST(regexp_matches(seq, '{_SEQ_PATTERN}') AS INTEGER) AS matched
FROM s
""".strip(),
)
def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ini = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    s = (
        ev.select(
            "user_id",
            F.struct(F.col("ts"), F.col("event_id"), ini.alias("ini")).alias(
                "r"
            ),
        )
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("r")), lambda r: r["ini"]
                ),
            ).alias("seq")
        )
    )
    return s.select(
        "user_id",
        F.length("seq").cast("long").alias("seq_len"),
        F.col("seq").rlike(_SEQ_PATTERN).cast("int").alias("matched"),
    )


# --- batch session_window aggregation (round 10) ---------------------------
# F.session_window in a BATCH groupBy: Spark's native gap-merging
# aggregate (a dedicated SessionWindow operator with in-partition
# merge, not a window-function scan) — the third sessionization plan
# beside the gaps-and-islands window (sessionize_events) and the
# streaming state op (stream_session_agg), all under one oracle
# definition. At 100 TB the session merge runs inside the user-keyed
# exchange the aggregate needs anyway; no LAG scan, no state store.

@register(
    "events_session_window_batch",
    oracle="""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked)
SELECT user_id, MIN(ts) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us
FROM sess GROUP BY user_id, sid
""".strip(),
)
def events_session_window_batch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    agg = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), F.col("user_id")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "duration_us"
        ),
    )
    return agg.select(
        "user_id",
        F.col("sw.start").alias("session_start"),
        "n_events",
        "duration_us",
    )


# --- error-rate SLO burn report (round 10) --------------------------------
# The ops dashboard over the event stream: per day, exact error share
# as an integer rational (n_err / n_total emitted, never a rounded
# ratio alone) plus the SLO breach flag via integer cross-
# multiplication (n_err · 100 > budget_pct · n_total — no float
# compare) and the running breach count (one day-ordered prefix sum
# over the day-grain table). One corpus-scale aggregate; everything
# after is day-sized.

_SLO_ERR_PCT = 25  # error budget: 25% of events


@register(
    "events_error_slo_burn",
    oracle=f"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS date,
         CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_err
  FROM events GROUP BY 1)
SELECT date, n_total, n_err,
       ROUND(CAST(n_err AS DOUBLE) / n_total, 4) AS err_rate,
       CAST(n_err * 100 > {_SLO_ERR_PCT} * n_total AS INTEGER) AS breached,
       CAST(SUM(CASE WHEN n_err * 100 > {_SLO_ERR_PCT} * n_total
                THEN 1 ELSE 0 END)
            OVER (ORDER BY date) AS BIGINT) AS breaches_to_date
FROM d
""".strip(),
)
def events_error_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_running_sum
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("date")).agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum((F.col("event_type") == "error").cast("int"))
        .cast("long")
        .alias("n_err"),
    )
    breached = (
        F.col("n_err") * 100 > F.lit(_SLO_ERR_PCT) * F.col("n_total")
    ).cast("int")
    d = d.withColumn("breached", breached).withColumn(
        "_b", F.col("breached").cast("long")
    )
    # day-ordered prefix sum WITHOUT a single-partition window: the
    # distributed rank machinery (range-partitioned running sum).
    d = with_global_running_sum(d, ["date"], "_b", out_col="breaches_to_date")
    return d.select(
        "date",
        "n_total",
        "n_err",
        F.round(
            F.col("n_err").cast("double") / F.col("n_total").cast("double"),
            4,
        ).alias("err_rate"),
        "breached",
        F.col("breaches_to_date").cast("long").alias("breaches_to_date"),
    )


# --- stationary distribution of the event Markov chain (round 11) ----------
# The follow-on the transition-matrix query (markov_event_transitions)
# exists for: where does user behavior SETTLE? Power iteration on the
# |types|×|types| chain with the exact-integer pagerank protocol —
# mass starts at SCALE per state and each round moves
# floor(p·n_trans / n_from) along every observed transition, 8
# synchronous rounds, so the result is bit-identical cross-engine (the
# oracle unrolls the same recurrence as chained CTEs). Engine shape:
# the ONE heavy stage is the transition-count aggregate (lag window
# partitioned by user, map-side-combined count); the iteration itself
# runs on a |types|²-row frame — 8 broadcast-tiny joins, no lineage
# concern at this bounded depth. Overflow: p ≤ |S|·SCALE and
# p·n_trans must stay < 2^63 — SCALE=1e9 leaves n_trans headroom to
# ~1.8e12 rows per transition pair.

_MKV_SCALE = 1_000_000_000
_MKV_ROUNDS = 8


def _markov_stationary_oracle() -> str:
    rounds = []
    for i in range(1, _MKV_ROUNDS + 1):
        rounds.append(
            f"""r{i} AS (
  SELECT t.event_type AS s,
         CAST(SUM((r.p * t.n_trans) // t.n_from) AS BIGINT) AS p
  FROM t JOIN r{i - 1} r ON t.prev_type = r.s
  GROUP BY 1)"""
        )
    joined = ",\n".join(rounds)
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
c AS (
  SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n_trans
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
t AS (
  SELECT prev_type, event_type, n_trans,
         CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS BIGINT)
           AS n_from
  FROM c),
r0 AS (SELECT DISTINCT prev_type AS s,
              CAST({_MKV_SCALE} AS BIGINT) AS p FROM t),
{joined},
tot AS (SELECT CAST(SUM(p) AS BIGINT) AS total FROM r{_MKV_ROUNDS})
SELECT r.s AS event_type, r.p AS stationary_scaled,
       CAST(r.p AS DOUBLE) / t.total AS stationary
FROM r{_MKV_ROUNDS} r, tot t
""".strip()


@register("events_markov_stationary", oracle=_markov_stationary_oracle())
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_trans")
    )
    wf = Window.partitionBy("prev_type")
    t = c.select(
        "prev_type",
        "event_type",
        "n_trans",
        F.sum("n_trans").over(wf).cast("long").alias("n_from"),
    ).persist()  # the |types|²-row matrix: consumed 8 times below
    pi = t.select(F.col("prev_type").alias("s")).distinct().select(
        "s", F.lit(_MKV_SCALE).cast("long").alias("p")
    )
    for _ in range(_MKV_ROUNDS):
        pi = (
            t.join(F.broadcast(pi), t["prev_type"] == pi["s"])
            .select(
                F.col("event_type").alias("s2"),
                F.expr("(p * n_trans) div n_from").alias("m"),
            )
            .groupBy(F.col("s2").alias("s"))
            .agg(F.sum("m").cast("long").alias("p"))
        )
    tot = pi.agg(F.sum("p").cast("long").alias("total"))
    return pi.crossJoin(F.broadcast(tot)).select(
        F.col("s").alias("event_type"),
        F.col("p").alias("stationary_scaled"),
        (F.col("p").cast("double") / F.col("total")).alias("stationary"),
    )


# --- Mann-Kendall trend test on daily revenue (round 11b) -------------------
# The non-parametric "is this series trending?" test the monitoring
# family was missing: S = sum_{i<j} sign(v_j - v_i) over the daily
# revenue series, tie-corrected variance 18*Var = n(n-1)(2n+5) -
# sum_t t(t-1)(2t+5), and the continuity-corrected z. Everything up to
# z is EXACT BIGINT; z is a fixed expression (one division by a
# correctly-rounded sqrt) so both engines agree bit-for-bit. The i<j
# pair join is CALENDAR-BOUNDED — one row per order date (~2.4k days
# whatever the SF), so the quadratic lives on a dimension-sized input
# forever; the only fact-scale work is the first aggregate. Tie groups
# come from a second dimension-sized aggregate over the daily values.

@register(
    "orders_mann_kendall",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1),
s AS (
  SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                       WHEN b.cents < a.cents THEN -1 ELSE 0 END)
              AS BIGINT) AS s_stat
  FROM d a JOIN d b ON a.day < b.day),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM d),
ties AS (
  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
           AS tie_term
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM d GROUP BY cents)
  WHERE t > 1)
SELECT n.n_days, s.s_stat,
       CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
            - ties.tie_term AS BIGINT) AS var18,
       ROUND(CASE
         WHEN s.s_stat > 0 THEN (CAST(s.s_stat AS DOUBLE) - 1.0)
           / SQRT(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                       - ties.tie_term AS DOUBLE) / 18.0)
         WHEN s.s_stat < 0 THEN (CAST(s.s_stat AS DOUBLE) + 1.0)
           / SQRT(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                       - ties.tie_term AS DOUBLE) / 18.0)
         ELSE 0.0 END, 6) AS z
FROM s CROSS JOIN n CROSS JOIN ties
""".strip(),
)
def orders_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    ).persist()  # dimension-sized; consumed by 3 branches below
    a = d.select(F.col("day").alias("da"), F.col("cents").alias("va"))
    b = d.select(F.col("day").alias("db"), F.col("cents").alias("vb"))
    s = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum(
                F.when(F.col("vb") > F.col("va"), 1)
                .when(F.col("vb") < F.col("va"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    ties = (
        d.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    j = s.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(ties))
    nd = F.col("n_days")
    var18 = (nd * (nd - 1) * (2 * nd + 5) - F.col("tie_term")).cast("long")
    denom = F.sqrt(var18.cast("double") / F.lit(18.0))
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat").cast("double") - F.lit(1.0)) / denom,
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat").cast("double") + F.lit(1.0)) / denom,
        )
        .otherwise(F.lit(0.0))
    )
    return j.select(
        "n_days",
        "s_stat",
        var18.alias("var18"),
        F.round(z, 6).alias("z"),
    )


# --- Wald-Wolfowitz runs test on daily revenue (round 11b) ------------------
# Randomness check that complements Mann-Kendall: binarize each day as
# above/below the global lower-median of daily revenue cents, count
# RUNS of equal signs (R = sign changes + 1 via LAG over the day
# order), and standardize against E[R] = 2*n1*n0/n + 1 with the exact
# variance. n1/n0/R are EXACT BIGINTs; z is one fixed expression on
# them. The LAG window partitions on a constant-free calendar-sized
# input — acceptable? No: even calendar-sized, a bare global window is
# the forbidden plan shape, so the sign-change count comes from the
# same calendar self-join trick the funnel family uses: pair each day
# with the NEXT day via a date-key equi-join on a per-day dense rank
# from the distributed rank operator. Median = the rank-n//2+1 value
# (lower median) from the same rank pass.

@register(
    "orders_runs_test",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1),
medr AS (
  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents ASC, day ASC) AS r
  FROM d),
med AS (
  SELECT cents AS median_cents FROM medr
  WHERE r = (SELECT (COUNT(*) - 1) // 2 + 1 FROM d)),
b AS (
  SELECT day,
         CASE WHEN cents > (SELECT median_cents FROM med)
              THEN 1 ELSE 0 END AS hi,
         ROW_NUMBER() OVER (ORDER BY day ASC) AS rn
  FROM d),
runs AS (
  SELECT CAST(1 + SUM(CASE WHEN nxt.hi <> cur.hi THEN 1 ELSE 0 END)
              AS BIGINT) AS n_runs
  FROM b cur JOIN b nxt ON nxt.rn = cur.rn + 1),
c AS (
  SELECT CAST(SUM(hi) AS BIGINT) AS n1,
         CAST(SUM(1 - hi) AS BIGINT) AS n0,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM b)
SELECT c.n, c.n1, c.n0, r.n_runs,
       ROUND((CAST(r.n_runs AS DOUBLE)
              - (2.0 * c.n1 * c.n0 / CAST(c.n AS DOUBLE) + 1.0))
             / SQRT(2.0 * c.n1 * c.n0
                    * (2.0 * c.n1 * c.n0 - CAST(c.n AS DOUBLE))
                    / (CAST(c.n AS DOUBLE) * CAST(c.n AS DOUBLE)
                       * (CAST(c.n AS DOUBLE) - 1.0))), 6) AS z
FROM runs r CROSS JOIN c
""".strip(),
)
def orders_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_rank

    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    ranked = with_global_rank(
        d, [F.col("cents").asc(), F.col("day").asc()], "vr"
    ).persist()
    n = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    med = (
        ranked.crossJoin(F.broadcast(n))
        .where(
            F.col("vr")
            == (F.floor((F.col("n") - 1) / 2) + 1).cast("long")
        )
        .select(F.col("cents").alias("median_cents"))
    )
    b = (
        with_global_rank(
            ranked.select("day", "cents"), [F.col("day").asc()], "rn"
        )
        .crossJoin(F.broadcast(med))
        .select(
            "rn",
            F.when(F.col("cents") > F.col("median_cents"), 1)
            .otherwise(0)
            .alias("hi"),
        )
    ).persist()
    cur = b.select(F.col("rn").alias("r0"), F.col("hi").alias("h0"))
    nxt = b.select((F.col("rn") - 1).alias("r0"), F.col("hi").alias("h1"))
    runs = cur.join(nxt, "r0").agg(
        (
            F.lit(1)
            + F.sum(F.when(F.col("h1") != F.col("h0"), 1).otherwise(0))
        )
        .cast("long")
        .alias("n_runs")
    )
    c = b.agg(
        F.sum("hi").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("hi")).cast("long").alias("n0"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    j = runs.crossJoin(F.broadcast(c))
    nd = F.col("n").cast("double")
    n1 = F.col("n1")
    n0 = F.col("n0")
    mu = 2.0 * n1 * n0 / nd + F.lit(1.0)
    var = (
        2.0
        * n1
        * n0
        * (2.0 * n1 * n0 - nd)
        / (nd * nd * (nd - F.lit(1.0)))
    )
    z = (F.col("n_runs").cast("double") - mu) / F.sqrt(var)
    return j.select(
        "n", "n1", "n0", "n_runs", F.round(z, 6).alias("z")
    )


# --- local peak detection with prominence (round 11b) ------------------------
# The alerting primitive between anomaly_zscore (global deviation) and
# series_cusum_changepoint (level shift): a PEAK is a day strictly
# above both neighbors, reported with its prominence over the higher
# neighbor. Exact integer cents (scaled_long protocol); one LAG + one
# LEAD per (region, kw) series — partitioned windows, narrow
# otherwise. Series endpoints (missing neighbor) are excluded, the
# documented boundary semantics.

_PEAK_MIN_PROM_CENTS = 500  # >= 5.00 above the higher neighbor


@register(
    "series_peak_detect",
    oracle=f"{_PREFIX},\n"
    "l AS (\n"
    "  SELECT region, kw, date,\n"
    f"         {scaled_long_sql('value', 100)} AS v,\n"
    f"         lag({scaled_long_sql('value', 100)}) OVER "
    "(PARTITION BY region, kw ORDER BY date) AS pv,\n"
    f"         lead({scaled_long_sql('value', 100)}) OVER "
    "(PARTITION BY region, kw ORDER BY date) AS nv\n"
    "  FROM daily)\n"
    "SELECT region, kw, date, CAST(v AS BIGINT) AS v_cents,\n"
    "       CAST(v - GREATEST(pv, nv) AS BIGINT) AS prominence_cents\n"
    "FROM l\n"
    "WHERE pv IS NOT NULL AND nv IS NOT NULL\n"
    "  AND v > pv AND v > nv\n"
    f"  AND v - GREATEST(pv, nv) >= {_PEAK_MIN_PROM_CENTS}",
)
def series_peak_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    v = scaled_long(F.col("value"), 100)
    w = Window.partitionBy("region", "kw").orderBy("date")
    l = daily.select(
        "region",
        "kw",
        "date",
        v.alias("v"),
        F.lag(v).over(w).alias("pv"),
        F.lead(v).over(w).alias("nv"),
    )
    prom = F.col("v") - F.greatest(F.col("pv"), F.col("nv"))
    return (
        l.where(
            F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
            & (F.col("v") > F.col("pv"))
            & (F.col("v") > F.col("nv"))
            & (prom >= _PEAK_MIN_PROM_CENTS)
        )
        .select(
            "region",
            "kw",
            "date",
            F.col("v").cast("long").alias("v_cents"),
            prom.cast("long").alias("prominence_cents"),
        )
    )


# --- Markov removal-effect attribution (round 11b) ---------------------------
# Which channel actually DRIVES conversions? Last-touch attribution
# (purchase_attribution) over-credits the final click; the Markov
# answer removes each channel from the journey chain and measures how
# much conversion probability disappears. Chain: states = event types
# + START (per-user first event), 'purchase' absorbing, row-normalized
# transition counts; conversion mass within K=8 steps is accumulated
# by an exact-integer grouped matvec (per-edge m·n div rowtotal — the
# markov_stationary protocol) run simultaneously for every removal key
# (one extra 'NONE' run is the baseline), so the whole study is ONE
# iterated dimension-sized join however large the events table. A
# removed channel's incoming mass simply dies — the standard
# removal-effect convention (probabilities stay as observed).

_ATTR_ROUNDS = 8
_ATTR_SCALE = 10**12
_ATTR_CONV = "purchase"


def _attr_oracle_sql() -> str:
    head = f"""
WITH seq AS MATERIALIZED (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS prev_type
  FROM events),
tr AS MATERIALIZED (
  SELECT prev_type AS prev, event_type AS next,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
  UNION ALL
  SELECT 'START' AS prev, event_type AS next,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NULL GROUP BY event_type),
rt AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS tot FROM tr GROUP BY prev),
rem AS (
  SELECT DISTINCT next AS removed FROM tr
  WHERE next <> '{_ATTR_CONV}'
  UNION ALL SELECT 'NONE'),
m0 AS (
  SELECT removed, 'START' AS state, CAST({_ATTR_SCALE} AS BIGINT) AS m
  FROM rem)"""
    rounds = []
    for k in range(1, _ATTR_ROUNDS + 1):
        rounds.append(
            f"""
step{k} AS MATERIALIZED (
  SELECT m.removed, tr.next,
         CAST(SUM((m.m * tr.n) // rt.tot) AS BIGINT) AS m
  FROM m{k - 1} m
  JOIN tr ON tr.prev = m.state AND tr.prev <> '{_ATTR_CONV}'
  JOIN rt ON rt.prev = tr.prev
  WHERE m.removed = 'NONE'
     OR (tr.prev <> m.removed AND tr.next <> m.removed)
  GROUP BY 1, 2),
m{k} AS MATERIALIZED (
  SELECT removed, next AS state, m FROM step{k}
  WHERE next <> '{_ATTR_CONV}'),
c{k} AS (
  SELECT removed, m FROM step{k} WHERE next = '{_ATTR_CONV}')"""
        )
    conv_union = "\nUNION ALL\n".join(
        f"SELECT removed, m FROM c{k}" for k in range(1, _ATTR_ROUNDS + 1)
    )
    tail = f""",
conv AS (
  SELECT removed, CAST(SUM(m) AS BIGINT) AS conv_scaled
  FROM ({conv_union}) GROUP BY removed),
base AS (SELECT conv_scaled AS base_scaled FROM conv WHERE removed = 'NONE')
SELECT r.removed AS channel,
       (SELECT base_scaled FROM base) AS base_conv_scaled,
       COALESCE(c.conv_scaled, 0) AS removed_conv_scaled,
       (SELECT base_scaled FROM base) - COALESCE(c.conv_scaled, 0)
         AS removal_effect_scaled
FROM rem r LEFT JOIN conv c ON c.removed = r.removed
WHERE r.removed <> 'NONE'"""
    return (head + "," + ",".join(rounds) + tail).strip()


@register("events_markov_attribution", oracle=_attr_oracle_sql())
def events_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.checkpointing import truncator

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).persist()  # two branches: transitions + START rows
    tr = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("prev"),
            F.col("event_type").alias("next"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .unionByName(
            seq.where(F.col("prev_type").isNull())
            .groupBy(F.col("event_type").alias("next"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .select(F.lit("START").alias("prev"), "next", "n")
        )
    )
    rt = tr.groupBy("prev").agg(F.sum("n").cast("long").alias("tot"))
    t = (
        tr.join(rt, "prev")
        .where(F.col("prev") != _ATTR_CONV)
        .persist()  # the |states|² matrix: consumed every round
    )
    # Removal-candidate set from the UNFILTERED transition table (the
    # oracle's `rem` CTE): a channel occurring only immediately after a
    # purchase would be invisible in `t` (prev != conv filtered) but
    # present here — deriving from `t` silently dropped it (ADVICE r11).
    rem = (
        tr.select(F.col("next").alias("removed"))
        .where(F.col("next") != _ATTR_CONV)
        .distinct()
        .unionAll(spark.createDataFrame([("NONE",)], "removed STRING"))
    ).persist()  # two consumers: mass seed + final left join
    mass = rem.select(
        "removed",
        F.lit("START").alias("state"),
        F.lit(_ATTR_SCALE).cast("long").alias("m"),
    )
    trunc = truncator(mass, None)
    convs = []
    for _ in range(_ATTR_ROUNDS):
        step = trunc(
            mass.join(t, mass["state"] == t["prev"])
            .where(
                (F.col("removed") == "NONE")
                | (
                    (F.col("prev") != F.col("removed"))
                    & (F.col("next") != F.col("removed"))
                )
            )
            .groupBy("removed", "next")
            .agg(
                F.sum(F.expr("(m * n) div tot")).cast("long").alias("m")
            )
        )
        convs.append(
            step.where(F.col("next") == _ATTR_CONV).select("removed", "m")
        )
        mass = step.where(F.col("next") != _ATTR_CONV).select(
            "removed", F.col("next").alias("state"), "m"
        )
    conv = (
        convs[0]
        .unionAll(convs[1])
        .unionAll(convs[2])
        .unionAll(convs[3])
        .unionAll(convs[4])
        .unionAll(convs[5])
        .unionAll(convs[6])
        .unionAll(convs[7])
        .groupBy("removed")
        .agg(F.sum("m").cast("long").alias("conv_scaled"))
    )
    base = conv.where(F.col("removed") == "NONE").select(
        F.col("conv_scaled").alias("base_conv_scaled")
    )
    # LEFT join the channel list to conv: a channel whose removal drives
    # the 8-step conversion mass to zero has NO conv row and must still
    # emit removed_conv_scaled = 0 with the full removal effect — it is
    # exactly the highest-impact channel (ADVICE r11).
    return (
        rem.where(F.col("removed") != "NONE")
        .join(conv, "removed", "left")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("removed").alias("channel"),
            "base_conv_scaled",
            F.coalesce(F.col("conv_scaled"), F.lit(0))
            .cast("long")
            .alias("removed_conv_scaled"),
            (
                F.col("base_conv_scaled")
                - F.coalesce(F.col("conv_scaled"), F.lit(0))
            )
            .cast("long")
            .alias("removal_effect_scaled"),
        )
    )


# --- DEMA: double exponential moving average, exact integers (round 11b) ----
# The trend-responsive smoother (DEMA = 2·EMA − EMA(EMA)) on the
# series_ewma16 finite-window protocol, span 8 (ratio 3/4): EMA∘EMA is
# a CONVOLUTION, so the whole estimator collapses to ONE 15-lag dot
# product with precomputed integer coefficients coef_m = 2·W·w_m − ww_m
# (w beyond the span = 0; W = Σw; ww = w*w), numerator exact BIGINT,
# and the emitted double is one division by the constant W²·100.
# Emitted only where the full 15-lag window exists (the documented
# boundary semantics — the half-built convolution at series heads has
# no single consistent normalization). Span 8 keeps the 2^63 envelope:
# |coef|·v_cents·15 ≲ 1e17. One partitioned window per series.

_DEMA_SPAN = 8
_DEMA_W = [3**k * 4 ** (_DEMA_SPAN - 1 - k) for k in range(_DEMA_SPAN)]
_DEMA_WSUM = sum(_DEMA_W)
_DEMA_WW = [
    sum(
        _DEMA_W[j] * _DEMA_W[m - j]
        for j in range(max(0, m - _DEMA_SPAN + 1), min(m, _DEMA_SPAN - 1) + 1)
    )
    for m in range(2 * _DEMA_SPAN - 1)
]
_DEMA_COEF = [
    2 * _DEMA_WSUM * (_DEMA_W[m] if m < _DEMA_SPAN else 0) - _DEMA_WW[m]
    for m in range(2 * _DEMA_SPAN - 1)
]


@register(
    "series_dema8",
    oracle=f"{_PREFIX},\n"
    "l AS (\n"
    "  SELECT region, kw, date,\n"
    + ",\n".join(
        f"    lag({scaled_long_sql('value', 100)}, {m}) OVER "
        f"(PARTITION BY region, kw ORDER BY date) AS v{m}"
        for m in range(2 * _DEMA_SPAN - 1)
    )
    + "\n  FROM daily)\n"
    "SELECT region, kw, date,\n"
    "       CAST("
    + " + ".join(
        f"v{m} * ({c})" for m, c in enumerate(_DEMA_COEF)
    )
    + " AS BIGINT) AS num,\n"
    "       CAST("
    + " + ".join(f"v{m} * ({c})" for m, c in enumerate(_DEMA_COEF))
    + f" AS DOUBLE) / {_DEMA_WSUM * _DEMA_WSUM * 100}.0 AS dema\n"
    "FROM l\n"
    "WHERE "
    + " AND ".join(
        f"v{m} IS NOT NULL" for m in range(2 * _DEMA_SPAN - 1)
    ),
)
def series_dema8(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("region", "kw").orderBy("date")
    v = scaled_long(F.col("value"), 100)
    lags = [F.lag(v, m).over(w) for m in range(2 * _DEMA_SPAN - 1)]
    num = sum(
        (lg * F.lit(c).cast("long") for lg, c in zip(lags, _DEMA_COEF)),
        F.lit(0).cast("long"),
    )
    cond = lags[0].isNotNull()
    for lg in lags[1:]:
        cond = cond & lg.isNotNull()
    return (
        daily.select(
            "region",
            "kw",
            "date",
            num.cast("long").alias("num"),
            (
                num.cast("double")
                / F.lit(float(_DEMA_WSUM * _DEMA_WSUM * 100))
            ).alias("dema"),
            cond.alias("_full"),
        )
        .where(F.col("_full"))
        .drop("_full")
    )


# --- SPC: EWMA control chart on daily order volume (round 11b) ---------------
# Statistical process control enters the registry: the EWMA chart
# flags the day a slow drift crosses the control limit — more
# sensitive to small persistent shifts than per-point z-scores. The
# smoother is the exact-integer finite-window EWMA16 (λ = 1/4, so the
# asymptotic limit factor λ/(2−λ) = 1/7); center and variance come
# from exact integer count sums; the limit test |EWMA − μ| >
# 3·σ·sqrt(1/7) is evaluated in doubles over exactly-representable
# integers with an identical expression tree in both engines (the
# Wilson protocol). One calendar-sized series after the daily
# aggregate; the EWMA window partitions on nothing BUT runs on a
# dimension-sized input via the lag machinery of series_ewma16 —
# here per-day lags over the single calendar series ride the
# range-partitioned rank operator to keep the plan gate green.

@register(
    "orders_spc_ewma",
    oracle=f"""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1),
st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS q
  FROM d),
l AS (
  SELECT day, c,
"""
    + ",\n".join(
        f"         lag(c, {k}) OVER (ORDER BY day) AS v{k}"
        for k in range(_EWMA_SPAN)
    )
    + """
  FROM d),
e AS (
  SELECT day, c,
         CAST("""
    + " + ".join(
        f"COALESCE(v{k} * {w}, 0)" for k, w in enumerate(_EWMA_W)
    )
    + """ AS BIGINT) AS num,
         CAST("""
    + " + ".join(
        f"(CASE WHEN v{k} IS NULL THEN CAST(0 AS BIGINT)"
        f" ELSE CAST({w} AS BIGINT) END)"
        for k, w in enumerate(_EWMA_W)
    )
    + """ AS BIGINT) AS den
  FROM l)
SELECT e.day, e.c,
       CAST(e.num AS DOUBLE) / CAST(e.den AS DOUBLE) AS ewma,
       ABS(CAST(e.num AS DOUBLE) / CAST(e.den AS DOUBLE)
           - CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
         > 3.0 * SQRT(((CAST(st.n AS DOUBLE) * CAST(st.q AS DOUBLE)
                        - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE))
                       / (CAST(st.n AS DOUBLE) * CAST(st.n AS DOUBLE)))
                      / 7.0) AS out_of_control
FROM e CROSS JOIN st
""".strip(),
)
def orders_spc_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_rank

    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    st = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
    )
    # lags over the single calendar series WITHOUT a bare global
    # window: rank days once (O(P) operator), then self-join on the
    # rank offset for each of the 16 lags — calendar-sized joins.
    ranked = with_global_rank(d, [F.col("day").asc()], "r").persist()
    base = ranked
    for k in range(_EWMA_SPAN):
        lagk = ranked.select(
            (F.col("r") + k).alias("r"), F.col("c").alias(f"v{k}")
        )
        base = base.join(lagk, "r", "left")
    num = sum(
        (
            F.coalesce(F.col(f"v{k}") * F.lit(w), F.lit(0))
            for k, w in zip(range(_EWMA_SPAN), _EWMA_W)
        ),
        F.lit(0),
    ).cast("long")
    den = sum(
        (
            F.when(F.col(f"v{k}").isNull(), F.lit(0).cast("long")).otherwise(
                F.lit(w).cast("long")
            )
            for k, w in zip(range(_EWMA_SPAN), _EWMA_W)
        ),
        F.lit(0).cast("long"),
    )
    e = base.select("day", "c", num.alias("num"), den.alias("den"))
    j = e.crossJoin(F.broadcast(st))
    ewma = F.col("num").cast("double") / F.col("den").cast("double")
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        F.col("n").cast("double") * F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
    ) / (F.col("n").cast("double") * F.col("n").cast("double"))
    return j.select(
        "day",
        "c",
        ewma.alias("ewma"),
        (
            F.abs(ewma - mu)
            > F.lit(3.0) * F.sqrt(var / F.lit(7.0))
        ).alias("out_of_control"),
    )


# --- expected time-to-conversion (Markov absorption, round 11b) --------------
# The attribution chain's other readout: not WHICH channel converts,
# but HOW LONG conversion takes — the expected number of steps before
# absorption into 'purchase', within the same 8-step horizon and
# exact-integer matvec protocol as events_markov_attribution. The
# per-round absorbed mass m_k weights its step count:
# E[steps | converted] = Σ k·m_k / Σ m_k, emitted as one integer div.

def _abs_time_oracle_sql() -> str:
    head = f"""
WITH seq AS MATERIALIZED (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS prev_type
  FROM events),
tr AS MATERIALIZED (
  SELECT prev_type AS prev, event_type AS next,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
  UNION ALL
  SELECT 'START' AS prev, event_type AS next,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NULL GROUP BY event_type),
rt AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS tot FROM tr GROUP BY prev),
m0 AS (SELECT 'START' AS state, CAST({_ATTR_SCALE} AS BIGINT) AS m)"""
    rounds = []
    for k in range(1, _ATTR_ROUNDS + 1):
        rounds.append(f"""
step{k} AS MATERIALIZED (
  SELECT tr.next, CAST(SUM((m.m * tr.n) // rt.tot) AS BIGINT) AS m
  FROM m{k - 1} m
  JOIN tr ON tr.prev = m.state AND tr.prev <> '{_ATTR_CONV}'
  JOIN rt ON rt.prev = tr.prev
  GROUP BY 1),
m{k} AS MATERIALIZED (
  SELECT next AS state, m FROM step{k} WHERE next <> '{_ATTR_CONV}'),
a{k} AS (
  SELECT {k} AS k, m FROM step{k} WHERE next = '{_ATTR_CONV}')"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT k, m FROM a{k}" for k in range(1, _ATTR_ROUNDS + 1)
    )
    tail = f""",
absorbed AS (
  SELECT CAST(SUM(m) AS BIGINT) AS conv_scaled,
         CAST(SUM(k * m) AS BIGINT) AS step_mass
  FROM ({union}))
SELECT conv_scaled, step_mass,
       CAST((step_mass * 1000000) // conv_scaled AS BIGINT)
         AS exp_steps_scaled
FROM absorbed"""
    return (head + "," + ",".join(rounds) + tail).strip()


@register("events_absorption_time", oracle=_abs_time_oracle_sql())
def events_absorption_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.checkpointing import truncator

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).persist()
    tr = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("prev"),
            F.col("event_type").alias("next"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .unionByName(
            seq.where(F.col("prev_type").isNull())
            .groupBy(F.col("event_type").alias("next"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .select(F.lit("START").alias("prev"), "next", "n")
        )
    )
    rt = tr.groupBy("prev").agg(F.sum("n").cast("long").alias("tot"))
    t = (
        tr.join(rt, "prev")
        .where(F.col("prev") != _ATTR_CONV)
        .persist()
    )
    mass = seq.sparkSession.createDataFrame(
        [("START", _ATTR_SCALE)], "state STRING, m LONG"
    )
    trunc = truncator(mass, None)
    absorbed = []
    for k in range(1, _ATTR_ROUNDS + 1):
        step = trunc(
            mass.join(t, mass["state"] == t["prev"])
            .groupBy("next")
            .agg(F.sum(F.expr("(m * n) div tot")).cast("long").alias("m"))
        )
        absorbed.append(
            step.where(F.col("next") == _ATTR_CONV).select(
                F.lit(k).cast("long").alias("k"), "m"
            )
        )
        mass = step.where(F.col("next") != _ATTR_CONV).select(
            F.col("next").alias("state"), "m"
        )
    u = absorbed[0]
    for a in absorbed[1:]:
        u = u.unionAll(a)
    s = u.agg(
        F.sum("m").cast("long").alias("conv_scaled"),
        F.sum(F.col("k") * F.col("m")).cast("long").alias("step_mass"),
    )
    return s.select(
        "conv_scaled",
        "step_mass",
        F.expr("CAST((step_mass * 1000000) div conv_scaled AS BIGINT)")
        .alias("exp_steps_scaled"),
    )


# --- top user-journey paths (round 12) ---------------------------------------
# The Sankey-diagram feed: each user's journey prefix (first 4 event
# types in time order) counted across users, global top-10 by
# frequency. The per-user prefix is a rank-window pivot (MAX CASE over
# rn ≤ 4 — no ordered string-agg dependence, identical in both
# engines); the top-10 is a total order (count DESC, path ASC) so the
# LIMIT boundary cannot straddle engines, planned as
# TakeOrderedAndProject. One user-keyed window over the fact table,
# one path-keyed aggregate, one bounded top-k.

_PATH_LEN = 4
_PATH_TOPK = 10


@register(
    "events_top_paths",
    oracle=f"""
WITH r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
  FROM events),
p AS (
  SELECT user_id,
         concat_ws('>',
           MAX(CASE WHEN rn = 1 THEN event_type END),
           MAX(CASE WHEN rn = 2 THEN event_type END),
           MAX(CASE WHEN rn = 3 THEN event_type END),
           MAX(CASE WHEN rn = 4 THEN event_type END)) AS path
  FROM r WHERE rn <= {_PATH_LEN} GROUP BY user_id)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM p GROUP BY path
ORDER BY n_users DESC, path ASC LIMIT {_PATH_TOPK}
""".strip(),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= _PATH_LEN)
    p = r.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            *[
                F.max(F.when(F.col("rn") == k, F.col("event_type")))
                for k in range(1, _PATH_LEN + 1)
            ],
        ).alias("path")
    )
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(_PATH_TOPK)
    )


# --- day-of-week-adjusted robust anomaly flags (round 12) --------------------
# The composition a real ops dashboard runs: daily order counts are
# seasonal by weekday, so a raw z/MAD rule flags every Sunday. Deseason
# with the PER-WEEKDAY median (percentile_disc — exact integer), then
# flag days whose |residual| exceeds 3·1.4826·MAD of the residuals
# (global MAD, exact integers; the orders_mad_outliers protocol
# composed with the seasonality dimension). Two tiny percentile tables
# join back on weekday; no window over the fact table. dayofweek is
# pinned to ISO Monday=1 in both engines (DuckDB isodow; Spark
# weekday()+1).

from .relational import _MAD_K  # noqa: E402 — shared robust-flag constant


@register(
    "orders_dow_adjusted_anomaly",
    oracle=f"""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2),
m AS (
  SELECT dow, PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY c) AS med
  FROM d GROUP BY dow),
r AS (
  SELECT d.day, d.dow, d.c, m.med, d.c - m.med AS resid,
         ABS(d.c - m.med) AS absr
  FROM d JOIN m USING (dow)),
s AS (
  SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY absr) AS mad FROM r)
SELECT r.day, r.dow, r.c, CAST(r.med AS BIGINT) AS dow_median,
       CAST(r.resid AS BIGINT) AS residual,
       CAST(r.absr AS DOUBLE) > {_MAD_K} * CAST(s.mad AS DOUBLE)
         AS is_anomaly
FROM r CROSS JOIN s
""".strip(),
)
def orders_dow_adjusted_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.to_date("o_orderdate").alias("day"),
            (F.weekday(F.to_date("o_orderdate")) + 1)
            .cast("long")
            .alias("dow"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    m = d.groupBy("dow").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)").alias("med")
    )
    r = d.join(F.broadcast(m), "dow").select(
        "day",
        "dow",
        "c",
        "med",
        (F.col("c") - F.col("med")).alias("resid"),
        F.abs(F.col("c") - F.col("med")).alias("absr"),
    )
    s = r.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY absr)").alias(
            "mad"
        )
    )
    return r.crossJoin(F.broadcast(s)).select(
        "day",
        "dow",
        "c",
        F.col("med").cast("long").alias("dow_median"),
        F.col("resid").cast("long").alias("residual"),
        (
            F.col("absr").cast("double")
            > F.lit(_MAD_K) * F.col("mad").cast("double")
        ).alias("is_anomaly"),
    )


# --- holiday event study (round 12) -------------------------------------------
# The econometrics companion of lineitem_promo_did: instead of a
# treated/control difference, an EVENT STUDY traces the outcome at
# each day-offset around a recurring event — here order volume in the
# ±3-day window around fixed-date holidays (Jan 1 / Jul 4 / Dec 25,
# derived from the data's own calendar — no external table). Exact
# integer sums per offset; lift = offset mean / all-days mean as one
# shared division tree. Plan: one daily aggregate, a 7-row offset
# dimension broadcast onto the holiday dates, one co-partitioned date
# join back to the daily series, one 7-row reduce.

_EVENT_OFFSETS = list(range(-3, 4))


@register(
    "orders_holiday_event_study",
    oracle=f"""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1),
tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n FROM d),
hol AS (
  SELECT day AS hday FROM d
  WHERE (month(day) = 1 AND dayofmonth(day) = 1)
     OR (month(day) = 7 AND dayofmonth(day) = 4)
     OR (month(day) = 12 AND dayofmonth(day) = 25)),
offs AS (SELECT UNNEST(ARRAY{_EVENT_OFFSETS}) AS off),
w AS (
  SELECT o.off, h.hday + o.off AS day FROM hol h CROSS JOIN offs o),
j AS (
  SELECT w.off, d.c FROM w JOIN d ON d.day = w.day)
SELECT j.off AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(j.c) AS BIGINT) AS total_orders,
       CAST(SUM(j.c) AS DOUBLE) / COUNT(*) AS avg_orders,
       (CAST(SUM(j.c) AS DOUBLE) / COUNT(*))
         / (CAST(tot.s AS DOUBLE) / CAST(tot.n AS DOUBLE)) AS lift
FROM j CROSS JOIN tot
GROUP BY j.off, tot.s, tot.n
""".strip(),
)
def orders_holiday_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()  # holiday filter + window join + totals read it
    )
    tot = d.agg(
        F.sum("c").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    hol = d.where(
        ((F.month("day") == 1) & (F.dayofmonth("day") == 1))
        | ((F.month("day") == 7) & (F.dayofmonth("day") == 4))
        | ((F.month("day") == 12) & (F.dayofmonth("day") == 25))
    ).select(F.col("day").alias("hday"))
    offs = spark.createDataFrame(
        [(o,) for o in _EVENT_OFFSETS], "off INT"
    )
    w = hol.crossJoin(F.broadcast(offs)).select(
        "off", F.expr("date_add(hday, off)").alias("day")
    )
    j = w.join(d, "day").select("off", "c")
    return (
        j.crossJoin(F.broadcast(tot))
        .groupBy(F.col("off").alias("day_offset"), "s", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("c").cast("long").alias("total_orders"),
            (F.sum("c").cast("double") / F.count(F.lit(1))).alias(
                "avg_orders"
            ),
            (
                (F.sum("c").cast("double") / F.count(F.lit(1)))
                / (F.col("s").cast("double") / F.col("n").cast("double"))
            ).alias("lift"),
        )
        .drop("s", "n")
    )
