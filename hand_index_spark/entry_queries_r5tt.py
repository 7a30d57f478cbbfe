"""Round-5tt registry batch — two new operator families:

- ``business_days``: weekday-only interval arithmetic — business
  days between order date and ship date per order (the SLA metric
  finance and logistics run). Computed ENTIRELY from epoch-day
  integers: dow = (epoch_day + 3) % 7 (1970-01-01 was a Thursday, weekday 3;
  never an engine dayofweek builtin, whose Sunday origin differs
  between Spark and DuckDB), full weeks × 5 plus an exact remainder
  count of weekdays in the tail. Pure integers.
- ``dow_hour_heatmap``: the calendar heatmap — event counts per
  (day-of-week × hour-of-day) cell with exact ppm share, the
  traffic-shape view every ops dashboard opens with. Same shared
  epoch arithmetic (dow from epoch days, hour from epoch seconds);
  one aggregate + one window for the share.

Contract as every batch: identical column names and bit-identical
values between the Spark program and the DuckDB oracle.
Reference parity note: the reference engine (NGWPC/hand-index) has no
calendar-analytics surface — these extend the temporal axis the brief
names as first-class.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

GEO5TT: dict = {}
TEXT5TT: dict = {}
ORACLES5TT: dict[str, str] = {}


def _register(reg: dict, name: str, fn, oracle: str | None) -> None:
    reg[name] = fn
    if oracle is not None:
        ORACLES5TT[name] = oracle


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DAY_US = 86_400_000_000


# --------------------------------------------------------------------------
# business_days. Weekdays strictly AFTER day a up to and including
# day b (a <= b): let n = b - a; full = n div 7; rem = n % 7;
# extra = number of k in 1..rem with (dow_a + k) % 7 in 0..4 where
# dow = (epoch_day + 3) % 7 maps Monday -> 0 ... Sunday -> 6.
# The extra count unrolls to a bounded 6-term CASE sum — exact.


def _bdays_expr(a: str, b: str) -> str:
    dow_a = f"(({a} + 3) % 7)"
    n = f"({b} - {a})"
    terms = " + ".join(
        f"CASE WHEN {n} % 7 >= {k} AND ({dow_a} + {k}) % 7 <= 4"
        f" THEN 1 ELSE 0 END"
        for k in range(1, 7)
    )
    return f"(({n} div 7) * 5 + {terms})"


def _bdays_expr_duck(a: str, b: str) -> str:
    return _bdays_expr(a, b).replace(" div ", " // ")


def _q_business_days(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))"
               f" div {_DAY_US}").alias("od"),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))"
               f" div {_DAY_US}").alias("sd"),
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).where(
        F.col("sd") >= F.col("od")
    )
    per_item = j.select(
        "l_orderkey",
        (F.col("sd") - F.col("od")).alias("cal_days"),
        F.expr(_bdays_expr("od", "sd")).cast("long").alias("bdays"),
    )
    return per_item.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.max("cal_days").alias("max_cal_days"),
        F.max("bdays").alias("max_business_days"),
        F.sum("bdays").alias("sum_business_days"),
    )


_BDAYS_SQL = f"""
    WITH o AS (
      SELECT o_orderkey, epoch_us(o_orderdate) // {_DAY_US} AS od
      FROM orders
    ),
    li AS (
      SELECT l_orderkey, epoch_us(l_shipdate) // {_DAY_US} AS sd
      FROM lineitem
    ),
    j AS (
      SELECT li.l_orderkey, sd - od AS cal_days,
             CAST({_bdays_expr_duck("od", "sd")} AS BIGINT) AS bdays
      FROM li JOIN o ON li.l_orderkey = o.o_orderkey
      WHERE sd >= od
    )
    SELECT l_orderkey,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(max(cal_days) AS BIGINT) AS max_cal_days,
           CAST(max(bdays) AS BIGINT) AS max_business_days,
           CAST(sum(bdays) AS BIGINT) AS sum_business_days
    FROM j GROUP BY l_orderkey
    """

_register(TEXT5TT, "business_days", _q_business_days, _BDAYS_SQL)


# --------------------------------------------------------------------------
# dow_hour_heatmap.


def _q_dow_hour_heatmap(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    cells = e.select(
        F.expr(
            f"((unix_micros(CAST(ts AS TIMESTAMP)) div {_DAY_US}) + 3) % 7"
        ).alias("dow"),
        F.expr(
            "(unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000) % 24"
        ).alias("hour"),
    )
    counts = cells.groupBy("dow", "hour").agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy()
    return counts.select(
        "dow",
        "hour",
        "n",
        # double cast: oracle's windowed sum(BIGINT) is HUGEINT ->
        # float64 in pandas (VERDICT r5 item 1b bug class); exact ppm
        F.expr("(1000000 * n) div sum(n) over ()").cast("double")
        .alias("share_ppm"),
    ).withColumn("_tot", F.sum("n").over(wt)).drop("_tot")


_HEAT_SQL = f"""
    WITH cells AS (
      SELECT ((epoch_us(ts) // {_DAY_US}) + 3) % 7 AS dow,
             (epoch_us(ts) // 3600000000) % 24 AS hour
      FROM events
    ),
    counts AS (
      SELECT dow, hour, CAST(count(*) AS BIGINT) AS n
      FROM cells GROUP BY dow, hour
    )
    SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour, n,
           CAST(1000000 * n AS BIGINT) // sum(n) OVER () AS share_ppm
    FROM counts
    """

_register(TEXT5TT, "dow_hour_heatmap", _q_dow_hour_heatmap, _HEAT_SQL)
