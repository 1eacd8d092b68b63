"""Core relational operators: aggregations, joins, windows, set ops, top-k.

Each query maps a SURVEY.md §2 inventory row (cited in its docstring) onto the
driver's TPC-H-ish test tables.  All joins here are the equi/semi/anti/outer
shapes the reference actually uses (§2.3 — it has no theta/range joins).

Scale notes (100 TB design point):
- dims (region, nation) are broadcast — no shuffle for the probe side;
- fact-fact joins shuffle on their keys with AQE skew-split enabled;
- every aggregation is a partial (map-side combine) hash aggregate because we
  stay in `groupBy().agg()`;
- top-k is `orderBy().limit()` → Spark's TakeOrdered (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           round(avg(l_discount), 4)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Hash aggregate with map-side combine (SURVEY A2/A3 analogue: grouped "
        "summary stats like 04…ipynb cell-5-2 classification summary).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "org_rate_report",
    """
    SELECT c_mktsegment                                            AS segment,
           count(*)                                                AS n_customers,
           round(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 4)                              AS positive_rate,
           round(avg(c_acctbal), 4)                                AS avg_acctbal
    FROM customer
    GROUP BY c_mktsegment
    HAVING count(*) >= 10
    ORDER BY positive_rate DESC, segment
    """,
    doc="Org HEVL-rate aggregation shape (SURVEY A4, 08…ipynb:1389): "
        "groupBy → rate → filter ≥ threshold → sort desc.",
)
def org_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_customers"),
            # when/otherwise(0), not bare cast: sum over an all-NULL segment
            # is NULL Spark-side but the oracle's CASE ... ELSE 0 counts 0
            F.round(
                F.sum(F.when(F.col("c_acctbal") > 0, 1).otherwise(0))
                / F.count("*"), 4
            ).alias("positive_rate"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
        .filter(F.col("n_customers") >= 10)
        .orderBy(F.desc("positive_rate"), "segment")
    )


@register(
    "events_hourly",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           count(*)                                              AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0       AS sum_value,
           (CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) * 200
              + count(*)) // (2 * count(*)) / 10000.0            AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling processing-time window aggregate (SURVEY §2.9; batch analogue "
        "of the streaming hourly rollup). avg at 4dp is computed ENTIRELY in "
        "integer space — sum of exact centi-units, half-up integer division "
        "to 1e-4 units, then one double division: plain round(avg(double),4) "
        "hits exact .00005 halves on this data (2dp values / small counts) "
        "and Spark and DuckDB rounded them in opposite directions at sf0.1. "
        "Integer sums are associative and the final double is bit-identical "
        "in both engines.",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    s = F.sum(cents)
    n = F.count("*")
    x = s * 200 + n  # half-up: (s*200 + n) div (2n), all exact longs
    d = n * 2
    # plain % (sign-of-dividend, Java/DuckDB truncation), NOT pmod: pmod
    # floors, DuckDB's // truncates, and the two diverge on NEGATIVE sums
    # (x=-26598, d=4: floor -6650 vs truncate -6649 — a latent value-hash
    # mismatch the shipped non-negative data never hits).  (x - x % d) / d
    # is exact truncating long division in BOTH engines.
    avg_units = (x - x % d) / d  # exact integer-valued double
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            n.alias("n_events"),
            # exact centi-unit sum / 100, same integer-space trick as avg:
            # round(sum(double), 2) hits exact .xx5 halves on negative sums
            # and the engines round them in opposite directions
            (s / F.lit(100.0)).alias("sum_value"),
            (avg_units / F.lit(10000.0)).alias("avg_value"),
        )
    )


@register(
    "props_json_extract",
    """
    SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           count(*)                                         AS cnt,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0  AS sum_value
    FROM events
    GROUP BY 1
    """,
    doc="JSON field extraction + aggregate (SURVEY §2.8 json family; reference "
        "parses raw JSON per record, 02…ipynb safe_load_json). Emits sum+count "
        "rather than a 4-dp avg: with few rows per group the two engines' "
        "summation orders differ by 1 ulp, which a tight rounding can flip.",
)
def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("int").alias("k"), "value"
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("cnt"),
            # exact centi-unit sum (see events_hourly): negative exact-half
            # sums round in opposite directions across engines
            (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0))
            .alias("sum_value"),
        )
    )


@register(
    "lang_source_matrix",
    """
    SELECT lang, source, count(*) AS cnt, round(avg(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
    doc="2-D distribution stats (SURVEY A10, 13…ipynb tier × validity counts).",
)
def lang_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("cnt"), F.round(F.avg("n_chars"), 4).alias("avg_chars")
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------

@register(
    "region_revenue",
    """
    SELECT r_name                                                AS region,
           round(sum(l_extendedprice * (1 - l_discount)), 2)     AS revenue,
           count(DISTINCT o_orderkey)                            AS n_orders
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="Multi-way equi join (SURVEY J1/J2 hash-join shape) with broadcast "
        "dims: nation+region are broadcast, no shuffle on the probe side.",
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # customer scales with the data (never broadcast it — at 100 TB it is a
    # fact-sized table; AQE may still pick broadcast at small SFs); nation
    # and region are fixed-cardinality dims, always broadcast.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name
    FROM customer
    ANTI JOIN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000) big
      ON c_custkey = big.o_custkey
    """,
    doc="Left anti join — policy-exclusion filter shape (SURVEY P5/U4: drop "
        "ids in osm_excluded_dataset_ids.txt, 03…ipynb cell-3-1).",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "big_spenders_semi",
    """
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
    FROM customer
    SEMI JOIN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000) big
      ON c_custkey = big.o_custkey
    """,
    doc="Left semi join — membership test (SURVEY U4, `dataset_id in "
        "osm_excluded`).",
)
def big_spenders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal")
    )


@register(
    "outer_flag_merge",
    """
    WITH h AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
         v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         l AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
         ids AS (SELECT user_id FROM h UNION SELECT user_id FROM e
                 UNION SELECT user_id FROM v UNION SELECT user_id FROM l)
    SELECT ids.user_id,
           (h.user_id IS NOT NULL) AS has_h,
           (e.user_id IS NOT NULL) AS has_e,
           (v.user_id IS NOT NULL) AS has_v,
           (l.user_id IS NOT NULL) AS has_l
    FROM ids
    LEFT JOIN h ON ids.user_id = h.user_id
    LEFT JOIN e ON ids.user_id = e.user_id
    LEFT JOIN v ON ids.user_id = v.user_id
    LEFT JOIN l ON ids.user_id = l.user_id
    """,
    doc="4-way outer flag merge (SURVEY J4, 12…ipynb:307 merge_hevl_flags): "
        "outer-merge per-component flags on id, missing → False.",
)
def outer_flag_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def flag_df(etype: str, name: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .select("user_id")
            .distinct()
            .withColumn(name, F.lit(True))
        )

    h = flag_df("click", "has_h")
    e = flag_df("view", "has_e")
    v = flag_df("purchase", "has_v")
    l = flag_df("error", "has_l")
    merged = (
        h.join(e, "user_id", "full_outer")
        .join(v, "user_id", "full_outer")
        .join(l, "user_id", "full_outer")
    )
    return merged.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(False)).alias(c) for c in ("has_h", "has_e", "has_v", "has_l")],
    )


@register(
    "derived_key_join",
    """
    SELECT substr(c_name, -2)            AS name_suffix,
           count(*)                      AS n_customers,
           round(sum(c_acctbal), 2)      AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name LIKE 'NATION_1%'
    GROUP BY substr(c_name, -2)
    """,
    doc="Join on derived key + prefix filter (SURVEY J5: uuid8→full-uuid join "
        "on substring(dataset_id,1,8), 12…ipynb:480).",
)
def derived_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n.filter(F.col("n_name").startswith("NATION_1"))),
               c.c_nationkey == n.n_nationkey)
        .groupBy(F.substring(F.col("c_name"), -2, 2).alias("name_suffix"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Windows (SURVEY §2.5)
# ---------------------------------------------------------------------------

@register(
    "top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    doc="Top-N per group via row_number (SURVEY W1, 02…ipynb:785 pilot "
        "shortlist ≤10 per bucket).",
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rn")
    )


@register(
    "later_occurrences",
    """
    SELECT user_id, event_id,
           first_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM (
      SELECT user_id, event_id, ts,
             row_number()   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_event_id
      FROM events
    )
    WHERE rn > 1
    """,
    doc="First-seen duplicate pairing (SURVEY W2, 07…ipynb:567-651): each "
        "later occurrence reported against the first.",
)
def later_occurrences(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("first_event_id", F.first("event_id").over(w))
        .filter(F.col("rn") > 1)
        .select(
            "user_id",
            "event_id",
            "first_event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
    )


@register(
    "review_pack",
    """
    SELECT c_custkey, c_mktsegment AS segment, round(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > 0
    ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey
    LIMIT 100
    """,
    doc="Review-pack prioritization (SURVEY W3, 05…ipynb:501-520): global "
        "deterministic sort + head-K.",
)
def review_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_acctbal") > 0)
        .orderBy(F.asc("c_mktsegment"), F.desc("c_acctbal"), "c_custkey")
        .limit(100)
        .select("c_custkey", F.col("c_mktsegment").alias("segment"),
                F.round("c_acctbal", 2).alias("acctbal"))
    )


@register(
    "hevl_combo_distribution",
    """
    WITH ev AS (SELECT * FROM events WHERE event_id < 600),
         h AS (SELECT DISTINCT user_id FROM ev WHERE event_type = 'click'),
         e AS (SELECT DISTINCT user_id FROM ev WHERE event_type = 'view'),
         v AS (SELECT DISTINCT user_id FROM ev WHERE event_type = 'purchase'),
         l AS (SELECT DISTINCT user_id FROM ev WHERE event_type = 'error'),
         ids AS (SELECT DISTINCT user_id FROM ev)
    SELECT concat(CASE WHEN h.user_id IS NOT NULL THEN 'H' ELSE '-' END,
                  CASE WHEN e.user_id IS NOT NULL THEN 'E' ELSE '-' END,
                  CASE WHEN v.user_id IS NOT NULL THEN 'V' ELSE '-' END,
                  CASE WHEN l.user_id IS NOT NULL THEN 'L' ELSE '-' END) AS combo,
           count(*) AS n_users
    FROM ids
    LEFT JOIN h ON ids.user_id = h.user_id
    LEFT JOIN e ON ids.user_id = e.user_id
    LEFT JOIN v ON ids.user_id = v.user_id
    LEFT JOIN l ON ids.user_id = l.user_id
    GROUP BY combo
    """,
    doc="HEVL combo-string distribution (SURVEY A5, 08…ipynb:948 hevl_combo "
        "'H'+'E'+'V'+'L' value_counts): flag letters concatenated per id, "
        "then grouped — the 15-combination report NB12 verifies "
        "(12…ipynb:742 _test_cases). Computed without the 4 joins: one "
        "groupBy(user_id) with conditional max per flag, then the combo "
        "concat — 1 shuffle instead of 5.",
)
def hevl_combo_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 600)
    flag = lambda et, letter: F.when(  # noqa: E731
        F.max((F.col("event_type") == et).cast("int")) == 1, letter
    ).otherwise("-")
    return (
        ev.groupBy("user_id")
        .agg(
            F.concat(
                flag("click", "H"), flag("view", "E"),
                flag("purchase", "V"), flag("error", "L"),
            ).alias("combo")
        )
        .groupBy("combo")
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "review_pack_topup",
    """
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal, tier
    FROM (
      SELECT c_custkey, c_acctbal,
             CASE WHEN c_acctbal < -600 THEN 0 ELSE 1 END AS tier
      FROM customer
    )
    ORDER BY tier,
             CASE WHEN tier = 0 THEN c_acctbal ELSE -c_acctbal END,
             c_custkey
    LIMIT 200
    """,
    doc="Review-pack with top-up (SURVEY W3 full semantics, 05…ipynb:501-520: "
        "primary selection head-K, then fill the remainder from the rest by "
        "score). The reference's imperative two-step (head + anti + concat) "
        "collapses into ONE two-tier sort: orderBy(tier, per-tier key) + "
        "limit — a single TakeOrdered instead of two sorts and an anti-join.",
)
def review_pack_topup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    tier = F.when(F.col("c_acctbal") < -600, 0).otherwise(1)
    tier_key = F.when(F.col("tier") == 0, F.col("c_acctbal")).otherwise(
        -F.col("c_acctbal")
    )
    return (
        c.select("c_custkey", "c_acctbal", tier.alias("tier"))
        .orderBy("tier", tier_key, "c_custkey")
        .limit(200)
        .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"), "tier")
    )


# ---------------------------------------------------------------------------
# Top-k / sorts (SURVEY §2.6)
# ---------------------------------------------------------------------------

@register(
    "top10_orders_revenue",
    """
    SELECT o_orderkey, revenue
    FROM (
      SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderkey
    )
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="Top-k after join+agg (SURVEY T2/T3, nlargest; TakeOrdered — no "
        "global sort at scale).",
)
def top10_orders_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# ---------------------------------------------------------------------------

@register(
    "segment_except",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    """,
    doc="Set difference (SURVEY U1: hevl_only = hevl_uuids - nb06_uuids).",
)
def segment_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return a.subtract(b)  # EXCEPT DISTINCT semantics, matching the SQL oracle


@register(
    "segment_intersect_union",
    """
    WITH pos AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
         bld AS (SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING','MACHINERY'))
    SELECT c_custkey, 'both' AS src FROM (SELECT c_custkey FROM pos INTERSECT SELECT c_custkey FROM bld)
    UNION ALL
    SELECT c_custkey, 'pos_only' AS src
    FROM (SELECT c_custkey FROM pos EXCEPT SELECT c_custkey FROM bld)
    """,
    doc="Intersection + union + difference combo (SURVEY U2/U3 gate checks "
        "and review-pack concat).",
)
def segment_intersect_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    pos = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    bld = c.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")).select("c_custkey")
    both = pos.intersect(bld).withColumn("src", F.lit("both"))
    pos_only = pos.subtract(bld).withColumn("src", F.lit("pos_only"))
    return both.unionByName(pos_only)
