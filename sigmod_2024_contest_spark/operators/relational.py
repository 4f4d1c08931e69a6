"""Relational surface: joins, aggregations, JSON functions, and an
as-of join — the general-analytics operators the reference engine has
none of (SURVEY §2.3: "equi/semi/anti/sort-merge/as-of joins: absent")
but a complete Spark analytics engine must provide.

All plans are Catalyst-native: dimension tables broadcast, aggregates
partial+final, the as-of join is the union/last-value composition
(no per-row Python anywhere). Money doubles aggregate as integer cents
(floor(x·100 + 0.5)) so oracle comparisons never hash floats; dates
compare as formatted strings (parquet timestamp units differ across
engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SHIP_CUTOFF = "1999-01-01"
TOPN_CUSTOMERS = 10


def _cents(col: F.Column) -> F.Column:
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


def pricing_summary(lineitem: DataFrame, cutoff: str = SHIP_CUTOFF) -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) sums over lineitem
    shipped before the cutoff. The date filter reaches the parquet scan
    (predicate pushdown); aggregation is map-side partial."""
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") < F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("count_order"),
            F.sum(_cents(F.col("l_quantity"))).cast("long").alias("sum_qty_c"),
            F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("sum_base_c"),
            F.sum(_cents(disc_price)).cast("long").alias("sum_disc_c"),
        )
    )


def pricing_summary_sql(cutoff: str = SHIP_CUTOFF) -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       count(*)::BIGINT AS count_order,
       sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))::BIGINT AS sum_qty_c,
       sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))::BIGINT AS sum_base_c,
       sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT))::BIGINT AS sum_disc_c
FROM lineitem
WHERE l_shipdate < TIMESTAMP '{cutoff}'
GROUP BY l_returnflag, l_linestatus
"""


def top_customers(
    orders: DataFrame, customer: DataFrame, nation: DataFrame, n: int = TOPN_CUSTOMERS
) -> DataFrame:
    """Top-n customers by order revenue with their nation — a
    fact-to-dims star join. ``nation`` broadcasts unconditionally (25
    rows, a fixed catalog); ``customer`` gets NO hint — it is a scaling
    fact-dimension in TPC-H (SF×150k rows), so at 100 TB a forced
    broadcast is the bottleneck. Left unhinted, static planning / AQE
    broadcast it while its stats fit `autoBroadcastJoinThreshold` and
    fall back to a shuffle hash join beyond that — the scale rule a
    hint would override. The only unconditional shuffle is the
    per-customer agg."""
    rev = orders.groupBy("o_custkey").agg(
        F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("revenue_c"),
        F.count("*").cast("long").alias("n_orders"),
    )
    joined = (
        rev.join(customer, rev["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
            "revenue_c",
            "n_orders",
        )
    )
    # Top-n via orderBy().limit(): Catalyst plans TakeOrderedAndProject —
    # per-partition heaps + a driver merge of n·P rows — instead of the
    # single-partition global WindowExec that a bare Window.orderBy()
    # would force (every customer aggregate funneled into ONE task).
    # Ranks over the surviving ≤ n rows come from a broadcast rank-join
    # (count of strictly-better rows + 1): n² ≤ 100 pairs, no window at
    # all — a constant-partition window would be folded by Catalyst
    # back into the empty-partition single-task plan.
    # top (<= n rows) feeds both sides of the rank join below; persist
    # so the star join + agg above it runs once, not once per consumer.
    top = (
        joined.orderBy(F.col("revenue_c").desc(), F.col("custkey").asc())
        .limit(n)
        .persist()
    )
    better = top.select(
        F.col("revenue_c").alias("b_rev"), F.col("custkey").alias("b_key")
    )
    cond = (F.col("b_rev") > F.col("revenue_c")) | (
        (F.col("b_rev") == F.col("revenue_c")) & (F.col("b_key") < F.col("custkey"))
    )
    return (
        top.join(F.broadcast(better), cond, "left")
        .groupBy("custkey", "name", "nation", "revenue_c", "n_orders")
        .agg((F.count("b_key") + 1).cast("long").alias("rnk"))
        .select("rnk", "custkey", "name", "nation", "revenue_c", "n_orders")
    )


def top_customers_sql(n: int = TOPN_CUSTOMERS) -> str:
    return f"""
WITH rev AS (
  SELECT o_custkey,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT AS revenue_c,
         count(*)::BIGINT AS n_orders
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT o_custkey AS custkey, c_name AS name, n_name AS nation, revenue_c, n_orders
  FROM rev
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
)
SELECT CAST(rnk AS BIGINT) AS rnk, custkey, name, nation, revenue_c, n_orders FROM (
  SELECT *, row_number() OVER (ORDER BY revenue_c DESC, custkey ASC) AS rnk FROM j
) WHERE rnk <= {n}
"""


def events_json_stats(events: DataFrame) -> DataFrame:
    """(event_type, n_events, sum_k): extract the JSON payload field
    `k` from props and aggregate — the JSON-function surface
    (get_json_object stays JVM-side / codegen'd)."""
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(k).cast("long").alias("sum_k"),
    )


EVENTS_JSON_SQL = """
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k
FROM events GROUP BY event_type
"""


def asof_last_error(events: DataFrame) -> DataFrame:
    """(event_id, user_id, last_error_value_c): for every click event,
    the value of the same user's most recent error event at-or-before
    its timestamp — the canonical as-of join.

    Spark composition (no built-in ASOF): union both sides with a tag,
    one window pass per user ordered by (ts, tag) carrying
    last(error_value, ignoreNulls) forward, then keep the click rows.
    ONE shuffle (the window partitioning) regardless of table sizes —
    the classic scale-safe as-of plan. Oracle = DuckDB's native
    ASOF LEFT JOIN, which pins the exact semantics."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(None).cast("long").alias("err_c"), F.lit(1).alias("is_probe")
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        _cents(F.col("value")).alias("err_c"),
        F.lit(0).alias("is_probe"),
    )
    unioned = clicks.unionByName(errors)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("last_error_value_c", F.last("err_c", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select(
            "event_id",
            "user_id",
            # no-match → -1: nullable ints degrade to NaN floats in
            # arrow/pandas bridges, which breaks value-hash comparison
            F.coalesce(F.col("last_error_value_c"), F.lit(-1)).cast("long").alias(
                "last_error_value_c"
            ),
        )
    )


ASOF_SQL = """
WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
errors AS (
  SELECT user_id, ts, CAST(floor(value * 100 + 0.5) AS BIGINT) AS err_c
  FROM events WHERE event_type = 'error'
)
SELECT c.event_id, c.user_id, COALESCE(e.err_c, -1)::BIGINT AS last_error_value_c
FROM clicks c ASOF LEFT JOIN errors e
  ON c.user_id = e.user_id AND e.ts <= c.ts
"""


# ---------------------------------------------------------------------------
# Funnel analysis — ordered event-sequence completion per user
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WITHIN_S = 3600


def event_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    within_s: int = FUNNEL_WITHIN_S,
) -> DataFrame:
    """(user_id, steps_completed, completed): strict-order funnel —
    for each user, step k's timestamp is the FIRST step-k event
    strictly after step k-1's timestamp (t1 = the user's first step-1
    event); ``completed`` additionally requires the whole sequence to
    fit in ``within_s`` seconds from t1. The min-based formulation is
    order-free (no tie-break needed — simultaneous events at a step
    boundary are excluded by the strict >), so both engines agree
    bit-for-bit; the window compare runs on integer epoch millis.

    Scale shape: one predicate-pushed scan per funnel step (each
    ~1/|types| of the table), per-user shuffle joins keyed on
    user_id — depth × linear, no per-user state, no window function
    over the whole event stream."""
    prev = None
    t_cols = []
    for k, step in enumerate(steps, start=1):
        ev = events.filter(F.col("event_type") == step).select("user_id", "ts")
        if prev is None:
            agg = ev.groupBy("user_id").agg(F.min("ts").alias(f"t{k}"))
        else:
            agg = (
                ev.join(prev, "user_id")
                .filter(F.col("ts") > F.col(f"t{k-1}"))
                .groupBy("user_id")
                .agg(F.min("ts").alias(f"t{k}"))
            )
        prev = agg if prev is None else prev.join(agg, "user_id", "left")
        # keep only the timestamp columns needed by the next step
        prev = prev.select("user_id", *[f"t{i}" for i in range(1, k + 1)])
        t_cols.append(f"t{k}")
    users = events.select("user_id").distinct()
    j = users.join(prev, "user_id", "left")
    n = len(steps)
    reached = F.lit(0)
    for k in range(1, n + 1):
        reached = F.when(F.col(f"t{k}").isNotNull(), F.lit(k)).otherwise(reached)
    done = F.col(f"t{n}").isNotNull() & (
        (F.unix_millis(F.col(f"t{n}")) - F.unix_millis(F.col("t1")))
        <= F.lit(int(within_s) * 1000)
    )
    return j.select(
        "user_id",
        reached.cast("long").alias("steps_completed"),
        F.coalesce(done, F.lit(False)).alias("completed"),
    )


def event_funnel_sql(
    steps: tuple[str, ...] = FUNNEL_STEPS, within_s: int = FUNNEL_WITHIN_S
) -> str:
    """DuckDB twin of :func:`event_funnel`."""
    ctes = ["u AS (SELECT DISTINCT user_id FROM events)"]
    for k, step in enumerate(steps, start=1):
        if k == 1:
            ctes.append(
                f"s1 AS (SELECT user_id, min(ts) AS t1 FROM events "
                f"WHERE event_type = '{step}' GROUP BY 1)"
            )
        else:
            ctes.append(
                f"s{k} AS (SELECT e.user_id, min(e.ts) AS t{k} FROM events e "
                f"JOIN s{k-1} p ON p.user_id = e.user_id "
                f"WHERE e.event_type = '{step}' AND e.ts > p.t{k-1} GROUP BY 1)"
            )
    n = len(steps)
    joins = " ".join(f"LEFT JOIN s{k} ON s{k}.user_id = u.user_id" for k in range(1, n + 1))
    reached = "CASE " + " ".join(
        f"WHEN t{k} IS NOT NULL THEN {k}" for k in range(n, 0, -1)
    ) + " ELSE 0 END"
    return f"""
WITH {', '.join(ctes)}
SELECT u.user_id,
       ({reached})::BIGINT AS steps_completed,
       coalesce(t{n} IS NOT NULL AND
                epoch_ms(t{n}) - epoch_ms(t1) <= {int(within_s) * 1000},
                FALSE) AS completed
FROM u {joins}
"""


# ---------------------------------------------------------------------------
# Retention cohorts — weekly cohort × activity-week matrix
# ---------------------------------------------------------------------------

WEEK_MS = 7 * 86400 * 1000


def retention_cohorts(events: DataFrame) -> DataFrame:
    """(cohort_week, week_offset, n_users): classic retention matrix —
    users cohorted by the epoch-week of their first event, counted
    distinct in every later week they were active. Weeks are integer
    ``epoch_ms DIV week`` buckets (no calendar/timezone semantics to
    disagree on — both engines do the same BIGINT division).

    Scale shape: ONE scan. The per-user first week is a window min
    over the distinct (user, week) table — the firsts-agg + join-back
    twin re-read events for each consumer (two identical scans; the
    r7 diamond audit) — so the pipeline is distinct → window over the
    high-cardinality user_id → count-distinct rollup, all bounded by
    users × active weeks, not events."""
    w = events.select(
        "user_id",
        F.expr(f"unix_millis(ts) DIV {WEEK_MS}").cast("long").alias("wk"),
    )
    active = w.distinct()
    uw = Window.partitionBy("user_id")
    return (
        active.withColumn("cohort", F.min("wk").over(uw))
        .groupBy(
            F.col("cohort").alias("cohort_week"),
            (F.col("wk") - F.col("cohort")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


RETENTION_COHORTS_SQL = f"""
WITH w AS (SELECT user_id, (epoch_ms(ts) // {WEEK_MS}) AS wk FROM events),
f AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY 1),
a AS (SELECT DISTINCT user_id, wk FROM w)
SELECT cohort::BIGINT AS cohort_week,
       (a.wk - cohort)::BIGINT AS week_offset,
       count(DISTINCT a.user_id)::BIGINT AS n_users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Exact distribution profiling — discrete quantiles per event type
# ---------------------------------------------------------------------------

_CENTS = "CAST(round(value * 100) AS BIGINT)"
QUANTILES = ((25, 1, 4), (50, 1, 2), (75, 3, 4), (95, 19, 20))


def events_value_quantiles(events: DataFrame) -> DataFrame:
    """(event_type, pct, value_cents): EXACT discrete quantiles (type-1
    / lower interpolation: the value at sorted position
    ``(n-1)·p`` floor) of the integer-cents value per event type — the
    data-profiling pass a pipeline runs before choosing filters or
    normalizations. All arithmetic is integer (rank = (n-1)·num DIV
    den), so both engines pick the identical element; duplicate values
    make row_number's tie order irrelevant to the SELECTED VALUE.

    Scale shape: the one unavoidable cost of exact quantiles is a
    per-type sort (window row_number) — a single shuffle keyed by
    event_type; ranks then join a per-type count and a literal
    quantile table. The approximate scale twin is
    ``percentile_approx`` (sketch-based, no oracle) when the exact
    sort is not worth it."""
    from pyspark.sql import Window

    spark = events.sparkSession
    cents = F.expr(_CENTS)
    ranked = events.select("event_type", cents.alias("cents")).withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("cents"))
    )
    counts = events.groupBy("event_type").agg(F.count("*").alias("n"))
    qdf = F.broadcast(
        spark.createDataFrame(list(QUANTILES), "pct int, num int, den int")
    )
    return (
        ranked.join(counts, "event_type")
        .crossJoin(qdf)
        .filter(F.col("rn") - 1 == F.expr("((n - 1) * num) DIV den"))
        .select(
            "event_type",
            F.col("pct").cast("long").alias("pct"),
            F.col("cents").cast("long").alias("value_cents"),
        )
    )


EVENTS_VALUE_QUANTILES_SQL = f"""
WITH c AS (
  SELECT event_type, {_CENTS} AS cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn
  FROM events
),
n AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
q(pct, num, den) AS (VALUES {', '.join(f'({p}, {a}, {b})' for p, a, b in QUANTILES)})
SELECT c.event_type, q.pct::BIGINT AS pct, c.cents::BIGINT AS value_cents
FROM c JOIN n USING (event_type) CROSS JOIN q
WHERE c.rn - 1 = ((n.n - 1) * q.num) // q.den
"""


# ---------------------------------------------------------------------------
# TPC-H Q3 shape — shipping priority
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"
Q3_TOPN = 10


def shipping_priority(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    segment: str = Q3_SEGMENT,
    cutoff: str = Q3_CUTOFF,
    n: int = Q3_TOPN,
) -> DataFrame:
    """(l_orderkey, o_orderdate, o_orderpriority, revenue_c): TPC-H Q3
    — unshipped-order revenue for one market segment: orders placed
    before the cutoff with lineitems shipping after it, top-n by
    revenue. (The synthetic orders table has o_orderpriority, not Q3's
    o_shippriority — same query shape.)

    Physical plan: the customer side filters to one segment and
    projects to the single key column before the orders join — but
    carries NO broadcast hint: even one segment of customer scales
    with SF (~SF×30k rows), so the optimizer must stay free to trade
    the broadcast for a shuffle hash join past
    `autoBroadcastJoinThreshold`. Both date filters push to the
    parquet scans; the only unconditional wide operations are the fact-fact
    orders⋈lineitem hash join and the per-order partial+final agg. The
    top-n is orderBy+limit (TakeOrderedAndProject: per-partition heaps
    + a driver merge, never a single-partition window); (revenue desc,
    orderdate asc, orderkey asc) is a TOTAL order, so the cut is
    deterministic. Money as integer cents, dates emitted as formatted
    strings — nothing float- or unit-sensitive reaches the hash."""
    rev = _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    j = (
        lineitem.filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("long").alias("revenue_c"))
    )
    return (
        j.orderBy(
            F.col("revenue_c").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()
        )
        .limit(n)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue_c",
        )
    )


def shipping_priority_sql(
    segment: str = Q3_SEGMENT, cutoff: str = Q3_CUTOFF, n: int = Q3_TOPN
) -> str:
    return f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       revenue_c
FROM (
  SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
         sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100 + 0.5) AS BIGINT))::BIGINT AS revenue_c
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = '{segment}'
    AND o.o_orderdate < TIMESTAMP '{cutoff}'
    AND l.l_shipdate > TIMESTAMP '{cutoff}'
  GROUP BY 1, 2, 3
)
ORDER BY revenue_c DESC, o_orderdate ASC, l_orderkey ASC
LIMIT {n}
"""


# ---------------------------------------------------------------------------
# TPC-H Q5 shape — local supplier volume per nation
# ---------------------------------------------------------------------------

Q5_REGION = "ASIA"
Q5_FROM, Q5_TO = "1997-01-01", "1998-01-01"


def local_supplier_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = Q5_REGION,
    date_from: str = Q5_FROM,
    date_to: str = Q5_TO,
) -> DataFrame:
    """(n_name, revenue_c): TPC-H Q5 — revenue by nation where the
    customer and the lineitem's supplier share that nation, restricted
    to one region and one order-date year.

    Physical plan: region→nation collapse into ONE broadcast dimension
    (fixed 5/25-row catalogs) under supplier; the supplier-side ``dim``
    and ``customer`` carry NO hint — both scale with SF (SF×10k /
    SF×150k rows), so the optimizer keeps the broadcast only while
    their stats fit `autoBroadcastJoinThreshold` and switches to a
    shuffle hash join at real TPC-H scale. The fact-fact
    orders⋈lineitem hash join and the final per-nation agg are the
    only unconditional wide operations."""
    dim = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == region_name)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", "s_nationkey", "n_name")
    )
    rev = _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    return (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(dim, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("long").alias("revenue_c"))
    )


def local_supplier_volume_sql(
    region_name: str = Q5_REGION, date_from: str = Q5_FROM, date_to: str = Q5_TO
) -> str:
    return f"""
SELECT n_name,
       sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT))::BIGINT AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = '{region_name}'
  AND o_orderdate >= TIMESTAMP '{date_from}'
  AND o_orderdate < TIMESTAMP '{date_to}'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Parts rollup — revenue and volume per brand
# ---------------------------------------------------------------------------


def brand_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """(p_brand, n_items, sum_qty_c, revenue_c): per-brand lineitem
    rollup through the part dimension (broadcast — it is a catalog);
    map-side partial aggregation carries the shuffle. Covers the part
    table's join path (l_partkey → p_partkey)."""
    rev = _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    return (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(_cents(F.col("l_quantity"))).cast("long").alias("sum_qty_c"),
            F.sum(rev).cast("long").alias("revenue_c"),
        )
    )


BRAND_REVENUE_SQL = """
SELECT p_brand,
       count(*)::BIGINT AS n_items,
       sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))::BIGINT AS sum_qty_c,
       sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT))::BIGINT AS revenue_c
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# TPC-H Q10 shape — returned-item customer report
# ---------------------------------------------------------------------------

Q10_FROM, Q10_TO = "1997-01-01", "1997-07-01"
Q10_TOPN = 20


def returned_items(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    date_from: str = Q10_FROM,
    date_to: str = Q10_TO,
    n: int = Q10_TOPN,
) -> DataFrame:
    """(custkey, name, nation, revenue_c): TPC-H Q10 — customers
    ranked by revenue lost to returned items (l_returnflag = 'R') for
    orders in one window; top-n on the total order (revenue desc,
    custkey asc). Same star shape as Q3/Q5: dims broadcast, both
    filters pushed, fact-fact hash join + per-customer agg +
    TakeOrdered."""
    rev = _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # customer: no hint — a scaling fact-dimension (SF×150k); the
        # optimizer broadcasts while small, shuffle-joins at scale.
        # nation: fixed 25-row catalog, hint stays.
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.sum(rev).cast("long").alias("revenue_c"))
        .orderBy(F.col("revenue_c").desc(), F.col("custkey").asc())
        .limit(n)
    )


def returned_items_sql(
    date_from: str = Q10_FROM, date_to: str = Q10_TO, n: int = Q10_TOPN
) -> str:
    return f"""
SELECT c_custkey AS custkey, c_name AS name, n_name AS nation,
       sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT))::BIGINT AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{date_from}'
  AND o_orderdate < TIMESTAMP '{date_to}'
GROUP BY 1, 2, 3
ORDER BY revenue_c DESC, custkey ASC
LIMIT {n}
"""


# ---------------------------------------------------------------------------
# TPC-H Q4 shape — order priority checking (the semi-join)
# ---------------------------------------------------------------------------

Q4_FROM, Q4_TO = "1997-01-01", "1997-07-01"


def order_priority_check(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = Q4_FROM,
    date_to: str = Q4_TO,
) -> DataFrame:
    """(o_orderpriority, order_count): TPC-H Q4 — orders in the window
    having AT LEAST ONE lineitem shipped after the order date, counted
    per priority. This is the engine's LEFT SEMI join showcase (the
    reference has no join operators at all; a complete analytics
    engine needs the existential kind): the equi key (orderkey) drives
    a hash semi-join, the correlated l_shipdate > o_orderdate
    condition rides it as a post-probe filter, and no lineitem column
    ever reaches the output — semi-join output is bounded by the
    orders side regardless of lineitem fan-out."""
    win = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    hit = win.join(
        lineitem.select("l_orderkey", "l_shipdate"),
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("order_count")
    )


def order_priority_check_sql(date_from: str = Q4_FROM, date_to: str = Q4_TO) -> str:
    return f"""
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{date_from}'
  AND o.o_orderdate < TIMESTAMP '{date_to}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# TPC-H Q14 shape — promo revenue share
# ---------------------------------------------------------------------------

Q14_FROM, Q14_TO = "1997-01-01", "1997-04-01"


def promo_revenue(
    lineitem: DataFrame, part: DataFrame, date_from: str = Q14_FROM, date_to: str = Q14_TO
) -> DataFrame:
    """(promo_revenue_c, total_revenue_c, promo_ppm): TPC-H Q14 — the
    share of revenue from PROMO-type parts in a ship-date window.

    Physical plan: the date filter pushes to the lineitem scan; part
    joins UNHINTED (it scales with SF — the optimizer broadcasts while
    its stats fit, shuffle-joins beyond); one global agg with a
    conditional sum — no second pass over the fact table. The ratio is
    emitted as integer ppm via int64 floor-division on the two cents
    sums, so the hash never sees a float."""
    rev = _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(part.select("p_partkey", "p_type"), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
            .cast("long")
            .alias("promo_revenue_c"),
            F.sum(rev).cast("long").alias("total_revenue_c"),
        )
        .select(
            "promo_revenue_c",
            "total_revenue_c",
            F.expr("CAST(promo_revenue_c * 1000000 DIV total_revenue_c AS BIGINT)").alias(
                "promo_ppm"
            ),
        )
    )


def promo_revenue_sql(date_from: str = Q14_FROM, date_to: str = Q14_TO) -> str:
    return f"""
WITH s AS (
  SELECT
    sum(CASE WHEN p_type = 'PROMO'
        THEN CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)
        ELSE 0 END)::BIGINT AS promo_revenue_c,
    sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT))::BIGINT AS total_revenue_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{date_from}' AND l_shipdate < TIMESTAMP '{date_to}'
)
SELECT promo_revenue_c, total_revenue_c,
       (promo_revenue_c * 1000000 // total_revenue_c)::BIGINT AS promo_ppm
FROM s
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 shape — large-volume orders
# ---------------------------------------------------------------------------

Q18_QTY_THRESHOLD = 250
Q18_TOPN = 100


def large_orders(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    qty_threshold: int = Q18_QTY_THRESHOLD,
    n: int = Q18_TOPN,
) -> DataFrame:
    """(custkey, name, orderkey, orderdate, totalprice_c, sum_qty_c):
    TPC-H Q18 — orders whose total quantity exceeds the threshold, with
    their customer, top-n by (totalprice desc, orderkey asc).

    Physical plan: the per-orderkey quantity rollup is the ONE big
    shuffle (map-side partials — the combiner ships one row per
    distinct orderkey per task, never per lineitem); the HAVING cut
    happens before any join, so orders/customer join against the tiny
    surviving set (unhinted — AQE sees the post-filter size at runtime
    and broadcasts the small side; a static hint could not know it).
    Top-n is TakeOrderedAndProject, never a single-partition window."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_cents(F.col("l_quantity"))).cast("long").alias("sum_qty_c"))
        .filter(F.col("sum_qty_c") > qty_threshold * 100)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            _cents(F.col("o_totalprice")).alias("totalprice_c"),
            "sum_qty_c",
        )
        .orderBy(F.col("totalprice_c").desc(), F.col("orderkey").asc())
        .limit(n)
    )


def large_orders_sql(
    qty_threshold: int = Q18_QTY_THRESHOLD, n: int = Q18_TOPN
) -> str:
    return f"""
WITH big AS (
  SELECT l_orderkey,
         sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))::BIGINT AS sum_qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > {qty_threshold} * 100
)
SELECT c_custkey AS custkey, c_name AS name, l_orderkey AS orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_c,
       sum_qty_c
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice_c DESC, orderkey ASC
LIMIT {n}
"""


# ---------------------------------------------------------------------------
# TPC-H Q19 shape — discounted revenue under a disjunctive predicate
# ---------------------------------------------------------------------------


def discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """(revenue_c): TPC-H Q19 — revenue from three (brand, size-range,
    quantity-range) OR-branches. The point of the shape: a disjunction
    across BOTH join sides cannot be pushed into either scan whole, but
    its single-side conjuncts can — Catalyst derives
    `l_quantity BETWEEN 1 AND 40` for the lineitem scan and the
    brand/size union for the part scan from the OR, so each side still
    prunes before the join; the residual OR evaluates post-join,
    JVM-side. One global sum, integer cents."""
    j = lineitem.join(
        part.select("p_partkey", "p_brand", "p_size"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    rev = _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    return j.filter(branch).agg(F.sum(rev).cast("long").alias("revenue_c"))


DISCOUNTED_REVENUE_SQL = """
SELECT sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT))::BIGINT AS revenue_c
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
"""


# ---------------------------------------------------------------------------
# TPC-H Q22 shape — lapsed high-balance customers (anti join)
# ---------------------------------------------------------------------------

Q22_ACTIVE_CUTOFF = "2000-01-01"


def sales_opportunity(
    orders: DataFrame, customer: DataFrame, active_cutoff: str = Q22_ACTIVE_CUTOFF
) -> DataFrame:
    """(segment, n_cust, acctbal_c): TPC-H Q22 shape — customers whose
    balance exceeds the positive-balance average and who placed NO
    order on/after the cutoff, counted per market segment. (The
    synthetic schema has no phone country code; segment plays its
    grouping role, and "never ordered" is adapted to "lapsed since
    cutoff" because every synthetic customer has at least one order.)

    Physical plan: the scalar average is one tiny agg broadcast into
    the filter; the NOT-EXISTS is a LEFT ANTI hash join against the
    date-pruned orders projection (o_custkey only reaches the shuffle);
    final per-segment agg is catalog-sized. Nothing driver-side.

    The above-average predicate compares in scaled integers —
    cents(bal) * n_positive > sum(cents(positive bals)) — instead of
    bal > avg(bal): a float mean is summation-order-dependent, so a
    balance within an ulp of it could flip membership between Spark
    and the oracle (r7 advice #2; the repo-wide integer-cents
    convention for hash-relevant arithmetic)."""
    pos_stats = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_cents(F.col("c_acctbal"))).cast("long").alias("sum_pos_c"),
        F.count("*").cast("long").alias("n_pos"),
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(active_cutoff).cast("timestamp")
    ).select("o_custkey")
    rich = customer.join(F.broadcast(pos_stats)).filter(
        _cents(F.col("c_acctbal")) * F.col("n_pos") > F.col("sum_pos_c")
    )
    return (
        rich.join(recent, rich["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("long").alias("n_cust"),
            F.sum(_cents(F.col("c_acctbal"))).cast("long").alias("acctbal_c"),
        )
    )


def sales_opportunity_sql(active_cutoff: str = Q22_ACTIVE_CUTOFF) -> str:
    return f"""
SELECT c_mktsegment AS segment,
       count(*)::BIGINT AS n_cust,
       sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))::BIGINT AS acctbal_c
FROM customer c
WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
      * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
      > (SELECT sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
         FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '{active_cutoff}'
  )
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# TPC-H Q7 shape — volume shipping between two nations
# ---------------------------------------------------------------------------

Q7_NATION_A, Q7_NATION_B = 1, 2
Q7_FROM, Q7_TO = "1996-01-01", "1998-01-01"


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: int = Q7_NATION_A,
    nation_b: int = Q7_NATION_B,
    date_from: str = Q7_FROM,
    date_to: str = Q7_TO,
) -> DataFrame:
    """(supp_nation, cust_nation, l_year, revenue_c): TPC-H Q7 —
    revenue shipped between two nations (both directions), by year.

    Physical plan: supplier and customer filter to the two nations
    BEFORE their joins (the pair predicate `(a,b) or (b,a)` evaluates
    post-join on the two surviving nationkeys, but each side's
    membership filter `nationkey IN (a,b)` is pushed to its scan);
    nation broadcasts twice (fixed 25-row catalog, one alias per
    role); the ship-date filter prunes the lineitem scan. The fact-fact
    join and the per-(pair, year) agg are the wide operations."""
    keys = [nation_a, nation_b]
    sup = (
        supplier.filter(F.col("s_nationkey").isin(keys))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("s_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    )
    cus = (
        customer.filter(F.col("c_nationkey").isin(keys))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("c_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    )
    rev = _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cus, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("sk") == nation_a) & (F.col("ck") == nation_b))
            | ((F.col("sk") == nation_b) & (F.col("ck") == nation_a))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("l_year"),
        )
        .agg(F.sum(rev).cast("long").alias("revenue_c"))
    )


def volume_shipping_sql(
    nation_a: int = Q7_NATION_A,
    nation_b: int = Q7_NATION_B,
    date_from: str = Q7_FROM,
    date_to: str = Q7_TO,
) -> str:
    return f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       strftime(l_shipdate, '%Y') AS l_year,
       sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT))::BIGINT AS revenue_c
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((s_nationkey = {nation_a} AND c_nationkey = {nation_b})
    OR (s_nationkey = {nation_b} AND c_nationkey = {nation_a}))
  AND l_shipdate >= TIMESTAMP '{date_from}' AND l_shipdate < TIMESTAMP '{date_to}'
GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# TPC-H Q16 shape — supplier diversity per part group
# ---------------------------------------------------------------------------

Q16_EXCLUDE_BRAND = "Brand#1"


def parts_supplier_counts(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    exclude_brand: str = Q16_EXCLUDE_BRAND,
) -> DataFrame:
    """(p_brand, p_type, p_size, supplier_cnt): TPC-H Q16 shape — how
    many distinct suppliers ship each (brand, type, size) part group,
    excluding one brand and excluding distrusted suppliers (adapted:
    negative account balance stands in for the complaints NOT-IN; the
    synthetic schema has no partsupp, so shipped lineitems are the
    part↔supplier evidence).

    Physical plan: the (partkey, suppkey) projection de-dups BEFORE
    the part join (two columns through the first shuffle, never the
    fact row); the excluded-supplier set is an anti join against a
    key-only projection; part joins unhinted (scales with SF). The
    countDistinct is a two-phase agg over catalog-bounded groups."""
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        pairs.join(bad, pairs["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(
            part.filter(F.col("p_brand") != exclude_brand).select(
                "p_partkey", "p_brand", "p_type", "p_size"
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def parts_supplier_counts_sql(exclude_brand: str = Q16_EXCLUDE_BRAND) -> str:
    return f"""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) li
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{exclude_brand}'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Pivot / rollup / distinct-reach — the wide-report analytics surface
# ---------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "search", "view")


def events_daily_pivot(events: DataFrame) -> DataFrame:
    """(day, <type>_n ...): events per day pivoted to one column per
    event type — the wide daily-report shape.

    Pivot with an EXPLICIT value list: Spark's two-phase pivot without
    one runs an extra distinct-values job (a full scan!) just to learn
    the columns, and the output schema becomes data-dependent — both
    wrong at 100 TB. With the list pinned, this is one partial+final
    agg on day; each pivot cell is a map-side conditional count."""
    return (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "day",
            *[F.col(t).cast("long").alias(f"{t}_n") for t in EVENT_TYPES],
        )
    )


EVENTS_DAILY_PIVOT_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count(*) FILTER (event_type = 'click')::BIGINT AS click_n,
       count(*) FILTER (event_type = 'error')::BIGINT AS error_n,
       count(*) FILTER (event_type = 'purchase')::BIGINT AS purchase_n,
       count(*) FILTER (event_type = 'search')::BIGINT AS search_n,
       count(*) FILTER (event_type = 'view')::BIGINT AS view_n
FROM events
GROUP BY 1
"""


def sales_rollup(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """(segment, status, n_orders, revenue_c): order revenue by
    (market segment, order status) with ROLLUP subtotals — segment
    totals and the grand total in the same pass (grouping-sets
    surface). NULL group slots are emitted as 'ALL' so the hash never
    compares engine-specific NULL orderings.

    One shuffle: Spark expands the rollup into grouping sets BEFORE
    the exchange (Expand operator), so partial aggregation still
    applies per set — not one job per subtotal level. customer joins
    unhinted (scaling dim rule)."""
    j = orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
    return (
        j.rollup("c_mktsegment", "o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("revenue_c"),
        )
        .select(
            F.coalesce(F.col("c_mktsegment"), F.lit("ALL")).alias("segment"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "n_orders",
            "revenue_c",
        )
    )


SALES_ROLLUP_SQL = """
SELECT coalesce(c_mktsegment, 'ALL') AS segment,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*)::BIGINT AS n_orders,
       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT AS revenue_c
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
"""


def events_user_reach(events: DataFrame) -> DataFrame:
    """(event_type, reach): EXACT distinct users per event type — the
    registry face of the reach metric, hash-verifiable against the
    oracle. The exact countDistinct is a two-phase agg (distinct
    (type, user) pairs first, then count — the pair shuffle spreads a
    hot type across partitions exactly like a salted agg would).

    The production companion at 100 TB is `approx_count_distinct`
    (HyperLogLog++: constant state per group instead of the pair
    set); its sketch estimate is engine-specific, so it is pinned by a
    relative-error test against THIS exact result, not by the oracle
    hash."""
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("reach")
    )


EVENTS_USER_REACH_SQL = """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS reach
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# TPC-H Q6 shape — forecast revenue change
# ---------------------------------------------------------------------------

Q6_FROM, Q6_TO = "1997-01-01", "1998-01-01"
Q6_DISC_LO, Q6_DISC_HI = 0.05, 0.07
Q6_QTY_BOUND = 24


def forecast_revenue(
    lineitem: DataFrame,
    date_from: str = Q6_FROM,
    date_to: str = Q6_TO,
    disc_lo: float = Q6_DISC_LO,
    disc_hi: float = Q6_DISC_HI,
    qty_bound: int = Q6_QTY_BOUND,
) -> DataFrame:
    """(forecast_revenue_c,): TPC-H Q6 — revenue that would be gained
    by eliminating small discounts on low-quantity lines in a year.

    The simplest plan in the suite and the purest pushdown check:
    every predicate (ship-date range, discount band, quantity bound)
    is a scan-level parquet filter, the projection is two columns, and
    the single global sum is partial+final. At 100 TB this is one pass
    over the pruned row groups and a 1-row exchange — there is nothing
    to tune beyond verifying PushedFilters in the plan (tested)."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < qty_bound)
        )
        .agg(
            F.coalesce(
                F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"))), F.lit(0)
            )
            .cast("long")
            .alias("forecast_revenue_c")
        )
    )


def forecast_revenue_sql(
    date_from: str = Q6_FROM,
    date_to: str = Q6_TO,
    disc_lo: float = Q6_DISC_LO,
    disc_hi: float = Q6_DISC_HI,
    qty_bound: int = Q6_QTY_BOUND,
) -> str:
    return f"""
SELECT coalesce(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)), 0)::BIGINT
         AS forecast_revenue_c
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{date_from}' AND l_shipdate < TIMESTAMP '{date_to}'
  AND l_discount >= {disc_lo} AND l_discount <= {disc_hi}
  AND l_quantity < {qty_bound}
"""


# ---------------------------------------------------------------------------
# TPC-H Q12 shape — late lines by priority class
# ---------------------------------------------------------------------------
# The synthetic lineitem has no l_shipmode / l_commitdate / l_receiptdate,
# so the Q12 semantics (lines whose logistics slipped, split by order
# priority, grouped by a line attribute) are re-expressed with the
# columns that exist: "late" = shipped more than `late_days` after the
# order date, grouped by l_linestatus in place of l_shipmode.

Q12_FROM, Q12_TO = "1997-01-01", "1998-01-01"
Q12_LATE_DAYS = 120


def late_line_priority(
    lineitem: DataFrame,
    orders: DataFrame,
    date_from: str = Q12_FROM,
    date_to: str = Q12_TO,
    late_days: int = Q12_LATE_DAYS,
) -> DataFrame:
    """(l_linestatus, high_line_count, low_line_count): TPC-H Q12 —
    among lines shipped late in the window, how many belong to
    high-priority orders vs the rest, per line status.

    Physical plan: the ship-date window pushes to the lineitem scan;
    the lateness predicate needs o_orderdate so it evaluates after the
    orderkey equi-join (fact-fact, both sides hash-partitioned on the
    key — at scale this is the one shuffle pair, and AQE converts it
    to broadcast only if the pruned lineitem side collapses). The
    priority split is a conditional partial agg, not two passes
    (reference: a single-pass grouped count; the reference engine has
    no grouped-join surface at all, SURVEY §2.3)."""
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(late)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


def late_line_priority_sql(
    date_from: str = Q12_FROM, date_to: str = Q12_TO, late_days: int = Q12_LATE_DAYS
) -> str:
    return f"""
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT
         AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{date_from}' AND l_shipdate < TIMESTAMP '{date_to}'
  AND l_shipdate > o_orderdate + INTERVAL {late_days} DAY
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------------------
# TPC-H Q13 shape — customer order-count distribution
# ---------------------------------------------------------------------------
# Real Q13 excludes orders by a comment pattern; the synthetic orders
# table has no comment column, so the exclusion predicate is an
# o_orderpriority class — same plan shape (filtered LEFT OUTER join +
# double aggregation), different literal.

Q13_EXCLUDE_PRIORITY = "5-LOW"


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame, exclude_priority: str = Q13_EXCLUDE_PRIORITY
) -> DataFrame:
    """(c_count, custdist): TPC-H Q13 — how many customers placed
    exactly N qualifying orders, including N=0.

    Physical plan: the LEFT OUTER join is load-bearing — an inner join
    would silently drop zero-order customers, which are the point of
    the query. The exclusion filter sits on the orders side BEFORE the
    join (filter-then-outer-join, which Catalyst cannot derive from a
    post-join filter on a null-producing side). Two aggregations:
    per-customer count partitions by custkey (same key as the join —
    AQE reuses the exchange), then the tiny distribution agg."""
    kept = orders.filter(F.col("o_orderpriority") != exclude_priority).select(
        "o_custkey", "o_orderkey"
    )
    per_customer = (
        customer.select("c_custkey")
        .join(kept, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_customer.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


def customer_order_distribution_sql(exclude_priority: str = Q13_EXCLUDE_PRIORITY) -> str:
    return f"""
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
  FROM customer
  LEFT OUTER JOIN (
    SELECT o_custkey, o_orderkey FROM orders
    WHERE o_orderpriority <> '{exclude_priority}'
  ) o ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# TPC-H Q15 shape — top supplier(s) by window revenue
# ---------------------------------------------------------------------------

Q15_FROM, Q15_TO = "1997-01-01", "1997-04-01"


def top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    date_from: str = Q15_FROM,
    date_to: str = Q15_TO,
) -> DataFrame:
    """(s_suppkey, s_name, total_revenue_c): TPC-H Q15 — the
    supplier(s) whose revenue in the window equals the global maximum
    (the view + scalar-subquery query, re-expressed as a self-agg).

    Physical plan: one shuffle builds the per-supplier revenue table
    (map-side partial sums first — the fact scan's date filter is
    pushed); the global max of that ~|suppliers|-row table is a 1-row
    aggregate that joins back as a BROADCAST equi-join on the revenue
    value, not a window over a single partition (the orderBy().limit(1)
    alternative cannot return ties, which Q15 requires). supplier joins
    unhinted — it scales with SF."""
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))))
            .cast("long")
            .alias("total_revenue_c")
        )
        # Diamond dataflow: rev feeds BOTH the scalar max and the
        # join-back. Unpersisted, Catalyst re-executes the fact scan +
        # agg per consumer (per-consumer pruning defeats exchange
        # reuse). rev is |suppliers|-sized (SF·10k rows × 16 B —
        # distributed cache, never driver-sized), so persist is the
        # Spark-idiomatic cut; a global-window max would funnel the
        # whole table through one partition at scale. Spark evicts
        # LRU under pressure; no unpersist needed for a one-action
        # query.
        .persist()
    )
    best = rev.agg(F.max("total_revenue_c").alias("best_rev"))
    return (
        rev.join(F.broadcast(best), F.col("total_revenue_c") == F.col("best_rev"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_c")
    )


def top_supplier_sql(date_from: str = Q15_FROM, date_to: str = Q15_TO) -> str:
    return f"""
WITH revenue AS (
  SELECT l_suppkey,
         sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT))::BIGINT
           AS total_revenue_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{date_from}' AND l_shipdate < TIMESTAMP '{date_to}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_c
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue_c = (SELECT max(total_revenue_c) FROM revenue)
"""


# ---------------------------------------------------------------------------
# TPC-H Q2 / Q11 / Q17 shapes — the partsupp family
# ---------------------------------------------------------------------------
# The synthetic schema has no partsupp table, so the supply facts are
# DERIVED from lineitem: a (partkey, suppkey) pair exists iff that
# supplier ever shipped that part, and its unit cost is the minimum
# observed unit price in cents. This keeps the three queries' plan
# shapes intact (correlated per-group min, scalar-subquery threshold,
# correlated per-group avg) against the tables that exist.

Q2_SIZE = 25
Q2_TYPE = "LARGE"


def _supply_costs(lineitem: DataFrame) -> DataFrame:
    """(ps_partkey, ps_suppkey, ps_cost_c): lineitem-derived partsupp.
    One hash agg partitioned by (partkey, suppkey); unit price floors
    to cents BEFORE the min so the oracle never compares raw doubles."""
    unit_c = _cents(F.col("l_extendedprice") / F.col("l_quantity"))
    return lineitem.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min(unit_c).cast("long").alias("ps_cost_c"))


_SUPPLY_COSTS_CTE = """
supply AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT))::BIGINT
           AS ps_cost_c
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
"""


def min_cost_supplier(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    size: int = Q2_SIZE,
    ptype: str = Q2_TYPE,
) -> DataFrame:
    """(p_partkey, p_name, s_name, n_name, cost_c): TPC-H Q2 — for
    every qualifying part, the supplier(s) offering it at the minimum
    cost (the correlated-min subquery).

    Physical plan: the part predicate (size + type) prunes BEFORE the
    supply join, so the correlated min runs over qualifying parts only;
    the min itself is a WINDOW min over the high-cardinality
    ps_partkey, not an agg + join-back — the join-back shape made
    Catalyst re-execute the supply derivation per consumer (two
    lineitem scans, no ReusedExchange because per-consumer column
    pruning differentiates the subtrees); this is ONE scan and one
    extra sort within the existing partkey partitioning.
    supplier/nation resolve at the end over the few surviving rows
    (nation broadcast — fixed catalog; supplier unhinted — scales).
    Ties (two suppliers at the same min cost) survive, as in Q2."""
    supply = _supply_costs(lineitem)
    qual = part.filter((F.col("p_size") == size) & (F.col("p_type") == ptype)).select(
        "p_partkey", "p_name"
    )
    w = Window.partitionBy("ps_partkey")
    return (
        supply.join(qual, F.col("ps_partkey") == F.col("p_partkey"))
        .withColumn("best_c", F.min("ps_cost_c").over(w))
        .filter(F.col("ps_cost_c") == F.col("best_c"))
        .join(supplier, F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.col("ps_cost_c").alias("cost_c"),
        )
    )


def min_cost_supplier_sql(size: int = Q2_SIZE, ptype: str = Q2_TYPE) -> str:
    return f"""
WITH {_SUPPLY_COSTS_CTE.strip()}
SELECT p_partkey, p_name, s_name, n_name, ps_cost_c AS cost_c
FROM supply
JOIN part ON ps_partkey = p_partkey
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_size = {size} AND p_type = '{ptype}'
  AND ps_cost_c = (
    SELECT min(s2.ps_cost_c) FROM supply s2
    WHERE s2.ps_partkey = p_partkey
  )
"""


Q11_NATION = 3  # has suppliers at every test sf (nation 7 is empty at sf0.001)
Q11_FRACTION_PPM = 2000  # keep parts worth > fraction of the national total


def important_parts(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation_key: int = Q11_NATION,
    fraction_ppm: int = Q11_FRACTION_PPM,
) -> DataFrame:
    """(ps_partkey, value_c): TPC-H Q11 — parts representing a
    significant share of one nation's total supply value (the
    scalar-subquery HAVING).

    Physical plan: the supplier→nation filter reduces the fact scan
    via an equi-join on suppkey (semi-shaped: only s_suppkey is
    projected); per-part value is one hash agg; the national total is
    a 1-row aggregate of THAT agg's output (not a second fact pass)
    broadcast into the threshold filter. The threshold compares
    integer cents against cents·ppm to keep the hash float-free —
    value_c * 1e6 > total_c * fraction_ppm."""
    nat_sup = supplier.filter(F.col("s_nationkey") == nation_key).select("s_suppkey")
    per_part = (
        lineitem.join(nat_sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("value_c"))
        # Same diamond as top_supplier: the scalar total and the
        # threshold filter both consume per_part — persist so the
        # fact scan + agg run once (|parts-with-sales|-sized, a
        # distributed cache).
        .persist()
    )
    total = per_part.agg(F.sum("value_c").cast("long").alias("total_c"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_c") * F.lit(1000000) > F.col("total_c") * F.lit(fraction_ppm))
        .select("ps_partkey", "value_c")
    )


def important_parts_sql(
    nation_key: int = Q11_NATION, fraction_ppm: int = Q11_FRACTION_PPM
) -> str:
    return f"""
WITH per_part AS (
  SELECT l_partkey AS ps_partkey,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))::BIGINT AS value_c
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey = {nation_key}
  GROUP BY l_partkey
)
SELECT ps_partkey, value_c
FROM per_part
WHERE value_c * 1000000 > (SELECT sum(value_c) FROM per_part) * {fraction_ppm}
"""


Q17_BRAND = "Brand#3"
Q17_QTY_FRACTION_PCT = 50  # lines with quantity below this % of the part's avg


def small_qty_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = Q17_BRAND,
    fraction_pct: int = Q17_QTY_FRACTION_PCT,
) -> DataFrame:
    """(avg_yearly_c,): TPC-H Q17 — yearly revenue lost if small-
    quantity orders of one brand's parts were not taken (the
    correlated per-part AVG subquery).

    Physical plan: brand filter prunes part BEFORE anything else; the
    correlated per-part avg is a WINDOW sum/count over the
    high-cardinality l_partkey — not an agg + join-back, which made
    Catalyst re-execute the filtered fact join per consumer (two
    lineitem scans): one scan, one partkey shuffle, one sort; the
    avg comparison multiplies through to integers — qty·100·100 <
    pct·sum — so no float crosses the hash. Final scalar divides by
    the 7-year span as integer cents."""
    qual = part.filter(F.col("p_brand") == brand).select("p_partkey")
    lines = lineitem.join(qual, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    qty_c = _cents(F.col("l_quantity"))
    w = Window.partitionBy("l_partkey")
    # l_quantity < (pct/100) * avg  ⟺  qty_c * n * 100 < pct * sum_qty_c
    return (
        lines.withColumn("sum_qty_c", F.sum(qty_c).over(w))
        .withColumn("n_lines", F.count("*").over(w))
        .filter(qty_c * F.col("n_lines") * F.lit(100) < F.lit(fraction_pct) * F.col("sum_qty_c"))
        .agg(
            F.coalesce(F.sum(_cents(F.col("l_extendedprice"))), F.lit(0))
            .cast("long")
            .alias("rev_c")
        )
        # integer floor-division on both engines (Spark DIV / DuckDB //)
        # — a double divide then cast would round in DuckDB but truncate
        # in Spark and hash-mismatch on the boundary
        .select(F.expr("rev_c DIV 7").cast("long").alias("avg_yearly_c"))
    )


def small_qty_revenue_sql(
    brand: str = Q17_BRAND, fraction_pct: int = Q17_QTY_FRACTION_PCT
) -> str:
    return f"""
WITH lines AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{brand}'
), stats AS (
  SELECT l_partkey AS pk,
         sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))::BIGINT AS sum_qty_c,
         count(*)::BIGINT AS n_lines
  FROM lines GROUP BY l_partkey
)
SELECT (coalesce(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)), 0) // 7)::BIGINT
         AS avg_yearly_c
FROM lines JOIN stats ON l_partkey = pk
WHERE CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) * n_lines * 100
      < {fraction_pct} * sum_qty_c
"""


# ---------------------------------------------------------------------------
# TPC-H Q8 shape — national market share
# ---------------------------------------------------------------------------

Q8_REGION = "AMERICA"
Q8_NATION = "NATION_3"
Q8_TYPE = "ECONOMY"
Q8_FROM, Q8_TO = "1996-01-01", "1998-01-01"


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    region_name: str = Q8_REGION,
    nation_name: str = Q8_NATION,
    ptype: str = Q8_TYPE,
    date_from: str = Q8_FROM,
    date_to: str = Q8_TO,
) -> DataFrame:
    """(o_year, nation_revenue_c, total_revenue_c, mkt_share_ppm):
    TPC-H Q8 — one supplier nation's share of a region's revenue for
    one part type, by order year.

    Physical plan: nation plays two roles (customer-region membership,
    supplier identity) — two broadcast aliases of the fixed catalog,
    never a self-join shuffle; part filters to one type before its
    join; the region membership collapses region→nation into one
    broadcast dim exactly like Q5. The share is a conditional sum in
    the SAME aggregation as the total (one pass), emitted as int ppm
    via bigint floor-division."""
    cust_nat = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("cnk"))
    sup_nat = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    rev = _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    return (
        lineitem.join(
            part.filter(F.col("p_type") == ptype).select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
            ).select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nat), F.col("c_nationkey") == F.col("cnk"))
        .join(supplier.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sup_nat), F.col("s_nationkey") == F.col("snk"))
        .groupBy(F.date_format("o_orderdate", "yyyy").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == nation_name, rev).otherwise(F.lit(0)))
            .cast("long")
            .alias("nation_revenue_c"),
            F.sum(rev).cast("long").alias("total_revenue_c"),
        )
        .select(
            "o_year",
            "nation_revenue_c",
            "total_revenue_c",
            F.expr("CAST(nation_revenue_c * 1000000 DIV total_revenue_c AS BIGINT)").alias(
                "mkt_share_ppm"
            ),
        )
    )


def market_share_sql(
    region_name: str = Q8_REGION,
    nation_name: str = Q8_NATION,
    ptype: str = Q8_TYPE,
    date_from: str = Q8_FROM,
    date_to: str = Q8_TO,
) -> str:
    return f"""
WITH s AS (
  SELECT strftime(o_orderdate, '%Y') AS o_year,
         sum(CASE WHEN n2.n_name = '{nation_name}'
             THEN CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)
             ELSE 0 END)::BIGINT AS nation_revenue_c,
         sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT))::BIGINT
           AS total_revenue_c
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = '{region_name}' AND p_type = '{ptype}'
    AND o_orderdate >= TIMESTAMP '{date_from}' AND o_orderdate < TIMESTAMP '{date_to}'
  GROUP BY o_year
)
SELECT o_year, nation_revenue_c, total_revenue_c,
       (nation_revenue_c * 1000000 // total_revenue_c)::BIGINT AS mkt_share_ppm
FROM s
"""


# ---------------------------------------------------------------------------
# TPC-H Q9 shape — product-type profit by nation and year
# ---------------------------------------------------------------------------
# Real Q9 prices cost from partsupp.ps_supplycost; the synthetic schema
# carries cost on the part itself (p_retailprice discounted by a fixed
# wholesale factor), so profit = revenue - retail·factor·quantity. The
# plan shape is unchanged: name-pattern part filter, fact joins, and a
# (nation, year) rollup of a derived measure.

Q9_NAME_TOKEN = "gear"
Q9_COST_FACTOR = 0.4


def product_type_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    name_token: str = Q9_NAME_TOKEN,
    cost_factor: float = Q9_COST_FACTOR,
) -> DataFrame:
    """(nation, o_year, profit_c): TPC-H Q9 — profit on parts whose
    name contains a token, by supplier nation and order year.

    Physical plan: the LIKE filter prunes part before its join (a
    non-sargable predicate, but it runs on the small dim, not the
    fact); orders joins only for the year column (projected to two
    columns before the join); profit is computed per line and floored
    to cents BEFORE the sum so both engines fold identical integers.
    nation broadcasts; part/supplier stay unhinted (scale with SF)."""
    amount_c = _cents(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(cost_factor) * F.col("l_quantity")
    )
    return (
        lineitem.join(
            part.filter(F.col("p_name").contains(name_token)).select(
                "p_partkey", "p_retailprice"
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(supplier.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy").alias("o_year"),
        )
        .agg(F.sum(amount_c).cast("long").alias("profit_c"))
    )


def product_type_profit_sql(
    name_token: str = Q9_NAME_TOKEN, cost_factor: float = Q9_COST_FACTOR
) -> str:
    return f"""
SELECT n_name AS nation, strftime(o_orderdate, '%Y') AS o_year,
       sum(CAST(floor((l_extendedprice * (1.0 - l_discount)
                       - p_retailprice * {cost_factor} * l_quantity) * 100 + 0.5) AS BIGINT))::BIGINT
         AS profit_c
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{name_token}%'
GROUP BY n_name, strftime(o_orderdate, '%Y')
"""


# ---------------------------------------------------------------------------
# TPC-H Q20 shape — promotion-eligible suppliers
# ---------------------------------------------------------------------------
# Real Q20 compares partsupp.ps_availqty against half the quantity the
# supplier shipped; without an availqty column the threshold is a fixed
# shipped-quantity floor. The plan shape — nested semi-join chain
# (name-pattern parts → qualifying (part, supplier) shipments →
# suppliers of one nation) — is preserved exactly.

Q20_NAME_PREFIX = "red"
Q20_FROM, Q20_TO = "1997-01-01", "1998-01-01"
Q20_QTY_FLOOR = 60
Q20_NATION = 6


def promo_suppliers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    name_prefix: str = Q20_NAME_PREFIX,
    date_from: str = Q20_FROM,
    date_to: str = Q20_TO,
    qty_floor: int = Q20_QTY_FLOOR,
    nation_key: int = Q20_NATION,
) -> DataFrame:
    """(s_suppkey, s_name): TPC-H Q20 — suppliers of one nation who
    shipped a meaningful volume of promotion-candidate parts in a year
    (the nested IN-subquery chain, planned as LEFT SEMI joins).

    Physical plan: both subqueries become LEFT SEMI joins — no
    multiplicity, no dedup pass. The inner shipment agg groups by
    (suppkey, partkey) with the date filter pushed to the fact scan
    and the part-name filter semi-applied BEFORE the agg (prefix
    LIKE 'x%' on the dim side); the HAVING floor cuts the agg output;
    the outer semi-join keeps each qualifying supplier once. The only
    wide ops are the fact agg and one semi shuffle."""
    qual_parts = part.filter(F.col("p_name").startswith(name_prefix)).select("p_partkey")
    shipped = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(qual_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_cents(F.col("l_quantity"))).alias("qty_c"))
        .filter(F.col("qty_c") > qty_floor * 100)
        .select("l_suppkey")
    )
    return (
        supplier.filter(F.col("s_nationkey") == nation_key)
        .join(shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


def promo_suppliers_sql(
    name_prefix: str = Q20_NAME_PREFIX,
    date_from: str = Q20_FROM,
    date_to: str = Q20_TO,
    qty_floor: int = Q20_QTY_FLOOR,
    nation_key: int = Q20_NATION,
) -> str:
    return f"""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey = {nation_key}
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '{name_prefix}%')
      AND l_shipdate >= TIMESTAMP '{date_from}' AND l_shipdate < TIMESTAMP '{date_to}'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > {qty_floor} * 100
  )
"""


# ---------------------------------------------------------------------------
# TPC-H Q21 shape — suppliers who kept orders waiting
# ---------------------------------------------------------------------------
# Without l_commitdate/l_receiptdate, "late" = shipped more than
# `late_days` after the order date. Q21's EXISTS (another supplier in
# the order) / NOT EXISTS (another LATE supplier in the order) pair is
# planned as one per-order conditional-distinct aggregation joined back
# to the late lines — one pass over the order's lines instead of two
# correlated self-joins.

Q21_LATE_DAYS = 400
Q21_NATION = 3
Q21_STATUS = "F"


def waiting_suppliers(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    late_days: int = Q21_LATE_DAYS,
    nation_key: int = Q21_NATION,
    status: str = Q21_STATUS,
) -> DataFrame:
    """(s_suppkey, s_name, numwait): TPC-H Q21 — suppliers of one
    nation who were the SOLE late supplier on multi-supplier finished
    orders, with how often it happened.

    Physical plan: ONE fact pass. The status-filtered fact join
    reduces to (order, supplier, any_late) grain with one hash agg;
    the EXISTS/NOT-EXISTS pair then becomes two window sums over that
    grain partitioned by orderkey — count(*) = distinct suppliers,
    sum(late) = distinct late suppliers, because the grain is already
    distinct — so no second scan, no join-back, no recompute (the
    first draft joined a per-order summary back to the late lines and
    Catalyst re-executed the whole fact join for each consumer: two
    parquet scans of lineitem in the captured plan). The window key
    is the high-cardinality orderkey — no single-partition hazard.
    This decorrelation is the optimization Catalyst cannot derive
    from correlated EXISTS SQL; supplier joins at the end over the
    small surviving set, nation filter pushed to its scan."""
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
    pair_grain = (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == status).select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late.cast("int")).alias("late"))
    )
    w = Window.partitionBy("l_orderkey")
    blamed = (
        pair_grain.select(
            "l_orderkey",
            "l_suppkey",
            "late",
            F.count("*").over(w).alias("n_supp"),
            F.sum("late").over(w).alias("n_late"),
        )
        .filter((F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("numwait"))
    )
    return (
        blamed.join(
            supplier.filter(F.col("s_nationkey") == nation_key),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "numwait")
    )


def waiting_suppliers_sql(
    late_days: int = Q21_LATE_DAYS,
    nation_key: int = Q21_NATION,
    status: str = Q21_STATUS,
) -> str:
    return f"""
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL {late_days} DAY) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = '{status}'
), per_order AS (
  SELECT l_orderkey AS ok,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late
  FROM lines GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, numwait
FROM (
  SELECT l_suppkey, count(*)::BIGINT AS numwait
  FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lines WHERE is_late) late_pairs
  JOIN per_order ON l_orderkey = ok
  WHERE n_supp >= 2 AND n_late = 1
  GROUP BY l_suppkey
) b
JOIN supplier ON l_suppkey = s_suppkey
WHERE s_nationkey = {nation_key}
"""


# ---------------------------------------------------------------------------
# Market-basket co-purchase pairs — the within-group self-join
# ---------------------------------------------------------------------------

COPURCHASE_MIN_COUNT = 3
COPURCHASE_ORDER_CAP = 50


def copurchase_pairs(
    lineitem: DataFrame,
    min_count: int = COPURCHASE_MIN_COUNT,
    order_cap: int = COPURCHASE_ORDER_CAP,
) -> DataFrame:
    """(part_a, part_b, n_orders): part pairs bought together in at
    least `min_count` orders (part_a < part_b, orders counted once).

    Physical plan: NOT a self-join. One groupBy(l_orderkey) collects
    each basket as a sorted distinct-part array (collect_set folds the
    DISTINCT into the same exchange), the cap drops pathological
    baskets as a constant-time size() check on the grouped row, and
    the i<j pair expansion is a JVM array expression (transform over
    suffix slices, flattened) — the quadratic work happens inside one
    task per basket with a hard P <= order_cap bound, and nothing
    order-sized ever shuffles twice. The measured self-join twin
    reshuffled both sides (the distinct partitions on (order, part),
    not order) and clocked 4.4 s at sf0.1 vs ~1 s for this shape. At
    100 TB the cap is the load-bearing bound: without it one
    mega-basket emits P² rows from a single task. Mirrored exactly in
    the oracle SQL."""
    baskets = (
        lineitem.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts").between(2, order_cap))
    )
    pairs = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + 2, F.size(F.col("parts"))),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count("*").cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= min_count)
    )


def copurchase_pairs_sql(
    min_count: int = COPURCHASE_MIN_COUNT, order_cap: int = COPURCHASE_ORDER_CAP
) -> str:
    return f"""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), bounded AS (
  SELECT l_orderkey, l_partkey FROM op
  WHERE l_orderkey IN (
    SELECT l_orderkey FROM op GROUP BY l_orderkey HAVING count(*) <= {order_cap}
  )
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*)::BIGINT AS n_orders
FROM bounded a JOIN bounded b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY part_a, part_b
HAVING count(*) >= {min_count}
"""


# ---------------------------------------------------------------------------
# Rolling 7-day revenue — the RANGE-frame window
# ---------------------------------------------------------------------------


def rolling_revenue(orders: DataFrame, days: int = 7) -> DataFrame:
    """(day, revenue_c, rolling_revenue_c): daily order revenue with a
    trailing `days`-day RANGE-frame sum (calendar days, not rows —
    gap days contribute nothing and must not shift the frame).

    Physical plan: one hash agg to daily grain FIRST (the window then
    runs over ~|days| rows, not |orders| — windows never see raw
    facts), then a rangeBetween frame over the integer epoch-day. The
    daily table is tiny at any SF, but the single-partition global
    window is still avoided on principle at 100 TB grain counts —
    windows here would partition by a coarser key (year) if the day
    count ever grew; documented, not needed at TPC-H date ranges
    (~2.5k days even at SF=100k)."""
    daily = (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("revenue_c"))
        .withColumn("day_n", F.datediff(F.col("day").cast("date"), F.lit("1970-01-01").cast("date")))
    )
    w = (
        Window.orderBy("day_n").rangeBetween(-(days - 1), 0)
    )
    return daily.select(
        "day",
        "revenue_c",
        F.sum("revenue_c").over(w).cast("long").alias("rolling_revenue_c"),
    )


def rolling_revenue_sql(days: int = 7) -> str:
    return f"""
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT AS revenue_c,
         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_n
  FROM orders GROUP BY 1, 3
)
SELECT day, revenue_c,
       sum(revenue_c) OVER (ORDER BY day_n RANGE BETWEEN {days - 1} PRECEDING AND CURRENT ROW)::BIGINT
         AS rolling_revenue_c
FROM daily
"""


# ---------------------------------------------------------------------------
# Month-over-month growth — the lag window
# ---------------------------------------------------------------------------


def revenue_growth_mom(orders: DataFrame) -> DataFrame:
    """(month, revenue_c, prev_revenue_c, growth_ppm): monthly revenue
    with the previous month's value (lag) and growth in integer ppm.
    The first month has no predecessor and is DROPPED (lag would emit
    NULL; the registry convention is NULL-free outputs — NULL-vs-NaN
    normalization differs across engine→pandas paths, cf.
    asof_last_error's -1 sentinel).

    Physical plan: aggregate to month grain first (the lag window runs
    over dozens of rows); the single global window over months is
    bounded by the calendar, not the data — at 100 TB the month count
    is identical. Growth is bigint floor-division."""
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("revenue_c"))
    w = Window.orderBy("month")
    return (
        monthly.select(
            "month",
            "revenue_c",
            F.lag("revenue_c").over(w).cast("long").alias("prev_revenue_c"),
        )
        .filter(F.col("prev_revenue_c").isNotNull())
        .withColumn(
            "growth_ppm",
            F.expr("CAST((revenue_c - prev_revenue_c) * 1000000 DIV prev_revenue_c AS BIGINT)"),
        )
    )


REVENUE_GROWTH_MOM_SQL = """
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT AS revenue_c
  FROM orders GROUP BY 1
), lagged AS (
  SELECT month, revenue_c,
         lag(revenue_c) OVER (ORDER BY month)::BIGINT AS prev_revenue_c
  FROM monthly
)
SELECT month, revenue_c, prev_revenue_c,
       ((revenue_c - prev_revenue_c) * 1000000 // prev_revenue_c)::BIGINT AS growth_ppm
FROM lagged
WHERE prev_revenue_c IS NOT NULL
"""


# ---------------------------------------------------------------------------
# CUBE grouping and FULL OUTER reconciliation — the last two cells of
# the grouping-sets / join-type matrix
# ---------------------------------------------------------------------------


def sales_cube(orders: DataFrame) -> DataFrame:
    """(status, priority, grp, n_orders, revenue_c): order revenue by
    (status, priority) with CUBE — all four grouping sets (detail, per
    status, per priority, grand total) in one pass, disambiguated by
    the grouping_id bitmask ``grp`` (ROLLUP's sibling; sales_rollup
    covers the hierarchical case). NULL slots emit 'ALL' — but unlike
    ROLLUP a real NULL in the data would be ambiguous with a subtotal
    row, hence grp is part of the output contract.

    One shuffle: the Expand operator multiplies rows by the four sets
    BEFORE the exchange, partial agg still applies per set. Both group
    columns are low-cardinality catalogs, so Expand's 4× is on the
    map side only."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("grp"),
            F.count("*").cast("long").alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("revenue_c"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "grp",
            "n_orders",
            "revenue_c",
        )
    )


SALES_CUBE_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       GROUPING(o_orderstatus, o_orderpriority)::BIGINT AS grp,
       count(*)::BIGINT AS n_orders,
       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT AS revenue_c
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def user_order_reconciliation(customer: DataFrame, events: DataFrame) -> DataFrame:
    """(presence, n_keys): snapshot reconciliation — which user keys
    exist in the customer dimension, in the events stream, or both
    (the data-quality audit every pipeline runs after an ingest).
    FULL OUTER join, the one join type the rest of the surface doesn't
    exercise: inner/left/semi/anti/asof/range/salted/bucketed are all
    covered elsewhere. (The planted test covers all three presence
    classes; the synthetic tables yield both/customer_only.)

    Physical plan: both sides pre-aggregate to distinct keys BEFORE
    the full outer join (the join then sees |keys| rows, not |events|
    — full outer cannot broadcast, it must shuffle both sides, so
    shrinking them first is the scale move), then one catalog-sized
    presence rollup."""
    c = customer.select(F.col("c_custkey").alias("k")).distinct()
    e = events.select(F.col("user_id").alias("k2")).distinct()
    return (
        c.join(e, F.col("k") == F.col("k2"), "full_outer")
        .select(
            F.when(F.col("k").isNotNull() & F.col("k2").isNotNull(), "both")
            .when(F.col("k").isNotNull(), "customer_only")
            .otherwise("events_only")
            .alias("presence")
        )
        .groupBy("presence")
        .agg(F.count("*").cast("long").alias("n_keys"))
    )


USER_ORDER_RECONCILIATION_SQL = """
SELECT CASE WHEN c.k IS NOT NULL AND e.k2 IS NOT NULL THEN 'both'
            WHEN c.k IS NOT NULL THEN 'customer_only'
            ELSE 'events_only' END AS presence,
       count(*)::BIGINT AS n_keys
FROM (SELECT DISTINCT c_custkey AS k FROM customer) c
FULL OUTER JOIN (SELECT DISTINCT user_id AS k2 FROM events) e ON c.k = e.k2
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Inter-order gaps — lead() over a high-cardinality partition
# ---------------------------------------------------------------------------


def order_gap_days(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """(segment, n_gaps, sum_gap_days, avg_gap_days): per-customer
    inter-order gaps (lead over the customer's date-ordered orders),
    rolled up per market segment — the re-purchase-cadence metric.

    Physical plan: the lead window partitions by o_custkey — the
    high-cardinality axis, so the window scales with partitions (this
    is the lead/lag shape that IS safe at 100 TB, unlike a global
    ORDER BY window); ties within a customer-day break on o_orderkey
    so the sequence is total and both engines agree. The segment
    rollup joins customer AFTER the per-customer work (unhinted —
    scaling dim). avg is integer floor-division."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.select(
            "o_custkey",
            "o_orderdate",
            "o_orderkey",
            F.lead("o_orderdate").over(w).alias("next_date"),
        )
        .filter(F.col("next_date").isNotNull())
        .select(
            "o_custkey",
            F.datediff(F.col("next_date"), F.col("o_orderdate")).cast("long").alias("gap_days"),
        )
    )
    return (
        gaps.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.sum("gap_days").cast("long").alias("sum_gap_days"),
        )
        .withColumn("avg_gap_days", F.expr("sum_gap_days DIV n_gaps").cast("long"))
    )


ORDER_GAP_DAYS_SQL = """
WITH gaps AS (
  SELECT o_custkey,
         datediff('day', CAST(o_orderdate AS DATE),
                  CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
                                               ORDER BY o_orderdate, o_orderkey) AS DATE))
           AS gap_days
  FROM orders
)
SELECT c_mktsegment AS segment,
       count(*)::BIGINT AS n_gaps,
       sum(gap_days)::BIGINT AS sum_gap_days,
       (sum(gap_days) // count(*))::BIGINT AS avg_gap_days
FROM gaps JOIN customer ON o_custkey = c_custkey
WHERE gap_days IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Relational division — daily full-coverage users
# ---------------------------------------------------------------------------


def power_users_daily_coverage(events: DataFrame) -> DataFrame:
    """(user_id, n_full_days): users who performed EVERY event type in
    a single calendar day, and on how many days — relational division
    (the "suppliers who ship ALL parts" / FOR ALL shape), the one
    classic relational-algebra operator the surface didn't yet cover.

    Physical plan: division-by-count, not nested NOT EXISTS — one
    distinct over (user, day, type) (cardinality bounded by the
    covered triples, not events), a per-(user, day) count compared to
    the global type count (a 1-row aggregate broadcast in — the
    divisor is a catalog, its scan prunes to one column), then the
    per-user rollup. Nothing correlated, nothing quadratic; the
    division predicate evaluates as an equi-filter after one shuffle
    on the already-distinct triples."""
    day = F.date_format("ts", "yyyy-MM-dd").alias("d")
    triples = events.select("user_id", day, "event_type").distinct()
    n_types = events.select("event_type").distinct().agg(
        F.count("*").alias("n_types")
    )
    return (
        triples.groupBy("user_id", "d")
        .agg(F.count("*").alias("n_cov"))
        .join(F.broadcast(n_types))
        .filter(F.col("n_cov") == F.col("n_types"))
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_full_days"))
    )


POWER_USERS_DAILY_COVERAGE_SQL = """
WITH triples AS (
  SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS d, event_type FROM events
),
n AS (SELECT count(DISTINCT event_type) AS n_types FROM events)
SELECT user_id, count(*)::BIGINT AS n_full_days
FROM (
  SELECT user_id, d FROM triples GROUP BY user_id, d
  HAVING count(*) = (SELECT n_types FROM n)
)
GROUP BY user_id
"""
