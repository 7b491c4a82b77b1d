"""TPC-H classics over the driver's TPC-H-ish testdata — recognizable
benchmark shapes (pricing summary, shipping priority, local-supplier
volume, forecast revenue) with integer-cents determinism for the
DuckDB oracle.  Q1/Q6 are scan+agg; Q3/Q5 exercise multi-join plans
(broadcast dims + shuffle fact joins chosen by Catalyst/AQE).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from accountant_pdf_extract_spark.plans.driver_queries import register, t

_CUTOFF = "1998-09-01"


@register(
    "tpch_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf):
    li = t(spark, sf, "lineitem").where(F.col("l_shipdate") <= _CUTOFF)
    cents = lambda c: F.round(c * 100).cast("long")  # noqa: E731
    price = F.col("l_extendedprice")
    disc = F.col("l_discount")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(cents(F.col("l_quantity"))).alias("sum_qty_cents"),
        F.sum(cents(price)).alias("sum_base_cents"),
        F.sum(cents(price * (1 - disc))).alias("sum_disc_cents"),
        F.sum(cents(price * (1 - disc) * (1 + F.col("l_tax")))).alias(
            "sum_charge_cents"
        ),
        F.count("*").alias("count_order"),
    )


@register(
    "tpch_q3",
    """
    SELECT l.l_orderkey,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(o.o_orderdate AS DATE) AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, orderdate
    ORDER BY revenue_cents DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark, sf):
    c = t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders").where(F.col("o_orderdate") < "1995-03-15")
    li = t(spark, sf, "lineitem").where(F.col("l_shipdate") > "1995-03-15")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("orderdate"))
        .agg(F.sum(cents).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue_cents", "orderdate")
    )


@register(
    "tpch_q5",
    """
    SELECT n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def tpch_q5(spark, sf):
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").where(F.col("r_name") == "ASIA")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(cents).alias("revenue_cents"))
    )


@register(
    "tpch_q6",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark, sf):
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1994-01-01")
        & (F.col("l_shipdate") < "1995-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast(
                "long"
            )
        ).alias("revenue_cents"),
        F.count("*").alias("n"),
    )


@register(
    "tpch_q10",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_cents DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark, sf):
    """Returned-item revenue by customer (TPC-H Q10 shape): fact-side
    shuffle joins orders⋈lineitem, broadcast nation dim, top-20 via
    TakeOrderedAndProject (never a global-sort window)."""
    li = t(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        t(spark, sf, "customer")
        .join(t(spark, sf, "orders"), F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t(spark, sf, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q18",
    """
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qty_cents
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 30000)
    SELECT c_custkey, o_orderkey, qty_cents,
           CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
    FROM big JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
    """,
)
def tpch_q18(spark, sf):
    """Large-volume orders (TPC-H Q18 shape): pre-aggregate the fact
    side FIRST (map-side partial agg shrinks lineitem to one row per
    order), then join the small survivor set — never join-then-agg."""
    big = (
        t(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_cents"))
        .where(F.col("qty_cents") > 30000)
    )
    return (
        big.join(
            t(spark, sf, "orders"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        .join(t(spark, sf, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            "qty_cents",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
        )
    )


@register(
    "tpch_q4",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark, sf):
    """Order-priority checking (TPC-H Q4 shape, late-shipment proxy —
    this lineitem carries l_shipdate, not commit/receipt dates):
    EXISTS compiles to a LEFT SEMI join with a compound non-equi
    condition; the lineitem side stays unaggregated (semi join
    short-circuits per order)."""
    o = t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 30)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q12",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def tpch_q12(spark, sf):
    """Shipping-class split (TPC-H Q12 shape over the available
    columns): conditional CASE sums inside one partial+final hash
    aggregate after the fact join."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    return (
        t(spark, sf, "orders")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )
