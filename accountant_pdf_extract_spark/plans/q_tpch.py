"""TPC-H classics over the driver's TPC-H-ish testdata — recognizable
benchmark shapes (pricing summary, shipping priority, local-supplier
volume, forecast revenue) with integer-cents determinism for the
DuckDB oracle.  Q1/Q6 are scan+agg; Q3/Q5 exercise multi-join plans
(broadcast dims + shuffle fact joins chosen by Catalyst/AQE).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from accountant_pdf_extract_spark.plans.driver_queries import cents, register, t

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
    cc = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("orderdate"))
        .agg(F.sum(cc).alias("revenue_cents"))
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
    cc = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
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
        .agg(F.sum(cc).alias("revenue_cents"))
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
            cents(F.col("l_extendedprice") * F.col("l_discount"))
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
    rev = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
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
        .agg(F.sum(cents(F.col("l_quantity"))).alias("qty_cents"))
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
            cents(F.col("o_totalprice")).alias("total_cents"),
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


@register(
    "tpch_q7",
    """
    SELECT supp_nation, cust_nation, l_year, CAST(sum(v) AS BIGINT) AS revenue_cents
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                 CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS v
          FROM supplier s
          JOIN lineitem l ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                                 AND TIMESTAMP '1996-12-31 00:00:00')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark, sf):
    """Q7 volume-shipping shape (nation-pair revenue by year).  The
    two nation dims broadcast (25 rows); the nation-pair disjunction is
    applied post-join while supplier/customer pre-filter to the two
    nations so the fact joins stay small."""
    n = t(spark, sf, "nation").where(F.col("n_name").isin("NATION_1", "NATION_2"))
    s = t(spark, sf, "supplier").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),
                             F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    )
    c = t(spark, sf, "customer").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"),
                             F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("cn_key"),
    )
    li = t(spark, sf, "lineitem").where(
        F.col("l_shipdate").between("1995-01-01", "1996-12-31")
    )
    cc = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t(spark, sf, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(cc).alias("revenue_cents"))
    )


@register(
    "tpch_q13",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
)
def tpch_q13(spark, sf):
    """Q13 customer-order-count distribution: LEFT OUTER join with a
    join-side predicate (urgent orders excluded WITHOUT dropping
    order-less customers), then a two-level aggregate."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "tpch_q17",
    """
    WITH pf AS (SELECT p_partkey FROM part
                WHERE p_brand = 'Brand#23' AND p_size < 15),
         lp AS (SELECT l.l_partkey,
                       CAST(round(l.l_quantity * 100) AS BIGINT) AS q_cents,
                       CAST(round(l.l_extendedprice * 100) AS BIGINT) AS p_cents
                FROM lineitem l JOIN pf ON l.l_partkey = pf.p_partkey),
         ag AS (SELECT l_partkey,
                       CAST(sum(q_cents) AS BIGINT) AS sum_q,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM lp GROUP BY l_partkey)
    SELECT CAST(coalesce(sum(lp.p_cents), 0) // 7 AS BIGINT) AS avg_yearly_cents
    FROM lp JOIN ag ON lp.l_partkey = ag.l_partkey
    WHERE lp.q_cents * 5 * ag.cnt < ag.sum_q
    """,
)
def tpch_q17(spark, sf):
    """Q17 small-quantity-order revenue (per-part avg correlated
    subquery).  Engine plan: the brand/size filter broadcasts into the
    fact join, then the per-part average becomes a PARTITIONED window
    (sum/count over l_partkey) — one exchange, no self-join, no
    re-scan; the quantity test is pure integer arithmetic
    (q*5*cnt < sum_q  <=>  qty < 0.2*avg)."""
    from pyspark.sql.window import Window

    pf = t(spark, sf, "part").where(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 15)
    ).select("p_partkey")
    lp = (
        t(spark, sf, "lineitem")
        .join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            cents(F.col("l_quantity")).alias("q_cents"),
            cents(F.col("l_extendedprice")).alias("p_cents"),
        )
    )
    w = Window.partitionBy("l_partkey")
    return (
        lp.withColumn("sum_q", F.sum("q_cents").over(w))
        .withColumn("cnt", F.count("*").over(w))
        .where(F.col("q_cents") * 5 * F.col("cnt") < F.col("sum_q"))
        .agg(
            F.expr("coalesce(sum(p_cents), 0) div 7")
            .cast("long")
            .alias("avg_yearly_cents")
        )
    )


@register(
    "tpch_q19",
    """
    SELECT CAST(coalesce(sum(
             CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
           ), 0) AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark, sf):
    """Q19 disjunctive-predicate join.  The OR spans both sides, so
    Catalyst cannot push anything to either scan by itself — the
    engine derives the implied single-side filters (brand IN the three
    brands / size <= 15 on part, quantity <= 30 on lineitem) so both
    scans prune BEFORE the join, and the exact disjunction runs as the
    residual post-join filter."""
    p = t(spark, sf, "part").where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & F.col("p_size").between(1, 15)
    )
    li = t(spark, sf, "lineitem").where(F.col("l_quantity").between(1, 30))
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    cc = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(F.coalesce(F.sum(cc), F.lit(0)).cast("long").alias("revenue_cents"))
    )


@register(
    "tpch_q22",
    """
    WITH pool AS (SELECT c_custkey, c_nationkey,
                         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
                  FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9)),
         s AS (SELECT CAST(sum(cents) AS BIGINT) AS total,
                      CAST(count(*) AS BIGINT) AS n
               FROM pool WHERE cents > 0)
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(cents) AS BIGINT) AS totacctbal_cents
    FROM pool, s
    WHERE pool.cents > 0 AND pool.cents * s.n > s.total
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = pool.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def tpch_q22(spark, sf):
    """Q22 global-avg + anti-join shape: customers in five nations
    with above-average positive balance and no URGENT orders (the
    driver testdata gives every customer at least one order, so the
    classic no-orders predicate would be vacuously empty — the
    filtered anti-join keeps the identical plan shape with a
    non-trivial result).  The mean test is pure integer (cents*n >
    total — strict, no float avg crosses the engines); the (total, n)
    scalar broadcasts; the no-urgent-orders test is a shuffle LEFT
    ANTI against orders (orders' custkey set is too big to broadcast
    at scale)."""
    pool = (
        t(spark, sf, "customer")
        .where(F.col("c_nationkey").isin(1, 3, 5, 7, 9))
        .select(
            "c_custkey",
            "c_nationkey",
            cents(F.col("c_acctbal")).alias("cents"),
        )
    )
    s = pool.where(F.col("cents") > 0).agg(
        F.sum("cents").alias("total"), F.count("*").alias("n")
    )
    o = (
        t(spark, sf, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        pool.where(F.col("cents") > 0)
        .crossJoin(F.broadcast(s))
        .where(F.col("cents") * F.col("n") > F.col("total"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("cents").alias("totacctbal_cents"),
        )
    )


@register(
    "tpch_q8",
    """
    SELECT o_year,
           CAST(floor(1000.0
             * sum(CASE WHEN nation = 'NATION_1' THEN v ELSE 0 END)
             / sum(v)) AS BIGINT) AS mkt_share_milli
    FROM (SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                 CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS v,
                 n2.n_name AS nation
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
          JOIN region r ON n1.n_regionkey = r.r_regionkey
          JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
          WHERE r.r_name = 'ASIA'
            AND p.p_type = 'ECONOMY'
            AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                                  AND TIMESTAMP '1996-12-31 00:00:00')
    GROUP BY o_year
    """,
)
def tpch_q8(spark, sf):
    """Q8 market-share shape: NATION_1 suppliers' share of ECONOMY-part
    volume sold into ASIA customers, by order year, in integer milli
    (conditional-sum / total-sum, floored — the same integer-share
    convention as q_promo_share).  Seven relations: part pre-filters
    and broadcasts into the fact; nation/region dims broadcast; the
    customer-side nation->region chain prunes customers BEFORE the
    fact join; only orders-lineitem shuffle at scale."""
    p = t(spark, sf, "part").where(F.col("p_type") == "ECONOMY").select("p_partkey")
    r = t(spark, sf, "region").where(F.col("r_name") == "ASIA").select("r_regionkey")
    n1 = (
        t(spark, sf, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    c = (
        t(spark, sf, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    n2 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    s = (
        t(spark, sf, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "nation")
    )
    o = t(spark, sf, "orders").where(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    li = t(spark, sf, "lineitem")
    v = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            v.alias("v"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.floor(
                F.lit(1000.0)
                * F.sum(F.when(F.col("nation") == "NATION_1", F.col("v")).otherwise(0))
                / F.sum("v")
            )
            .cast("long")
            .alias("mkt_share_milli")
        )
    )


@register(
    "tpch_q15",
    """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_cents
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_cents = (SELECT max(total_cents) FROM rev)
    """,
)
def tpch_q15(spark, sf):
    """Q15 top-supplier shape (the revenue 'view' + its max): one
    fact-side aggregate builds the revenue relation, its single-row
    max broadcasts back as an equi-filter (never an unpartitioned
    rank window over the whole relation), and the supplier dim joins
    only the surviving row(s)."""
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("total_cents")
    )
    mx = rev.agg(F.max("total_cents").alias("mx"))
    top = rev.join(
        F.broadcast(mx), F.col("total_cents") == F.col("mx")
    ).select("supplier_no", "total_cents")
    s = t(spark, sf, "supplier")
    return (
        s.join(top, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_cents")
    )
