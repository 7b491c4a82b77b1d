"""Scale-pattern evidence tests: bucketed co-located joins (no
Exchange) and salted skew joins (row-identical to plain joins)."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

from accountant_pdf_extract_spark.operators.skewjoin import salted_join

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    # make a skewed big side: every lineitem key plus a hot key burst
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    hot = li.limit(1).crossJoin(spark.range(500).select(F.lit(1).alias("_x"))).drop("_x")
    big = li.unionByName(hot)
    small = orders.select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )

    plain = big.join(small, "l_orderkey").groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("q"),
    )
    salted = salted_join(big, small, "l_orderkey", salt_buckets=8).groupBy(
        "o_orderstatus"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("q"),
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_spreads_hot_key(spark):
    """BYTE-IDENTICAL duplicate rows of one hot key (the canonical
    skew case) must land in >1 salt bucket when the caller supplies a
    tiebreak id — exercised through the REAL ``_salt_expr`` used by
    salted_join, not a stand-in expression.  The salt must be a pure
    function of row content (retry-safe): position-derived salts
    (spark_partition_id/monotonically_increasing_id) are banned
    because a map-task retry would re-salt rows differently than
    reducers that already fetched (SPARK-23207 class)."""
    from accountant_pdf_extract_spark.operators import skewjoin

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey")
    hot_key = li.first()["l_orderkey"]
    # 400 payload-identical rows of the hot key, each with a unique id
    big = li.where(F.col("l_orderkey") == hot_key).limit(1).crossJoin(
        spark.range(400).select(F.col("id").alias("rid"))
    ).repartition(4)
    salted = big.withColumn(
        skewjoin._SALT, skewjoin._salt_expr(big, "l_orderkey", 8, "rid")
    )
    n_buckets = salted.select(skewjoin._SALT).distinct().count()
    assert n_buckets >= 6

    # determinism: recomputing the same expression on a reshuffled
    # lineage assigns every rid the SAME salt (retry-safety proxy)
    a = {r["rid"]: r[skewjoin._SALT] for r in salted.collect()}
    resalted = big.repartition(11).withColumn(
        skewjoin._SALT, skewjoin._salt_expr(big, "l_orderkey", 8, "rid")
    )
    b = {r["rid"]: r[skewjoin._SALT] for r in resalted.collect()}
    assert a == b

    # and the full operator still returns join-identical results
    small = spark.createDataFrame([(int(hot_key), "X")],
                                  "l_orderkey long, tag string")
    out = skewjoin.salted_join(
        big, small, "l_orderkey", salt_buckets=8, tiebreak="rid"
    )
    assert out.count() == 400

    import pytest

    with pytest.raises(ValueError, match="tiebreak"):
        skewjoin.salted_join(
            big, small, "l_orderkey", salt_buckets=8, tiebreak="nope"
        )

    with pytest.raises(ValueError, match="salt_buckets"):
        skewjoin.salted_join(big, small, "l_orderkey", salt_buckets=0)


def test_bucketed_join_has_no_exchange(spark, tmp_path: pathlib.Path):
    """Pre-bucketed tables co-locate join keys at write time — the
    join plan shows zero shuffle Exchange (the 100 TB pattern for
    repeatedly-joined fact tables)."""
    # warehouse.dir is a static conf — tables land in ./spark-warehouse
    # (gitignored); clear any stale locations first
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    for stale in ("spark-warehouse/b_orders", "spark-warehouse/b_lineitem"):
        shutil.rmtree(stale, ignore_errors=True)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        li.withColumn("o_orderkey", F.col("l_orderkey"))
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
    )
    # small tables would otherwise broadcast — force the SMJ path the
    # pattern targets (at 100 TB neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_dedup_plans_are_map_side(spark):
    """Regression guard for VERDICT r1 #3/#4: simhash and minhash must
    stay free of crossJoin fan-outs — no BroadcastNestedLoopJoin, no
    CartesianProduct, and no aggregation Exchange (the only permitted
    exchange is the local round-robin small-file fan-out)."""
    from accountant_pdf_extract_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for df in (
        dedup.simhash16(docs),
        dedup.minhash_bands(docs, k=8, bands=4),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "HashAggregate" not in plan, plan
        exchanges = [
            l for l in plan.splitlines() if "Exchange" in l
        ]
        assert all("roundrobin" in l.lower() for l in exchanges), exchanges


def test_asof_join_backward_semantics(spark):
    """Handcrafted edges: exact-timestamp tie matches (<=), earlier
    right row carries forward, no-preceding-row yields nulls, and a
    null FIELD in the matched right row must not stitch in an older
    row's value (all-or-nothing struct semantics)."""
    from accountant_pdf_extract_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [(1, 5, 100), (1, 10, 101), (1, 2, 102), (2, 7, 200)],
        "k long, t long, lid long",
    )
    right = spark.createDataFrame(
        # the (1, NULL, ...) row must never match: a null timestamp
        # cannot satisfy right.t <= left.t (old code sorted it NULLS
        # FIRST and leaked it into early left rows)
        [(1, 3, 900, 33), (1, 10, 901, None), (2, 9, 902, 99),
         (1, None, 999, 77)],
        "k long, t long, rid long, rv long",
    )
    out = {
        r["lid"]: (r["rid"], r["rv"])
        for r in asof_join_backward(
            left, right, on="t", by="k", right_cols=["rid", "rv"]
        ).collect()
    }
    assert out[100] == (900, 33)     # carried forward from t=3
    assert out[101] == (901, None)   # tie t=10 matches; rv stays None
    assert out[102] == (None, None)  # nothing at-or-before t=2
    assert out[200] == (None, None)  # right row at t=9 is after t=7


def test_asof_join_matches_bruteforce_oracle(spark):
    """Property-style check on a seeded random frame: the union +
    running-last composition equals the quadratic definition (max
    right.t <= left.t per key)."""
    import random

    from accountant_pdf_extract_spark.operators.asof import asof_join_backward

    rng = random.Random(7)
    left_rows = [
        (rng.randrange(6), rng.randrange(50), 1000 + i) for i in range(120)
    ]
    right_rows = {}
    for j in range(80):
        k, t_ = rng.randrange(6), rng.randrange(50)
        # unique per (k, t): keep max rid like the operator contract
        right_rows[(k, t_)] = max(right_rows.get((k, t_), -1), 2000 + j)
    right_list = [(k, t_, rid, rid * 10) for (k, t_), rid in right_rows.items()]

    left = spark.createDataFrame(left_rows, "k long, t long, lid long")
    right = spark.createDataFrame(right_list, "k long, t long, rid long, rv long")
    got = {
        r["lid"]: (r["rid"], r["rv"])
        for r in asof_join_backward(
            left, right, on="t", by="k", right_cols=["rid", "rv"]
        ).collect()
    }
    assert len(got) == len({l[2] for l in left_rows}) == 120
    for k, t_, lid in left_rows:
        cands = [
            (tt, rid) for (kk, tt), rid in right_rows.items()
            if kk == k and tt <= t_
        ]
        expect = (None, None)
        if cands:
            _, rid = max(cands)
            expect = (rid, rid * 10)
        assert got[lid] == expect, (lid, got[lid], expect)


def test_duplicate_clusters_match_union_find(spark):
    """Iterative min-label propagation must equal a Python union-find
    on the same edge set — both on a handcrafted chain/star graph and
    on the real MinHash candidate pairs from sf0.001 documents."""
    from accountant_pdf_extract_spark.operators import dedup

    def union_find(pairs):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # normalize: every member -> min of its component
        return {x: find(x) for x in list(parent)}

    # handcrafted: a 5-chain, a star, a lone pair
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (10, 13), (20, 21)]
    pairs_df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["sid"]: r["cluster"]
        for r in dedup.duplicate_clusters(pairs_df).collect()
    }
    assert got == union_find(edges)
    assert got[5] == 1 and got[13] == 10 and got[21] == 20

    # real candidate pairs
    docs = spark.read.parquet(f"{SF}/documents.parquet").where("doc_id < 200")
    cand = dedup.minhash_candidate_pairs(dedup.minhash_bands(docs, k=8, bands=4))
    cand_pairs = [(r["a"], r["b"]) for r in cand.collect()]
    assert cand_pairs, "expected some candidate pairs"
    got2 = {
        r["sid"]: r["cluster"]
        for r in dedup.duplicate_clusters(cand).collect()
    }
    assert got2 == union_find(cand_pairs)

    # chain-shaped pathology: a 64-long chain converges in O(log n)
    # star-contraction rounds (naive label propagation needs 64) —
    # max_iter=8 would fail the old algorithm
    import random

    chain = [(i, i + 1) for i in range(64)]
    rnd = random.Random(13)
    shuffled = [(b, a) if rnd.random() < 0.5 else (a, b) for a, b in chain]
    rnd.shuffle(shuffled)
    chain_df = spark.createDataFrame(shuffled, "a long, b long")
    got3 = {
        r["sid"]: r["cluster"]
        for r in dedup.duplicate_clusters(chain_df, max_iter=8).collect()
    }
    assert got3 == {i: 0 for i in range(65)}

    # random graph fuzz vs union-find
    rnd = random.Random(7)
    redges = [
        (rnd.randrange(200), rnd.randrange(200)) for _ in range(150)
    ]
    redges = [(a, b) for a, b in redges if a != b]
    got4 = {
        r["sid"]: r["cluster"]
        for r in dedup.duplicate_clusters(
            spark.createDataFrame(redges, "a long, b long"), max_iter=10
        ).collect()
    }
    assert got4 == union_find(redges)


def test_salted_join_refuses_outer_and_is_content_deterministic(spark):
    import pytest

    big = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    small = spark.createDataFrame([(1, "x")], "k long, w string")
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(big, small, "k", how="full")
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(big, small, "k", how="right")
    # 'cross' is refused too: Spark plans a using-columns 'cross' join
    # as INNER, silently dropping unmatched keys — never allow it
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(big, small, "k", how="cross")
    # inputs carrying the internal salt column are refused, not
    # silently clobbered-and-dropped
    with pytest.raises(ValueError, match="_sj_salt"):
        salted_join(big.withColumn("_sj_salt", F.lit(1)), small, "k")
    # content-keyed salt: same result regardless of partitioning
    a = sorted(map(tuple, salted_join(big, small, "k").collect()))
    b = sorted(
        map(tuple, salted_join(big.repartition(7), small, "k").collect())
    )
    assert a == b == [(1, "a", "x")]


def test_global_row_number_matches_window(spark):
    """Exact equivalence with row_number() OVER (ORDER BY ...) — but
    built from partitioned windows + broadcast offsets only (scale
    shape), including with heavy ties in the rank key."""
    from pyspark.sql.window import Window

    from accountant_pdf_extract_spark.operators.ranking import (
        global_row_number,
    )

    cust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    key = -F.round(F.col("c_acctbal") * 100).cast("long")
    got = {
        r["c_custkey"]: r["pos"]
        for r in global_row_number(
            cust, key, F.col("c_custkey"), num_buckets=8
        ).select("c_custkey", "pos").collect()
    }
    w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    want = {
        r["c_custkey"]: r["pos"]
        for r in cust.select(
            "c_custkey", F.row_number().over(w).alias("pos")
        ).collect()
    }
    assert got == want

    # output contract: input columns + pos_col, nothing else leaks
    out_cols = global_row_number(
        cust, key, F.col("c_custkey"), num_buckets=8
    ).columns
    assert out_cols == cust.columns + ["pos"]

    # heavy ties: constant rank key -> position = tiebreak order
    tied = cust.limit(100)
    gt = {
        r["c_custkey"]: r["pos"]
        for r in global_row_number(
            tied, F.lit(0), F.col("c_custkey"), num_buckets=4
        ).select("c_custkey", "pos").collect()
    }
    keys = sorted(gt)
    assert [gt[k] for k in keys] == list(range(1, len(keys) + 1))


def test_scalable_ntile_matches_window_ntile(spark):
    """Exact ntile semantics (first n%k tiles take the extra row) at
    several row counts, including n < k and n % k != 0."""
    from pyspark.sql.window import Window

    from accountant_pdf_extract_spark.operators.ranking import scalable_ntile

    cust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    for n_rows, k in ((1500, 4), (103, 7), (3, 5)):
        sub = cust.orderBy("c_custkey").limit(n_rows)
        got = {
            r["c_custkey"]: r["tile"]
            for r in scalable_ntile(
                sub,
                k,
                -F.round(F.col("c_acctbal") * 100).cast("long"),
                F.col("c_custkey"),
                num_buckets=8,
            ).select("c_custkey", "tile").collect()
        }
        w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        want = {
            r["c_custkey"]: r["tile"]
            for r in sub.select(
                "c_custkey", F.ntile(k).over(w).alias("tile")
            ).collect()
        }
        assert got == want, (n_rows, k)


def test_ranking_plans_have_no_global_data_window(spark):
    """The physical plans of q_ntile and bm25_rank must not sort the
    DATA through an unpartitioned window: q_ntile's windows are all
    partitioned or bounded-metadata-sized; bm25's global top-k is
    TakeOrderedAndProject."""
    from accountant_pdf_extract_spark.operators import textstats
    from accountant_pdf_extract_spark.plans.driver_queries import queries

    sf = "/root/testdata/sf0.001"
    ntile_plan = queries()["q_ntile"](spark, sf)._jdf.queryExecution().executedPlan().toString()
    # every Window node must either carry a partition spec (the
    # per-bucket row_number — parallel) or aggregate the tiny per-bucket
    # COUNT relation (_cnt, <= num_buckets rows of metadata); no
    # unpartitioned window may ever see table rows
    win_lines = [
        ln for ln in ntile_plan.splitlines() if "Window [" in ln
    ]
    assert win_lines, ntile_plan
    for ln in win_lines:
        partitioned = "windowspecdefinition(_bkt#" in ln
        metadata_sized = "sum(_cnt#" in ln
        assert partitioned or metadata_sized, ln

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    bm_plan = (
        textstats.bm25_rank(docs, ["join", "scan"], k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in bm_plan


def test_range_join_matches_nonequi_join(spark):
    """Bucketed range join ≡ the plain non-equi BETWEEN join, including
    the long-interval broadcast tail; the short path's physical plan
    must be an EQUI join (hash/merge), never BroadcastNestedLoop."""
    from accountant_pdf_extract_spark.operators.rangejoin import range_join

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", F.floor(F.unix_timestamp("ts") / 86400).alias("d")
    )
    iv = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            "o_orderkey",
            F.floor(F.unix_timestamp("o_orderdate") / 86400).alias("lo"),
        )
        .withColumn(
            # mixed lengths: mostly 7-day windows, a rare giant window
            # that must route through the broadcast tail
            "hi",
            F.when(F.col("o_orderkey") % 997 == 0, F.col("lo") + 10_000)
            .otherwise(F.col("lo") + 7),
        )
    )
    got = range_join(ev, iv, "d", "lo", "hi", bucket_width=7, max_span_buckets=64)
    want = ev.join(iv, F.col("d").between(F.col("lo"), F.col("hi")))
    key = lambda r: (r["event_id"], r["o_orderkey"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))

    # the bulk (short-interval) path must be an EQUI join on the
    # bucket id — a hash/merge join keyed on _rj_b, never the
    # BroadcastNestedLoopJoin Spark would plan for the raw BETWEEN
    short_iv = iv.withColumn("hi", F.col("lo") + 7)
    plan = (
        range_join(ev, short_iv, "d", "lo", "hi", bucket_width=7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    equi_join_lines = [
        ln for ln in plan.splitlines()
        if "Join" in ln and "_rj_b" in ln and "NestedLoop" not in ln
    ]
    assert equi_join_lines, plan
    # the only NestedLoop allowed is the long-tail leg, which carries
    # zero interval rows here (every window is 1-2 buckets wide)
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert "_rj_b" not in ln

    # overlapping-column refusal
    import pytest

    with pytest.raises(ValueError, match="share columns"):
        range_join(
            ev.withColumnRenamed("d", "lo"), iv, "lo", "lo", "hi", 7
        )


def test_repetition_features_plan_is_map_only(spark):
    """The repetition signals must stay a scan->project plan: zero
    Exchange, zero Generate/Aggregate — the property that lets
    repetition filtering run before a pipeline's first shuffle."""
    from accountant_pdf_extract_spark.operators.textstats import (
        repetition_features,
    )

    df = repetition_features(spark.read.parquet(f"{SF}/documents.parquet"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan and "Aggregate" not in plan, plan


def test_oov_rate_plan_scores_without_corpus_shuffle(spark):
    """oov_rate's vocabulary cut must plan as TakeOrderedAndProject
    (never a global sort of token counts), and the scoring side of the
    plan must not shuffle the corpus: the only exchanges belong to the
    vocabulary aggregation (token counts + the one-row collect_list),
    plus the broadcast of that one row."""
    from accountant_pdf_extract_spark.operators.textstats import oov_rate

    df = oov_rate(spark.read.parquet(f"{SF}/documents.parquet"), vocab_size=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "Sort " not in plan.replace("SortAggregate", ""), plan


def test_range_join_query_is_not_vacuous(spark):
    """q_range_join's constant era shift must keep the point and
    interval domains overlapping: a regeneration of either table's
    date era would silently re-vacuize the query (0 rows passes
    parity while gating nothing — the exact bug fixed in r3)."""
    from accountant_pdf_extract_spark.plans import driver_queries

    df = driver_queries.queries()["q_range_join"](spark, SF)
    rows = df.collect()
    assert rows and sum(r["n"] for r in rows) > 0, (
        "q_range_join matched nothing — the 10592-day shift no longer "
        "lands events inside the orders era; re-derive the constant"
    )


def test_asof_null_keys_and_collisions(spark):
    """SQL semantics on NULLs: a NULL by-key right row matches nothing
    and a NULL by-key left row passes through unmatched; colliding
    output/reserved column names refuse up front."""
    import pytest

    from accountant_pdf_extract_spark.operators.asof import (
        asof_join_backward,
    )

    left = spark.createDataFrame(
        [(None, 10, "ln"), (1, 10, "l1")], "k long, ts long, tag string"
    )
    right = spark.createDataFrame(
        [(None, 5, "rn"), (1, 5, "r1")], "k long, ts long, v string"
    )
    got = {
        r["tag"]: r["v"]
        for r in asof_join_backward(
            left, right, on="ts", by="k", right_cols=["v"]
        ).collect()
    }
    assert got == {"ln": None, "l1": "r1"}  # NULL keys never match

    with pytest.raises(ValueError, match="collision"):
        asof_join_backward(left, right, on="ts", by="k",
                           right_cols=["v", "tag"])
    with pytest.raises(ValueError, match="collision"):
        asof_join_backward(left.withColumn("_side", F.lit(1)), right,
                           on="ts", by="k", right_cols=["v"])


def test_grouped_stats_null_value_skipped_not_int64min(spark):
    """A NULL value must be skipped by the quantiles (never floor(NaN)
    -> INT64_MIN garbage); count(*) still counts the row; an all-NULL
    group yields NULL stats like DuckDB quantile_cont."""
    from accountant_pdf_extract_spark.operators import sessions

    ev = spark.createDataFrame(
        [(1, 1.0), (1, None), (1, 3.0), (2, None)],
        "user_id long, value double",
    )
    got = {r["user_id"]: r.asDict() for r in
           sessions.grouped_stats(ev).collect()}
    assert got[1]["n_events"] == 3 and got[1]["median_cents"] == 200.0
    assert got[2]["n_events"] == 1 and got[2]["median_cents"] is None


def test_packing_guards_null_tokens_and_bad_budget(spark):
    import pytest

    from accountant_pdf_extract_spark.operators.packing import (
        pack_token_shards,
    )

    df = spark.createDataFrame(
        [("a", 5), ("b", None), ("c", 7)], "doc_id string, n long"
    )
    with pytest.raises(ValueError, match="budget"):
        pack_token_shards(df, "doc_id", "n", budget=0)
    out = pack_token_shards(df, "doc_id", "n", budget=10).collect()
    # NULL token count packs as 0 tokens: every doc still gets a
    # non-null, group-prefixed shard key
    assert all(r["shard_key"] is not None and "-" in r["shard_key"]
               for r in out)
    assert len(out) == 3


def test_range_join_rejects_reserved_columns(spark):
    import pytest

    from accountant_pdf_extract_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame([(1, 5)], "p long, _rj_b long")
    iv = spark.createDataFrame([(0, 10)], "lo long, hi long")
    with pytest.raises(ValueError, match="reserved"):
        range_join(pts, iv, "p", "lo", "hi", bucket_width=7)


def test_global_rank_degenerate_bounds_not_empty(spark):
    """num_buckets=1 and all-NULL rank keys must DEGRADE to one bucket
    (still every row ranked), never silently drop to an empty result;
    internal-column collisions refuse up front."""
    import pytest

    from accountant_pdf_extract_spark.operators.ranking import (
        global_row_number,
    )

    df = spark.createDataFrame([(i, i * 10) for i in range(10)],
                               "id long, v long")
    one = global_row_number(df, F.col("v"), F.col("id"), num_buckets=1)
    assert sorted((r["id"], r["pos"]) for r in one.collect()) == [
        (i, i + 1) for i in range(10)]

    nulls = spark.createDataFrame([(i,) for i in range(5)], "id long")
    got = global_row_number(
        nulls, F.lit(None).cast("long"), F.col("id"), num_buckets=8)
    assert sorted((r["id"], r["pos"]) for r in got.collect()) == [
        (i, i + 1) for i in range(5)]

    with pytest.raises(ValueError, match="collide"):
        global_row_number(df.withColumn("_rk", F.lit(1)), F.col("v"),
                          F.col("id"))
    from accountant_pdf_extract_spark.operators.ranking import scalable_ntile
    with pytest.raises(ValueError, match="n_tiles"):
        scalable_ntile(df, 0, F.col("v"), F.col("id"))
