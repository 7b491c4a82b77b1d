"""Python UDTF surface: lateral expansion in SQL, parity with the
Catalyst shingle relation."""

from __future__ import annotations

from pyspark.sql import functions as F

from accountant_pdf_extract_spark.operators import dedup
from accountant_pdf_extract_spark.operators.udtfs import register_udtfs

SF = "/root/testdata/sf0.001"


def test_shingle_udtf_matches_catalyst_relation(spark):
    register_udtfs(spark)
    docs = spark.read.parquet(f"{SF}/documents.parquet").where(
        F.col("doc_id") < 10
    )
    docs.createOrReplaceTempView("d10")
    via_udtf = spark.sql(
        "SELECT d.doc_id AS sid, s.shingle FROM d10 d, "
        "LATERAL shingles(d.text, 8) s"
    ).distinct()
    via_catalyst = dedup.shingle_df(docs, k=8)
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, via_catalyst.collect()))
    assert a == b and len(a) > 100


def test_tokenize_udtf(spark):
    register_udtfs(spark)
    row = spark.sql(
        "SELECT count(*) AS n, sum(CASE WHEN is_stopword THEN 1 ELSE 0 END) AS s "
        "FROM (SELECT 'the quick fox and the dog' AS t), LATERAL tokenize(t)"
    ).first()
    assert row["n"] == 6 and row["s"] == 3


def test_shingle_udtf_matches_sql_on_edge_whitespace(spark):
    """Leading tabs/newlines: the UDTF must normalize exactly like
    _shingles_sql (SQL trim strips SPACES only, so '\\tfoo' keeps a
    leading collapsed space) — str.split() would diverge."""
    from accountant_pdf_extract_spark.operators.dedup import shingle_df
    from accountant_pdf_extract_spark.operators.udtfs import register_udtfs

    register_udtfs(spark)
    docs = spark.createDataFrame(
        [(1, "\tfoo bar"), (2, "tail newline\n"), (3, " spaced ")],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("edge_docs")
    via_udtf = {
        (r["doc_id"], r["shingle"])
        for r in spark.sql(
            "SELECT d.doc_id, s.shingle "
            "FROM edge_docs d, LATERAL shingles(d.text, 4) s"
        ).collect()
    }
    via_sql = {
        (r["sid"], r["shingle"])
        for r in shingle_df(docs, k=4).collect()
    }
    assert via_udtf == via_sql and via_udtf
    # the leading tab survives as a collapsed leading SPACE (SQL trim
    # strips spaces only) — pin the agreed semantics, not just parity
    assert (1, " foo") in via_udtf


def test_shingle_udtf_matches_sql_on_unicode_whitespace(spark):
    """NBSP (U+00A0, latin-1-representable) is whitespace to Python's
    \\s but NOT to Java/Spark's — the UDTF must use the ASCII class so
    SQL users and shingle_df get identical shingles."""
    from accountant_pdf_extract_spark.operators.dedup import _shingles_sql

    df = spark.createDataFrame(
        [("d1", "a b cd")], "doc_id string, text string"
    )
    df.createOrReplaceTempView("nbsp_docs")
    register_udtfs(spark)
    via_udtf = sorted(
        (r["pos"], r["shingle"])
        for r in spark.sql(
            "SELECT s.* FROM nbsp_docs d, LATERAL shingles(d.text, 3) s"
        ).collect()
    )
    via_sql = sorted(
        (i, s)
        for row in df.select(
            F.expr(_shingles_sql("text", 3)).alias("sh")
        ).collect()
        for i, s in enumerate(row["sh"])
    )
    assert [s for _, s in via_udtf] == [s for _, s in via_sql]
    assert "a b" in [s for _, s in via_udtf]  # NBSP survives
