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
