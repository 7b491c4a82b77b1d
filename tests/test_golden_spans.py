"""THE correctness gate (``BASELINE.json:15``): per-document
span-sequence equality (kind, text, media_ref, order) between the
engine run under Spark and the committed oracle-generated golden
fixtures, plus extracted-fields equality."""

from __future__ import annotations

from tests.conftest import FIXDIR


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_span_sequence_equality(spark):
    from accountant_pdf_extract_spark.plans.pipeline import extract, spans_view

    docs = spark.read.parquet(str(FIXDIR / "fixture_docs.parquet"))
    got = spans_view(extract(docs, salt_buckets=16, num_partitions=8))
    golden = spark.read.parquet(str(FIXDIR / "golden_spans.parquet"))

    cols = ["doc_id", "order", "kind", "text", "media_ref"]
    assert _rows(got, cols) == _rows(golden, cols)


def test_extracted_fields(spark):
    from accountant_pdf_extract_spark.plans.pipeline import doc_view, extract

    docs = spark.read.parquet(str(FIXDIR / "fixture_docs.parquet"))
    got = doc_view(extract(docs, salt_buckets=16, num_partitions=8)).select(
        "doc_id", "invoice_id", "invoice_date", "due_date", "currency",
        "total", "amounts", "account_codes",
    )
    golden = spark.read.parquet(str(FIXDIR / "golden_fields.parquet"))

    def key(df):
        out = {}
        for r in df.collect():
            out[r["doc_id"]] = (
                r["invoice_id"], r["invoice_date"], r["due_date"],
                r["currency"], r["total"], tuple(r["amounts"] or []),
                tuple(r["account_codes"] or []),
            )
        return out

    got_k, gold_k = key(got), key(golden)
    # docs with zero output spans produce no doc_view row; golden keeps
    # them with all-null fields
    for doc_id, vals in gold_k.items():
        if doc_id in got_k:
            assert got_k[doc_id] == vals, doc_id
        else:
            assert vals == (None, None, None, None, None, (), ()), doc_id


def test_partition_invariance(spark):
    """Identical results at any salt bucket count / partitioning —
    the property that makes rows-only driver checks and cluster-size
    changes safe."""
    from accountant_pdf_extract_spark.plans.pipeline import extract, spans_view

    docs = spark.read.parquet(str(FIXDIR / "fixture_docs.parquet"))
    cols = ["doc_id", "order", "kind", "text", "media_ref"]
    a = _rows(spans_view(extract(docs, salt_buckets=2, num_partitions=2)), cols)
    b = _rows(spans_view(extract(docs, salt_buckets=512, num_partitions=64)), cols)
    assert a == b and len(a) > 0


def test_doc_view_spans_schema_pinned(spark):
    """doc_view's nested span element must match SPAN_OUT_STRUCT."""
    from accountant_pdf_extract_spark.plans.pipeline import doc_view, extract
    from accountant_pdf_extract_spark.schema import SPAN_OUT_STRUCT
    from pyspark.sql.types import ArrayType

    docs = spark.read.parquet(str(FIXDIR / "fixture_docs.parquet"))
    dv = doc_view(extract(docs, salt_buckets=8, num_partitions=4))
    spans_type = dict(zip(dv.schema.names, [f.dataType for f in dv.schema.fields]))["spans"]
    assert isinstance(spans_type, ArrayType)
    got = [(f.name, f.dataType.simpleString()) for f in spans_type.elementType.fields]
    want = [(f.name, f.dataType.simpleString()) for f in SPAN_OUT_STRUCT.fields]
    assert got == want
    # and order inside the array is ascending by `order`
    row = dv.where(dv.doc_id == "fix-0000").first()
    orders = [s["order"] for s in row["spans"]]
    assert orders == sorted(orders) and orders[0] == 0
