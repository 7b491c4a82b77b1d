"""Similarity scale paths (mapInPandas GEMM, hyperplane LSH) and
textstats units — the operators the DuckDB oracle can't check."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from accountant_pdf_extract_spark.operators import similarity, textstats

SF = "/root/testdata/sf0.01"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_pandas_gemm_matches_df_topk(spark):
    """The mapInPandas GEMM path (metric=dot) must agree with the
    exact Catalyst path on float-quantization-insensitive queries."""
    emb = _emb(spark)
    df_exact = similarity.brute_force_topk_df(emb, query_max_id=5, k=5)
    q = emb.where(F.col("vec_id") < 5).orderBy("vec_id").collect()
    queries = np.stack([np.array(r["embedding"], dtype=np.float32) for r in q])
    qids = np.array([r["vec_id"] for r in q], dtype=np.int64)
    df_gemm = similarity.brute_force_topk_pandas(
        emb, queries, qids, k=5, metric="dot"
    )
    exact = {(r["qid"], r["rank"]): r["cid"] for r in df_exact.collect()}
    gemm = {(r["qid"], r["rank"]): r["cid"] for r in df_gemm.collect()}
    # quantized-integer vs float32 scoring: allow rank swaps, compare sets
    exact_sets = {}
    gemm_sets = {}
    for (qid, _rk), cid in exact.items():
        exact_sets.setdefault(qid, set()).add(cid)
    for (qid, _rk), cid in gemm.items():
        gemm_sets.setdefault(qid, set()).add(cid)
    for qid in exact_sets:
        inter = exact_sets[qid] & gemm_sets.get(qid, set())
        assert len(inter) >= 4, (qid, exact_sets[qid], gemm_sets.get(qid))


def test_lsh_recall_sanity(spark):
    """LSH-bucketed ANN trades recall for candidate pruning — it must
    still recover a solid fraction of the true cosine top-k."""
    emb = _emb(spark)
    truth = similarity.brute_force_topk_df(emb, query_max_id=10, k=5)
    approx = similarity.lsh_bucketed_topk(
        emb, query_max_id=10, k=5, n_planes=4, n_tables=8, seed=7
    )
    t = {}
    for r in truth.collect():
        t.setdefault(r["qid"], set()).add(r["cid"])
    a = {}
    for r in approx.collect():
        a.setdefault(r["qid"], set()).add(r["cid"])
    hits = sum(len(t[q] & a.get(q, set())) for q in t)
    total = sum(len(v) for v in t.values())
    assert hits / total > 0.4, f"recall {hits}/{total}"


def test_lsh_candidates_prune(spark):
    """Bucketing must actually prune: fewer scored pairs than the full
    cross product."""
    emb = _emb(spark)
    sigs = similarity.hyperplane_signature(
        emb, np.random.default_rng(3).standard_normal((6, 64)), n_tables=1
    )
    sizes = sigs.groupBy("bucket").count().collect()
    n = sum(r["count"] for r in sizes)
    pairs_in_buckets = sum(r["count"] ** 2 for r in sizes)
    assert n == 500
    assert pairs_in_buckets < 0.2 * n * n


def test_lang_id_units(spark):
    rows = [
        ("the cat and the dog of a house is in", "en"),
        ("der hund und die katze ist nicht ein", "de"),
        ("le chat et la maison est une des", "fr"),
        ("xyzzy qwerty plugh", "unk"),
    ]
    df = spark.createDataFrame(rows, "text string, expect string")
    got = df.select("expect", textstats.lang_id(F.col("text")).alias("g")).collect()
    for r in got:
        assert r["g"] == r["expect"], r


def test_quality_features(spark):
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog today",),
         ("!!! ??? ### $$$ %%%",)],
        "text string",
    )
    rows = textstats.quality_features(df).collect()
    good, bad = rows[0], rows[1]
    assert good["quality_score"] > bad["quality_score"]
    assert bad["punct_ratio"] > 0.5
    assert good["stopword_ratio"] > 0.1


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("ab12 cd, ef!",)], "text string")
    n = df.select(
        textstats.bpe_ish_token_count(F.col("text")).alias("n")
    ).first()["n"]
    # ab / 12 / cd / , / ef / !
    assert n == 6
