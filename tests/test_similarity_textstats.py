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


def test_lsh_recall_quantified(spark):
    """Pins measured recall@5 of the multi-table hyperplane LSH against
    the exact brute-force top-k at a fixed seed/config: 16 tables x 4
    planes recovers >= 0.9 of the true neighbors on the sf0.001
    embeddings (measured 0.90 exactly; fully deterministic — seeded
    planes, fixed data).  The OR-construction knob is visible too:
    8 tables at the same seed lands materially lower (0.69 measured)."""
    emb = _emb(spark)
    truth = similarity.brute_force_topk_df(emb, query_max_id=20, k=5)
    t = {}
    for r in truth.collect():
        t.setdefault(r["qid"], set()).add(r["cid"])
    total = sum(len(v) for v in t.values())

    def recall(n_tables):
        approx = similarity.lsh_bucketed_topk(
            emb, query_max_id=20, k=5, n_planes=4, n_tables=n_tables, seed=42
        )
        a = {}
        for r in approx.collect():
            a.setdefault(r["qid"], set()).add(r["cid"])
        return sum(len(t[q] & a.get(q, set())) for q in t) / total

    r16 = recall(16)
    assert r16 >= 0.9, f"recall@5 {r16}"
    assert recall(8) >= 0.4  # coarser config still usable, and cheaper


def test_near_dup_lsh_subset_and_recall(spark):
    """The LSH-gated near-dup path must emit a strict SUBSET of the
    brute-force pairs (exact rescore => no false positives), with
    recall >= 0.95 at the recall-oriented default config; the
    selectivity-oriented config (8x8) must actually prune candidates
    to < 5% of all pairs while staying a subset.  All deterministic
    (seeded planes, fixed data)."""
    emb = _emb(spark)
    exact = {
        (r["a"], r["b"])
        for r in similarity.cosine_near_dup_pairs(
            emb, max_id=10**9, threshold_milli=250
        ).collect()
    }
    got = {
        (r["a"], r["b"])
        for r in similarity.cosine_near_dup_pairs_lsh(
            emb, threshold_milli=250
        ).collect()
    }
    assert got <= exact
    assert len(got & exact) / len(exact) >= 0.95  # measured 0.977

    # selectivity-oriented config: strong candidate pruning
    sigs = similarity.hyperplane_signature(
        emb, None, n_tables=8, seed=42, n_bits=64
    )
    sa = sigs.select(F.col("vid").alias("a"), "table", "bucket")
    sb = sigs.select(F.col("vid").alias("b"), "table", "bucket")
    n_cand = (
        sa.join(sb, ["table", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .count()
    )
    n = emb.count()
    assert n_cand < 0.05 * n * (n - 1) / 2  # measured 0.035
    tight = {
        (r["a"], r["b"])
        for r in similarity.cosine_near_dup_pairs_lsh(
            emb, threshold_milli=250, n_planes=8, n_tables=8
        ).collect()
    }
    assert tight <= exact


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


def test_rolling_fingerprint_order_sensitive(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, "gamma beta alpha"),   # same tokens, different order
        (3, "alpha  beta   gamma"),  # whitespace-insensitive duplicate of 1
        (4, ""),
        (5, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["rfp"]
        for r in df.select(
            "doc_id",
            textstats.rolling_fingerprint(F.col("text")).alias("rfp"),
        ).collect()
    }
    assert got[1] == got[3] != got[2]      # order matters, whitespace not
    assert got[4] == got[5] == 0           # blank -> 0
    assert all(0 <= v < 2**31 for v in got.values())
    # deterministic across evaluations
    again = {
        r["doc_id"]: r["rfp"]
        for r in df.select(
            "doc_id",
            textstats.rolling_fingerprint(F.col("text")).alias("rfp"),
        ).collect()
    }
    assert again == got


def test_hash_split_deterministic_and_partition_invariant(spark):
    from accountant_pdf_extract_spark.operators.sampling import hash_split

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(17), "doc_id").collect()
    }
    assert a == b and len(a) == 500
    frac = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.7 < frac < 0.9  # 'cc' targets ~0.797


def test_stratified_sample_exact_k_and_stable(spark):
    from accountant_pdf_extract_spark.operators.sampling import stratified_sample

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select("label", "vec_id")
    s1 = sorted(map(tuple, stratified_sample(emb, "label", "vec_id", 7).collect()))
    s2 = sorted(
        map(tuple, stratified_sample(emb.repartition(13), "label", "vec_id", 7).collect())
    )
    assert s1 == s2
    from collections import Counter

    per = Counter(l for l, _ in s1)
    assert all(v == 7 for v in per.values())


def test_pack_token_shards_invariants(spark):
    """First-fit packing: every shard's total is < budget + its largest
    doc (the classic one-doc slack bound), assignments are
    partition-invariant, and every doc lands in exactly one shard."""
    from accountant_pdf_extract_spark.operators.packing import pack_token_shards

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    budget = 2000
    packed = pack_token_shards(docs, "doc_id", "n_chars", budget)
    rows = packed.collect()
    assert len(rows) == 500 and len({r["doc_id"] for r in rows}) == 500

    from collections import defaultdict

    totals = defaultdict(int)
    biggest = defaultdict(int)
    for r in rows:
        totals[r["shard_key"]] += r["n_chars"]
        biggest[r["shard_key"]] = max(biggest[r["shard_key"]], r["n_chars"])
    assert len(totals) > 16  # budget actually splits groups into shards
    for k, tot in totals.items():
        assert tot < budget + biggest[k], (k, tot)

    again = {
        r["doc_id"]: r["shard_key"]
        for r in pack_token_shards(
            docs.repartition(13), "doc_id", "n_chars", budget
        ).collect()
    }
    assert again == {r["doc_id"]: r["shard_key"] for r in rows}


def test_ivf_recall_quantified(spark):
    """IVF coarse quantization (pyspark.ml KMeans codebook) must
    recover >= 0.85 of the exact top-5 at 8 cells / 4 probes on the
    sf0.001 embeddings (measured 0.93; floor leaves margin for KMeans
    float-reduction jitter).  Probing half the cells ~ halves the
    scanned corpus while keeping most of the answer."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    truth = {}
    for r in similarity.brute_force_topk_df(emb, query_max_id=20, k=5).collect():
        truth.setdefault(r["qid"], set()).add(r["cid"])
    total = sum(len(v) for v in truth.values())
    got = {}
    ivf = similarity.ivf_topk(
        emb, query_max_id=20, k=5, n_cells=8, n_probe=4, seed=42
    )
    for r in ivf.collect():
        got.setdefault(r["qid"], set()).add(r["cid"])
    rec = sum(len(truth[q] & got.get(q, set())) for q in truth) / total
    assert rec >= 0.85, rec
    assert all(len(v) == 5 for v in got.values())


def test_bm25_matches_python_oracle(spark):
    """BM25 ranking must match a from-scratch Python implementation on
    the same corpus (scores within 1 milli of quantization jitter,
    identical top-k membership and order)."""
    import math
    from collections import Counter

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    terms = ["join", "scan", "filter"]
    got = [
        (r["doc"], r["score_milli"], r["rank"])
        for r in textstats.bm25_rank(docs, terms, k=10).collect()
    ]
    assert len(got) == 10

    rows = docs.collect()
    toks = {
        r["doc_id"]: [t for t in (r["text"] or "").lower().strip().split() if t]
        for r in rows
    }
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfc = Counter()
    for v in toks.values():
        for t in set(v):
            dfc[t] += 1
    k1, b = 1.2, 0.75
    scores = {}
    for doc, v in toks.items():
        tfc = Counter(v)
        # per-TERM integer-milli quantization before the sum — the
        # engine's deterministic definition (summing doubles across
        # shuffle partitions is merge-order dependent)
        s_milli = 0
        for t in terms:
            if tfc[t] == 0:
                continue
            idf = math.log((n - dfc[t] + 0.5) / (dfc[t] + 0.5) + 1.0)
            term = idf * (tfc[t] * (k1 + 1)) / (
                tfc[t] + k1 * (1 - b + b * len(v) / avgdl)
            )
            s_milli += round(term * 1000)
        if s_milli > 0:
            scores[doc] = s_milli
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    for (gd, gs, _rk), (wd, ws) in zip(got, want):
        assert gd == wd, (got, want)
        assert abs(gs - ws) <= 1, (gd, gs, ws)


def test_chunk_text_windows(spark):
    from accountant_pdf_extract_spark.operators.chunking import chunk_text

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "only two"),
         (3, "   "), (4, "x " * 24),  # 24 tokens = exactly one step
         (5, "y " * 25)],  # 25: token 25 is covered by the start-18
                           # window; no fully-redundant tail chunk
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_text(docs, chunk_tokens=8, overlap=2).collect()
    }
    # doc 1: 10 tokens, step 6 -> chunks at 0 and 6 (4-token tail kept)
    assert got[(1, 0)] == (" ".join(f"t{i}" for i in range(8)), 8)
    assert got[(1, 1)] == ("t6 t7 t8 t9", 4)
    assert got[(2, 0)] == ("only two", 2)
    assert (3, 0) not in got  # blank doc yields nothing
    # doc 4: 24 tokens, step 6 -> starts 0,6,12,18
    assert sorted(c for d, c in got if d == 4) == [0, 1, 2, 3]
    # doc 5: 25 tokens — a start-24 window would add ZERO new tokens
    # (tokens 25.. are inside the start-18 window); it must not exist
    assert sorted(c for d, c in got if d == 5) == [0, 1, 2, 3]
    assert got[(5, 3)][1] == 7  # tokens 19..25

    import pytest

    with pytest.raises(ValueError, match="overlap"):
        chunk_text(docs, chunk_tokens=8, overlap=8)


def test_quantize_embeddings_zero_vector_and_range(spark):
    from accountant_pdf_extract_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: (r["q8"], r["max_abs_milli"])
           for r in quantize_embeddings(df).collect()}
    assert got[1] == ([64, -127, 32], 1000)   # round(0.5*127)=64
    assert got[2] == ([0, 0, 0], 0)
    real = quantize_embeddings(
        spark.read.parquet(f"{SF}/embeddings.parquet")
    ).collect()
    assert all(max(map(abs, r["q8"])) <= 127 for r in real)
    assert all(
        127 in r["q8"] or -127 in r["q8"]
        for r in real if r["max_abs_milli"] > 0
    )


def test_gemm_topk_tie_determinism_across_partitioning(spark):
    """Duplicate embeddings tie at the k-th score: the GEMM path must
    return the same (lowest-cid) neighbor set regardless of how the
    corpus is partitioned/batched — per-batch pruning cuts ties by the
    same (score desc, cid asc) order as the global reduction."""
    import numpy as np

    from accountant_pdf_extract_spark.operators import similarity

    # 40 corpus vectors, only 3 DISTINCT embeddings -> massive ties
    base = np.random.default_rng(5).standard_normal((3, 8)).astype("float32")
    rows = [(int(i), [float(x) for x in base[i % 3]]) for i in range(40)]
    q = base[0:1]
    qids = np.array([999], dtype=np.int64)
    outs = []
    for parts in (1, 7):
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).repartition(parts)
        got = sorted(
            r["cid"]
            for r in similarity.brute_force_topk_pandas(
                df, q, qids, k=5
            ).collect()
        )
        outs.append(got)
    assert outs[0] == outs[1]
    # the winners are exactly the 5 lowest ids among exact-duplicates
    # of the query embedding (cids 0,3,6,... are residue-0)
    assert outs[0] == [0, 3, 6, 9, 12]


def test_split_tag_rejects_non_hex_threshold(spark):
    import pytest

    from accountant_pdf_extract_spark.operators import sampling

    for bad in ("xz", "", "c-"):
        with pytest.raises(ValueError, match="lowercase hex"):
            sampling.split_tag(F.col("doc_id"), bad)

    # uppercase normalizes instead of silently skewing the split
    # (raw 'CC' compared against lowercase md5 hex gave ~62/38)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    upper = docs.select(sampling.split_tag(F.col("doc_id"), "CC").alias("s"))
    lower = docs.select(sampling.split_tag(F.col("doc_id"), "cc").alias("s"))
    assert upper.collect() == lower.collect()


def test_hyperplane_signature_rejects_indivisible_bits(spark):
    import pytest

    from accountant_pdf_extract_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError, match="divide evenly"):
        similarity.hyperplane_signature(emb, seed=1, n_bits=10, n_tables=4)


def test_grouped_stats_half_cent_rounds_away_from_zero(spark):
    """value=0.125 -> exactly 12.5 cents -> must round to 13 like the
    DuckDB oracle's round(), not pandas' banker's 12."""
    from accountant_pdf_extract_spark.operators import sessions

    ev = spark.createDataFrame(
        [(1, 0.125), (1, 0.125), (1, 0.125)], "user_id long, value double"
    )
    r = sessions.grouped_stats(ev).collect()[0]
    assert r["median_cents"] == 13.0


def test_repetition_fold_matches_python_reference(spark):
    """The zero-shuffle run-length fold must equal a Counter-based
    reference on handcrafted repetition shapes (all-same, all-distinct,
    runs at both ends, singleton, empty)."""
    from collections import Counter

    from accountant_pdf_extract_spark.operators import textstats

    texts = [
        "a a a a",                # one token repeated: top=dup=1000
        "a b c d e",              # all distinct
        "a a b c c",              # dup runs at both ends of sorted order
        "x",                      # singleton: no bigrams
        "",                       # empty: everything 0
        "spam spam eggs spam bacon spam",
        "go go go stop go go",    # repeated bigram 'go go'
    ]
    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in textstats.repetition_features(df).collect()
    }

    def ref(text):
        toks = [t for t in text.lower().strip().split() if t]
        bigs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]

        def stats(items):
            c = Counter(items)
            best = max(c.values()) if c else 0
            dup = sum(v for v in c.values() if v >= 2)
            return best, dup

        def milli(num, den):
            return num * 1000 // den if den > 0 else 0

        tb, td = stats(toks)
        bb, bd = stats(bigs)
        n, nb = len(toks), len(bigs)
        return {
            "n_tokens": n,
            "top_token_milli": milli(tb, n),
            "dup_token_milli": milli(td, n),
            "top_bigram_milli": milli(bb, nb),
            "dup_bigram_milli": milli(bd, nb),
        }

    for i, text in enumerate(texts):
        want = ref(text)
        have = {k: got[f"d{i}"][k] for k in want}
        assert have == want, (text, have, want)


def test_oov_rate_vocab_cut_is_deterministic(spark):
    """Vocabulary = top-V by (count desc, token asc); tokens tied at
    the cut resolve alphabetically, and OOV counts follow exactly."""
    from accountant_pdf_extract_spark.operators import textstats

    # counts: a=3, b=2, c=2, d=1 -> vocab_size=2 keeps {a, b} (b beats
    # c on the alphabetical tiebreak at equal count)
    df = spark.createDataFrame(
        [("d1", "a a a b"), ("d2", "b c c d")], "doc_id string, text string"
    )
    got = {r["doc_id"]: r["oov_milli"] for r in
           textstats.oov_rate(df, vocab_size=2).collect()}
    assert got == {"d1": 0, "d2": 750}  # d2: c,c,d OOV -> 3/4


def test_null_text_tokenizes_like_empty(spark):
    """documents.text is nullable: NULL must flow through the shared
    token identity as zero tokens (n_tokens=0, all milli 0, rolling
    fingerprint 0) — matching the oracle twins' 0-rows-then-coalesce,
    never a NULL that hash-diverges from the oracle's 0."""
    from accountant_pdf_extract_spark.operators import textstats

    df = spark.createDataFrame(
        [("d0", None), ("d1", "a a")], "doc_id string, text string"
    )
    rep = {r["doc_id"]: r.asDict() for r in
           textstats.repetition_features(df).collect()}
    assert rep["d0"] == {"doc_id": "d0", "n_tokens": 0, "top_token_milli": 0,
                         "dup_token_milli": 0, "top_bigram_milli": 0,
                         "dup_bigram_milli": 0}
    oov = {r["doc_id"]: (r["n_tokens"], r["oov_milli"]) for r in
           textstats.oov_rate(df, vocab_size=1).collect()}
    assert oov["d0"] == (0, 0)
    fp = df.select(
        "doc_id", textstats.rolling_fingerprint(F.col("text")).alias("fp")
    ).collect()
    assert {r["doc_id"]: r["fp"] for r in fp}["d0"] == 0


def test_jsonl_shard_assignment_is_partitioning_invariant(spark, tmp_path):
    """Content-addressed sharding: the same row lands in the same
    shard no matter how the input was partitioned, and read-back with
    an explicit schema returns the exact original rows."""
    from accountant_pdf_extract_spark.sources.jsonl import (
        SHARD_COL,
        read_jsonl,
        write_jsonl_shards,
    )

    rows = [(i, f"tok{i} " * (i % 5), i % 3) for i in range(40)]
    schema = "doc_id long, text string, grp long"
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_jsonl_shards(spark.createDataFrame(rows, schema).repartition(1), a, 4)
    write_jsonl_shards(spark.createDataFrame(rows, schema).repartition(13), b, 4)

    def shard_map(path):
        df = spark.read.schema(schema).json(path)
        return {
            r["doc_id"]: r[SHARD_COL]
            for r in df.withColumn(SHARD_COL, F.input_file_name()).select(
                "doc_id", F.regexp_extract(F.input_file_name(), r"_shard=(\d+)", 1).alias(SHARD_COL)
            ).collect()
        }

    assert shard_map(a) == shard_map(b)

    got = sorted(
        (r["doc_id"], r["text"], r["grp"])
        for r in read_jsonl(
            spark, a, spark.createDataFrame(rows, schema).schema
        ).collect()
    )
    assert got == sorted(rows)

    import pytest

    with pytest.raises(ValueError, match="n_shards"):
        write_jsonl_shards(spark.createDataFrame(rows, schema), a, 0)


def test_repetition_fold_fuzz_300_random_docs(spark):
    """One Spark pass over 300 seeded random token sequences (skewed
    multiplicities, runs, singletons, empties) must equal the Counter
    reference on every doc — fuzz for the run-length fold's state
    machine beyond the handcrafted shapes."""
    import random
    from collections import Counter

    from accountant_pdf_extract_spark.operators import textstats

    rnd = random.Random(20260816)
    docs = []
    for i in range(300):
        n = rnd.choice([0, 1, 2, 3, 5, 8, 20, 60])
        vocab_n = rnd.choice([1, 2, 3, 8, 30])
        toks = [f"w{rnd.randrange(vocab_n)}" for _ in range(n)]
        docs.append((f"d{i:03d}", " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["doc_id"]: r.asDict() for r in
           textstats.repetition_features(df).collect()}

    def stats(items):
        c = Counter(items)
        best = max(c.values()) if c else 0
        return best, sum(v for v in c.values() if v >= 2)

    def milli(num, den):
        return num * 1000 // den if den > 0 else 0

    for doc_id, text in docs:
        toks = text.split()
        bigs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        tb, td = stats(toks)
        bb, bd = stats(bigs)
        n, nb = len(toks), len(bigs)
        want = {
            "doc_id": doc_id, "n_tokens": n,
            "top_token_milli": milli(tb, n),
            "dup_token_milli": milli(td, n),
            "top_bigram_milli": milli(bb, nb),
            "dup_bigram_milli": milli(bd, nb),
        }
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_token_identity_consistent_and_simhash_blank_drop(spark):
    """token_count uses the shared blank-filtered identity ('foo bar\\n'
    counts 2, not 3 — raw split added a phantom '' token), and simhash
    drops whitespace-only docs like its oracle (no meaningless
    0-fingerprint group of blank docs)."""
    from accountant_pdf_extract_spark.operators import dedup, textstats

    df = spark.createDataFrame(
        [("d0", "foo bar\n"), ("d1", "\n"), ("d2", None), ("d3", "x y")],
        "doc_id string, text string",
    )
    counts = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", textstats.token_count(F.col("text")).alias("n")).collect()}
    assert counts == {"d0": 2, "d1": 0, "d2": 0, "d3": 2}

    sids = sorted(r["sid"] for r in dedup.simhash16(df).collect())
    assert sids == ["d0", "d3"]  # whitespace-only and NULL dropped

    langs = {r["doc_id"]: r["lang"] for r in df.select(
        "doc_id", textstats.lang_id(F.col("text")).alias("lang")).collect()}
    assert langs["d2"] == "unk"  # NULL text -> unk (oracle coalesces to 0s)


def test_pandas_paths_drop_null_and_ragged_embeddings(spark):
    """NULL / wrong-length embedding rows must be DROPPED by the
    mapInPandas paths (matching the Catalyst twins' explode-NULL
    semantics), not crash np.stack in the executor (r4 review)."""
    import numpy as np

    from accountant_pdf_extract_spark.operators import similarity

    nan, inf = float("nan"), float("inf")
    rows = [(0, [1.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0]), (2, None),
            (3, [0.5, 0.5]), (4, [0.0, 1.0, 0.0]),
            # non-finite values and NULL elements must drop too — one
            # NaN score makes the per-query argpartition threshold NaN,
            # emptying every candidate set in the batch (ragged
            # np.stack ValueError in the executor)
            (5, [nan, 0.0, 0.0]), (6, [0.2, inf, 0.0]),
            (7, [0.3, None, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = np.array([[1.0, 0.0, 0.0]])
    got = similarity.brute_force_topk_pandas(
        df, q, np.array([0]), k=2
    ).collect()
    cids = {r["cid"] for r in got}
    assert cids <= {1, 4} and 1 in cids  # null/ragged/non-finite dropped

    # one partition so the derived-plane dim comes from the full
    # row set's majority (3-dim); null and the ragged 2-dim row drop
    sigs = similarity.hyperplane_signature(
        df.coalesce(1), n_tables=2, seed=7, n_bits=8
    ).collect()
    assert {r["vid"] for r in sigs} == {0, 1, 4}

    ivf = similarity.ivf_topk(df, query_max_id=1, k=2, n_cells=2)
    assert ivf.count() >= 1  # fit survives the NULL row


def test_blank_docs_score_zero_quality(spark):
    """NULL / whitespace-only docs must score 0.0, not collect the
    low-punctuation reward (r4 review)."""
    from accountant_pdf_extract_spark.operators import textstats

    df = spark.createDataFrame(
        [("a", None), ("b", "  \n "), ("c", "the quick brown fox is here and")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in textstats.quality_features(df).collect()}
    assert got["a"]["quality_score"] == 0.0
    assert got["b"]["quality_score"] == 0.0
    assert got["c"]["quality_score"] > 0.0
    # padded text: avg token length counts token chars only
    df2 = spark.createDataFrame([("d", "  hi  ")], "doc_id string, text string")
    r = textstats.quality_features(df2).collect()[0]
    assert r["avg_token_len"] == 2.0
