"""Corpus-curation operators: per-key quota, deterministic sampling,
bloom filter, incremental dedup — differential-tested against pandas."""

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pycorrector_spark.operators.curation import (
    BloomFilter,
    build_bloom,
    hash_sample,
    incremental_dedup,
    top_n_per_key,
)


def _md5_60(text: str) -> int:
    return int(hashlib.md5(text.encode("utf-8")).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def skewed_df(spark):
    # one hot key (60 rows), two small keys, deterministic scores with ties
    rows = [(i, "hot", (i * 7) % 13) for i in range(60)]
    rows += [(100 + i, "warm", i) for i in range(8)]
    rows += [(200, "cold", 5)]
    return spark.createDataFrame(rows, "doc_id long, host string, score long")


def test_top_n_per_key_matches_pandas(spark, skewed_df):
    n = 5
    got = top_n_per_key(
        skewed_df, "host", n,
        [F.col("score").desc(), F.col("doc_id").asc()],
        unique_col="doc_id", salt_buckets=4,
    ).toPandas()

    pdf = skewed_df.toPandas().sort_values(
        ["host", "score", "doc_id"], ascending=[True, False, True]
    )
    pdf["key_rank"] = pdf.groupby("host").cumcount() + 1
    want = pdf[pdf["key_rank"] <= n]

    got_s = got.sort_values(["host", "key_rank"]).reset_index(drop=True)
    want_s = want.sort_values(["host", "key_rank"]).reset_index(drop=True)
    assert list(got_s["doc_id"]) == list(want_s["doc_id"])
    assert list(got_s["key_rank"]) == list(want_s["key_rank"])
    # small keys pass through whole; hot key is capped
    assert (got["host"] == "cold").sum() == 1
    assert (got["host"] == "hot").sum() == n


def test_top_n_per_key_salt_invariance(spark, skewed_df):
    """Result is independent of the salt bucket count (1 disables phase-1
    pruning entirely)."""
    args = ("host", 3, [F.col("score").desc(), F.col("doc_id").asc()])
    a = top_n_per_key(skewed_df, *args, unique_col="doc_id", salt_buckets=1)
    b = top_n_per_key(skewed_df, *args, unique_col="doc_id", salt_buckets=16)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_hash_sample_deterministic_and_unbiased(spark):
    df = spark.createDataFrame(
        [(i, f"document number {i} body") for i in range(2000)],
        "doc_id long, text string",
    )
    s1 = hash_sample(df, F.col("text"), 0.2).select("doc_id").toPandas()
    s2 = hash_sample(df, F.col("text"), 0.2).select("doc_id").toPandas()
    assert sorted(s1["doc_id"]) == sorted(s2["doc_id"])
    # md5 buckets are uniform: 2000 draws at 20% -> ~400, binomial 4-sigma
    assert 320 <= len(s1) <= 480
    assert hash_sample(df, F.col("text"), 0.0).count() == 0
    assert hash_sample(df, F.col("text"), 1.0).count() == 2000
    # sampling follows content, not row identity: same text -> same draw
    dup = spark.createDataFrame([(9999, "document number 7 body")],
                                "doc_id long, text string")
    in_dup = hash_sample(dup, F.col("text"), 0.2).count() == 1
    assert in_dup == (7 in set(s1["doc_id"]))


def test_bloom_no_false_negatives_and_fp_rate():
    rng = np.random.default_rng(7)
    seen = rng.integers(0, 1 << 60, size=5000, dtype=np.int64)
    m, k = BloomFilter.sized_for(len(seen), fp_rate=0.01)
    bf = BloomFilter(m, k)
    bf.add_many(seen)
    assert bf.might_contain(seen).all()
    fresh = rng.integers(0, 1 << 60, size=20000, dtype=np.int64)
    fresh = fresh[~np.isin(fresh, seen)]
    fp = bf.might_contain(fresh).mean()
    assert fp < 0.05  # target 1%, generous bound for hash-family variance


def test_build_bloom_matches_local(spark):
    texts = [f"snapshot doc {i}" for i in range(300)]
    df = spark.createDataFrame([(t,) for t in texts], "text string").repartition(4)
    m, k = BloomFilter.sized_for(len(texts), 0.01)
    got = build_bloom(df, "text", m, k)

    want = BloomFilter(m, k)
    want.add_many(np.array([_md5_60(t) for t in texts], dtype=np.int64))
    assert np.array_equal(got.bits, want.bits)


def test_incremental_dedup_bloom_equals_exact(spark):
    seen = spark.createDataFrame(
        [(i, f"old doc {i}") for i in range(50)], "doc_id long, text string"
    )
    new_rows = [(100 + i, f"old doc {i}") for i in range(10)]       # dups
    new_rows += [(200 + i, f"fresh doc {i}") for i in range(40)]    # new
    new_rows += [(300, None)]                                       # NULL text
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    with_bloom = incremental_dedup(new, seen, use_bloom=True)
    exact = incremental_dedup(new, seen, use_bloom=False)
    got_b = sorted(r["doc_id"] for r in with_bloom.collect())
    got_e = sorted(r["doc_id"] for r in exact.collect())
    assert got_b == got_e == sorted([200 + i for i in range(40)] + [300])
    # NULL text survives with a NULL hash
    null_row = [r for r in with_bloom.collect() if r["doc_id"] == 300]
    assert null_row and null_row[0]["text_md5"] is None


def test_select_token_budget_is_global_prefix(spark):
    """Bucketed-offset plan equals the naive global-sort prefix, with the
    boundary falling mid-bucket (tied scores split by doc_id)."""
    from pycorrector_spark.operators.curation import select_token_budget

    rng = np.random.default_rng(3)
    rows = [(int(i), int(s), int(s)) for i, s in
            enumerate(rng.integers(1, 30, size=400))]
    rows.append((400, None, 5))  # NULL score is dropped
    df = spark.createDataFrame(rows, "doc_id long, score long, toks long")
    budget = 2500

    got = select_token_budget(df, budget, "score", "toks", "doc_id").toPandas()

    pdf = pd.DataFrame(rows[:-1], columns=["doc_id", "score", "toks"]).sort_values(
        ["score", "doc_id"], ascending=[False, True]
    )
    pdf["cum"] = pdf["toks"].cumsum()
    want = pdf[pdf["cum"] <= budget]

    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    got_map = dict(zip(got["doc_id"], got["cum_tokens"]))
    for _, r in want.iterrows():
        assert got_map[r["doc_id"]] == r["cum"]
    # the boundary score bucket must be partially kept for the test to bite
    boundary = want.iloc[-1]["score"]
    full_bucket = (pdf["score"] == boundary).sum()
    assert (want["score"] == boundary).sum() < full_bucket


def test_select_token_budget_hot_score_splits_across_partitions(spark):
    """Round-4 verdict: one score holding 80% of rows must NOT collapse
    into one cumsum task. The range partitioner splits the hot score on
    the doc_id tie-break, so partition sizes stay ~n/P; correctness vs
    the pandas global-sort oracle holds through the split."""
    from pycorrector_spark.operators.curation import select_token_budget
    from pycorrector_spark.operators.dedup import release_cached

    n = 4000
    rows = [(int(i), 7 if i % 5 else 3 + (i % 3), 2) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, score long, toks long")
    budget = 2 * n // 2 + 1  # boundary lands inside the hot score

    got = select_token_budget(df, budget, "score", "toks", "doc_id")
    gp = got.toPandas()
    pdf = pd.DataFrame(rows, columns=["doc_id", "score", "toks"]).sort_values(
        ["score", "doc_id"], ascending=[False, True]
    )
    pdf["cum"] = pdf["toks"].cumsum()
    want = pdf[pdf["cum"] <= budget]
    assert sorted(gp["doc_id"]) == sorted(want["doc_id"])
    assert dict(zip(gp["doc_id"], gp["cum_tokens"])) == dict(
        zip(want["doc_id"], want["cum"])
    )
    release_cached(got)

    # balance evidence: replicate the operator's range partitioning and
    # measure the largest partition — the hot score (80% of rows) must
    # spread, max partition ~ n/P, nowhere near 0.8n
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    sizes = (
        df.repartitionByRange(n_parts, F.col("score").desc(), F.col("doc_id").asc())
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    max_part = max(r["count"] for r in sizes)
    assert max_part < 0.2 * n, f"hot score collapsed into one task: {max_part}/{n}"


def test_select_token_budget_degenerate(spark):
    from pycorrector_spark.operators.curation import select_token_budget

    df = spark.createDataFrame([(1, 5, 100)], "doc_id long, score long, toks long")
    assert select_token_budget(df, 10, "score", "toks", "doc_id").count() == 0
    assert select_token_budget(df, 100, "score", "toks", "doc_id").count() == 1


# ---------------------------------------------------------------------------
# CCNet perplexity buckets
# ---------------------------------------------------------------------------


def test_ppl_bin_edges():
    import numpy as np

    from pycorrector_spark.operators.curation import (
        PPL_BIN_OVERFLOW,
        ppl_bin,
    )

    bins = ppl_bin(np.array([0.0, 1.0, 100.0, np.inf, np.nan, -5.0]))
    assert bins[0] == 0
    assert bins[1] == int(np.floor(np.log1p(1.0) * 1000))
    assert bins[3] == PPL_BIN_OVERFLOW and bins[4] == PPL_BIN_OVERFLOW
    assert bins[5] == 0  # negative clamped to 0
    assert bins.dtype == np.int64


def test_tercile_cutoffs_exact():
    from pycorrector_spark.operators.curation import tercile_cutoffs

    # 9 rows, 3 per bin: cum(10)=3 >= ceil(9/3)=3 -> c1=10;
    # cum(20)=6 >= ceil(18/3)=6 -> c2=20
    assert tercile_cutoffs([(10, 3), (20, 3), (30, 3)]) == (10, 20)
    # skewed: one bin holds everything -> both cutoffs collapse onto it
    assert tercile_cutoffs([(5, 100), (9, 1)]) == (5, 5)
    # unsorted input is sorted internally
    assert tercile_cutoffs([(30, 3), (10, 3), (20, 3)]) == (10, 20)


def test_ccnet_buckets_balanced(spark):
    from pycorrector_spark.operators.curation import ccnet_buckets

    rows = [(i, i % 30) for i in range(300)]  # 30 distinct bins, uniform
    df = spark.createDataFrame(rows, "doc_id: long, bin: long")
    counts = dict(
        ccnet_buckets(df).groupBy("ppl_bucket").count().collect()
    )
    assert counts == {"head": 100, "middle": 100, "tail": 100}


def test_topfrac_cutoff_rules():
    from pycorrector_spark.operators.curation import topfrac_cutoff

    # 40 rows over 4 bins: top quarter (10 rows) = exactly the top bin
    assert topfrac_cutoff([(1, 10), (2, 10), (3, 10), (4, 10)], 1, 4) == 4
    # overshoot allowed, undershoot never: k=ceil(5/4)=2 needs 2 bins
    assert topfrac_cutoff([(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)], 1, 4) == 4
    # one giant bin swallows the cut
    assert topfrac_cutoff([(7, 100)], 1, 4) == 7
    # unsorted input
    assert topfrac_cutoff([(2, 10), (4, 10), (1, 10), (3, 10)], 1, 2) == 3


def test_dsir_weight_prefers_target_like_docs(spark):
    from pycorrector_spark.operators.nbayes import fit_nb, score_nb
    from pyspark.sql import functions as F

    rows = [(i, "target", "the quick brown fox jumps high") for i in range(10)]
    rows += [(100 + i, "other", "zzz qqq kkk vvv xxx www") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id: long, dlabel: string, text: string")
    model = fit_nb(df, label_col="dlabel", text_col="text", n=3, min_count=1)
    w = (
        score_nb(df, model)
        .select("doc_id", (F.col("logp_target") - F.col("logp_other")).alias("w"))
        .collect()
    )
    ws = {r["doc_id"]: r["w"] for r in w}
    assert all(ws[i] > 0 for i in range(10))          # target-like: positive
    assert all(ws[100 + i] < 0 for i in range(10))    # other-like: negative


def test_decontaminate_counts_and_gate(spark):
    from pycorrector_spark.operators.curation import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog at noon"),
            (2, "completely different words with no overlap whatsoever here today"),
            (3, "prefix then the quick brown fox jumps over the lazy dog"),
            (4, None),
            (5, "short text"),
        ],
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text: string"
    )
    got = {r["doc_id"]: r for r in decontaminate(docs, bench, n=8).collect()}
    assert len(got) == 5
    # doc 1 shares both 8-grams of the 9-word bench prompt; doc 3 shares
    # them at an offset (position-independent by construction)
    assert got[1]["contaminated_ngrams"] == 2 and not got[1]["keep"]
    assert got[3]["contaminated_ngrams"] == 2 and not got[3]["keep"]
    assert got[2]["contaminated_ngrams"] == 0 and got[2]["keep"]
    assert got[4]["contaminated_ngrams"] == 0 and got[4]["keep"]  # NULL text
    assert got[5]["contaminated_ngrams"] == 0 and got[5]["keep"]  # < n words


def test_decontaminate_case_insensitive_and_dedup(spark):
    from pycorrector_spark.operators.curation import decontaminate

    docs = spark.createDataFrame(
        [(1, "A B C D E F G H " * 3)],  # repeated contaminated 8-gram
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame([("a b c d e f g h",)], "text: string")
    row = decontaminate(docs, bench, n=8).collect()[0]
    # lowercased match; each DISTINCT n-gram counted once per doc: the
    # 24-word doc has 17 n-gram positions but only 8 distinct 8-grams
    assert not row["keep"]
    assert 0 < row["contaminated_ngrams"] <= 8


def test_select_token_budget_exact_boundary_zero_token_rows(spark):
    """Round-3 advice regression: a bucket whose running offset equals
    the budget EXACTLY must not be pruned — zero-token rows in it have
    inclusive cum_tokens == budget and the 'inclusive running total <=
    budget' contract keeps them."""
    from pycorrector_spark.operators.curation import select_token_budget

    rows = [
        (1, 9, 6),   # score 9: 6 tokens -> cum 6
        (2, 8, 4),   # score 8: 4 tokens -> cum 10 == budget
        (3, 7, 0),   # score 7, ZERO tokens: bucket offset == budget, cum 10
        (4, 7, 5),   # score 7, 5 tokens: cum 15 > budget -> dropped
        (5, 6, 0),   # score 6: offset 15 (whole score-7 bucket counts) -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id: long, score: int, toks: int")
    got = select_token_budget(df, 10, "score", "toks", "doc_id").toPandas()
    # pre-fix behavior pruned the score-7 bucket entirely (run >= budget)
    # and wrongly dropped doc 3; the global-sort oracle keeps it at cum 10
    assert sorted(got["doc_id"]) == [1, 2, 3]
    by_id = dict(zip(got["doc_id"], got["cum_tokens"]))
    assert by_id[3] == 10


def test_domain_mix_cuts_arithmetic():
    from pycorrector_spark.operators.curation import domain_mix_cuts

    counts = {"a": 100, "b": 100, "c": 100, "z": 50}
    # target 50/30/20 over a,b,c: binding domain a keeps all (T=200),
    # b keeps 60%, c keeps 40%; z unweighted -> dropped
    cuts = domain_mix_cuts(counts, {"a": 0.5, "b": 0.3, "c": 0.2})
    assert cuts == {"a": 10000, "b": 6000, "c": 4000, "z": 0}
    # weights auto-normalize; zero/negative weights drop the domain
    assert domain_mix_cuts(counts, {"a": 5, "b": 3, "c": 2}) == cuts
    assert domain_mix_cuts(counts, {})["a"] == 0
    # an empty domain never divides by zero
    cuts2 = domain_mix_cuts({"a": 0, "b": 10}, {"a": 0.5, "b": 0.5})
    assert cuts2["a"] == 0


def test_domain_mix_realizes_proportions(spark):
    from pycorrector_spark.operators.curation import domain_mix
    from pyspark.sql import functions as F

    rows = [(i, f"doc body {i}", ["web", "news", "wiki"][i % 3])
            for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = domain_mix(df, {"web": 0.6, "news": 0.3, "wiki": 0.1})
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # web binds (1000 docs / 0.6 -> T=1666): news ~= T*0.3 = 500,
    # wiki ~= 166; md5-bucket quantization is binomial around the target
    assert got["web"] == 1000
    assert abs(got["news"] - 500) < 80
    assert abs(got["wiki"] - 166) < 50
    # deterministic across invocations
    again = {r["source"]: r["n"] for r in
             domain_mix(df, {"web": 0.6, "news": 0.3, "wiki": 0.1})
             .groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert again == got


def test_curation_e2e_null_text_and_reason_bits(spark):
    """The composite keep decision: NULL-text docs are never 'dups'
    (md5(NULL) carries no equality) but fail the Gopher gate; an exact
    duplicate keeps only its min-id copy; a doc sharing an 8-gram with
    the synthetic benchmark is dropped as contaminated."""
    import __spark_entry__ as E

    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the field with steady even pace today " * 6)
    rows = []
    for i in range(40):
        if i == 7 or i == 24:
            rows.append((i, base))            # exact duplicate pair
        elif i == 30:
            rows.append((i, None))            # NULL text
        else:
            rows.append((i, base.replace("fox", f"fox{i}")))
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="e2e_docs_")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    out = {r["doc_id"]: r for r in E.queries()["qf_curation_e2e"](spark, d).collect()}
    assert len(out) == 40
    assert not out[7]["is_dup"] and out[24]["is_dup"]       # min id wins
    assert not out[24]["keep"]
    assert not out[30]["is_dup"] and not out[30]["gopher_keep"]
    # doc_id % 17 == 3 seeds the benchmark with its own first words ->
    # the seed doc itself is contaminated by construction
    assert out[3]["contaminated_ngrams"] > 0 and not out[3]["keep"]
