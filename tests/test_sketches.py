"""Sketch operators: relational HLL / CMS / HyperBall semantics."""

from pyspark.sql import functions as F

from pdf_ocr_spark.operators.sketches import (
    cms_counts,
    cms_estimate,
    hll_estimate,
    hll_registers,
    hyperball_harmonic,
)


def test_hll_estimate_tracks_cardinality(spark):
    """b=6 HLL estimates land within 30% of truth across two decades of
    cardinality (one m=64 sketch sample — σ ≈ 13%, and the linear-
    counting/raw transition zone around n ≈ 1.5m is the noisiest spot),
    stay ordered by true cardinality, and the register table never
    exceeds m rows per key."""
    rows = [(f"k{n}", f"item{i}") for n in (10, 100, 400) for i in range(n)]
    df = spark.createDataFrame(rows, "key string, item string")
    reg = hll_registers(df, "key", "item", b=6)
    assert reg.groupBy("key").count().agg(F.max("count")).first()[0] <= 64
    est = {r["key"]: r["est"] for r in hll_estimate(reg, "key", b=6).collect()}
    for n in (10, 100, 400):
        assert abs(est[f"k{n}"] - n) / n < 0.30, (n, est[f"k{n}"])
    assert est["k10"] < est["k100"] < est["k400"]


def test_hll_merge_is_groupby_max(spark):
    """Sketch of A ∪ B == max-merge of sketch(A) and sketch(B) — the
    mergeability that makes HLL state shippable across shards and
    snapshots."""
    a = spark.createDataFrame(
        [("k", f"x{i}") for i in range(50)], "key string, item string"
    )
    b = spark.createDataFrame(
        [("k", f"x{i}") for i in range(25, 75)], "key string, item string"
    )
    whole = hll_registers(a.unionByName(b), "key", "item", b=6)
    merged = (
        hll_registers(a, "key", "item", b=6)
        .unionByName(hll_registers(b, "key", "item", b=6))
        .groupBy("key", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_hll_registers_partition_independent(spark):
    df = spark.createDataFrame(
        [("k", f"i{i}") for i in range(300)], "key string, item string"
    )
    a = sorted(map(tuple, hll_registers(df.repartition(2), "key", "item", b=4).collect()))
    b = sorted(map(tuple, hll_registers(df.repartition(13), "key", "item", b=4).collect()))
    assert a == b


def test_cms_never_undercounts_and_is_tight_when_sparse(spark):
    """est ≥ exact for every item (the CMS guarantee); with far fewer
    items than counters the estimates are exact."""
    rows = [(f"u{i % 150}",) for i in range(600)]
    df = spark.createDataFrame(rows, "item string")
    sk = cms_counts(df, "item", d=3, w=64)
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(df.distinct(), sk, "item", d=3, w=64).collect()
    }
    exact = {r["item"]: r["count"] for r in df.groupBy("item").count().collect()}
    assert all(est[k] >= exact[k] for k in exact)

    sparse = spark.createDataFrame([(f"v{i}",) for i in range(5)], "item string")
    sk2 = cms_counts(sparse, "item", d=3, w=64)
    est2 = cms_estimate(sparse, sk2, "item", d=3, w=64).collect()
    assert all(r["est"] == 1 for r in est2)


def test_cms_sketch_is_bounded_and_mergeable(spark):
    big = spark.createDataFrame([(f"z{i}",) for i in range(2000)], "item string")
    sk = cms_counts(big, "item", d=3, w=64)
    assert sk.count() <= 3 * 64
    # merge across two shards = groupBy sum
    h1, h2 = big.filter(F.length("item") <= 2), big.filter(F.length("item") > 2)
    merged = (
        cms_counts(h1, "item", d=3, w=64)
        .unionByName(cms_counts(h2, "item", d=3, w=64))
        .groupBy("row", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, sk.collect())) == sorted(map(tuple, merged.collect()))


def test_hyperball_tracks_exact_harmonic_on_path(spark):
    """Directed path a→b→c→d: tiny balls sit deep in the linear-counting
    regime, so HyperBall estimates stay within 0.25 of the exact
    harmonic values (0, 1, 1.5, 1.8333)."""
    from pdf_ocr_spark.operators.graph import harmonic_centrality

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    hb = {r["node"]: r for r in hyperball_harmonic(edges, radius=3, b=6).collect()}
    ex = {r["node"]: r for r in harmonic_centrality(edges, radius=3).collect()}
    for n in "abcd":
        assert abs(hb[n]["hb_harmonic"] - ex[n]["harmonic"]) < 0.25, (
            n, hb[n], ex[n],
        )
    assert hb["a"]["hb_harmonic"] == 0.0  # empty ball estimates exactly 0


def test_kmv_estimate_and_exact_small_sets(spark):
    """Below k the sketch IS the set (exact count); above k the
    (k−1)·2⁴⁸/h_k estimator lands within 25% at n≈4k."""
    from pdf_ocr_spark.operators.sketches import kmv_bottom_k, kmv_estimate

    small = spark.createDataFrame([(f"s{i}",) for i in range(40)], "url string")
    sk = kmv_bottom_k(small, [], "url", k=128)
    assert kmv_estimate(sk, [], k=128).first()["est"] == 40.0

    big = spark.createDataFrame([(f"b{i}",) for i in range(500)], "url string")
    skb = kmv_bottom_k(big, [], "url", k=128)
    assert skb.count() == 128
    est = kmv_estimate(skb, [], k=128).first()["est"]
    assert abs(est - 500) / 500 < 0.25, est


def test_kmv_jaccard_tracks_true_overlap(spark):
    """Two 60%-overlapping url sets: the union-sample match fraction
    estimates J = 0.6 within sketch noise; disjoint sets estimate 0."""
    from pdf_ocr_spark.operators.sketches import kmv_bottom_k, kmv_jaccard

    a = spark.createDataFrame([(f"u{i}",) for i in range(400)], "url string")
    b = spark.createDataFrame(
        [(f"u{i}",) for i in range(100, 500)], "url string"
    )
    sk_a, sk_b = (kmv_bottom_k(x, [], "url", k=128) for x in (a, b))
    j = kmv_jaccard(sk_a, sk_b, k=128).first()
    true_j = 300 / 500
    assert abs(j["jaccard_est"] - true_j) < 0.15, j
    assert j["n_union_sample"] == 128

    c = spark.createDataFrame([(f"zz{i}",) for i in range(200)], "url string")
    sk_c = kmv_bottom_k(c, [], "url", k=128)
    assert kmv_jaccard(sk_a, sk_c, k=128).first()["jaccard_est"] == 0.0


def _h48_py(item: str, salt: str) -> int:
    """Independent python twin of sketches._h48."""
    import hashlib

    return int(hashlib.md5(f"{item}:{salt}".encode()).hexdigest()[:12], 16)


def test_hll_registers_match_python_twin(spark):
    """Register table equals an INDEPENDENT pure-python HLL built from
    the same published rules (md5-derived 48-bit hash, low-b bucket,
    leading-1 position of the remaining 42 bits) on seeded random
    items — two implementations of the spec, like the byte-BPE
    alphabet gate."""
    import random

    rng = random.Random(7)
    items = [f"it{rng.randrange(10**9)}" for _ in range(500)]
    df = spark.createDataFrame([("k", i) for i in items], "key string, item string")
    got = {
        (r["bucket"], ): r["rho"]
        for r in hll_registers(df, "key", "item", b=6).collect()
    }
    want: dict = {}
    for it in items:
        h = _h48_py(it, "hll")
        bucket, w = h % 64, h >> 6
        rho = 43 if w == 0 else 42 - w.bit_length() + 1
        want[(bucket,)] = max(want.get((bucket,), 0), rho)
    assert got == want


def test_cms_counts_match_python_twin(spark):
    """CMS counter table equals the independent python twin (same
    salted hashes, same d×w addressing) on seeded random multisets."""
    import random
    from collections import Counter

    rng = random.Random(11)
    items = [f"u{rng.randrange(40)}" for _ in range(300)]
    df = spark.createDataFrame([(i,) for i in items], "item string")
    got = {
        (r["row"], r["pos"]): r["cnt"]
        for r in cms_counts(df, "item", d=3, w=64).collect()
    }
    want: Counter = Counter()
    for it in items:
        for i in range(3):
            want[(i, _h48_py(it, f"cms{i}") % 64)] += 1
    assert got == dict(want)


def test_kmv_jaccard_empty_sketches_yield_null_not_crash(spark):
    """ANSI-mode edge: two empty sketches produce a NULL jaccard_est
    row (visible absence), never a DIVIDE_BY_ZERO job failure."""
    from pdf_ocr_spark.operators.sketches import kmv_bottom_k, kmv_jaccard

    empty = spark.createDataFrame([], "url string")
    sk = kmv_bottom_k(empty, [], "url", k=8)
    r = kmv_jaccard(sk, sk, k=8).first()
    assert r["n_union_sample"] == 0 and r["jaccard_est"] is None


def test_trustrank_rejects_empty_seed_set(spark):
    import pytest
    from pdf_ocr_spark.operators.graph import trustrank

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([], "node string")
    with pytest.raises(ValueError, match="non-empty seed"):
        trustrank(edges, seeds)


def test_log_histogram_quantiles_bound_error(spark):
    """p50/p90/p99 estimates from the log2/4-sub-bin histogram land
    within one bin width (25% relative) of the exact discrete
    percentile, and the sharded build merges to the direct build."""
    import numpy as np

    from pdf_ocr_spark.operators.sketches import (
        histogram_quantiles, log_histogram)

    rng = np.random.RandomState(3)
    vals = np.concatenate([
        rng.randint(1, 2000, 800),
        rng.randint(2000, 60000, 200),
    ]).tolist()
    df = spark.createDataFrame(
        [(int(v), i % 8) for i, v in enumerate(vals)], "v long, shard int"
    )
    direct = {r["bin"]: r["cnt"]
              for r in log_histogram(df, "v").collect()}
    sharded = {r["bin"]: r["cnt"]
               for r in log_histogram(df, "v",
                                      shard_col=F.col("shard")).collect()}
    assert direct == sharded          # merge = SUM, provably lossless
    est = {r["q"]: r["est"] for r in histogram_quantiles(
        log_histogram(df, "v"), [0.5, 0.9, 0.99]).collect()}
    import math

    svals = sorted(vals)
    n = len(svals)
    for q in (0.5, 0.9, 0.99):
        exact = svals[math.ceil(q * n) - 1]
        assert abs(est[q] - exact) / exact <= 0.25, (q, est[q], exact)


def test_log_histogram_bin_bounds(spark):
    """Bin ids are exact at power-of-two boundaries: v = 2^k lands in
    bin 4k (first sub-bin of octave k), v = 2^k − 1 in the last
    sub-bin of octave k−1 — the log2/floor arithmetic never straddles
    an octave edge."""
    from pdf_ocr_spark.operators.sketches import log_histogram

    df = spark.createDataFrame(
        [(1,), (2,), (4,), (7,), (8,), (1023,), (1024,), (1536,)], "v long"
    )
    bins = {r["bin"]: r["cnt"] for r in log_histogram(df, "v").collect()}
    assert bins == {
        0: 1,    # v=1    → octave 0, sub 0
        4: 1,    # v=2    → octave 1, sub 0
        8: 1,    # v=4    → octave 2, sub 0
        11: 1,   # v=7    → octave 2, sub 3 (7/4 = 1.75)
        12: 1,   # v=8    → octave 3, sub 0
        39: 1,   # v=1023 → octave 9, sub 3 (1023/512 = 1.998)
        40: 1,   # v=1024 → octave 10, sub 0
        42: 1,   # v=1536 → octave 10, sub 2 (1536/1024 = 1.5)
    }
