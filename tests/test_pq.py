"""Product quantization (train / encode / ADC top-k) — shape
contracts, exactness at codebook points, and ADC vs exact-neighbor
agreement on a separable fixture."""

from __future__ import annotations

import pyspark.sql.functions as F

from pdf_ocr_spark.operators.similarity import (
    pq_adc_topk,
    pq_encode,
    pq_train,
)


def _vecs(spark):
    # two tight clusters per subspace: ids 0-3 near (0,0,..), 4-7 near
    # (10,10,..) in BOTH subspaces -> PQ separates them perfectly
    rows = []
    for i in range(4):
        rows.append((i, [0.0 + i * 0.01] * 4))
    for i in range(4, 8):
        rows.append((i, [10.0 + i * 0.01] * 4))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_train_shape_and_determinism(spark):
    emb = _vecs(spark)
    cb1 = pq_train(emb, m=2, ksub=2, iters=2, dim=4).collect()
    cb2 = pq_train(emb, m=2, ksub=2, iters=2, dim=4).collect()
    key = lambda r: (r["sub_id"], r["cent_id"])
    assert sorted(map(key, cb1)) == [(0, 1), (0, 2), (1, 1), (1, 2)]
    assert {key(r): list(r["cvec"]) for r in cb1} == {
        key(r): list(r["cvec"]) for r in cb2
    }
    # every codebook vector has the subspace dimensionality
    assert all(len(r["cvec"]) == 2 for r in cb1)


def test_pq_encode_separates_clusters(spark):
    emb = _vecs(spark)
    cb = pq_train(emb, m=2, ksub=2, iters=2, dim=4)
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb, dim=4).collect()}
    assert all(len(c) == 2 for c in codes.values())
    # same-cluster vectors share the full code word, across-cluster differ
    assert codes[0] == codes[1] == codes[2] == codes[3]
    assert codes[4] == codes[5] == codes[6] == codes[7]
    assert codes[0] != codes[4]


def test_pq_adc_topk_prefers_own_cluster(spark):
    emb = _vecs(spark)
    cb = pq_train(emb, m=2, ksub=2, iters=2, dim=4)
    out = pq_adc_topk(emb, cb, F.col("vec_id").isin(0, 7), k=3, dim=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, cluster in [(0, {1, 2, 3}), (7, {4, 5, 6})]:
        rows = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3]
        assert {r["neighbor_id"] for r in rows} == cluster
        # ADC distance to same-cell neighbors is the (shared) intra-cell
        # quantized distance: identical for all of them
        assert len({r["adc_dist"] for r in rows}) == 1
        # and strictly below the cross-cluster distance would be (~2*400)
        assert all(r["adc_dist"] < 100 for r in rows)
