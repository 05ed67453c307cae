"""Measured-recall telemetry (driftspark.recall) + per-operator recall
bounds asserted on oracle fixtures.

Each approximate path's documented bound (README "Approximate-path
recall") is exercised against an EXACT ground-truth pair set:
minhash banding vs all-pairs Jaccard, hyperplane embedding LSH vs
brute-force cosine, simhash chunking's pigeonhole guarantee."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from driftspark.recall import assert_pair_recall, pair_recall


def test_pair_recall_basics(spark):
    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    # one hit given in reversed order (order-insensitive), one duplicate
    # approx row (counted once), one miss, one extra
    approx = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 4), (9, 10)], "id_a long, id_b long"
    )
    rep = pair_recall(approx, truth)
    assert rep == {"n_truth": 3, "n_approx": 3, "n_hit": 2,
                   "recall": pytest.approx(2 / 3)}
    with pytest.raises(AssertionError, match="recall 0.66"):
        assert_pair_recall(approx, truth, min_recall=0.9)
    assert_pair_recall(approx, truth, min_recall=0.5)
    # empty truth: nothing required, nothing missed
    empty = truth.where(F.lit(False))
    assert pair_recall(approx, empty)["recall"] == 1.0


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """16 hashes / 4 bands at per-pair Jaccard ~0.9: capture probability
    1-(1-s^4)^4 ~ 0.99 per pair — the documented >=0.9 bound must hold on
    the fixture (30 planted near-dup pairs, token-disjoint across pairs,
    deterministic md5 hashing)."""
    from driftspark.dedup import jaccard_pairs, minhash_near_duplicates

    docs = []
    for p in range(30):
        base = [f"p{p}w{t}" for t in range(20)]
        variant = list(base)
        variant[7] = f"p{p}CHANGED"  # jaccard = 19/21 ~ 0.905
        docs.append((2 * p, " ".join(base)))
        docs.append((2 * p + 1, " ".join(variant)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    truth = jaccard_pairs(df, "doc_id", "text", min_jaccard=0.8)
    assert truth.count() == 30  # the fixture really plants 30 exact pairs
    approx = minhash_near_duplicates(
        df, "doc_id", "text", n_hashes=16, bands=4, min_jaccard=0.8
    )
    rep = assert_pair_recall(approx, truth, min_recall=0.9)
    assert rep["n_truth"] == 30
    # verification step makes precision exact: no pair below the threshold
    assert rep["n_approx"] == rep["n_hit"]


def test_embedding_lsh_recall_vs_exact_cosine(spark):
    """Hyperplane LSH (16 planes / 4 bands) at cosine >= 0.99: band-share
    probability 1-(1-(1-theta/pi)^4)^4 ~ 0.999 — documented >=0.9 bound
    asserted against the brute-force cosine truth set."""
    from driftspark.ann import embedding_near_duplicates

    rng = np.random.RandomState(7)
    base = rng.normal(0, 1, (120, 16))
    noisy = base[:40] + rng.normal(0, 0.005, (40, 16))  # cosine ~ 0.99997
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [(1000 + i, [float(x) for x in v]) for i, v in enumerate(noisy)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")

    # brute-force truth (120+40 rows -> trivially small cross join)
    a = df.select(F.col("id").alias("id_a"), F.col("vec").alias("va"))
    b = df.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    truth = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", dot / (norm(F.col("va")) * norm(F.col("vb"))))
        .where(F.col("cos") >= 0.99)
        .select("id_a", "id_b")
    )
    n_truth = truth.count()
    assert n_truth >= 40  # at least the planted pairs

    approx = embedding_near_duplicates(
        df, "id", "vec", min_cosine=0.99, n_planes=16, bands=4, dim=16
    )
    rep = assert_pair_recall(approx, truth, min_recall=0.9)
    # exact-cosine verification: every emitted pair is a truth pair
    assert rep["n_approx"] == rep["n_hit"]


def test_simhash_pigeonhole_recall_total(spark):
    """chunks = max_hamming + 1 gives a DETERMINISTIC (not probabilistic)
    guarantee below the bucket cap: recall must be exactly 1.0."""
    from driftspark.dedup import simhash_near_duplicates

    def signed64(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    rng = np.random.RandomState(11)
    rows = []
    truth_pairs = []
    for p in range(25):
        h = int(rng.randint(0, 2**63))
        flips = rng.choice(64, size=3, replace=False)
        h2 = h
        for f in flips:
            h2 ^= 1 << int(f)  # flipping bit 63 leaves the unsigned range
        rows.append((2 * p, signed64(h)))
        rows.append((2 * p + 1, signed64(h2)))
        truth_pairs.append((2 * p, 2 * p + 1))
    sim = spark.createDataFrame(rows, "id long, simhash long")
    approx = simhash_near_duplicates(sim, max_hamming=3)
    truth = spark.createDataFrame(truth_pairs, "id_a long, id_b long")
    rep = assert_pair_recall(approx, truth, min_recall=1.0)
    assert rep["recall"] == 1.0


def test_topk_recall_math(spark):
    """Hand-checkable recall@k: query 1 gets 2/3, query 2 gets 0 (absent
    from approx), query 9 (approx-only) is ignored."""
    from driftspark.recall import topk_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)], "id_a long, id_b long"
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 99), (9, 90)], "id_a long, id_b long"
    )
    rep = topk_recall(approx, exact)
    assert rep["n_queries"] == 2
    assert rep["mean_recall"] == pytest.approx((2 / 3 + 0.0) / 2)
    assert rep["min_recall"] == 0.0
    # empty truth
    assert topk_recall(approx, exact.where(F.lit(False)))["mean_recall"] == 1.0


def test_ivf_search_recall_vs_exact(spark):
    """IVF probe-pruned search measured against the brute-force top-k:
    with n_probe=half the cells, recall@5 should be high on clustered
    data; with ALL cells probed it is exact (recall 1.0)."""
    from driftspark.ann import IVFIndex, knn_pairs_exact
    from driftspark.recall import topk_recall

    rng = np.random.RandomState(3)
    centers = rng.normal(0, 5, (8, 12))
    rows = []
    for i in range(400):
        c = centers[i % 8]
        rows.append((i, [float(x) for x in c + rng.normal(0, 0.4, 12)]))
    df = spark.createDataFrame(rows, "id long, vec array<double>")

    idx = IVFIndex(n_centroids=8, sample_rows=400).fit(df, "vec")
    assigned = idx.assign(df, "vec").cache()
    exact = knn_pairs_exact(df, "id", "vec", k=5)

    queries = [r["vec"] for r in df.where(F.col("id") < 6).orderBy("id").collect()]
    import pandas as _pd

    def approx_frame(n_probe):
        hits = []
        for qid, qv in enumerate(queries):
            top = idx.search(assigned, "id", "vec", qv, k=6, n_probe=n_probe)
            hits += [
                (qid, r["id"]) for r in top.collect() if r["id"] != qid
            ][:5]
        return spark.createDataFrame(
            _pd.DataFrame(hits, columns=["id_a", "id_b"])
        )

    exact_q = exact.where(F.col("id_a") < 6)
    full = topk_recall(approx_frame(8), exact_q)
    assert full["n_queries"] == 6
    assert full["mean_recall"] == 1.0  # all cells probed == brute force
    pruned = topk_recall(approx_frame(2), exact_q)
    assert pruned["mean_recall"] >= 0.8  # clustered data: 2 probes suffice
    assigned.unpersist()
