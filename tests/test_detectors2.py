"""MMD, domain classifier, hallucination detector, iforest, RCA."""

import numpy as np
import pandas as pd
import pytest

from driftspark import DetectorRegistry, DriftSeverity, RCARegistry, SparkDataset
from driftspark.detectors.mmd import mmd_unbiased
from driftspark.iforest import IsolationForest


def _sds(spark, arr, **kw):
    cols = [f"feature_{i}" for i in range(arr.shape[1])]
    return SparkDataset(spark.createDataFrame(pd.DataFrame(arr, columns=cols)), **kw)


def test_mmd_math_properties():
    rng = np.random.RandomState(42)
    X = rng.normal(0, 1, (300, 4))
    Y_same = rng.normal(0, 1, (300, 4))
    Y_shift = rng.normal(2, 1, (300, 4))
    m_same = mmd_unbiased(X, Y_same)
    m_shift = mmd_unbiased(X, Y_shift)
    assert m_same < 0.1 < m_shift
    # linear-kernel MMD^2 equals ||mean(X) - mean(Y)||^2 (hand math)
    m_lin = mmd_unbiased(X, Y_shift, kernel="linear")
    n, m = len(X), len(Y_shift)
    K_XX, K_YY, K_XY = X @ X.T, Y_shift @ Y_shift.T, X @ Y_shift.T
    expect = (
        (K_XX.sum() - np.trace(K_XX)) / (n * (n - 1))
        + (K_YY.sum() - np.trace(K_YY)) / (m * (m - 1))
        - 2 * K_XY.sum() / (n * m)
    )
    assert m_lin == pytest.approx(np.sqrt(max(0, expect)), abs=1e-12)


def test_mmd_detector(spark):
    np.random.seed(42)
    ref = _sds(spark, np.random.normal(0, 1, (400, 3)))
    test_null = _sds(spark, np.random.normal(0, 1, (400, 3)))
    test_alt = _sds(spark, np.random.normal(0, 1, (400, 3)) + 2.0)
    det = DetectorRegistry.create("mmd", n_permutations=30)
    r0 = det.fit_detect(ref, test_null)
    assert r0.drift_detected is False
    assert r0.p_value > 0.05
    r1 = DetectorRegistry.create("mmd", n_permutations=30).fit_detect(ref, test_alt)
    assert r1.drift_detected is True
    assert r1.severity == DriftSeverity.CRITICAL
    assert r1.p_value < 0.1


def test_mmd_deterministic_sampling(spark):
    rng = np.random.RandomState(1)
    big = _sds(spark, rng.normal(0, 1, (3000, 2)))
    det1 = DetectorRegistry.create("mmd", max_samples=500, n_permutations=0)
    det2 = DetectorRegistry.create("mmd", max_samples=500, n_permutations=0)
    r1 = det1.fit_detect(big, big)
    r2 = det2.fit_detect(big, big)
    assert r1.score == r2.score  # content-keyed sample is deterministic
    assert r1.metadata["subsampled"] is True


def test_domain_classifier(spark):
    np.random.seed(42)
    ref = _sds(spark, np.random.normal(0, 1, (500, 3)))
    same = _sds(spark, np.random.normal(0, 1, (500, 3)))
    shifted_arr = np.random.normal(0, 1, (500, 3))
    shifted_arr[:, 1] += 3.0
    shifted = _sds(spark, shifted_arr)
    det = DetectorRegistry.create("domain_classifier")
    r0 = det.fit_detect(ref, same)
    assert r0.score < 0.6  # indistinguishable → AUC ~ 0.5
    r1 = DetectorRegistry.create("domain_classifier").fit_detect(ref, shifted)
    assert r1.drift_detected is True
    assert r1.score > 0.85
    assert r1.severity == DriftSeverity.CRITICAL
    # the shifted feature dominates importances
    top_feature = r1.metadata["top_features"][0][0]
    assert top_feature == "feature_1"


def test_domain_classifier_md5_mode(spark):
    """Engine-portable sample path: md5-ordered side caps + md5-derived
    fold ids.  fit_detect must work end to end in md5 mode, the training
    frame must be layout-invariant (content-keyed, not positional), and
    fold ids must match the documented 60-bit md5 formula."""
    import hashlib

    from driftspark.dataset import SparkDataset
    from driftspark.detectors.domain_classifier import DomainClassifier

    rows = [(i, float(i % 7), float(i % 11)) for i in range(400)]
    ref_pdf = [(k, a, b) for (k, a, b) in rows if k % 2 == 0]
    test_pdf = [(k, a + 10.0, b) for (k, a, b) in rows if k % 2 == 1]
    schema = "k long, x double, y double"

    def mk(data, parts):
        return spark.createDataFrame(data, schema).repartition(parts)

    det = DomainClassifier(
        max_samples_per_side=50, sample_hash="md5", sample_key_cols=["k"],
        cv_folds=3, n_estimators=10,
    )
    det.fit(SparkDataset(mk(ref_pdf, 2), feature_cols=["x", "y"], metadata_cols=["k"]))
    f1 = det.training_frame(
        SparkDataset(mk(test_pdf, 2), feature_cols=["x", "y"], metadata_cols=["k"])
    ).toPandas()
    f2 = det.training_frame(
        SparkDataset(mk(test_pdf, 7), feature_cols=["x", "y"], metadata_cols=["k"])
    ).toPandas()
    key = lambda df: sorted(map(tuple, df[["k", "label", "fold"]].values.tolist()))
    assert key(f1) == key(f2)  # layout-invariant membership + folds
    assert len(f1) == 100  # both sides capped at 50
    assert set(f1["fold"]) <= {0, 1, 2}
    # fold formula parity with the documented md5 derivation
    for k, _, fold in f1[["k", "label", "fold"]].itertuples(index=False):
        h = hashlib.md5(f"{int(k)}|42".encode()).hexdigest()
        assert fold == int(h[:15], 16) % 3
    # membership parity: the 50 smallest md5(k) per side
    exp_ref = sorted(
        (r[0] for r in ref_pdf),
        key=lambda k: hashlib.md5(str(k).encode()).hexdigest(),
    )[:50]
    got_ref = sorted(int(k) for k in f1[f1["label"] == 0.0]["k"])
    assert got_ref == sorted(exp_ref)
    # end-to-end detect in md5 mode separates the shifted side
    res = det.detect(
        SparkDataset(mk(test_pdf, 3), feature_cols=["x", "y"], metadata_cols=["k"])
    )
    assert res.drift_detected is True and res.score > 0.8
    # key/feature overlap is rejected loudly
    det_bad = DomainClassifier(sample_hash="md5", sample_key_cols=["x"])
    det_bad.fit(
        SparkDataset(mk(ref_pdf, 2), feature_cols=["x", "y"], metadata_cols=["k"])
    )
    with pytest.raises(ValueError, match="disjoint"):
        det_bad._build_training_frame(
            SparkDataset(mk(test_pdf, 2), feature_cols=["x", "y"], metadata_cols=["k"]),
            keep_keys=True,
        )


def test_iforest_separates_outliers():
    rng = np.random.RandomState(42)
    X = rng.normal(0, 1, (500, 4))
    inliers = rng.normal(0, 1, (50, 4))
    outliers = rng.normal(6, 0.3, (50, 4))
    f = IsolationForest(n_estimators=100, random_state=42).fit(X)
    s_in = -f.score_samples(inliers)
    s_out = -f.score_samples(outliers)
    assert s_out.mean() > s_in.mean()
    assert (s_out > np.median(s_in)).mean() > 0.95
    assert np.all(s_in > 0) and np.all(s_in < 1)


@pytest.mark.parametrize("method", ["mahalanobis", "knn", "kde", "isolation_forest"])
def test_hallucination_quadrants(spark, method):
    # reference hallucination_demo.py:24-44 shape: in-dist test + OOD cluster
    rng = np.random.RandomState(42)
    ref_arr = rng.normal(0, 1, (400, 6))
    in_dist = rng.normal(0, 1, (200, 6))
    ood = rng.normal(6, 0.3, (100, 6))
    test_arr = np.vstack([in_dist, ood])
    # high confidence everywhere → OOD rows land in the hallucination quadrant
    proba = np.full(300, 0.95)
    test_pdf = pd.DataFrame(test_arr, columns=[f"feature_{i}" for i in range(6)])
    test_pdf["proba"] = proba
    test_pdf["row_id"] = np.arange(300)
    ref = _sds(spark, ref_arr)
    test = SparkDataset(
        spark.createDataFrame(test_pdf),
        proba_col="proba",
        metadata_cols=["row_id"],
    )
    det = DetectorRegistry.create("hallucination_risk", density_method=method)
    res = det.fit_detect(ref, test)
    assert res.n_hallucination_risk >= 90  # nearly all OOD rows flagged
    assert res.hallucination_rate == pytest.approx(res.n_hallucination_risk / 300)
    q = res.quadrant_counts
    assert sum(q.values()) == 300
    assert q["hallucination_risk"] == res.n_hallucination_risk
    # OOD block (row_id >= 200) must be fully flagged and strictly farther
    # from the reference manifold than in-dist rows.  (With a flat 0.5
    # distance threshold some backends also flag in-dist rows — e.g.
    # Mahalanobis sqrt(chi2_6) typicals sit at ~0.7 x p95; knn in-dist
    # means sit above p95/2 — the reference's math behaves identically,
    # so assert score separation, not flag exclusivity.)
    rows = res.rows.toPandas().set_index("row_id")
    ood_rate = rows.loc[200:, "flagged"].mean()
    assert ood_rate >= 0.9
    assert (
        rows.loc[200:, "norm_distance"].mean()
        > rows.loc[:199, "norm_distance"].mean()
    )
    assert res.severity in (DriftSeverity.HIGH, DriftSeverity.CRITICAL)


@pytest.mark.parametrize("sample_hash", ["xxhash64", "md5"])
def test_hallucination_ref_sample_layout_invariant(spark, sample_hash):
    """The knn/kde reference sample (content-keyed xxhash64 bounded-merge
    path AND the engine-portable md5-keyed path) must be invariant to the
    physical layout of the reference table, and the cap must bind."""
    rng = np.random.RandomState(7)
    cols = ["feature_0", "feature_1", "feature_2"]
    ref_pdf = pd.DataFrame(rng.normal(0, 1, (1200, 3)), columns=cols)
    ref_pdf["rid"] = np.arange(1200)
    test_pdf = pd.DataFrame(rng.normal(0.5, 1, (300, 3)), columns=cols)
    test_pdf["proba"] = 0.9
    kw = dict(
        density_method="knn", max_ref_sample=200, exact_distance_percentile=True
    )
    if sample_hash == "md5":
        kw.update(sample_hash="md5", sample_key_cols=["rid"])

    def run(parts):
        ref = SparkDataset(
            spark.createDataFrame(ref_pdf).repartition(parts),
            feature_cols=cols,
            metadata_cols=["rid"],
        )
        test = SparkDataset(spark.createDataFrame(test_pdf), proba_col="proba")
        det = DetectorRegistry.create("hallucination_risk", **kw)
        res = det.fit_detect(ref, test)
        return det._state["ref"], res

    s2, r2 = run(2)
    s7, r7 = run(7)
    assert s2.shape == (200, 3)  # the cap binds
    assert np.array_equal(s2, s7)  # same rows, same order, any layout
    assert r2.n_hallucination_risk == r7.n_hallucination_risk
    assert r2.metadata["mean_normalised_distance"] == pytest.approx(
        r7.metadata["mean_normalised_distance"], abs=0
    )


def test_hallucination_md5_requires_keys():
    with pytest.raises(ValueError, match="sample_key_cols"):
        DetectorRegistry.create("hallucination_risk", sample_hash="md5")


def test_hallucination_mahalanobis_oracle(spark):
    """Distributed Mahalanobis == driver numpy einsum oracle."""
    rng = np.random.RandomState(0)
    ref_arr = rng.normal(0, 1, (300, 4)) @ rng.normal(size=(4, 4))  # correlated
    test_arr = rng.normal(0, 1, (100, 4))
    test_pdf = pd.DataFrame(test_arr, columns=[f"feature_{i}" for i in range(4)])
    test_pdf["proba"] = 0.9
    test_pdf["row_id"] = np.arange(100)
    det = DetectorRegistry.create("hallucination_risk", exact_distance_percentile=True)
    det.fit(_sds(spark, ref_arr))
    res = det.detect(
        SparkDataset(
            spark.createDataFrame(test_pdf), proba_col="proba", metadata_cols=["row_id"]
        )
    )
    rows = {r["row_id"]: r["norm_distance"] for r in res.rows.collect()}
    mu = ref_arr.mean(axis=0)
    VI = np.linalg.pinv(np.cov(ref_arr.T))
    delta = ref_arr - mu
    ref_d = np.sqrt(np.maximum(np.einsum("ij,jk,ik->i", delta, VI, delta), 0))
    p95 = np.percentile(ref_d, 95)
    delta_t = test_arr - mu
    d_t = np.sqrt(np.maximum(np.einsum("ij,jk,ik->i", delta_t, VI, delta_t), 0))
    expect = np.clip(d_t / (p95 + 1e-10), 0, 1)
    for i in range(100):
        assert rows[i] == pytest.approx(expect[i], abs=1e-9), i


def test_hallucination_binary_confidence(spark):
    rng = np.random.RandomState(3)
    arr = rng.normal(0, 1, (100, 2))
    pdf = pd.DataFrame(arr, columns=["feature_0", "feature_1"])
    pdf["proba"] = 0.25  # binary → confidence = max(p, 1-p) = 0.75
    ds = SparkDataset(spark.createDataFrame(pdf), proba_col="proba")
    det = DetectorRegistry.create("hallucination_risk", exact_distance_percentile=True)
    det.fit(ds)
    res = det.detect(ds)
    assert res.metadata["mean_confidence"] == pytest.approx(0.75, abs=1e-9)


def test_rca_registry_and_shap_degraded(spark):
    np.random.seed(42)
    ref = _sds(spark, np.random.normal(0, 1, (100, 3)))
    test = _sds(spark, np.random.normal(0, 1, (100, 3)))
    shap_rca = RCARegistry.create("shap")
    r = shap_rca.analyze(ref, test, model=None)
    assert r.explanations == {"error": "Model required for SHAP analysis"}
    # with a model but no shap library: reference-parity degraded message
    class Dummy:
        def predict(self, X):
            return np.zeros(len(X))
    r2 = shap_rca.analyze(ref, test, model=Dummy())
    assert "error" in r2.explanations


def test_distribution_change_rca(spark):
    np.random.seed(42)
    ref = _sds(spark, np.random.normal(0, 1, (400, 3)))
    arr = np.random.normal(0, 1, (400, 3))
    arr[:, 2] += 3.0
    test = _sds(spark, arr)
    rca = RCARegistry.create("distribution_change")
    r = rca.analyze(ref, test)
    assert r.explanations["domain_auc"] > 0.85
    top = r.explanations["top_importance_changes"][0][0]
    assert top == "feature_2"
    assert r.distribution_changes["feature_2"]["mean_shift"] == pytest.approx(3.0, abs=0.3)
    d = r.to_dict()
    assert set(d) == {
        "analyzer_name",
        "explanations",
        "feature_importances",
        "distribution_changes",
        "recommendations",
        "metadata",
    }
