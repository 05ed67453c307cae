"""Beyond-reference divergences: Wasserstein-1 (distributed, exact) and
Jensen-Shannon / Hellinger over aligned histogram proportions.

W1 oracle here is a literal numpy transcription of the empirical-CDF
quantile-integral identity (scipy.stats.wasserstein_distance semantics);
the engine's quantized-decimal sum must agree to the quantization error
bound AND be bit-identical across layouts and the window/bucketed paths.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from driftspark.numerics import (
    hellinger_from_proportions,
    js_divergence_from_proportions,
)
from driftspark.stats import wasserstein_all


# ---------------------------------------------------------------------------
# numpy reference for W1 (pooled distinct values, CDF-area formula)
# ---------------------------------------------------------------------------


def _w1_numpy(x: np.ndarray, y: np.ndarray) -> float:
    v = np.union1d(x, y)
    cx = np.searchsorted(np.sort(x), v, side="right") / len(x)
    cy = np.searchsorted(np.sort(y), v, side="right") / len(y)
    return float(np.sum(np.abs(cx[:-1] - cy[:-1]) * np.diff(v)))


def _frame(spark, feats: dict):
    """feats: {name: (ref_values, test_values)} -> (ref_df, test_df)."""
    n_ref = max(len(r) for r, _ in feats.values())
    n_test = max(len(t) for _, t in feats.values())

    def side(idx, n):
        rows = []
        for i in range(n):
            rows.append(
                tuple(
                    float(feats[c][idx][i]) if i < len(feats[c][idx]) else None
                    for c in feats
                )
            )
        schema = ", ".join(f"{c} double" for c in feats)
        return spark.createDataFrame(rows, schema)

    return side(0, n_ref), side(1, n_test)


@pytest.fixture(scope="module")
def samples():
    rng = np.random.default_rng(7)
    x = np.round(rng.normal(10, 2, 4000), 2)  # heavy ties (2dp grid)
    y = np.round(rng.normal(11.5, 2.5, 3000), 2)
    u = rng.uniform(0, 1, 2500)
    v = rng.uniform(0.2, 1.2, 3500)
    return x, y, u, v


def test_w1_matches_numpy_reference(spark, samples):
    x, y, u, v = samples
    ref, test = _frame(spark, {"a": (x, y), "b": (u, v)})
    out = wasserstein_all(ref, test, ["a", "b"])
    assert set(out) == {"a", "b"}
    wa, n, m = out["a"]
    assert (n, m) == (len(x), len(y))
    # quantization error bound: 0.5e-9 per distinct pooled value
    assert abs(wa - _w1_numpy(x, y)) < 1e-5
    wb, *_ = out["b"]
    assert abs(wb - _w1_numpy(u, v)) < 1e-5


def test_w1_identical_and_constant(spark):
    rng = np.random.default_rng(1)
    x = np.round(rng.normal(0, 1, 500), 3)
    ref, test = _frame(spark, {"a": (x, x), "c": (np.full(80, 5.0), np.full(60, 5.0))})
    out = wasserstein_all(ref, test, ["a", "c"])
    assert out["a"][0] == 0.0
    # one pooled distinct value -> no gaps -> 0 by definition (not missing)
    assert out["c"] == (0.0, 80, 60)


def test_w1_shift_scale_sanity(spark):
    # a pure location shift of delta has W1 == delta exactly
    x = np.arange(1000) / 10.0
    ref, test = _frame(spark, {"a": (x, x + 3.25)})
    w1 = wasserstein_all(ref, test, ["a"])["a"][0]
    assert abs(w1 - 3.25) < 1e-6


def test_w1_layout_and_bucketed_bit_parity(spark, samples):
    x, y, u, v = samples
    ref, test = _frame(spark, {"a": (x, y), "b": (u, v)})
    base = wasserstein_all(ref, test, ["a", "b"])
    # layout invariance: quantized-decimal sum is order-independent
    relaid = wasserstein_all(ref.repartition(13), test.repartition(7), ["a", "b"])
    assert relaid == base
    # bucketed decomposition (force it) is bit-identical to the window path
    bucketed = wasserstein_all(
        ref, test, ["a", "b"], bucketed_threshold=1, n_buckets=8
    )
    assert bucketed == base


def test_w1_one_sided_feature_skipped(spark):
    ref, test = _frame(
        spark, {"a": (np.arange(50.0), np.arange(50.0)), "d": (np.arange(30.0), [])}
    )
    out = wasserstein_all(ref, test, ["a", "d"])
    assert "d" not in out and "a" in out


# ---------------------------------------------------------------------------
# JS / Hellinger hand math + properties
# ---------------------------------------------------------------------------


def test_js_hand_math():
    e = np.array([0.5, 0.5, 0.0])
    a = np.array([0.25, 0.25, 0.5])
    m = (e + a) / 2
    exp = 0.5 * sum(
        p * math.log(p / q) for p, q in zip(e, m) if p > 0
    ) + 0.5 * sum(p * math.log(p / q) for p, q in zip(a, m) if p > 0)
    assert abs(js_divergence_from_proportions(e, a) - exp) < 1e-12


def test_js_properties():
    rng = np.random.default_rng(3)
    e = rng.dirichlet(np.ones(10))
    a = rng.dirichlet(np.ones(10))
    js = js_divergence_from_proportions(e, a)
    assert 0 <= js <= math.log(2) + 1e-12
    # symmetry + identity
    assert abs(js - js_divergence_from_proportions(a, e)) < 1e-12
    assert js_divergence_from_proportions(e, e) == pytest.approx(0.0, abs=1e-15)
    # disjoint support saturates at ln 2
    assert js_divergence_from_proportions(
        np.array([1.0, 0.0]), np.array([0.0, 1.0])
    ) == pytest.approx(math.log(2))
    # renormalization: raw counts and proportions agree
    c1, c2 = np.array([30.0, 20, 50]), np.array([10.0, 60, 30])
    assert js_divergence_from_proportions(c1, c2) == pytest.approx(
        js_divergence_from_proportions(c1 / 100, c2 / 100)
    )
    assert math.isnan(js_divergence_from_proportions(np.zeros(3), a[:3]))


def test_hellinger_hand_math_and_bounds():
    e = np.array([0.5, 0.5])
    a = np.array([0.5, 0.5])
    assert hellinger_from_proportions(e, a) == pytest.approx(0.0, abs=1e-15)
    assert hellinger_from_proportions(
        np.array([1.0, 0.0]), np.array([0.0, 1.0])
    ) == pytest.approx(1.0)
    x = np.array([0.9, 0.1])
    y = np.array([0.4, 0.6])
    exp = math.sqrt(
        0.5
        * (
            (math.sqrt(0.9) - math.sqrt(0.4)) ** 2
            + (math.sqrt(0.1) - math.sqrt(0.6)) ** 2
        )
    )
    assert hellinger_from_proportions(x, y) == pytest.approx(exp, abs=1e-12)
    assert abs(
        hellinger_from_proportions(x, y) - hellinger_from_proportions(y, x)
    ) < 1e-15


# ---------------------------------------------------------------------------
# Detector integration
# ---------------------------------------------------------------------------


def test_wasserstein_detector(spark, samples):
    from driftspark.dataset import SparkDataset
    from driftspark.detectors import WassersteinDistance
    from driftspark.registry import DetectorRegistry

    x, y, u, _ = samples
    ref, test = _frame(spark, {"a": (x, x), "b": (u, u + 0.5)})
    det = DetectorRegistry.create("wasserstein")
    assert isinstance(det, WassersteinDistance)
    res = det.fit_detect(SparkDataset(ref), SparkDataset(test))
    fr = res.metadata["feature_results"]
    assert fr["a"]["w1_normalized"] == pytest.approx(0.0, abs=1e-9)
    # b shifted by 0.5 on std ~0.289 uniform -> normalized ~1.73
    assert fr["b"]["w1"] == pytest.approx(0.5, abs=1e-6)
    assert fr["b"]["w1_normalized"] > 1.5
    assert res.drift_detected and res.severity.value == "critical"

    # null case: no drift
    res0 = WassersteinDistance().fit_detect(SparkDataset(ref), SparkDataset(ref))
    assert not res0.drift_detected and res0.score == pytest.approx(0.0, abs=1e-9)


def test_psi_extra_divergences(spark, samples):
    from driftspark.dataset import SparkDataset
    from driftspark.detectors import PSI

    x, y, *_ = samples
    ref, test = _frame(spark, {"a": (x, y)})
    res = PSI(extra_divergences=True, exact_edges=True).fit_detect(
        SparkDataset(ref), SparkDataset(test)
    )
    fr = res.metadata["feature_results"]["a"]
    assert 0 < fr["js_divergence"] <= math.log(2)
    assert 0 < fr["hellinger"] <= 1
    # parity default: without the flag the keys are absent
    res2 = PSI(exact_edges=True).fit_detect(SparkDataset(ref), SparkDataset(test))
    assert "js_divergence" not in res2.metadata["feature_results"]["a"]
