"""Reference smoke scenarios ported 1:1 (same seeds, shapes, assertions).

Mirrors /root/reference/tests/test_smoke.py:11-96 plus the FIXTURES.md F3
scenarios: dataset construction, registry contents, KS null/alternative,
pipeline end-to-end, localizer pinpointing.
"""

import numpy as np
import pandas as pd
import pytest

from driftspark import (
    DetectorRegistry,
    DriftPipeline,
    DriftSeverity,
    LocalizerRegistry,
    SparkDataset,
)
from driftspark.detectors import KSTest, PSI


def _sds(spark, arr, cols=None, **kw):
    cols = cols or [f"feature_{i}" for i in range(arr.shape[1])]
    return SparkDataset(spark.createDataFrame(pd.DataFrame(arr, columns=cols)), **kw)


def test_dataset_construction(spark):
    rng = np.random.RandomState(42)
    pdf = pd.DataFrame(rng.normal(size=(50, 3)), columns=["f0", "f1", "f2"])
    pdf["label"] = rng.randint(0, 2, 50)
    ds = SparkDataset(spark.createDataFrame(pdf), target_col="label")
    assert ds.n_features == 3
    assert ds.feature_names == ["f0", "f1", "f2"]
    assert ds.n_samples == 50
    assert ds.shape == (50, 3)


def test_registry_contents():
    assert "ks_test" in DetectorRegistry.list()
    assert "psi" in DetectorRegistry.list()
    assert "cbpe" in DetectorRegistry.list()
    assert "univariate" in LocalizerRegistry.list()


def test_ks_null_case(spark):
    # reference test_smoke.py:31-43 — same N(0,1) both sides => no drift
    np.random.seed(42)
    ref = _sds(spark, np.random.normal(0, 1, (500, 3)))
    test = _sds(spark, np.random.normal(0, 1, (500, 3)))
    result = KSTest(threshold=0.05).fit_detect(ref, test)
    assert result.drift_detected is False
    assert result.severity == DriftSeverity.NONE


def test_ks_alternative_case(spark):
    # reference test_smoke.py:46-57 — +2.0 mean shift => drift
    np.random.seed(42)
    ref = _sds(spark, np.random.normal(0, 1, (500, 3)))
    test = _sds(spark, np.random.normal(0, 1, (500, 3)) + 2.0)
    result = KSTest(threshold=0.05).fit_detect(ref, test)
    assert result.drift_detected is True
    assert result.severity == DriftSeverity.CRITICAL
    assert result.p_value < 0.05


def test_psi_detects_shift(spark):
    np.random.seed(42)
    ref = _sds(spark, np.random.normal(0, 1, (1000, 2)))
    test = _sds(spark, np.random.normal(1.0, 1, (1000, 2)))
    result = PSI(threshold=0.2).fit_detect(ref, test)
    assert result.drift_detected is True
    assert result.score >= 0.2


def test_psi_null_case(spark):
    np.random.seed(42)
    ref = _sds(spark, np.random.normal(0, 1, (1000, 2)))
    test = _sds(spark, np.random.normal(0, 1, (1000, 2)))
    result = PSI(threshold=0.2).fit_detect(ref, test)
    assert result.drift_detected is False


def test_pipeline_end_to_end(spark):
    # reference test_smoke.py:60-77 — N(0,1) vs +0.5, detection + localization
    np.random.seed(42)
    ref = _sds(spark, np.random.normal(0, 1, (300, 4)))
    test = _sds(spark, np.random.normal(0, 1, (300, 4)) + 0.5)
    pipeline = DriftPipeline(detector="ks_test", localizer="univariate")
    result = pipeline.run(ref, test)
    assert result.detection is not None
    assert result.localization is not None
    assert result.detection.drift_detected is True
    assert result.execution_time_seconds > 0
    d = result.to_dict()
    assert set(d) == {
        "detection",
        "localization",
        "rca",
        "execution_time_seconds",
        "metadata",
    }
    assert d["metadata"]["reference_samples"] == 300
    assert d["metadata"]["n_features"] == 4


def test_localizer_pinpoints_feature(spark):
    # reference test_smoke.py:80-96 — only feature_0 shifted by +1.5
    np.random.seed(42)
    ref_arr = np.random.normal(0, 1, (400, 3))
    test_arr = np.random.normal(0, 1, (400, 3))
    test_arr[:, 0] += 1.5
    ref = _sds(spark, ref_arr)
    test = _sds(spark, test_arr)
    loc = LocalizerRegistry.create("univariate", threshold=0.05).localize(ref, test)
    assert "feature_0" in loc.drifted_features
    assert loc.feature_drifts[0].feature_name == "feature_0"  # sorted by p-value


def test_localizer_holm_correction(spark):
    np.random.seed(42)
    ref_arr = np.random.normal(0, 1, (400, 4))
    test_arr = np.random.normal(0, 1, (400, 4))
    test_arr[:, 1] += 2.0
    ref = _sds(spark, ref_arr)
    test = _sds(spark, test_arr)
    loc = LocalizerRegistry.create("univariate", correction="holm").localize(ref, test)
    assert "feature_1" in loc.drifted_features
    assert loc.metadata["correction"] == "holm"


def test_cbpe_detects_confidence_shift(spark):
    rng = np.random.RandomState(42)
    ref_pdf = pd.DataFrame(
        {"f0": rng.normal(size=800), "proba": rng.beta(8, 2, 800)}
    )
    test_pdf = pd.DataFrame(
        {"f0": rng.normal(size=800), "proba": rng.beta(3, 3, 800)}
    )
    ref = SparkDataset(spark.createDataFrame(ref_pdf), proba_col="proba")
    test = SparkDataset(spark.createDataFrame(test_pdf), proba_col="proba")
    result = DetectorRegistry.create("cbpe").fit_detect(ref, test)
    assert result.drift_detected is True
    assert result.p_value < 0.05


def test_cbpe_null_and_oracle_bins(spark):
    rng = np.random.RandomState(42)
    proba = rng.beta(5, 2, 600)
    pdf = pd.DataFrame({"f0": rng.normal(size=600), "proba": proba})
    ds = SparkDataset(spark.createDataFrame(pdf), proba_col="proba")
    det = DetectorRegistry.create("cbpe")
    det.fit(ds)
    edges = np.linspace(0, 1, 11)
    expected = np.bincount(
        np.clip(np.digitize(proba, edges[:-1]) - 1, 0, 9), minlength=10
    )
    assert (det._reference_bins == expected).all()
    result = det.detect(ds)
    assert result.drift_detected is False
    assert result.metadata["confidence_shift"] == pytest.approx(
        abs(np.mean(proba) - np.dot(edges[:10], expected) / 600), abs=1e-9
    )


def test_validator_min_samples(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0]})
    ds = SparkDataset(spark.createDataFrame(pdf))
    from driftspark.validators import DataValidator

    with pytest.raises(ValueError, match="minimum 10"):
        DataValidator.validate_dataset(ds)


def test_validator_compatibility(spark):
    a = SparkDataset(spark.createDataFrame(pd.DataFrame({"x": range(20)})))
    b = SparkDataset(
        spark.createDataFrame(pd.DataFrame({"x": range(20), "y": range(20)}))
    )
    from driftspark.validators import DataValidator

    with pytest.raises(ValueError, match="Feature count mismatch"):
        DataValidator.validate_compatibility(a, b)


def test_slice_localizer(spark):
    """Slice localizer attributes drift to the right (slice, feature) cell."""
    rng = np.random.RandomState(42)
    ref_pdf = pd.DataFrame(
        {"x": rng.normal(0, 1, 2000), "y": rng.normal(0, 1, 2000),
         "source": rng.choice(["web", "books"], 2000)}
    )
    test_pdf = pd.DataFrame(
        {"x": rng.normal(0, 1, 2000), "y": rng.normal(0, 1, 2000),
         "source": rng.choice(["web", "books"], 2000)}
    )
    # only the 'web' slice drifts, and only on feature x
    test_pdf.loc[test_pdf["source"] == "web", "x"] += 2.0
    ref = SparkDataset(spark.createDataFrame(ref_pdf), metadata_cols=["source"])
    test = SparkDataset(spark.createDataFrame(test_pdf), metadata_cols=["source"])
    loc = LocalizerRegistry.create("slice", slice_col="source").localize(ref, test)
    sd = loc.slice_drifts
    assert set(sd) == {"web", "books"}
    assert sd["web"]["x"]["drift_detected"] is True
    assert sd["web"]["x"]["severity"] == "critical"
    assert sd["books"]["x"]["drift_detected"] is False
    assert sd["web"]["y"]["drift_detected"] is False
    assert sd["books"]["y"]["drift_detected"] is False
    # most-drifted cell ranked first
    assert loc.feature_drifts[0].feature_name == "x@web"
    d = loc.to_dict()
    assert d["slice_drifts"]["web"]["x"]["drift_detected"] is True


def test_permutation_importance_rca(spark):
    """Permutation RCA: the single shifted feature gets (nearly) all the
    held-out AUC drop; a stable feature's permutation barely matters."""
    import numpy as np
    import pandas as pd

    from driftspark import SparkDataset
    from driftspark.rca import PermutationImportanceRCA

    rng = np.random.RandomState(21)
    ref = pd.DataFrame({
        "shifted": rng.normal(0, 1, 4000),
        "stable": rng.normal(5, 2, 4000),
    })
    test = pd.DataFrame({
        "shifted": rng.normal(3, 1, 4000),
        "stable": rng.normal(5, 2, 4000),
    })
    r = PermutationImportanceRCA(n_estimators=20).analyze(
        SparkDataset(spark.createDataFrame(ref)),
        SparkDataset(spark.createDataFrame(test)),
    )
    assert r.metadata["base_auc"] > 0.9  # strongly separable
    drops = r.explanations["auc_drop"]
    assert drops["shifted"] > 0.2
    assert drops["shifted"] > 10 * max(drops["stable"], 1e-6)
    assert r.feature_importances["shifted"] > 0.9
    assert any("shifted" in rec for rec in r.recommendations)
