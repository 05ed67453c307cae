"""Output-schema parity against the reference's committed golden results
(FIXTURES.md F4): our PipelineResult.to_dict() JSON must be structurally
identical to the blocks in
/root/reference/outputs/folktables_drift_results.json."""

import json

import numpy as np
import pandas as pd
import pytest

from driftspark import DriftPipeline, SparkDataset

GOLDEN = "/root/reference/outputs/folktables_drift_results.json"
FOLKTABLES_COLS = [
    "AGEP", "COW", "SCHL", "MAR", "OCCP", "POBP", "RELP", "WKHP", "SEX", "RAC1P",
]


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def ours(spark):
    """Run KS + localizer on a folktables-shaped frame (10 numeric cols)."""
    rng = np.random.RandomState(42)
    ref_pdf = pd.DataFrame(
        rng.normal(size=(2000, 10)) * [40, 3, 8, 2, 2000, 100, 5, 15, 1, 3],
        columns=FOLKTABLES_COLS,
    )
    test_pdf = ref_pdf + rng.normal(size=(2000, 10)) * 0.2
    test_pdf["AGEP"] += 5.0
    ref = SparkDataset(spark.createDataFrame(ref_pdf))
    test = SparkDataset(spark.createDataFrame(test_pdf))
    pipe = DriftPipeline(
        detector=__import__("driftspark.detectors", fromlist=["KSTest"]).KSTest(
            threshold=0.005, correction="bonferroni"
        ),
        localizer="univariate",
    )
    return pipe.run(ref, test).to_dict()


def _shape(obj, depth=0):
    """Recursive key structure, treating dict leaves of numbers as values."""
    if isinstance(obj, dict):
        return {k: _shape(v, depth + 1) for k, v in obj.items()}
    if isinstance(obj, list):
        return "list"
    return type(obj).__name__ if obj is not None else "none"


def test_detection_block_keys_match_golden(golden, ours):
    g = golden["2015"]["pipelines"]["KS Test"]["detection"]
    o = ours["detection"]
    assert set(o) == set(g)
    # metadata block keys too
    assert set(o["metadata"]) == set(g["metadata"])
    # per-feature results have the same inner keys
    g_feat = next(iter(g["metadata"]["feature_results"].values()))
    o_feat = next(iter(o["metadata"]["feature_results"].values()))
    assert set(o_feat) == set(g_feat)
    # value types line up
    for k in ("detector_name", "drift_detected", "severity", "score", "threshold"):
        assert type(o[k]) is type(g[k]), k


def test_localization_block_keys_match_golden(golden, ours):
    g = golden["2015"]["pipelines"]["KS Test"]["localization"]
    o = ours["localization"]
    assert set(o) == set(g)
    g_fd = g["feature_drifts"][0]
    o_fd = o["feature_drifts"][0]
    assert set(o_fd) == set(g_fd)
    assert set(o["metadata"]) == set(g["metadata"])
    assert o["method_name"] == g["method_name"] == "univariate"


def test_pipeline_block_keys_match_golden(golden, ours):
    g = golden["2015"]["pipelines"]["KS Test"]
    assert set(ours) == set(g)
    assert set(ours["metadata"]) == set(g["metadata"])
    # severity vocabulary identical
    sevs = {
        fd["severity"]
        for year in golden.values()
        for p in year["pipelines"].values()
        if p.get("localization")
        for fd in p["localization"]["feature_drifts"]
    }
    assert {ours["detection"]["severity"]} <= {"none", "low", "medium", "high", "critical"}
    assert sevs <= {"none", "low", "medium", "high", "critical"}


def test_psi_block_matches_golden_shape(golden, spark, ours):
    g = golden["2015"]["pipelines"]["PSI"]["detection"]
    rng = np.random.RandomState(1)
    ref = SparkDataset(spark.createDataFrame(pd.DataFrame(rng.normal(size=(500, 3)), columns=list("abc"))))
    test = SparkDataset(spark.createDataFrame(pd.DataFrame(rng.normal(size=(500, 3)), columns=list("abc"))))
    o = DriftPipeline(detector="psi", enable_localization=False).run(ref, test).to_dict()["detection"]
    assert set(o) == set(g)
    assert set(o["metadata"]) == set(g["metadata"])
    g_feat = next(iter(g["metadata"]["feature_results"].values()))
    o_feat = next(iter(o["metadata"]["feature_results"].values()))
    assert set(o_feat) == set(g_feat)  # {"psi", "n_bins"}
