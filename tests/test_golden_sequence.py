"""End-to-end golden-SEQUENCE parity (VERDICT r01 next-round #9): the
yearly demo loop (examples/drift_sequence_demo.py, mirroring reference
folktables_demo.py:119-196) emits the reference's exact
``{year: {actual_accuracy, accuracy_drop, pipelines: {...}}}`` JSON
layout; this test runs it on a small workload and validates the year
blocks, every pipeline's verdict/severity fields, and structural equality
with the reference's committed golden JSON."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN = "/root/reference/outputs/folktables_drift_results.json"
SEVERITIES = {"none", "low", "medium", "high", "critical"}


@pytest.fixture(scope="module")
def emitted(spark, tmp_path_factory):
    from examples.drift_sequence_demo import run_demo

    out = str(tmp_path_factory.mktemp("seq") / "drift_sequence_results.json")
    run_demo(spark, out, n_rows=4000, years=(2015, 2016))
    with open(out) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


def test_two_batches_four_detectors(emitted):
    assert set(emitted) == {"2015", "2016"}
    for block in emitted.values():
        assert set(block["pipelines"]) == {"KS Test", "PSI", "MMD", "CBPE"}


def test_year_block_layout_matches_golden(emitted, golden):
    g_year = golden["2015"]
    for block in emitted.values():
        assert set(block) == set(g_year)  # actual_accuracy/accuracy_drop/pipelines
        assert isinstance(block["actual_accuracy"], float)
        assert isinstance(block["accuracy_drop"], float)


def test_verdict_and_severity_fields_every_pipeline(emitted):
    for year, block in emitted.items():
        for name, res in block["pipelines"].items():
            det = res["detection"]
            assert isinstance(det["drift_detected"], bool), (year, name)
            assert det["severity"] in SEVERITIES, (year, name)
            assert isinstance(det["score"], float)
            assert isinstance(det["threshold"], float)
            assert res["execution_time_seconds"] > 0
            loc = res["localization"]
            assert isinstance(loc["drifted_features"], list)
            assert set(loc["drift_scores"]) >= set(loc["drifted_features"])


def test_detection_keys_match_golden_blocks(emitted, golden):
    for name in ("KS Test", "PSI", "MMD", "CBPE"):
        g = golden["2015"]["pipelines"][name]["detection"]
        o = emitted["2015"]["pipelines"][name]["detection"]
        assert set(o) == set(g), name


def test_drift_sequence_is_detected(emitted):
    """The engineered covariate shift grows with year: KS must flag both
    years, CBPE must flag the confidence shift, and accuracy must drop
    more in 2016 than in 2015."""
    for year in ("2015", "2016"):
        assert emitted[year]["pipelines"]["KS Test"]["detection"]["drift_detected"]
        assert emitted[year]["pipelines"]["CBPE"]["detection"]["drift_detected"]
    assert emitted["2016"]["accuracy_drop"] < emitted["2015"]["accuracy_drop"] < 0


def test_committed_demo_output_exists_and_matches_layout(golden):
    """The repo commits one full-size emitted run (outputs/...) — the
    artifact a reference user would diff against their golden file."""
    path = os.path.join(os.path.dirname(__file__), "..", "outputs",
                        "drift_sequence_results.json")
    with open(path) as f:
        committed = json.load(f)
    assert len(committed) >= 3
    for year, block in committed.items():
        assert set(block) == set(golden["2015"])
        for res in block["pipelines"].values():
            assert res["detection"]["severity"] in SEVERITIES
