"""Config schema, loader, and from-config pipeline construction."""

import numpy as np
import pandas as pd
import pytest

from driftspark.config import ConfigLoader, build_pipeline, load_dataset


YAML_TEXT = """
name: temporal_drift_monitoring
enable_localization: true
enable_rca: false
detector:
  type: ks_test
  threshold: 0.05
  params:
    correction: bonferroni
    aggregate_method: max
localizer:
  type: univariate
  params:
    threshold: 0.05
    correction: bonferroni
    top_k: 10
metadata:
  description: "example"
"""


def test_yaml_roundtrip_and_build(tmp_path, spark):
    p = tmp_path / "cfg.yaml"
    p.write_text(YAML_TEXT)
    cfg = ConfigLoader.from_yaml(p)
    assert cfg.name == "temporal_drift_monitoring"
    assert cfg.detector.type == "ks_test"
    assert cfg.detector.threshold == 0.05
    pipe = build_pipeline(cfg)
    assert pipe.detector.name == "ks_test"
    assert pipe.detector.correction == "bonferroni"
    assert pipe.localizer.top_k == 10

    rng = np.random.RandomState(42)
    from driftspark import SparkDataset

    ref = SparkDataset(spark.createDataFrame(pd.DataFrame(rng.normal(size=(100, 2)), columns=["a", "b"])))
    test = SparkDataset(spark.createDataFrame(pd.DataFrame(rng.normal(size=(100, 2)) + 2, columns=["a", "b"])))
    result = pipe.run(ref, test)
    assert result.detection.drift_detected is True


def test_invalid_configs():
    with pytest.raises(Exception):
        ConfigLoader.from_dict({"name": "x", "detector": {"type": "  "}})
    with pytest.raises(Exception):
        ConfigLoader.from_dict({"name": "x", "detector": {"type": "ks_test", "threshold": 2.0}})
    with pytest.raises(Exception):
        ConfigLoader.from_dict({"detector": {"type": "ks_test"}})  # missing name


def test_load_dataset_parquet(tmp_path, spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0], "b": ["x", "y"], "label": [0, 1]})
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(pdf).write.parquet(path)
    from driftspark.config import DataConfig

    dc = DataConfig(
        reference_path=path, test_path=path, format="parquet", target_col="label"
    )
    ds = load_dataset(spark, dc)
    assert set(ds.feature_names) == {"a", "b"}
    assert ds.target_col == "label"


REPO = "/root/repo"


def test_shipped_basic_config_end_to_end(spark):
    """The shipped example YAML loads, builds, reads its data block, and
    runs the full pipeline (a user's copyable starting point)."""
    cfg = ConfigLoader.from_yaml(f"{REPO}/configs/examples/basic_drift_detection.yaml")
    assert cfg.detector.type == "ks_test"
    pipe = build_pipeline(cfg)
    ref = load_dataset(spark, cfg.data, side="reference")
    test = load_dataset(spark, cfg.data, side="test")
    assert set(ref.numeric_features) == set(cfg.data.feature_cols)
    result = pipe.run(ref, test)
    # identical ref/test files: no drift, localization populated
    assert result.detection.drift_detected is False
    assert result.localization is not None
    d = result.to_dict()
    assert d["detection"]["detector_name"] == "ks_test"


def test_shipped_hallucination_config_builds(spark):
    cfg = ConfigLoader.from_yaml(
        f"{REPO}/configs/examples/hallucination_detection.yaml"
    )
    pipe = build_pipeline(cfg)
    assert pipe.detector.name == "hallucination_risk"
    assert pipe.detector.density_method == "mahalanobis"
    assert pipe.detector.confidence_threshold == 0.80


def test_hallucination_quickstart_demo(spark):
    """The quickstart demo runs end-to-end and actually separates the OOD
    block: high flag concentration in rows >= N_IN, out-dist scores far
    above in-dist."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "hallucination_demo", f"{REPO}/examples/quickstart/hallucination_demo.py"
    )
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)
    results = demo.main(spark)
    assert set(results) == {"mahalanobis", "knn", "isolation_forest", "kde"}
    res = results["mahalanobis"]
    flagged = res.rows.where("flagged").toPandas()
    # every confidently-far OOD row is flagged (total recall on the block),
    # flags concentrate there (precision bounded by the in-dist Gaussian
    # tail above 0.8 * p95), and scores separate the blocks sharply
    ood_flagged = (flagged["row_id"] >= demo.N_IN).sum()
    assert ood_flagged == demo.N_OOD
    assert (flagged["row_id"] >= demo.N_IN).mean() > 0.7
    in_rate = (len(flagged) - ood_flagged) / demo.N_IN
    assert in_rate < 0.2
    import pyspark.sql.functions as F

    means = {
        r["b"]: r["m"]
        for r in res.rows.groupBy(
            (F.col("row_id") >= demo.N_IN).alias("b")
        ).agg(F.mean("hallucination_score").alias("m")).collect()
    }
    assert means[True] > 1.5 * means[False]


def test_simple_quickstart_demo(spark):
    """The simple_example quickstart runs end-to-end: a 0.5 mean shift on
    every feature is detected and localized on all five features."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "simple_example", f"{REPO}/examples/quickstart/simple_example.py"
    )
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)
    result = demo.main(spark)
    assert result.detection.drift_detected is True
    assert result.detection.p_value < 0.001
    assert set(result.localization.drifted_features) == {
        f"feature_{i}" for i in range(demo.N_FEATURES)
    }
    assert result.metadata["detector"] == "ks_test"
