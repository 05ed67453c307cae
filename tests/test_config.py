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
