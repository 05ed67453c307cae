"""DataLoader API parity (reference data/loaders.py:13-80)."""

import pandas as pd

from driftspark import DataLoader


def test_from_csv(tmp_path, spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": ["x", "y", "z"], "label": [0, 1, 0]})
    path = tmp_path / "data.csv"
    pdf.to_csv(path, index=False)
    ds = DataLoader.from_csv(spark, path, target_col="label")
    assert set(ds.feature_names) == {"a", "b"}
    assert ds.n_samples == 3
    assert ds.numeric_features == ["a"]


def test_from_parquet(tmp_path, spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0], "m": ["g1", "g2"]})
    path = str(tmp_path / "data.parquet")
    spark.createDataFrame(pdf).write.parquet(path)
    ds = DataLoader.from_parquet(spark, path, metadata_cols=["m"])
    assert ds.feature_names == ["a"]
    assert ds.metadata_cols == ["m"]
