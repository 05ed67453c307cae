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


def test_from_json_and_orc_roundtrip(spark, tmp_path):
    """JSON-lines and ORC sources load into SparkDatasets with the same
    rows/roles as the parquet path."""
    import pandas as pd

    from driftspark.loaders import DataLoader

    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0], "y": [0.1, 0.2, 0.3], "label": [0, 1, 0]})
    df = spark.createDataFrame(pdf)
    jpath, opath = str(tmp_path / "j"), str(tmp_path / "o")
    df.coalesce(1).write.json(jpath)
    df.coalesce(1).write.orc(opath)

    dj = DataLoader.from_json(spark, jpath, target_col="label")
    do = DataLoader.from_orc(spark, opath, target_col="label")
    for ds in (dj, do):
        assert ds.df.count() == 3
        assert set(ds.numeric_features) == {"x", "y"}
        assert ds.target_col == "label"

    # config path accepts the new formats
    from driftspark.config import DataConfig, load_dataset

    cfg = DataConfig(
        reference_path=opath, test_path=jpath, format="orc", target_col="label"
    )
    ds2 = load_dataset(spark, cfg)
    assert ds2.df.count() == 3
    ds3 = load_dataset(
        spark,
        DataConfig(reference_path=jpath, test_path=jpath, format="json",
                   target_col="label"),
    )
    assert ds3.df.count() == 3
