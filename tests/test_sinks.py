"""Result sinks + logging config."""

import numpy as np
import pandas as pd

from driftspark import DriftPipeline, SparkDataset
from driftspark.logging_config import get_logger, setup_logging
from driftspark.sinks import read_results_json, write_results_json, write_table


def test_results_json_roundtrip(tmp_path, spark):
    rng = np.random.RandomState(42)
    ref = SparkDataset(spark.createDataFrame(pd.DataFrame(rng.normal(size=(100, 2)), columns=["a", "b"])))
    test = SparkDataset(spark.createDataFrame(pd.DataFrame(rng.normal(size=(100, 2)) + 1, columns=["a", "b"])))
    res = DriftPipeline(detector="psi", localizer="univariate").run(ref, test)
    path = tmp_path / "results.json"
    write_results_json({"2024": res}, path)
    back = read_results_json(path)
    # exact reference to_dict() key layout survives the JSON roundtrip
    assert set(back["2024"]) == {
        "detection",
        "localization",
        "rca",
        "execution_time_seconds",
        "metadata",
    }
    assert back["2024"]["detection"]["detector_name"] == "psi"
    assert back["2024"]["detection"]["severity"] in (
        "none",
        "low",
        "medium",
        "high",
        "critical",
    )


def test_write_table_parquet(tmp_path, spark):
    df = spark.createDataFrame(pd.DataFrame({"part": [0, 1], "passed": [True, False]}))
    target = str(tmp_path / "verdicts")
    write_table(df, target, mode="overwrite", partition_by=["part"])
    back = spark.read.parquet(target)
    assert back.count() == 2
    assert set(back.columns) == {"part", "passed"}


def test_logging_setup():
    logger = setup_logging()
    assert logger.name == "driftspark"
    child = get_logger("verdicts")
    assert child.name == "driftspark.verdicts"
