"""Schema conformance + row-level expectations."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from driftspark.schema import (
    IMAGE_TABLE_DDL,
    check_schema,
    expect_in,
    expect_not_null,
    expect_range,
    expect_regex,
    expectation_violations,
    image_table_expectations,
    run_expectations,
)
from driftspark.synth import synth_image_table


def test_check_schema_conforming(spark):
    t = synth_image_table(spark, 100, with_bytes=False, num_partitions=1)
    res = check_schema(t, IMAGE_TABLE_DDL)
    assert res.ok
    assert res.missing == [] and res.type_mismatches == {}
    # part/split/fk are extras, allowed in non-strict mode
    assert set(res.extra) == {"part", "split", "fk_dataset_id"}
    strict = check_schema(t, IMAGE_TABLE_DDL, strict=True)
    assert not strict.ok


def test_check_schema_mismatch(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"image_id": ["a"], "w": [1.5]})  # w double, not int
    )
    res = check_schema(df, IMAGE_TABLE_DDL)
    assert not res.ok
    assert "bytes" in res.missing
    assert "w" in res.type_mismatches
    assert res.type_mismatches["w"]["expected"] == "IntegerType()"


def test_run_expectations_counts(spark):
    pdf = pd.DataFrame(
        {
            "image_id": ["img_1", "img_2", "bad id", None],
            "w": [16, -4, 32, 64],
            "fmt": ["png", "jpeg", "gif", "png"],
            "part": [0, 0, 1, 1],
        }
    )
    df = spark.createDataFrame(pdf)
    exps = [
        expect_not_null("image_id"),
        expect_regex("image_id", r"^img_[0-9]+$"),
        expect_range("w", 1, 65536),
        expect_in("fmt", ["png", "jpeg"]),
    ]
    rep = {r["expectation"]: r for r in run_expectations(df, exps).collect()}
    assert rep["not_null(image_id)"]["n_violations"] == 1
    assert rep["regex(image_id)"]["n_violations"] == 2  # 'bad id' + NULL
    assert rep["range(w,[1,65536])"]["n_violations"] == 1
    assert rep["in(fmt)"]["n_violations"] == 1
    assert not rep["in(fmt)"]["passed"]
    # grouped variant
    by_part = run_expectations(df, exps, group_col="part").collect()
    assert len(by_part) == 2 * 4


def test_expectation_violation_rows(spark):
    pdf = pd.DataFrame(
        {
            "image_id": ["img_1", "bad", "img_3"],
            "w": [16, 16, -1],
            "fmt": ["png", "png", "png"],
        }
    )
    df = spark.createDataFrame(pdf)
    exps = [expect_regex("image_id", r"^img_[0-9]+$"), expect_range("w", 1, None)]
    rows = {
        r["image_id"]: list(r["failed_expectations"])
        for r in expectation_violations(df, exps, ["image_id"]).collect()
    }
    assert set(rows) == {"bad", "img_3"}
    assert rows["bad"] == ["regex(image_id)"]
    assert rows["img_3"] == ["range(w,[1,None])"]


def test_image_table_expectations_clean(spark):
    t = synth_image_table(spark, 500, with_bytes=True, num_partitions=2)
    rep = run_expectations(t, image_table_expectations())
    assert rep.where("NOT passed").count() == 0
