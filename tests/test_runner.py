"""One-call validation runner."""

import pytest
from pyspark.sql import functions as F

from driftspark.runner import run_validation
from driftspark.synth import (
    synth_dataset_dim,
    synth_image_pairs_wide,
    synth_image_table,
)


def test_run_validation_drifted_table(spark):
    img = synth_image_table(
        spark, 6000, n_parts=4, drift=True, with_bytes=False, num_partitions=4
    ).cache()
    pairs = synth_image_pairs_wide(spark, 300, corrupt_every=100, num_partitions=2)
    dim = synth_dataset_dim(spark)
    res = run_validation(img, pairs=pairs, parent=dim)
    assert res.n_images == 6000
    assert res.n_pairs == 300
    assert res.images_per_sec > 0
    # all four outputs materialized
    assert res.profile.count() == 4 * 4  # 4 parts x (3 numeric + 1 categorical)
    assert res.verdicts.count() == 4 * (3 + 2 + 1)  # psi x3 + ks x2 + chi2 x1
    assert res.uniqueness_violations.count() > 0  # injected dups
    assert res.referential_violations.count() > 0  # injected dangling fks
    assert res.payload_checks.where("NOT pixels_ok").count() == 3  # 300/100
    # drifted table with injected violations fails overall
    assert res.passed is False


def test_run_validation_clean_table_passes(spark):
    img = synth_image_table(
        spark,
        6000,
        n_parts=4,
        drift=False,
        with_bytes=False,
        dup_every=0,
        dangling_every=0,
        num_partitions=4,
    ).cache()
    dim = synth_dataset_dim(spark)
    # alpha=0.01: at the default 0.05 one chi2 cell sits at p=0.024 — the
    # expected multiple-testing false-positive rate of 24 uncorrected
    # checks, identical to the reference's per-check semantics
    res = run_validation(img, parent=dim, ks_threshold=0.01, chi2_threshold=0.01)
    assert res.verdicts.where("NOT passed").count() == 0
    assert res.uniqueness_violations.count() == 0
    assert res.referential_violations.count() == 0
    assert res.payload_checks is None
    assert res.passed is True


def test_run_validation_with_schema_and_expectations(spark):
    from driftspark.schema import IMAGE_TABLE_DDL, image_table_expectations

    img = synth_image_table(
        spark, 2000, n_parts=2, drift=False, with_bytes=False,
        dup_every=0, dangling_every=0, num_partitions=2,
    ).cache()
    res = run_validation(
        img,
        expected_schema=IMAGE_TABLE_DDL,
        expectations=[
            e for e in image_table_expectations() if "bytes" not in e.name
        ],
        ks_threshold=0.01,
        chi2_threshold=0.01,
    )
    assert res.schema_check.ok
    assert res.expectations.where("NOT passed").count() == 0
    assert res.passed is True
    # a broken schema fails the overall gate
    res2 = run_validation(
        img.drop("caption"), expected_schema=IMAGE_TABLE_DDL,
        ks_threshold=0.01, chi2_threshold=0.01,
    )
    assert res2.schema_check.ok is False
    assert res2.passed is False


def test_run_validation_contamination_pass(spark):
    from pyspark.sql import functions as F

    from driftspark.runner import run_validation
    from driftspark.synth import synth_image_table

    img = synth_image_table(spark, 1500, n_parts=4, drift=False, with_bytes=False)
    # "training corpus" = the test split's own phashes -> every test image
    # is an exact leak
    corpus = img.where("split = 'test'").select("image_id", "phash")
    res = run_validation(img, contamination_ref=corpus)
    n_test = img.where("split = 'test'").select("image_id").distinct().count()
    assert res.contamination.count() == n_test
    leaked = res.contamination.where("contaminated")
    assert leaked.count() == n_test  # exact-match path: complete recall
    assert leaked.where("min_hamming = 0").count() == n_test
    # a report, not a gate: contamination does not affect `passed`
    res_off = run_validation(img)
    assert res_off.contamination is None
    assert res.passed == res_off.passed
