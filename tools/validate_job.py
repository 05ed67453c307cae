"""Standalone validation job for spark-submit (north-rule submission path).

Usage:
  spark-submit --master local[N] --py-files driftspark.zip \
      tools/validate_job.py <images_parquet> <pairs_parquet>

Runs driftspark.runner.run_validation — per-partition column profile,
uniqueness + referential constraints, per-partition PSI/KS/chi2 drift
verdicts, and decoded-payload PSNR/caption checks — and prints one JSON
line with wall-clock and images/sec.
"""

import json
import os
import sys
import time

from pyspark.sql import SparkSession


def main():
    images_path, pairs_path = sys.argv[1], sys.argv[2]
    spark = (
        SparkSession.builder.appName("driftspark-validate")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from driftspark.runner import run_validation
    from driftspark.schema import (
        IMAGE_TABLE_DDL,
        expect_in,
        expect_not_null,
        expect_range,
        expect_regex,
    )

    img = spark.read.parquet(images_path)
    pairs = spark.read.parquet(pairs_path)
    aq = float(os.environ.get("VALIDATE_APPROX_QUANTILE", "0") or 0) or None

    res = run_validation(
        img,
        pairs=pairs,
        approx_quantile_error=aq,
        expected_schema=IMAGE_TABLE_DDL,
        expectations=[
            expect_not_null("image_id"),
            expect_regex("image_id", r"^img_[0-9]+$"),
            expect_in("fmt", ["png", "jpeg"]),
            expect_range("w", 1, 65536),
            expect_range("h", 1, 65536),
        ],
    )

    print(
        json.dumps(
            {
                "elapsed_sec": round(res.elapsed_sec, 3),
                "n_images": res.n_images,
                "n_pairs": res.n_pairs,
                "images_per_sec": round(res.images_per_sec, 1),
                "master": spark.sparkContext.master,
                "parallelism": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
