"""Standalone validation job for spark-submit (north-rule submission path).

Usage:
  spark-submit --master local[N] --py-files driftspark.zip \
      tools/validate_job.py <images_parquet> <pairs_parquet>

Runs the full validated-images pass — per-partition column profile,
uniqueness + referential constraints, per-partition PSI/KS/chi2 drift
verdicts, and decoded-payload PSNR/caption checks — and prints one JSON
line with wall-clock and images/sec.
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    images_path, pairs_path = sys.argv[1], sys.argv[2]
    spark = (
        SparkSession.builder.appName("driftspark-validate")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from driftspark.constraints import uniqueness_report
    from driftspark.imageops import (
        validate_image_payloads,
        validate_image_payloads_paired,
    )
    from driftspark.profile import profile_columns
    from driftspark.verdicts import partition_verdicts

    img = spark.read.parquet(images_path)
    pairs = spark.read.parquet(pairs_path)
    paired_layout = "ref_bytes" in pairs.columns  # co-located pairs table
    n_images = img.count()

    import sys as _sys

    t0 = time.time()
    marks = {}
    profile_columns(img, columns=["w", "h", "phash", "fmt", "caption"], group_cols=["part"]).count()
    marks["profile"] = round(time.time() - t0, 1)
    uniqueness_report(img, ["image_id", "split"]).count()
    marks["uniqueness"] = round(time.time() - t0, 1)
    import os as _os

    aq = float(_os.environ.get("VALIDATE_APPROX_QUANTILE", "0") or 0) or None
    # KS runs on the genuine numeric axes; phash (a 64-bit hash) drifts are
    # caught by its quantile-bin PSI / prefix histogram, where KS on hash
    # noise has no statistical meaning
    partition_verdicts(
        img,
        numeric_cols=["w", "h", "phash"],
        cat_cols=["fmt"],
        approx_quantile_error=aq,
        ks_cols=["w", "h"],
    ).count()
    marks["verdicts"] = round(time.time() - t0, 1)
    if paired_layout:
        n_pairs = validate_image_payloads_paired(pairs).count()
    else:
        n_pairs = validate_image_payloads(
            pairs.where(F.col("split") == "ref"), pairs.where(F.col("split") == "test")
        ).count()
    marks["payload"] = round(time.time() - t0, 1)
    print("marks:", marks, file=_sys.stderr, flush=True)
    dt = time.time() - t0

    total = n_images + n_pairs
    print(
        json.dumps(
            {
                "elapsed_sec": round(dt, 3),
                "n_images": n_images,
                "n_pairs": n_pairs,
                "images_per_sec": round(total / dt, 1),
                "master": spark.sparkContext.master,
                "parallelism": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
