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

    import os as _os
    import sys as _sys
    from concurrent.futures import ThreadPoolExecutor

    aq = float(_os.environ.get("VALIDATE_APPROX_QUANTILE", "0") or 0) or None
    marks = {}
    t0 = time.time()

    def timed(name, fn):
        s = time.time()
        r = fn()
        marks[name] = round(time.time() - s, 1)
        return r

    def pass_profile():
        return timed(
            "profile",
            lambda: profile_columns(
                img, columns=["w", "h", "phash", "fmt", "caption"], group_cols=["part"]
            ).count(),
        )

    def pass_uniqueness():
        return timed(
            "uniqueness",
            lambda: uniqueness_report(img, ["image_id", "split"]).count(),
        )

    def pass_verdicts():
        # KS runs on the genuine numeric axes; phash (a 64-bit hash) drift
        # is caught by its quantile-bin PSI — KS on hash noise has no
        # statistical meaning
        return timed(
            "verdicts",
            lambda: partition_verdicts(
                img,
                numeric_cols=["w", "h", "phash"],
                cat_cols=["fmt"],
                approx_quantile_error=aq,
                ks_cols=["w", "h"],
            ).count(),
        )

    def pass_payload():
        def run():
            if paired_layout:
                return validate_image_payloads_paired(pairs).count()
            return validate_image_payloads(
                pairs.where(F.col("split") == "ref"),
                pairs.where(F.col("split") == "test"),
            ).count()

        return timed("payload", run)

    # the four validation passes are independent — run them concurrently so
    # Spark interleaves their stages (overlaps per-job scheduling latency)
    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = [
            pool.submit(pass_profile),
            pool.submit(pass_uniqueness),
            pool.submit(pass_verdicts),
            pool.submit(pass_payload),
        ]
        results = [f.result() for f in futs]
    n_pairs = results[3]
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
