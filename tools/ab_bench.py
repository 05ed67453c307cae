"""Interleaved cross-engine A/B for disputed bench deltas.

CLAUDE.md host-drift rule: an apparent regression between rounds is not
believable without alternating runs of BOTH engine versions on the SAME
data in ONE time window (r3 precedent: a +24% "regression" was pure host
drift; same-engine swings hit 2.6x in minutes).

Usage (one invocation = one engine, one best-of-N measurement):
    python tools/ab_bench.py <engine_repo_root> minhash_lsh,image_validation

Shared inputs so both engines time the same bytes:
  - $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) for documents
  - $AB_IMG_DIR: pre-materialized {images,pairs} parquet (generate ONCE
    with whichever engine, outside the timed region)

Prints one JSON line {"engine": ..., "queries": {...}}.  The driver loop
(tools/ab_run.sh or inline) alternates A/B/A/B and compares per-engine
best-of-bests — mirroring bench.py's best-of-N steady-state estimator.
"""

from __future__ import annotations

import json
import os
import sys
import time

ENGINE = os.path.abspath(sys.argv[1])
QUERIES = sys.argv[2].split(",") if len(sys.argv) > 2 else [
    "minhash_lsh", "image_validation",
]
sys.path.insert(0, ENGINE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
IMG_DIR = os.environ.get("AB_IMG_DIR")
REPEATS = int(os.environ.get("AB_REPEATS", "3"))


def _timed(q, name, fn):
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    q[name] = round(best, 3)


def main():
    from driftspark.session import get_spark

    spark = get_spark(app_name="ab-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    q = {}

    if "minhash_lsh" in QUERIES:
        from pyspark.sql import functions as F

        from driftspark.dedup import minhash_near_duplicates

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        docs.count()  # scan warmup (page cache + footers), as bench.py
        # codegen warmup on a tiny slice so cold Janino is not billed
        minhash_near_duplicates(docs.limit(500), "doc_id", "text").count()
        _timed(
            q, "minhash_lsh",
            lambda: minhash_near_duplicates(docs, "doc_id", "text").count(),
        )

    if "domain_classifier" in QUERIES:
        from pyspark.sql import functions as F

        from driftspark.dataset import SparkDataset
        from driftspark.detectors import DomainClassifier

        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        num_feats = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        li.select(*[F.count(c) for c in num_feats + ["l_returnflag"]]).collect()
        sref = SparkDataset(
            li.where(F.col("l_orderkey") % 2 == 0).select(*num_feats, "l_returnflag")
        )
        stest = SparkDataset(
            li.where(F.col("l_orderkey") % 2 == 1).select(*num_feats, "l_returnflag")
        )

        def dc():
            DomainClassifier(
                n_estimators=50, use_cross_val=False, max_samples_per_side=100_000
            ).fit_detect(sref, stest)

        dc()  # codegen/ml warmup, as bench.py's tiny-run warmup
        _timed(q, "domain_classifier", dc)

    if "image_validation" in QUERIES:
        from driftspark.constraints import uniqueness_report
        from driftspark.imageops import validate_image_payloads_paired
        from driftspark.verdicts import partition_verdicts as pv

        img = spark.read.parquet(f"{IMG_DIR}/images")
        pairs = spark.read.parquet(f"{IMG_DIR}/pairs")
        img.count()
        pairs.count()

        def validation_pass():
            uniqueness_report(img, ["image_id", "split"]).collect()
            pv(
                img,
                numeric_cols=["w", "h", "phash"],
                cat_cols=["fmt"],
                ks_cols=["w", "h"],
                ks_preaggregate=True,
            ).count()
            validate_image_payloads_paired(
                pairs, max_parallelism=min(int(CPUS), 8)
            ).count()

        validation_pass()  # warmup run (steady-state, as bench.py)
        _timed(q, "image_validation", validation_pass)

    print(json.dumps({"engine": ENGINE, "queries": q}))


if __name__ == "__main__":
    main()
