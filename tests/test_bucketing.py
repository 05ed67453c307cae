"""Bucketed co-location: shuffle-free payload-validation join.

Runs in a SUBPROCESS because the Hive catalog must be configured at JVM
context creation (the shared session fixture uses the in-memory catalog).
"""

import subprocess
import sys
import textwrap


def test_bucketed_join_no_shuffle_and_validation():
    script = textwrap.dedent(
        """
        import sys, tempfile, shutil
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import functions as F
        from driftspark.bucketing import (
            colocated_join, hive_enabled_session, validate_image_payloads_bucketed,
            write_bucketed,
        )
        from driftspark.synth import synth_image_pairs

        tmp = tempfile.mkdtemp()
        spark = hive_enabled_session(tmp, master="local[4]", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        # disable broadcast so the join strategy decision is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        pairs = synth_image_pairs(spark, 500, corrupt_every=100, num_partitions=4)
        write_bucketed(pairs.where("split='ref'"), "ref_images", "image_id", 8)
        write_bucketed(pairs.where("split='test'"), "test_images", "image_id", 8)

        j = colocated_join(spark, "ref_images", "test_images", "image_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:500]
        assert "Exchange" not in plan, "bucketed join must not shuffle"

        checks = validate_image_payloads_bucketed(spark, "ref_images", "test_images")
        pdf = checks.toPandas()
        assert len(pdf) == 500
        bad = set(pdf[~pdf["pixels_ok"]]["image_id"])
        expected = {f"img_{p:010d}" for p in range(500) if p % 100 == 99}
        assert bad == expected, (bad, expected)
        vplan = checks._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in vplan.split("MapInPandas")[-1], "no shuffle below the decode"

        # the auto front door must detect the bucket specs and take the
        # same zero-Exchange route when given the table names
        from driftspark.imageops import validate_image_payloads_auto
        auto = validate_image_payloads_auto(
            "ref_images", "test_images", spark=spark
        )
        aplan = auto._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan, "auto must dispatch to the bucketed join"
        assert auto.count() == 500
        print("BUCKETED_OK")
        spark.stop(); shutil.rmtree(tmp, ignore_errors=True)
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=420
    )
    assert "BUCKETED_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
