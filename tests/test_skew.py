"""Partition-skew stress: one part id holding ~90% of rows.

The verdict suite must (a) produce bit-identical verdicts regardless of
the physical layout of the same logical rows — every statistic derives
from integer count aggregates, so float-sum order can't leak in — and
(b) stay balanced at the task level: map-side partial aggregation means
no post-shuffle task receives the hot part's raw row volume, which we
assert from the Spark REST API's per-stage task summaries.

Runs in a SUBPROCESS because the shared session fixture disables the UI
(the REST API is the only post-hoc source of per-task runtimes).
"""

import subprocess
import sys
import textwrap


def test_partition_verdicts_under_90pct_part_skew():
    script = textwrap.dedent(
        """
        import json, urllib.request
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import functions as F
        from driftspark.session import get_spark
        from driftspark.verdicts import partition_verdicts

        spark = get_spark(
            app_name="driftspark-skew",
            master="local[4]",
            shuffle_partitions=8,
            extra_conf={"spark.ui.enabled": "true"},
        )
        spark.sparkContext.setLogLevel("ERROR")

        # deterministic skewed table: part 'hot' holds ~90% of test rows
        n = 400_000
        def h(k):
            return F.abs(F.xxhash64("id", F.lit(k)))
        base = spark.range(n).select(
            F.when(h(1) % 2 == 0, "ref").otherwise("test").alias("split"),
            F.when(h(2) % 10 < 9, "hot")
             .otherwise((h(3) % 9).cast("string")).alias("part"),
            (h(4) % 1000 / 10.0).alias("x"),
            (h(5) % 500).cast("double").alias("y"),
            F.when(h(6) % 3 == 0, "A").when(h(6) % 3 == 1, "B")
             .otherwise("C").alias("cat"),
        )

        def run(df):
            rows = partition_verdicts(
                df, numeric_cols=["x", "y"], cat_cols=["cat"],
                ks_cols=["x", "y"],
            ).collect()
            return sorted(
                (r["part"], r["feature"], r["check"], r["statistic"],
                 r["n_ref"], r["n_test"])
                for r in rows
            )

        # three physical layouts of the SAME logical rows: natural range
        # partitions, hash-clustered by part (maximal physical skew), and
        # round-robin
        v_natural = run(base)
        v_clustered = run(base.repartition(16, "part"))
        v_roundrobin = run(base.repartition(50))
        assert v_natural == v_clustered == v_roundrobin, (
            "verdicts must not depend on physical layout"
        )
        hot = [r for r in v_natural if r[0] == "hot"]
        assert len(hot) == 5  # 2 psi + 2 ks + 1 chi2
        assert all(r[5] > 150_000 for r in hot)

        # task-balance: for every completed stage with enough tasks to
        # judge, the slowest task must be within 4x the median (+1s GC
        # slack) — the hot part's rows never funnel into one task
        app_id = spark.sparkContext.applicationId
        # read the BOUND port from the context (Spark retries upward on
        # collision, so a hard-coded port would query the wrong app)
        api = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{app_id}"
        stages = json.load(urllib.request.urlopen(f"{api}/stages?status=COMPLETE"))
        judged = 0
        for st in stages:
            if st.get("numCompleteTasks", 0) < 8:
                continue
            q = json.load(urllib.request.urlopen(
                f"{api}/stages/{st['stageId']}/{st['attemptId']}/taskSummary"
                "?quantiles=0.5,1.0"
            ))
            med, mx = q["executorRunTime"]
            if med < 100:
                continue  # sub-100ms medians are scheduler noise
            judged += 1
            assert mx <= 4 * med + 1000, (
                f"stage {st['stageId']} ({st['name']}): max task "
                f"{mx:.0f}ms vs median {med:.0f}ms"
            )
        print("SKEW_OK judged_stages=", judged)
        spark.stop()
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=420
    )
    assert "SKEW_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-3000:]
