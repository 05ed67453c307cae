"""Dedup-path skew stress: one over-cap identical-content mega-cluster
mixed with a hot near-dup template mass and unique filler.

Asserts (a) pair completeness — the mega-cluster's min-id star pairs are
all present at every layout, (b) layout invariance — the candidate-pair
multiset is identical across natural / hash-clustered / round-robin
physical layouts, and (c) task balance — no post-shuffle task receives
the hot cluster's raw volume (REST API per-stage task summaries, the
test_skew.py convention).

Runs in a SUBPROCESS because the shared session fixture disables the UI.
"""

import subprocess
import sys
import textwrap


def test_lsh_pairs_under_mega_cluster_and_hot_skew():
    script = textwrap.dedent(
        """
        import json, urllib.request
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import functions as F
        from driftspark.session import get_spark
        from driftspark.dedup import lsh_candidate_pairs, minhash_signatures

        spark = get_spark(
            app_name="driftspark-dedup-skew",
            master="local[4]",
            shuffle_partitions=8,
            extra_conf={"spark.ui.enabled": "true"},
        )
        spark.sparkContext.setLogLevel("ERROR")

        docs = []
        # one identical-content mega-cluster: 600 docs >> cap 200 — every
        # band bucket saturates, pairs must come from the star pass
        for i in range(600):
            docs.append((i, "identical boilerplate body repeated verbatim"))
        # hot template mass: 3000 docs sharing 19 of 20 tokens (~90% of
        # the near-dup volume).  7 variants -> ~428 identical docs per
        # variant, each an over-cap full-signature cluster (star pairs),
        # while the shared base tokens make CROSS-variant band buckets
        # thousands deep (the hot-bucket cap must drop those without
        # losing within-cluster connectivity)
        base = [f"tw{t}" for t in range(19)]
        for i in range(3000):
            docs.append((10_000 + i, " ".join(base + [f"var{i % 7}"])))
        # unique filler
        for i in range(1400):
            docs.append((100_000 + i, f"unique u{i}a u{i}b u{i}c u{i}d u{i}e"))
        df = spark.createDataFrame(docs, "doc_id long, text string")

        def run(frame):
            sigs = minhash_signatures(frame, "doc_id", "text", n_hashes=16)
            pairs = lsh_candidate_pairs(
                sigs, n_hashes=16, bands=4, max_bucket_size=200
            ).collect()
            return sorted((r["id_a"], r["id_b"]) for r in pairs)

        p_nat = run(df)
        p_clustered = run(df.repartition(16, "text"))
        p_rr = run(df.repartition(40))
        assert p_nat == p_clustered == p_rr, "pairs must be layout-invariant"

        got = set(p_nat)
        # mega-cluster completeness: full min-id star present
        assert {(0, i) for i in range(1, 600)} <= got
        # template mass connectivity: every template doc pairs with at
        # least one other (identical-signature stars + banded pairs)
        template_ids = set(range(10_000, 13_000))
        touched = {a for a, b in got if a in template_ids}
        touched |= {b for a, b in got if b in template_ids}
        assert touched == template_ids
        # filler stays pair-free (no spurious pairs from hot buckets)
        assert not any(a >= 100_000 or b >= 100_000 for a, b in got)

        # task balance: slowest task within 4x median (+1s slack)
        app_id = spark.sparkContext.applicationId
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
                continue
            judged += 1
            assert mx <= 4 * med + 1000, (
                f"stage {st['stageId']} ({st['name']}): max task "
                f"{mx:.0f}ms vs median {med:.0f}ms"
            )
        print("DEDUP_SKEW_OK judged_stages=", judged)
        spark.stop()
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=420
    )
    assert "DEDUP_SKEW_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-3000:]


def test_contamination_under_boilerplate_skew():
    """A boilerplate gram shared by EVERY test doc is the contamination
    join's hot key: the report must stay correct and layout-invariant
    (AQE splits the skewed sort-merge side; correctness must not depend
    on the physical layout)."""
    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import functions as F
        from driftspark.session import get_spark
        from driftspark.dedup import contamination_report

        spark = get_spark(app_name="driftspark-contam-skew", master="local[4]",
                          shuffle_partitions=16)
        spark.sparkContext.setLogLevel("ERROR")
        BOILER = "terms of service apply to all content provided herein"
        # 3000 test docs: every one carries the 9-word boilerplate (one
        # shared 8-gram window per position) + unique tail; 500 of them
        # are exact copies of ref docs
        test_rows = [
            (i, BOILER + " " + " ".join(f"t{i}w{j}" for j in range(8)))
            for i in range(3000)
        ]
        ref_rows = [
            (10_000 + i, BOILER + " " + " ".join(f"r{i}w{j}" for j in range(8)))
            for i in range(2000)
        ] + [(20_000 + i, test_rows[i][1]) for i in range(500)]  # leaks
        test = spark.createDataFrame(test_rows, "doc_id long, text string")
        ref = spark.createDataFrame(ref_rows, "doc_id long, text string")

        def run(t, r):
            return sorted(map(tuple, contamination_report(
                t, r, "doc_id", "text", n=8, threshold=0.9).collect()))

        base = run(test, ref)
        relaid = run(test.repartition(3), ref.repartition(17, "doc_id"))
        assert relaid == base, "layout changed the report"
        flagged = [r for r in base if r[4]]
        assert len(flagged) == 500, f"expected the 500 leaks, got {len(flagged)}"
        # every doc shares the boilerplate grams -> nonzero hits everywhere
        assert all(r[2] > 0 for r in base)
        # non-leaked docs: only the boilerplate grams hit, rate well under 0.9
        clean = [r for r in base if not r[4]]
        assert all(r[3] < 0.5 for r in clean)
        print("CONTAM_SKEW_OK")
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=420,
    )
    assert "CONTAM_SKEW_OK" in proc.stdout, proc.stdout[-2000:] + proc.stderr[-2000:]
