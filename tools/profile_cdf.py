"""Phase profiler for the CDF-family detectors (ks/cvm/w1) — guide §1.

Times each internal phase of cvm_ad_all / ks_d_all on the bench split so
the optimization targets the real cost, not a guess.  Pure measurement —
never run by bench.py or the driver.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def t(label, fn, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label:55s} {best:7.3f}s")
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from driftspark.session import get_spark
    from driftspark.stats import _melt, _w1_term_quantized, _cvm_ad_terms

    spark = get_spark(app_name="profile-cdf", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li.count()
    ref = li.where(F.col("l_orderkey") % 2 == 0)
    test = li.where(F.col("l_orderkey") % 2 == 1)
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

    # warmup codegen families
    from pyspark.sql import Window
    warm = spark.range(1000).withColumn("v", (F.col("id") % 7).cast("double"))
    warm.select(F.explode(F.array(F.struct(F.lit("a").alias("f"), F.col("v").alias("x")))).alias("s")) \
        .groupBy("s.f").agg(F.sum("s.x")).collect()
    warm.select(F.sum("v").over(Window.partitionBy(F.col("id") % 3).orderBy("id"))).collect()

    def build_u():
        return _melt(ref, cols).withColumn("r", F.lit(1)).withColumn("t", F.lit(0)).unionByName(
            _melt(test, cols).withColumn("r", F.lit(0)).withColumn("t", F.lit(1))
        )

    def build_g():
        return build_u().groupBy("feature", "value").agg(
            F.sum("r").alias("r"), F.sum("t").alias("t")
        )

    t("melt+union (noop)", lambda: noop(build_u()))
    t("melt+union+groupBy g (noop)", lambda: noop(build_g()))

    # light pre-scan alternative for totals: per-column counts, no explode
    def light_totals():
        aggs = []
        for c in cols:
            v = F.col(c).cast("double")
            nn = F.when(~F.isnan(v), v)
            aggs.append(F.count(nn).alias(f"{c}__n"))
            aggs.append(F.approx_count_distinct(nn).alias(f"{c}__nd"))
        u = ref.select(*cols).withColumn("__s", F.lit(0)).unionByName(
            test.select(*cols).withColumn("__s", F.lit(1)))
        u.groupBy("__s").agg(*aggs).collect()

    t("light totals (no explode, counts+approxnd)", light_totals)

    # current shape: persist g, totals collect, then window+agg
    def current_cvm():
        g = build_g().persist()
        try:
            g.groupBy("feature").agg(
                F.count(F.lit(1)).alias("nd"),
                F.sum("r").alias("n"), F.sum("t").alias("t"),
            ).collect()
            w_cum = (
                Window.partitionBy("feature").orderBy("value")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            w_all = Window.partitionBy("feature")
            cvm, ad = _cvm_ad_terms(
                F.sum("r").over(w_cum), F.sum("t").over(w_cum),
                F.col("r"), F.col("t"),
                F.sum("r").over(w_all), F.sum("t").over(w_all), 18,
            )
            g.select("feature", cvm.alias("cvm"), ad.alias("ad")).groupBy(
                "feature").agg(
                F.sum("cvm").cast("double").alias("cvm"),
                F.sum("ad").cast("double").alias("ad")).collect()
        finally:
            g.unpersist()

    t("CURRENT cvm (persist+totals+window)", current_cvm)

    # fused: one action, no persist, window terms summed directly
    def fused_cvm():
        g = build_g()
        w_cum = (
            Window.partitionBy("feature").orderBy("value")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_all = Window.partitionBy("feature")
        cvm, ad = _cvm_ad_terms(
            F.sum("r").over(w_cum), F.sum("t").over(w_cum),
            F.col("r"), F.col("t"),
            F.sum("r").over(w_all), F.sum("t").over(w_all), 18,
        )
        g.select("feature", cvm.alias("cvm"), ad.alias("ad")).groupBy(
            "feature").agg(
            F.sum("cvm").cast("double").alias("cvm"),
            F.sum("ad").cast("double").alias("ad")).collect()

    t("FUSED cvm window only (no persist/totals)", fused_cvm)

    # decimal cost probe: same window, double sum instead of decimal
    def fused_cvm_double():
        g = build_g()
        w_cum = (
            Window.partitionBy("feature").orderBy("value")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_all = Window.partitionBy("feature")
        cr, ct = F.sum("r").over(w_cum), F.sum("t").over(w_cum)
        n, m = F.sum("r").over(w_all), F.sum("t").over(w_all)
        l = F.col("r") + F.col("t")
        big_n = n + m
        b = cr + ct
        d = cr / n - ct / m
        ld2 = l * d * d
        cvm = ld2 * n.cast("double") * m / (big_n.cast("double") * big_n)
        ad = F.when(b < big_n, ld2 * n.cast("double") * m / (b.cast("double") * (big_n - b))).otherwise(F.lit(0.0))
        g.select("feature", cvm.alias("cvm"), ad.alias("ad")).groupBy(
            "feature").agg(F.sum("cvm").alias("cvm"), F.sum("ad").alias("ad")).collect()

    t("probe: cvm window w/ DOUBLE sums (no round/decimal)", fused_cvm_double)

    # KS shapes
    def current_ks():
        g = build_g().persist()
        try:
            g.groupBy("feature").agg(
                F.count(F.lit(1)).alias("nd"),
                F.sum("r").alias("n"), F.sum("t").alias("t"),
            ).collect()
            w_cum = (
                Window.partitionBy("feature").orderBy("value")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            w_all = Window.partitionBy("feature")
            scored = g.select(
                "feature",
                F.abs(
                    F.sum("r").over(w_cum) / F.sum("r").over(w_all)
                    - F.sum("t").over(w_cum) / F.sum("t").over(w_all)
                ).alias("diff"),
            )
            scored.groupBy("feature").agg(F.max("diff").alias("d")).collect()
        finally:
            g.unpersist()

    def fused_ks():
        g = build_g()
        w_cum = (
            Window.partitionBy("feature").orderBy("value")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_all = Window.partitionBy("feature")
        scored = g.select(
            "feature",
            F.abs(
                F.sum("r").over(w_cum) / F.sum("r").over(w_all)
                - F.sum("t").over(w_cum) / F.sum("t").over(w_all)
            ).alias("diff"),
        )
        scored.groupBy("feature").agg(F.max("diff").alias("d")).collect()

    t("CURRENT ks (persist+totals+window)", current_ks)
    t("FUSED ks window only", fused_ks)

    spark.stop()




def variants():
    from driftspark.session import get_spark
    from driftspark.stats import _melt, _cvm_ad_terms

    from pyspark.sql import Window

    spark = get_spark(app_name="profile-cdf2", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li.count()
    ref = li.where(F.col("l_orderkey") % 2 == 0)
    test = li.where(F.col("l_orderkey") % 2 == 1)
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    warm = spark.range(1000).withColumn("v", (F.col("id") % 7).cast("double"))
    warm.select(F.sum("v").over(Window.partitionBy(F.col("id") % 3).orderBy("id"))).collect()

    def build_g():
        u = _melt(ref, cols).withColumn("r", F.lit(1)).withColumn("t", F.lit(0)).unionByName(
            _melt(test, cols).withColumn("r", F.lit(0)).withColumn("t", F.lit(1))
        )
        return u.groupBy("feature", "value").agg(
            F.sum("r").alias("r"), F.sum("t").alias("t")
        )

    # exact n, m from light pre-scan
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        nnv = F.when(~F.isnan(v), v)
        aggs.append(F.count(nnv).alias(c))
    u2 = ref.select(*cols).withColumn("__s", F.lit(0)).unionByName(
        test.select(*cols).withColumn("__s", F.lit(1)))
    cnt_rows = {r["__s"]: r for r in u2.groupBy("__s").agg(*aggs).collect()}
    nm = {c: (int(cnt_rows[0][c]), int(cnt_rows[1][c])) for c in cols}

    def nm_expr(idx):
        e = F.lit(None).cast("long")
        for c, pair in nm.items():
            e = F.when(F.col("feature") == c, F.lit(pair[idx]).cast("long")).otherwise(e)
        return e

    def litcvm():
        g = build_g()
        w_cum = (
            Window.partitionBy("feature").orderBy("value")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cvm, ad = _cvm_ad_terms(
            F.sum("r").over(w_cum), F.sum("t").over(w_cum),
            F.col("r"), F.col("t"), nm_expr(0), nm_expr(1), 18,
        )
        g.select("feature", cvm.alias("cvm"), ad.alias("ad")).groupBy(
            "feature").agg(
            F.sum("cvm").cast("double").alias("cvm"),
            F.sum("ad").cast("double").alias("ad")).collect()

    t("cvm: running frame only, n/m literals", litcvm)

    # range-repartition parallel decomposition, single action
    def rangecvm(P=64):
        g = build_g()
        rp = g.repartitionByRange(P, "feature", "value").withColumn(
            "pid", F.spark_partition_id())
        w_loc = (
            Window.partitionBy("feature", "pid").orderBy("value")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pre = rp.select(
            "feature", "pid", "value", "r", "t",
            F.sum("r").over(w_loc).alias("lcr"),
            F.sum("t").over(w_loc).alias("lct"),
        )
        bt = rp.groupBy("feature", "pid").agg(
            F.sum("r").alias("rs"), F.sum("t").alias("ts"))
        w_off = (
            Window.partitionBy("feature").orderBy("pid")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offs = bt.select(
            "feature", "pid",
            F.coalesce(F.sum("rs").over(w_off), F.lit(0)).alias("roff"),
            F.coalesce(F.sum("ts").over(w_off), F.lit(0)).alias("toff"),
        )
        cvm, ad = _cvm_ad_terms(
            F.col("lcr") + F.col("roff"), F.col("lct") + F.col("toff"),
            F.col("r"), F.col("t"), nm_expr(0), nm_expr(1), 18,
        )
        pre.join(F.broadcast(offs), ["feature", "pid"]).select(
            "feature", cvm.alias("cvm"), ad.alias("ad")
        ).groupBy("feature").agg(
            F.sum("cvm").cast("double").alias("cvm"),
            F.sum("ad").cast("double").alias("ad")).collect()

    t("cvm: rangepart-64 parallel windows, n/m literals", rangecvm)

    def litks():
        g = build_g()
        w_cum = (
            Window.partitionBy("feature").orderBy("value")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        scored = g.select(
            "feature",
            F.abs(
                F.sum("r").over(w_cum) / nm_expr(0)
                - F.sum("t").over(w_cum) / nm_expr(1)
            ).alias("diff"),
        )
        scored.groupBy("feature").agg(F.max("diff").alias("d")).collect()

    t("ks: running frame only, n/m literals", litks)

    def rangeks(P=64):
        g = build_g()
        rp = g.repartitionByRange(P, "feature", "value").withColumn(
            "pid", F.spark_partition_id())
        w_loc = (
            Window.partitionBy("feature", "pid").orderBy("value")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pre = rp.select(
            "feature", "pid",
            F.sum("r").over(w_loc).alias("lcr"),
            F.sum("t").over(w_loc).alias("lct"),
        )
        bt = rp.groupBy("feature", "pid").agg(
            F.sum("r").alias("rs"), F.sum("t").alias("ts"))
        w_off = (
            Window.partitionBy("feature").orderBy("pid")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offs = bt.select(
            "feature", "pid",
            F.coalesce(F.sum("rs").over(w_off), F.lit(0)).alias("roff"),
            F.coalesce(F.sum("ts").over(w_off), F.lit(0)).alias("toff"),
        )
        scored = pre.join(F.broadcast(offs), ["feature", "pid"]).select(
            "feature",
            F.abs(
                (F.col("lcr") + F.col("roff")) / nm_expr(0)
                - (F.col("lct") + F.col("toff")) / nm_expr(1)
            ).alias("diff"),
        )
        scored.groupBy("feature").agg(F.max("diff").alias("d")).collect()

    t("ks: rangepart-64 parallel windows, n/m literals", rangeks)
    spark.stop()



if __name__ == "__main__":
    import sys
    (variants if "variants" in sys.argv else main)()
