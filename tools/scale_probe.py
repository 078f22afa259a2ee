"""Scale probe: run headline queries at 1x and Nx the sf0.1 data (Nx via
re-reading + union, which multiplies real scan/shuffle work) and report the
wall-clock scaling factor. A scale-sound operator should scale ~linearly
(factor ≈ N); a super-linear factor flags a shuffle or skew problem that
would bite harder at 100 TB.

Usage: PYTHONPATH=/root/repo python tools/scale_probe.py [N]
"""

from __future__ import annotations

import json
import sys
import time

SF_DIR = "/root/testdata/sf0.1"


def multiplied(spark, name: str, times: int):
    from functools import reduce

    from graphique_spark.sources import NANO_COLUMNS, normalize_nanos

    frames = [
        normalize_nanos(spark.read.parquet(f"{SF_DIR}/{name}.parquet"), NANO_COLUMNS.get(name, ()))
        for _ in range(times)
    ]
    return reduce(lambda a, b: a.unionByName(b), frames)


def main() -> None:
    times = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from graphique_spark.session import DEFAULT_CONF

    builder = (
        SparkSession.builder.appName("scale-probe")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for key, value in DEFAULT_CONF.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def q1(mult):
        li = multiplied(spark, "lineitem", mult)
        return (
            li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.avg("l_extendedprice").alias("avg_price"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    def star_join(mult):
        cust = multiplied(spark, "customer", mult)
        nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
        region = spark.read.parquet(f"{SF_DIR}/region.parquet")
        return (
            cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
            .groupBy("r_name", "n_name")
            .agg(F.count(F.lit(1)).alias("customers"), F.sum("c_acctbal").alias("bal"))
        )

    def window_rank(mult):
        from pyspark.sql import Window

        orders = multiplied(spark, "orders", mult)
        w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
        return orders.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= 100)

    def minhash(mult):
        from graphique_spark.llm import dedup

        docs = multiplied(spark, "documents", mult).withColumn(
            "doc_id",  # disambiguate duplicated ids so pair counts stay sane
            F.col("doc_id") + F.monotonically_increasing_id() * 0,
        )
        return dedup.minhash_candidates(docs, num_hashes=16, bands=4, min_jaccard=0.5)

    probes = {"q1": q1, "star_join": star_join, "window_rank": window_rank, "minhash": minhash}
    # warmup
    q1(1).write.mode("overwrite").format("noop").save()

    report = {}
    for name, fn in probes.items():
        t0 = time.perf_counter()
        fn(1).write.mode("overwrite").format("noop").save()
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(times).write.mode("overwrite").format("noop").save()
        tn = time.perf_counter() - t0
        report[name] = {
            "t_1x_sec": round(t1, 2),
            f"t_{times}x_sec": round(tn, 2),
            "scaling_factor": round(tn / t1, 2),
            "ideal": float(times),
        }
        print(f"{name}: 1x={t1:.2f}s {times}x={tn:.2f}s factor={tn / t1:.2f} (ideal {times})")

    print(json.dumps({"multiplier": times, "probes": report}))


if __name__ == "__main__":
    main()
