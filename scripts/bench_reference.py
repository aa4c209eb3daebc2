#!/usr/bin/env python3
"""Dev-only: measures the REFERENCE library (invent-analytics/metaframe) on
bench queries, mirroring BASELINE.md's config exactly — PySpark 4.1.2 with
the SURVEY.md §1.4 two-line `__new__` shim (the reference targets PySpark
3.x), local[4], spark.sql.shuffle.partitions=4, UTC, warm pass then a timed
second run. Used to extend BASELINE.md when graft.Bench grows a query; all
routing/wrapping code paths are the reference's own. Not part of the
shipped library.

Usage: python3 scripts/bench_reference.py [sfDir] [query ...]
"""
import sys
import time

sys.path.insert(0, "/root/reference")

from pyspark.sql import SparkSession, functions as F  # noqa: E402
import metaframe.metaframe as m  # noqa: E402


# SURVEY.md §1.4: PySpark 4.x DataFrame.__new__ eagerly dispatches
# __init__(jdf, sql_ctx); bypass it so the reference's own __init__ runs.
# Patched on the reference class itself because `_wrapper` re-wraps results
# through the module-level MetaFrame (metaframe.py:113-114).
m.MetaFrame.__new__ = lambda cls, df=None, metadata=None: object.__new__(cls)
MetaFrame = m.MetaFrame


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    def t(name):
        return MetaFrame(spark.read.parquet(f"{sf}/{name}.parquet"), {})

    def q9_profit_shape():
        (
            t("lineitem")
            .join(t("part"), F.col("l_partkey") == F.col("p_partkey"))
            .join(t("supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(t("nation"), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(t("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            # string keys: Column args crash the reference's pk inference
            # (set(args) on unhashable Column — SURVEY §7.3 quirk Q1)
            .withColumn("o_year", F.year("o_orderdate"))
            .groupBy("n_name", "o_year")
            .agg(F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("profit"))
            .collect()
        )

    def q18_volume_shape():
        big = (
            t("lineitem")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("sum_qty"))
            .filter(F.col("sum_qty") > 300)
        )
        (
            big.join(t("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .join(t("customer"), F.col("o_custkey") == F.col("c_custkey"))
            .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
            .orderBy(F.desc("sum_qty"), F.col("o_orderkey"))
            .limit(100)
            .collect()
        )

    queries = {
        "q9_profit_shape": q9_profit_shape,
        "q18_volume_shape": q18_volume_shape,
    }
    for name, fn in queries.items():
        if only and name not in only:
            continue
        fn()  # warm (JIT + parquet footers), matching BASELINE.md
        t0 = time.time()
        fn()
        print(f"{name}: {time.time() - t0:.3f} s")
    spark.stop()


if __name__ == "__main__":
    main()
