#!/usr/bin/env python
"""Storage-layout micro-bench: measure what each layout BUYS, so the
write-side costs (copy.write_bucketed / write_sorted_for_skipping /
write_zordered) carry measured payoffs, not asserted ones — the
storage-plane companion of tools/skew_bench.py.

Measured paths (each min-of-repeats after a warm-up, one JSON line):

- equi-join lineitem⋈orders on the key, plain parquet (shuffles BOTH
  sides) vs both sides bucketed on the key (zero Exchange — the
  ingest-time shuffle is amortized across every future join);
- selective range scan (1 month of o_orderdate) on unsorted parquet
  (reads every row group) vs range-sorted parquet (row-group min/max
  skips the rest);
- two-column point-ish filter on plain vs Z-ordered layout.

Broadcast joins are DISABLED for the join case: at 100 TB neither side
of a fact-fact join broadcasts, which is exactly the regime bucketing
exists for; at sf0.1 Catalyst would otherwise broadcast orders and
hide the comparison.

Run: python tools/layout_bench.py [sf_dir]  (default /root/testdata/sf0.1)
Record the numbers in BASELINE_LOCAL.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_service_spark.operators import copy as C  # noqa: E402
from etl_service_spark.session import get_spark  # noqa: E402

REPEATS = 3


def timed(fn) -> float:
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("layout_bench")
    work = tempfile.mkdtemp(prefix="layout_bench_")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))

    # ---- join: plain vs bucketed, broadcast disabled (fact-fact regime)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS layoutdb LOCATION '{work}/db'")
    spark.catalog.setCurrentDatabase("layoutdb")
    C.write_bucketed(li.select("l_orderkey", "l_extendedprice"), "li_b", "l_orderkey")
    C.write_bucketed(od.select("o_orderkey", "o_orderdate"), "od_b", "o_orderkey")

    def plain_join():
        noop(
            li.select("l_orderkey", "l_extendedprice")
            .join(od.select("o_orderkey", "o_orderdate"), li["l_orderkey"] == od["o_orderkey"])
            .groupBy("o_orderdate")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )

    def bucketed_join():
        a, b = spark.table("li_b"), spark.table("od_b")
        noop(
            a.join(b, a["l_orderkey"] == b["o_orderkey"])
            .groupBy("o_orderdate")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )

    plain_join(); bucketed_join()  # warm-up
    t_plain_join = timed(plain_join)
    t_bucketed_join = timed(bucketed_join)

    def n_exchanges(df) -> int:
        return df._jdf.queryExecution().executedPlan().toString().count("Exchange hashpartitioning")

    a, b = spark.table("li_b"), spark.table("od_b")
    x_plain = n_exchanges(
        li.select("l_orderkey", "l_extendedprice")
        .join(od.select("o_orderkey", "o_orderdate"), li["l_orderkey"] == od["o_orderkey"])
        .groupBy("o_orderdate").agg(F.sum("l_extendedprice"))
    )
    x_bucketed = n_exchanges(
        a.join(b, a["l_orderkey"] == b["o_orderkey"])
        .groupBy("o_orderdate").agg(F.sum("l_extendedprice"))
    )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    # ---- range scan: unsorted vs range-sorted row-group skipping.
    # BOTH sides are rewritten to the same file count so the layout is
    # the only variable (the sf testdata ships as one file; comparing
    # 1 file vs 16 would measure open overhead, not pruning).
    sorted_dir = os.path.join(work, "orders_sorted")
    shuffled_dir = os.path.join(work, "orders_shuffled")
    C.write_sorted_for_skipping(od, sorted_dir, "o_orderdate", files=16)
    od.repartition(16).write.parquet(shuffled_dir)
    pred = (F.col("o_orderdate") >= "1995-03-01") & (F.col("o_orderdate") < "1995-04-01")

    def scan_plain():
        noop(
            spark.read.parquet(shuffled_dir).filter(pred).select("o_orderkey", "o_totalprice")
        )

    def scan_sorted():
        noop(
            spark.read.parquet(sorted_dir).filter(pred).select("o_orderkey", "o_totalprice")
        )

    scan_plain(); scan_sorted()
    t_scan_plain = timed(scan_plain)
    t_scan_sorted = timed(scan_sorted)

    # ---- two-column filter: shuffled vs z-ordered, same file count
    z_dir = os.path.join(work, "li_z")
    li_shuf_dir = os.path.join(work, "li_shuffled")
    C.write_zordered(li, z_dir, "l_orderkey", "l_partkey", files=16)
    li.repartition(16).write.parquet(li_shuf_dir)
    zpred = (F.col("l_orderkey") < 1500) & (F.col("l_partkey") < 500)

    def z_plain():
        noop(
            spark.read.parquet(li_shuf_dir)
            .filter(zpred)
            .select("l_orderkey", "l_partkey", "l_quantity")
        )

    def z_sorted():
        noop(
            spark.read.parquet(z_dir).filter(zpred).select("l_orderkey", "l_partkey", "l_quantity")
        )

    z_plain(); z_sorted()
    t_z_plain = timed(z_plain)
    t_z = timed(z_sorted)

    # ---- the scale-relevant numbers: row groups surviving parquet
    # min/max pruning per layout (deterministic footer math — at sf0.1
    # wall-clock is page-cache-flat, but the surviving-row-group RATIO
    # is exactly what scales to 100 TB of bytes not read)
    import pyarrow.parquet as pq

    def surviving_row_groups(d: str, col: str, lo, hi) -> tuple[int, int]:
        total = kept = 0
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            for rg in range(md.num_row_groups):
                total += 1
                st = md.row_group(rg).column(idx).statistics
                if st is None or st.min is None:
                    kept += 1  # no stats -> must read
                elif not (st.max < lo or st.min > hi):
                    kept += 1
        return kept, total

    import datetime as _dt

    lo = _dt.datetime(1995, 3, 1)
    hi = _dt.datetime(1995, 4, 1)
    rg_sorted = surviving_row_groups(sorted_dir, "o_orderdate", lo, hi)
    rg_shuffled = surviving_row_groups(shuffled_dir, "o_orderdate", lo, hi)
    rg_z = surviving_row_groups(z_dir, "l_orderkey", 0, 1499)
    rg_z_plain = surviving_row_groups(li_shuf_dir, "l_orderkey", 0, 1499)

    print(
        json.dumps(
            {
                "metric": "layout_bench",
                "sf_dir": sf_dir,
                "join_plain_s": t_plain_join,
                "join_bucketed_s": t_bucketed_join,
                "join_exchanges_plain": x_plain,
                "join_exchanges_bucketed": x_bucketed,
                "scan_unsorted_s": t_scan_plain,
                "scan_sorted_s": t_scan_sorted,
                "rowgroups_read_sorted": f"{rg_sorted[0]}/{rg_sorted[1]}",
                "rowgroups_read_unsorted": f"{rg_shuffled[0]}/{rg_shuffled[1]}",
                "filter2d_plain_s": t_z_plain,
                "filter2d_zordered_s": t_z,
                "rowgroups_read_zordered": f"{rg_z[0]}/{rg_z[1]}",
                "rowgroups_read_plain2d": f"{rg_z_plain[0]}/{rg_z_plain[1]}",
                "repeats": REPEATS,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
