"""Same-session A/B of exact heavy hitters at high key cardinality:
the direct full-cardinality groupBy + threshold (baseline) vs the
shipped two-pass Misra-Gries candidates + recount
(operators/heavyhitters.py).

The operator's claim is SHUFFLE VOLUME, not raw local wall time: the
direct plan shuffles one row per (distinct key x mapper) — at 100 TB
with billions of distinct urls/users that shuffle IS the job — while
the MG plan shuffles only |candidates| x mappers and pays a second
scan. Both wall seconds AND per-variant shuffle bytes (from the Spark
UI REST API) are reported, so the trade reads directly off the JSON:
on this box's localhost "network" the shuffle is nearly free and the
second scan + Arrow candidate pass may tie or lose; the bytes column
is what survives extrapolation to a real cluster fabric.

Both variants run in ONE pinned session over the SAME materialized
corpus, interleaved best-of-N (CLAUDE.md: only same-session ratios
carry signal), with an equality guard on the full result set.

Run:
    taskset -c 0-31 python tools/hh_ab_bench.py [--rows 16000000]
Emits one JSON line; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cpu_ticks() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[1]), int(parts[8])


def _shuffle_write_bytes(ui_port: int) -> int:
    """Total shuffle write bytes across all completed stages so far."""
    base = f"http://localhost:{ui_port}/api/v1/applications"
    with urllib.request.urlopen(base, timeout=10) as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
            f"{base}/{app_id}/stages?status=complete", timeout=10) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16_000_000)
    ap.add_argument("--tail-keys", type=int, default=4_000_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import DataFrame, functions as F

    from blog_parser_spark.operators import heavyhitters
    from blog_parser_spark.session import get_spark

    spark = get_spark("hh-ab", master=f"local[{args.cpus}]",
                      shuffle_partitions=4 * args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    ui_port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])

    # skewed stream: 30% of rows on 5 hot keys, the rest over a
    # `tail_keys`-sized long tail — materialized once to parquet so both
    # variants scan identical bytes.
    path = f"/tmp/bench_hh_ab_{args.rows}_{args.tail_keys}.parquet"
    if not os.path.exists(path):
        tmp = path + ".tmp"
        (spark.range(args.rows).select(
            F.when(F.col("id") % 10 < 3,
                   F.concat(F.lit("hot-"), (F.col("id") % 3).cast("string")))
            .otherwise(F.concat(F.lit("tail-"),
                                (F.col("id") % args.tail_keys)
                                .cast("string")))
            .alias("hh_key"))
         .repartition(4 * args.cpus).write.mode("overwrite").parquet(tmp))
        os.rename(tmp, path)
    keyed = spark.read.parquet(path)
    n_rows = keyed.count()
    cap = heavyhitters.CAPACITY

    def direct(df: DataFrame) -> DataFrame:
        total = df.agg(F.count(F.lit(1)).alias("n_total"))
        return (df.groupBy("hh_key").agg(F.count(F.lit(1)).alias("cnt"))
                .crossJoin(F.broadcast(total))
                .where(F.col("cnt") * (cap + 1) > F.col("n_total"))
                .select("hh_key", "cnt", "n_total"))

    def mg(df: DataFrame) -> DataFrame:
        return heavyhitters.exact_heavy_hitters(df, "hh_key")

    # equality guard: identical exact result from both formulations
    a = sorted(tuple(r) for r in direct(keyed).collect())
    b = sorted(tuple(r) for r in mg(keyed).collect())
    assert a == b and len(a) == 3, f"formulations disagree: {len(a)} vs {len(b)}"

    def run(fn) -> tuple[float, int]:
        sb0 = _shuffle_write_bytes(ui_port)
        t0 = time.time()
        fn(keyed).write.mode("overwrite").format("noop").save()
        return time.time() - t0, _shuffle_write_bytes(ui_port) - sb0

    run(direct), run(mg)  # warmup both plans
    user0, steal0 = _cpu_ticks()
    ds, ms = [], []
    d_bytes = m_bytes = 0
    for _ in range(args.runs):  # interleaved: drift hits both equally
        t, sb = run(direct)
        ds.append(t)
        d_bytes = sb
        t, sb = run(mg)
        ms.append(t)
        m_bytes = sb
    user1, steal1 = _cpu_ticks()

    print(json.dumps({
        "leg": "heavy_hitters_ab", "rows": n_rows,
        "tail_keys": args.tail_keys, "cpus": args.cpus,
        "capacity": cap,
        "direct_groupby_sec": [round(s, 3) for s in sorted(ds)],
        "mg_two_pass_sec": [round(s, 3) for s in sorted(ms)],
        "direct_shuffle_bytes": d_bytes,
        "mg_shuffle_bytes": m_bytes,
        "shuffle_reduction": round(d_bytes / max(m_bytes, 1), 1),
        "wall_ratio_mg_over_direct": round(min(ms) / min(ds), 3),
        "vm_user_ticks": user1 - user0,
        "vm_steal_ticks": steal1 - steal0,
    }), flush=True)


if __name__ == "__main__":
    main()
