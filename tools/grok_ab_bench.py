"""Same-session A/B of the grok parse: six regexp_extract calls (the
round-3 formulation) vs the shipped single-pass rewrite (one rlike
validation + substring_index field extraction). A third formulation —
regexp_replace into a sentinel-delimited record + split — was measured
at ~2x SLOWER than even six extracts (replacement materialization
dominates) and rejected; numbers in BENCH/BASELINE.md.

Both variants run in ONE pinned session over the SAME materialized line
corpus, interleaved best-of-N, so the comparison is immune to the VM's
cross-session noise (CLAUDE.md: only same-session ratios carry signal).
The six-extract variant is reconstructed inline here as the frozen
reference formulation — operators/groklog.py only ships the fast one.

Run:
    taskset -c 0-31 python tools/grok_ab_bench.py [--lines 16000000]
Emits one JSON line; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cpu_ticks() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[1]), int(parts[8])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lines", type=int, default=16_000_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import DataFrame, functions as F

    from blog_parser_spark.operators import groklog
    from blog_parser_spark.session import get_spark
    from blog_parser_spark.sources import io

    spark = get_spark("grok-ab", master=f"local[{args.cpus}]",
                      shuffle_partitions=4 * args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    ev = io.read_table(spark, args.sf_dir, "events")
    n_ev = ev.count()
    rep = max(1, -(-args.lines // n_ev))
    path = f"/tmp/bench_groklines_ab_x{rep}.parquet"
    if not os.path.exists(path):
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        (groklog.synth_lines(
            ev.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
            .withColumn("event_id",
                        F.col("event_id") + F.col("i") * F.lit(10_000_000)))
         .repartition(4 * args.cpus).write.mode("overwrite").parquet(tmp))
        os.rename(tmp, path)
    lines = spark.read.parquet(path)
    n_lines = lines.count()

    def six_extract(raw: DataFrame) -> DataFrame:
        rx = groklog.GROK_RX
        return raw.select(
            F.regexp_extract("line", rx, 1).alias("ip"),
            F.regexp_extract("line", rx, 2).cast("long").alias("epoch"),
            F.regexp_extract("line", rx, 3).alias("method"),
            F.regexp_extract("line", rx, 4).alias("path"),
            F.regexp_extract("line", rx, 5).alias("status"),
            F.regexp_extract("line", rx, 6).cast("long").alias("n_bytes"))

    def run(parse_fn) -> float:
        t0 = time.time()
        (groklog.requests_by_method_status(parse_fn(lines))
         .write.mode("overwrite").format("noop").save())
        return time.time() - t0

    # equality guard: same aggregate out of both formulations
    a = {tuple(r) for r in
         groklog.requests_by_method_status(six_extract(lines)).collect()}
    b = {tuple(r) for r in
         groklog.requests_by_method_status(groklog.parse_lines(lines)).collect()}
    assert a == b, "formulations disagree"

    run(six_extract), run(groklog.parse_lines)  # warmup both plans
    user0, steal0 = _cpu_ticks()
    olds, news = [], []
    for _ in range(args.runs):  # interleaved: drift hits both equally
        olds.append(run(six_extract))
        news.append(run(groklog.parse_lines))
    user1, steal1 = _cpu_ticks()

    best_old, best_new = min(olds), min(news)
    print(json.dumps({
        "leg": "grok_parse_agg_ab", "lines": n_lines, "cpus": args.cpus,
        "six_extract_sec": [round(s, 3) for s in sorted(olds)],
        "single_pass_sec": [round(s, 3) for s in sorted(news)],
        "six_extract_lines_per_sec": round(n_lines / best_old, 1),
        "single_pass_lines_per_sec": round(n_lines / best_new, 1),
        "speedup": round(best_old / best_new, 3),
        "vm_user_ticks": user1 - user0,
        "vm_steal_ticks": steal1 - steal0,
    }), flush=True)


if __name__ == "__main__":
    main()
