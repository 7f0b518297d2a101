"""Pinned adjudication of the sub-second driver-bench legs.

BENCH_r02 showed 10-30% regressions vs r01 on join_smj / agg_sink_counts /
win_ntile_percent / agg_rollup — all sub-second queries on a VM with
documented 2-3x steal-time outliers, measured by the UNPINNED driver
bench. This re-measures exactly those legs under the repo's pinned
protocol (taskset on the whole process tree, one warmup build+run, then
best-of-N build+run, fresh JVM per invocation) so noise vs regression can
be adjudicated.

Run (the pinning lives in the exec, not the child):
    taskset -c 0-31 python tools/pinned_small_bench.py [--runs 3]
Emits one JSON line; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEGS = ("join_smj", "agg_sink_counts", "win_ntile_percent", "agg_rollup")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from blog_parser_spark.session import get_spark
    import __spark_entry__ as qreg

    spark = get_spark("pinned-small-bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=4 * args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = qreg.queries()

    def run_leg(name: str) -> float:
        t0 = time.time()
        qs[name](spark, args.sf_dir).write.mode("overwrite") \
            .format("noop").save()
        return time.time() - t0

    out: dict[str, object] = {"sf_dir": args.sf_dir, "cpus": args.cpus,
                              "runs": args.runs}
    for name in LEGS:
        run_leg(name)  # warmup: codegen + python worker spawn
        samples = sorted(run_leg(name) for _ in range(args.runs))
        out[name] = {"best": round(samples[0], 3),
                     "all": [round(s, 3) for s in samples]}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
