"""North-rule scaling evidence (BASELINE.md protocol): run the identical
flagship job over the identical input at two parallelism levels (local[N]
and local[4N] — the sandbox substitute for N vs 4N executors), in FRESH
JVM subprocesses, and report throughput at both plus scaling efficiency.

    python tools/scaling_bench.py [--docs 1000000] [--n 8] [--runs 3]

Writes BENCH/BASELINE.md and prints the efficiency JSON.

Data-scale curve mode (the other axis: docs x10 at FIXED cores — does
per-doc flagship cost stay flat as the corpus grows?):

    python tools/scaling_bench.py --curve-docs 1000000 10000000 --curve-cores 32
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
from datetime import date

sys.path.insert(0, ".")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_corpus(target_docs: int) -> str:
    from blog_parser_spark.session import get_spark
    from blog_parser_spark.sources import io

    spark = get_spark("scaling-build", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    n_raw = io.read_table(spark, SF_DIR, "documents").count()
    replicate = max(1, -(-target_docs // n_raw))
    path = f"/tmp/scaling_pages_{n_raw}x{replicate}.parquet"
    if not os.path.exists(path):
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        # >= 4 * 32 partitions so BOTH parallelism levels have full slots
        (io.synth_pages(spark, SF_DIR, replicate=replicate)
         .repartition(256).write.mode("overwrite").parquet(tmp))
        os.rename(tmp, path)
    spark.stop()
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--n", type=int, default=8, help="small parallelism N (big = 4N)")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--curve-docs", type=int, nargs="+", default=None,
                    help="data-scale curve: doc counts at fixed cores")
    ap.add_argument("--curve-cores", type=int, default=32)
    args = ap.parse_args()

    if args.curve_docs:
        recs = []
        for docs in args.curve_docs:
            path = build_corpus(docs)
            out = subprocess.run(
                ["taskset", "-c", f"0-{args.curve_cores - 1}", sys.executable,
                 "tools/scaling_run.py", path, str(args.curve_cores),
                 str(args.runs)],
                capture_output=True, text=True, check=True)
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            print(json.dumps(rec))
            recs.append(rec)
        a, b = recs[0], recs[-1]
        print(json.dumps({
            "leg": "flagship_data_curve", "cores": args.curve_cores,
            "scale_factor": round(b["docs"] / a["docs"], 2),
            "time_ratio": round(b["best_sec"] / a["best_sec"], 2),
            "per_doc_cost_ratio": round(
                (b["best_sec"] / b["docs"]) / (a["best_sec"] / a["docs"]), 3),
        }))
        return

    path = build_corpus(args.docs)
    results = {}
    for cores in (args.n, 4 * args.n):
        # taskset pins the whole Spark process tree (JVM + python workers)
        # to exactly `cores` CPUs — the faithful emulation of an N-executor
        # cluster where JVM and python workers share the executor's cores.
        # Without pinning, the small run's JVM free-rides on idle cores and
        # inflates the baseline, understating true cluster scaling.
        out = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}", sys.executable,
             "tools/scaling_run.py", path, str(cores), str(args.runs)],
            capture_output=True, text=True, check=True)
        line = out.stdout.strip().splitlines()[-1]
        results[cores] = json.loads(line)
        print(line)

    lo, hi = results[args.n], results[4 * args.n]
    eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
    summary = {
        "docs": lo["docs"],
        f"qps_{args.n}": lo["docs_per_sec"],
        f"qps_{4*args.n}": hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "required": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    # raw per-run report; BENCH/BASELINE.md is the curated writeup (with
    # the control experiments) and is updated by hand from this file
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling_latest.md", "w") as f:
        f.write(f"""# BENCH scaling run ({date.today().isoformat()})

North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox substitute (BASELINE.md protocol): identical flagship
job (parse->dedup->enrich->route->aggregate, 2 shuffles), identical
pre-materialized input, fresh JVM per level, median of {args.runs} warm runs.

| config | docs | median sec | docs/sec |
| --- | --- | --- | --- |
| local[{args.n}], shuffle={4*args.n} | {lo['docs']} | {lo['median_sec']} | {lo['docs_per_sec']} |
| local[{4*args.n}], shuffle={16*args.n} | {hi['docs']} | {hi['median_sec']} | {hi['docs_per_sec']} |

**scaling efficiency = qps_{4*args.n} / (4 x qps_{args.n}) = {eff:.3f}**
(required >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

Raw runs: local[{args.n}] {lo['runs_sec']} / local[{4*args.n}] {hi['runs_sec']}.
Input: {path} ({lo['docs']} docs, 256 partitions).
Notes: the parse stage (pandas-UDF regex grammar) dominates and is
embarrassingly parallel; shuffles are AQE-coalesced. Cold-start
(worker spawn + codegen, ~5-10 s) is excluded via one warmup run per JVM
— it is a per-executor constant, not a per-byte cost, at 100 TB scale.
""")


if __name__ == "__main__":
    main()
