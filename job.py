"""spark-submit entrypoint (BASELINE.json north_star: "runs via
spark-submit --py-files on multi-executor clusters").

    make dist
    spark-submit --py-files dist/blog_parser_spark.zip job.py \
        --pages /data/pages_parquet --out /data/out --buckets 256

Batch mode runs the resumable fan-out pipeline (re-invoke after a failure
with the same --out to resume from the lineage manifest); streaming mode
runs the same transforms incrementally with a checkpoint.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages table path (parquet/iceberg)")
    ap.add_argument("--out", required=True, help="output root (sinks + manifest)")
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--mode", choices=["batch", "streaming"], default="batch")
    ap.add_argument("--agg-out", help="also write the flagship aggregate here")
    args = ap.parse_args()

    from blog_parser_spark.session import get_spark
    from blog_parser_spark import manifest
    from blog_parser_spark.plans import pipeline
    from blog_parser_spark.operators import aggregate
    from blog_parser_spark.sources import io

    spark = get_spark("blog-parser-pipeline")
    # reliable checkpoint dir under the job's own output root: iterative
    # operators (connected_components) and any df.checkpoint() users get
    # executor-loss-safe lineage cuts on a cluster without extra config.
    # Checkpoints are intra-run scratch (cross-run resume durability comes
    # from the manifest), so the dir is removed after a successful run —
    # otherwise every invocation leaves its full label-frame history behind.
    ckpt_root = f"{args.out}/_checkpoints"
    spark.sparkContext.setCheckpointDir(ckpt_root)

    if args.mode == "streaming":
        from blog_parser_spark.streaming import stream
        q = stream.start_pipeline(
            spark, stream.stream_pages(spark, args.pages),
            args.out, f"{args.out}/checkpoint", available_now=True)
        q.awaitTermination()
        stats = {"mode": "streaming", "out": args.out}
    else:
        pages = io.read_pages(spark, args.pages)  # loud schema-drift gate
        stats = manifest.run_resumable(spark, pages, args.out, args.buckets)

    if args.agg_out:
        pages = io.read_pages(spark, args.pages)
        (aggregate.agg_sink_counts(
            pipeline.routed_pages(spark, pages, dedup=True))
         .repartition(1).write.mode("overwrite").parquet(args.agg_out))

    import shutil
    shutil.rmtree(ckpt_root, ignore_errors=True)
    print(json.dumps(stats))


if __name__ == "__main__":
    sys.exit(main())
