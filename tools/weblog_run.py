"""One weblog-scaling run: fresh JVM at a given parallelism, timed
executions of the round-4 web-log operators over pre-materialized
corpora. Spawned by tools/weblog_scale_bench.py; prints one JSON line.

Usage: python tools/weblog_run.py <docs_parquet> <events_parquet> <cores> <n_runs> [pages_parquet packed_parquet packed_gz_parquet]

The three WARC paths come as a TRIPLE (pages to pack, packed plain
archives to read, packed .warc.gz archives to read) — passing a partial
set is an argument error, not a silent skip of the WARC legs.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    docs_path, events_path = sys.argv[1], sys.argv[2]
    cores, n_runs = int(sys.argv[3]), int(sys.argv[4])
    from pyspark.sql import functions as F

    from blog_parser_spark.operators import (boilerplate, heavyhitters,
                                             robots, urlnorm, weblog)
    from blog_parser_spark.session import get_spark
    from blog_parser_spark.sources import warc

    spark = get_spark(f"weblog-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=4 * cores)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(docs_path)
    events = spark.read.parquet(events_path)
    n_docs, n_events = docs.count(), events.count()

    # same key/fetch synthesis shapes as plans/queries_webops.py, over
    # the replicated corpus (hot keys stay hot, tail grows with volume)
    hh_keyed = events.select(
        F.when(F.col("event_id") % 10 < 6,
               F.concat(F.lit("hot-"), (F.col("user_id") % 5).cast("string")))
        .otherwise(F.concat(F.lit("tail-"),
                            (F.col("event_id") % 4096).cast("string")))
        .alias("hh_key"))
    fetches = events.select(
        "event_id",
        F.concat(F.lit("site"), (F.col("user_id") % 20).cast("string"),
                 F.lit(".example")).alias("host"),
        F.concat(F.lit("/sec"), (F.col("event_id") % 9).cast("string"),
                 F.lit("/"),
                 F.when(F.col("event_id") % 3 == 0, F.lit("pub"))
                 .when(F.col("event_id") % 3 == 1, F.lit("priv"))
                 .otherwise(F.lit("page")),
                 (F.col("event_id") % 97).cast("string")).alias("path"))

    legs = {
        "boilerplate_strip":
            boilerplate.strip_boilerplate(boilerplate.synth_pages(docs)),
        "rolling_distinct_users": weblog.rolling_distinct_users(events),
        "attribution_last_touch": weblog.attribution_last_touch(events),
        "heavy_hitters_exact":
            heavyhitters.exact_heavy_hitters(hh_keyed, "hh_key"),
        "robots_politeness":
            robots.politeness_audit(fetches, robots.rules_df(spark)),
        "url_path_templates": urlnorm.template_census(fetches),
    }
    if len(sys.argv) in (6, 7):
        raise SystemExit("WARC legs need ALL THREE paths: pages_parquet "
                         "packed_parquet packed_gz_parquet")
    if len(sys.argv) > 7:
        # WARC directions timed separately at realistic archive size
        # (1000 pages/file) — production runs one at a time: pack is the
        # export/mirror path, read is the Common-Crawl ingest path
        pages = spark.read.parquet(sys.argv[5])
        packed = spark.read.parquet(sys.argv[6])
        packed_gz = spark.read.parquet(sys.argv[7])
        legs["warc_pack"] = warc.pack_warc_files(pages, docs_per_file=1000)
        legs["warc_read"] = warc.read_warc(packed)
        # the gz ingest direction: same walk + per-member gunzip in the
        # one Arrow stage (Common Crawl's actual layout)
        legs["warc_read_gz"] = warc.read_warc(packed_gz)
        # zero-exchange pack from the co-partitioned layout: bucketed
        # table built UNTIMED per JVM (in-memory catalog doesn't cross
        # processes); bucket count FIXED at 128 so the N and 4N legs run
        # identical work — only the executor count varies
        keyed = pages.withColumn(
            "_fid_mat",
            (F.regexp_extract("url", r"/post/(\d+)$", 1).cast("long")
             / 1000).cast("long"))
        # explicit fresh location: a bare saveAsTable collides with the
        # previous JVM's leftover warehouse dir (fresh in-memory catalog,
        # existing path -> LOCATION_ALREADY_EXISTS)
        import shutil
        fid_table_path = f"/tmp/weblog_fid_table_{cores}"
        shutil.rmtree(fid_table_path, ignore_errors=True)
        spark.sql("DROP TABLE IF EXISTS bench_pages_by_fid")
        (keyed.write.mode("overwrite").format("parquet")
         .bucketBy(128, "_fid_mat").sortBy("_fid_mat")
         .option("path", fid_table_path)
         .saveAsTable("bench_pages_by_fid"))
        # a scan->mapInPandas plan has no bucketing-exploiting operator,
        # so autoBucketedScan would silently rewrite to a splittable scan
        # and break the archive-within-one-partition contract
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        legs["warc_pack_bucketed"] = warc.pack_warc_files_presorted(
            spark.table("bench_pages_by_fid").select("url", "warc_ts", "html"),
            docs_per_file=1000)

    out: dict[str, object] = {"cores": cores, "docs": n_docs,
                              "events": n_events}
    for name, df in legs.items():
        def run() -> float:
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            return time.time() - t0

        run()  # warmup (codegen + worker spawn), excluded as per-JVM cost
        times = sorted(run() for _ in range(n_runs))
        # best-of-n: the VM host shows sporadic multi-second steal
        # outliers; best is the engine's sustained rate
        out[name] = {"runs_sec": [round(t, 2) for t in times],
                     "best_sec": round(times[0], 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
