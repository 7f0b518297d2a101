"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard contamination check in large-scale pretraining pipelines:
any training doc containing an n-gram that also appears in a held-out
benchmark is flagged (and usually dropped) so eval numbers aren't
memorization. Expressed Spark-first:

- benchmark grams are DISTINCT word k-grams of the (small) eval set —
  broadcast to every executor, so the corpus-side explode joins against
  them with ZERO shuffle of the corpus;
- per-doc overlap is a groupBy(doc_id) over the exploded grams — one
  hash shuffle whose volume is O(matched grams), not O(corpus).

At 100 TB the eval set stays a few MB of grams (benchmarks are small by
construction), so the broadcast never becomes the bottleneck; if an eval
set ever outgrew broadcast range the same plan degrades gracefully to a
shuffled hash join on the gram key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingles_col


def benchmark_grams(eval_docs: DataFrame, text_col: str = "text",
                    k: int = 3) -> DataFrame:
    """Distinct word k-grams of the benchmark set (one column: `gram`)."""
    return (eval_docs
            .select(F.explode(shingles_col(text_col, k)).alias("gram"))
            .distinct())


def contamination(train_docs: DataFrame, eval_docs: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  k: int = 3) -> DataFrame:
    """Per training doc: total distinct k-grams, how many also occur in
    the benchmark set, and the overlap fraction. Docs with zero grams
    (< k words) report 0/0 -> fraction 0.0."""
    grams = (train_docs
             .select(id_col, F.explode_outer(shingles_col(text_col, k))
                     .alias("gram")))
    bench = F.broadcast(benchmark_grams(eval_docs, text_col, k)
                        .withColumn("_hit", F.lit(1)))
    joined = grams.join(bench, "gram", "left")
    n_grams = F.count("gram")
    n_overlap = F.count("_hit")
    return (joined.groupBy(id_col)
            .agg(n_grams.alias("n_grams"),
                 n_overlap.alias("n_overlap"),
                 F.round(n_overlap.cast("double")
                         / F.greatest(n_grams, F.lit(1)), 6)
                 .alias("overlap_frac")))
