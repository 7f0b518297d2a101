"""k-anonymity generalization census for training-data release.

Before publishing a curated corpus, a privacy review asks: under a
given set of quasi-identifiers (QI), how many rows sit in equivalence
classes smaller than k (re-identifiable), and how far must the
numeric QI be generalized (coarser buckets) before every class reaches
size k? This operator computes the whole generalization ladder in ONE
shuffle: the QI tuple is evaluated at every candidate bucket width via
a bounded explode (|widths| = 5 here), a single map-side-combined
groupBy counts each (width, QI) class, and a second tiny aggregate
rolls classes up to per-width census rows.

Monotonicity (asserted by tests/test_webops.py): coarsening only
MERGES classes, so a row at risk at width 2w is at risk at width w —
rows_at_risk and risky_classes are non-increasing in width, which is
what lets a release pipeline binary-search the minimal safe width.

All outputs are exact BIGINTs; k and the width ladder are explicit
arguments so the oracle can inline the same constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

K = 5
BASE_BUCKET = 32
WIDTHS = [1, 2, 4, 8, 16]


def k_anonymity_census(docs: DataFrame, k: int = K,
                       widths: list[int] = WIDTHS) -> DataFrame:
    """Per-width census over QI = (lang, source, n_chars bucket).

    Output: (width, n_classes, risky_classes, rows_at_risk) — one row
    per generalization level, all exact counts.
    """
    lv = docs.select(
        "lang", "source", "n_chars",
        F.explode(F.array(*[F.lit(w).cast("long") for w in widths]))
        .alias("width"))
    classes = (lv.groupBy(
        "width", "lang", "source",
        F.floor(F.col("n_chars") / (F.col("width") * BASE_BUCKET))
        .alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n")))
    risky = (F.col("n") < k).cast("long")
    return (classes.groupBy("width")
            .agg(F.count(F.lit(1)).alias("n_classes"),
                 F.sum(risky).alias("risky_classes"),
                 F.sum(F.col("n") * risky).alias("rows_at_risk")))
