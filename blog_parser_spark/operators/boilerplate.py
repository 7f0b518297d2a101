"""Site-frequency boilerplate removal — the webtext-curation step that
strips nav bars, footers, and cookie banners before text goes into a
training corpus. Uses the distributed-native formulation (the one
trafilatura/CCNet-style single-doc heuristics can't do): a line is
boilerplate when it appears on at least `num/den` of its DOMAIN's
documents (and the domain has >= min_docs docs) — per-site common-line
detection, computed corpus-wide in two map-side-combined aggregations.

Scale shape: the frequency aggregate and the join back to the line
stream both key on (source, line_hash) — a 60-bit md5-derived hash, so
the shuffle carries ~24 bytes per line, never the line text. The
threshold comparison is pure integer cross-multiplication
(n_docs_with * den >= n_docs * num) — no FP ceil, no epsilon (the
float-ceil overshoot class of bug flagged in round 3's ADVICE.md).
Document reassembly sorts each doc's surviving (pos, line) pairs
in-group — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sampling import row_hash


def synth_pages(docs: DataFrame) -> DataFrame:
    """Deterministic 'web pages' from the documents fixture: every
    page of a source shares a nav line and a copyright footer
    (boilerplate by construction); 25% of pages carry a promo line
    (below a 50% threshold -> must survive); the body is the doc text.
    concat_ws skips the NULL promo in both engines."""
    promo = F.when(F.col("doc_id") % 4 == 0,
                   F.lit("SUBSCRIBE to our newsletter")).otherwise(F.lit(None))
    page = F.concat_ws(
        "\n",
        F.concat(F.lit("NAV home about contact "), F.col("source")),
        promo,
        F.col("text"),
        F.concat(F.lit("(c) 2024 "), F.col("source"),
                 F.lit(" all rights reserved")))
    return docs.select("doc_id", "source", page.alias("page"))


def strip_boilerplate(pages: DataFrame, min_docs: int = 2,
                      num: int = 1, den: int = 2) -> DataFrame:
    """Remove per-domain common lines; returns one row per document:
    (doc_id, source, n_kept, n_dropped, clean_text).

    A line counts once per document it appears on (count_distinct
    doc_id), so a page repeating its own nav twice can't inflate the
    site frequency."""
    lines = pages.select(
        "doc_id", "source",
        F.posexplode(F.split("page", "\n")).alias("pos", "line"))
    lines = lines.withColumn("line_h", row_hash(F.col("line")))
    ndocs = (pages.groupBy("source")
             .agg(F.count_distinct("doc_id").alias("n_docs")))
    freq = (lines.groupBy("source", "line_h")
            .agg(F.count_distinct("doc_id").alias("n_docs_with")))
    is_bp = ((F.col("n_docs") >= min_docs)
             & (F.col("n_docs_with") * den >= F.col("n_docs") * num))
    tagged = (lines
              .join(freq, ["source", "line_h"])
              .join(F.broadcast(ndocs), "source")
              .withColumn("is_bp", is_bp.cast("long")))
    return (tagged.groupBy("doc_id", "source")
            .agg(F.sum(1 - F.col("is_bp")).alias("n_kept"),
                 F.sum("is_bp").alias("n_dropped"),
                 F.concat_ws(
                     "\n",
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("is_bp") == 0,
                                    F.struct("pos", "line")))),
                         lambda s: s["line"])).alias("clean_text")))
