"""Log template mining + multiline record assembly — the two
log-pipeline operators that sit on either side of the grok parse in a
real telemetry stack: template mining discovers the message shapes a
fleet emits (the Drain/LogMine family, simplified to a deterministic
positional-agreement rule), and multiline assembly stitches stack-trace
continuation lines back onto their parent record before any parsing.

Both are pure JVM higher-order-function plans (no Python stage):

- mine_templates: normalize digit runs to <NUM>, group lines by
  (token_count, first two normalized tokens) — the same prefix key the
  Drain tree uses at depth 2 — then per position keep the token if the
  whole group agrees, else emit the <*> wildcard. Two shuffles total
  ((key,pos) agg with map-side combine, then key agg); at 100 TB the
  (key,pos) cardinality is O(templates x positions), thousands of
  rows, so the second shuffle is negligible and the first is a
  map-combined count-distinct over short strings.
- assemble_multiline: a continuation line (leading whitespace) adopts
  the nearest preceding non-continuation line in the same file as its
  parent via a running MAX window per file ordered by line number,
  then records re-assemble with an in-group sort. The window partition
  is the file — the natural parallel unit of a log landing zone — so
  the plan scales with file count, never a global sort.

`synth_app_lines` / `synth_stack_lines` derive deterministic fixtures
from the events table in both engines (oracles in plans/queries_olap.py
mirror them), keeping the round-trip oracle-checkable without external
log data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WILDCARD = "<*>"
NUM = "<NUM>"


def synth_app_lines(events: DataFrame) -> DataFrame:
    """Deterministic app-log lines from events rows -> one `line` col.
    Five message shapes; the click shape carries a varying WORD (button
    color) so template mining must emit a wildcard, not just collapse
    digits."""
    uid = F.col("user_id").cast("string")
    eid = F.col("event_id")
    color = (F.when(eid % 3 == 0, "red")
             .when(eid % 3 == 1, "blue").otherwise("green"))
    line = (F.when(F.col("event_type") == "view",
                   F.concat(F.lit("INFO user "), uid, F.lit(" opened page "),
                            (eid % 100).cast("string"), F.lit(" in "),
                            F.floor(F.col("value") * 100).cast("string"),
                            F.lit(" ms")))
            .when(F.col("event_type") == "click",
                  F.concat(F.lit("INFO user "), uid,
                           F.lit(" clicked button "), color, F.lit(" "),
                           (eid % 10).cast("string")))
            .when(F.col("event_type") == "purchase",
                  F.concat(F.lit("WARN payment retry "),
                           (eid % 5).cast("string"),
                           F.lit(" for user "), uid))
            .when(F.col("event_type") == "signup",
                  F.concat(F.lit("INFO user "), uid,
                           F.lit(" created account")))
            .otherwise(F.concat(F.lit("ERROR session "),
                                eid.cast("string"), F.lit(" aborted"))))
    return events.select(line.alias("line"))


def mine_templates(lines: DataFrame) -> DataFrame:
    """-> (template string, n_lines bigint): one row per discovered
    message shape, digits collapsed to <NUM>, group-divergent positions
    collapsed to <*>."""
    toks = F.transform(F.split("line", " "),
                       lambda t: F.regexp_replace(t, "[0-9]+", NUM))
    keyed = lines.select(
        toks.alias("toks"), F.size(toks).alias("n_toks"),
        F.concat_ws("\x01", F.element_at(toks, 1), F.element_at(toks, 2))
        .alias("gkey"))
    pos = keyed.select("n_toks", "gkey",
                       F.posexplode("toks").alias("pos", "tok"))
    per_pos = (pos.groupBy("n_toks", "gkey", "pos")
               .agg(F.count_distinct("tok").alias("n_distinct"),
                    F.min("tok").alias("tok"),
                    F.count(F.lit(1)).alias("n_rows")))
    slot = F.when(F.col("n_distinct") == 1, F.col("tok")) \
            .otherwise(F.lit(WILDCARD))
    return (per_pos
            .groupBy("n_toks", "gkey")
            .agg(F.array_sort(F.collect_list(F.struct("pos", slot.alias("t"))))
                 .alias("slots"),
                 # every line contributes one row per position, so rows
                 # at any single position == lines in the group
                 F.max(F.col("n_rows")).alias("n_lines"))
            .select(F.concat_ws(" ", F.col("slots.t")).alias("template"),
                    "n_lines"))


def synth_stack_lines(events: DataFrame) -> DataFrame:
    """Deterministic multiline-log fixture -> (file, line_no, line).
    Events with value < 0.1 emit an ERROR parent plus two indented
    continuation frames; everything else emits a single INFO line.
    line_no = event_id*4 + k keeps per-file ordering stable and
    collision-free."""
    eid = F.col("event_id")
    is_err = F.col("value") < 0.1
    k = F.explode(F.sequence(F.lit(0), F.when(is_err, 2).otherwise(0)))
    base = events.select(
        (F.col("user_id") % 8).alias("file"), eid, "value",
        k.alias("k"))
    line = (F.when(F.col("k") == 0,
                   F.when(F.col("value") < 0.1,
                          F.concat(F.lit("ERROR boom "), eid.cast("string")))
                   .otherwise(F.concat(F.lit("INFO ok "), eid.cast("string"))))
            .otherwise(F.concat(F.lit("  at frame"),
                                F.col("k").cast("string"),
                                F.lit(" of "), eid.cast("string"))))
    return base.select("file", (eid * 4 + F.col("k")).alias("line_no"),
                       line.alias("line"))


def assemble_multiline(lines: DataFrame) -> DataFrame:
    """-> (file, record_start bigint, record string, n_lines bigint):
    continuation lines (leading whitespace) fold into the nearest
    preceding non-continuation line of the same file; the assembled
    record joins its lines with \\n in line order."""
    from pyspark.sql.window import Window

    cont = F.col("line").startswith(" ")
    w = (Window.partitionBy("file").orderBy("line_no")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    parent = F.max(F.when(~cont, F.col("line_no"))).over(w)
    tagged = lines.select("file", "line_no", "line",
                          parent.alias("record_start"))
    return (tagged
            # lines before any parent in their file (torn head) keep
            # record_start NULL and group together as a quarantine record
            .groupBy("file", "record_start")
            .agg(F.array_sort(F.collect_list(F.struct("line_no", "line")))
                 .alias("ls"))
            .select("file", "record_start",
                    F.concat_ws("\n", F.col("ls.line")).alias("record"),
                    F.size("ls").cast("bigint").alias("n_lines")))
