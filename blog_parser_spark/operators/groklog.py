"""Grok-style access-log parsing — the log/telemetry half of the north
rule's "grok/regex parse". Lines are Apache-combined shaped; the parse is
one anchored regexp_extract per field, evaluated JVM-side in whole-stage
codegen (no Python stage, no Arrow hop). At 100 TB this is a map-only
scan feeding a map-side-combined aggregation — the cheapest possible
pipeline shape; the regex cost is the whole job.

`synth_lines` builds byte-identical lines from the events fixture in both
engines (the DuckDB oracle in plans/queries_olap.py mirrors it), so the
round-trip is oracle-checkable without external log data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# COMMONAPACHELOG shape: ip - - [epoch] "METHOD path HTTP/1.1" status bytes
GROK_RX = r'^(\S+) - - \[(\d+)\] "(\w+) (\S+) HTTP/1\.1" (\d{3}) (\d+)$'


def synth_lines(events: DataFrame) -> DataFrame:
    """Deterministic access-log lines from events rows -> one `line` col."""
    method = (F.when(F.col("event_type") == "view", "GET")
              .when(F.col("event_type") == "click", "POST")
              .when(F.col("event_type") == "purchase", "PUT")
              .when(F.col("event_type") == "signup", "POST")
              .otherwise("DELETE"))
    status = (F.when(F.col("event_id") % 10 < 7, "200")
              .when(F.col("event_id") % 10 < 9, "404")
              .otherwise("500"))
    line = F.concat(
        F.lit("10.0."), (F.col("user_id") % 256).cast("string"), F.lit(".1"),
        F.lit(" - - ["),
        # NTZ -> timestamp -> long (direct NTZ->BIGINT casts fail in Spark 4)
        F.col("ts").cast("timestamp").cast("long").cast("string"),
        F.lit('] "'), method, F.lit(" /"), F.col("event_type"), F.lit("/"),
        (F.col("event_id") % 100).cast("string"), F.lit(' HTTP/1.1" '),
        status, F.lit(" "),
        F.floor(F.col("value") * 100).cast("string"))
    return events.select(line.alias("line"))


def parse_lines(raw: DataFrame) -> DataFrame:
    """Extract (ip, epoch, method, path, status, n_bytes) from `line`."""
    return raw.select(
        F.regexp_extract("line", GROK_RX, 1).alias("ip"),
        F.regexp_extract("line", GROK_RX, 2).cast("long").alias("epoch"),
        F.regexp_extract("line", GROK_RX, 3).alias("method"),
        F.regexp_extract("line", GROK_RX, 4).alias("path"),
        F.regexp_extract("line", GROK_RX, 5).alias("status"),
        F.regexp_extract("line", GROK_RX, 6).cast("long").alias("n_bytes"))


def requests_by_method_status(parsed: DataFrame) -> DataFrame:
    return (parsed.groupBy("method", "status")
            .agg(F.count(F.lit(1)).alias("requests"),
                 F.sum("n_bytes").alias("total_bytes"),
                 F.countDistinct("ip").alias("uniq_ips")))
