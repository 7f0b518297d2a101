"""Driver-contract queries for the CDC layer: snapshot merge (upserts +
deletes over a base table) and SCD2 validity intervals from the change
history.

The change stream is synthesized as a pure function of `documents` (no
RNG, FIXTURES.md determinism rules): two update waves, a delete wave, and
an insert wave, with per-key seq collisions possible only between waves —
both engines' windows order by (seq DESC, op DESC) so the same change
wins everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import cdc
from ..sources import io
from .registry import register

# seq 1: upsert every 5th doc; seq 2: second upsert every 10th (latest
# wins over its own seq-1 update); seq 3: delete every doc = 3 mod 7
# (wins over any update on the same key); inserts are new keys.
_CHANGES_SQL = """
SELECT doc_id, text || ' updated' AS text, lang, source, 'u' AS op, 1 AS seq
FROM documents WHERE doc_id % 5 = 0
UNION ALL
SELECT doc_id, text || ' updated2' AS text, lang, source, 'u' AS op, 2 AS seq
FROM documents WHERE doc_id % 10 = 0
UNION ALL
SELECT doc_id, NULL AS text, NULL AS lang, NULL AS source, 'd' AS op, 3 AS seq
FROM documents WHERE doc_id % 7 = 3
UNION ALL
SELECT doc_id + 5000000 AS doc_id, text || ' new' AS text, lang, source,
       'u' AS op, 1 AS seq
FROM documents WHERE doc_id < 100
"""


def _changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.read_table(spark, sf_dir, "documents") \
        .select("doc_id", "text", "lang", "source")
    null_s = F.lit(None).cast("string")

    def wave(flt: str, text_col, lang_col, src_col, op: str, seq: int,
             key_col=None) -> DataFrame:
        return docs.filter(flt).select(
            (key_col if key_col is not None else F.col("doc_id"))
            .alias("doc_id"),
            text_col.alias("text"), lang_col.alias("lang"),
            src_col.alias("source"),
            F.lit(op).alias("op"), F.lit(seq).cast("int").alias("seq"))

    u1 = wave("doc_id % 5 = 0", F.concat("text", F.lit(" updated")),
              F.col("lang"), F.col("source"), "u", 1)
    u2 = wave("doc_id % 10 = 0", F.concat("text", F.lit(" updated2")),
              F.col("lang"), F.col("source"), "u", 2)
    dl = wave("doc_id % 7 = 3", null_s, null_s, null_s, "d", 3)
    ins = wave("doc_id < 100", F.concat("text", F.lit(" new")),
               F.col("lang"), F.col("source"), "u", 1,
               key_col=F.col("doc_id") + 5000000)
    return u1.unionByName(u2).unionByName(dl).unionByName(ins)


@register("cdc_apply_changes", f"""
WITH changes AS ({_CHANGES_SQL}),
latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY seq DESC, op DESC) AS rn
    FROM changes)
  WHERE rn = 1
)
SELECT d.doc_id, d.text, d.lang, d.source
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.doc_id = d.doc_id)
UNION ALL
SELECT doc_id, text, lang, source FROM latest WHERE op = 'u'
""")
def q_cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE over plain parquet: base documents + a synthesized
    change stream (updates, a second update wave, deletes, inserts) ->
    the merged snapshot. Latest-change dedup is WindowGroupLimit; the
    merge is one anti-join + union (change side broadcast — a CDC delta
    is tiny next to a 100 TB base, which then never shuffles)."""
    base = io.read_table(spark, sf_dir, "documents") \
        .select("doc_id", "text", "lang", "source")
    return cdc.apply_changes(base, _changes(spark, sf_dir), "doc_id",
                             broadcast_changes=True)


@register("cdc_scd2_intervals", f"""
WITH changes AS ({_CHANGES_SQL})
SELECT doc_id, op,
  CAST(seq AS BIGINT) AS valid_from_seq,
  CAST(lead(seq) OVER (PARTITION BY doc_id ORDER BY seq ASC, op ASC)
       AS BIGINT) AS valid_to_seq,
  (lead(seq) OVER (PARTITION BY doc_id ORDER BY seq ASC, op ASC) IS NULL
   AND op = 'u') AS is_current
FROM changes
""")
def q_cdc_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history table from the change stream: each change carries its
    [valid_from_seq, valid_to_seq) interval and an is_current flag
    (deletes close a key's history). One window per key — the same
    shuffle the latest-change dedup already pays."""
    out = cdc.scd2_intervals(_changes(spark, sf_dir), "doc_id")
    return out.select("doc_id", "op", "valid_from_seq", "valid_to_seq",
                      "is_current")
