"""Adversarial-input contract of the landing-zone readers, pinned
against the checked-in fuzz corpus (tests/fuzz_corpus/): truncated
UTF-8 sequences, schema-drift rows (wrong types, extra/nested fields),
torn lines, stray high bytes, embedded newlines in quoted CSV fields,
wrong column counts. The invariant is CONSERVATION: every physical
input line is accounted for as either a clean row or a quarantine row
(`_corrupt` non-null) — zero silent drops — and each corruption class
lands where this test says it does."""

from __future__ import annotations

from pyspark.sql.types import LongType, StringType, StructField, StructType

from blog_parser_spark.sources import io
from tests.conftest import FUZZ_DIR

SCHEMA = StructType([StructField("doc_id", LongType(), True),
                     StructField("text", StringType(), True)])
REPL = "�"  # UTF-8 replacement char


def test_jsonl_fuzz_corpus_conserved_and_quarantined(spark):
    got = io.read_jsonl(spark, f"{FUZZ_DIR}/landing.jsonl", SCHEMA).collect()
    # 8 physical lines -> 8 rows, nothing silently dropped
    assert len(got) == 8
    clean = {r["doc_id"]: r["text"] for r in got if r["_corrupt"] is None}
    bad = [r for r in got if r["_corrupt"] is not None]
    # clean: two plain rows, the unicode row, and the extra-field row
    # (PERMISSIVE ignores drift columns)
    assert clean == {1: "ok", 2: "héllo ✓", 4: "x", 8: "tail"}
    assert len(bad) == 4
    by_corrupt = {r["_corrupt"]: r for r in bad}
    # truncated UTF-8 mid-string: quarantined, raw retained with the
    # replacement char, parseable prefix fields still extracted
    tr = by_corrupt['{"doc_id": 3, "text": "tr' + REPL + '"}']
    assert tr["doc_id"] == 3 and tr["text"] is None
    # wrong-typed field: quarantined, other fields still extracted
    wt = by_corrupt['{"doc_id": "abc", "text": "y"}']
    assert wt["doc_id"] is None and wt["text"] == "y"
    # torn line and stray high bytes: fully null + quarantined
    assert by_corrupt['{"doc_id": 6, "text": "unterminated']["doc_id"] is None
    assert by_corrupt[REPL * 2 + '{"doc_id": 7}']["doc_id"] is None


def test_csv_fuzz_corpus_conserved_and_quarantined(spark):
    got = io.read_csv_strict(spark, f"{FUZZ_DIR}/landing.csv",
                             SCHEMA).collect()
    # 7 physical data lines (the quoted-newline row spans two) -> 7 rows
    assert len(got) == 7
    clean = {r["doc_id"]: r["text"] for r in got if r["_corrupt"] is None}
    bad = {r["_corrupt"]: r for r in got if r["_corrupt"] is not None}
    # the documented non-multiline contract: the quoted-newline head
    # fragment parses CLEAN but TRUNCATED ("two", not "two\nlines"),
    # its tail fragment is quarantined — detectable, not silent;
    # truncated UTF-8 passes through CSV as replacement chars (CSV is
    # encoding-agnostic, no structural damage)
    assert clean == {1: "ok", 2: "two", 5: "tr" + REPL, 6: "tail"}
    assert set(bad) == {'lines"', "3,a,b,c", "abc,x"}
    assert bad["3,a,b,c"]["doc_id"] == 3      # extra columns: prefix kept
    assert bad["abc,x"]["text"] == "x"        # wrong type: rest kept


def test_csv_multiline_mode_parses_quoted_newlines_exactly(spark):
    got = io.read_csv_strict(spark, f"{FUZZ_DIR}/landing.csv", SCHEMA,
                             multiline=True).collect()
    clean = {r["doc_id"]: r["text"] for r in got if r["_corrupt"] is None}
    # the embedded-newline field now round-trips byte-exactly
    assert clean[2] == "two\nlines"
    assert clean[1] == "ok" and clean[6] == "tail"
    # conservation still holds: 6 logical rows, the two malformed ones
    # still quarantined
    assert len(got) == 6
    assert sum(r["_corrupt"] is not None for r in got) == 2
