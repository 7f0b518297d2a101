"""WARC archive source/sink — ingest for Common-Crawl-style page archives.

The north star's corpus is "Common-Crawl-style web pages"; Common Crawl
ships as WARC files (many ~1 GB archives, each a concatenation of
warcinfo/request/response records). This module is the Spark plumbing
around the grammar pinned in spec.py (render_warc_file/parse_warc_file —
one source of truth for both directions):

- pack_warc_files: pages -> (warc_file, content) archive rows. Fixture
  synthesis and export packer; grouping is a pure function of the url's
  doc id, so the layout is byte-reproducible and the DuckDB oracle can
  derive it in closed form.
- read_warc: (warc_file, content) -> page rows + loud quarantine. The
  production ingest is `spark.read.format("binaryFile").load(".../*.warc")`
  feeding this same transform — parallelism is per-file (the natural WARC
  unit: ~1 GB each, so 100 TB = ~10^5 well-sized tasks with no shuffle at
  all; .warc.gz members would gunzip inside the same map stage).

Scale shape: both directions are ONE Arrow-batched Python stage and zero
shuffles beyond pack's groupBy on file id. Payload bytes cross Arrow
once; a malformed file never throws — it yields its good prefix plus a
position-stamped quarantine row (url NULL, warc_err set), so corrupt
archives are counted, never silently dropped (same contract as the
JSONL/CSV landing readers in io.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType, TimestampType,
)

from .. import spec

WARC_FILE_SCHEMA = StructType([
    StructField("warc_file", StringType(), False),
    StructField("content", BinaryType(), False),
])

WARC_RECORD_SCHEMA = StructType([
    StructField("url", StringType(), True),        # NULL on quarantine rows
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("warc_file", StringType(), False),
    StructField("rec_offset", LongType(), True),
    StructField("warc_err", StringType(), True),   # set only on quarantine rows
])

_DOC_ID_RE = r"/post/(\d+)$"


def _fmt_warc_date(ts) -> str:
    return pd.Timestamp(ts).strftime(spec.WARC_DATE_FMT)


def _parse_warc_date(s: str) -> datetime:
    # Session timezone is UTC everywhere (conftest/session.py), so the
    # naive datetime round-trips the fixture's TIMESTAMP_NTZ exactly.
    return datetime.strptime(s, spec.WARC_DATE_FMT)


def pack_warc_files(pages: DataFrame, docs_per_file: int = 25) -> DataFrame:
    """pages(url, warc_ts, html) -> (warc_file, content) WARC archives.

    File assignment = doc_id // docs_per_file (closed form — the oracle
    side can reproduce it); records are laid out in doc_id order within a
    file and each file opens with a warcinfo record, so readers must
    demonstrably skip non-response records. One shuffle (the groupBy on
    file id); file bytes are assembled per group in a single Arrow stage.
    """
    def render(key, pdf):
        pdf = pdf.sort_values("_doc_id")
        recs = [(r.url, _fmt_warc_date(r.warc_ts), bytes(r.html))
                for r in pdf.itertuples()]
        name = f"crawl-{int(key[0]):06d}.warc"
        return pd.DataFrame({"warc_file": [name],
                             "content": [spec.render_warc_file(recs)]})

    keyed = pages.withColumn(
        "_doc_id", F.regexp_extract("url", _DOC_ID_RE, 1).cast("long"))
    return (keyed
            .groupBy((F.col("_doc_id") / docs_per_file).cast("long").alias("_fid"))
            .applyInPandas(render, WARC_FILE_SCHEMA))


def pack_wet_files(extracted: DataFrame, docs_per_file: int = 25) -> DataFrame:
    """(url, warc_ts, extracted_text) -> WET files: the extracted-text
    sibling of the page archive (Common Crawl's WARC/WAT/WET triple —
    WET IS the WARC container holding conversion records whose payload
    is the extracted UTF-8 text). Same closed-form file layout as
    pack_warc_files so the oracle can reproduce it."""
    def render(key, pdf):
        pdf = pdf.sort_values("_doc_id")
        recs = [(r.url, _fmt_warc_date(r.warc_ts),
                 r.extracted_text.encode("utf-8"))
                for r in pdf.itertuples()]
        name = f"extract-{int(key[0]):06d}.warc.wet"
        return pd.DataFrame({"warc_file": [name],
                             "content": [spec.render_warc_file(
                                 recs, rec_type="conversion")]})

    keyed = extracted.withColumn(
        "_doc_id", F.regexp_extract("url", _DOC_ID_RE, 1).cast("long"))
    return (keyed
            .groupBy((F.col("_doc_id") / docs_per_file).cast("long").alias("_fid"))
            .applyInPandas(render, WARC_FILE_SCHEMA))


def read_warc(files: DataFrame, rec_type: str = "response") -> DataFrame:
    """(warc_file, content) -> one row per rec_type record (+ quarantine).
    rec_type="response" reads page archives (payload -> html column);
    "conversion" reads WET text files (payload = the UTF-8 extracted
    text, still returned in the binary html slot — decode at the caller,
    which knows the type it asked for).

    Each archive is parsed binary-safely via Content-Length framing
    (spec.parse_warc_file). A framing error emits the file's good prefix
    AND one quarantine row carrying the position-stamped reason — the
    resume/metrics story is identical to the landing-zone readers: count
    failures, never silently drop bytes.
    """
    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["warc_file"], pdf["content"]):
                recs, err = spec.parse_warc_file(bytes(content), rec_type=rec_type)
                rows.extend((r.url, _parse_warc_date(r.warc_date), r.payload,
                             name, r.offset, None) for r in recs)
                if err is not None:
                    rows.append((None, None, None, name, None, err))
            yield pd.DataFrame(rows, columns=[f.name for f in WARC_RECORD_SCHEMA])

    return files.mapInPandas(parse, WARC_RECORD_SCHEMA)
