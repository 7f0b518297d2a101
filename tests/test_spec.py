"""PARSE_SPEC v1 unit tests — pure Python, no Spark (SURVEY.md §7 step 1)."""

from __future__ import annotations

import duckdb
import pytest

from blog_parser_spark import oracle, spec
from blog_parser_spark.sources.fixtures import adversarial_pages, expected_sentence_counts

SF_DIR = "/root/testdata/sf0.001"


def _documents(sf_dir: str = SF_DIR) -> list[dict]:
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text, lang, source FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    return [dict(zip(("doc_id", "text", "lang", "source"), r)) for r in rows]


def test_round_trip_byte_identity_sf0001():
    """render_html -> parse_document recovers `text` byte-identically for
    every fixture document (the flagship per-row invariant, BASELINE.json:15)."""
    docs = _documents()
    assert len(docs) == 500
    for d in docs:
        p = spec.parse_document(spec.render_html(d["text"]))
        assert p.parse_ok
        assert p.extracted_text == d["text"], f"doc_id={d['doc_id']}"


def test_round_trip_edge_word_counts():
    # exercise every layout boundary: 0..3 paragraphs, missing h2s
    for n in [0, 1, 7, 8, 9, 11, 12, 13, 15, 16, 17, 55, 56, 57, 95, 96, 97, 136, 137]:
        text = " ".join(f"w{i}" for i in range(n))
        p = spec.parse_document(spec.render_html(text))
        assert p.extracted_text == text, f"n_words={n}"


def test_adversarial_extractions():
    for row in adversarial_pages():
        p = spec.parse_document(row["html"])
        if row["text"] is None and row["html"] is not None:
            assert not p.parse_ok, row["url"]
        elif row["html"] is None:
            assert not p.parse_ok and p.parse_err == "null html"
        else:
            assert p.parse_ok, row["url"]
            assert p.extracted_text == row["text"], row["url"]


def test_sentence_counts():
    exp = expected_sentence_counts()
    by_url = {r["url"]: r for r in adversarial_pages()}
    for url, n in exp.items():
        p = spec.parse_document(by_url[url]["html"])
        assert p.n_sentences == n, url


def test_sentence_split_guards():
    assert spec.split_sentences("See e.g. the spec. It works! Done?") == [
        "See e.g. the spec.", "It works!", "Done?"]
    assert spec.split_sentences("Mr. Smith went home. He slept.") == [
        "Mr. Smith went home.", "He slept."]
    assert spec.split_sentences("") == []
    assert spec.split_sentences("no terminal punctuation") == ["no terminal punctuation"]


def test_entity_decode_order():
    assert spec.normalize_fragment("&amp;lt;") == "&lt;"
    assert spec.normalize_fragment("&amp;amp;") == "&amp;"
    assert spec.normalize_fragment("a&nbsp;&nbsp;b") == "a b"


def test_render_deterministic():
    t = "alpha beta gamma delta " * 20
    t = t.strip()
    assert spec.render_html(t) == spec.render_html(t)


def test_oracle_pipeline_shapes():
    docs = _documents()
    pages = [oracle.document_to_page(d) for d in docs]
    routed, agg = oracle.run_pipeline(pages)
    assert len(routed) == 500  # urls unique -> dedup is identity
    assert all(r["sink"] in oracle.SINKS for r in routed)
    assert sum(a["docs"] for a in agg) == 500
    assert sum(a["bytes"] for a in agg) == sum(len(p["html"]) for p in pages)
    # every routed row's extracted text is byte-identical to ground truth
    by_url = {oracle.page_url(d["source"], d["doc_id"]): d["text"] for d in docs}
    for r in routed:
        assert r["extracted_text"] == by_url[r["url"]]


def test_oracle_dedup_latest():
    rows = [r for r in adversarial_pages() if r["url"] == "https://adv.example.com/dup"]
    routed, _ = oracle.run_pipeline(rows)
    assert len(routed) == 1
    assert routed[0]["extracted_text"] == "New new body"


def test_links_render_extract_round_trip():
    # extract(render(text, doc_id)) == the closed-form targets, and adding
    # the nav block leaves text extraction bit-identical
    for d in _documents()[:50]:
        with_links = spec.render_html(d["text"], doc_id=d["doc_id"])
        plain = spec.render_html(d["text"])
        assert spec.extract_links(with_links) == \
            [spec.link_url(t) for t in spec.link_targets(d["doc_id"])]
        assert spec.extract_links(plain) == []
        assert (spec.parse_document(with_links).extracted_text
                == spec.parse_document(plain).extracted_text == d["text"])


def test_links_grammar_edges():
    assert spec.extract_links(None) == []
    assert spec.extract_links(b"\xff\xfe<a href=\"x\">") == []  # bad utf-8
    html = (b'<a href="https://a/1">x</a>'
            b"<a href='https://b/2'>single-quoted: not grammar</a>"
            b'<A HREF="https://c/3">uppercase: not grammar</A>'
            b'<a  href="https://d/4">double space: not grammar</a>'
            b'<a href="">empty ok</a>')
    assert spec.extract_links(html) == ["https://a/1", ""]


def test_anchor_grammar():
    # inner tags stripped, entities decoded, whitespace collapsed
    html = (b'<a href="https://a/1"><b>Bold</b>  link</a>'
            b'<a href="https://b/2">A &amp; B</a>'
            b'<a href="https://c/3"></a>')  # empty anchor text kept as ""
    assert spec.extract_anchors(html) == [
        ("https://a/1", "Bold link"),
        ("https://b/2", "A & B"),
        ("https://c/3", ""),
    ]
    assert spec.extract_anchors(None) == []
    assert spec.extract_anchors(b"\xff\xfe<a href=\"x\">y</a>") == []


def test_rich_anchors_render_round_trip():
    # rich anchors change ONLY the nav block: text extraction stays
    # bit-identical, hrefs unchanged, anchor text is the closed form
    for d in _documents()[:50]:
        rich = spec.render_html(d["text"], doc_id=d["doc_id"], rich_anchors=True)
        assert spec.parse_document(rich).extracted_text == d["text"]
        assert spec.extract_links(rich) == \
            [spec.link_url(t) for t in spec.link_targets(d["doc_id"])]
        assert spec.extract_anchors(rich) == \
            [(spec.link_url(t), spec.anchor_text(t))
             for t in spec.link_targets(d["doc_id"])]
    # default byte stream is pinned: rich_anchors=False reproduces it
    d = _documents()[0]
    assert (spec.render_html(d["text"], doc_id=d["doc_id"])
            == spec.render_html(d["text"], doc_id=d["doc_id"], rich_anchors=False))


def test_canonical_grammar():
    d = _documents()[:9]
    for row in d:
        html = spec.render_html(row["text"], doc_id=row["doc_id"],
                                with_canonical=True)
        # round-trip invariance: the head link is invisible to extraction
        assert spec.parse_document(html).extracted_text == row["text"]
        assert spec.extract_canonical(html) == spec.canonical_target(row["doc_id"])
    # group roots declare none; members point at the root's target
    assert spec.canonical_target(0) is None
    assert spec.canonical_target(4) == spec.canonical_url(3)
    assert spec.canonical_target(5) == spec.canonical_url(3)
    assert spec.extract_canonical(None) is None
    assert spec.extract_canonical(b"<html></html>") is None
    assert spec.extract_canonical(b"\xff\xfe") is None


def test_hreflang_alternates_grammar():
    for d in _documents()[:20]:
        html = spec.render_html(d["text"], doc_id=d["doc_id"],
                                with_alternates=True)
        assert spec.parse_document(html).extracted_text == d["text"]
        assert spec.extract_alternates(html) == [
            (lang, spec.alternate_url(lang, d["doc_id"]))
            for lang in spec.ALT_LANGS]
        plain = spec.render_html(d["text"], doc_id=d["doc_id"])
        assert spec.extract_alternates(plain) == []
    assert spec.extract_alternates(None) == []
    assert spec.extract_alternates(b"\xff\xfe") == []
