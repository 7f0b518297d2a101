"""Property-based hardening of PARSE_SPEC (pure Python — no Spark).

Three invariant families, fuzzed with hypothesis:
1. The guarded fast paths in spec.normalize_fragment / split_sentences are
   byte-equal to the unguarded reference forms on ARBITRARY text.
2. The fixture round trip (text -> render_html -> parse_document) recovers
   extracted_text byte-identically for any single-space-separated word text
   (the documents.text shape).
3. parse_document never raises: any bytes input yields a Parsed row
   (parse_ok=False for undecodable input) — at 10^12 docs "never crashes
   the executor" is a correctness property, not a nicety.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from blog_parser_spark import spec


# --- reference (unguarded) forms --------------------------------------------

def _normalize_unguarded(raw: str) -> str:
    s = spec.TAG_STRIP_RE.sub("", raw)
    for ent, ch in spec.ENTITY_DECODE:
        s = s.replace(ent, ch)
    return spec.WS_RE.sub(" ", s).strip()


def _split_unguarded(paragraph: str) -> list[str]:
    out: list[str] = []
    for seg in spec.SENTENCE_SPLIT_RE.split(paragraph):
        if not seg:
            continue
        if out and out[-1].endswith(spec.ABBREVIATIONS):
            out[-1] = out[-1] + " " + seg
        else:
            out.append(seg)
    return out


# fragments biased toward the constructs the guards dispatch on
_fragment = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ09 .!?\t\n\r\f\v\xa0") + ["<", ">", "&", "/"]),
    max_size=120)
_freeform = st.text(max_size=120)


@settings(max_examples=300, deadline=None)
@given(st.one_of(_fragment, _freeform))
def test_normalize_guarded_equals_unguarded(raw):
    assert spec.normalize_fragment(raw) == _normalize_unguarded(raw)


@settings(max_examples=300, deadline=None)
@given(st.one_of(_fragment, _freeform))
def test_split_guarded_equals_unguarded(p):
    assert spec.split_sentences(p) == _split_unguarded(p)


# words like the fixture generator produces: no whitespace, no angle
# brackets pre-escape is handled by render_html, so allow & < > too
_word = st.text(
    alphabet=st.characters(blacklist_categories=("Zs", "Zl", "Zp", "Cc", "Cs")),
    min_size=1, max_size=12)


@settings(max_examples=200, deadline=None)
@given(st.lists(_word, min_size=1, max_size=60))
def test_render_parse_round_trip_byte_identity(words):
    text = " ".join(words)
    parsed = spec.parse_document(spec.render_html(text))
    assert parsed.parse_ok
    assert parsed.extracted_text == text


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200))
def test_parse_document_total_on_arbitrary_bytes(data):
    parsed = spec.parse_document(data)
    assert isinstance(parsed.parse_ok, bool)
    if not parsed.parse_ok:
        assert parsed.parse_err


# --- WARC container grammar (round 4) ----------------------------------------

_warc_url = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126,
                           exclude_characters="\r\n"),
    min_size=1, max_size=60)
# arbitrary payload bytes — explicitly including CRLFs and the WARC magic,
# which the Content-Length framing must tunnel through unharmed
_warc_payload = st.one_of(
    st.binary(max_size=200),
    st.just(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"),
    st.binary(max_size=40).map(lambda b: b + b"\r\n\r\n" + b))


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(_warc_url, _warc_payload), max_size=8))
def test_warc_render_parse_round_trip(recs):
    """parse(render(records)) == records for ARBITRARY payload bytes —
    the framing is length-delimited, so no payload content (CRLFs, the
    version magic, partial headers) can desync the walk or corrupt a
    neighbor record."""
    date = "2024-05-06T07:08:09Z"
    data = spec.render_warc_file([(u, date, p) for u, p in recs])
    parsed, err = spec.parse_warc_file(data)
    assert err is None
    assert [(r.url, r.payload) for r in parsed] == [(u, p) for u, p in recs]
    # offsets are strictly increasing and in-bounds
    offs = [r.offset for r in parsed]
    assert offs == sorted(set(offs)) and all(0 <= o < len(data) for o in offs)


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_warc_parse_never_crashes_on_corruption(data):
    """Arbitrary single-site corruption of a valid archive (byte flip,
    truncation, insertion) must never raise, always terminate, and —
    when it reports an error — report a position no later than the
    corruption site's record."""
    date = "2024-05-06T07:08:09Z"
    recs = [(f"u{i}", date, bytes([65 + i]) * (i + 1)) for i in range(4)]
    base = spec.render_warc_file(recs)
    mode = data.draw(st.sampled_from(["flip", "truncate", "insert"]))
    pos = data.draw(st.integers(min_value=0, max_value=len(base) - 1))
    if mode == "flip":
        b = data.draw(st.integers(min_value=0, max_value=255))
        corrupted = base[:pos] + bytes([b]) + base[pos + 1:]
    elif mode == "truncate":
        corrupted = base[:pos]
    else:
        chunk = data.draw(st.binary(min_size=1, max_size=8))
        corrupted = base[:pos] + chunk + base[pos:]

    parsed, err = spec.parse_warc_file(corrupted)   # must not raise
    # every record returned is framed from within the data
    for r in parsed:
        assert 0 <= r.offset < len(corrupted)
    # a clean parse of a FLIPPED archive may legitimately succeed (the
    # flip landed in a payload/header value) — but then any payload
    # damage must be caught by the per-record digest
    if mode == "flip" and err is None and corrupted != base:
        texts_ok = [r.payload for r in parsed] == [p for _, _, p in recs]
        digests_flag = any(r.digest_err for r in parsed)
        headers_changed = len(parsed) != len(recs) or any(
            r.url != u or r.warc_date != d
            for r, (u, d, _) in zip(parsed, recs))
        assert texts_ok or digests_flag or headers_changed


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_warc_url, _warc_payload), max_size=8))
def test_warc_gz_render_parse_round_trip(recs):
    """The per-record-gzip layout tunnels the same arbitrary payloads:
    parse(render(records)) == records, member offsets strictly
    increasing, and every offset is independently seekable (parsing the
    suffix at an offset yields that record first — the property a
    CC-style index relies on)."""
    date = "2024-05-06T07:08:09Z"
    data = spec.render_warc_gz_file([(u, date, p) for u, p in recs])
    parsed, err = spec.parse_warc_gz_file(data)
    assert err is None
    assert [(r.url, r.payload) for r in parsed] == [(u, p) for u, p in recs]
    offs = [r.offset for r in parsed]
    assert offs == sorted(set(offs)) and all(0 < o < len(data) for o in offs)
    if parsed:
        tail, terr = spec.parse_warc_gz_file(data[parsed[-1].offset:])
        assert terr is None and tail[0].payload == parsed[-1].payload


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_warc_gz_parse_never_crashes_on_corruption(data):
    """Arbitrary single-site corruption of a valid .warc.gz (byte flip,
    truncation, insertion) must never raise and must terminate; damage
    that survives gzip's CRC AND the WARC framing must still be caught
    by the per-record payload digest."""
    date = "2024-05-06T07:08:09Z"
    recs = [(f"u{i}", date, bytes([65 + i]) * (i + 1)) for i in range(4)]
    base = spec.render_warc_gz_file(recs)
    mode = data.draw(st.sampled_from(["flip", "truncate", "insert"]))
    pos = data.draw(st.integers(min_value=0, max_value=len(base) - 1))
    if mode == "flip":
        b = data.draw(st.integers(min_value=0, max_value=255))
        corrupted = base[:pos] + bytes([b]) + base[pos + 1:]
    elif mode == "truncate":
        corrupted = base[:pos]
    else:
        chunk = data.draw(st.binary(min_size=1, max_size=8))
        corrupted = base[:pos] + chunk + base[pos:]

    parsed, err = spec.parse_warc_gz_file(corrupted)   # must not raise
    for r in parsed:
        assert 0 <= r.offset < len(corrupted)
    if mode == "flip" and err is None and corrupted != base:
        texts_ok = [r.payload for r in parsed] == [p for _, _, p in recs]
        digests_flag = any(r.digest_err for r in parsed)
        headers_changed = len(parsed) != len(recs) or any(
            r.url != u or r.warc_date != d
            for r, (u, d, _) in zip(parsed, recs))
        assert texts_ok or digests_flag or headers_changed


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_warc_url, _warc_payload), max_size=8),
       st.integers(min_value=0, max_value=10))
def test_warc_max_records_is_exact_prefix(recs, k):
    """The seek primitive's contract: parsing with max_records=k returns
    EXACTLY the first k records of the full parse (url, payload, offset
    all equal) with err None once k records were found — for both the
    plain and the per-record-gzip layout."""
    date = "2024-05-06T07:08:09Z"
    triples = [(u, date, p) for u, p in recs]
    for render, parse in ((spec.render_warc_file, spec.parse_warc_file),
                          (spec.render_warc_gz_file,
                           spec.parse_warc_gz_file)):
        data = render(triples)
        full, err_full = parse(data)
        assert err_full is None
        got, err = parse(data, max_records=k)
        key = [(r.url, r.payload, r.offset) for r in got]
        want = [(r.url, r.payload, r.offset) for r in full[:k]]
        assert key == want
        assert err is None
