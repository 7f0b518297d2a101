"""Hand-written adversarial parse fixtures (FIXTURES.md §B pages_adversarial).

Each row has the `pages` schema; for valid rows `text` holds the expected
byte-exact extraction, for invalid-UTF-8 rows `text` is None and
parse_ok=False is expected. Pure Python — used by both pytest and the
Spark test harness (parallelize -> createDataFrame).
"""

from __future__ import annotations

from datetime import datetime
from typing import Any


def _row(i: int, html: bytes, text: str | None, lang: str = "en",
         url: str | None = None, ts: datetime | None = None) -> dict[str, Any]:
    return {
        "url": url or f"https://adv.example.com/post/{i}",
        "warc_ts": ts or datetime(2024, 3, 1, 12, 0, i),
        "html": html,
        "text": text,
        "lang": lang,
    }


def adversarial_pages() -> list[dict[str, Any]]:
    rows = [
        # 0: plain happy path
        _row(0, b"<html><body><h1>Hello World</h1><p>One two three.</p></body></html>",
             "Hello World One two three."),
        # 1: nested inline tags inside <p> are stripped
        _row(1, b"<html><body><h1>T</h1><p>a <b>bold</b> and <i>ital</i> word</p></body></html>",
             "T a bold and ital word"),
        # 2: HTML entities decoded (amp last)
        _row(2, b"<html><body><h1>E</h1><p>x &amp; y &lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b &amp;lt;</p></body></html>",
             "E x & y <tag> \"q\" 's' a b &lt;"),
        # 3: empty <p></p> dropped
        _row(3, b"<html><body><h1>T</h1><p></p><p>kept</p><p>   </p></body></html>",
             "T kept"),
        # 4: no <h1> -> title falls back to <title>
        _row(4, b"<html><head><title>Fallback Title</title></head><body><p>body</p></body></html>",
             "Fallback Title body"),
        # 5: whitespace runs / newlines inside tags collapse to single spaces
        _row(5, b"<html><body><h1>A\n\t  B</h1><p>c\r\n d   e</p></body></html>",
             "A B c d e"),
        # 6: CRLF between tags, attributes on tags
        _row(6, b"<html>\r\n<body>\r\n<h1 class=\"x\">T</h1>\r\n<p id='p1'>line one</p>\r\n</body></html>",
             "T line one"),
        # 7: h2 and h3 collected in document order, interleaved with p
        _row(7, b"<html><body><h1>T</h1><h2>H2a</h2><p>p1</p><h3>H3</h3><p>p2</p><h2>H2b</h2></body></html>",
             "T H2a H3 H2b p1 p2"),
        # 8: sentence-splitter trap: abbreviation guard
        _row(8, b"<html><body><h1>S</h1><p>See e.g. the spec. It works! Done?</p></body></html>",
             "S See e.g. the spec. It works! Done?"),
        # 9: Mr. guard
        _row(9, b"<html><body><h1>S</h1><p>Mr. Smith went home. He slept.</p></body></html>",
             "S Mr. Smith went home. He slept."),
        # 10: invalid UTF-8 -> parse_ok=false, text NULL
        _row(10, b"<html><body><h1>T</h1><p>bad \xff\xfe bytes</p></body></html>", None),
        # 11: more invalid UTF-8 (truncated multibyte)
        _row(11, b"<html><body><p>trunc \xe2\x82</p></body></html>", None),
        # 12+13: duplicate url, two warc_ts — dedup-latest must keep 13
        _row(12, b"<html><body><h1>Old</h1><p>old body</p></body></html>", "Old old body",
             url="https://adv.example.com/dup", ts=datetime(2024, 3, 1, 0, 0, 0)),
        _row(13, b"<html><body><h1>New</h1><p>new body</p></body></html>", "New new body",
             url="https://adv.example.com/dup", ts=datetime(2024, 3, 2, 0, 0, 0)),
        # 14: no title at all
        _row(14, b"<html><body><p>only paragraph</p></body></html>", "only paragraph"),
        # 15: unicode content (valid UTF-8, multibyte)
        _row(15, "<html><body><h1>Zürich</h1><p>naïve café — 東京</p></body></html>".encode(),
             "Zürich naïve café — 東京", lang="de"),
        # 16: uppercase tags matched case-insensitively
        _row(16, b"<HTML><BODY><H1>Caps</H1><P>upper tags</P></BODY></HTML>",
             "Caps upper tags"),
        # 17: multiline paragraph spanning newlines (re.S)
        _row(17, b"<html><body><h1>M</h1><p>first\nsecond\nthird</p></body></html>",
             "M first second third"),
        # 18: empty document
        _row(18, b"<html><body></body></html>", ""),
        # 19: null html
        _row(19, None, None),  # type: ignore[arg-type]
        # 20: vs. guard plus multiple sentences
        _row(20, b"<html><body><h1>V</h1><p>Spark vs. Flink wins. Really.</p></body></html>",
             "V Spark vs. Flink wins. Really."),
    ]
    return rows


def expected_sentence_counts() -> dict[str, int]:
    """url -> expected n_sentences for adversarial rows (paragraphs only)."""
    return {
        "https://adv.example.com/post/8": 3,   # guard merges 'e.g. the spec.'
        "https://adv.example.com/post/9": 2,   # guard merges 'Mr. Smith...'
        "https://adv.example.com/post/20": 2,  # guard merges 'vs. Flink wins.'
        "https://adv.example.com/post/18": 0,
    }
