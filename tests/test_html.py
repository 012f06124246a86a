"""HTML → text extraction (edkray/ops/html.py): the input_hint's
byte-identity contract, exercised batch-local (no Ray needed — the stage
is a plain callable class; the distributed path is covered by the
html_extract query in tools/selfcheck and test_entry)."""

from __future__ import annotations

import pyarrow as pa

from edkray.ops.html import HtmlExtract, decode_utf8_column


def _extract(payloads: list[bytes | None]) -> list[str | None]:
    t = pa.table({"html": pa.array(payloads, type=pa.binary())})
    return HtmlExtract()(t)["extracted"].to_pylist()


class TestHtmlExtract:
    def test_script_style_comment_blocks_dropped(self):
        h = (b"<html><script>if (1<2) { alert('<p>not text</p>'); }</script>"
             b"<STYLE media='all'>.x > .y { }</STYLE><!-- <b>hidden</b> -->"
             b"<body>kept</body></html>")
        assert _extract([h]) == ["kept"]

    def test_script_block_case_insensitive_and_multiline(self):
        h = b"<ScRiPt type='x'>\nline1\nline2 < 3\n</sCrIpT>after"
        assert _extract([h]) == ["after"]

    def test_tags_become_single_space_and_whitespace_collapses(self):
        h = b"<div>a</div><p>b\n\n  c</p>\t<span>d</span>"
        assert _extract([h]) == ["a b c d"]

    def test_named_entities_single_pass(self):
        # &amp;lt; decodes ONCE to the literal string "&lt;" (chain order:
        # &amp; last), matching the HTML single-decode rule
        h = b"x &lt;y&gt; &quot;z&quot; it&#39;s &apos;w&apos;&nbsp;! &amp;lt; &amp; done"
        assert _extract([h]) == ['x <y> "z" it\'s \'w\' ! &lt; & done']

    def test_numeric_entities_decimal_and_hex(self):
        assert _extract([b"&#72;&#101;&#x6C;&#x6C;&#111;"]) == ["Hello"]

    def test_numeric_entity_out_of_range_kept_verbatim(self):
        assert _extract([b"a &#1114112; b"]) == ["a &#1114112; b"]

    def test_invalid_utf8_falls_back_to_replace(self):
        h = b"<p>ok \xff\xfe bytes</p>"
        out = _extract([h])
        assert out[0].startswith("ok ") and out[0].endswith(" bytes")
        assert "�" in out[0]

    def test_null_and_empty_rows(self):
        assert _extract([None, b"", b"   \n "]) == [None, "", ""]

    def test_string_input_passthrough(self):
        t = pa.table({"html": pa.array(["<b>pre-decoded</b>"], type=pa.string())})
        assert HtmlExtract()(t)["extracted"].to_pylist() == ["pre-decoded"]

    def test_large_binary_decodes(self):
        t = pa.table({"html": pa.array([b"<i>big</i>"], type=pa.large_binary())})
        t = decode_utf8_column(t, "html")
        assert pa.types.is_large_string(t["html"].type)

    def test_passthrough_columns_preserved(self):
        t = pa.table({
            "url": pa.array(["u1", "u2"]),
            "html": pa.array([b"<p>a</p>", b"<p>b</p>"], type=pa.binary()),
        })
        out = HtmlExtract()(t)
        assert out.column_names == ["url", "html", "extracted"]
        assert out["extracted"].to_pylist() == ["a", "b"]

    def test_out_col_upserts_existing(self):
        t = pa.table({
            "html": pa.array([b"<p>x</p>"], type=pa.binary()),
            "extracted": pa.array(["stale"]),
        })
        out = HtmlExtract()(t)
        assert out["extracted"].to_pylist() == ["x"]
        assert out.column_names.count("extracted") == 1


class TestExtractLinks:
    """ops/html.py:extract_links — pinned href spec."""

    def _run(self, ray_session, rows):
        import pyarrow as pa
        import ray.data

        from edkray.ops.html import extract_links

        t = pa.table({
            "url": pa.array([r[0] for r in rows], type=pa.string()),
            "html": pa.array([r[1].encode() for r in rows], type=pa.binary()),
        })
        out = extract_links(ray.data.from_arrow(t)).to_pandas()
        if len(out) == 0:
            return []
        return list(zip(out["src"], out["dst"]))

    def test_absolute_and_root_relative(self, ray_session):
        got = self._run(ray_session, [(
            "https://a.x/p",
            '<a href="https://b.y/1">n</a><a href="/r/2">r</a>',
        )])
        assert got == [("https://a.x/p", "https://b.y/1"),
                       ("https://a.x/p", "https://a.x/r/2")]

    def test_dropped_variants(self, ray_session):
        got = self._run(ray_session, [(
            "https://a.x/p",
            "<a href='sq.html'>s</a><a href=\"#f\">f</a>"
            '<a href="mailto:z@y">m</a><a href="rel.html">p</a>',
        )])
        # mailto: is not http(s):// and not root-relative -> dropped
        assert got == []

    def test_caps_tag_and_duplicates(self, ray_session):
        got = self._run(ray_session, [(
            "https://a.x/p",
            '<A HREF="/c/1">c</A><a id="z" href="/c/1">again</a>',
        )])
        assert got == [("https://a.x/p", "https://a.x/c/1")] * 2

    def test_unparseable_src_drops_relative_keeps_absolute(self, ray_session):
        got = self._run(ray_session, [(
            "not a url",
            '<a href="/r/1">r</a><a href="https://b.y/1">n</a>',
        )])
        assert got == [("not a url", "https://b.y/1")]

    def test_protocol_relative_dropped(self, ray_session):
        # '//cdn.example/x' must NOT resolve as root-relative (it would
        # produce a malformed 'https://a.x//cdn.example/x' dst).
        got = self._run(ray_session, [(
            "https://a.x/p",
            '<a href="//cdn.example/x">c</a><a href="/ok">k</a>',
        )])
        assert got == [("https://a.x/p", "https://a.x/ok")]


class TestExtractAnchorTexts:
    """ops/html.py:extract_anchor_texts — (dst, anchor) pinned spec."""

    def _run(self, ray_session, rows):
        import pyarrow as pa
        import ray.data

        from edkray.ops.html import extract_anchor_texts

        t = pa.table({
            "url": pa.array([r[0] for r in rows], type=pa.string()),
            "html": pa.array([r[1].encode() for r in rows], type=pa.binary()),
        })
        out = extract_anchor_texts(ray.data.from_arrow(t)).to_pandas()
        if len(out) == 0:
            return []
        return list(zip(out["dst"], out["anchor"]))

    def test_pairs_and_resolution(self, ray_session):
        got = self._run(ray_session, [(
            "https://a.x/p",
            '<a href="https://b.y/1" rel="next">one</a><a href="/r">two</a>',
        )])
        assert got == [("https://b.y/1", "one"), ("https://a.x/r", "two")]

    def test_nested_tag_anchor_skipped(self, ray_session):
        got = self._run(ray_session, [(
            "https://a.x/p",
            '<a href="/n"><b>bold</b></a><a href="/ok">plain</a>',
        )])
        assert got == [("https://a.x/ok", "plain")]

    def test_empty_anchor_text_kept(self, ray_session):
        got = self._run(ray_session, [("https://a.x/p", '<a href="/e"></a>')])
        assert got == [("https://a.x/e", "")]

    def test_protocol_relative_dropped(self, ray_session):
        got = self._run(ray_session, [(
            "https://a.x/p",
            '<a href="//cdn.example/x">cdn</a><a href="/ok">k</a>',
        )])
        assert got == [("https://a.x/ok", "k")]


class TestExtractTitle:
    """<title> extraction contract (ops/html.py:extract_title)."""

    def test_first_match_entities_whitespace_null(self, ray_session):
        import ray.data

        from edkray.ops.html import extract_title

        ds = ray.data.from_items([
            {"html": b"<html><head><TITLE>\n Doc &amp;\t7 </TITLE></head>"
                     b"<title>second</title></html>"},   # first match wins, CI tag
            {"html": b"<html><body>none</body></html>"},  # no title -> NULL
            {"html": b'<title lang="en">A&lt;B&gt;&#39;s&nbsp;x</title>'},
            {"html": b"<title>multi\nline\ntitle</title>"},  # . crosses newlines
        ])
        got = extract_title(ds).to_pandas()["title"].tolist()
        assert got == ["Doc & 7", None, "A<B>'s x", "multi line title"]

    def test_upserts_existing_column_and_string_input(self, ray_session):
        import ray.data

        from edkray.ops.html import extract_title

        # html as string (already decoded) + a pre-existing title column
        ds = ray.data.from_items([{"html": "<title>t1</title>", "title": "stale"}])
        df = extract_title(ds).to_pandas()
        assert df["title"].tolist() == ["t1"] and list(df.columns).count("title") == 1
