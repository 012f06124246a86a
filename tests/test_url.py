"""URL canonicalization (edkray/ops/url.py) — engine/SQL parity."""

from __future__ import annotations

import duckdb
import pyarrow as pa

from edkray.ops.url import canonicalize_url, sql_canonical_url

CASES = [
    # (input, canonical)
    ("HTTPS://WWW.Example.COM:443/Path/To?b=2&utm_source=x&a=1#frag",
     "https://example.com/Path/To?a=1&b=2"),
    ("http://site01.example:80//p//x?fbclid=zz&z=9&a=1&",
     "http://site01.example//p//x?a=1&z=9"),
    ("https://example.com", "https://example.com/"),
    ("  https://www.a.b/  ", "https://a.b/"),
    ("ftp://Host.Example:21/file", "ftp://host.example:21/file"),  # non-default port kept
    ("not a url at all", "not a url at all"),  # unparsable: trim only
    ("https://example.com/?", "https://example.com/"),
    ("http://example.com:8080/x?gclid=1", "http://example.com:8080/x"),
    ("https://example.com/x#only-frag", "https://example.com/x"),
    ("HTTP://UPPER.CASE/MiXeD/Path?B=1&a=2", "http://upper.case/MiXeD/Path?B=1&a=2"),
    ("", ""),
    ("https://example.com/x?msclkid=1&utm_medium=m&k=v", "https://example.com/x?k=v"),
]


class TestCanonicalizeUrl:
    def test_pinned_cases(self):
        t = pa.table({"url": pa.array([c[0] for c in CASES], type=pa.string())})
        got = canonicalize_url(t)["url_canon"].to_pylist()
        assert got == [c[1] for c in CASES]

    def test_sql_mirror_agrees(self):
        t = pa.table({"url": pa.array([c[0] for c in CASES], type=pa.string())})
        con = duckdb.connect()
        con.register("t", t)
        ora = [r[0] for r in con.sql(f"SELECT {sql_canonical_url('url')} FROM t").fetchall()]
        assert ora == [c[1] for c in CASES]

    def test_null_passthrough(self):
        t = pa.table({"url": pa.array([None, "https://x.y/a"], type=pa.string())})
        got = canonicalize_url(t)["url_canon"].to_pylist()
        assert got == [None, "https://x.y/a"]

    def test_upserts_existing_column(self):
        t = pa.table({
            "url": pa.array(["https://WWW.x.y/"]),
            "url_canon": pa.array(["stale"]),
        })
        out = canonicalize_url(t)
        assert out.column_names == ["url", "url_canon"]
        assert out["url_canon"].to_pylist() == ["https://x.y/"]

    def test_param_sort_is_bytewise(self):
        # 'B' (0x42) sorts before 'a' (0x61) on both sides
        t = pa.table({"url": pa.array(["https://x.y/?a=2&B=1"])})
        assert canonicalize_url(t)["url_canon"].to_pylist() == ["https://x.y/?B=1&a=2"]
