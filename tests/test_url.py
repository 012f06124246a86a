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


class TestRobotsFilter:
    def _run(self, ray_session, urls, rules_rows):
        import ray.data

        from edkray.ops.url import robots_filter

        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(list(range(len(urls))), type=pa.int64()),
            "url": pa.array(urls, type=pa.string()),
        }))
        rules = pa.table({
            "host": [r[0] for r in rules_rows],
            "disallow_prefix": [r[1] for r in rules_rows],
        })
        out = robots_filter(ds, rules).to_pandas()
        return set(out["doc_id"])

    def test_prefix_match_drops(self, ray_session):
        kept = self._run(
            ray_session,
            ["https://a.x/private/1", "https://a.x/public/1", "https://b.x/private/1"],
            [("a.x", "/private/")],
        )
        assert kept == {1, 2}  # b.x has no rule

    def test_host_case_insensitive(self, ray_session):
        kept = self._run(
            ray_session,
            ["https://WWW.A.X/private/1", "https://A.X/private/1"],
            [("a.x", "/private/")],
        )
        # www.a.x ≠ a.x (no www-stripping here — robots are per exact host)
        assert kept == {0}

    def test_prefix_crosses_directory_boundary(self, ray_session):
        kept = self._run(
            ray_session,
            ["https://a.x/d/1", "https://a.x/d/10", "https://a.x/d/2"],
            [("a.x", "/d/1")],
        )
        assert kept == {2}

    def test_unparsable_urls_kept(self, ray_session):
        kept = self._run(
            ray_session,
            ["not a url", "https://a.x/private/1"],
            [("a.x", "/private/")],
        )
        assert kept == {0}

    def test_multiple_rules_per_host(self, ray_session):
        kept = self._run(
            ray_session,
            ["https://a.x/p1/z", "https://a.x/p2/z", "https://a.x/ok"],
            [("a.x", "/p1/"), ("a.x", "/p2/")],
        )
        assert kept == {2}


class TestDomainRollup:
    """ops/url.py:domain_rollup — per-domain stats + blocklist."""

    def _run(self, ray_session, urls, sizes=None, **kw):
        import pyarrow as pa
        import ray.data

        from edkray.ops.url import domain_rollup

        t = pa.table({
            "url": pa.array(urls, type=pa.string()),
            "n_chars": pa.array(sizes or [10] * len(urls), type=pa.int64()),
        })
        ds = ray.data.from_arrow(t).repartition(2)  # force multi-partial combine
        out = domain_rollup(ds, num_buckets=4, **kw).to_pandas()
        return {r["domain"]: (r["n_pages"], r["total_chars"]) for _, r in out.iterrows()}

    def test_counts_and_sums(self, ray_session):
        got = self._run(
            ray_session,
            ["https://a.x/1", "https://a.x/2", "https://b.y/1"],
            sizes=[5, 7, 11],
        )
        assert got == {"a.x": (2, 12), "b.y": (1, 11)}

    def test_www_strip_and_case_fold(self, ray_session):
        got = self._run(ray_session, ["https://WWW.A.X/1", "http://a.x/2"])
        assert set(got) == {"a.x"} and got["a.x"][0] == 2

    def test_blocklist_and_unparseable(self, ray_session):
        got = self._run(
            ray_session,
            ["https://bad.x/1", "https://ok.y/1", "not a url"],
            blocklist=["BAD.X"],
        )
        assert set(got) == {"ok.y"}
