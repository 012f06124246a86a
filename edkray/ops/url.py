"""URL canonicalization for web-page corpora.

The web-text generalization of the reference's protocol-rewrite step
(reference earth_data_kit/stitching/classes/commons.py-style URI
normalization mirrored by ops/stages.py:normalize_uri, M18): map every
spelling of the same page address to ONE canonical form so url-keyed
dedup/join stages (exact_dedup on url, incremental_dedup, the flagship's
url-first-wins) treat them as equal.

Canonical form (pinned spec — the DuckDB oracle implements the same
rules independently as a regexp/list chain):

1. surrounding whitespace trimmed;
2. scheme and authority lowercased (path/query case preserved);
3. a leading ``www.`` stripped from the host;
4. the fragment (``#...``) dropped;
5. default ports dropped (``:80`` for http, ``:443`` for https);
6. an empty path becomes ``/``;
7. query params split on ``&``: empty params and tracking params
   (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``) dropped, the rest
   sorted lexicographically and re-joined; a now-empty query loses its
   ``?``.

Rows that don't parse as ``scheme://authority...`` pass through
unchanged (trimmed only) — a crawler's job is not to guess.

Everything is vectorized polars expressions over the batch — no per-row
Python.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY = r"^[^?#]*\?([^#]*)"
TRACKING_PARAM = r"^(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid)="


def canonical_url_expr(col: str) -> pl.Expr:
    """Polars expression producing the canonical form of ``col``."""
    u = pl.col(col).str.strip_chars()
    scheme = u.str.extract(_SCHEME, 1).str.to_lowercase()
    host = u.str.extract(_AUTH, 1).str.to_lowercase()
    host = host.str.replace(r"^www\.", "")
    host = (
        pl.when(scheme == "http")
        .then(host.str.replace(r":80$", ""))
        .when(scheme == "https")
        .then(host.str.replace(r":443$", ""))
        .otherwise(host)
    )
    path = u.str.extract(_PATH, 1).fill_null("")
    path = pl.when(path == "").then(pl.lit("/")).otherwise(path)
    query = (
        u.str.extract(_QUERY, 1)
        .fill_null("")
        .str.split("&")
        .list.eval(
            pl.element().filter(
                (pl.element() != "") & ~pl.element().str.contains(TRACKING_PARAM)
            )
        )
        .list.sort()
        .list.join("&")
    )
    rebuilt = (
        scheme
        + pl.lit("://")
        + host
        + path
        + pl.when(query != "").then(pl.lit("?") + query).otherwise(pl.lit(""))
    )
    return pl.when(scheme.is_null()).then(u).otherwise(rebuilt)


def canonicalize_url(
    batch: pa.Table, col: str = "url", out_col: str = "url_canon"
) -> pa.Table:
    """Append/overwrite ``out_col`` with the canonical form of ``col``."""
    df = pl.from_arrow(batch)
    return df.with_columns(canonical_url_expr(col).alias(out_col)).to_arrow()


def sql_canonical_url(col: str) -> str:
    """DuckDB expression implementing the SAME spec independently
    (regexp + list chain) — the oracle side of the contract."""
    u = f"trim({col})"
    scheme = f"lower(regexp_extract({u}, '{_SCHEME}', 1))"
    host = f"regexp_replace(lower(regexp_extract({u}, '{_AUTH}', 1)), '^www\\.', '')"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host}, ':443$', '') "
        f"ELSE {host} END"
    )
    path = f"regexp_extract({u}, '{_PATH}', 1)"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    qlist = (
        f"list_sort(list_filter(string_split(regexp_extract({u}, '{_QUERY}', 1), '&'), "
        f"x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM}')))"
    )
    query = f"array_to_string({qlist}, '&')"
    rebuilt = (
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {query} <> '' THEN '?' || {query} ELSE '' END"
    )
    return f"CASE WHEN {scheme} = '' THEN {u} ELSE {rebuilt} END"


def robots_filter(
    ds,
    rules: pa.Table,
    url_col: str = "url",
    host_col: str = "host",
    prefix_col: str = "disallow_prefix",
    batch_size: int = 65536,
):
    """Drop rows whose URL is disallowed by a robots-style rule set.

    ``rules`` is a (host, disallow_prefix) table: a row is dropped when
    ANY rule with ``host == lower(url host)`` has ``disallow_prefix``
    that is a prefix of the URL's path (query/fragment excluded) —
    the crawler-politeness step of a web-corpus pipeline. URLs that
    don't parse (no ``scheme://host``) are KEPT (no host → no rule).

    Scale shape: the rule table broadcasts once via ``ray.put`` (robots
    sets are per-registrable-domain and orders of magnitude smaller
    than the page corpus); each batch extracts host+path vectorized
    (the canonicalization regexes), inner-joins to the rules on host —
    a many-to-many explode bounded by rules-per-host — and keeps rows
    with no ``starts_with`` hit. No shuffle; pages stream through one
    map_batches.
    """
    import ray

    import polars as pl

    rl = (
        pl.from_arrow(rules)
        .select(
            pl.col(host_col).str.to_lowercase().alias("__rhost"),
            pl.col(prefix_col).alias("__rprefix"),
        )
        .unique()
    )
    rules_ref = ray.put(rl)

    def _filter(batch: pa.Table) -> pa.Table:
        r = ray.get(rules_ref)
        df = pl.from_arrow(batch).with_row_index("__rowid")
        hp = df.select(
            "__rowid",
            pl.col(url_col).str.strip_chars().str.extract(_AUTH, 1)
            .str.to_lowercase().alias("__host"),
            pl.col(url_col).str.strip_chars().str.extract(_PATH, 1)
            .fill_null("").alias("__path"),
        )
        hit = (
            hp.join(r, left_on="__host", right_on="__rhost", how="inner")
            .filter(pl.col("__path").str.starts_with(pl.col("__rprefix")))
            .select("__rowid")
            .unique()
        )
        return df.join(hit, on="__rowid", how="anti").drop("__rowid").to_arrow()

    return ds.map_batches(_filter, batch_format="pyarrow", batch_size=batch_size)


def extract_host_expr(col: str) -> pl.Expr:
    """Polars expression: lowercased, ``www.``-stripped host of ``col``
    (the per-domain rollup key — a registrable-domain approximation).
    Unparseable URLs yield null."""
    return (
        pl.col(col).str.strip_chars().str.extract(_AUTH, 1)
        .str.to_lowercase().str.replace(r"^www\.", "")
    )


def sql_extract_host(col: str) -> str:
    """DuckDB mirror of :func:`extract_host_expr` (independent regexp)."""
    return (
        f"regexp_replace(lower(regexp_extract(trim({col}), '{_AUTH}', 1)), "
        f"'^www\\.', '')"
    )


def domain_rollup(
    ds,
    url_col: str = "url",
    size_col: str | None = "n_chars",
    blocklist: list[str] | None = None,
    num_buckets: int = 64,
    batch_size: int = 65536,
):
    """Per-domain corpus statistics with an optional host blocklist —
    the per-host rollup every web pipeline runs before curation
    (CC-style domain stats, UT1-style blocklist gating).

    Emits one row per surviving host: ``domain``, ``n_pages``,
    ``total_chars`` (sum of ``size_col``; 0-filled when absent/null).
    Blocked hosts are dropped BEFORE aggregation.

    Scale shape: the blocklist broadcasts once via ``ray.put`` (host
    blocklists are ~10^5-10^6 entries, pages 10^10+); each batch
    extracts hosts vectorized, drops blocked rows, and PRE-AGGREGATES
    per batch (polars group_by), so only narrow
    (domain, count, sum) partials — one per distinct host per batch —
    enter the shuffle. The final combine is a hash-bucketed vectorized
    sum (:func:`~edkray.ops.shuffle.bucketed_group_map`), never a
    per-key ``map_groups``: at web scale hosts are ~10^7 keys, far
    past the per-group-task regime.
    """
    import ray

    from edkray.ops.shuffle import bucketed_group_map

    blocked_ref = ray.put(
        pl.Series("__blocked", sorted({h.lower() for h in blocklist}))
        if blocklist else None
    )

    def _partial(batch: pa.Table) -> pa.Table:
        blocked = ray.get(blocked_ref)
        df = pl.from_arrow(batch).with_columns(
            extract_host_expr(url_col).alias("domain")
        )
        df = df.filter(pl.col("domain").is_not_null())
        if blocked is not None:
            df = df.filter(~pl.col("domain").is_in(blocked))
        size = (
            pl.col(size_col).cast(pl.Int64).fill_null(0)
            if size_col and size_col in df.columns
            else pl.lit(0, dtype=pl.Int64)
        )
        return (
            df.group_by("domain")
            .agg(pl.len().cast(pl.Int64).alias("n_pages"), size.sum().alias("total_chars"))
            .to_arrow()
        )

    parts = ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)

    def _combine(tbl: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(tbl)
            .group_by("domain")
            .agg(pl.col("n_pages").sum(), pl.col("total_chars").sum())
            .to_arrow()
        )

    return bucketed_group_map(parts, ["domain"], _combine, num_buckets=num_buckets)
