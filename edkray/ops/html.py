"""HTML → text extraction over the pages table's ``html:binary`` column.

The BASELINE.json input hint pins the per-row invariant vs the
reference: *byte-identical extracted text per url*. The reference never
parses HTML (it is a raster engine); for a web corpus the analogous
deterministic contract is this module's extraction spec, applied as a
vectorized ``map_batches`` stage and mirrored independently by a DuckDB
``regexp_replace`` chain in the query oracle (``html_extract``).

Extraction spec (order matters and is part of the contract):

1. decode bytes as UTF-8 (strict Arrow cast on the fast path; rows that
   fail fall back to ``bytes.decode('utf-8', 'replace')``),
2. drop ``<script ...>...</script>`` and ``<style ...>...</style>``
   blocks (case-insensitive, non-greedy, ``.`` crosses newlines),
3. drop ``<!-- ... -->`` comments,
4. replace every remaining tag ``<[^>]*>`` with a single space,
5. decode named entities ``&lt; &gt; &quot; &#39; &apos; &nbsp;`` then
   ``&amp;`` LAST (single-pass semantics: ``&amp;lt;`` → ``&lt;``, never
   double-decoded — the chain order makes this hold without a callback),
6. collapse whitespace runs to one space and trim,
7. decode numeric entities ``&#NN;`` / ``&#xHH;`` (Python ``re.sub``
   callback, applied ONLY to the rows that still contain ``&#`` after
   step 5 — rare in practice, so the hot path stays in Rust).

Known, documented divergence from heavyweight extractors
(trafilatura/jusText): no block-level ``\\n`` reconstruction, no
boilerplate removal — those are quality heuristics, not part of the
byte-identity contract, and live in ``ops/text.py`` instead.
"""

from __future__ import annotations

import re

import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

# named-entity chain; ``&amp;`` must stay last (see module docstring §5)
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

_NUMERIC_ENT = re.compile(r"&#(?:x([0-9a-fA-F]{1,6})|([0-9]{1,7}));")


def _decode_numeric(s: str) -> str:
    def sub(m: re.Match) -> str:
        code = int(m.group(1), 16) if m.group(1) else int(m.group(2))
        return chr(code) if 0 < code <= 0x10FFFF else m.group(0)

    return _NUMERIC_ENT.sub(sub, s)


def decode_utf8_column(batch: pa.Table, col: str) -> pa.Table:
    """binary → string, zero-copy Arrow cast when the bytes are valid
    UTF-8 (the overwhelmingly common case), per-row ``errors='replace'``
    fallback otherwise. Output replaces ``col`` in place."""
    arr = batch[col]
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return batch
    try:
        out = arr.cast(pa.large_string() if pa.types.is_large_binary(arr.type) else pa.string())
    except pa.ArrowInvalid:
        out = pa.array(
            [None if v is None else v.decode("utf-8", "replace") for v in arr.to_pylist()],
            type=pa.string(),
        )
    return batch.set_column(batch.schema.get_field_index(col), col, out)


class HtmlExtract:
    """Actor-pool extraction stage: ``html:binary`` → ``out_col:string``.

    The polars expression pipeline (four Rust-regex ``replace_all``
    passes + the literal entity chain + whitespace collapse) is built
    ONCE in ``__init__`` and applied per batch — the stateful actor
    pattern from SURVEY §2.3; per-batch work is entirely vectorized.
    """

    def __init__(self, html_col: str = "html", out_col: str = "extracted"):
        self.html_col = html_col
        self.out_col = out_col
        expr = (
            pl.col("__html__")
            .str.replace_all(r"(?is)<script\b[^>]*>.*?</script>", " ")
            .str.replace_all(r"(?is)<style\b[^>]*>.*?</style>", " ")
            .str.replace_all(r"(?s)<!--.*?-->", " ")
            .str.replace_all(r"(?s)<[^>]*>", " ")
        )
        for ent, ch in _ENTITIES:
            expr = expr.str.replace_all(ent, ch, literal=True)
        self.expr = expr.str.replace_all(r"\s+", " ").str.strip_chars().alias("__out__")

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = decode_utf8_column(batch, self.html_col)
        df = pl.from_arrow(batch.select([self.html_col])).rename({self.html_col: "__html__"})
        out = df.select(self.expr).to_arrow()["__out__"]
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        # numeric entities survive the named chain; decode only the rows
        # that still carry "&#" (keeps the hot path Rust-side)
        mask = pc.match_substring(out, "&#")
        if pc.any(mask).as_py():
            idx = [i for i, hit in enumerate(mask.to_pylist()) if hit]
            vals = out.to_pylist()
            for i in idx:
                vals[i] = _decode_numeric(vals[i])
            out = pa.array(vals, type=out.type)
        from edkray.ops.text import upsert_column

        return upsert_column(batch, self.out_col, out.cast(pa.large_string()))


_HREF_RE = r'<[aA]\s[^>]*[hH][rR][eE][fF]="([^"]*)"'


def extract_links(
    ds,
    html_col: str = "html",
    url_col: str = "url",
    batch_size: int = 16384,
):
    """``(src, dst)`` link-edge extraction from an ``html`` column — the
    crawl-frontier / link-graph step between HTML ingest and PageRank.

    Pinned spec (the DuckDB oracle replays it verbatim):

    - anchors matched by the double-quoted-``href`` regex
      ``<a\\s...href="..."`` (case-insensitive tag/attr; single-quoted
      and unquoted hrefs are out of contract),
    - ``http://`` / ``https://`` targets kept as-is,
    - root-relative ``/path`` targets (single leading slash) resolved
      against the source URL's ``scheme://host``,
    - everything else — fragments, mailto:, protocol-relative ``//host``
      (explicitly excluded from the root-relative branch), relative
      paths — dropped.

    One vectorized ``map_batches`` pass: polars ``extract_all`` +
    explode; no shuffle — downstream rollups (in-degree, PageRank)
    choose their own exchange. Output: ``(src, dst)``, one row per
    kept anchor occurrence (duplicates preserved — frontier and rank
    both weight repeats)."""
    import polars as pl

    def _edges(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        html = (
            pl.col(html_col).cast(pl.Binary).cast(pl.String)
            if df.schema[html_col] == pl.Binary
            else pl.col(html_col).cast(pl.String)
        )
        base = (
            pl.col(url_col).str.extract(r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)
        )
        out = (
            df.select(
                pl.col(url_col).alias("src"),
                base.alias("__base"),
                html.str.extract_all(_HREF_RE).alias("__hrefs"),
            )
            .explode("__hrefs")
            .with_columns(
                pl.col("__hrefs").str.extract(_HREF_RE, 1).alias("__href")
            )
            .drop_nulls("__href")
        )
        dst = (
            pl.when(pl.col("__href").str.contains(r"^https?://"))
            .then(pl.col("__href"))
            .when(
                pl.col("__href").str.starts_with("/")
                & ~pl.col("__href").str.starts_with("//")
                & pl.col("__base").is_not_null()
            )
            .then(pl.col("__base") + pl.col("__href"))
            .otherwise(None)
        )
        return (
            out.with_columns(dst.alias("dst"))
            .drop_nulls("dst")
            .select("src", "dst")
            .to_arrow()
        )

    return ds.map_batches(_edges, batch_format="pyarrow", batch_size=batch_size)


_ANCHOR_RE = r'<[aA]\s[^>]*[hH][rR][eE][fF]="([^"]*)"[^>]*>([^<]*)</[aA]>'


def extract_anchor_texts(
    ds,
    html_col: str = "html",
    url_col: str = "url",
    batch_size: int = 16384,
):
    """``(dst, anchor)`` pairs from an ``html`` column — anchor text
    aggregated per link target is a classic web ranking / retrieval
    training signal (it describes the TARGET page).

    Same pinned resolution rule as :func:`extract_links` (absolute
    http(s) kept, root-relative resolved against the source host, rest
    dropped) with the additional pinned constraint that only anchors
    whose inner text contains no nested tag (``[^<]*``) match — the
    regex-replayable subset. Vectorized: ``extract_all`` of full
    anchors → explode → per-group re-extract (each match is a complete
    anchor, so the re-extract is exact)."""
    import polars as pl

    def _pairs(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        html = (
            pl.col(html_col).cast(pl.Binary).cast(pl.String)
            if df.schema[html_col] == pl.Binary
            else pl.col(html_col).cast(pl.String)
        )
        base = pl.col(url_col).str.extract(
            r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1
        )
        out = (
            df.select(
                base.alias("__base"),
                html.str.extract_all(_ANCHOR_RE).alias("__m"),
            )
            .explode("__m")
            .drop_nulls("__m")
            .with_columns(
                pl.col("__m").str.extract(_ANCHOR_RE, 1).alias("__href"),
                pl.col("__m").str.extract(_ANCHOR_RE, 2).alias("anchor"),
            )
        )
        dst = (
            pl.when(pl.col("__href").str.contains(r"^https?://"))
            .then(pl.col("__href"))
            .when(
                pl.col("__href").str.starts_with("/")
                & ~pl.col("__href").str.starts_with("//")
                & pl.col("__base").is_not_null()
            )
            .then(pl.col("__base") + pl.col("__href"))
            .otherwise(None)
        )
        return (
            out.with_columns(dst.alias("dst"))
            .drop_nulls("dst")
            .select("dst", "anchor")
            .to_arrow()
        )

    return ds.map_batches(_pairs, batch_format="pyarrow", batch_size=batch_size)


def extract_title(
    ds,
    html_col: str = "html",
    out_col: str = "title",
    batch_size: int = 16384,
):
    """``<title>`` extraction — the page-metadata sibling of
    :class:`HtmlExtract` (same entity/whitespace contract, title scope).

    Pinned spec (the DuckDB oracle replays it verbatim):

    - the FIRST ``<title ...>…</title>`` element, case-insensitive,
      non-greedy, ``.`` crossing newlines (RE2 inline ``(?is)`` — the
      same dialect the oracle's ``regexp_extract`` runs),
    - named-entity chain (``&amp;`` LAST, module docstring §5), then
      whitespace collapse + trim,
    - pages without a title element get NULL (not empty string — the
      two are different facts for a crawler).

    One vectorized polars pass, no shuffle; output upserts ``out_col``."""
    import polars as pl

    from edkray.ops.text import upsert_column

    expr = pl.col("__html__").str.extract(r"(?is)<title[^>]*>(.*?)</title>", 1)
    for ent, ch in _ENTITIES:
        expr = expr.str.replace_all(ent, ch, literal=True)
    expr = expr.str.replace_all(r"\s+", " ").str.strip_chars().alias("__out__")

    def _title(batch: pa.Table) -> pa.Table:
        batch = decode_utf8_column(batch, html_col)
        df = pl.from_arrow(batch.select([html_col])).rename({html_col: "__html__"})
        out = df.select(expr).to_arrow()["__out__"]
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        return upsert_column(batch, out_col, out.cast(pa.large_string()))

    return ds.map_batches(_title, batch_format="pyarrow", batch_size=batch_size)
