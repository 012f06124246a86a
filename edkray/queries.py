"""Driver-facing query suite: one entry per implemented operator family.

Each query is a Ray-Data pipeline over the driver's parquet tables
(``region nation customer supplier part orders lineitem events documents
embeddings``) paired (where SQL-expressible) with an ANSI-SQL oracle
that DuckDB runs on the same tables. Column names match exactly between
the Ray result and the SQL so the driver's order-insensitive value-hash
compare passes.

Float policy: any aggregated float column is rounded half-away-from-zero
to 4 (or 6) decimals on BOTH sides — raw passthrough floats are left
untouched (bit-identical from parquet). Spatial queries derive lon/lat
from integer keys with :func:`edkray.utils.derive_lonlat`, a pure
integer/double rule the SQL mirrors expression-by-expression so results
are bit-identical.

Reference correspondence is noted per query (SURVEY.md §2 operator ids).
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from edkray.utils import derive_lonlat, table_from_pandas

# --------------------------------------------------------------------------
# helpers


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _pool() -> tuple[int, int]:
    """Actor-pool bounds sized to the cluster (autoscaling 1..CPUs).
    A fixed (1, 2) cap measured 2× wall on the 32-CPU bench for the
    signature-heavy stages; pools should scale with the machine."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (1, max(2, cpus))


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    # the test parquet carries a `pandas` schema-metadata dict that makes
    # hash(schema) raise inside Ray's schema dedup ("Failed to hash the
    # schemas" warnings on the READ operator itself); pass an explicitly
    # scrubbed schema so even the read blocks hash cleanly
    path = _p(sf_dir, table)
    sch = pq.read_schema(path).remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return ray.data.read_parquet(path, columns=columns, schema=sch)


def _scratch_cache(tag: str, sf_dir: str, populate) -> str:
    """Deterministic per-(tag, sf_dir) scratch dir under /tmp, populated
    once and reused across invocations — queries that must round-trip
    through files (jsonl/warclike engines) would otherwise leak a fresh
    ``mkdtemp`` copy of the table per sweep/bench run. ``populate(dir)``
    writes the files into a work dir that is atomically renamed into
    place, so a crashed populate never leaves a half-built cache."""
    import hashlib
    import os
    import shutil
    import tempfile

    h = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    parent = os.path.join(tempfile.gettempdir(), "edkray_scratch")
    os.makedirs(parent, exist_ok=True)
    final = os.path.join(parent, f"{tag}_{h}")
    if not os.path.isdir(final):
        work = tempfile.mkdtemp(prefix=f".{tag}_{h}.", dir=parent)
        populate(work)
        try:
            os.rename(work, final)
        except OSError:  # lost a populate race; keep the winner's copy
            shutil.rmtree(work, ignore_errors=True)
    return final


def round_half_away(x: np.ndarray, decimals: int) -> np.ndarray:
    """Match DuckDB ROUND(double, n): round-half-away-from-zero."""
    m = 10.0**decimals
    return np.sign(x) * np.floor(np.abs(x) * m + 0.5) / m


def _round_cols(batch: pa.Table, cols: list[str], decimals: int = 4) -> pa.Table:
    for c in cols:
        v = round_half_away(batch[c].to_numpy(zero_copy_only=False).astype(np.float64), decimals)
        batch = batch.set_column(batch.schema.get_field_index(c), c, pa.array(v))
    return batch


# SQL snippets mirroring edkray.utils.derive_lonlat EXPRESSION-BY-EXPRESSION
# (same double-op sequence → bit-identical values).
def _sql_lon(key: str, offset: int = 0) -> str:
    k = key if offset == 0 else f"({key} + {offset})"
    return f"(({k} * 7919) % 360000) / 1000.0 - 180.0"


def _sql_lat(key: str, offset: int = 0) -> str:
    k = key if offset == 0 else f"({key} + {offset})"
    return f"(({k} * 104729) % 170000) / 1000.0 - 85.0"


def _add_lonlat(batch: pa.Table, key: str) -> pa.Table:
    lon, lat = derive_lonlat(batch[key].to_numpy(zero_copy_only=False))
    return batch.append_column("lon", pa.array(lon)).append_column("lat", pa.array(lat))


# --------------------------------------------------------------------------
# Q: pricing_summary — combiner-pre-aggregated groupby (SURVEY A2/A3/A5)

_SHIP_CUTOFF = "1998-09-02"


def q_pricing_summary(sf_dir: str):
    from edkray.ops.aggregate import grouped_agg

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def _prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b["l_shipdate"], pa.scalar(pd.Timestamp(_SHIP_CUTOFF))))
        disc = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return b.append_column("disc_price", disc)

    ds = ds.map_batches(_prep, batch_format="pyarrow")
    out = grouped_agg(
        ds,
        ["l_returnflag", "l_linestatus"],
        [
            ("sum", "l_quantity", "sum_qty"),
            ("sum", "disc_price", "sum_disc_price"),
            ("mean", "l_discount", "avg_disc"),
            ("count", None, "n_rows"),
        ],
    )
    return out.map_batches(
        lambda b: _round_cols(b, ["sum_qty", "sum_disc_price", "avg_disc"]), batch_format="pyarrow"
    )


_SQL_PRICING = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_SHIP_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Q: region_rollup — broadcast (no-shuffle) small-side joins (SURVEY J1)


def q_region_rollup(sf_dir: str):
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.joins import broadcast_join

    nation = pq.read_table(_p(sf_dir, "nation"))
    region = pq.read_table(_p(sf_dir, "region"))
    ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    ds = broadcast_join(ds, nation, on=["c_nationkey"], right_on=["n_nationkey"])
    ds = broadcast_join(ds, region, on=["n_regionkey"], right_on=["r_regionkey"])
    out = grouped_agg(
        ds, ["r_name"], [("count", None, "n_customers"), ("sum", "c_acctbal", "sum_acctbal")]
    )
    return out.map_batches(lambda b: _round_cols(b, ["sum_acctbal"]), batch_format="pyarrow")


_SQL_REGION = """
SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 4) AS sum_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --------------------------------------------------------------------------
# Q: top_revenue_orders — shuffle groupby + large-large hash join + sort/limit


def q_top_revenue_orders(sf_dir: str):
    """Top-10 orders by lineitem revenue. Scale shape: per-batch partial
    sums (orderkeys cluster within blocks → ~4× fewer shuffle rows) →
    ONE bucketed shuffle where each bucket holds complete key groups →
    per-bucket final sum fused with a local top-10 (the exchange back
    is 10 rows/bucket — no global sort, no 1.5M-key native groupby,
    which profiled at 14 s vs 4 s for this shape at sf0.1) → the 10
    winner keys filter-scan `orders` for their priority (a 10-key
    semi-join pushed into the read, not a full hash join)."""
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def _rev_partial(b: pa.Table) -> pa.Table:
        r = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = pa.table({"o_orderkey": b["l_orderkey"], "rev": r})
        return pl.from_arrow(t).group_by("o_orderkey").agg(pl.col("rev").sum()).to_arrow()

    def _agg_topk(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        agg = df.group_by("o_orderkey").agg(pl.col("rev").sum().alias("revenue"))
        return agg.sort(["revenue", "o_orderkey"], descending=[True, False]).head(10).to_arrow()

    rows = li.map_batches(_rev_partial, batch_format="pyarrow")
    cands = bucketed_group_map(rows, ["o_orderkey"], _agg_topk, num_buckets=32)
    top = (
        cands.to_pandas()
        .sort_values(["revenue", "o_orderkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    keys = pa.array(top["o_orderkey"].to_numpy())
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    pri = (
        orders.map_batches(
            lambda b: b.filter(pc.is_in(b["o_orderkey"], value_set=keys)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    out = top.merge(pri, on="o_orderkey", how="left")
    out = out.sort_values(["revenue", "o_orderkey"], ascending=[False, True])
    out = out[["o_orderkey", "o_orderpriority", "revenue"]].reset_index(drop=True)
    out["revenue"] = round_half_away(out["revenue"].to_numpy(), 4)
    return out


_SQL_TOP_REVENUE = """
SELECT o_orderkey, o_orderpriority, round(revenue, 4) AS revenue
FROM (SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) AS revenue
      FROM lineitem GROUP BY l_orderkey) r
JOIN orders ON o_orderkey = r.l_orderkey
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


# --------------------------------------------------------------------------
# Q: daily_events — temporal bucketing (SURVEY A1) + grouped agg


def q_daily_events(sf_dir: str):
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.stages import temporal_bucket

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    ds = ds.map_batches(
        lambda b: temporal_bucket(b, "ts", "day"), batch_format="pyarrow"
    ).drop_columns(["ts"])
    out = grouped_agg(
        ds,
        ["date_bucket", "event_type"],
        [("count", None, "n_events"), ("sum", "value", "sum_value")],
    )
    return out.map_batches(lambda b: _round_cols(b, ["sum_value"]), batch_format="pyarrow")


_SQL_DAILY = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS date_bucket, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Q: pushdown_daily — same daily rollup routed through the THIRD registry
# engine (pushdown_parquet): the time range is applied INSIDE the source
# as a pyarrow dataset filter on read_parquet (the reference EE engine's
# server-side attribute filter, engines/earth_engine.py:22-56), plus a
# value-rect filter exercising the SetSpatialFilterRect analogue.

_PD_T0, _PD_T1 = "2024-01-05", "2024-01-20"
_PD_RECT = (2.0, 10.0, 300.0, 120.0)  # (value, user_id) rect


def q_pushdown_daily(sf_dir: str):
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.stages import temporal_bucket
    from edkray.sources.registry import get_source

    eng = get_source("pushdown_parquet", ts_col="ts", x_col="value", y_col="user_id")
    ds = eng.scan(
        _p(sf_dir, "events"),
        time_range=(dt.datetime.fromisoformat(_PD_T0), dt.datetime.fromisoformat(_PD_T1)),
        query_bbox=_PD_RECT,
        columns=["ts", "event_type", "value", "user_id"],
    )
    ds = ds.map_batches(
        lambda b: temporal_bucket(b, "ts", "day"), batch_format="pyarrow"
    ).drop_columns(["ts", "user_id"])
    out = grouped_agg(
        ds,
        ["date_bucket", "event_type"],
        [("count", None, "n_events"), ("sum", "value", "sum_value")],
    )
    return out.map_batches(lambda b: _round_cols(b, ["sum_value"]), batch_format="pyarrow")


_SQL_PUSHDOWN_DAILY = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS date_bucket, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events
WHERE ts >= TIMESTAMP '{_PD_T0}' AND ts < TIMESTAMP '{_PD_T1}'
  AND value >= {_PD_RECT[0]} AND value <= {_PD_RECT[2]}
  AND user_id >= {_PD_RECT[1]} AND user_id <= {_PD_RECT[3]}
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Q: sessionize — session windows (gap split) via hash-bucket shuffle


def q_sessionize(sf_dir: str):
    from edkray.ops.window import sessionize

    ds = _read(sf_dir, "events", ["ts", "user_id", "value"])
    out = sessionize(ds, "ts", "user_id", gap_us=3_600_000_000, agg_col="value")
    return out.map_batches(lambda b: _round_cols(b, ["sum_value"]), batch_format="pyarrow")


_SQL_SESSION = """
WITH s AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL '1 hour'
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), t AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid FROM s
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM t GROUP BY user_id, sid
"""


# --------------------------------------------------------------------------
# Q: sliding_windows — overlapping event-time windows (explode + agg)


def q_sliding_windows(sf_dir: str):
    from edkray.ops.window import sliding

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    return sliding(
        ds, "ts", size_us=7_200_000_000, step_us=3_600_000_000,
        keys=["event_type"], aggs=[("count", None, "n_events")],
    )


_SQL_SLIDING = """
SELECT window_start, event_type, count(*) AS n_events
FROM (SELECT event_type, ts,
             unnest([CAST(date_trunc('hour', ts) AS TIMESTAMP),
                     CAST(date_trunc('hour', ts) AS TIMESTAMP) - INTERVAL '1 hour']) AS window_start
      FROM events)
WHERE ts >= window_start AND ts < window_start + INTERVAL '2 hours'
GROUP BY window_start, event_type
"""


# --------------------------------------------------------------------------
# Q: dedup_lineitem_first — exact dedup, first-per-key (SURVEY §2.7)


# l_linenumber is NOT unique per order in the synthetic data — the dedup
# order is a total order over all columns so the winner is deterministic.
_DEDUP_ORDER = [
    "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
    "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
]


def q_dedup_lineitem_first(sf_dir: str):
    from edkray.ops.dedup import exact_dedup

    ds = _read(sf_dir, "lineitem")
    return exact_dedup(ds, ["l_orderkey"], _DEDUP_ORDER)


_SQL_DEDUP_LI = f"""
SELECT * FROM lineitem
QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY {', '.join(_DEDUP_ORDER)}) = 1
"""


# --------------------------------------------------------------------------
# Q: distinct_flags — distinct with per-batch pre-dedup (SURVEY A4)


def q_distinct_flags(sf_dir: str):
    from edkray.ops.aggregate import distinct

    return distinct(_read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"]),
                    ["l_returnflag", "l_linestatus"])


_SQL_DISTINCT = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


# --------------------------------------------------------------------------
# Q: asof_orders — as-of join (SURVEY J5) against broadcast right side


def q_asof_orders(sf_dir: str):
    from edkray.ops.joins import asof_join

    # dedup right side to one row per (custkey, orderdate): max orderkey —
    # makes the as-of tie rule explicit and oracle-reproducible
    orders = pq.read_table(_p(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"])
    odf = orders.to_pandas().sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    odf = odf.drop_duplicates(subset=["o_custkey", "o_orderdate"], keep="last")
    odf = odf.rename(columns={"o_custkey": "user_id"})
    right = table_from_pandas(odf)

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    out = asof_join(ev, right, on=["user_id"], left_ts="ts", right_ts="o_orderdate")
    return out.map_batches(
        lambda b: b.select(["event_id", "ts", "user_id", "o_orderkey", "o_totalprice"]),
        batch_format="pyarrow",
    )


_SQL_ASOF = """
WITH o AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM orders
  QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) = 1
)
SELECT e.event_id, e.ts, e.user_id, o.o_orderkey, o.o_totalprice
FROM events e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def q_asof_orders_large(sf_dir: str):
    """Same result as ``asof_orders`` (same SQL oracle) via the
    LARGE-LARGE path: no broadcast — orders are deduped distributively
    (bucketed keep-first on (custkey, orderdate) ordered by -orderkey)
    and both sides flow through ``asof_join_large``'s single key-hash
    shuffle with per-bucket vectorized join_asof. This is the scale
    path when the right side outgrows the object store."""
    from edkray.ops.dedup import exact_dedup
    from edkray.ops.joins import asof_join_large

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"]
    )

    def _prep(b: pa.Table) -> pa.Table:
        neg = pc.negate(b["o_orderkey"])
        b = b.append_column("neg_okey", neg)
        return b.set_column(
            b.schema.get_field_index("o_orderdate"),
            "o_orderdate",
            b["o_orderdate"].cast(pa.timestamp("us")),
        )

    orders = orders.map_batches(_prep, batch_format="pyarrow")
    dedup = exact_dedup(orders, ["o_custkey", "o_orderdate"], ["neg_okey"])
    right = dedup.map_batches(
        lambda b: b.drop_columns(["neg_okey"]).rename_columns(
            ["user_id", "o_orderdate", "o_orderkey", "o_totalprice"]
        ),
        batch_format="pyarrow",
    )
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    out = asof_join_large(ev, right, on=["user_id"], left_ts="ts", right_ts="o_orderdate")
    return out.map_batches(
        lambda b: b.select(["event_id", "ts", "user_id", "o_orderkey", "o_totalprice"]),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# Q: asof_keyless — KEYLESS large-large as-of (VERDICT r3 item 7): every
# event gets the latest order-DATE stats ≤ its ts, with NO key columns —
# the join runs on time-range partitions with boundary replication
# (edkray.ops.joins._keyless_range_asof). Right side is pre-aggregated to
# one row per o_orderdate, so the as-of pick is fully specified.


def q_asof_keyless(sf_dir: str):
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.joins import asof_join_large

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_orderkey"])
    right = grouped_agg(
        orders, ["o_orderdate"],
        [("max", "o_orderkey", "o_orderkey"), ("count", None, "n_orders")],
    )
    ev = _read(sf_dir, "events", ["event_id", "ts"])
    out = asof_join_large(
        ev, right, on=[], left_ts="ts", right_ts="o_orderdate", num_buckets=16
    )
    return out.map_batches(
        lambda b: b.select(["event_id", "ts", "o_orderkey", "n_orders"]),
        batch_format="pyarrow",
    )


_SQL_ASOF_KEYLESS = """
WITH o AS (
  SELECT o_orderdate, max(o_orderkey) AS o_orderkey,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_orderdate
)
SELECT e.event_id, e.ts, o.o_orderkey, o.n_orders
FROM events e ASOF LEFT JOIN o ON e.ts >= o.o_orderdate
"""


# --------------------------------------------------------------------------
# Q: interp_orders — linear-interpolation combine (reference J5
# ``combine`` with method="linear", stitching/classes/dataset.py:922-965):
# each event's price is interpolated between the user's bracketing orders


def _interp_right(sf_dir: str) -> pa.Table:
    orders = pq.read_table(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"]
    )
    odf = orders.to_pandas().sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    odf = odf.drop_duplicates(subset=["o_custkey", "o_orderdate"], keep="last")
    odf = odf.rename(columns={"o_custkey": "user_id"})
    return table_from_pandas(odf[["user_id", "o_orderdate", "o_totalprice"]])


def q_interp_orders(sf_dir: str):
    from edkray.ops.joins import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    out = asof_join(
        ev, _interp_right(sf_dir), on=["user_id"], left_ts="ts", right_ts="o_orderdate",
        interpolate="linear", value_cols=["o_totalprice"],
    )
    return out.map_batches(
        lambda b: b.select(["event_id", "ts", "user_id", "o_totalprice"]).rename_columns(
            ["event_id", "ts", "user_id", "price_interp"]
        ),
        batch_format="pyarrow",
    )


def q_interp_orders_large(sf_dir: str):
    """Same oracle as ``interp_orders`` via the large-large path: both
    sides shuffle once on user_id, per-bucket bracketing join_asof +
    vectorized interpolation (no broadcast)."""
    import ray.data

    from edkray.ops.joins import asof_join_large

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    right = ray.data.from_arrow(_interp_right(sf_dir))
    out = asof_join_large(
        ev, right, on=["user_id"], left_ts="ts", right_ts="o_orderdate",
        interpolate="linear", value_cols=["o_totalprice"],
    )
    return out.map_batches(
        lambda b: b.select(["event_id", "ts", "user_id", "o_totalprice"]).rename_columns(
            ["event_id", "ts", "user_id", "price_interp"]
        ),
        batch_format="pyarrow",
    )


_SQL_INTERP = """
WITH o AS (
  SELECT o_custkey, o_orderdate, o_totalprice FROM orders
  QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) = 1
), p AS (
  SELECT e.event_id, o.o_orderdate AS t0, o.o_totalprice AS v0
  FROM events e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
), f AS (
  SELECT e.event_id, o.o_orderdate AS t1, o.o_totalprice AS v1
  FROM events e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
)
SELECT e.event_id, e.ts, e.user_id,
  CASE
    WHEN p.t0 IS NULL AND f.t1 IS NULL THEN NULL
    WHEN p.t0 IS NULL THEN f.v1
    WHEN f.t1 IS NULL OR f.t1 = p.t0 THEN p.v0
    ELSE p.v0 + (f.v1 - p.v0)
         * (epoch_us(e.ts) - epoch_us(p.t0))
         / (epoch_us(f.t1) - epoch_us(p.t0))
  END AS price_interp
FROM events e
JOIN p USING (event_id)
JOIN f USING (event_id)
"""


# --------------------------------------------------------------------------
# Q: cells_histogram — quadcell spatial key (SQL-reproducible bit packing)


def q_cells_histogram(sf_dir: str):
    from edkray.geo.cells import quadcell
    from edkray.ops.aggregate import grouped_agg

    ds = _read(sf_dir, "customer", ["c_custkey"])

    def _cells(b: pa.Table) -> pa.Table:
        b = _add_lonlat(b, "c_custkey")
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        return b.append_column("cell_7", pa.array(quadcell(lon, lat, 7)))

    ds = ds.map_batches(_cells, batch_format="pyarrow")
    return grouped_agg(ds, ["cell_7"], [("count", None, "n_customers")])


_SQL_CELLS = f"""
WITH pts AS (
  SELECT {_sql_lon('c_custkey')} AS lon, {_sql_lat('c_custkey')} AS lat FROM customer
), ij AS (
  SELECT least(greatest(CAST(floor((lon + 180.0) / 360.0 * 128) AS BIGINT), 0), 127) AS ix,
         least(greatest(CAST(floor((lat + 90.0) / 180.0 * 128) AS BIGINT), 0), 127) AS iy
  FROM pts
)
SELECT (CAST(7 AS BIGINT) << 58) | (ix << 29) | iy AS cell_7, count(*) AS n_customers
FROM ij GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q: cell_neighborhood — 3×3 box-smoothed cell density (k-ring join)


def q_cell_neighborhood(sf_dir: str):
    """Neighborhood density (geo/cells.py:quadcell_kring): per occupied
    res-7 cell, its own point count and the summed count of its 3×3
    k-ring — the grid_disk smoothing/proximity-join primitive. ONE
    shuffle: each batch pre-aggregates occupied cells and emits tagged
    (cell, n_own, n_nbhd) partials — the own row plus one contribution
    row per in-grid neighbor (self included) — so a single grouped sum
    yields both columns with no self-join; unoccupied cells are dropped
    by the n_own > 0 filter. Oracle replays the ring via a (dx, dy)
    cross join over the same clamped grid arithmetic."""
    from edkray.geo.cells import quadcell, quadcell_kring
    from edkray.ops.aggregate import grouped_agg

    ds = _read(sf_dir, "customer", ["c_custkey"])

    def _tagged(b: pa.Table) -> pa.Table:
        b = _add_lonlat(b, "c_custkey")
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(quadcell(lon, lat, 7), return_counts=True)
        cnt = cnt.astype(np.int64)
        src, nbr = quadcell_kring(uniq, 1)
        z_u = np.zeros(len(uniq), dtype=np.int64)
        z_n = np.zeros(len(nbr), dtype=np.int64)
        return pa.table({
            "cell_7": pa.array(np.concatenate([uniq, nbr])),
            "n_own": pa.array(np.concatenate([cnt, z_n])),
            "n_nbhd": pa.array(np.concatenate([z_u, cnt[src]])),
        })

    parts = ds.map_batches(_tagged, batch_format="pyarrow")
    agg = grouped_agg(parts, ["cell_7"],
                      [("sum", "n_own", "n_own"), ("sum", "n_nbhd", "n_nbhd")])
    return agg.map_batches(
        lambda b: b.filter(pc.greater(b["n_own"], 0)), batch_format="pyarrow"
    )


_SQL_CELL_NEIGHBORHOOD = f"""
WITH pts AS (
  SELECT {_sql_lon('c_custkey')} AS lon, {_sql_lat('c_custkey')} AS lat FROM customer
), ij AS (
  SELECT least(greatest(CAST(floor((lon + 180.0) / 360.0 * 128) AS BIGINT), 0), 127) AS ix,
         least(greatest(CAST(floor((lat + 90.0) / 180.0 * 128) AS BIGINT), 0), 127) AS iy
  FROM pts
), c AS (
  SELECT ix, iy, CAST(count(*) AS BIGINT) AS cnt FROM ij GROUP BY ix, iy
), nb AS (
  SELECT a.ix + d.dx AS nx, a.iy + d.dy AS ny, sum(a.cnt) AS s
  FROM c a
  CROSS JOIN (SELECT t1.range AS dx, t2.range AS dy
              FROM range(-1, 2) t1 CROSS JOIN range(-1, 2) t2) d
  WHERE a.ix + d.dx BETWEEN 0 AND 127 AND a.iy + d.dy BETWEEN 0 AND 127
  GROUP BY 1, 2
)
SELECT (CAST(7 AS BIGINT) << 58) | (c.ix << 29) | c.iy AS cell_7,
       c.cnt AS n_own, CAST(nb.s AS BIGINT) AS n_nbhd
FROM c JOIN nb ON nb.nx = c.ix AND nb.ny = c.iy
"""


# --------------------------------------------------------------------------
# Q: tile_overlay — S17 plot sink, driver-checked. Per-cell count →
# colorize (distributed min/max bounds + vectorized colormap stage) →
# the colored table that to_geojson serializes (reference folium.py:
# 30-62 renders the same artifact). A two-stop grayscale ramp keeps the
# interp math (255*t over exact-int counts) bit-identical to the SQL
# mirror; the default viridis path is pinned by tests/test_plot.py.


def q_tile_overlay(sf_dir: str):
    from edkray.geo.cells import quadcell
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.plot import colorize

    ds = _read(sf_dir, "customer", ["c_custkey"])

    def _cells(b: pa.Table) -> pa.Table:
        b = _add_lonlat(b, "c_custkey")
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        return b.append_column("cell_5", pa.array(quadcell(lon, lat, 5)))

    agg = grouped_agg(
        ds.map_batches(_cells, batch_format="pyarrow"),
        ["cell_5"], [("count", None, "n_customers")],
    )
    ramp = np.array([[0, 0, 0], [255, 255, 255]])
    return colorize(agg, "n_customers", colors=ramp)


_SQL_OVERLAY = f"""
WITH pts AS (
  SELECT {_sql_lon('c_custkey')} AS lon, {_sql_lat('c_custkey')} AS lat FROM customer
), agg AS (
  SELECT (CAST(5 AS BIGINT) << 58)
         | (least(greatest(CAST(floor((lon + 180.0) / 360.0 * 32) AS BIGINT), 0), 31) << 29)
         | least(greatest(CAST(floor((lat + 90.0) / 180.0 * 32) AS BIGINT), 0), 31) AS cell_5,
         count(*) AS n_customers
  FROM pts GROUP BY 1
), b AS (
  SELECT CAST(min(n_customers) AS DOUBLE) AS lo, CAST(max(n_customers) AS DOUBLE) AS hi FROM agg
), t AS (
  SELECT cell_5, n_customers,
         CASE WHEN hi > lo
              THEN least(greatest((CAST(n_customers AS DOUBLE) - lo) / (hi - lo), 0.0), 1.0)
              ELSE 0.0 END AS t
  FROM agg, b
), g AS (
  SELECT cell_5, n_customers, CAST(floor(255.0 * t + 0.5) AS BIGINT) AS gr FROM t
)
SELECT cell_5, n_customers, printf('#%02x%02x%02x', gr, gr, gr) AS fill,
       CAST(1.0 AS DOUBLE) AS fill_opacity
FROM g
"""


# --------------------------------------------------------------------------
# Q: overview_pyramid — COG-overview analogue (SURVEY S15): cascaded
# 2×2 cell aggregation, each level checkpointed + computed from the
# level below (geometric total work), returned as one union


def q_overview_pyramid(sf_dir: str):
    """Doc-count pyramid over quadcells res 8 → 5. The cascade
    aggregates level r from level r+1 (4 rows per parent, never the
    base table) with per-level partitioned-Parquet checkpoints — the
    overview half of a COG export. Oracle: each level recomputed
    directly from the base points in SQL (sum is associative, so the
    cascade equals the direct group-by)."""
    import shutil
    import tempfile

    from edkray.geo.cells import quadcell
    from edkray.ops.aggregate import grouped_agg
    from edkray.pipelines.pyramid import build_overviews, pyramid_union

    ds = _read(sf_dir, "documents", ["doc_id"])

    def _cells(b: pa.Table) -> pa.Table:
        b = _add_lonlat(b, "doc_id")
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        return pa.table({"cell": pa.array(quadcell(lon, lat, 8))})

    base = grouped_agg(
        ds.map_batches(_cells, batch_format="pyarrow"), ["cell"], [("count", None, "n_docs")]
    )
    scratch = tempfile.mkdtemp(prefix="edkray_pyramid_")
    try:
        levels = build_overviews(
            base, "cell", base_res=8, min_res=5, aggs=[("sum", "n_docs", "n_docs")],
            out_dir=scratch,
        )
        out = pyramid_union({8: base, **levels}).to_pandas()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return table_from_pandas(out.sort_values("cell").reset_index(drop=True))


def _sql_pyramid(base_res: int = 8, min_res: int = 5) -> str:
    parts = []
    for r in range(min_res, base_res + 1):
        n = 1 << r
        parts.append(f"""
SELECT (CAST({r} AS BIGINT) << 58)
       | (least(greatest(CAST(floor((lon + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1}) << 29)
       | least(greatest(CAST(floor((lat + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1}) AS cell,
       count(*) AS n_docs
FROM pts GROUP BY 1""")
        sep = "\nUNION ALL\n"
    return (
        f"WITH pts AS (\n  SELECT {_sql_lon('doc_id')} AS lon, {_sql_lat('doc_id')} AS lat"
        " FROM documents\n)" + sep.join(parts)
    )


# --------------------------------------------------------------------------
# Q: tile assignment (grid-file semantics, SURVEY S13/J1) over orders


def _tile_batch(b: pa.Table, bucket_col: str = "date_bucket") -> pa.Table:
    """Deterministic grid-tile id — the flagship's polars string path
    (~0.4 µs/row; the round-1 np.char assembly here measured ~10×
    slower, see pipelines/spatial.py)."""
    from edkray.pipelines.spatial import assign_grid_tile

    return assign_grid_tile(b)


def q_tile_counts(sf_dir: str):
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.stages import temporal_bucket

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    ds = ds.map_batches(
        lambda b: _tile_batch(temporal_bucket(_add_lonlat(b, "o_custkey"), "o_orderdate", "month")),
        batch_format="pyarrow",
    )
    ds = ds.map_batches(lambda b: b.filter(pc.is_valid(b["tile_id"])), batch_format="pyarrow")
    return grouped_agg(ds, ["tile_id"], [("count", None, "n_orders")])


_SQL_TILE_EXPR = """
  lpad(CAST(CAST(least(greatest(floor((lon + 180.0) / 10.0), 0), 35) AS BIGINT) AS VARCHAR), 2, '0')
  || lpad(CAST(CAST(least(greatest(floor((lat + 80.0) / 10.0), 0), 15) AS BIGINT) AS VARCHAR), 2, '0')
  || '_' || strftime(date_trunc('month', o_orderdate), '%Y%m%d')
"""

_SQL_TILES = f"""
WITH pts AS (
  SELECT o_orderkey, o_orderdate, {_sql_lon('o_custkey')} AS lon, {_sql_lat('o_custkey')} AS lat
  FROM orders
)
SELECT {_SQL_TILE_EXPR} AS tile_id, count(*) AS n_orders
FROM pts WHERE lat >= -80.0 AND lat < 80.0
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q: tile_rank — explicit deterministic per-tile rank (replaces BuildVRT
# last-source-wins ordering, reference dataset.py:543-552)


def q_tile_rank(sf_dir: str):
    from edkray.ops.shuffle import bucketed_group_map
    from edkray.ops.stages import temporal_bucket
    import polars as pl

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    ds = ds.map_batches(
        lambda b: _tile_batch(temporal_bucket(_add_lonlat(b, "o_custkey"), "o_orderdate", "month")),
        batch_format="pyarrow",
    )
    ds = ds.map_batches(lambda b: b.filter(pc.is_valid(b["tile_id"])), batch_format="pyarrow")

    def _rank(table: pa.Table) -> pa.Table:
        df = pl.from_arrow(table).sort(["tile_id", "o_orderdate", "o_orderkey"])
        df = df.with_columns(pl.int_range(pl.len()).over("tile_id").alias("rank"))
        return df.select(["o_orderkey", "tile_id", "rank"]).to_arrow()

    return bucketed_group_map(ds, ["tile_id"], _rank, num_buckets=16)


_SQL_TILE_RANK = f"""
WITH pts AS (
  SELECT o_orderkey, o_orderdate, {_sql_lon('o_custkey')} AS lon, {_sql_lat('o_custkey')} AS lat
  FROM orders
), tiled AS (
  SELECT o_orderkey, o_orderdate, {_SQL_TILE_EXPR} AS tile_id
  FROM pts WHERE lat >= -80.0 AND lat < 80.0
)
SELECT o_orderkey, tile_id,
       row_number() OVER (PARTITION BY tile_id ORDER BY o_orderdate, o_orderkey) - 1 AS rank
FROM tiled
"""


# --------------------------------------------------------------------------
# Q: pip_admin — point-in-polygon join vs broadcast admin polygons (J6)


def _admin_values_sql() -> str:
    """Inline the deterministic admin fixture as a SQL VALUES list
    (corner coords repr'd at full double precision)."""
    from edkray.fixtures import make_admin
    from edkray.geo.pip import wkb_to_ring

    admin = make_admin()
    rows = []
    for aid, wkb in zip(admin["admin_id"].to_pylist(), admin["wkb_geometry"].to_pylist()):
        ring = wkb_to_ring(wkb)[:4]  # 4-corner convex CCW quads
        coords = ", ".join(f"{ring[i,0]!r}, {ring[i,1]!r}" for i in range(4))
        rows.append(f"('{aid}', {coords})")
    return ",\n  ".join(rows)


def q_pip_admin(sf_dir: str):
    from edkray.fixtures import make_admin
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.joins import PipJoin

    admin = make_admin()
    ds = _read(sf_dir, "customer", ["c_custkey"])
    ds = ds.map_batches(lambda b: _add_lonlat(b, "c_custkey"), batch_format="pyarrow")
    ref = ray.put(admin)
    ds = ds.map_batches(
        PipJoin, fn_constructor_kwargs=dict(polygons_ref=ref),
        batch_format="pyarrow", concurrency=_pool(),
    )

    def _fill(b: pa.Table) -> pa.Table:
        filled = pc.fill_null(b["admin_id"], "__none__")
        return b.set_column(b.schema.get_field_index("admin_id"), "admin_id", filled)

    ds = ds.map_batches(_fill, batch_format="pyarrow")
    return grouped_agg(ds, ["admin_id"], [("count", None, "n_customers")])


def _sql_pip() -> str:
    # convex CCW quad: inside ⇔ all four edge cross-products strictly > 0
    # (boundary is measure-zero vs the engine's even-odd rule)
    def cr(x1, y1, x2, y2):
        return f"(({x2} - {x1}) * (lat - {y1}) - ({y2} - {y1}) * (lon - {x1})) > 0"

    inside = " AND ".join(
        cr(f"a.x{i}", f"a.y{i}", f"a.x{i % 4 + 1}", f"a.y{i % 4 + 1}") for i in range(1, 5)
    )
    return f"""
WITH admin(admin_id, x1, y1, x2, y2, x3, y3, x4, y4) AS (VALUES
  {_admin_values_sql()}
), pts AS (
  SELECT {_sql_lon('c_custkey')} AS lon, {_sql_lat('c_custkey')} AS lat FROM customer
)
SELECT coalesce(a.admin_id, '__none__') AS admin_id, count(*) AS n_customers
FROM pts LEFT JOIN admin a ON {inside}
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q: zonal_stats — per-polygon aggregate of a point value field (the GIS
# zonal-statistics classic: rasterio.zonal_stats / QGIS "Zonal statistics",
# the vector-side analogue of the reference's per-tile mosaics)


def q_zonal_stats(sf_dir: str):
    """Zonal statistics: customers are tagged with their containing
    admin polygon (ops/joins.py:PipJoin — polygons ``ray.put`` once,
    STRtree built per actor in ``__init__``) and c_acctbal is
    aggregated per zone (count/mean/min/max via ops/aggregate.py:
    grouped_agg — per-batch partials, only |zones| rows shuffle).
    Points outside every polygon form the '__none__' zone. The oracle
    replays the same convex-quad containment predicate as _sql_pip
    with the aggregates inline."""
    from edkray.fixtures import make_admin
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.joins import PipJoin

    ds = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    ds = ds.map_batches(lambda b: _add_lonlat(b, "c_custkey"), batch_format="pyarrow")
    ref = ray.put(make_admin())
    ds = ds.map_batches(
        PipJoin, fn_constructor_kwargs=dict(polygons_ref=ref),
        batch_format="pyarrow", concurrency=_pool(),
    )

    def _fill(b: pa.Table) -> pa.Table:
        filled = pc.fill_null(b["admin_id"], "__none__")
        return pa.table({"admin_id": filled, "c_acctbal": b["c_acctbal"]})

    ds = ds.map_batches(_fill, batch_format="pyarrow")
    agg = grouped_agg(ds, ["admin_id"], [
        ("count", None, "n_pts"),
        ("mean", "c_acctbal", "bal_mean"),
        ("min", "c_acctbal", "bal_min"),
        ("max", "c_acctbal", "bal_max"),
    ])
    return agg.map_batches(lambda b: _round_cols(b, ["bal_mean"]), batch_format="pyarrow")


def _sql_zonal_stats() -> str:
    def cr(x1, y1, x2, y2):
        return f"(({x2} - {x1}) * (lat - {y1}) - ({y2} - {y1}) * (lon - {x1})) > 0"

    inside = " AND ".join(
        cr(f"a.x{i}", f"a.y{i}", f"a.x{i % 4 + 1}", f"a.y{i % 4 + 1}") for i in range(1, 5)
    )
    return f"""
WITH admin(admin_id, x1, y1, x2, y2, x3, y3, x4, y4) AS (VALUES
  {_admin_values_sql()}
), pts AS (
  SELECT c_acctbal, {_sql_lon('c_custkey')} AS lon, {_sql_lat('c_custkey')} AS lat
  FROM customer
)
SELECT coalesce(a.admin_id, '__none__') AS admin_id,
       count(*) AS n_pts,
       round(avg(c_acctbal), 4) AS bal_mean,
       min(c_acctbal) AS bal_min,
       max(c_acctbal) AS bal_max
FROM pts LEFT JOIN admin a ON {inside}
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q: spatial_flagship — geocode → bucket → tile → PIP → per-(tile, admin)
# counts: the full discover→mosaic chain as one SQL-checkable pipeline


def q_spatial_flagship(sf_dir: str):
    from edkray.fixtures import make_admin
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.joins import PipJoin
    from edkray.ops.stages import temporal_bucket

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    ds = ds.map_batches(
        lambda b: _tile_batch(temporal_bucket(_add_lonlat(b, "o_custkey"), "o_orderdate", "month")),
        batch_format="pyarrow",
    )
    ds = ds.map_batches(lambda b: b.filter(pc.is_valid(b["tile_id"])), batch_format="pyarrow")
    ref = ray.put(make_admin())
    ds = ds.map_batches(
        PipJoin, fn_constructor_kwargs=dict(polygons_ref=ref),
        batch_format="pyarrow", concurrency=_pool(),
    )

    def _fill(b: pa.Table) -> pa.Table:
        filled = pc.fill_null(b["admin_id"], "__none__")
        return b.set_column(b.schema.get_field_index("admin_id"), "admin_id", filled)

    ds = ds.map_batches(_fill, batch_format="pyarrow")
    return grouped_agg(ds, ["tile_id", "admin_id"], [("count", None, "n_orders")])


def _sql_spatial_flagship() -> str:
    def cr(x1, y1, x2, y2):
        return f"(({x2} - {x1}) * (lat - {y1}) - ({y2} - {y1}) * (lon - {x1})) > 0"

    inside = " AND ".join(
        cr(f"a.x{i}", f"a.y{i}", f"a.x{i % 4 + 1}", f"a.y{i % 4 + 1}") for i in range(1, 5)
    )
    return f"""
WITH admin(admin_id, x1, y1, x2, y2, x3, y3, x4, y4) AS (VALUES
  {_admin_values_sql()}
), pts AS (
  SELECT o_orderkey, o_orderdate, {_sql_lon('o_custkey')} AS lon, {_sql_lat('o_custkey')} AS lat
  FROM orders
), tiled AS (
  SELECT lon, lat, {_SQL_TILE_EXPR} AS tile_id
  FROM pts WHERE lat >= -80.0 AND lat < 80.0
)
SELECT t.tile_id, coalesce(a.admin_id, '__none__') AS admin_id, count(*) AS n_orders
FROM tiled t LEFT JOIN admin a ON {inside}
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Q: knn_parts — kNN actor-pool lookup (SURVEY J7), oracle = SQL cross join


def q_knn_parts(sf_dir: str):
    from edkray.ops.joins import KnnJoin

    part = pq.read_table(_p(sf_dir, "part"), columns=["p_partkey"])
    keys = np.sort(part["p_partkey"].to_numpy())
    rlon, rlat = derive_lonlat(keys + 100000)
    refs = pa.table({"ref_id": pa.array(keys), "lon": pa.array(rlon), "lat": pa.array(rlat)})

    ds = _read(sf_dir, "customer", ["c_custkey"])
    ds = ds.map_batches(lambda b: _add_lonlat(b, "c_custkey"), batch_format="pyarrow")
    ref = ray.put(refs)
    ds = ds.map_batches(
        KnnJoin, fn_constructor_kwargs=dict(refs_ref=ref, k=3),
        batch_format="pyarrow", concurrency=_pool(),
    )

    def _explode(b: pa.Table) -> pa.Table:
        ck = b["c_custkey"].to_numpy(zero_copy_only=False)
        nb = b["neighbor_ids"].to_pylist()
        k = len(nb[0]) if nb else 0
        return pa.table(
            {
                "c_custkey": pa.array(np.repeat(ck, k)),
                "rank": pa.array(np.tile(np.arange(k, dtype=np.int64), len(ck))),
                "p_partkey": pa.array(np.concatenate(nb).astype(np.int64) if nb else np.array([], dtype=np.int64)),
            }
        )

    return ds.map_batches(_explode, batch_format="pyarrow")


_SQL_KNN = f"""
WITH c AS (
  SELECT c_custkey, {_sql_lon('c_custkey')} AS lon, {_sql_lat('c_custkey')} AS lat FROM customer
), p AS (
  SELECT p_partkey, {_sql_lon('p_partkey', 100000)} AS lon, {_sql_lat('p_partkey', 100000)} AS lat FROM part
), d AS (
  SELECT c.c_custkey, p.p_partkey,
         2 * 6371.0088 * asin(sqrt(
           pow(sin(radians(p.lat - c.lat) / 2), 2)
           + cos(radians(c.lat)) * cos(radians(p.lat)) * pow(sin(radians(p.lon - c.lon) / 2), 2)
         )) AS dist
  FROM c CROSS JOIN p
)
SELECT c_custkey, rank, p_partkey FROM (
  SELECT c_custkey, p_partkey,
         row_number() OVER (PARTITION BY c_custkey ORDER BY dist, p_partkey) - 1 AS rank
  FROM d
) WHERE rank < 3
"""


# --------------------------------------------------------------------------
# Q: radius_pairs — distance-band spatial self-join (grid-prefilter + exact
# haversine verify), oracle = SQL self cross join


_RADIUS_KM = 200.0


def q_radius_pairs(sf_dir: str):
    """All customer pairs within 200 great-circle km
    (ops/joins.py:radius_pairs): per-point quadcell ring replication
    (33-B projections, exact per-latitude lon half-width with
    antimeridian wrap), ONE hash shuffle on candidate cell,
    segment-vectorized pair-gen, exact haversine verify, each pair
    emitted exactly once (home cell of the smaller key). Oracle is the
    O(n²) SQL self-join — verification-only, the op never does
    all-pairs."""
    from edkray.ops.joins import radius_pairs

    ds = _read(sf_dir, "customer", ["c_custkey"])
    ds = ds.map_batches(lambda b: _add_lonlat(b, "c_custkey"), batch_format="pyarrow")
    out = radius_pairs(
        ds, key_col="c_custkey", lon_col="lon", lat_col="lat",
        radius_km=_RADIUS_KM, cell_res=7,
    )
    out = out.map_batches(lambda b: _round_cols(b, ["dist_km"]), batch_format="pyarrow")
    # Trailing map over all-empty blocks never runs, so re-anchor the
    # typed schema LAST — keeps ds.schema() non-None when the radius
    # yields zero pairs (tiny inputs).
    empty = pa.table({
        "key_a": pa.array([], pa.int64()),
        "key_b": pa.array([], pa.int64()),
        "dist_km": pa.array([], pa.float64()),
    })
    return out.union(ray.data.from_arrow(empty))


_SQL_RADIUS_PAIRS = f"""
WITH c AS (
  SELECT c_custkey, {_sql_lon('c_custkey')} AS lon, {_sql_lat('c_custkey')} AS lat FROM customer
), d AS (
  SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
         2 * 6371.0088 * asin(sqrt(
           pow(sin(radians(b.lat - a.lat) / 2), 2)
           + cos(radians(a.lat)) * cos(radians(b.lat)) * pow(sin(radians(b.lon - a.lon) / 2), 2)
         )) AS dist
  FROM c a JOIN c b ON a.c_custkey < b.c_custkey
)
SELECT key_a, key_b, round(dist, 4) AS dist_km FROM d WHERE dist <= {_RADIUS_KM}
"""


# --------------------------------------------------------------------------
# Q: spatial_clusters — DBSCAN-style density clusters (radius graph → CC)


def q_spatial_clusters(sf_dir: str):
    """Density-connected spatial clusters: points within 200 km are
    linked (ops/joins.py:radius_pairs — grid-prefilter, never
    all-pairs), clusters are the connected components of that graph
    (ops/graph.py:connected_components — hash-to-min, one bucketed
    shuffle per round), singletons are their own cluster via a
    bucketed LEFT join back to the corpus (no broadcast of the label
    table). Output: one row per cluster with its size. Oracle replays
    the radius graph as an O(n²) cross join + recursive-CTE closure."""
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.graph import connected_components
    from edkray.ops.joins import bucketed_join, radius_pairs

    ds = _read(sf_dir, "customer", ["c_custkey"])
    pts = ds.map_batches(lambda b: _add_lonlat(b, "c_custkey"), batch_format="pyarrow")
    edges = radius_pairs(
        pts, key_col="c_custkey", lon_col="lon", lat_col="lat",
        radius_km=_RADIUS_KM, cell_res=7,
    )
    labels = connected_components(edges, a_col="key_a", b_col="key_b", num_buckets=16)
    labels = labels.map_batches(
        lambda b: pa.table({"c_custkey": b["doc_id"], "cluster_id": b["cluster_id"]}),
        batch_format="pyarrow",
    ).union(ray.data.from_arrow(pa.table({
        # no-edge corpora: trailing maps skip empty blocks and drop the
        # schema; re-anchor so the left join below sees typed columns
        "c_custkey": pa.array([], pa.int64()),
        "cluster_id": pa.array([], pa.int64()),
    })))
    joined = bucketed_join(ds, labels, on=["c_custkey"], how="left", num_buckets=16)

    def _fill(b: pa.Table) -> pa.Table:
        cid = pc.coalesce(pc.cast(b["cluster_id"], pa.int64()), b["c_custkey"])
        return pa.table({"cluster_id": cid})

    return grouped_agg(
        joined.map_batches(_fill, batch_format="pyarrow"),
        ["cluster_id"], [("count", None, "n_points")],
    )


_SQL_SPATIAL_CLUSTERS = f"""
WITH RECURSIVE c AS (
  SELECT c_custkey, {_sql_lon('c_custkey')} AS lon, {_sql_lat('c_custkey')} AS lat FROM customer
), p AS (
  SELECT a.c_custkey AS u, b.c_custkey AS v
  FROM c a JOIN c b ON a.c_custkey < b.c_custkey
  WHERE 2 * 6371.0088 * asin(sqrt(
          pow(sin(radians(b.lat - a.lat) / 2), 2)
          + cos(radians(a.lat)) * cos(radians(b.lat)) * pow(sin(radians(b.lon - a.lon) / 2), 2)
        )) <= {_RADIUS_KM}
), edges AS (
  SELECT u, v FROM p UNION SELECT v, u FROM p
  UNION SELECT u, u FROM p UNION SELECT v, v FROM p
), reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), labels AS (
  SELECT u AS c_custkey, min(v) AS cluster_id FROM reach GROUP BY u
)
SELECT coalesce(l.cluster_id, cu.c_custkey) AS cluster_id, count(*) AS n_points
FROM customer cu LEFT JOIN labels l USING (c_custkey)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q: user_ewma — per-key time-decay mean (ewm adjust=True), §2.9 streaming


def q_user_ewma(sf_dir: str):
    """Per-user exponentially weighted mean of event value in event-time
    order (ops/window.py:ewma_by_key — one key co-shuffle, vectorized
    polars fold, weights anchored to the newest row so no overflow at
    any group length). alpha=0.5; (ts, event_id) totally orders rows.
    Oracle replays the same weights via row_number/pow in SQL."""
    from edkray.ops.window import ewma_by_key

    ds = _read(sf_dir, "events", ["user_id", "ts", "value", "event_id"])
    out = ewma_by_key(ds, ["user_id"], "ts", "value", alpha=0.5, tiebreak=["event_id"])
    return out.map_batches(lambda b: _round_cols(b, ["ewma"]), batch_format="pyarrow")


_SQL_USER_EWMA = """
WITH r AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS m
  FROM events
)
SELECT user_id, round(sum(value * pow(0.5, m - rn)) / sum(pow(0.5, m - rn)), 4) AS ewma
FROM r GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Q: weighted_orders — weighted sampling w/o replacement (exp-sort top-n)


def q_weighted_orders(sf_dir: str):
    """100 orders sampled ∝ o_totalprice without replacement
    (ops/aggregate.py:weighted_sample — Efraimidis–Spirakis exp-sort
    over a deterministic Knuth-hash uniform, selected by the rank-
    reducing global_top_k, never a shuffle). u is bit-identical in SQL
    ((h+0.5)/2^32 is exact double arithmetic), so the oracle replays
    the scores and the (score DESC, key) order exactly."""
    from edkray.ops.aggregate import weighted_sample

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = weighted_sample(ds, "o_orderkey", "o_totalprice", n=100)
    return out.map_batches(lambda b: _round_cols(b, ["score"], 10), batch_format="pyarrow")


_SQL_WEIGHTED_ORDERS = """
WITH s AS (
  SELECT o_orderkey, o_totalprice,
         ln((((o_orderkey * 2654435761) % 4294967296) + 0.5) / 4294967296.0)
           / o_totalprice AS score
  FROM orders
)
SELECT o_orderkey, o_totalprice, round(score, 10) AS score
FROM s ORDER BY score DESC, o_orderkey LIMIT 100
"""


# --------------------------------------------------------------------------
# Q: ntile_orders — exact global NTILE via range-partitioned ranking


def q_ntile_orders(sf_dir: str):
    """Exact global decile assignment over orders by totalprice
    (ops/rank.py:ntile — sampled range split points, combiner-counted
    part offsets, ONE co-shuffle ranking pass; never a global sort the
    driver has to walk). Output is the per-decile profile, which any
    rank-boundary error would perturb. Oracle: SQL NTILE(10) over the
    identical (price, orderkey) total order."""
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.rank import ntile

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    tiled = ntile(ds, "o_totalprice", ["o_orderkey"], tiles=10)
    out = grouped_agg(
        tiled,
        ["tile"],
        [
            ("count", None, "n_orders"),
            ("min", "o_totalprice", "lo_price"),
            ("max", "o_totalprice", "hi_price"),
            ("sum", "o_totalprice", "sum_price"),
        ],
    )
    return out.map_batches(
        lambda b: _round_cols(b, ["lo_price", "hi_price", "sum_price"], 2),
        batch_format="pyarrow",
    )


_SQL_NTILE_ORDERS = """
WITH t AS (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
  FROM orders
)
SELECT tile, count(*) AS n_orders,
       round(min(o_totalprice), 2) AS lo_price,
       round(max(o_totalprice), 2) AS hi_price,
       round(sum(o_totalprice), 2) AS sum_price
FROM t GROUP BY tile
"""


# --------------------------------------------------------------------------
# Q: rollup_lineitem — GROUP BY ROLLUP cascade (subtotals + grand total)


def q_rollup_lineitem(sf_dir: str):
    """ROLLUP(l_returnflag, l_linestatus) over lineitem
    (ops/aggregate.py:rollup_agg — one combiner-pre-aggregated shuffle
    at the finest level, coarser levels re-aggregate the already-
    reduced report driver-side under an ENFORCED row bound). Rolled-up
    keys carry the 'ALL' sentinel so no NULL ever reaches the driver's
    value-hash. Oracle: SQL ROLLUP with the same coalesce."""
    from edkray.ops.aggregate import rollup_agg

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
    out = rollup_agg(
        ds,
        ["l_returnflag", "l_linestatus"],
        [
            ("sum", "l_quantity", "sum_qty"),
            ("count", None, "n_rows"),
            ("max", "l_extendedprice", "max_price"),
        ],
    )
    return out.map_batches(
        lambda b: _round_cols(b, ["sum_qty", "max_price"], 2), batch_format="pyarrow"
    )


_SQL_ROLLUP_LINEITEM = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n_rows,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# Q: mode_event_type — deterministic per-group mode over a value histogram


def q_mode_event_type(sf_dir: str):
    """Most frequent event_type per user (ops/aggregate.py:grouped_mode
    — the wire carries the per-user value HISTOGRAM, combiner-pre-
    aggregated, then a bucketed argmax; ties break to the smaller
    value so the result is a total order SQL can replay via
    row_number over (count DESC, value ASC))."""
    from edkray.ops.aggregate import grouped_mode

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return grouped_mode(ds, ["user_id"], "event_type",
                        alias="mode_type", count_alias="n_mode")


_SQL_MODE_EVENT_TYPE = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
), r AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
  FROM c
)
SELECT user_id, event_type AS mode_type, n AS n_mode FROM r WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Q: skyline_orders — 2-D Pareto frontier (max price, min date)


def q_skyline_orders(sf_dir: str):
    """Orders on the (totalprice ↑, orderdate ↓) Pareto frontier
    (ops/rank.py:skyline_2d): per-batch vectorized local skyline is a
    sound superset filter, so the exchange carries only block
    frontiers (≈ log rows per block), then one candidate-bounded final
    pass. Oracle is the NOT EXISTS dominance test (DuckDB IEJoin)."""
    from edkray.ops.rank import skyline_2d

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])
    return skyline_2d(ds, max_col="o_totalprice", min_col="o_orderdate")


_SQL_SKYLINE_ORDERS = """
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders q
WHERE NOT EXISTS (
  SELECT 1 FROM orders p
  WHERE p.o_totalprice >= q.o_totalprice AND p.o_orderdate <= q.o_orderdate
    AND (p.o_totalprice > q.o_totalprice OR p.o_orderdate < q.o_orderdate)
)
"""


# --------------------------------------------------------------------------
# Q: idw_grid — inverse-distance-weighted field interpolation onto a grid

_IDW_RADIUS_KM = 2000.0


def q_idw_grid(sf_dir: str):
    """Scattered event values interpolated onto a fixed 15° grid
    (ops/joins.py:idw_grid — grid broadcast once via ray.put, dense
    batch×grid haversine matrix per batch, per-grid PARTIAL sums so
    the shuffle moves grid-sized combiners, never points). Oracle
    replays the cross join + weight formula in SQL."""
    from edkray.ops.joins import idw_grid

    ii, jj = np.meshgrid(np.arange(24), np.arange(12), indexing="ij")
    glon = (-172.5 + 15.0 * ii.ravel())
    glat = (-82.5 + 15.0 * jj.ravel())

    ds = _read(sf_dir, "events", ["event_id", "value"])
    pts = ds.map_batches(lambda b: _add_lonlat(b, "event_id"), batch_format="pyarrow")
    out = idw_grid(pts, "lon", "lat", "value", glon, glat,
                   radius_km=_IDW_RADIUS_KM)
    return out.map_batches(lambda b: _round_cols(b, ["idw"], 4), batch_format="pyarrow")


_SQL_IDW_GRID = f"""
WITH pts AS (
  SELECT {_sql_lon('event_id')} AS lon, {_sql_lat('event_id')} AS lat, value FROM events
), g AS (
  SELECT (i * 12 + j) AS gid, -172.5 + 15.0 * i AS glon, -82.5 + 15.0 * j AS glat
  FROM range(24) t1(i) CROSS JOIN range(12) t2(j)
), d AS (
  SELECT g.gid, g.glon, g.glat, p.value,
         2 * 6371.0088 * asin(sqrt(
           pow(sin(radians(g.glat - p.lat) / 2), 2)
           + cos(radians(p.lat)) * cos(radians(g.glat))
             * pow(sin(radians(g.glon - p.lon) / 2), 2)
         )) AS dist
  FROM g CROSS JOIN pts p
)
SELECT gid, glon, glat, count(*) AS n_pts,
       round(sum(value / (pow(dist, 2) + 1e-9))
             / sum(1.0 / (pow(dist, 2) + 1e-9)), 4) AS idw
FROM d WHERE dist <= {_IDW_RADIUS_KM} GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# Q: flag_quartiles — exact continuous per-group quantiles


def q_flag_quartiles(sf_dir: str):
    """Exact q25/median/q75 of quantity per return flag
    (ops/aggregate.py:grouped_quantile_cont — the wire carries the
    per-group value histogram, combiner-pre-aggregated; the bucketed
    finalize interpolates DuckDB's quantile_cont order statistics
    exactly)."""
    from edkray.ops.aggregate import grouped_quantile_cont

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    out = grouped_quantile_cont(
        ds, ["l_returnflag"], "l_quantity",
        ps=[0.25, 0.5, 0.75], aliases=["q25", "q50", "q75"],
    )
    return out.map_batches(
        lambda b: _round_cols(b, ["q25", "q50", "q75"], 4), batch_format="pyarrow"
    )


_SQL_FLAG_QUARTILES = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 4) AS q25,
       round(quantile_cont(l_quantity, 0.50), 4) AS q50,
       round(quantile_cont(l_quantity, 0.75), 4) AS q75
FROM lineitem GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q: typo_pairs — edit-distance-1 vocabulary join (deletion neighborhoods)


def q_typo_pairs(sf_dir: str):
    """Vocabulary entries one edit apart (ops/editdist.py:ed1_pairs —
    SymSpell deletion-neighborhood keys turn the O(V²) scan into one
    hash shuffle over neighborhood-sized buckets + a vectorized exact
    verify). Tokens: lowercased alpha runs of part names, length ≥ 3,
    deduped distributed. Oracle: the O(V²) levenshtein self-join —
    verification-only, the op never does all-pairs."""
    import polars as pl

    from edkray.ops.aggregate import distinct
    from edkray.ops.editdist import ed1_pairs

    ds = _read(sf_dir, "part", ["p_name"])

    def _toks(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).select(
            pl.col("p_name").str.to_lowercase()
            .str.extract_all(r"[a-z]+").alias("tok")
        ).explode("tok").filter(pl.col("tok").str.len_chars() >= 3)
        return df.to_arrow()

    vocab = distinct(ds.map_batches(_toks, batch_format="pyarrow"), ["tok"])
    return ed1_pairs(vocab, col="tok")


_SQL_TYPO_PAIRS = """
WITH toks AS (
  SELECT DISTINCT lower(unnest(regexp_split_to_array(p_name, '[^a-zA-Z]+'))) AS tok
  FROM part
), t AS (
  SELECT tok FROM toks WHERE length(tok) >= 3
)
SELECT a.tok AS tok_a, b.tok AS tok_b
FROM t a JOIN t b ON a.tok < b.tok AND levenshtein(a.tok, b.tok) = 1
"""


# --------------------------------------------------------------------------
# Q: funnel_steps — ordered view→click→purchase funnel over events


def q_funnel_steps(sf_dir: str):
    """Users reaching each step of the view→click→purchase funnel with
    strictly increasing timestamps, greedy earliest-transition
    semantics (ops/window.py:funnel_counts — one key co-shuffle, the
    whole step chain vectorized in-bucket, only per-bucket counts on
    the wire). Oracle replays the same min-ts join chain in SQL."""
    from edkray.ops.window import funnel_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    return funnel_counts(ds, ["user_id"], "ts", "event_type",
                         steps=["view", "click", "purchase"])


_SQL_FUNNEL_STEPS = """
WITH t1 AS (
  SELECT user_id, min(ts) AS ts1 FROM events WHERE event_type = 'view' GROUP BY 1
), t2 AS (
  SELECT e.user_id, min(e.ts) AS ts2
  FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY 1
), t3 AS (
  SELECT e.user_id, min(e.ts) AS ts3
  FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY 1
)
SELECT 1 AS step, 'view' AS step_type, count(*) AS n_keys FROM t1
UNION ALL SELECT 2, 'click', count(*) FROM t2
UNION ALL SELECT 3, 'purchase', count(*) FROM t3
"""


# --------------------------------------------------------------------------
# Q: user_gaps — per-user inter-event gap stats (the LAG window)


def q_user_gaps(sf_dir: str):
    """Per-user inter-event gap statistics in event-time order
    (ops/window.py:gap_stats — one key co-shuffle, sort + diff +
    aggregate as a single vectorized polars plan per bucket). Oracle:
    SQL LAG over the same (ts, event_id) order."""
    from edkray.ops.window import gap_stats

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    out = gap_stats(ds, ["user_id"], "ts", tiebreak=["event_id"])
    return out.map_batches(
        lambda b: _round_cols(b, ["mean_gap", "max_gap"], 4), batch_format="pyarrow"
    )


_SQL_USER_GAPS = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id,
       count(gap_us) AS n_gaps,
       round((sum(gap_us) / count(gap_us)) / 1000000.0, 4) AS mean_gap,
       round(max(gap_us) / 1000000.0, 4) AS max_gap
FROM g GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q: running_totals — per-user cumulative sum in event-time order


def q_running_totals(sf_dir: str):
    """Per-user running total of event value (ops/window.py:
    cumsum_by_key — one key co-shuffle, vectorized cum_sum over the
    (ts, event_id) order; the accumulation sequence matches the SQL
    window frame addition-by-addition)."""
    from edkray.ops.window import cumsum_by_key

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = cumsum_by_key(ds, ["user_id"], "ts", "value", tiebreak=["event_id"])
    out = out.map_batches(
        lambda b: b.select(["event_id", "user_id", "running_sum"]),
        batch_format="pyarrow",
    )
    return out.map_batches(
        lambda b: _round_cols(b, ["running_sum"], 4), batch_format="pyarrow"
    )


_SQL_RUNNING_TOTALS = """
SELECT event_id, user_id,
       round(sum(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING), 4) AS running_sum
FROM events
"""


# --------------------------------------------------------------------------
# Q: user_type_pivot — long→wide pivot of per-user event-type counts

_EVENT_TYPES = ["view", "click", "signup", "error", "purchase"]


def q_user_type_pivot(sf_dir: str):
    """Per-user event counts pivoted wide, one column per event type
    (ops/aggregate.py:pivot_counts — the per-batch combiner emits the
    wide partial directly, so the shuffle carries key-sized wide rows
    and the pivot costs nothing beyond the groupby). Oracle: FILTER
    counts per category."""
    from edkray.ops.aggregate import pivot_counts

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return pivot_counts(ds, ["user_id"], "event_type", _EVENT_TYPES)


_SQL_USER_TYPE_PIVOT = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'view') AS n_view,
       count(*) FILTER (WHERE event_type = 'click') AS n_click,
       count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       count(*) FILTER (WHERE event_type = 'error') AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q: vocab_overlap / vocab_only_docs — INTERSECT / EXCEPT set ops


def _doc_part_vocabs(sf_dir: str):
    import polars as pl

    def _tok(col):
        def _fn(b: pa.Table) -> pa.Table:
            return (
                pl.from_arrow(b)
                .select(pl.col(col).str.to_lowercase()
                        .str.extract_all(r"[a-z]+").alias("tok"))
                .explode("tok")
                .filter(pl.col("tok").str.len_chars() >= 3)
                .to_arrow()
            )
        return _fn

    docs = _read(sf_dir, "documents", ["text"]).map_batches(
        _tok("text"), batch_format="pyarrow")
    parts = _read(sf_dir, "part", ["p_name"]).map_batches(
        _tok("p_name"), batch_format="pyarrow")
    return docs, parts


def q_vocab_overlap(sf_dir: str):
    """Tokens present in BOTH the document corpus and the part-name
    vocabulary (ops/setops.py:set_op 'intersect' — per-batch dedup
    combiner, one hash shuffle of tagged keys, two-flag max decision).
    Oracle: SQL INTERSECT."""
    from edkray.ops.setops import set_op

    docs, parts = _doc_part_vocabs(sf_dir)
    return set_op(docs, parts, ["tok"], how="intersect")


def q_vocab_only_docs(sf_dir: str):
    """Tokens in the document corpus but NOT in part names
    (ops/setops.py:set_op 'except' — same single tagged shuffle).
    Oracle: SQL EXCEPT."""
    from edkray.ops.setops import set_op

    docs, parts = _doc_part_vocabs(sf_dir)
    return set_op(docs, parts, ["tok"], how="except")


_SQL_VOCAB_BASE = """
WITH dt AS (
  SELECT lower(unnest(regexp_split_to_array(text, '[^a-zA-Z]+'))) AS tok FROM documents
), pt AS (
  SELECT lower(unnest(regexp_split_to_array(p_name, '[^a-zA-Z]+'))) AS tok FROM part
), d AS (SELECT tok FROM dt WHERE length(tok) >= 3),
     p AS (SELECT tok FROM pt WHERE length(tok) >= 3)
"""

_SQL_VOCAB_OVERLAP = _SQL_VOCAB_BASE + "SELECT tok FROM d INTERSECT SELECT tok FROM p"
_SQL_VOCAB_ONLY_DOCS = _SQL_VOCAB_BASE + "SELECT tok FROM d EXCEPT SELECT tok FROM p"


# --------------------------------------------------------------------------
# Q: price_histogram — global equi-width histogram (two-pass)


def q_price_histogram(sf_dir: str):
    """20-bin equi-width histogram of order totalprice
    (ops/aggregate.py:histogram — a narrow min/max pass, then per-batch
    bin assignment + combiner counts; edge formulas replicate the SQL
    operation order bit-for-bit)."""
    from edkray.ops.aggregate import histogram

    ds = _read(sf_dir, "orders", ["o_totalprice"])
    out = histogram(ds, "o_totalprice", bins=20)
    return out.map_batches(lambda b: _round_cols(b, ["lo", "hi"], 4),
                           batch_format="pyarrow")


_SQL_PRICE_HISTOGRAM = """
WITH s AS (
  SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders
), b AS (
  SELECT least(CAST(floor((o_totalprice - mn) / (mx - mn) * 20) AS BIGINT), 19) AS bin,
         mn, mx
  FROM orders, s
)
SELECT bin,
       round(mn + bin * (mx - mn) / 20, 4) AS lo,
       round(mn + (bin + 1.0) * (mx - mn) / 20, 4) AS hi,
       count(*) AS n
FROM b GROUP BY 1, mn, mx
"""


# --------------------------------------------------------------------------
# Q: above_avg_orders — decorrelated correlated subquery


def q_above_avg_orders(sf_dir: str):
    """Orders priced above their OWN customer's average — the classic
    correlated subquery, decorrelated into a per-key mean
    (ops/aggregate.py:grouped_agg, combiner-pre-aggregated) plus a
    LARGE↔LARGE co-shuffled join on the same key
    (ops/joins.py:bucketed_join — customer cardinality scales with the
    corpus, so no broadcast). Exact-equality rows (single-order
    customers) fall out identically on both engines."""
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.joins import bucketed_join

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    avgs = grouped_agg(ds, ["o_custkey"], [("mean", "o_totalprice", "__avg")])
    joined = bucketed_join(ds, avgs, on=["o_custkey"], how="inner", num_buckets=16)

    def _filt(b: pa.Table) -> pa.Table:
        keep = pc.greater(b["o_totalprice"], b["__avg"])
        return b.filter(keep).select(["o_orderkey", "o_custkey", "o_totalprice"])

    return joined.map_batches(_filt, batch_format="pyarrow")


_SQL_ABOVE_AVG_ORDERS = """
WITH a AS (
  SELECT o_custkey, sum(o_totalprice) / count(o_totalprice) AS avg_p
  FROM orders GROUP BY 1
)
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o JOIN a USING (o_custkey)
WHERE o.o_totalprice > a.avg_p
"""


# --------------------------------------------------------------------------
# Q: region_nations — deterministic per-group string aggregation


def q_region_nations(sf_dir: str):
    """Comma-joined, value-sorted nation list per region
    (ops/aggregate.py:grouped_string_agg over grouped_collect — list
    combiner per batch, one bucketed shuffle, vectorized join-to-
    string; broadcast join for the tiny region dimension)."""
    from edkray.ops.aggregate import grouped_string_agg
    from edkray.ops.joins import broadcast_join

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region_tbl = pq.read_table(_p(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    joined = broadcast_join(nation, region_tbl, on=["n_regionkey"],
                            right_on=["r_regionkey"], how="inner")
    return grouped_string_agg(joined, ["r_name"], "n_name", alias="nations")


_SQL_REGION_NATIONS = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM region JOIN nation ON r_regionkey = n_regionkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q: user_trajectories — per-user path length / net displacement


def _sql_hav(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    return (
        f"2 * 6371.0088 * asin(sqrt("
        f"pow(sin(radians({lat2} - {lat1}) / 2), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin(radians({lon2} - {lon1}) / 2), 2)))"
    )


def q_user_trajectories(sf_dir: str):
    """Per-user movement summary over the event stream — legs, total
    great-circle path, net first→last displacement
    (ops/window.py:trajectory_stats — one key co-shuffle, vectorized
    haversine over shifted coordinate arrays, key boundaries masked).
    Oracle: SQL LAG + ordered first/last over the same total order."""
    from edkray.ops.window import trajectory_stats

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    pts = ds.map_batches(lambda b: _add_lonlat(b, "event_id"), batch_format="pyarrow")
    out = trajectory_stats(pts, ["user_id"], "ts", "lon", "lat",
                           tiebreak=["event_id"])
    return out.map_batches(
        lambda b: _round_cols(b, ["path_km", "net_km"], 4), batch_format="pyarrow"
    )


_SQL_USER_TRAJECTORIES = f"""
WITH p AS (
  SELECT user_id, ts, event_id,
         {_sql_lon('event_id')} AS lon, {_sql_lat('event_id')} AS lat
  FROM events
), l AS (
  SELECT user_id, lon, lat,
         lag(lon) OVER w AS plon, lag(lat) OVER w AS plat
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), agg AS (
  SELECT user_id, count(plon) AS n_legs,
         sum(CASE WHEN plon IS NULL THEN 0
             ELSE {_sql_hav('plon', 'plat', 'lon', 'lat')} END) AS path_km
  FROM l GROUP BY 1
), e AS (
  SELECT user_id,
         first(lon ORDER BY ts, event_id) AS lon0,
         first(lat ORDER BY ts, event_id) AS lat0,
         last(lon ORDER BY ts, event_id) AS lon1,
         last(lat ORDER BY ts, event_id) AS lat1
  FROM p GROUP BY 1
)
SELECT a.user_id, a.n_legs, round(a.path_km, 4) AS path_km,
       round({_sql_hav('e.lon0', 'e.lat0', 'e.lon1', 'e.lat1')}, 4) AS net_km
FROM agg a JOIN e USING (user_id)
"""


# --------------------------------------------------------------------------
# Q: tfidf_terms — per-document keyword extraction (top-3 by tf·idf)


def q_tfidf_terms(sf_dir: str):
    """Keyword extraction (ops/text.py:tfidf_terms): exact per-batch tf
    (a doc never splits), bucketed df fold, tagged-union co-shuffle df
    join (never a vocab broadcast), combiner-pre-aggregated per-doc
    top-3. Oracle replays tf/df/ln(N/df) and the (tfidf DESC, term)
    row_number in SQL."""
    from edkray.ops.text import tfidf_terms

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tfidf_terms(ds, k=3)


_SQL_TFIDF = r"""
WITH tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
        FROM documents)
  GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
), s AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * ln(n.n / df.df) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
), r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) - 1 AS "rank"
  FROM s
)
SELECT doc_id, term, tf, df, tfidf, "rank" FROM r WHERE "rank" < 3
"""


# --------------------------------------------------------------------------
# Q: token_stats — token counting over documents (text analysis)


def q_token_stats(sf_dir: str):
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.text import token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    ds = ds.map_batches(lambda b: token_count(b), batch_format="pyarrow")
    return grouped_agg(ds, ["lang"], [("count", None, "n_docs"), ("sum", "n_tokens", "sum_tokens")])


_SQL_TOKENS = r"""
WITH t AS (
  SELECT lang, regexp_replace(text, '^\s+|\s+$', '', 'g') AS tt FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN tt = '' THEN 0 ELSE len(regexp_split_to_array(tt, '\s+')) END) AS BIGINT) AS sum_tokens
FROM t GROUP BY lang
"""


def q_bpe_tokens(sf_dir: str):
    """GPT-2-style pre-tokenizer corpus token budget per lang
    (ops/text.py:bpe_token_count — the BPE-ish regex counter alongside
    the whitespace counter of token_stats)."""
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.text import bpe_token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    ds = ds.map_batches(lambda b: bpe_token_count(b), batch_format="pyarrow")
    return grouped_agg(
        ds, ["lang"],
        [("count", None, "n_docs"), ("sum", "n_bpe_tokens", "sum_bpe_tokens")],
    )


def q_bpe_merges(sf_dir: str):
    """Tokenizer training (ops/text.py:bpe_train): distributed
    pre-counted word partials with an ENFORCED driver bound, then the
    Sennrich merge loop over the word TABLE (never the corpus).
    Rows-only driver check by nature — the merge sequence is an
    iterative, data-dependent algorithm (each step's pair counts depend
    on all prior merges), outside SQL; determinism and parity with a
    from-scratch recount reference are pinned by TestBpeTrain."""
    from edkray.ops.text import bpe_train

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bpe_train(ds, num_merges=30, min_count=2)


_SQL_BPE_TOKENS = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +'))) AS BIGINT)
         AS sum_bpe_tokens
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------------
# Q: quality_by_source — quality scoring (char/digit stats)


def q_quality_by_source(sf_dir: str):
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.text import quality_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    ds = ds.map_batches(lambda b: quality_stats(b), batch_format="pyarrow")
    return grouped_agg(
        ds,
        ["source"],
        [("count", None, "n_docs"), ("sum", "n_chars", "sum_chars"), ("sum", "n_digit", "sum_digits")],
    )


_SQL_QUALITY = """
SELECT source, count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars,
       CAST(sum(length(regexp_replace(text, '[^0-9]', '', 'g'))) AS BIGINT) AS sum_digits
FROM documents GROUP BY source
"""


# --------------------------------------------------------------------------
# Q: langid — heuristic language ID (stopword hit-rate, actor-pool stage)

_STOP_SQL = {
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "ein", "mit", "sie", "zu"],
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that", "was", "for"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "yo", "no", "que", "por"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "je", "de", "pas", "que", "vous"],
}


def q_langid(sf_dir: str):
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.text import LangId

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    ds = ds.map_batches(LangId, batch_format="pyarrow", concurrency=_pool())
    return grouped_agg(ds, ["lang", "lang_pred"], [("count", None, "n_docs")])


def _sql_langid() -> str:
    rates = []
    for code, words in _STOP_SQL.items():
        lst = ", ".join(f"'{w}'" for w in words)
        rates.append(
            f"CASE WHEN nw = 0 THEN 0.0 ELSE len(list_filter(words, x -> list_contains([{lst}], x))) / CAST(nw AS DOUBLE) END AS r_{code}"
        )
    rate_sql = ",\n         ".join(rates)
    return f"""
WITH w AS (
  SELECT lang, regexp_extract_all(lower(text), '[a-z0-9_]+') AS words,
         length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS ncjk,
         length(text) AS nch
  FROM documents
), r AS (
  SELECT lang, len(words) AS nw, ncjk, nch,
         {rate_sql}
  FROM w
)
SELECT lang,
       CASE WHEN ncjk > 0.3 * greatest(nch, 1) THEN 'zh'
            WHEN nw = 0 THEN 'und'
            WHEN greatest(r_de, r_en, r_es, r_fr) <= 0 THEN 'und'
            WHEN r_de >= r_en AND r_de >= r_es AND r_de >= r_fr THEN 'de'
            WHEN r_en >= r_es AND r_en >= r_fr THEN 'en'
            WHEN r_es >= r_fr THEN 'es'
            ELSE 'fr' END AS lang_pred,
       count(*) AS n_docs
FROM r GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Q: repetition_stats — Gopher-style repetition filters (Rae et al. 2021
# §A1.1): duplicate-token fraction + top-2-gram fraction per document.
# Vectorized polars plan (ops/text.py:repetition_stats), mirrored by a
# DuckDB list-comprehension oracle.


def q_repetition_stats(sf_dir: str):
    from edkray.ops.text import repetition_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(repetition_stats, batch_format="pyarrow")
    return ds.map_batches(
        lambda b: b.select(["doc_id", "n_tokens", "dup_token_frac", "top_bigram_frac"]),
        batch_format="pyarrow",
    )


_SQL_REPETITION = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS l FROM documents
), stats AS (
  SELECT doc_id, len(l) AS nt, len(list_distinct(l)) AS nu,
         [l[i] || ' ' || l[i+1] FOR i IN range(1, len(l))] AS bigrams
  FROM toks
), bg AS (
  SELECT doc_id, unnest(bigrams) AS b FROM stats
), top AS (
  SELECT doc_id, max(c) AS topn FROM (
    SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b
  ) GROUP BY doc_id
)
SELECT s.doc_id, CAST(s.nt AS BIGINT) AS n_tokens,
       CASE WHEN s.nt = 0 THEN 0.0
            ELSE 1.0 - CAST(s.nu AS DOUBLE) / s.nt END AS dup_token_frac,
       CAST(coalesce(t.topn, 0) AS DOUBLE) / greatest(s.nt - 1, 1) AS top_bigram_frac
FROM stats s LEFT JOIN top t USING (doc_id)
"""


# --------------------------------------------------------------------------
# Q: contamination — benchmark-contamination scan: flag documents
# containing any needle from a small benchmark set (here derived
# deterministically from the corpus itself: chars 11-40 of every 97th
# doc). Needle list is a driver-side collect of a ~n/97-row projection
# (bounded, the broadcast-small-side pattern), ray.put once, scanned
# per batch with vectorized pc.match_substring in an actor pool.


def q_contamination(sf_dir: str):
    import ray

    from edkray.ops.text import Contaminator

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _pick(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        nch = pc.utf8_length(b["text"]).to_numpy(zero_copy_only=False)
        b = b.filter(pa.array((ids % 97 == 0) & (nch >= 40)))
        return b.set_column(
            b.schema.get_field_index("text"), "text", pc.utf8_slice_codeunits(b["text"], 10, 40)
        ).select(["text"])

    needles_tbl = pa.concat_tables(
        ray.get(ds.map_batches(_pick, batch_format="pyarrow").to_arrow_refs())
    )
    ref = ray.put(needles_tbl["text"].to_pylist())
    out = ds.map_batches(
        Contaminator,
        fn_constructor_kwargs={"needles_ref": ref},
        batch_format="pyarrow",
        concurrency=_pool(),
    )
    return out.map_batches(
        lambda b: b.select(["doc_id", "n_hits", "contaminated"]), batch_format="pyarrow"
    )


_SQL_CONTAMINATION = """
WITH needles AS (
  SELECT substring(text, 11, 30) AS s FROM documents
  WHERE doc_id % 97 = 0 AND length(text) >= 40
), hits AS (
  SELECT d.doc_id, count(*) AS n_hits
  FROM documents d JOIN needles n ON position(n.s IN d.text) > 0
  GROUP BY d.doc_id
)
SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


# --------------------------------------------------------------------------
# Q: stratified_sample — deterministic per-group sampling (cap docs per
# language): smallest-Knuth-hash-of-id rank within key, one bucketed
# group shuffle, rank mirrored exactly by a SQL window function.


def q_stratified_sample(sf_dir: str):
    from edkray.ops.aggregate import stratified_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return stratified_sample(ds, ["lang"], 20, "doc_id")


_SQL_STRATIFIED = """
WITH h AS (
  SELECT doc_id, lang, (doc_id * 2654435761) % 4294967296 AS hh FROM documents
), r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rk
  FROM h
)
SELECT doc_id, lang FROM r WHERE rk <= 20
"""


# --------------------------------------------------------------------------
# Q: length_quantiles — exact per-language discrete quantiles of doc
# length (the corpus length-filter thresholds) via the histogram
# shuffle (ops/aggregate.py:grouped_quantile_disc): the wire carries
# per-batch (lang, n_chars, count) partials, never document rows.


def q_length_quantiles(sf_dir: str):
    from edkray.ops.aggregate import grouped_quantile_disc

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    return grouped_quantile_disc(
        ds, ["lang"], "n_chars", [0.5, 0.9], ["q50", "q90"], count_alias="n_docs"
    )


_SQL_LENGTH_QUANTILES = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS q50,
       CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS q90
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------------
# Q: pii_scrub — PII redaction (emails/phones/IPv4) with per-kind match
# counts. The corpus carries no PII, so the query plants a deterministic
# email+phone on every third doc (both sides construct the identical
# enriched text), then scrubs — proving the patterns, counts and
# replacement order on non-trivial input. Engine regex is Rust (polars),
# oracle regex is RE2 (DuckDB); PII_PATTERNS stays in their common
# subset and this oracle is the pin.


def q_pii_scrub(sf_dir: str):
    from edkray.ops.text import pii_scrub

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _plant(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        suffix = pa.array(
            np.where(
                ids % 3 == 0,
                np.char.add(
                    np.char.add(" contact user", ids.astype("U20")),
                    "@example.com or 415-555-1234",
                ),
                "",
            )
        )
        return b.set_column(
            b.schema.get_field_index("text"), "text",
            pc.binary_join_element_wise(b["text"], suffix, ""),
        )

    ds = ds.map_batches(_plant, batch_format="pyarrow")
    ds = ds.map_batches(lambda b: pii_scrub(b), batch_format="pyarrow")

    def _proj(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.append_column("red_len", pc.utf8_length(b["text"]).cast(pa.int64()))
        return b.select(["doc_id", "n_email", "n_phone", "n_ip", "red_len"])

    return ds.map_batches(_proj, batch_format="pyarrow")


def _sql_pii() -> str:
    from edkray.ops.text import PII_PATTERNS

    em, ph, ip = (p for _, p, _ in PII_PATTERNS)
    red = "t"
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"""
WITH planted AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 3 = 0
                      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 415-555-1234'
                      ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{em}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, '{ph}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(t, '{ip}')) AS BIGINT) AS n_ip,
       CAST(length({red}) AS BIGINT) AS red_len
FROM planted
"""


# --------------------------------------------------------------------------
# Q: html_extract — html:binary → extracted text (the input_hint's
# "byte-identical extracted text per url" invariant surface). The engine
# wraps each document's text in a deterministic HTML envelope (script /
# style / comment blocks, named + numeric entities), encodes it to
# binary, then runs the vectorized HtmlExtract actor stage; the oracle
# INDEPENDENTLY re-implements the extraction spec as a DuckDB
# regexp_replace / replace chain over the same envelope — two
# implementations of one spec, compared byte-for-byte per row.

# envelope pieces shared verbatim between the Arrow builder and the SQL
# oracle so they cannot drift (single quotes excluded: SQL literal)
_HTML_P1 = "<html><head><title>d"
_HTML_P2 = (
    '</title><script type="text/javascript">if (1<2) { x = "&amp;"; }</script>'
    "<style>.a > .b { color: red; }</style></head><body><h1>Doc &amp; "
)
_HTML_P3 = "</h1><p>"
_HTML_P4 = (
    "</p><!-- hidden --><div>tail &lt;t&gt; &quot;q&quot; "
    "it&#39;s&nbsp;A&#65;&#x42;</div></body></html>"
)


def q_html_extract(sf_dir: str):
    from edkray.ops.html import HtmlExtract

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _wrap(b: pa.Table) -> pa.Table:
        ids = pc.cast(b["doc_id"], pa.string())
        txt = pc.fill_null(pc.cast(b["text"], pa.string()), "")
        html = pc.binary_join_element_wise(
            _HTML_P1, ids, _HTML_P2, ids, _HTML_P3, txt, _HTML_P4, ""
        )
        return pa.table({"doc_id": b["doc_id"], "html": html.cast(pa.binary())})

    ds = ds.map_batches(_wrap, batch_format="pyarrow")
    ds = ds.map_batches(HtmlExtract, batch_format="pyarrow", concurrency=_pool())
    return ds.map_batches(lambda b: b.select(["doc_id", "extracted"]), batch_format="pyarrow")


def _sql_html_extract() -> str:
    # the same spec, re-derived in SQL: block drops → tag strip → named
    # entity chain (&amp; last) → whitespace collapse/trim → the planted
    # numeric entities (general &#NN; decode needs a callback SQL lacks;
    # the engine's generality is unit-tested in tests/test_html.py)
    ext = "html"
    for pat, flags in (
        (r"<script\b[^>]*>.*?</script>", "gis"),
        (r"<style\b[^>]*>.*?</style>", "gis"),
        (r"<!--.*?-->", "gs"),
        (r"<[^>]*>", "gs"),
    ):
        ext = f"regexp_replace({ext}, '{pat}', ' ', '{flags}')"
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "chr(39)"),
        ("&apos;", "chr(39)"), ("&nbsp;", " "), ("&amp;", "&"),
    ):
        rep = ch if ch == "chr(39)" else f"'{ch}'"
        ext = f"replace({ext}, '{ent}', {rep})"
    ext = f"trim(regexp_replace({ext}, '\\s+', ' ', 'g'))"
    ext = f"replace(replace({ext}, '&#65;', 'A'), '&#x42;', 'B')"
    return f"""
WITH raw AS (
  SELECT doc_id,
         '{_HTML_P1}' || doc_id || '{_HTML_P2}' || doc_id || '{_HTML_P3}'
           || coalesce(text, '') || '{_HTML_P4}' AS html
  FROM documents
)
SELECT doc_id, {ext} AS extracted FROM raw
"""


# --------------------------------------------------------------------------
# Q: ngram_jaccard_pairs — exact char-8-gram Jaccard over all doc pairs
# (the dedup-verification oracle path; broadcast gram sets, id_a < id_b)


def q_ngram_jaccard_pairs(sf_dir: str, k: int = 8, threshold: float = 0.1):
    from edkray.ops.text import kgram_hashes

    docs = pq.read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    ids = docs["doc_id"].to_numpy()
    grams = [
        np.unique(kgram_hashes((t or "").encode("utf-8", "ignore"), k))
        for t in docs["text"].to_pylist()
    ]
    state = ray.put((ids, grams))

    class _PairGen:
        def __init__(self):
            self.ids, self.grams = ray.get(state)
            self.sizes = np.array([len(g) for g in self.grams])
            self.by_id = {int(i): j for j, i in enumerate(self.ids)}

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_a, out_b, out_j = [], [], []
            for did in batch["doc_id"].to_pylist():
                ai = self.by_id[int(did)]
                ga = self.grams[ai]
                for bi in range(len(self.ids)):
                    if self.ids[bi] <= did:
                        continue
                    inter = np.intersect1d(ga, self.grams[bi], assume_unique=True).size
                    if inter == 0:
                        continue
                    jac = inter / (len(ga) + self.sizes[bi] - inter)
                    if jac >= threshold:
                        out_a.append(did)
                        out_b.append(int(self.ids[bi]))
                        out_j.append(jac)
            return pa.table(
                {
                    "id_a": pa.array(out_a, type=pa.int64()),
                    "id_b": pa.array(out_b, type=pa.int64()),
                    "jaccard": pa.array(out_j, type=pa.float64()),
                }
            )

    ds = _read(sf_dir, "documents", ["doc_id"])
    return ds.map_batches(_PairGen, batch_format="pyarrow", concurrency=_pool(), batch_size=256)


def _sql_jaccard(threshold: float) -> str:
    # Docs with NULL/empty text have an empty k-gram set and are never
    # duplicates (the engine's gate, VERDICT r4 #5) — excluded from g.
    return f"""
WITH g AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 8) AS gram
  FROM (SELECT doc_id, text,
               unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS i
        FROM documents
        WHERE text IS NOT NULL AND length(text) > 0)
), n AS (
  SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(c AS DOUBLE) / (na.n + nb.n - c) AS jaccard
FROM inter JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= {threshold}
"""


_SQL_JACCARD = _sql_jaccard(0.1)


# --------------------------------------------------------------------------
# Q: curation — end-to-end training-data curation flagship


def q_curation(sf_dir: str, min_tokens: int = 20, max_dup_frac: float = 0.6):
    """The composed curation pipeline a web-corpus user actually runs:
    near-dup pair mining (MinHash-LSH) → connected-component keep/drop
    → per-doc Gopher repetition stats → language ID → quality gate
    (kept = not-a-dup-drop AND n_tokens ≥ 20 AND dup_token_frac ≤ 0.6)
    → per-(source, lang_pred) retention stats. The drop set (cluster
    non-representatives only — bounded by dup-doc count) broadcasts via
    ``ray.put``; documents stream through one enrich pass; the final
    aggregate is a partial-combined grouped_agg. Oracle: every stage's
    existing SQL mirror composed into one DuckDB query."""
    import pyarrow.compute as pc

    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.dedup import minhash_lsh_pairs
    from edkray.ops.graph import dedup_decisions
    from edkray.ops.joins import broadcast_join
    from edkray.ops.text import LangId, repetition_stats

    pairs = minhash_lsh_pairs(_read(sf_dir, "documents", ["doc_id", "text"]),
                              threshold=0.5, concurrency=_pool())
    decisions = dedup_decisions(pairs, num_buckets=16)
    def _drops(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["keep"], False)).select(["doc_id"])
        return b.append_column("__dup_drop", pa.array(np.ones(len(b), dtype=bool)))

    dropped = decisions.map_batches(_drops, batch_format="pyarrow")
    drop_tab = pa.concat_tables(
        [t for t in ray.get(dropped.to_arrow_refs()) if t.num_rows]
        or [pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "__dup_drop": pa.array([], type=pa.bool_())})]
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    ds = ds.map_batches(repetition_stats, batch_format="pyarrow")
    ds = ds.map_batches(LangId, batch_format="pyarrow", concurrency=_pool())
    ds = ds.map_batches(
        lambda b: b.select(["doc_id", "source", "lang_pred", "n_tokens",
                            "dup_token_frac"]),
        batch_format="pyarrow",
    )
    ds = broadcast_join(ds, drop_tab, on=["doc_id"], how="left")

    def _gate(b: pa.Table) -> pa.Table:
        nt = b["n_tokens"].to_numpy(zero_copy_only=False)
        dup = b["dup_token_frac"].to_numpy(zero_copy_only=False)
        is_drop = pc.fill_null(b["__dup_drop"], False).to_numpy(zero_copy_only=False)
        kept = ~is_drop & (nt >= min_tokens) & (dup <= max_dup_frac)
        return pa.table({
            "source": b["source"],
            "lang_pred": b["lang_pred"],
            "kept_i": pa.array(kept.astype(np.int64)),
            "kept_tok": pa.array(np.where(kept, nt, 0).astype(np.int64)),
        })

    ds = ds.map_batches(_gate, batch_format="pyarrow")
    return grouped_agg(ds, ["source", "lang_pred"],
                       [("count", None, "n_docs"),
                        ("sum", "kept_i", "n_kept"),
                        ("sum", "kept_tok", "kept_tokens")])


def _sql_curation(min_tokens: int = 20, max_dup_frac: float = 0.6) -> str:
    rates = []
    for code, words in _STOP_SQL.items():
        lst = ", ".join(f"'{w}'" for w in words)
        rates.append(
            f"CASE WHEN nw = 0 THEN 0.0 ELSE len(list_filter(words, "
            f"x -> list_contains([{lst}], x))) / CAST(nw AS DOUBLE) END AS r_{code}"
        )
    rate_sql = ",\n         ".join(rates)
    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_sql_jaccard(0.5)})
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
  UNION SELECT id_a, id_a FROM pairs
  UNION SELECT id_b, id_b FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), dropped AS (
  SELECT u AS doc_id FROM reach GROUP BY u HAVING u <> min(v)
), rep AS (
  SELECT doc_id, len(l) AS nt, len(list_distinct(l)) AS nu
  FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS l FROM documents)
), w AS (
  SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9_]+') AS words,
         length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS ncjk,
         length(text) AS nch
  FROM documents
), r AS (
  SELECT doc_id, source, len(words) AS nw, ncjk, nch,
         {rate_sql}
  FROM w
), lid AS (
  SELECT doc_id, source,
         CASE WHEN ncjk > 0.3 * greatest(nch, 1) THEN 'zh'
              WHEN nw = 0 THEN 'und'
              WHEN greatest(r_de, r_en, r_es, r_fr) <= 0 THEN 'und'
              WHEN r_de >= r_en AND r_de >= r_es AND r_de >= r_fr THEN 'de'
              WHEN r_en >= r_es AND r_en >= r_fr THEN 'en'
              WHEN r_es >= r_fr THEN 'es'
              ELSE 'fr' END AS lang_pred
  FROM r
), flags AS (
  SELECT l.source, l.lang_pred, rep.nt,
         (d.doc_id IS NULL AND rep.nt >= {min_tokens} AND
          (CASE WHEN rep.nt = 0 THEN 0.0
                ELSE 1.0 - CAST(rep.nu AS DOUBLE) / rep.nt END) <= {max_dup_frac}
         ) AS kept
  FROM lid l JOIN rep USING (doc_id) LEFT JOIN dropped d USING (doc_id)
)
SELECT source, lang_pred, count(*) AS n_docs,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN kept THEN nt ELSE 0 END) AS BIGINT) AS kept_tokens
FROM flags GROUP BY source, lang_pred
"""


# --------------------------------------------------------------------------
# Q: lm_scores — CCNet-style bigram LM quality scoring


def q_lm_scores(sf_dir: str, min_count: int = 30):
    """Statistical-LM quality scoring (ops/lm.py): train a stupid-
    backoff bigram model on the corpus in one distributed counting
    pass (min_count prunes the tail → both the bigram and backoff
    branches fire at sf0.01), broadcast it, score each doc's mean
    token ln-prob in an actor-pool polars stage. Oracle: the same
    counts, pruning and backoff formula in DuckDB."""
    from edkray.ops.lm import fit_bigram_lm, score_bigram_lm

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    model = fit_bigram_lm(ds, min_count=min_count)
    return score_bigram_lm(ds, model)


def _sql_lm_scores(min_count: int = 30, backoff: float = 0.4) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents WHERE text IS NOT NULL
), uni AS (
  SELECT w, count(*) AS c FROM tok GROUP BY w
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM tok
), pr AS (
  SELECT doc_id, w AS w2, lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
  FROM tok
), big AS (
  SELECT w1, w2, count(*) AS c FROM pr WHERE w1 IS NOT NULL
  GROUP BY w1, w2 HAVING count(*) >= {min_count}
), scored AS (
  SELECT p.doc_id,
         CASE WHEN b.c IS NOT NULL
              THEN ln(CAST(b.c AS DOUBLE) / u1.c)
              ELSE ln({backoff} * coalesce(u2.c, 1) / (SELECT n FROM tot))
         END AS lp
  FROM pr p
  LEFT JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
  LEFT JOIN uni u1 ON u1.w = p.w1
  LEFT JOIN uni u2 ON u2.w = p.w2
  WHERE p.w1 IS NOT NULL
), ntok AS (
  SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY doc_id
)
SELECT s.doc_id, n.n_tokens, avg(s.lp) AS lm_score
FROM scored s JOIN ntok n USING (doc_id)
GROUP BY s.doc_id, n.n_tokens
"""


# --------------------------------------------------------------------------
# Q: kmeans_clusters — distributed Lloyd k-means over the embeddings


def q_kmeans_clusters(sf_dir: str, k: int = 4, iters: int = 2):
    """Full-dataset distributed k-means (ops/cluster.py): deterministic
    init (embeddings of the k smallest vec_ids), per-batch partial-sum
    assignment passes with a bucketed tree-reduce (k rows to the driver
    per iteration), final broadcast assignment. Oracle: the same Lloyd
    iterations replayed in DuckDB (cross-join argmin with
    lowest-cluster tie-break, unnest-zip per-dim means, empty clusters
    hold the previous centroid)."""
    from edkray.ops.cluster import kmeans_assign, kmeans_fit

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent = kmeans_fit(ds, k=k, iters=iters)
    out = kmeans_assign(ds, cent)
    return out.map_batches(lambda b: b.select(["vec_id", "cluster"]),
                           batch_format="pyarrow")


def _sql_kmeans(k: int = 4, iters: int = 2, d: int = 64) -> str:
    """DuckDB mirror of kmeans_fit + kmeans_assign: chained CTEs, one
    (assign, means, centroids) block per Lloyd iteration."""

    def dist(e: str, c: str) -> str:
        return (f"list_sum(list_transform(range(1, {d + 1}), "
                f"i -> power(CAST({e}[i] AS DOUBLE) - {c}[i], 2)))")

    def assign_block(name: str, cents: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, t.cluster,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {dist('e.embedding', 't.c')}, t.cluster) AS rn
    FROM embeddings e CROSS JOIN {cents} t)
  WHERE rn = 1
)"""

    parts = [f"""c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {k})
)"""]
    for it in range(iters):
        parts.append(assign_block(f"a{it}", f"c{it}"))
        parts.append(f"""m{it} AS (
  SELECT cluster, dim, avg(v) AS avg_v FROM (
    SELECT a.cluster,
           unnest(range(1, {d + 1})) AS dim,
           unnest(list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS v
    FROM a{it} a JOIN embeddings e USING (vec_id))
  GROUP BY cluster, dim
)""")
        parts.append(f"""c{it + 1} AS (
  SELECT p.cluster, coalesce(mm.c, p.c) AS c
  FROM c{it} p LEFT JOIN (
    SELECT cluster, list(avg_v ORDER BY dim) AS c FROM m{it} GROUP BY cluster
  ) mm USING (cluster)
)""")
    parts.append(assign_block("af", f"c{iters}"))
    return ("WITH " + ",\n".join(parts)
            + "\nSELECT vec_id, cluster FROM af")


# --------------------------------------------------------------------------
# Q: cluster_sample — cluster-balanced corpus sampling (kmeans ∘
# stratified_sample): the data-mixing op — cap docs per embedding
# cluster with a deterministic SQL-reproducible rank.


def q_cluster_sample(sf_dir: str, k: int = 4, iters: int = 2, n_per: int = 30):
    from edkray.ops.aggregate import stratified_sample
    from edkray.ops.cluster import kmeans_assign, kmeans_fit

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent = kmeans_fit(ds, k=k, iters=iters)
    ds = kmeans_assign(ds, cent)
    out = stratified_sample(ds, ["cluster"], n_per, "vec_id")
    return out.map_batches(lambda b: b.select(["vec_id", "cluster"]),
                           batch_format="pyarrow")


def _sql_cluster_sample(k: int = 4, iters: int = 2, n_per: int = 30) -> str:
    return f"""
WITH af2 AS ({_sql_kmeans(k, iters)}),
h AS (
  SELECT vec_id, cluster, (vec_id * 2654435761) % 4294967296 AS hh FROM af2
), r AS (
  SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY cluster ORDER BY hh, vec_id) AS rk
  FROM h
)
SELECT vec_id, cluster FROM r WHERE rk <= {n_per}
"""


# --------------------------------------------------------------------------
# Q: ccnet_buckets — CCNet head/middle/tail LM-perplexity bucketing


def q_ccnet_buckets(sf_dir: str, min_count: int = 30):
    """CCNet's final split (Wenzek et al. 2020 §4.4): score docs with
    the corpus bigram LM (q_lm_scores), derive corpus TERCILES of the
    (rounded) score with the exact histogram-shuffle quantile op, and
    bucket docs head/middle/tail (head = best mean ln-prob). Emits per-
    bucket counts + mean score. Thresholds are one driver row (the
    quantile op's output), broadcast in the closure."""
    from edkray.ops.aggregate import grouped_quantile_disc
    from edkray.ops.lm import fit_bigram_lm, score_bigram_lm

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    model = fit_bigram_lm(ds, min_count=min_count)
    scores = score_bigram_lm(ds, model)

    def _r4(batch: pa.Table) -> pa.Table:
        b = _round_cols(batch.select(["doc_id", "lm_score"]), ["lm_score"], 4)
        return b.rename_columns(["doc_id", "s4"]).append_column(
            "g", pa.array(np.zeros(batch.num_rows, dtype=np.int64))
        )

    r = scores.map_batches(_r4, batch_format="pyarrow").materialize()
    th = grouped_quantile_disc(
        r, ["g"], "s4", [1.0 / 3, 2.0 / 3], ["t1", "t2"]
    ).to_pandas()
    t1, t2 = float(th["t1"].iloc[0]), float(th["t2"].iloc[0])

    def _bucket(batch: pa.Table) -> pa.Table:
        s4 = batch["s4"].to_numpy(zero_copy_only=False)
        lab = np.where(s4 <= t1, "tail", np.where(s4 <= t2, "middle", "head"))
        return pa.table({"bucket": pa.array(lab), "s4": batch["s4"]})

    from edkray.ops.aggregate import grouped_agg

    out = grouped_agg(
        r.map_batches(_bucket, batch_format="pyarrow"),
        ["bucket"],
        [("count", None, "n_docs"), ("mean", "s4", "avg_score")],
    )
    return out.map_batches(lambda b: _round_cols(b, ["avg_score"], 6),
                           batch_format="pyarrow")


def _sql_ccnet_buckets(min_count: int = 30) -> str:
    return f"""
WITH s AS ({_sql_lm_scores(min_count)}),
r AS (
  SELECT doc_id, round(lm_score, 4) AS s4 FROM s
), q AS (
  SELECT quantile_disc(s4, 1.0/3) AS t1, quantile_disc(s4, 2.0/3) AS t2 FROM r
)
SELECT CASE WHEN s4 <= q.t1 THEN 'tail'
            WHEN s4 <= q.t2 THEN 'middle'
            ELSE 'head' END AS bucket,
       count(*) AS n_docs,
       round(avg(s4), 6) AS avg_score
FROM r CROSS JOIN q
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q: normalized_dedup — CCNet step 1: normalize, hash-dedup, keep first


def q_normalized_dedup(sf_dir: str):
    """CCNet's actual first pipeline step (Wenzek et al. 2020):
    normalize text (lower / strip punctuation / collapse whitespace,
    ops/text.py:normalize_text) then keep ONE doc per normalized form —
    first by doc_id (exact_dedup's hash-partitioned first-wins).
    Returns the kept doc ids with their normalized text."""
    from edkray.ops.dedup import exact_dedup
    from edkray.ops.text import normalize_text

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(
        lambda b: normalize_text(b).select(["doc_id", "text_norm"]),
        batch_format="pyarrow",
    )
    return exact_dedup(ds, ["text_norm"], ["doc_id"], num_buckets=16)


_SQL_NORMALIZED_DEDUP = r"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 \t\n]', '', 'g'),
                             '[ \t\n]+', ' ', 'g'), ' ') AS text_norm
  FROM documents
), r AS (
  SELECT doc_id, text_norm,
         row_number() OVER (PARTITION BY text_norm ORDER BY doc_id) AS rn
  FROM n
)
SELECT doc_id, text_norm FROM r WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Q: incremental_dedup — bloom-prefiltered new-batch-vs-corpus ingest


def q_incremental_dedup(sf_dir: str, verify_mode: str = "auto"):
    """Incremental ingest dedup (ops/bloom.py:incremental_dedup): docs
    split into an already-ingested CORPUS (doc_id % 5 != 0) and a NEW
    batch (doc_id % 5 == 0) keyed by the first three words of text (a
    content key with real cross-split collisions). Keeps the first new
    row per key whose key is absent from the corpus — exact despite the
    Bloom prefilter (every positive is verified against real corpus
    keys; negatives are provably absent). The corpus ships key columns
    only; its payload never leaves storage."""
    import polars as pl

    from edkray.ops.bloom import incremental_dedup

    def _ck(batch: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(batch)
            .with_columns(
                pl.col("text").str.split(" ").list.slice(0, 3).list.join(" ").alias("ck")
            )
            .select(["doc_id", "ck"])
            .to_arrow()
        )

    def _split(rem_eq: bool):
        def _f(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch)
            m = pl.col("doc_id") % 5 == 0
            return df.filter(m if rem_eq else ~m).to_arrow()

        return _f

    keyed = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _ck, batch_format="pyarrow"
    )
    new = keyed.map_batches(_split(True), batch_format="pyarrow")
    corpus = keyed.map_batches(_split(False), batch_format="pyarrow")
    return incremental_dedup(
        new, corpus, ["ck"], ["doc_id"], num_bits=1 << 16, num_buckets=16,
        verify_mode=verify_mode,
    )


# --------------------------------------------------------------------------
# Q: pagerank_scores — distributed link-analysis power iteration


def q_pagerank(sf_dir: str, num_iters: int = 5):
    """PageRank over a deterministic synthetic link graph (ops/graph.py:
    pagerank): each doc links to (doc_id² + k) mod N for k ∈ {1,7,13}
    (quadratic targets → non-uniform in-degree → non-trivial ranks).
    Per iteration one co-shuffle of edges∪ranks on the source node and
    one narrow (node, float) sum — documents never move. The oracle
    replays the same 5 iterations as unrolled CTEs with the identical
    float op order (rank*0.85/outdeg, base (1.0-0.85)/N)."""
    from edkray.ops.graph import pagerank

    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def _edges(batch: pa.Table) -> pa.Table:
        s = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        srcs, dsts = [], []
        for k in (1, 7, 13):
            srcs.append(s)
            dsts.append((s * s + k) % n)
        return pa.table({
            "src": pa.array(np.concatenate(srcs)),
            "dst": pa.array(np.concatenate(dsts)),
        })

    edges = docs.map_batches(_edges, batch_format="pyarrow")
    return pagerank(edges, num_iters=num_iters, damping=0.85, num_buckets=16)


def _sql_pagerank(num_iters: int = 5) -> str:
    steps = []
    for i in range(1, num_iters + 1):
        steps.append(f"""pr{i} AS (
  SELECT node, sum(w) AS rank FROM (
    SELECT e.dst AS node, p.rank * 0.85 / dg.outdeg AS w
    FROM pr{i-1} p JOIN deg dg ON dg.src = p.node JOIN edges e ON e.src = p.node
    UNION ALL
    SELECT node, (1.0 - 0.85) / (SELECT n FROM params) AS w FROM pr{i-1}
  ) GROUP BY node
)""")
    chain = ",\n".join(steps)
    return f"""
WITH params AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (doc_id * doc_id + k) % (SELECT n FROM params) AS dst
  FROM documents, unnest([1, 7, 13]) AS t(k)
),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges
  )
),
pr0 AS (SELECT node, 1.0 / (SELECT n FROM params) AS rank FROM nodes),
{chain}
SELECT node, rank FROM pr{num_iters}
"""


# --------------------------------------------------------------------------
# Q: hits_scores — HITS hubs & authorities over the same link graph


def q_hits_scores(sf_dir: str, num_iters: int = 3):
    """HITS hubs & authorities (ops/graph.py:hits) over the same
    deterministic synthetic link graph as q_pagerank (doc → (doc²+k)
    mod N for k ∈ {1,7,13}). Per iteration two narrow (node, float)
    co-shuffles — edges join the score table, grouped sums by the
    opposite endpoint, ONE driver scalar per L1 normalization —
    documents never move. The oracle unrolls the identical 3
    iterations as CTEs with the same op order (sum → divide by the
    global sum)."""
    from edkray.ops.graph import hits

    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def _edges(batch: pa.Table) -> pa.Table:
        s = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        srcs, dsts = [], []
        for k in (1, 7, 13):
            srcs.append(s)
            dsts.append((s * s + k) % n)
        return pa.table({
            "src": pa.array(np.concatenate(srcs)),
            "dst": pa.array(np.concatenate(dsts)),
        })

    edges = docs.map_batches(_edges, batch_format="pyarrow")
    return hits(edges, num_iters=num_iters, num_buckets=16)


def _sql_hits(num_iters: int = 3) -> str:
    steps = []
    for i in range(1, num_iters + 1):
        steps.append(f"""a{i}r AS (
  SELECT e.dst AS node, sum(h.s) AS v FROM edges e JOIN h{i-1} h ON h.node = e.src GROUP BY e.dst
), a{i} AS (SELECT node, v / (SELECT sum(v) FROM a{i}r) AS s FROM a{i}r),
h{i}r AS (
  SELECT e.src AS node, sum(a.s) AS v FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY e.src
), h{i} AS (SELECT node, v / (SELECT sum(v) FROM h{i}r) AS s FROM h{i}r)""")
    chain = ",\n".join(steps)
    return f"""
WITH params AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (doc_id * doc_id + k) % (SELECT n FROM params) AS dst
  FROM documents, unnest([1, 7, 13]) AS t(k)
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges
  )
),
h0 AS (SELECT node, 1.0 AS s FROM nodes),
{chain}
SELECT n.node, coalesce(a.s, 0.0) AS score_auth, coalesce(h.s, 0.0) AS score_hub
FROM nodes n
LEFT JOIN a{num_iters} a ON a.node = n.node
LEFT JOIN h{num_iters} h ON h.node = n.node
"""


# --------------------------------------------------------------------------
# Q: gopher_quality — per-document Gopher rule filter


def q_gopher_quality(sf_dir: str):
    """Gopher/MassiveText document-quality rules (ops/text.py:
    gopher_rules, Rae et al. 2021 A1.1): per-doc booleans for word
    count, mean word length, symbol ratio, alpha-word fraction and
    stop-word presence, plus the composite keep flag. The oracle
    recomputes every rule independently with DuckDB list/regexp
    kernels."""
    from edkray.ops.text import gopher_rules

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(gopher_rules, batch_format="pyarrow")
    return ds.map_batches(
        lambda b: b.select(
            ["doc_id", "n_words", "mean_word_len", "rule_words", "rule_wordlen",
             "rule_symbol", "rule_alpha", "rule_stop", "keep"]
        ),
        batch_format="pyarrow",
    )


_SQL_GOPHER = r"""
WITH l AS (
  SELECT doc_id, text, regexp_extract_all(text, '\S+') AS t FROM documents
), s AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_words,
         length(regexp_replace(text, '\s', '', 'g')) * 1.0 AS nonws,
         len(regexp_extract_all(text, '#|\.\.\.')) * 1.0 AS sym,
         len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]'))) * 1.0 AS alpha,
         len(list_distinct(list_filter(t,
             x -> x IN ('the','be','to','of','and','that','have','with')))) AS nstop
  FROM l
)
SELECT doc_id, n_words,
       CASE WHEN n_words > 0 THEN nonws / n_words ELSE 0.0 END AS mean_word_len,
       (n_words BETWEEN 50 AND 100000) AS rule_words,
       CASE WHEN n_words > 0
            THEN nonws / n_words >= 3.0 AND nonws / n_words <= 10.0
            ELSE FALSE END AS rule_wordlen,
       CASE WHEN n_words > 0 THEN sym / n_words <= 0.1 ELSE FALSE END AS rule_symbol,
       CASE WHEN n_words > 0 THEN alpha / n_words >= 0.8 ELSE FALSE END AS rule_alpha,
       (nstop >= 1) AS rule_stop,
       ((n_words BETWEEN 50 AND 100000)
        AND CASE WHEN n_words > 0
                 THEN nonws / n_words >= 3.0 AND nonws / n_words <= 10.0
                 ELSE FALSE END
        AND CASE WHEN n_words > 0 THEN sym / n_words <= 0.1 ELSE FALSE END
        AND CASE WHEN n_words > 0 THEN alpha / n_words >= 0.8 ELSE FALSE END
        AND nstop >= 1) AS keep
FROM s
"""


# --------------------------------------------------------------------------
# Q: url_canon — URL canonicalization → canonical-key rollup


def q_url_canon(sf_dir: str):
    """URL canonicalization (ops/url.py:canonicalize_url — the web-text
    generalization of the reference's protocol-rewrite/URI-normalize
    step, M18). Two deterministic spellings of each page id (clean vs
    uppercase-www-:443-tracking-params-fragment) are constructed from
    doc_id; canonicalization must collapse them. The ORACLE canonicalizes
    INDEPENDENTLY via sql_canonical_url's regexp/list chain — only the
    messy-input construction is shared. Returns one row per canonical
    url with the variant count and first doc id."""
    import polars as pl

    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.url import canonicalize_url

    def _mk(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        pid = (pl.col("doc_id") // 2).cast(pl.Utf8)
        dom = ((pl.col("doc_id") // 2) % 20).cast(pl.Utf8)
        clean = pl.lit("https://site") + dom + pl.lit(".example/d/") + pid + pl.lit("?a=1&b=2")
        messy = (
            pl.lit("HTTPS://WWW.Site") + dom + pl.lit(".Example:443/d/") + pid
            + pl.lit("?b=2&utm_campaign=x&a=1#f")
        )
        return (
            df.with_columns(
                pl.when(pl.col("doc_id") % 2 == 0).then(clean).otherwise(messy).alias("url")
            )
            .select(["doc_id", "url"])
            .to_arrow()
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(_mk, batch_format="pyarrow")
    ds = ds.map_batches(canonicalize_url, batch_format="pyarrow")
    return grouped_agg(
        ds, ["url_canon"], [("count", None, "n_variants"), ("min", "doc_id", "first_doc")]
    )


def _sql_url_canon() -> str:
    from edkray.ops.url import sql_canonical_url

    return f"""
WITH u AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN 'https://site' || CAST((doc_id // 2) % 20 AS VARCHAR)
                   || '.example/d/' || CAST(doc_id // 2 AS VARCHAR) || '?a=1&b=2'
              ELSE 'HTTPS://WWW.Site' || CAST((doc_id // 2) % 20 AS VARCHAR)
                   || '.Example:443/d/' || CAST(doc_id // 2 AS VARCHAR)
                   || '?b=2&utm_campaign=x&a=1#f'
         END AS url
  FROM documents
), c AS (
  SELECT doc_id, {sql_canonical_url('url')} AS url_canon FROM u
)
SELECT url_canon, count(*) AS n_variants, min(doc_id) AS first_doc
FROM c GROUP BY url_canon
"""


# --------------------------------------------------------------------------
# Q: gzip_decode — transfer-encoding inflate stage


def q_gzip_decode(sf_dir: str):
    """Gzip payload decode (ops/codecs.py:decode_gzip_column): each
    doc's text is gzip-compressed into an html:binary payload and
    pushed through the sniffing inflate stage; the reduce emits the
    decoded byte length. Oracle: the UTF-8 byte length of the original
    text — parity proves the inflate restored the exact bytes."""
    import gzip as _gzip

    from edkray.ops.codecs import decode_gzip_column

    def _pack(batch: pa.Table) -> pa.Table:
        payloads = [_gzip.compress(t.encode("utf-8"), mtime=0)
                    for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "html": pa.array(payloads, type=pa.binary()),
        })

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(_pack, batch_format="pyarrow")
    ds = ds.map_batches(decode_gzip_column, batch_format="pyarrow")
    return ds.map_batches(
        lambda b: pa.table({
            "doc_id": b["doc_id"],
            "n_bytes": pc.binary_length(b["html"]).cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


_SQL_GZIP_DECODE = """
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


# --------------------------------------------------------------------------
# Q: warclike_scan — record-container engine end-to-end


def q_warclike_scan(sf_dir: str):
    """The WARC-like container engine (sources/warclike.py) end-to-end:
    documents are serialized into a record container (url, warc_ts,
    payload=utf-8 text), scanned back through the registry engine, and
    reduced to (url, warc_ts, n_bytes). The oracle computes the same
    three columns straight from the documents table — parity proves the
    container writer/parser round-trips bytes and timestamps exactly."""
    import datetime as _dt
    import os

    from edkray.sources.registry import get_source
    from edkray.sources.warclike import write_warclike

    def _populate(work: str) -> None:
        tbl = _read(sf_dir, "documents", ["doc_id", "text"]).to_pandas()
        recs = [
            (f"https://w.example/{int(r.doc_id)}",
             _dt.datetime(2017, 1, 1) + _dt.timedelta(seconds=int(r.doc_id)),
             str(r.text).encode("utf-8"))
            for r in tbl.itertuples()
        ]
        write_warclike(os.path.join(work, "part-20170101.wrec"), recs)

    d = _scratch_cache("wrec", sf_dir, _populate)
    ds = get_source("warclike").scan(
        d + "/part-%Y%m%d.wrec",
        time_range=(_dt.datetime(2017, 1, 1), _dt.datetime(2017, 1, 2)),
    )

    def _reduce(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "n_bytes": pc.binary_length(batch["html"]).cast(pa.int64()),
        })

    return ds.map_batches(_reduce, batch_format="pyarrow")


_SQL_WARCLIKE = """
SELECT 'https://w.example/' || CAST(doc_id AS VARCHAR) AS url,
       TIMESTAMP '2017-01-01' + doc_id * INTERVAL 1 SECOND AS warc_ts,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


# --------------------------------------------------------------------------
# Q: web_ingest — composed ingest flagship (canon → robots → inc-dedup → quality)


def q_web_ingest(sf_dir: str):
    """The composed incremental web-ingest pipeline, chaining this
    round's real ops end-to-end the way a crawler refresh runs them:

    1. messy URLs (two spellings per page id, doc_id//2) →
       ops/url.py:canonicalize_url;
    2. ops/url.py:robots_filter (disallow /private/ on hosts 0-9; pages
       with doc_id%3==0 land under /private/);
    3. split: corpus = already-ingested docs (doc_id%5 != 0), new batch
       = the rest; ops/bloom.py:incremental_dedup on url_canon — first
       new doc per canonical url absent from the corpus;
    4. ops/text.py:gopher_rules quality gate on the survivors.

    Returns (doc_id, url_canon, keep). The oracle recomposes every
    stage in SQL from the independent mirrors."""
    import polars as pl

    from edkray.ops.bloom import incremental_dedup
    from edkray.ops.text import gopher_rules
    from edkray.ops.url import canonicalize_url, robots_filter

    def _mk(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        pid = (pl.col("doc_id") // 2).cast(pl.Utf8)
        dom = ((pl.col("doc_id") // 2) % 20).cast(pl.Utf8)
        tail = (
            pl.when(pl.col("doc_id") % 3 == 0)
            .then(pl.lit("/private/"))
            .otherwise(pl.lit("/d/"))
            + pid
        )
        clean = pl.lit("https://site") + dom + pl.lit(".example") + tail + pl.lit("?a=1&b=2")
        messy = (
            pl.lit("HTTPS://WWW.Site") + dom + pl.lit(".Example:443") + tail
            + pl.lit("?b=2&utm_campaign=x&a=1#f")
        )
        return (
            df.with_columns(
                pl.when(pl.col("doc_id") % 2 == 0).then(clean).otherwise(messy).alias("url")
            )
            .select(["doc_id", "url", "text"])
            .to_arrow()
        )

    rules = pa.table({
        "host": [f"site{k}.example" for k in range(10)],
        "disallow_prefix": ["/private/"] * 10,
    })

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(_mk, batch_format="pyarrow")
    ds = ds.map_batches(canonicalize_url, batch_format="pyarrow")
    ds = robots_filter(ds, rules)

    def _split(new_side: bool):
        def _f(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch)
            m = pl.col("doc_id") % 5 == 0
            return df.filter(m if new_side else ~m).to_arrow()

        return _f

    new = ds.map_batches(_split(True), batch_format="pyarrow")
    corpus = ds.map_batches(_split(False), batch_format="pyarrow")
    fresh = incremental_dedup(
        new, corpus, ["url_canon"], ["doc_id"], num_bits=1 << 16, num_buckets=16
    )
    out = fresh.map_batches(gopher_rules, batch_format="pyarrow")
    return out.map_batches(
        lambda b: b.select(["doc_id", "url_canon", "keep"]), batch_format="pyarrow"
    )


def _sql_web_ingest() -> str:
    from edkray.ops.url import sql_canonical_url

    return f"""
WITH u AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % 2 = 0
              THEN 'https://site' || CAST((doc_id // 2) % 20 AS VARCHAR) || '.example'
                   || CASE WHEN doc_id % 3 = 0 THEN '/private/' ELSE '/d/' END
                   || CAST(doc_id // 2 AS VARCHAR) || '?a=1&b=2'
              ELSE 'HTTPS://WWW.Site' || CAST((doc_id // 2) % 20 AS VARCHAR) || '.Example:443'
                   || CASE WHEN doc_id % 3 = 0 THEN '/private/' ELSE '/d/' END
                   || CAST(doc_id // 2 AS VARCHAR) || '?b=2&utm_campaign=x&a=1#f'
         END AS url
  FROM documents
), c AS (
  SELECT doc_id, text, {sql_canonical_url('url')} AS url_canon,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)) AS h,
         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1) AS p
  FROM u
), allowed AS (
  SELECT doc_id, text, url_canon FROM c
  WHERE NOT EXISTS (
    SELECT 1 FROM (
      SELECT 'site' || CAST(k AS VARCHAR) || '.example' AS host
      FROM unnest(generate_series(0, 9)) AS t(k)
    ) r
    WHERE r.host = c.h  -- robots match the RAW host: www./port spellings
      AND starts_with(c.p, '/private/')  -- pass, exactly as the engine's filter
  )
), newb AS (
  SELECT * FROM allowed WHERE doc_id % 5 = 0
), corpus AS (
  SELECT * FROM allowed WHERE doc_id % 5 <> 0
), first_new AS (
  SELECT doc_id, text, url_canon FROM (
    SELECT doc_id, text, url_canon,
           row_number() OVER (PARTITION BY url_canon ORDER BY doc_id) AS rn
    FROM newb
  ) WHERE rn = 1
), fresh AS (
  SELECT doc_id, text, url_canon FROM first_new n
  WHERE NOT EXISTS (SELECT 1 FROM corpus c2 WHERE c2.url_canon = n.url_canon)
), l AS (
  SELECT doc_id, url_canon, regexp_extract_all(text, '\\S+') AS t, text FROM fresh
), s AS (
  SELECT doc_id, url_canon,
         CAST(len(t) AS BIGINT) AS n_words,
         length(regexp_replace(text, '\\s', '', 'g')) * 1.0 AS nonws,
         len(regexp_extract_all(text, '#|\\.\\.\\.')) * 1.0 AS sym,
         len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]'))) * 1.0 AS alpha,
         len(list_distinct(list_filter(t,
             x -> x IN ('the','be','to','of','and','that','have','with')))) AS nstop
  FROM l
)
SELECT doc_id, url_canon,
       ((n_words BETWEEN 50 AND 100000)
        AND CASE WHEN n_words > 0
                 THEN nonws / n_words >= 3.0 AND nonws / n_words <= 10.0
                 ELSE FALSE END
        AND CASE WHEN n_words > 0 THEN sym / n_words <= 0.1 ELSE FALSE END
        AND CASE WHEN n_words > 0 THEN alpha / n_words >= 0.8 ELSE FALSE END
        AND nstop >= 1) AS keep
FROM s
"""


# --------------------------------------------------------------------------
# Q: group_split — leakage-safe train/val/test assignment


def q_group_split(sf_dir: str):
    """Group-aware 80/10/10 split (ops/text.py:group_split): every doc
    of one source lands in the same split, decided by splitmix64(
    polyhash(source)) mod 1000 — near-dups from one origin can't
    straddle the train/eval boundary. The oracle replays the polynomial
    hash (the dsir pows CTE) AND the splitmix64 finalizer in HUGEINT
    arithmetic, stage by stage."""
    from edkray.ops.text import group_split

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return ds.map_batches(
        lambda b: group_split(b, "source"), batch_format="pyarrow"
    )


_SQL_GROUP_SPLIT = """
WITH RECURSIVE pows(e, p) AS (
  SELECT 0, CAST(1 AS UBIGINT)
  UNION ALL
  SELECT e + 1,
         CAST((p::HUGEINT * 1099511628211::HUGEINT)
              % 18446744073709551616::HUGEINT AS UBIGINT)
  FROM pows
  WHERE e < (SELECT max(length(source)) FROM documents)
), srcs AS (
  SELECT DISTINCT source FROM documents
), chars AS (
  SELECT source, unnest(range(1, length(source) + 1)) AS pos FROM srcs
), ph AS (
  SELECT c.source,
         CAST(CAST(sum(ord(substr(c.source, c.pos, 1))::HUGEINT * pw.p::HUGEINT)
                   % 18446744073709551616::HUGEINT AS UBIGINT) AS UBIGINT) AS h
  FROM chars c JOIN pows pw ON pw.e = length(c.source) - c.pos
  GROUP BY c.source
), m1 AS (
  SELECT source,
         CAST((h::HUGEINT + 11400714819323198485::HUGEINT)
              % 18446744073709551616::HUGEINT AS UBIGINT) AS x
  FROM ph
), m2y AS (
  SELECT source, xor(x, x >> 30) AS y FROM m1
), m2 AS (
  -- y * 0xBF58476D1CE4E5B9 mod 2^64 via 32-bit split halves
  -- (a full 64x64 HUGEINT multiply overflows INT128)
  SELECT source,
         CAST(((y % 4294967296)::HUGEINT * 484763065::HUGEINT
               + 4294967296::HUGEINT *
                 (((y % 4294967296)::HUGEINT * 3210233709::HUGEINT
                   + (y >> 32)::HUGEINT * 484763065::HUGEINT)
                  % 4294967296::HUGEINT))
              % 18446744073709551616::HUGEINT AS UBIGINT) AS x
  FROM m2y
), m3y AS (
  SELECT source, xor(x, x >> 27) AS y FROM m2
), m3 AS (
  -- y * 0x94D049BB133111EB mod 2^64, same split
  SELECT source,
         CAST(((y % 4294967296)::HUGEINT * 321982955::HUGEINT
               + 4294967296::HUGEINT *
                 (((y % 4294967296)::HUGEINT * 2496678331::HUGEINT
                   + (y >> 32)::HUGEINT * 321982955::HUGEINT)
                  % 4294967296::HUGEINT))
              % 18446744073709551616::HUGEINT AS UBIGINT) AS x
  FROM m3y
), sp AS (
  SELECT source,
         CASE WHEN xor(x, x >> 31) % 1000 < 800 THEN 'train'
              WHEN xor(x, x >> 31) % 1000 < 900 THEN 'val'
              ELSE 'test' END AS split
  FROM m3
)
SELECT d.doc_id, d.source, sp.split
FROM documents d JOIN sp USING (source)
"""


# --------------------------------------------------------------------------
# Q: random_projection — JL dimensionality reduction of embeddings


def q_random_projection(sf_dir: str, d_out: int = 8):
    """Achlioptas sparse random projection (ops/search.py:
    random_projection): 64-dim float embeddings → 8-dim, y =
    sqrt(3/64)·(X @ R) with the deterministic Knuth-hash ±1/0 matrix.
    The oracle replays R entry-by-entry and re-sums per output dim via
    generate_series indexing (1e-9 float agreement)."""
    from edkray.ops.search import random_projection

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return random_projection(ds, d_out=d_out)


def _sql_random_projection(d_in: int = 64, d_out: int = 8) -> str:
    return f"""
WITH r AS (
  SELECT i, j,
         CASE ((((i * {d_out} + j + 1) * 2654435761) % 4294967296) % 6)
           WHEN 0 THEN 1.0 WHEN 1 THEN -1.0 ELSE 0.0 END AS v
  FROM unnest(generate_series(0, {d_in - 1})) AS a(i),
       unnest(generate_series(0, {d_out - 1})) AS b(j)
), x AS (
  SELECT vec_id, i - 1 AS i, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS s(i)
)
SELECT x.vec_id, r.j AS dim, sum(x.val * r.v) * sqrt(3.0 / {d_in}) AS proj
FROM x JOIN r ON r.i = x.i
GROUP BY x.vec_id, r.j
"""


# --------------------------------------------------------------------------
# Q: inlink_counts — href extraction → link edges → in-degree rollup


def q_inlink_counts(sf_dir: str):
    """Link-graph extraction (ops/html.py:extract_links): documents get
    deterministic urls + html with planted anchors — one absolute, one
    root-relative, a CAPS-tag root-relative on doc_id%3==0, plus a
    single-quoted href and a #fragment that the pinned spec drops.
    Edges explode vectorized (extract_all, no shuffle); the in-degree
    rollup pre-aggregates per batch and finishes hash-bucketed. Oracle
    replays the synthesis, the href regex and the resolution rule."""
    import polars as pl

    from edkray.ops.html import extract_links
    from edkray.ops.shuffle import bucketed_group_map

    def _mk(batch):
        df = pl.from_arrow(batch)
        d = pl.col("doc_id")
        url = (pl.lit("https://site") + (d % 20).cast(pl.String)
               + pl.lit(".example/d/") + d.cast(pl.String))
        html = (
            pl.lit('<html><body><a href="https://site')
            + ((d + 1) % 20).cast(pl.String) + pl.lit('.example/d/')
            + (d + 1).cast(pl.String) + pl.lit('">n</a><a href="/rel/')
            + (d % 7).cast(pl.String) + pl.lit('">r</a>')
            + pl.when(d % 3 == 0).then(pl.lit('<A HREF="/caps/1">c</A>'))
              .otherwise(pl.lit(""))
            + pl.lit("<a href='skip.html'>s</a><a href=\"#frag\">f</a></body></html>")
        )
        return df.select(url.alias("url"), html.alias("html")).to_arrow()

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(_mk, batch_format="pyarrow")
    edges = extract_links(ds)

    def _pre(b: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(b).group_by("dst")
            .agg(pl.len().cast(pl.Int64).alias("n_inlinks")).to_arrow()
        )

    parts = edges.map_batches(_pre, batch_format="pyarrow")
    return bucketed_group_map(
        parts, ["dst"],
        lambda t: pl.from_arrow(t).group_by("dst")
                    .agg(pl.col("n_inlinks").sum()).to_arrow(),
        num_buckets=8,
    )


_SQL_INLINK_COUNTS = r"""
WITH u AS (
  SELECT doc_id,
         'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example/d/'
           || CAST(doc_id AS VARCHAR) AS url,
         '<html><body><a href="https://site' || CAST((doc_id + 1) % 20 AS VARCHAR)
           || '.example/d/' || CAST(doc_id + 1 AS VARCHAR)
           || '">n</a><a href="/rel/' || CAST(doc_id % 7 AS VARCHAR) || '">r</a>'
           || CASE WHEN doc_id % 3 = 0 THEN '<A HREF="/caps/1">c</A>' ELSE '' END
           || '<a href=''skip.html''>s</a><a href="#frag">f</a></body></html>' AS html
  FROM documents
), e AS (
  SELECT url AS src,
         regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)', 1) AS base,
         unnest(regexp_extract_all(html,
             '<[aA]\s[^>]*[hH][rR][eE][fF]="([^"]*)"', 1)) AS href
  FROM u
), d AS (
  SELECT CASE WHEN regexp_matches(href, '^https?://') THEN href
              WHEN starts_with(href, '/') AND NOT starts_with(href, '//') THEN base || href
              ELSE NULL END AS dst
  FROM e
)
SELECT dst, CAST(count(*) AS BIGINT) AS n_inlinks
FROM d WHERE dst IS NOT NULL GROUP BY dst
"""


# --------------------------------------------------------------------------
# Q: approx_quantiles — KLL quantile sketch with rank-error certificate


def q_approx_quantiles(sf_dir: str):
    """KLL quantile sketch (ops/aggregate.py:approx_quantiles) over
    lineitem.l_extendedprice — the rank-error sibling of the HLL
    distinct sketch, same oracle teeth: the query runs the sketch AND
    an exact streaming rank count of each estimate, emitting per q the
    true row count and ``kll_ok`` = |rank(est)/n − q| ≤ 0.02, so an
    out-of-bound sketch hash-mismatches instead of passing rows-only.
    Sketches are ≤ k·log-levels floats per block; values never fully
    shuffle."""
    from edkray.ops.aggregate import approx_quantiles

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    return approx_quantiles(ds, "l_extendedprice")


_SQL_APPROX_QUANTILES = """
SELECT CAST(q AS DOUBLE) AS q,
       CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n,
       TRUE AS kll_ok
FROM (VALUES (0.25), (0.5), (0.75), (0.9)) t(q)
"""


# --------------------------------------------------------------------------
# Q: page_titles — <title> metadata extraction (ops/html.py:extract_title)


def q_page_titles(sf_dir: str):
    """Title extraction (ops/html.py:extract_title): documents get
    synthetic html whose title exercises the contract — case-odd TITLE
    tag, whitespace runs, named entities, a SECOND title element (the
    first-match rule), and doc_id%11==0 pages with NO title (NULL, not
    empty). One vectorized pass, no shuffle. Oracle replays the
    synthesis + the (?is) first-match regex + entity/whitespace chain,
    with NULLIF('') standing in for polars' no-match null."""
    import polars as pl

    from edkray.ops.html import extract_title

    def _mk(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        d = pl.col("doc_id")
        html = (
            pl.when(d % 11 == 0)
            .then(pl.lit("<html><body>untitled</body></html>"))
            .otherwise(
                pl.lit("<html><head><TITLE> Doc &amp;  ") + d.cast(pl.String)
                + pl.lit(" &lt;x&gt; </TITLE></head><body>"
                         "<title>second</title></body></html>")
            )
        )
        return df.select("doc_id", html.alias("html")).to_arrow()

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(_mk, batch_format="pyarrow")
    return extract_title(ds).map_batches(
        lambda b: b.select(["doc_id", "title"]), batch_format="pyarrow"
    )


_SQL_PAGE_TITLES = r"""
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN '<html><body>untitled</body></html>'
              ELSE '<html><head><TITLE> Doc &amp;  ' || CAST(doc_id AS VARCHAR)
                   || ' &lt;x&gt; </TITLE></head><body><title>second</title></body></html>'
         END AS html
  FROM documents
), t AS (
  SELECT doc_id,
         NULLIF(regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1), '') AS raw_title
  FROM raw
)
SELECT doc_id,
       trim(regexp_replace(
         replace(replace(replace(replace(replace(replace(replace(
           raw_title,
           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
           '&apos;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
         '\s+', ' ', 'g')) AS title
FROM t
"""


# --------------------------------------------------------------------------
# Q: recrawl_priority — churn x link-graph composition (diff + links + join)


def q_recrawl_priority(sf_dir: str):
    """Recrawl scheduling — the composition a crawl operator actually
    runs: snapshot churn (ops/diff.py:snapshot_diff) x in-degree from
    the live link graph (ops/html.py:extract_links), joined url-bucketed
    (ops/joins.py:bucketed_join, one co-shuffle, no broadcast), scored
    priority = status_weight + n/(n+1) (rational, not ln — bit-identical
    across numpy and the SQL oracle). 'removed' pages leave the
    frontier. Old = docs with doc_id%5!=0; new = docs with doc_id%7!=0,
    text prefixed 'v2 ' on doc_id%3==0 (the snapshot_diff synthesis,
    page urls in the canonical site scheme). Each page links to docs
    (doc_id%37) absolutely and (doc_id%11) root-relatively — the
    root-relative dst resolves against the SOURCE host, so it matches
    the target's canonical url only when hosts coincide (same-host
    relative linking, replayed identically by the oracle)."""
    import polars as pl

    from edkray.ops.diff import snapshot_diff
    from edkray.ops.html import extract_links
    from edkray.ops.joins import bucketed_join
    from edkray.ops.shuffle import bucketed_group_map

    base = _read(sf_dir, "documents", ["doc_id", "text"])
    d = pl.col("doc_id")

    def _canon(col):
        return (pl.lit("https://site") + (col % 20).cast(pl.String)
                + pl.lit(".example/d/") + col.cast(pl.String))

    def _old(b):
        df = pl.from_arrow(b).filter(d % 5 != 0)
        return df.select(_canon(d).alias("url"), "text").to_arrow()

    def _new(b):
        df = pl.from_arrow(b).filter(d % 7 != 0)
        return df.select(
            _canon(d).alias("url"),
            pl.when(d % 3 == 0).then(pl.lit("v2 ") + pl.col("text"))
            .otherwise(pl.col("text")).alias("text"),
        ).to_arrow()

    frontier = snapshot_diff(
        base.map_batches(_old, batch_format="pyarrow"),
        base.map_batches(_new, batch_format="pyarrow"),
        num_buckets=8,
    ).filter(lambda r: r["status"] != "removed")

    def _mk_pages(b):
        df = pl.from_arrow(b)
        html = (
            pl.lit('<html><body><a href="') + _canon(d % 37)
            + pl.lit('">a</a><A HREF="/d/') + (d % 11).cast(pl.String)
            + pl.lit('">b</A></body></html>')
        )
        return df.select(_canon(d).alias("url"), html.alias("html")).to_arrow()

    edges = extract_links(
        _read(sf_dir, "documents", ["doc_id"]).map_batches(_mk_pages, batch_format="pyarrow")
    )
    parts = edges.map_batches(
        lambda b: pl.from_arrow(b).group_by("dst")
        .agg(pl.len().cast(pl.Int64).alias("n_inlinks")).to_arrow(),
        batch_format="pyarrow",
    )
    inlinks = bucketed_group_map(
        parts, ["dst"],
        lambda t: pl.from_arrow(t).group_by("dst")
        .agg(pl.col("n_inlinks").sum()).to_arrow(),
        num_buckets=8,
    )

    joined = bucketed_join(frontier, inlinks, on=["url"], right_on=["dst"],
                           how="left", num_buckets=8)

    def _score(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).with_columns(
            pl.col("n_inlinks").fill_null(0).cast(pl.Int64)
        )
        nf = pl.col("n_inlinks").cast(pl.Float64)
        return df.with_columns(
            (pl.when(pl.col("status") == "changed").then(3.0).otherwise(2.0)
             + nf / (nf + 1.0)).alias("priority")
        ).to_arrow()

    return joined.map_batches(_score, batch_format="pyarrow")


_SQL_RECRAWL_PRIORITY = r"""
WITH o AS (
  SELECT 'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example/d/'
           || CAST(doc_id AS VARCHAR) AS url, min(text) AS v
  FROM documents WHERE doc_id % 5 <> 0 GROUP BY 1
), n AS (
  SELECT 'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example/d/'
           || CAST(doc_id AS VARCHAR) AS url,
         min(CASE WHEN doc_id % 3 = 0 THEN 'v2 ' || text ELSE text END) AS v
  FROM documents WHERE doc_id % 7 <> 0 GROUP BY 1
), f AS (
  SELECT coalesce(o.url, n.url) AS url,
         CASE WHEN o.url IS NULL THEN 'added'
              WHEN n.url IS NULL THEN 'removed'
              ELSE 'changed' END AS status
  FROM o FULL OUTER JOIN n ON o.url = n.url
  WHERE o.url IS NULL OR n.url IS NULL OR o.v IS DISTINCT FROM n.v
), u AS (
  SELECT doc_id,
         'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example/d/'
           || CAST(doc_id AS VARCHAR) AS url,
         '<html><body><a href="https://site' || CAST((doc_id % 37) % 20 AS VARCHAR)
           || '.example/d/' || CAST(doc_id % 37 AS VARCHAR)
           || '">a</a><A HREF="/d/' || CAST(doc_id % 11 AS VARCHAR)
           || '">b</A></body></html>' AS html
  FROM documents
), e AS (
  SELECT url AS src,
         regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)', 1) AS base,
         unnest(regexp_extract_all(html,
             '<[aA]\s[^>]*[hH][rR][eE][fF]="([^"]*)"', 1)) AS href
  FROM u
), dd AS (
  SELECT CASE WHEN regexp_matches(href, '^https?://') THEN href
              WHEN starts_with(href, '/') AND NOT starts_with(href, '//') THEN base || href
              ELSE NULL END AS dst
  FROM e
), il AS (
  SELECT dst, CAST(count(*) AS BIGINT) AS n_inlinks
  FROM dd WHERE dst IS NOT NULL GROUP BY dst
)
SELECT f.url, f.status,
       CAST(coalesce(il.n_inlinks, 0) AS BIGINT) AS n_inlinks,
       (CASE WHEN f.status = 'changed' THEN 3.0 ELSE 2.0 END)
         + coalesce(il.n_inlinks, 0) / (coalesce(il.n_inlinks, 0) + 1.0) AS priority
FROM f LEFT JOIN il ON f.url = il.dst
WHERE f.status <> 'removed'
"""


# --------------------------------------------------------------------------
# Q: triangle_count — degree-ordered wedge closure over a skewed graph


def q_triangle_count(sf_dir: str):
    """Exact triangle count (ops/graph.py:triangle_count — the Suri &
    Vassilvitskii degree-ordered wedge algorithm: O(m^1.5) total wedge
    volume, no per-hub quadratic task). The synthetic graph plants both
    structure and skew: each doc links to doc_id+1 and doc_id+2 (a
    chorded path — one triangle per consecutive triple) plus a hub edge
    to doc_id%16 (sixteen high-degree hubs — the power-law case degree
    ordering exists for). Oracle: canonical distinct a<b edges, triple
    self-join."""
    import polars as pl

    from edkray.ops.graph import triangle_count

    def _mk(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        d = pl.col("doc_id")
        return pl.concat([
            df.select(d.alias("src"), (d + 1).alias("dst")),
            df.select(d.alias("src"), (d + 2).alias("dst")),
            df.select(d.alias("src"), (d % 16).alias("dst")),
        ]).to_arrow()

    edges = _read(sf_dir, "documents", ["doc_id"]).map_batches(_mk, batch_format="pyarrow")
    return triangle_count(edges, num_buckets=16)


_SQL_TRIANGLE_COUNT = """
WITH raw AS (
  SELECT doc_id AS s, doc_id + 1 AS t FROM documents
  UNION ALL SELECT doc_id, doc_id + 2 FROM documents
  UNION ALL SELECT doc_id, doc_id % 16 FROM documents
), e AS (
  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b FROM raw WHERE s <> t
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
"""


# --------------------------------------------------------------------------
# Q: image_stats / audio_features — multimodal actor-pool stages,
# driver-checked (the binary payload is REAL toy-container bytes; the
# oracle replays the planted pixel/sample arithmetic with correlated
# generate_series, never parsing binary)


def q_image_stats(sf_dir: str):
    """Image decode + stats (ops/multimodal.py:ImageStats actor pool —
    codec state per actor, per-payload decode loop at the documented
    codec boundary): each doc becomes a (6+doc_id%3)x(8+doc_id%5)
    single-channel toy-EDKI image with pixel (y,x) = (doc_id+x+y)%256,
    ENCODED to real container bytes and decoded back by the stage.
    Output keeps the integer-exact stats (mean = exact integer sum /
    n, bit-identical to SQL avg); pix_std stays engine-side (its
    float-order is numpy-specific — unit-tested, not oracle material).
    """
    from edkray.ops.multimodal import encode_image, image_stats

    def _mk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for did in ids:
            w, h = 8 + int(did) % 5, 6 + int(did) % 3
            yy, xx = np.mgrid[0:h, 0:w]
            payloads.append(encode_image(((int(did) + xx + yy) % 256).astype(np.uint8)))
        return pa.table({"doc_id": b["doc_id"],
                         "payload": pa.array(payloads, type=pa.binary())})

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(_mk, batch_format="pyarrow")
    stats = image_stats(ds, concurrency=_pool())
    return stats.map_batches(
        lambda b: b.select(["doc_id", "width", "height", "channels", "pix_mean"]),
        batch_format="pyarrow",
    )


_SQL_IMAGE_STATS = """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h FROM documents
), pix AS (
  SELECT d.doc_id, d.w, d.h, (d.doc_id + x.x + y.y) % 256 AS v
  FROM dims d,
       unnest(generate_series(0, d.w - 1)) AS x(x),
       unnest(generate_series(0, d.h - 1)) AS y(y)
)
SELECT doc_id,
       CAST(min(w) AS INTEGER) AS width,
       CAST(min(h) AS INTEGER) AS height,
       CAST(1 AS INTEGER) AS channels,
       avg(v) AS pix_mean
FROM pix GROUP BY doc_id
"""


def q_audio_features(sf_dir: str):
    """Audio decode + features (ops/multimodal.py:AudioFeatures actor
    pool): each doc becomes a (50+doc_id%20)-sample 16 kHz toy-EDKA
    clip with sample i = (doc_id*7 + i*13)%200 - 100, encoded to real
    int16 container bytes and decoded back by the stage. duration
    (n/rate), rms (sqrt of an integer-exact mean square) and
    zero-crossings (strict sign product < 0) are all bit-replayable;
    the oracle rebuilds them with a correlated generate_series + lag
    window."""
    from edkray.ops.multimodal import audio_features, encode_audio

    def _mk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for did in ids:
            n = 50 + int(did) % 20
            i = np.arange(n, dtype=np.int64)
            payloads.append(encode_audio(
                ((int(did) * 7 + i * 13) % 200 - 100).astype(np.int16), 16000))
        return pa.table({"doc_id": b["doc_id"],
                         "payload": pa.array(payloads, type=pa.binary())})

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(_mk, batch_format="pyarrow")
    return audio_features(ds, concurrency=_pool())


_SQL_AUDIO_FEATURES = """
WITH d AS (
  SELECT doc_id, 50 + doc_id % 20 AS n FROM documents
), s AS (
  SELECT d.doc_id, d.n, i.i, (d.doc_id * 7 + i.i * 13) % 200 - 100 AS v
  FROM d, unnest(generate_series(0, d.n - 1)) AS i(i)
), z AS (
  SELECT doc_id, n, i, v,
         lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
  FROM s
)
SELECT doc_id,
       CAST(16000 AS BIGINT) AS sample_rate,
       min(n) / 16000.0 AS duration_s,
       sqrt(sum(CAST(v AS DOUBLE) * v) / min(n)) AS rms,
       CAST(sum(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
FROM z GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Q: quarantine_counts — ingest validation reason rollup


def q_quarantine_counts(sf_dir: str, max_text_chars: int = 100):
    """Ingest quarantine (ops/stages.py:validate_pages): documents get
    planted defects by doc_id%10 — 0: empty url, 1: unparseable url,
    2: null ts, 3: 1970 ts (out of range), 4: null text, 5: oversized
    text, 6: empty url AND null ts (precedence — null_url wins) — one
    vectorized when-chain pass, then a reason rollup ('valid' for null).
    Oracle replays the synthesis and the pinned rule order as a CASE
    chain."""
    import datetime as _dt

    import polars as pl

    from edkray.ops.stages import validate_pages

    def _mk(b):
        df = pl.from_arrow(b)
        d = pl.col("doc_id")
        m = d % 10
        url = (
            pl.when((m == 0) | (m == 6)).then(pl.lit(""))
            .when(m == 1).then(pl.lit("not a url"))
            .otherwise(pl.lit("https://site") + (d % 20).cast(pl.String)
                       + pl.lit(".example/d/") + d.cast(pl.String))
        )
        ts = (
            pl.when((m == 2) | (m == 6)).then(pl.lit(None, dtype=pl.Datetime("us")))
            .when(m == 3).then(pl.lit(_dt.datetime(1970, 1, 1)).cast(pl.Datetime("us")))
            .otherwise(pl.lit(_dt.datetime(2017, 1, 1)).cast(pl.Datetime("us")))
        )
        text = (
            pl.when(m == 4).then(pl.lit(None, dtype=pl.String))
            .when(m == 5).then(pl.lit("x").repeat_by(max_text_chars + 1).list.join(""))
            .otherwise(pl.col("text"))
        )
        return df.select(d, url.alias("url"), ts.alias("warc_ts"),
                         text.alias("text")).to_arrow()

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _mk, batch_format="pyarrow"
    )
    ds = ds.map_batches(
        lambda b: validate_pages(b, max_text_chars=max_text_chars),
        batch_format="pyarrow",
    )

    def _rollup(b: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(b)
            .with_columns(pl.col("reject_reason").fill_null("valid").alias("reason"))
            .group_by("reason").agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    from edkray.ops.shuffle import bucketed_group_map

    parts = ds.map_batches(_rollup, batch_format="pyarrow")
    return bucketed_group_map(
        parts, ["reason"],
        lambda t: pl.from_arrow(t).group_by("reason").agg(pl.col("n").sum()).to_arrow(),
        num_buckets=4,
    )


def _sql_quarantine(max_text_chars: int = 100) -> str:
    return rf"""
WITH s AS (
  SELECT doc_id,
    CASE WHEN doc_id % 10 IN (0, 6) THEN ''
         WHEN doc_id % 10 = 1 THEN 'not a url'
         ELSE 'https://site' || CAST(doc_id % 20 AS VARCHAR)
              || '.example/d/' || CAST(doc_id AS VARCHAR) END AS url,
    CASE WHEN doc_id % 10 IN (2, 6) THEN NULL
         WHEN doc_id % 10 = 3 THEN TIMESTAMP '1970-01-01'
         ELSE TIMESTAMP '2017-01-01' END AS warc_ts,
    CASE WHEN doc_id % 10 = 4 THEN NULL
         WHEN doc_id % 10 = 5 THEN repeat('x', {max_text_chars + 1})
         ELSE text END AS text
  FROM documents
), r AS (
  SELECT CASE
    WHEN url IS NULL OR trim(url) = '' THEN 'null_url'
    WHEN NOT regexp_matches(trim(url), '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+')
      THEN 'bad_url'
    WHEN warc_ts IS NULL THEN 'null_ts'
    WHEN warc_ts < TIMESTAMP '1990-01-01' OR warc_ts >= TIMESTAMP '2100-01-01'
      THEN 'ts_out_of_range'
    WHEN text IS NULL THEN 'null_text'
    WHEN length(text) > {max_text_chars} THEN 'oversized_text'
    ELSE 'valid' END AS reason
  FROM s
)
SELECT reason, CAST(count(*) AS BIGINT) AS n FROM r GROUP BY reason
"""


# --------------------------------------------------------------------------
# Q: snapshot_diff — added/removed/changed between two corpus versions


def q_snapshot_diff(sf_dir: str):
    """Corpus snapshot diff (ops/diff.py:snapshot_diff): old = docs with
    doc_id%5≠0, new = docs with doc_id%7≠0 and text prefixed 'v2 ' on
    doc_id%3==0 — so the three statuses all occur. Both sides reduce to
    narrow (url, min(text)) rows per batch, co-shuffle once via tagged
    union, and classify per bucket with a vectorized full-outer join.
    Oracle: the same min()-collapse + FULL OUTER JOIN in SQL."""
    import polars as pl

    from edkray.ops.diff import snapshot_diff

    base = _read(sf_dir, "documents", ["doc_id", "text"])

    def _old(b):
        df = pl.from_arrow(b).filter(pl.col("doc_id") % 5 != 0)
        return df.select(
            ("u" + pl.col("doc_id").cast(pl.String)).alias("url"), "text"
        ).to_arrow()

    def _new(b):
        df = pl.from_arrow(b).filter(pl.col("doc_id") % 7 != 0)
        return df.select(
            ("u" + pl.col("doc_id").cast(pl.String)).alias("url"),
            pl.when(pl.col("doc_id") % 3 == 0)
            .then(pl.lit("v2 ") + pl.col("text"))
            .otherwise(pl.col("text"))
            .alias("text"),
        ).to_arrow()

    old = base.map_batches(_old, batch_format="pyarrow")
    new = base.map_batches(_new, batch_format="pyarrow")
    return snapshot_diff(old, new, num_buckets=8)


_SQL_SNAPSHOT_DIFF = """
WITH o AS (
  SELECT 'u' || CAST(doc_id AS VARCHAR) AS url, min(text) AS v
  FROM documents WHERE doc_id % 5 <> 0 GROUP BY 1
), n AS (
  SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
         min(CASE WHEN doc_id % 3 = 0 THEN 'v2 ' || text ELSE text END) AS v
  FROM documents WHERE doc_id % 7 <> 0 GROUP BY 1
)
SELECT coalesce(o.url, n.url) AS url,
       CASE WHEN o.url IS NULL THEN 'added'
            WHEN n.url IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM o FULL OUTER JOIN n ON o.url = n.url
WHERE o.url IS NULL OR n.url IS NULL OR o.v IS DISTINCT FROM n.v
"""


# --------------------------------------------------------------------------
# Q: jsonl_scan — JSONL web-corpus engine round-trip


def q_jsonl_scan(sf_dir: str):
    """The JSONL engine (sources/jsonl.py) end-to-end: documents are
    written as two date-sharded ``.jsonl.gz`` files (doc_id parity picks
    the day), scanned back through the registry engine with a time
    template (gz inflated in the read tasks, date re-parsed from each
    path), and rolled up per (date, lang). The oracle computes the same
    rollup straight from the documents table with the same parity-day
    rule — parity proves the write→expand→read→date-attach loop is
    lossless."""
    import datetime as _dt
    import os

    from edkray.sources.registry import get_source
    from edkray.sources.jsonl import write_jsonl

    def _populate(work: str) -> None:
        tbl = _read(sf_dir, "documents", ["doc_id", "text", "lang"]).to_pandas()
        for day in (1, 2):
            rows = [
                {"doc_id": int(r.doc_id), "text": str(r.text), "lang": str(r.lang)}
                for r in tbl.itertuples() if int(r.doc_id) % 2 == day - 1
            ]
            write_jsonl(os.path.join(work, f"docs-2017010{day}.jsonl.gz"), rows)

    d = _scratch_cache("jsonl", sf_dir, _populate)
    ds = get_source("jsonl").scan(
        d + "/docs-%Y%m%d.jsonl.gz",
        time_range=(_dt.datetime(2017, 1, 1), _dt.datetime(2017, 1, 3)),
    )

    def _rollup(batch: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(batch)
            .group_by("date", "lang")
            .agg(
                pl.len().cast(pl.Int64).alias("n_docs"),
                pl.col("text").str.len_chars().cast(pl.Int64).sum().alias("total_chars"),
            )
            .to_arrow()
        )

    from edkray.ops.shuffle import bucketed_group_map
    import polars as pl

    parts = ds.map_batches(_rollup, batch_format="pyarrow")
    return bucketed_group_map(
        parts, ["date", "lang"],
        lambda t: pl.from_arrow(t).group_by("date", "lang")
            .agg(pl.col("n_docs").sum(), pl.col("total_chars").sum()).to_arrow(),
        num_buckets=4,
    )


_SQL_JSONL_SCAN = """
SELECT CAST('2017-01-01' AS TIMESTAMP)
         + to_days(CAST(doc_id % 2 AS INTEGER)) AS date,
       lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Q: cooc_pairs / pmi_pairs — windowed co-occurrence and PMI


def q_cooc_pairs(sf_dir: str, window: int = 2):
    """Windowed token co-occurrence (ops/text.py:token_cooccurrence):
    \\S+ tokens, position pairs 0 < j−i ≤ window within a doc, members
    lexicographically ordered. Pairings are vectorized shifts over the
    exploded token stream (doc-boundary pairs masked); per-batch
    pre-aggregation, hash-bucketed sums. Oracle replays via the
    exploded self-join on (doc, position-range)."""
    from edkray.ops.text import token_cooccurrence

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return token_cooccurrence(ds, window=window, num_buckets=16)


def _sql_cooc(window: int = 2) -> str:
    return rf"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
), x AS (
  SELECT doc_id, i, ws[i] AS tok
  FROM t, unnest(generate_series(1, len(ws))) AS s(i)
), p AS (
  SELECT CASE WHEN a.tok <= b.tok THEN a.tok ELSE b.tok END AS wa,
         CASE WHEN a.tok <= b.tok THEN b.tok ELSE a.tok END AS wb
  FROM x a JOIN x b ON a.doc_id = b.doc_id
                   AND b.i > a.i AND b.i <= a.i + {window}
)
SELECT wa, wb, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY wa, wb
"""


def q_pmi_pairs(sf_dir: str, window: int = 2, min_pair_count: int = 2):
    """PMI over the co-occurrence counts (ops/text.py:pmi_scores):
    pmi = ln((n/P) / ((ca/T)·(cb/T))) with P = total pair slots and
    T = total tokens; pairs with n < 2 dropped. Unigram counts join
    broadcast (documented vocab bound; bucketed co-shuffle is the
    stated scale path). Oracle recomposes the identical arithmetic."""
    from edkray.ops.text import pmi_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return pmi_scores(ds, window=window, min_pair_count=min_pair_count,
                      num_buckets=16)


def _sql_pmi(window: int = 2, min_pair_count: int = 2) -> str:
    return rf"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
), x AS (
  SELECT doc_id, i, ws[i] AS tok
  FROM t, unnest(generate_series(1, len(ws))) AS s(i)
), u AS (
  SELECT tok AS w, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY tok
), tot AS (
  SELECT CAST(sum(c) AS DOUBLE) AS t_tot FROM u
), p AS (
  SELECT CASE WHEN a.tok <= b.tok THEN a.tok ELSE b.tok END AS wa,
         CASE WHEN a.tok <= b.tok THEN b.tok ELSE a.tok END AS wb
  FROM x a JOIN x b ON a.doc_id = b.doc_id
                   AND b.i > a.i AND b.i <= a.i + {window}
), pc_ AS (
  SELECT wa, wb, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY wa, wb
), ptot AS (
  SELECT CAST(sum(n) AS DOUBLE) AS p_tot FROM pc_
)
SELECT pc_.wa, pc_.wb, pc_.n,
       ln((CAST(pc_.n AS DOUBLE) / ptot.p_tot)
          / ((CAST(ua.c AS DOUBLE) / tot.t_tot) * (CAST(ub.c AS DOUBLE) / tot.t_tot))) AS pmi
FROM pc_, ptot, tot
JOIN u ua ON ua.w = pc_.wa
JOIN u ub ON ub.w = pc_.wb
WHERE pc_.n >= {min_pair_count}
"""


# --------------------------------------------------------------------------
# Q: anchor_texts — per-(target, anchor-text) rollup


def q_anchor_texts(sf_dir: str):
    """Anchor-text aggregation (ops/html.py:extract_anchor_texts): html
    plants anchors WITH inner text — absolute ('to site k'), relative
    ('rel j'), a nested-tag anchor that the pinned [^<]* contract skips
    — pairs explode vectorized and the (dst, anchor) counts finish
    hash-bucketed. Oracle replays the two-group regex via
    list_zip(regexp_extract_all(...,1), ...,2))."""
    import polars as pl

    from edkray.ops.html import extract_anchor_texts
    from edkray.ops.shuffle import bucketed_group_map

    def _mk(batch):
        df = pl.from_arrow(batch)
        d = pl.col("doc_id")
        url = (pl.lit("https://site") + (d % 20).cast(pl.String)
               + pl.lit(".example/d/") + d.cast(pl.String))
        html = (
            pl.lit('<p><a href="https://site') + ((d + 1) % 20).cast(pl.String)
            + pl.lit('.example/home" rel="next">to site ')
            + ((d + 1) % 20).cast(pl.String)
            + pl.lit('</a><a href="/rel/') + (d % 7).cast(pl.String)
            + pl.lit('">rel ') + (d % 7).cast(pl.String)
            + pl.lit('</a><a href="/skip"><b>nested</b></a></p>')
        )
        return df.select(url.alias("url"), html.alias("html")).to_arrow()

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(_mk, batch_format="pyarrow")
    pairs = extract_anchor_texts(ds)

    def _agg(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t).group_by("dst", "anchor")
            .agg(pl.col("n").sum()).to_arrow()
        )

    parts = pairs.map_batches(
        lambda b: pl.from_arrow(b).group_by("dst", "anchor")
                    .agg(pl.len().cast(pl.Int64).alias("n")).to_arrow(),
        batch_format="pyarrow",
    )
    return bucketed_group_map(parts, ["dst", "anchor"], _agg, num_buckets=8)


def _sql_anchor_texts() -> str:
    from edkray.ops.html import _ANCHOR_RE

    return rf"""
WITH u AS (
  SELECT doc_id,
         'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example/d/'
           || CAST(doc_id AS VARCHAR) AS url,
         '<p><a href="https://site' || CAST((doc_id + 1) % 20 AS VARCHAR)
           || '.example/home" rel="next">to site ' || CAST((doc_id + 1) % 20 AS VARCHAR)
           || '</a><a href="/rel/' || CAST(doc_id % 7 AS VARCHAR)
           || '">rel ' || CAST(doc_id % 7 AS VARCHAR)
           || '</a><a href="/skip"><b>nested</b></a></p>' AS html
  FROM documents
), m AS (
  SELECT regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)', 1) AS base,
         unnest(list_zip(regexp_extract_all(html, '{_ANCHOR_RE}', 1),
                         regexp_extract_all(html, '{_ANCHOR_RE}', 2))) AS z
  FROM u
), p AS (
  SELECT CASE WHEN regexp_matches(z[1], '^https?://') THEN z[1]
              WHEN starts_with(z[1], '/') AND NOT starts_with(z[1], '//') THEN base || z[1]
              ELSE NULL END AS dst,
         z[2] AS anchor
  FROM m
)
SELECT dst, anchor, CAST(count(*) AS BIGINT) AS n
FROM p WHERE dst IS NOT NULL GROUP BY dst, anchor
"""


# --------------------------------------------------------------------------
# Q: domain_rollup — per-domain stats with a host blocklist

_ROLLUP_BLOCKLIST = ["site3.example", "site7.example"]


def q_domain_rollup(sf_dir: str):
    """Per-domain rollup (ops/url.py:domain_rollup): documents get
    deterministic urls (1/4 with a www. prefix to exercise host
    normalization), the blocklist drops two hosts BEFORE aggregation,
    per-batch polars pre-aggregation keeps the shuffle to narrow
    (domain, count, sum) partials, and the final sums run hash-bucketed
    (never per-key map_groups). Oracle replays the url synthesis and the
    independent regexp host extraction."""
    import polars as pl

    from edkray.ops.url import domain_rollup

    def _mk_url(batch):
        df = pl.from_arrow(batch)
        return df.with_columns(
            (
                pl.lit("https://")
                + pl.when(pl.col("doc_id") % 4 == 0).then(pl.lit("www.")).otherwise(pl.lit(""))
                + pl.lit("site") + (pl.col("doc_id") % 20).cast(pl.String)
                + pl.lit(".example/d/") + pl.col("doc_id").cast(pl.String)
            ).alias("url")
        ).to_arrow()

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        _mk_url, batch_format="pyarrow"
    )
    return domain_rollup(ds, blocklist=_ROLLUP_BLOCKLIST, num_buckets=8)


def _sql_domain_rollup() -> str:
    from edkray.ops.url import sql_extract_host

    blocked = ", ".join(f"'{h}'" for h in _ROLLUP_BLOCKLIST)
    return f"""
WITH u AS (
  SELECT doc_id, n_chars,
         'https://' || CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END
         || 'site' || CAST(doc_id % 20 AS VARCHAR) || '.example/d/'
         || CAST(doc_id AS VARCHAR) AS url
  FROM documents
), h AS (
  SELECT doc_id, n_chars, {sql_extract_host('url')} AS domain FROM u
)
SELECT domain, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM h WHERE domain NOT IN ({blocked})
GROUP BY domain
"""


# --------------------------------------------------------------------------
# Q: domain_dup_rate — per-host exact-duplicate fraction (curation metric)


def q_domain_dup_rate(sf_dir: str):
    """Per-domain exact-dup rate (ops/dedup.py:dup_rate_by_group): docs
    get deterministic domains (doc_id % 20) and 1/5 of them are rewritten
    to one of 7 boilerplate strings so cross-domain duplicate groups
    exist; the op hashes text per batch (text never shuffles — only
    ~24 B/row (hash, doc_id, domain) partials), flags non-minimal
    doc_ids per hash-group in one bucketed pass, and sums per-domain
    partials in a second tiny one. Oracle replays the synthesis and the
    winner rule via a window over the raw text."""
    import polars as pl

    from edkray.ops.dedup import dup_rate_by_group

    def _mk(batch):
        df = pl.from_arrow(batch)
        return df.with_columns(
            pl.when(pl.col("doc_id") % 5 == 0)
            .then(pl.lit("BOILERPLATE-") + (pl.col("doc_id") % 7).cast(pl.String))
            .otherwise(pl.col("text"))
            .alias("text"),
            (
                pl.lit("site") + (pl.col("doc_id") % 20).cast(pl.String)
                + pl.lit(".example")
            ).alias("domain"),
        ).to_arrow()

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _mk, batch_format="pyarrow"
    )
    return dup_rate_by_group(ds, num_buckets=8)


_SQL_DOMAIN_DUP_RATE = """
WITH u AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN 'BOILERPLATE-' || CAST(doc_id % 7 AS VARCHAR)
              ELSE text END AS text,
         'site' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS domain
  FROM documents
), d AS (
  SELECT domain,
         CASE WHEN doc_id > min(doc_id) OVER (PARTITION BY text)
              THEN 1 ELSE 0 END AS is_dup
  FROM u
)
SELECT domain, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(is_dup) AS BIGINT) AS n_dups,
       CAST(sum(is_dup) AS DOUBLE) / count(*) AS dup_rate
FROM d GROUP BY domain
"""


# --------------------------------------------------------------------------
# Q: embedding_stats — per-dimension mean/std of the embedding corpus


def q_embedding_stats(sf_dir: str):
    """Feature-normalization statistics (ops/search.py:embedding_stats):
    one streaming pass emits d (sum, sum-of-squares, count) partials per
    block from a vectorized matrix reduction; the final combine groups d
    keys (64 dims — tiny). Population std via sqrt(E[x^2] - E[x]^2); the
    oracle replays the identical formula so float order agrees to 1e-9.
    Vectors never shuffle."""
    from edkray.ops.search import embedding_stats

    ds = _read(sf_dir, "embeddings", ["embedding"])
    return embedding_stats(ds)


_SQL_EMBEDDING_STATS = """
WITH x AS (
  SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS s(i)
)
SELECT dim,
       sum(val) / count(*) AS mean_val,
       sqrt(sum(val * val) / count(*)
            - (sum(val) / count(*)) * (sum(val) / count(*))) AS std_val
FROM x GROUP BY dim
"""


# --------------------------------------------------------------------------
# Q: embedding_cov — population covariance matrix of the embedding corpus


def q_linear_fit(sf_dir: str):
    """Distributed OLS fit (ops/search.py:linear_fit): price-per-1k
    against (quantity, discount) over lineitem — the linear
    quality-classifier primitive as a sufficient-statistic fold (one
    d²-double partial row per block, rows never shuffle, O(d³) driver
    solve). Oracle replays the population normal equations with
    covar_pop + Cramer's rule for d=2."""
    from edkray.ops.search import linear_fit

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_discount", "l_extendedprice"])

    def _prep(b: pa.Table) -> pa.Table:
        y = pc.divide(pc.cast(b["l_extendedprice"], pa.float64()), 1000.0)
        # discount as percent: keeps the feature variances within two
        # orders of each other, so the solve is well-conditioned and the
        # engine/oracle float agreement has ~100x margin under the
        # driver's tolerance
        d100 = pc.multiply(pc.cast(b["l_discount"], pa.float64()), 100.0)
        b = b.append_column("y_kprice", y)
        return b.append_column("discount_pct", d100)

    ds = ds.map_batches(_prep, batch_format="pyarrow")
    return linear_fit(ds, ["l_quantity", "discount_pct"], "y_kprice")


_SQL_LINEAR_FIT = """
WITH t AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x1,
         CAST(l_discount AS DOUBLE) * 100.0 AS x2,
         CAST(l_extendedprice AS DOUBLE) / 1000.0 AS y
  FROM lineitem
), m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         avg(x1) AS mx1, avg(x2) AS mx2, avg(y) AS my,
         covar_pop(x1, x1) AS v11, covar_pop(x2, x2) AS v22,
         covar_pop(x1, x2) AS v12, covar_pop(x1, y) AS c1,
         covar_pop(x2, y) AS c2, covar_pop(y, y) AS vyy
  FROM t
), s AS (
  SELECT mx1, mx2, my, n * vyy AS syy,
         n * v11 AS s11, n * v22 AS s22, n * v12 AS s12,
         n * c1 AS sc1, n * c2 AS sc2,
         (n * c1 * n * v22 - n * c2 * n * v12)
           / (n * v11 * n * v22 - n * v12 * n * v12) AS b1,
         (n * v11 * n * c2 - n * v12 * n * c1)
           / (n * v11 * n * v22 - n * v12 * n * v12) AS b2
  FROM m
)
SELECT 'l_quantity' AS term, b1 AS value FROM s
UNION ALL SELECT 'discount_pct', b2 FROM s
UNION ALL SELECT 'intercept', my - b1 * mx1 - b2 * mx2 FROM s
UNION ALL SELECT 'r2',
  1.0 - (syy - 2.0 * (b1 * sc1 + b2 * sc2)
         + (b1 * b1 * s11 + 2.0 * b1 * b2 * s12 + b2 * b2 * s22)) / syy
FROM s
"""


def q_embedding_cov(sf_dir: str):
    """Covariance fold (ops/search.py:embedding_cov): each block reduces
    to one (n, sum, Gram) partial row (~d² doubles); the driver-free
    final fold emits d² (dim_i, dim_j, cov) rows via
    cov = E[xxᵀ] − E[x]E[x]ᵀ. The oracle replays the identical formula
    through the exploded self-join on vec_id."""
    from edkray.ops.search import embedding_cov

    ds = _read(sf_dir, "embeddings", ["embedding"])
    return embedding_cov(ds)


_SQL_EMBEDDING_COV = """
WITH x AS (
  SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS s(i)
)
SELECT a.dim AS dim_i, b.dim AS dim_j,
       sum(a.val * b.val) / count(*)
         - (sum(a.val) / count(*)) * (sum(b.val) / count(*)) AS cov_val
FROM x a JOIN x b USING (vec_id)
GROUP BY a.dim, b.dim
"""


# --------------------------------------------------------------------------
# Q: zscore_embeddings — per-dimension standardization of the corpus


def q_zscore_embeddings(sf_dir: str):
    """Feature standardization (ops/search.py:standardize_embeddings):
    the stats fold reduces the corpus to d-float partials, the 2·d
    (mean, std) floats broadcast once, pass two is a vectorized
    centered divide per batch. Long-format (vec_id, dim, z_val) so the
    oracle replays it by joining the exploded values to per-dim
    population stats (identical E[x²]−E[x]² formula)."""
    from edkray.ops.search import standardize_embeddings

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return standardize_embeddings(ds)


_SQL_ZSCORE_EMBEDDINGS = """
WITH x AS (
  SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS s(i)
), st AS (
  SELECT dim, sum(val) / count(*) AS m,
         sqrt(sum(val * val) / count(*)
              - (sum(val) / count(*)) * (sum(val) / count(*))) AS sd
  FROM x GROUP BY dim
)
SELECT x.vec_id, x.dim,
       (x.val - st.m) / CASE WHEN st.sd <= 0 THEN 1.0 ELSE st.sd END AS z_val
FROM x JOIN st USING (dim)
"""


# --------------------------------------------------------------------------
# Q: pca_scores — fit PCA on the covariance fold, project the corpus


def q_pca_scores(sf_dir: str, k: int = 4):
    """PCA fit + transform (ops/search.py:pca_fit/pca_transform):
    distributed covariance fold → driver eigh of the d×d matrix (O(d³),
    corpus-size independent) → broadcast (k,d) components → one centered
    matmul per batch, long-format (vec_id, component, score) rows.
    Eigendecomposition is not SQL-expressible, so this entry is
    rows-only for the driver; exactness vs numpy's full-data PCA is
    pinned by TestPca (orthonormal components, descending eigenvalues,
    sign-canonical scores)."""
    from edkray.ops.search import pca_fit, pca_transform

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    model = pca_fit(ds, k=k)
    return pca_transform(ds, model)


# --------------------------------------------------------------------------
# Q: lang_centroids — per-language embedding centroids


def q_lang_centroids(sf_dir: str):
    """Grouped VECTOR aggregation (ops/search.py:grouped_centroids):
    the (doc_id → lang) tag column attaches via ONE hash-bucketed
    large↔large co-shuffle join (ops/joins.py:bucketed_join — no driver
    materialization, no O(corpus) broadcast; the native hash_join
    rejects list<float> carry columns); then per batch one argsort +
    np.add.reduceat folds to (lang, n, sum-vector) partials — d floats
    per (lang, batch) enter the bucketed exchange. Oracle: exploded
    join + per-(lang, dim) sum/count."""
    from edkray.ops.joins import bucketed_join
    from edkray.ops.search import grouped_centroids

    langs = _read(sf_dir, "documents", ["doc_id", "lang"])
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ds = bucketed_join(emb, langs, on=["vec_id"], right_on=["doc_id"],
                       how="inner", num_buckets=8)
    return grouped_centroids(ds, "lang", num_buckets=4)


_SQL_LANG_CENTROIDS = """
WITH x AS (
  SELECT d.lang, i - 1 AS dim, CAST(e.embedding[i] AS DOUBLE) AS val
  FROM embeddings e
  JOIN documents d ON d.doc_id = e.vec_id,
       unnest(generate_series(1, len(e.embedding))) AS s(i)
)
SELECT lang, dim, sum(val) / count(*) AS centroid_val
FROM x GROUP BY lang, dim
"""


# --------------------------------------------------------------------------
# Q: mahalanobis — embedding-space outlier scores


def q_mahalanobis(sf_dir: str):
    """Embedding outlier scoring (ops/search.py:mahalanobis_scores):
    covariance fold → driver d×d inverse → broadcast (μ, Σ⁻¹) → one
    einsum quadratic form per batch. Matrix inversion is not
    SQL-expressible, so this entry is rows-only for the driver;
    numpy parity (including the chi-square-ish mean property
    E[d²] = d on the fitting corpus) is pinned by TestMahalanobis."""
    from edkray.ops.search import mahalanobis_scores

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return mahalanobis_scores(ds)


# --------------------------------------------------------------------------
# Q: doc_chunks — overlapping sliding-window chunking


def q_doc_chunks(sf_dir: str, chunk_words: int = 16, stride_words: int = 8):
    """RAG/long-context chunking (ops/text.py:chunk_documents): each doc
    explodes into word windows [k*stride, k*stride+chunk) for every
    k*stride < n_words; tail chunks may be short, 0-word docs emit
    nothing. The oracle replays the same windows with 1-based DuckDB
    list slicing over generate_series."""
    from edkray.ops.text import chunk_documents

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: chunk_documents(b, chunk_words=chunk_words, stride_words=stride_words),
        batch_format="pyarrow",
    )


_SQL_DOC_CHUNKS = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
)
SELECT doc_id, k AS chunk_id,
       array_to_string(ws[k * 8 + 1 : k * 8 + 16], ' ') AS chunk_text,
       least(16, len(ws) - k * 8) AS n_chunk_words
FROM w, unnest(generate_series(0, CAST((len(ws) - 1) // 8 AS BIGINT))) AS t(k)
WHERE len(ws) > 0
"""


# --------------------------------------------------------------------------
# Q: robots_kept — robots-exclusion prefix filter


def q_robots_kept(sf_dir: str):
    """Robots-style disallow filter (ops/url.py:robots_filter): pages
    get deterministic urls (doc_id%3==0 lands under /private/); the rule
    set disallows /private/ on hosts site0-site9 plus the bare prefix
    /d/1 on site1 (prefix semantics cross directory boundaries: /d/1,
    /d/10, /d/199 all match). Rules broadcast once; pages stream through
    one vectorized host-join + starts_with pass — no shuffle."""
    import polars as pl

    from edkray.ops.url import robots_filter

    def _mk(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        url = (
            pl.lit("https://site") + (pl.col("doc_id") % 20).cast(pl.Utf8)
            + pl.lit(".example")
            + pl.when(pl.col("doc_id") % 3 == 0).then(pl.lit("/private/")).otherwise(pl.lit("/d/"))
            + pl.col("doc_id").cast(pl.Utf8)
        )
        return df.with_columns(url.alias("url")).select(["doc_id", "url"]).to_arrow()

    rules = pa.table({
        "host": [f"site{k}.example" for k in range(10)] + ["site1.example"],
        "disallow_prefix": ["/private/"] * 10 + ["/d/1"],
    })
    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(_mk, batch_format="pyarrow")
    return robots_filter(ds, rules)


_SQL_ROBOTS = r"""
WITH rules AS (
  SELECT 'site' || CAST(k AS VARCHAR) || '.example' AS host, '/private/' AS pfx
  FROM unnest(generate_series(0, 9)) AS t(k)
  UNION ALL SELECT 'site1.example', '/d/1'
), u AS (
  SELECT doc_id,
         'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example'
         || CASE WHEN doc_id % 3 = 0 THEN '/private/' ELSE '/d/' END
         || CAST(doc_id AS VARCHAR) AS url
  FROM documents
)
SELECT doc_id, url FROM u
WHERE NOT EXISTS (
  SELECT 1 FROM rules r
  WHERE r.host = lower(regexp_extract(u.url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1))
    AND starts_with(regexp_extract(u.url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1), r.pfx)
)
"""


_SQL_INCREMENTAL_DEDUP = """
WITH kk AS (
  SELECT doc_id, array_to_string((string_split(text, ' '))[1:3], ' ') AS ck
  FROM documents
), newb AS (
  SELECT * FROM kk WHERE doc_id % 5 = 0
), corpus AS (
  SELECT * FROM kk WHERE doc_id % 5 <> 0
), first_new AS (
  SELECT doc_id, ck FROM (
    SELECT doc_id, ck, row_number() OVER (PARTITION BY ck ORDER BY doc_id) AS rn
    FROM newb
  ) WHERE rn = 1
)
SELECT doc_id, ck FROM first_new n
WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.ck = n.ck)
"""


# --------------------------------------------------------------------------
# Q: packed_sequences — shuffle-shard ∘ greedy sequence packing


def q_packed_sequences(sf_dir: str, shard_size: int = 64, seq_len: int = 512):
    """The full trainer-prep tail: whitespace token counts → global
    shuffle-shard (q_shuffle_shards) → greedy in-order sequence packing
    per shard (ops/aggregate.py:pack_sequences — per-shard cumsum, no
    global barrier). Emits each doc's shard, token offset and the
    training sequence it starts in."""
    from edkray.ops.aggregate import global_shuffle_shard, pack_sequences
    from edkray.ops.text import token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(
        lambda b: token_count(b).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )
    sharded = global_shuffle_shard(ds, "doc_id", shard_size, range_bits=6)
    packed = pack_sequences(sharded, "shard", "pos_in_shard", "n_tokens", seq_len,
                            num_buckets=16)
    return packed.map_batches(
        lambda b: b.select(["doc_id", "shard", "tok_offset", "seq_id"]),
        batch_format="pyarrow",
    )


def _sql_packed_sequences(shard_size: int = 64, seq_len: int = 512) -> str:
    return rf"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN tt = '' THEN 0
              ELSE len(regexp_split_to_array(tt, '\s+')) END AS n_tokens
  FROM (SELECT doc_id, regexp_replace(text, '^\s+|\s+$', '', 'g') AS tt
        FROM documents)
), h AS (
  SELECT doc_id, n_tokens, (doc_id * 2654435761) % 4294967296 AS hh FROM t
), r AS (
  SELECT doc_id, n_tokens, row_number() OVER (ORDER BY hh, doc_id) - 1 AS pos
  FROM h
), s AS (
  SELECT doc_id, n_tokens, pos // {shard_size} AS shard,
         pos % {shard_size} AS pos_in_shard
  FROM r
), o AS (
  SELECT doc_id, shard,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY pos_in_shard
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_offset
  FROM s
)
SELECT doc_id, shard, tok_offset, tok_offset // {seq_len} AS seq_id FROM o
"""


# --------------------------------------------------------------------------
# Q: heavy_hitters — exact φ-heavy hitters (Misra-Gries + verify)


def q_heavy_hitters(sf_dir: str, k: int = 30):
    """Exact heavy-hitter words (count > n/(k+1)) over the corpus token
    stream (ops/aggregate.py:heavy_hitters — per-batch Misra-Gries
    pigeonhole candidates, distributed exact verification; result is
    order-independent hence SQL-exact)."""
    from edkray.ops.aggregate import heavy_hitters

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _words(batch: pa.Table) -> pa.Table:
        import polars as pl

        w = (
            pl.from_arrow(batch.select(["text"]))
            .select(pl.col("text").str.split(" ").alias("w"))
            .explode("w")
        )
        return pa.table({"w": pa.array(w["w"].to_list(), type=pa.string())})

    words = ds.map_batches(_words, batch_format="pyarrow")
    return heavy_hitters(words, "w", k=k)


def _sql_heavy_hitters(k: int = 30) -> str:
    return f"""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), t AS (
  SELECT count(*) AS n FROM w
), c AS (
  SELECT w, count(*) AS cnt FROM w GROUP BY w
)
SELECT c.w, c.cnt FROM c CROSS JOIN t WHERE c.cnt > t.n / {k + 1}.0
"""


# --------------------------------------------------------------------------
# Q: shuffle_shards — deterministic global shuffle + shard assignment


def q_shuffle_shards(sf_dir: str, shard_size: int = 64):
    """Global training-shard assignment
    (ops/aggregate.py:global_shuffle_shard): reproducible corpus-wide
    permutation by (knuth_hash(doc_id), doc_id) via range-partitioned
    prefix offsets (no global sort barrier), sharded every 64 docs.
    Oracle: row_number over the same hash order."""
    from edkray.ops.aggregate import global_shuffle_shard

    ds = _read(sf_dir, "documents", ["doc_id"])
    out = global_shuffle_shard(ds, "doc_id", shard_size, range_bits=6)
    return out.map_batches(
        lambda b: b.select(["doc_id", "shard", "pos_in_shard"]),
        batch_format="pyarrow",
    )


def _sql_shuffle_shards(shard_size: int = 64) -> str:
    return f"""
WITH h AS (
  SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS hh FROM documents
), r AS (
  SELECT doc_id, row_number() OVER (ORDER BY hh, doc_id) - 1 AS pos FROM h
)
SELECT doc_id, pos // {shard_size} AS shard, pos % {shard_size} AS pos_in_shard
FROM r
"""


# --------------------------------------------------------------------------
# Q: window_events — pure range (interval) join, overlapping windows


def _range_windows() -> "pa.Table":
    """12 fixed 120-hour windows every 60 hours over Jan 2024 (2×
    overlap, so most events match two windows) — deterministic
    literals, no data dependency."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    hour = np.timedelta64(3600_000_000, "us")
    starts = base + np.arange(12) * 60 * hour
    return pa.table(
        {
            "win_id": pa.array(np.arange(12, dtype=np.int64)),
            "ws": pa.array(starts),
            "we": pa.array(starts + 120 * hour),
        }
    )


def q_window_events(sf_dir: str):
    """Pure range join (no equi key): events against 12 OVERLAPPING
    calendar windows (ops/joins.py:range_join_broadcast — broadcast
    interval table, vectorized chunked containment), then a per-window
    rollup. Oracle: DuckDB join on ts BETWEEN bounds."""
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.joins import range_join_broadcast

    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])
    joined = range_join_broadcast(ds, _range_windows(), "ts", "ws", "we")
    out = grouped_agg(
        joined, ["win_id"],
        [("count", None, "n_events"), ("sum", "value", "sum_value")],
    )
    return out.map_batches(lambda b: _round_cols(b, ["sum_value"], 6),
                           batch_format="pyarrow")


_SQL_WINDOW_EVENTS = """
WITH win AS (
  SELECT i AS win_id,
         TIMESTAMP '2024-01-01 00:00:00' + to_hours(60 * i) AS ws,
         TIMESTAMP '2024-01-01 00:00:00' + to_hours(60 * i + 120) AS we
  FROM (SELECT unnest(range(0, 12)) AS i)
)
SELECT w.win_id, count(*) AS n_events,
       round(sum(e.value), 6) AS sum_value
FROM events e JOIN win w ON e.ts >= w.ws AND e.ts < w.we
GROUP BY w.win_id
"""


# --------------------------------------------------------------------------
# Q: dup_spans — exact-substring duplication scan (Lee et al. 2022)


def q_dup_spans(sf_dir: str, L: int = 32):
    """Per-doc duplicated-span statistics
    (ops/text.py:duplicated_span_stats): fraction of each doc's 32-char
    grams occurring more than once corpus-wide. Oracle: the same grams
    by substr in DuckDB, grouped on the gram STRING (the engine's
    64-bit rolling hash is collision-free at this scale by
    construction — a collision would fail the hash compare)."""
    from edkray.ops.text import duplicated_span_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = duplicated_span_stats(ds, L=L, num_buckets=16)
    return out.map_batches(lambda b: _round_cols(b, ["dup_frac"], 9),
                           batch_format="pyarrow")


_SQL_DUP_SPANS = """
WITH g AS (
  SELECT doc_id, substr(text, pos, 32) AS gram
  FROM documents, unnest(range(1, length(text) - 30)) AS t(pos)
), cnt AS (
  SELECT gram, count(*) AS n FROM g GROUP BY gram
), per AS (
  SELECT g.doc_id, count(*) AS n_grams,
         CAST(sum(CASE WHEN cnt.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
  FROM g JOIN cnt USING (gram) GROUP BY g.doc_id
)
SELECT doc_id, n_grams, n_dup_grams,
       round(n_dup_grams / CAST(n_grams AS DOUBLE), 9) AS dup_frac
FROM per
"""


# --------------------------------------------------------------------------
# Q: dsir_resample — DSIR step 2: Gumbel-top-k importance resampling


def q_dsir_resample(sf_dir: str, n: int = 100):
    """The complete DSIR pipeline: hashed-unigram importance weights
    (q_dsir_scores) → Gumbel-top-k weighted sample of n docs
    (ops/aggregate.py:gumbel_weighted_sample, deterministic hash-seeded
    noise). Oracle: the dsir SQL composed with the same Gumbel key."""
    from edkray.ops.aggregate import gumbel_weighted_sample
    from edkray.ops.text import dsir_logweights

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    w = dsir_logweights(ds, "lang", ["en"])
    out = gumbel_weighted_sample(w, "dsir_logw", n, "doc_id")
    return out.map_batches(lambda b: b.select(["doc_id", "gumbel_key"]),
                           batch_format="pyarrow")


def _sql_dsir_resample(n: int = 100) -> str:
    return f"""
WITH w AS ({_sql_dsir(64, 1.0)}),
keyed AS (
  SELECT doc_id,
         dsir_logw + (-ln(-ln((((doc_id * 2654435761) % 4294967296) + 0.5)
                              / 4294967296.0))) AS gumbel_key
  FROM w
)
SELECT doc_id, gumbel_key FROM keyed ORDER BY gumbel_key DESC, doc_id LIMIT {n}
"""


# --------------------------------------------------------------------------
# Q: temperature_mix — temperature-flattened data mixing


def q_temperature_mix(sf_dir: str, total_n: int = 150, temperature: float = 0.5):
    """Temperature-flattened language mixing
    (ops/aggregate.py:temperature_sample): per-lang quota ∝ count^0.5
    (low-resource langs boosted), filled by the deterministic
    Knuth-hash rank. Oracle: the same pow/floor quota arithmetic and
    window rank in DuckDB."""
    from edkray.ops.aggregate import temperature_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    out = temperature_sample(ds, ["lang"], total_n, temperature, "doc_id",
                             num_buckets=16)
    return out.map_batches(lambda b: b.select(["doc_id", "lang"]),
                           batch_format="pyarrow")


def _sql_temperature_mix(total_n: int = 150, t: float = 0.5) -> str:
    return f"""
WITH c AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY lang
), tt AS (
  SELECT sum(pow(n, {t})) AS tot FROM c
), q AS (
  SELECT lang, CAST(floor({total_n} * pow(c.n, {t}) / tt.tot) AS BIGINT) AS quota
  FROM c CROSS JOIN tt
), h AS (
  SELECT doc_id, lang, (doc_id * 2654435761) % 4294967296 AS hh FROM documents
), r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rk
  FROM h
)
SELECT r.doc_id, r.lang FROM r JOIN q USING (lang) WHERE r.rk <= q.quota
"""


# --------------------------------------------------------------------------
# Q: dsir_scores — DSIR importance weights (hashed unigram log-ratio)


def q_dsir_scores(sf_dir: str):
    """DSIR data-selection scores (ops/text.py:dsir_logweights): hashed
    unigram (polyhash64 mod 64) add-1-smoothed log-likelihood ratio of
    the lang='en' target model vs the raw corpus model, summed per doc.
    Counting pass emits ≤64 partial rows per batch; log-ratio table (64
    floats) broadcasts; scoring is batch-local. Oracle: the identical
    polynomial word hash (the winnowing oracle's pows CTE), bucket
    counts and smoothing replayed in DuckDB. Assumes no empty tokens
    (single-space corpus — the SQL chars-join drops a zero-length word,
    the engine hashes it to bucket 0)."""
    from edkray.ops.text import dsir_logweights

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return dsir_logweights(ds, "lang", ["en"])


def _sql_dsir(nb: int = 64, alpha: float = 1.0) -> str:
    B = 0x100000001B3
    M = 1 << 64
    return f"""
WITH RECURSIVE pows(e, p) AS (
  SELECT 0, CAST(1 AS UBIGINT)
  UNION ALL
  SELECT e + 1, CAST((p::HUGEINT * {B}::HUGEINT) % {M}::HUGEINT AS UBIGINT)
  FROM pows
  WHERE e < (SELECT max(length(w.word)) FROM (
               SELECT DISTINCT unnest(string_split(text, ' ')) AS word
               FROM documents) w)
), w AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents
), vocab AS (
  SELECT DISTINCT word FROM w
), wchars AS (
  SELECT word, unnest(range(1, length(word) + 1)) AS pos FROM vocab
), wh AS (
  SELECT c.word,
         CAST(CAST(sum(ord(substr(c.word, c.pos, 1))::HUGEINT * pw.p::HUGEINT)
                   % {M}::HUGEINT AS UBIGINT) % {nb} AS BIGINT) AS b
  FROM wchars c JOIN pows pw ON pw.e = length(c.word) - c.pos
  GROUP BY c.word
), wb AS (
  SELECT w.doc_id, w.lang, wh.b FROM w JOIN wh USING (word)
), cnt AS (
  SELECT b, count(*) AS raw_cnt,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt_cnt
  FROM wb GROUP BY b
), tot AS (
  SELECT sum(raw_cnt) AS traw, sum(tgt_cnt) AS ttgt FROM cnt
), lr AS (
  SELECT b, ln((tgt_cnt + {alpha}) / (ttgt + {alpha} * {nb}))
            - ln((raw_cnt + {alpha}) / (traw + {alpha} * {nb})) AS lr
  FROM cnt CROSS JOIN tot
)
SELECT wb.doc_id, sum(lr.lr) AS dsir_logw
FROM wb JOIN lr USING (b)
GROUP BY wb.doc_id
"""


# --------------------------------------------------------------------------
# Q: bm25_topk — lexical relevance search (Okapi BM25)

_BM25_TERMS = ["table", "scan", "merge", "window"]


def q_bm25_topk(sf_dir: str, k: int = 10):
    """Okapi BM25 top-k over the documents table
    (ops/search.py:bm25_topk): one narrow stats pass (|terms|+2 numbers
    off the corpus), one batch-local scoring pass, per-block top-k
    combiner. Tokenization is single-space split so the DuckDB
    string_split oracle is exact."""
    from edkray.ops.search import bm25_topk

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(ds, _BM25_TERMS, k=k)


def _sql_bm25(k: int = 10, k1: float = 1.2, b: float = 0.75) -> str:
    vals = ", ".join(f"('{t}')" for t in _BM25_TERMS)
    return f"""
WITH terms(term) AS (VALUES {vals}),
doc AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), dl AS (
  SELECT doc_id, len(ws) AS dl FROM doc
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT d.doc_id, t.term, count(*) AS tf
  FROM doc d, unnest(d.ws) AS u(w) JOIN terms t ON u.w = t.term
  GROUP BY d.doc_id, t.term
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
), scores AS (
  SELECT tf.doc_id,
         sum(ln(1 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * tf.tf * ({k1} + 1)
             / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl))) AS score
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, score FROM scores ORDER BY score DESC, doc_id LIMIT {k}
"""


# --------------------------------------------------------------------------
# Q: semdedup — semantic dedup (kmeans ∘ within-cluster cosine prune)


def q_semdedup(sf_dir: str, k: int = 4, iters: int = 2, tau: float = 0.95):
    """SemDeDup (ops/cluster.py:semdedup): full-dataset k-means, then
    within each cluster drop rows with cosine ≥ tau to any lower-id row
    of the same cluster. Oracle: the kmeans CTE replay (proven by
    kmeans_clusters) + a within-cluster pairwise-cosine LEFT JOIN with
    the same lowest-id-survives rule."""
    from edkray.ops.cluster import kmeans_fit, semdedup

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent = kmeans_fit(ds, k=k, iters=iters)
    return semdedup(ds, cent, tau=tau)


def _sql_semdedup(k: int = 4, iters: int = 2, tau: float = 0.95) -> str:
    cos = """list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))"""
    return f"""
WITH af2 AS ({_sql_kmeans(k, iters)}),
u AS (
  SELECT a.vec_id, a.cluster, e.embedding
  FROM af2 a JOIN embeddings e USING (vec_id)
), dups AS (
  SELECT b.vec_id
  FROM u b JOIN u a ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE {cos} >= {tau}
  GROUP BY b.vec_id
)
SELECT u.vec_id, u.cluster, (d.vec_id IS NULL) AS keep
FROM u LEFT JOIN dups d ON u.vec_id = d.vec_id
"""


# --------------------------------------------------------------------------
# Q: embedding_topk — brute-force cosine top-k similarity search


def q_embedding_topk(sf_dir: str, k: int = 5):
    from edkray.ops.search import cosine_topk

    emb = pq.read_table(_p(sf_dir, "embeddings"))
    qdf = emb.to_pandas().sort_values("vec_id")
    qdf = qdf[qdf["vec_id"] < 5]
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = cosine_topk(ds, queries, k=k)

    def _clean(b: pa.Table) -> pa.Table:
        return b.select(["query_id", "vec_id", "rank"])

    return out.map_batches(_clean, batch_format="pyarrow")


_SQL_EMB_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5
), s AS (
  SELECT q.query_id, e.vec_id,
         list_sum(list_transform(range(1, 65), i -> CAST(qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))))
         AS cosine
  FROM q CROSS JOIN embeddings e
)
SELECT query_id, vec_id, rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) - 1 AS rank
  FROM s
) WHERE rank < 5
"""


# --------------------------------------------------------------------------
# Q: cosine_dup_pairs — exact embedding near-dup pairs (cos ≥ 0.8)


def q_cosine_dup_pairs(sf_dir: str, threshold: float = 0.4):
    emb = pq.read_table(_p(sf_dir, "embeddings"))
    ids_all = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norm = np.linalg.norm(mat, axis=1)
    norm[norm == 0] = 1.0
    unit = mat / norm[:, None]
    state = ray.put((ids_all, unit))

    class _Dup:
        def __init__(self):
            self.ids, self.unit = ray.get(state)
            self.pos = {int(i): j for j, i in enumerate(self.ids)}

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids = batch["vec_id"].to_numpy(zero_copy_only=False)
            rows = np.array([self.pos[int(v)] for v in vids])
            cos = self.unit[rows] @ self.unit.T  # (b, n)
            out_a, out_b = [], []
            for r, vid in zip(cos, vids):
                hits = np.nonzero((r >= threshold) & (self.ids > vid))[0]
                out_a.extend([int(vid)] * len(hits))
                out_b.extend(self.ids[hits].tolist())
            return pa.table(
                {"id_a": pa.array(out_a, type=pa.int64()), "id_b": pa.array(out_b, type=pa.int64())}
            )

    ds = _read(sf_dir, "embeddings", ["vec_id"])
    return ds.map_batches(_Dup, batch_format="pyarrow", concurrency=_pool(), batch_size=512)


_SQL_COS_DUP = """
WITH u AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM u a JOIN u b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      / (a.nrm * b.nrm) >= 0.4
"""


# --------------------------------------------------------------------------
# Q: bbox_customers — bbox filter + broadcast nation join (M6/J2)

_EUROPE = (-10.0, 35.0, 30.0, 60.0)


def q_bbox_customers(sf_dir: str):
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.joins import broadcast_join
    from edkray.ops.stages import bbox_filter

    nation = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    ds = ds.map_batches(
        lambda b: bbox_filter(_add_lonlat(b, "c_custkey"), _EUROPE), batch_format="pyarrow"
    )
    ds = broadcast_join(ds, nation, on=["c_nationkey"], right_on=["n_nationkey"])
    return grouped_agg(ds, ["n_name"], [("count", None, "n_customers")])


_SQL_BBOX = f"""
WITH pts AS (
  SELECT c_nationkey, {_sql_lon('c_custkey')} AS lon, {_sql_lat('c_custkey')} AS lat FROM customer
)
SELECT n_name, count(*) AS n_customers
FROM pts JOIN nation ON c_nationkey = n_nationkey
WHERE lon >= {_EUROPE[0]} AND lon <= {_EUROPE[2]} AND lat >= {_EUROPE[1]} AND lat <= {_EUROPE[3]}
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# Q: catalog — parquet-footer discovery (SURVEY S5/S9)

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def q_catalog(sf_dir: str):
    from edkray.sources.catalog import discover

    cat = discover([_p(sf_dir, t) for t in _TABLES])

    def _name(b: pa.Table) -> pa.Table:
        names = [os.path.basename(p).removesuffix(".parquet") for p in b["path"].to_pylist()]
        return pa.table({"table_name": pa.array(names), "n_rows": b["n_rows"]})

    return cat.map_batches(_name, batch_format="pyarrow")


_SQL_CATALOG = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS table_name, count(*) AS n_rows FROM {t}" for t in _TABLES
)


# --------------------------------------------------------------------------
# Q: stack_read — catalog-driven 4-D stack read (reference
# xarray_boosted/entrypoint.py:280-304): scan rows → format-adapter
# catalog → read_stack pruned by band membership at PLAN time; only
# the selected tile's selected column leaves storage


def q_stack_read(sf_dir: str):
    import ray.data

    from edkray.ops.aggregate import grouped_agg
    from edkray.sources.formats import get_adapter
    from edkray.sources.window import read_stack

    scan = ray.data.from_arrow(
        pa.table(
            {
                "path": pa.array([_p(sf_dir, "documents"), _p(sf_dir, "embeddings")]),
                "tile_name": pa.array(["documents", "embeddings"]),
                "date": pa.array(
                    [dt.datetime(2017, 1, 1), dt.datetime(2017, 1, 2)],
                    type=pa.timestamp("us"),
                ),
            }
        )
    )
    catalog = get_adapter("parquet").create_tiles(scan)
    # band pruning selects only the documents tile (embeddings has no
    # doc_id band); whole-tile window, single-column projection
    rows = read_stack(catalog, bands=["doc_id"], columns=["doc_id"])
    out = grouped_agg(rows, ["tile_name"], [("count", None, "n_rows"), ("sum", "doc_id", "id_sum")])
    return out


_SQL_STACK = """
SELECT 'documents' AS tile_name, count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS id_sum FROM documents
"""


# --------------------------------------------------------------------------
# Q: resample_read — windowed raster resample (VERDICT r4 missing #2;
# reference classes/dataset.py:524-541 gdal.Warp-to-resolution)


def q_resample_read(sf_dir: str, dst_n: int = 777):
    """Warp-to-target-resolution over the documents tile's row axis
    (sources/window.py:resample_stack): nearest + linear kernels with
    GDAL's pixel-center mapping p = (j+0.5)·n_src/dst_n, each output
    chunk reading only its minimal row-group-pruned source window. The
    oracle replays the index arithmetic over a row_number() view."""
    import ray.data

    from edkray.sources.formats import get_adapter
    from edkray.sources.window import resample_stack

    scan = ray.data.from_arrow(
        pa.table(
            {
                "path": pa.array([_p(sf_dir, "documents")]),
                "tile_name": pa.array(["documents"]),
                "date": pa.array([dt.datetime(2017, 1, 1)], type=pa.timestamp("us")),
            }
        )
    )
    catalog = get_adapter("parquet").create_tiles(scan)
    rows = resample_stack(catalog, "doc_id", dst_n, chunk=256)
    return rows.map_batches(
        lambda b: _round_cols(b, ["doc_id_nearest", "doc_id_linear"]),
        batch_format="pyarrow",
    )


def _sql_resample(dst_n: int = 777) -> str:
    return f"""
WITH src AS (
  SELECT row_number() OVER (ORDER BY doc_id) - 1 AS i, CAST(doc_id AS DOUBLE) AS v
  FROM documents
), n AS (
  SELECT count(*) AS n_src FROM documents
), m AS (
  SELECT j, n_src,
         (j + 0.5) * n_src / {float(dst_n)!r} AS p,
         (j + 0.5) * n_src / {float(dst_n)!r} - 0.5 AS q
  FROM (SELECT unnest(range(0, {dst_n})) AS j), n
), idx AS (
  SELECT j,
         least(CAST(floor(p) AS BIGINT), n_src - 1) AS ni,
         greatest(least(CAST(floor(q) AS BIGINT), n_src - 1), 0) AS i0,
         least(greatest(least(CAST(floor(q) AS BIGINT), n_src - 1), 0) + 1, n_src - 1) AS i1,
         q - floor(q) AS w
  FROM m
)
SELECT 'documents' AS tile_name, idx.j,
       round(a.v, 4) AS doc_id_nearest,
       round(b.v * (1.0 - w) + c.v * w, 4) AS doc_id_linear
FROM idx
JOIN src a ON a.i = idx.ni
JOIN src b ON b.i = idx.i0
JOIN src c ON c.i = idx.i1
"""


# --------------------------------------------------------------------------
# Q: users_per_type — exact per-group COUNT(DISTINCT) (two-phase)


def q_users_per_type(sf_dir: str):
    from edkray.ops.aggregate import count_distinct

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return count_distinct(ds, ["event_type"], "user_id", alias="n_users")


_SQL_USERS_PER_TYPE = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Q: suppliers_by_nation — group-collect aggregation (reference A2/J3:
# group band rows by config, collect tile lists, dataset.py:331-347)


def q_suppliers_by_nation(sf_dir: str):
    """Per-nation sorted supplier-key list via the distributed
    collect-list aggregate, serialized to a comma-joined string so the
    oracle compare is robust (DuckDB ``string_agg(... ORDER BY ...)``)."""
    import polars as pl

    from edkray.ops.aggregate import grouped_collect

    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_suppkey"])
    out = grouped_collect(ds, ["s_nationkey"], "s_suppkey", alias="suppliers")

    def _fmt(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return df.select(
            pl.col("s_nationkey"),
            pl.col("suppliers").list.len().cast(pl.Int64).alias("n_suppliers"),
            pl.col("suppliers").cast(pl.List(pl.Utf8)).list.join(",").alias("suppliers"),
        ).to_arrow()

    return out.map_batches(_fmt, batch_format="pyarrow")


_SQL_SUPPLIERS_BY_NATION = """
SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
       string_agg(CAST(s_suppkey AS VARCHAR), ',' ORDER BY s_suppkey) AS suppliers
FROM supplier GROUP BY s_nationkey
"""


# --------------------------------------------------------------------------
# Q: top_orders_per_priority — top-k per group with explicit rank


def q_top_orders_per_priority(sf_dir: str):
    from edkray.ops.aggregate import top_k_per_group

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    return top_k_per_group(
        ds, ["o_orderpriority"], ["o_totalprice", "o_orderkey"], k=3,
        descending=[True, False],
    )


_SQL_TOP_PER_PRIORITY = """
SELECT o_orderkey, o_orderpriority, o_totalprice, rank FROM (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) - 1 AS rank
  FROM orders
) WHERE rank < 3
"""


# --------------------------------------------------------------------------
# Q: customers_without_orders — broadcast ANTI join


def q_customers_without_orders(sf_dir: str):
    """Customers with no high-value (>250k) order — broadcast ANTI join
    (every customer has SOME order in this data, so the plain anti join
    would be empty)."""
    from edkray.ops.joins import broadcast_join

    orders = pq.read_table(_p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    big = orders.filter(pc.greater(orders["o_totalprice"], 250000.0)).select(["o_custkey"])
    ds = _read(sf_dir, "customer")
    return broadcast_join(ds, big, on=["c_custkey"], right_on=["o_custkey"], how="anti")


_SQL_NO_ORDERS = """
SELECT * FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0)
"""


# --------------------------------------------------------------------------
# Q: mercator_customers — vectorized EPSG:3857 transform (M15)


def q_mercator_customers(sf_dir: str):
    from edkray.ops.stages import add_webmercator

    ds = _read(sf_dir, "customer", ["c_custkey"])

    def _t(b: pa.Table) -> pa.Table:
        b = add_webmercator(_add_lonlat(b, "c_custkey"))
        return _round_cols(b.select(["c_custkey", "merc_x", "merc_y"]), ["merc_x", "merc_y"])

    return ds.map_batches(_t, batch_format="pyarrow")


_SQL_MERCATOR = f"""
WITH pts AS (
  SELECT c_custkey, {_sql_lon('c_custkey')} AS lon, {_sql_lat('c_custkey')} AS lat FROM customer
)
SELECT c_custkey,
       round(lon * pi() / 180.0 * 6378137.0, 4) AS merc_x,
       round(ln(tan((90.0 + lat) * pi() / 360.0)) * 6378137.0, 4) AS merc_y
FROM pts
"""


# --------------------------------------------------------------------------
# Q: transform_points — arbitrary EPSG→EPSG reprojection (VERDICT r4
# missing #1; reference utilities/transform.py:8-52 general case)


def q_transform_points(sf_dir: str):
    """Per-point WGS84 UTM (zone from lon, Krüger/Karney n⁶ series —
    the algorithm PROJ uses) + MODIS sinusoidal reprojection in one
    vectorized map_batches (geo/transform.py:transform_points). The
    oracle replays the series expression-by-expression in SQL with the
    identical constants injected from the same module; sinh/cosh/atanh
    are spelled via exp/ln IDENTICALLY on both sides so numpy and
    DuckDB make the same libm calls."""
    from edkray.geo.transform import (
        R_MODIS, sinusoidal_forward, utm_forward, utm_zone,
    )

    ds = _read(sf_dir, "customer", ["c_custkey"])

    def _t(b: pa.Table) -> pa.Table:
        b = _add_lonlat(b, "c_custkey")
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        zone = utm_zone(lon)
        south = lat < 0
        e, n = utm_forward(lon, lat, zone, south)
        sx, sy = sinusoidal_forward(lon, lat, radius=R_MODIS)
        out = pa.table(
            {
                "c_custkey": b["c_custkey"],
                "epsg": pa.array(np.where(south, 32700, 32600) + zone),
                "utm_e": pa.array(e),
                "utm_n": pa.array(n),
                "sinu_x": pa.array(sx),
                "sinu_y": pa.array(sy),
            }
        )
        return _round_cols(out, ["utm_e", "utm_n", "sinu_x", "sinu_y"])

    return ds.map_batches(_t, batch_format="pyarrow")


def _sql_transform_points() -> str:
    from edkray.geo.transform import R_MODIS, UTM_ALPHA, UTM_A, UTM_CONF

    def f64(v: float) -> str:
        # scientific notation forces a DOUBLE literal (a bare decimal
        # parses as DECIMAL, which overflows on DECIMAL×DECIMAL and can
        # round differently); strtod of repr() is bit-exact
        s = repr(float(v))
        return s if "e" in s else s + "e0"

    def sinh(u: str) -> str:
        return f"((exp({u}) - exp(-({u}))) / 2.0)"

    def cosh(u: str) -> str:
        return f"((exp({u}) + exp(-({u}))) / 2.0)"

    def atanh(u: str) -> str:
        return f"(0.5 * ln((1.0 + {u}) / (1.0 - {u})))"

    ka = f"(0.9996e0 * {f64(UTM_A)})"
    xi_terms = "".join(
        f"\n         + {f64(a)} * sin({f64(2.0 * j)} * xip) * {cosh(f'{f64(2.0 * j)} * etap')}"
        for j, a in enumerate(UTM_ALPHA, start=1)
    )
    eta_terms = "".join(
        f"\n         + {f64(a)} * cos({f64(2.0 * j)} * xip) * {sinh(f'{f64(2.0 * j)} * etap')}"
        for j, a in enumerate(UTM_ALPHA, start=1)
    )
    u = f"{atanh('s')} - {f64(UTM_CONF)} * {atanh(f'{f64(UTM_CONF)} * s')}"
    return f"""
WITH pts AS (
  SELECT c_custkey, {_sql_lon('c_custkey')} AS lon, {_sql_lat('c_custkey')} AS lat
  FROM customer
), zoned AS (
  SELECT c_custkey, lon, lat,
         least(greatest(CAST(floor((lon + 180.0) / 6.0) AS BIGINT) + 1, 1), 60) AS zone,
         lat * pi() / 180.0 AS phi, sin(lat * pi() / 180.0) AS s
  FROM pts
), prep AS (
  SELECT *, (lon - (zone * 6.0 - 183.0)) * pi() / 180.0 AS dlam,
         {sinh(u)} AS t
  FROM zoned
), proj AS (
  SELECT *, atan2(t, cos(dlam)) AS xip,
         {atanh('sin(dlam) / sqrt(1.0 + t * t)')} AS etap
  FROM prep
), series AS (
  SELECT *,
         xip{xi_terms} AS xi,
         etap{eta_terms} AS eta
  FROM proj
)
SELECT c_custkey,
       (CASE WHEN lat < 0 THEN 32700 ELSE 32600 END) + zone AS epsg,
       round(500000.0 + {ka} * eta, 4) AS utm_e,
       round((CASE WHEN lat < 0 THEN 10000000.0 ELSE 0.0 END) + {ka} * xi, 4) AS utm_n,
       round({f64(R_MODIS)} * (lon * pi() / 180.0) * cos(phi), 4) AS sinu_x,
       round({f64(R_MODIS)} * phi, 4) AS sinu_y
FROM series
"""


# --------------------------------------------------------------------------
# Q: scaled_quantity — nodata mask + scale/offset (raster band semantics
# M11/M12 over a numeric column)


def q_scaled_quantity(sf_dir: str):
    from edkray.ops.stages import apply_scale_offset, mask_nodata

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey", "l_quantity"])

    def _t(b: pa.Table) -> pa.Table:
        b = mask_nodata(b, "l_quantity", nodata=50.0)
        return apply_scale_offset(b, "l_quantity", scale=2.5, offset=10.0, out_col="qty_scaled")

    return ds.map_batches(_t, batch_format="pyarrow").map_batches(
        lambda b: b.select(["l_orderkey", "l_linenumber", "l_partkey", "qty_scaled"]),
        batch_format="pyarrow",
    )


_SQL_SCALED = """
SELECT l_orderkey, l_linenumber, l_partkey,
       CASE WHEN l_quantity = 50.0 THEN NULL ELSE l_quantity * 2.5 + 10.0 END AS qty_scaled
FROM lineitem
"""


# --------------------------------------------------------------------------
# Q: sample_orders — deterministic key-hash sampling (SQL-reproducible)


def q_sample_orders(sf_dir: str):
    from edkray.ops.stages import deterministic_sample

    ds = _read(sf_dir, "orders")
    return ds.map_batches(
        lambda b: deterministic_sample(b, "o_orderkey", 0.1), batch_format="pyarrow"
    )


_SQL_SAMPLE = """
SELECT * FROM orders
WHERE (o_orderkey * 2654435761) % 4294967296 < CAST(0.1 * 4294967296 AS BIGINT)
"""


# --------------------------------------------------------------------------
# rows-only queries (no SQL equivalent — approximate / hash-based ops)


def q_approx_users_per_type(sf_dir: str):
    """HyperLogLog approximate distinct users per event type (the scale
    path of ``users_per_type`` — shuffles 2^12-register sketches, not
    values) — WITH an oracle-checked error bound: the query runs the HLL
    path AND the exact two-phase count-distinct, and emits per type the
    exact count plus ``hll_ok`` = |est/exact - 1| ≤ 0.05 (3σ for p=12,
    σ = 1.04/√4096 ≈ 1.6%). The DuckDB oracle asserts the exact counts
    and ``hll_ok = TRUE``, so an out-of-bounds sketch is a hard
    hash-mismatch, not a rows-only pass."""
    from edkray.ops.aggregate import approx_count_distinct, count_distinct

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    est = approx_count_distinct(ds, ["event_type"], "user_id").to_pandas()
    exact = count_distinct(ds, ["event_type"], "user_id", alias="exact_users").to_pandas()
    m = exact.merge(est, on="event_type", how="left")
    m["hll_ok"] = (m["approx_nd"] / m["exact_users"] - 1.0).abs() <= 0.05
    out = m[["event_type", "exact_users", "hll_ok"]].sort_values("event_type")
    return table_from_pandas(out.reset_index(drop=True))


_SQL_APPROX_USERS = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS hll_ok
FROM events GROUP BY event_type
"""


def q_minhash_pairs(sf_dir: str):
    """Classic estimated-Jaccard MinHash dedup (est = full-signature
    agreement ≥ 0.5). On this corpus the true pairs sit at J ≥ 0.92 and
    background pairs at J ≈ 0.1, so the est-filtered PAIR SET equals the
    exact J ≥ 0.5 set (est misclassification prob < 1e-17/pair) — the
    ids-only exact-Jaccard SQL is its oracle; est values themselves are
    approximate and therefore not emitted here (see minhash_jaccard_pairs
    for the exact-verified variant)."""
    from edkray.ops.dedup import minhash_lsh_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = minhash_lsh_pairs(ds, threshold=0.5, concurrency=_pool())
    return out.map_batches(lambda b: b.select(["id_a", "id_b"]), batch_format="pyarrow")


def q_minhash_jaccard_pairs(sf_dir: str):
    """MinHash-LSH candidate pairs verified by EXACT char-8-gram
    Jaccard ≥ 0.5 — distributed near-dup dedup with a full SQL oracle
    (`_sql_jaccard(0.5)`); recall 1 is guaranteed on this corpus because
    true ≥0.5 pairs all sit at J ≥ 0.92 (banding miss prob ~2e-9)."""
    from edkray.ops.dedup import minhash_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_jaccard_pairs(ds, threshold=0.5, concurrency=_pool())


def q_dedup_clusters(sf_dir: str):
    """Near-dup CLUSTER resolution — the keep/drop step after pair
    mining: MinHash-LSH pairs (exact at J ≥ 0.5 on this corpus, same
    argument as q_minhash_pairs) → distributed connected components
    (hash-to-min, ops/graph.py) → one row per clustered doc with its
    component id (min doc id reachable) and keep = is-representative.
    Oracle: DuckDB recursive-CTE transitive closure over the exact
    Jaccard ≥ 0.5 pair set."""
    from edkray.ops.dedup import minhash_lsh_pairs
    from edkray.ops.graph import dedup_decisions

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, threshold=0.5, concurrency=_pool())
    return dedup_decisions(pairs, num_buckets=16)


_SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_sql_jaccard(0.5)})
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
  UNION SELECT id_a, id_a FROM pairs
  UNION SELECT id_b, id_b FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS doc_id, min(v) AS cluster_id, (u = min(v)) AS keep
FROM reach GROUP BY u
"""


def q_paragraph_dedup(sf_dir: str, words_per_para: int = 8):
    """Corpus-global PARAGRAPH-level dedup (RefinedWeb-style line
    dedup, ops/dedup.py:paragraph_dedup): every distinct paragraph
    survives only at its first occurrence by (doc_id, pos); documents
    reassemble from surviving paragraphs. The synthetic corpus has no
    newlines, so paragraphs are derived as fixed 8-word chunks
    (``words_per_para=8``) — the view is mirrored chunk-for-chunk in
    the oracle. Decision shuffle is narrow (hash64, doc_id, pos);
    paragraph text never shuffles (docs co-shuffle once, whole)."""
    from edkray.ops.dedup import paragraph_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return paragraph_dedup(
        ds, words_per_para=words_per_para, num_buckets=16, doc_buckets=16
    )


_SQL_PARAGRAPH_DEDUP = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), chunks AS (
  SELECT doc_id, (i - 1) // 8 AS pos, string_agg(ws[i], ' ' ORDER BY i) AS para
  FROM words, unnest(generate_series(1, len(ws))) AS t(i)
  GROUP BY doc_id, (i - 1) // 8
), ranked AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
  FROM chunks
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN rn = 1 THEN para END, ' ' ORDER BY pos), '') AS text_dedup,
       count(*) AS n_paras,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM ranked GROUP BY doc_id
"""


def q_simhash_pairs(sf_dir: str):
    """Near-dup pairs with Hamming(simhash64) ≤ 3 via 4×16-bit chunk
    banding (pigeonhole-EXACT: any such pair agrees on ≥1 chunk, so the
    banded output equals the brute-force pair set). Full SQL oracle:
    ``_sql_simhash_pairs`` recomputes the 64-bit SimHash op-by-op in
    DuckDB (byte-4-gram polynomial hashes mod 2^64 → per-bit majority
    vote → bit_or pack, verified bit-identical) and brute-forces
    bit_count(xor) ≤ 3 over all pairs."""
    from edkray.ops.dedup import simhash_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=3)


def _sql_simhash_pairs(max_hamming: int = 3) -> str:
    """DuckDB mirror of ``simhash64`` + brute-force Hamming pairing.

    Bit-identical to `edkray.ops.dedup.simhash64` for ASCII text (the
    Python path hashes UTF-8 bytes; the corpus is pure ASCII so
    ``ord(substr(...))`` = byte value). Docs shorter than k=4 chars
    would take the Python whole-string-hash fallback and diverge — the
    corpus minimum is 44 chars."""
    B = 0x100000001B3
    M = 1 << 64
    P = [pow(B, e, M) for e in range(4)]
    return f"""
WITH grams AS (
  SELECT doc_id, unnest(range(1, length(text)-2)) AS pos, text FROM documents
), gh AS (
  SELECT doc_id,
    CAST((ord(substr(text,pos,1))*{P[3]}::HUGEINT + ord(substr(text,pos+1,1))*{P[2]}::HUGEINT
        + ord(substr(text,pos+2,1))*{P[1]}::HUGEINT + ord(substr(text,pos+3,1))*{P[0]}::HUGEINT)
        % {M}::HUGEINT AS UBIGINT) AS h
  FROM grams
), bits AS (
  SELECT doc_id, b, sum(CAST((h >> b) & 1 AS BIGINT)) AS cnt, count(*) AS n
  FROM gh, unnest(range(64)) t(b)
  GROUP BY doc_id, b
), sh AS (
  SELECT doc_id,
         bit_or(CASE WHEN 2*cnt > n THEN CAST(1 AS UBIGINT) << CAST(b AS INTEGER) ELSE 0 END) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def q_lsh_embedding_pairs(sf_dir: str):
    """Banded-LSH near-dup pairs, exact-cosine verified. With the
    default 64 bands × 4 bits the per-pair miss probability at the cos
    0.4 threshold is ~1.6e-5, so the output EQUALS the exact pair set
    (the `cosine_dup_pairs` SQL is its oracle); a recall test asserts
    this equality on the test corpora."""
    from edkray.ops.dedup import embedding_dup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = embedding_dup_pairs(ds, threshold=0.4)
    return out.map_batches(lambda b: b.select(["id_a", "id_b"]), batch_format="pyarrow")


def _hex16(arr) -> pa.Array:
    """uint64 → 16-hex-digit strings, vectorized (bytes → hexlify → S16),
    same no-row-loop trick as ``edkray.geo.s2.s2_token``."""
    import binascii

    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint64))
    if a.size == 0:
        return pa.array(np.empty(0, dtype="U16"))
    be = a.byteswap().view(np.uint8).reshape(-1, 8)
    hx = np.frombuffer(binascii.hexlify(be.tobytes()), dtype="S16")
    return pa.array(hx.astype("U16"))


def q_fingerprints(sf_dir: str):
    """Winnowing document fingerprints (min k=8-gram hash per w=16
    window, xor-fold of distinct minima) + whole-doc polynomial hash,
    emitted as 16-hex strings so the compare is integer-width-safe.
    Full SQL oracle: ``_sql_fingerprints`` mirrors the polynomial
    k-gram hash (mod-2^64 HUGEINT arithmetic), the 15-PRECEDING window
    min, the distinct-xor fold and the recursive power table
    op-by-op — verified bit-identical on the test corpora."""
    from edkray.ops.text import fingerprint

    def _fp(b: pa.Table) -> pa.Table:
        out = fingerprint(b)
        return pa.table(
            {
                "doc_id": out["doc_id"],
                "fingerprint_hex": _hex16(out["fingerprint"].to_numpy(zero_copy_only=False)),
                "doc_hash_hex": _hex16(out["doc_hash"].to_numpy(zero_copy_only=False)),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(_fp, batch_format="pyarrow")


def _sql_fingerprints(k: int = 8, w: int = 16) -> str:
    """DuckDB mirror of ``edkray.ops.text.fingerprint`` (ASCII corpus:
    ``ord(substr(...))`` = UTF-8 byte). Docs shorter than k take the
    Python whole-string fallback and would diverge — corpus min is 44
    chars; the ``nh < w`` branch mirrors the single-window case."""
    B = 0x100000001B3
    M = 1 << 64
    P = [pow(B, e, M) for e in range(k)]
    terms = " + ".join(
        f"ord(substr(text,pos+{j},1))*{P[k - 1 - j]}::HUGEINT" for j in range(k)
    )
    return f"""
WITH RECURSIVE pows(e, p) AS (
  SELECT 0, CAST(1 AS UBIGINT)
  UNION ALL
  SELECT e+1, CAST((p::HUGEINT * {B}::HUGEINT) % {M}::HUGEINT AS UBIGINT)
  FROM pows WHERE e < (SELECT max(length(text)) FROM documents)
), grams AS (
  SELECT doc_id, unnest(range(1, length(text)-{k - 2})) AS pos, text FROM documents
), gh AS (
  SELECT doc_id, pos, CAST(({terms}) % {M}::HUGEINT AS UBIGINT) AS h FROM grams
), winmin AS (
  SELECT doc_id, pos,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS m,
         count(*) OVER (PARTITION BY doc_id) AS nh
  FROM gh
), fp AS (
  SELECT doc_id, bit_xor(DISTINCT m) AS fingerprint
  FROM winmin WHERE pos >= {w} OR (nh < {w} AND pos = nh)
  GROUP BY doc_id
), chars AS (
  SELECT doc_id, unnest(range(1, length(text)+1)) AS pos, text FROM documents
), dh AS (
  SELECT c.doc_id,
         CAST(sum(ord(substr(c.text,c.pos,1))::HUGEINT * pw.p::HUGEINT) % {M}::HUGEINT
              AS UBIGINT) AS doc_hash
  FROM chars c JOIN pows pw ON pw.e = length(c.text) - c.pos
  GROUP BY c.doc_id
)
SELECT fp.doc_id, lower(lpad(to_hex(fp.fingerprint),16,'0')) AS fingerprint_hex,
       lower(lpad(to_hex(dh.doc_hash),16,'0')) AS doc_hash_hex
FROM fp JOIN dh USING (doc_id)
"""


def q_hex_cells(sf_dir: str):
    """Per-doc aperture-7 hex cells at res 7/8/9 + counts — full SQL
    oracle: the DuckDB mirror reproduces the lattice rotation, axial
    projection and cube rounding expression-by-expression (round_even =
    numpy half-to-even), verified bit-identical over 100k points."""
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.stages import add_cells

    ds = _read(sf_dir, "documents", ["doc_id"])
    ds = ds.map_batches(
        lambda b: add_cells(_add_lonlat(b, "doc_id"), quad_res=(), hex_res=(7, 8, 9)),
        batch_format="pyarrow",
    )
    return grouped_agg(ds, ["hex_7", "hex_8", "hex_9"], [("count", None, "n_docs")])


def _sql_hexcell_block(res: int, src: str) -> str:
    """CTE chain computing the aperture-7 hex cell id at ``res`` for each
    (doc_id, lon, lat) row of ``src`` — mirrors edkray.geo.hexgrid.hexcell
    op-by-op (same double sequence → bit-identical ids)."""
    c = f"cos({res}*atan(sqrt(3.0)/5.0))"
    s = f"sin({res}*atan(sqrt(3.0)/5.0))"
    size = f"(24.0/power(sqrt(7.0), {res}))"
    return f"""
h{res}_ax AS (
  SELECT doc_id,
         (sqrt(3.0)/3.0*({c}*lon + {s}*lat) - (-{s}*lon + {c}*lat)/3.0) / {size} AS qf,
         (2.0/3.0*(-{s}*lon + {c}*lat)) / {size} AS rf
  FROM {src}
), h{res}_cube AS (
  SELECT doc_id, qf AS xf, rf AS zf, -qf-rf AS yf,
         round_even(qf, 0) AS rx, round_even(-qf-rf, 0) AS ry, round_even(rf, 0) AS rz
  FROM h{res}_ax
), h{res}_fx AS (
  SELECT doc_id, rx, ry, rz,
         abs(rx-xf) AS dx, abs(ry-yf) AS dy, abs(rz-zf) AS dz
  FROM h{res}_cube
), h{res}_fin AS (
  SELECT doc_id,
         CAST(CASE WHEN dx>dy AND dx>dz THEN -ry-rz ELSE rx END AS BIGINT) AS q,
         CAST(CASE WHEN NOT (dx>dy AND dx>dz) AND dz>dy
                   THEN -(CASE WHEN dx>dy AND dx>dz THEN -ry-rz ELSE rx END)-ry
                   ELSE rz END AS BIGINT) AS r
  FROM h{res}_fx
), h{res} AS (
  SELECT doc_id,
         (CAST({res} AS BIGINT) << 54) | ((q + (1<<26)) << 27) | (r + (1<<26)) AS hex
  FROM h{res}_fin
)"""


def _sql_hex_cells() -> str:
    blocks = ",".join(_sql_hexcell_block(r, "pts") for r in (7, 8, 9))
    return f"""
WITH pts AS (
  SELECT doc_id, {_sql_lon('doc_id')} AS lon, {_sql_lat('doc_id')} AS lat FROM documents
),{blocks}
SELECT h7.hex AS hex_7, h8.hex AS hex_8, h9.hex AS hex_9, count(*) AS n_docs
FROM h7 JOIN h8 USING (doc_id) JOIN h9 USING (doc_id)
GROUP BY 1, 2, 3
"""


def q_s2_cells(sf_dir: str):
    """S2 level-10 token histogram — full SQL oracle: the DuckDB mirror
    (``_sql_s2_cells``) reproduces the published S2 scheme end-to-end —
    cube-face selection, quadratic uv→st projection, st→ij
    quantization, and the Hilbert curve as a 10-step recursive CTE over
    the 16-entry (orientation, ij)→(pos, next-orientation) table
    derived from _POS_TO_IJ/_POS_TO_ORIENT — verified bit-identical to
    ``edkray.geo.s2.s2_cellid`` on all three corpora plus a 20k random
    sweep. (Only the top 10 ij bits reach a level-10 id, so the
    recursion walks bits 29..20.)"""
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.stages import add_cells

    ds = _read(sf_dir, "documents", ["doc_id"])
    ds = ds.map_batches(
        lambda b: add_cells(_add_lonlat(b, "doc_id"), quad_res=(), s2_level=10, s2_as_token=True),
        batch_format="pyarrow",
    )
    return grouped_agg(ds, ["s2_token"], [("count", None, "n_docs")])


def _sql_s2_cells(level: int = 10) -> str:
    """DuckDB mirror of lon/lat → S2 cell token at ``level`` (see
    ``q_s2_cells`` docstring). The per-level Hilbert lookup table is the
    2-bit-step form of ``edkray.geo.s2._init_lookup``'s 4-bit batched
    table: for orientation o, position p, ``_POS_TO_IJ[o][p]`` gives the
    ij quadrant and ``o ^ _POS_TO_ORIENT[p]`` the child orientation —
    inverted here to (o, ij) → (p, next_o)."""
    from edkray.geo.s2 import _POS_TO_IJ, _POS_TO_ORIENT

    lut = []
    for o in range(4):
        r = _POS_TO_IJ[o]
        for p in range(4):
            lut.append((o, r[p], p, o ^ _POS_TO_ORIENT[p]))
    lut_vals = ",".join(f"({o},{ij},{p},{no})" for o, ij, p, no in lut)
    kmin = 30 - level  # walk consumes ij bits 29..kmin
    face_mul = 1 << 61
    pos_mul = 1 << (2 * kmin + 1)
    lsb = 1 << (2 * kmin)
    return f"""
WITH RECURSIVE lut(o, ij, p, no) AS (VALUES {lut_vals}),
pts AS (
  SELECT doc_id, {_sql_lon('doc_id')} AS lon, {_sql_lat('doc_id')} AS lat FROM documents
), xyz AS (
  SELECT doc_id,
         cos(radians(lon))*cos(radians(lat)) AS x,
         sin(radians(lon))*cos(radians(lat)) AS y,
         sin(radians(lat)) AS z
  FROM pts
), f0 AS (
  SELECT doc_id, x, y, z,
         CASE WHEN abs(x) >= abs(y) THEN CASE WHEN abs(x) >= abs(z) THEN 0 ELSE 2 END
              ELSE CASE WHEN abs(y) >= abs(z) THEN 1 ELSE 2 END END AS face0
  FROM xyz
), fc AS (
  SELECT doc_id, x, y, z,
         face0 + CASE WHEN (CASE face0 WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0
                      THEN 3 ELSE 0 END AS face
  FROM f0
), uv AS (
  SELECT doc_id, face,
         CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
                   WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
         CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
                   WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
  FROM fc
), ij AS (
  SELECT doc_id, face,
         CAST(least(greatest(floor((CASE WHEN u >= 0 THEN 0.5*sqrt(abs(1+3*u))
                                         ELSE 1-0.5*sqrt(abs(1-3*u)) END) * 1073741824.0),
                             0), 1073741823) AS BIGINT) AS i,
         CAST(least(greatest(floor((CASE WHEN v >= 0 THEN 0.5*sqrt(abs(1+3*v))
                                         ELSE 1-0.5*sqrt(abs(1-3*v)) END) * 1073741824.0),
                             0), 1073741823) AS BIGINT) AS j
  FROM uv
), walk AS (
  SELECT doc_id, face, i, j, 29 AS k, CAST(0 AS BIGINT) AS pos, face % 2 AS orient
  FROM ij
  UNION ALL
  SELECT w.doc_id, w.face, w.i, w.j, w.k - 1, w.pos*4 + lut.p, lut.no
  FROM walk w JOIN lut ON lut.o = w.orient
       AND lut.ij = ((w.i >> w.k) & 1)*2 + ((w.j >> w.k) & 1)
  WHERE w.k >= {kmin}
), cid AS (
  SELECT doc_id,
         CAST((face::HUGEINT * {face_mul} + pos::HUGEINT * {pos_mul} + {lsb})
              % 18446744073709551616::HUGEINT AS UBIGINT) AS id
  FROM walk WHERE k = {kmin - 1}
)
SELECT rtrim(lower(lpad(to_hex(id),16,'0')),'0') AS s2_token,
       CAST(count(*) AS BIGINT) AS n_docs
FROM cid GROUP BY 1
"""


def q_ivf_topk(sf_dir: str):
    """IVF ANN in EXHAUSTIVE-PROBE mode (nprobe = nlist): exercises the
    full IVF machinery — centroid fit, per-batch routing, per-list
    scoring, per-query merge — while probing every list, which makes the
    result exact by construction and gives it the exact-top-k SQL
    oracle. The approximate path (nprobe < nlist) is covered by a
    recall-vs-exact test (tests/test_ops.py)."""
    from edkray.ops.search import IvfIndex, ivf_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # Bounded driver pulls only — a 2000-row fit sample via limit() and
    # the 5 query vectors by id — never the whole embeddings table.
    # The fit sample steers routing, not results (exhaustive probe).
    fit_df = ds.limit(2000).to_pandas()
    fit = np.stack(fit_df["embedding"].to_numpy()).astype(np.float64)
    q_df = ds.filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    queries = np.stack(q_df["embedding"].to_numpy()).astype(np.float64)
    index = IvfIndex(nlist=8).fit(fit)
    out = ivf_topk(ds, index, queries, k=5, nprobe=8)
    return out.map_batches(lambda b: b.select(["query_id", "vec_id", "rank"]), batch_format="pyarrow")


# --------------------------------------------------------------------------
# Q: event_transitions — first-order Markov transition matrix over
# per-user event sequences


def q_event_transitions(sf_dir: str):
    """Global (from_type → to_type) transition counts + row-conditional
    probabilities over per-user event-time-ordered sequences
    (ops/window.py:transition_counts — one key co-shuffle, the lag +
    pair-count collapses to ≤ |types|² partial rows per bucket, the
    probability normalization folds the report-sized matrix under an
    ENFORCED bound). Oracle: SQL LAG over the same (ts, event_id)
    order, window-sum normalization."""
    from edkray.ops.window import transition_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])
    out = transition_counts(ds, ["user_id"], "ts", "event_type",
                            tiebreak=["event_id"])
    return out.map_batches(
        lambda b: _round_cols(b, ["p"], 6), batch_format="pyarrow"
    )


_SQL_EVENT_TRANSITIONS = """
WITH t AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS from_type
  FROM events
), c AS (
  SELECT from_type, event_type AS to_type, count(*)::BIGINT AS n
  FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(n / sum(n) OVER (PARTITION BY from_type), 6) AS p
FROM c
"""


# --------------------------------------------------------------------------
# Q: flag_price_corr — per-group Pearson correlation via six-statistic
# combiner folds


def q_flag_price_corr(sf_dir: str):
    """Pearson correlation of quantity vs extended price per return
    flag (ops/aggregate.py:grouped_corr — six sufficient-statistic
    partials per (key, batch) on the wire, closed-form finalize; the
    corpus never re-groups). Oracle replays the identical closed form
    over SQL double sums (not DuckDB's streaming corr(), whose update
    order differs in the last ulps — the shared 6-dp rounding absorbs
    the partial-vs-sequential summation difference)."""
    from edkray.ops.aggregate import grouped_corr

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])
    out = grouped_corr(ds, ["l_returnflag"], "l_quantity", "l_extendedprice")
    return out.map_batches(
        lambda b: _round_cols(b, ["corr"], 6), batch_format="pyarrow"
    )


_SQL_FLAG_PRICE_CORR = """
WITH s AS (
  SELECT l_returnflag,
         count(*)::BIGINT AS n,
         sum(CAST(l_quantity AS DOUBLE)) AS sx,
         sum(CAST(l_extendedprice AS DOUBLE)) AS sy,
         sum(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)) AS sxx,
         sum(CAST(l_extendedprice AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)) AS syy,
         sum(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)) AS sxy
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr
FROM s
"""


# --------------------------------------------------------------------------
# Q: cube_orders — GROUP BY CUBE over (priority, status)


def q_cube_orders(sf_dir: str):
    """CUBE(o_orderpriority, o_orderstatus) over orders
    (ops/aggregate.py:cube_agg — one combiner-pre-aggregated shuffle at
    the finest level, the other 2^k−1 grouping sets re-aggregate the
    already-reduced report driver-side under an ENFORCED row bound).
    Rolled keys carry the 'ALL' sentinel (no NULL reaches the driver's
    value-hash). Oracle: SQL CUBE with the same coalesce."""
    from edkray.ops.aggregate import cube_agg

    ds = _read(sf_dir, "orders",
               ["o_orderpriority", "o_orderstatus", "o_totalprice"])
    out = cube_agg(
        ds,
        ["o_orderpriority", "o_orderstatus"],
        [
            ("sum", "o_totalprice", "sum_price"),
            ("count", None, "n_orders"),
            ("min", "o_totalprice", "min_price"),
        ],
    )
    return out.map_batches(
        lambda b: _round_cols(b, ["sum_price", "min_price"], 2),
        batch_format="pyarrow",
    )


_SQL_CUBE_ORDERS = """
SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       round(sum(o_totalprice), 2) AS sum_price,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS min_price
FROM orders
GROUP BY CUBE(o_orderpriority, o_orderstatus)
"""


# --------------------------------------------------------------------------
# Q: bfs_hops — multi-source BFS hop distance over the link graph


def q_bfs_hops(sf_dir: str, max_hops: int = 4):
    """Shortest hop distance from a seed set over the same
    deterministic quadratic link graph as pagerank_scores
    (ops/graph.py:bfs_hops — one (edges ∪ frontier) co-shuffle per
    round, only (node, hop) pairs move, per-round materialize
    checkpoint, early stop on an empty frontier). Seeds: doc_id
    divisible by 211. Oracle: bounded recursive CTE + min(hop)."""
    from edkray.ops.graph import bfs_hops

    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def _edges(batch: pa.Table) -> pa.Table:
        s = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        srcs, dsts = [], []
        for k in (1, 7, 13):
            srcs.append(s)
            dsts.append((s * s + k) % n)
        return pa.table({
            "src": pa.array(np.concatenate(srcs)),
            "dst": pa.array(np.concatenate(dsts)),
        })

    edges = docs.map_batches(_edges, batch_format="pyarrow")
    def _seeds(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(ids[ids % 211 == 0])})

    seeds = docs.map_batches(_seeds, batch_format="pyarrow")
    return bfs_hops(edges, seeds, max_hops=max_hops)


def _sql_bfs_hops(max_hops: int = 4) -> str:
    return f"""
WITH RECURSIVE params AS (
  SELECT count(*)::BIGINT AS n FROM documents
), edges AS (
  SELECT doc_id AS src, (doc_id * doc_id + k) % (SELECT n FROM params) AS dst
  FROM documents, (VALUES (1), (7), (13)) AS ks(k)
), walk(node, hop) AS (
  SELECT doc_id, 0 FROM documents WHERE doc_id % 211 = 0
  UNION
  SELECT e.dst, w.hop + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.hop < {max_hops}
)
SELECT node, min(hop)::BIGINT AS hop FROM walk GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q: fetch_windows — coalesce overlapping per-user fetch intervals


def q_fetch_windows(sf_dir: str):
    """Disjoint per-user spans from overlapping fetch intervals
    (ops/window.py:merge_intervals — the gaps-and-islands pattern over
    ranges: one key co-shuffle of 3-column rows, vectorized
    cum_max + shift island scan per bucket, island-sized output).
    Intervals derive deterministically from events: [epoch_us(ts),
    epoch_us(ts) + (event_id % 7200 + 1) s]. Oracle replays the same
    running-max new-group test with SQL windows."""
    from edkray.ops.window import merge_intervals

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def _iv(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "s": pa.array(ts),
            "e": pa.array(ts + (eid % 7200 + 1) * 1_000_000),
        })

    out = merge_intervals(ds.map_batches(_iv, batch_format="pyarrow"),
                          ["user_id"], "s", "e")
    return out.map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"],
            "w_start": b["start"],
            "w_end": b["end"],
            "n_intervals": b["n_intervals"],
        }),
        batch_format="pyarrow",
    )


_SQL_FETCH_WINDOWS = """
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + ((event_id % 7200) + 1) * 1000000 AS e
  FROM events
), o AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM iv
), f AS (
  SELECT user_id, s, e,
         CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END AS newgrp
  FROM o
), g AS (
  SELECT user_id, s, e,
         sum(newgrp) OVER (PARTITION BY user_id ORDER BY s, e) AS gid
  FROM f
)
SELECT user_id, min(s) AS w_start, max(e) AS w_end,
       count(*)::BIGINT AS n_intervals
FROM g GROUP BY user_id, gid
"""


# --------------------------------------------------------------------------
# Q: activity_streaks — longest consecutive-active-day run per user


def q_activity_streaks(sf_dir: str):
    """Total distinct active days and the longest consecutive-day
    streak per user (ops/window.py:max_streak — per-batch day-distinct
    pre-aggregation shrinks the shuffle to (key, day) pairs, then one
    key co-shuffle and a vectorized island scan per bucket). Oracle:
    the SQL day − row_number() islands anchor."""
    from edkray.ops.window import max_streak

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return max_streak(ds, ["user_id"], "ts")


_SQL_ACTIVITY_STREAKS = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), r AS (
  SELECT user_id, day,
         row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM d
), runs AS (
  SELECT user_id, day - CAST(rn AS INTEGER) AS anchor,
         count(*)::BIGINT AS run
  FROM r GROUP BY 1, 2
)
SELECT user_id, sum(run)::BIGINT AS n_days, max(run)::BIGINT AS max_streak
FROM runs GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q: user_entropy — Shannon entropy of each user's event-type mix


def q_user_entropy(sf_dir: str):
    """Per-user Shannon entropy (bits) of the event-type distribution
    (ops/aggregate.py:grouped_entropy — exact (user, type) counts via
    the combiner, then per-user sufficient sums; both shuffles narrow,
    the corpus never re-groups). Oracle replays the closed form
    log₂N − Σ n·log₂n / N over SQL counts."""
    from edkray.ops.aggregate import grouped_entropy

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    out = grouped_entropy(ds, ["user_id"], "event_type")
    return out.map_batches(
        lambda b: _round_cols(b, ["entropy"], 6), batch_format="pyarrow"
    )


_SQL_USER_ENTROPY = """
WITH c AS (
  SELECT user_id, event_type, count(*)::DOUBLE AS n
  FROM events GROUP BY 1, 2
), t AS (
  SELECT user_id, sum(n) AS N, sum(n * log2(n)) AS s
  FROM c GROUP BY 1
)
SELECT user_id, N::BIGINT AS n, round(log2(N) - s / N, 6) AS entropy
FROM t
"""


# --------------------------------------------------------------------------
# Q: priority_status_chisq — chi-squared association test


def q_priority_status_chisq(sf_dir: str):
    """Chi-squared independence test between o_orderpriority and
    o_orderstatus (ops/aggregate.py:chi_squared — distributed
    contingency counts, report-sized driver fold under an ENFORCED
    cell bound). Oracle replays the observed-cells closed form
    χ² = N·Σ o²/(rₐ·c_b) − N via SQL window sums."""
    from edkray.ops.aggregate import chi_squared

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])
    out = chi_squared(ds, "o_orderpriority", "o_orderstatus")
    return _round_cols(out, ["chi2"], 6)


_SQL_PRIORITY_STATUS_CHISQ = """
WITH c AS (
  SELECT o_orderpriority AS a, o_orderstatus AS b, count(*)::DOUBLE AS n
  FROM orders GROUP BY 1, 2
), m AS (
  SELECT n,
         sum(n) OVER (PARTITION BY a) AS ra,
         sum(n) OVER (PARTITION BY b) AS cb,
         sum(n) OVER () AS tot
  FROM c
), d AS (
  SELECT (count(DISTINCT o_orderpriority) - 1)
         * (count(DISTINCT o_orderstatus) - 1) AS dof
  FROM orders
)
SELECT round(any_value(tot) * sum(n * n / (ra * cb)) - any_value(tot), 6) AS chi2,
       (SELECT dof FROM d)::BIGINT AS dof,
       any_value(tot)::BIGINT AS n
FROM m
"""


# --------------------------------------------------------------------------
# Q: rank_ties_orders — per-priority top orders with RANK ties kept


def q_rank_ties_orders(sf_dir: str, k: int = 5):
    """Orders ranking in the top 5 totalprice per priority under SQL
    RANK semantics — boundary ties all kept, unlike the row_number
    top-k (ops/aggregate.py:rank_with_ties — local rank()≤k combiner,
    survivors-only bucket shuffle, exact in-bucket min-rank). Oracle:
    QUALIFY rank() <= 5."""
    from edkray.ops.aggregate import rank_with_ties

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_totalprice"])
    return rank_with_ties(ds, ["o_orderpriority"], "o_totalprice", k)


_SQL_RANK_TIES_ORDERS = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       rank() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC)::BIGINT AS rnk
FROM orders
QUALIFY rnk <= 5
"""


# --------------------------------------------------------------------------
# Q: type_user_jaccard — event-type similarity by shared-user sets


def q_type_user_jaccard(sf_dir: str):
    """Jaccard similarity between every event-type pair by the users
    who perform them (ops/aggregate.py:pairwise_set_jaccard — one
    bucketed shuffle of locally-deduped (user, type) pairs, vectorized
    per-bucket self-join, narrow intersection fold; per-type set sizes
    broadcast through the finalize closure under an ENFORCED bound).
    Oracle: distinct self-join + size join."""
    from edkray.ops.aggregate import pairwise_set_jaccard

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    out = pairwise_set_jaccard(ds, "user_id", "event_type")
    return out.map_batches(
        lambda b: _round_cols(b, ["jaccard"], 6), batch_format="pyarrow"
    )


_SQL_TYPE_USER_JACCARD = """
WITH d AS (
  SELECT DISTINCT event_type AS t, user_id AS u FROM events
), s AS (
  SELECT t, count(*)::DOUBLE AS c FROM d GROUP BY 1
), i AS (
  SELECT a.t AS set_a, b.t AS set_b, count(*)::BIGINT AS n_common
  FROM d a JOIN d b ON a.u = b.u AND a.t < b.t
  GROUP BY 1, 2
)
SELECT set_a, set_b, n_common,
       round(n_common / (sa.c + sb.c - n_common), 6) AS jaccard
FROM i
JOIN s sa ON sa.t = i.set_a
JOIN s sb ON sb.t = i.set_b
"""


# --------------------------------------------------------------------------
# Q: source_lang_kl — per-source language-distribution shift


def q_source_lang_kl(sf_dir: str):
    """KL divergence (bits) of each source's language distribution
    from the corpus-global one — the CCNet-style curation shift score
    (ops/aggregate.py:grouped_kl — narrow counts, vocabulary-sized
    global marginal in the closure, per-key sufficient sums). Oracle
    replays KL = Σ n·(log₂n − log₂q)/N − log₂N over SQL counts."""
    from edkray.ops.aggregate import grouped_kl

    ds = _read(sf_dir, "documents", ["source", "lang"])
    out = grouped_kl(ds, ["source"], "lang")
    return out.map_batches(
        lambda b: _round_cols(b, ["kl"], 6), batch_format="pyarrow"
    )


_SQL_SOURCE_LANG_KL = """
WITH c AS (
  SELECT source, lang, count(*)::DOUBLE AS n
  FROM documents GROUP BY 1, 2
), g AS (
  SELECT lang, sum(n) AS gl FROM c GROUP BY 1
), tot AS (
  SELECT sum(n) AS t FROM c
), j AS (
  SELECT c.source, c.n,
         log2(g.gl / (SELECT t FROM tot)) AS lq
  FROM c JOIN g USING (lang)
), s AS (
  SELECT source, sum(n) AS N, sum(n * (log2(n) - lq)) AS s2
  FROM j GROUP BY 1
)
SELECT source, N::BIGINT AS n, round(s2 / N - log2(N), 6) AS kl
FROM s
"""


# --------------------------------------------------------------------------
# Q: inverted_index — term → df + sorted posting list


def q_inverted_index(sf_dir: str, max_df: int = 1000):
    """Inverted index over documents with a stopword df-cap
    (ops/text.py:inverted_index — per-batch distinct (term, doc)
    combiner, one term-bucket shuffle, df-filter BEFORE the posting
    string exists so stopword-scale lists never materialize). Oracle:
    distinct unnest + string_agg with the same HAVING cap."""
    from edkray.ops.text import inverted_index

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return inverted_index(ds, max_df=max_df)


_SQL_INVERTED_INDEX = r"""
WITH p AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
    FROM documents
  )
)
SELECT term, count(*)::BIGINT AS df,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
FROM p GROUP BY term HAVING count(*) <= 1000
"""


# --------------------------------------------------------------------------
# Q: daily_dense — zero-filled dense daily event counts


def q_daily_dense(sf_dir: str):
    """Daily event counts over a DENSE calendar — empty days appear as
    zero rows (ops/window.py:dense_daily_counts — narrow combiner
    counts, report-sized driver fill under an ENFORCED day bound).
    Oracle: generate_series LEFT JOIN."""
    from edkray.ops.window import dense_daily_counts

    ds = _read(sf_dir, "events", ["ts"])
    return dense_daily_counts(ds, "ts")


_SQL_DAILY_DENSE = """
WITH c AS (
  SELECT CAST(ts AS DATE) AS d, count(*)::BIGINT AS n
  FROM events GROUP BY 1
), r AS (
  SELECT min(d) AS lo, max(d) AS hi FROM c
), cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM r
)
SELECT cal.d AS day, coalesce(c.n, 0)::BIGINT AS n
FROM cal LEFT JOIN c ON cal.d = c.d
"""


# --------------------------------------------------------------------------
# Q: gap_autocorr — per-user burstiness (lag-1 gap autocorrelation)


def q_gap_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of inter-event gaps per user
    (ops/window.py:gap_autocorr — one key co-shuffle, vectorized
    lag pairs + in-bucket Pearson closed form, no pair rows on the
    wire). Oracle: double LAG over the same (ts, event_id) order,
    identical closed form over exact integer-microsecond sums."""
    from edkray.ops.window import gap_autocorr

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    out = gap_autocorr(ds, ["user_id"], "ts", tiebreak=["event_id"])
    return out.map_batches(
        lambda b: _round_cols(b, ["autocorr"], 6), batch_format="pyarrow"
    )


_SQL_GAP_AUTOCORR = """
WITH o AS (
  SELECT user_id, ts, event_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER w)::DOUBLE AS y
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), p AS (
  SELECT user_id, y,
         lag(y) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x
  FROM o
), f AS (
  SELECT user_id, x, y FROM p WHERE x IS NOT NULL AND y IS NOT NULL
), s AS (
  SELECT user_id, count(*)::BIGINT AS n_pairs,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM f GROUP BY 1
)
SELECT user_id, n_pairs,
       CASE WHEN n_pairs * sxx - sx * sx <= 0
              OR n_pairs * syy - sy * sy <= 0 THEN NULL
            ELSE round((n_pairs * sxy - sx * sy)
                       / sqrt((n_pairs * sxx - sx * sx)
                              * (n_pairs * syy - sy * sy)), 6)
       END AS autocorr
FROM s
"""


# --------------------------------------------------------------------------
# Q: weighted_median_price — quantity-weighted median price per flag


def q_weighted_median_price(sf_dir: str):
    """Quantity-weighted median extended price per return flag — the
    price below which half the shipped QUANTITY sits
    (ops/aggregate.py:grouped_weighted_quantile — distinct
    (key, value, Σweight) histogram combiner, one bucket shuffle,
    vectorized cumulative-weight scan). Oracle: cumulative window sum,
    lower-quantile pick."""
    from edkray.ops.aggregate import grouped_weighted_quantile

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])
    return grouped_weighted_quantile(
        ds, ["l_returnflag"], "l_extendedprice", "l_quantity", q=0.5
    )


_SQL_WEIGHTED_MEDIAN_PRICE = """
WITH a AS (
  SELECT l_returnflag, l_extendedprice AS v, sum(l_quantity) AS w
  FROM lineitem GROUP BY 1, 2
), c AS (
  SELECT l_returnflag, v,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw,
         sum(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM a
)
SELECT l_returnflag, min(v) FILTER (WHERE cw >= 0.5 * tw) AS wq
FROM c GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# Q: gini_orders — price-inequality (Gini) per order priority


def q_gini_orders(sf_dir: str):
    """Gini coefficient of order totalprice per priority
    (ops/aggregate.py:grouped_gini — (key, value, count) histogram
    combiner, one bucket shuffle, vectorized cumsum-rank scan). Oracle
    replays the tie-invariant sorted-rank form 2·Σ rn·v/(n·Σv) −
    (n+1)/n."""
    from edkray.ops.aggregate import grouped_gini

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    out = grouped_gini(ds, ["o_orderpriority"], "o_totalprice")
    return out.map_batches(
        lambda b: _round_cols(b, ["gini"], 6), batch_format="pyarrow"
    )


_SQL_GINI_ORDERS = """
WITH r AS (
  SELECT o_orderpriority, o_totalprice AS v,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice) AS rn
  FROM orders
)
SELECT o_orderpriority, count(*)::BIGINT AS n,
       round(2.0 * sum(rn * v) / (count(*) * sum(v))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM r GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q: genmeans_quantity — geometric + harmonic mean per return flag


def q_genmeans_quantity(sf_dir: str):
    """Geometric and harmonic mean of line quantity per return flag
    (ops/aggregate.py:grouped_genmeans — sufficient sums Σln v and
    Σ1/v, two doubles per (key, batch) on the wire). Oracle:
    exp(avg(ln v)) and n/Σ(1/v), shared 6-dp rounding."""
    from edkray.ops.aggregate import grouped_genmeans

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    out = grouped_genmeans(ds, ["l_returnflag"], "l_quantity")
    return out.map_batches(
        lambda b: _round_cols(b, ["geomean", "harmmean"], 6),
        batch_format="pyarrow",
    )


_SQL_GENMEANS_QUANTITY = """
SELECT l_returnflag, count(*)::BIGINT AS n,
       round(exp(sum(ln(l_quantity)) / count(*)), 6) AS geomean,
       round(count(*) / sum(1.0 / l_quantity), 6) AS harmmean
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# Q: hourly_profile — hour-of-day × day-of-week seasonality grid


def q_hourly_profile(sf_dir: str):
    """Event counts per (day-of-week, hour-of-day) — the seasonality
    heat grid (vectorized pyarrow temporal kernels + grouped_agg
    combiner; ≤168 cells on the wire per batch). Sunday = 0 to match
    DuckDB's dayofweek."""
    from edkray.ops.aggregate import grouped_agg

    ds = _read(sf_dir, "events", ["ts"])

    def _parts(b: pa.Table) -> pa.Table:
        return pa.table({
            "dow": pc.cast(
                pc.day_of_week(b["ts"], count_from_zero=True, week_start=7),
                pa.int64(),
            ),
            "hour": pc.cast(pc.hour(b["ts"]), pa.int64()),
        })

    parts = ds.map_batches(_parts, batch_format="pyarrow")
    return grouped_agg(parts, ["dow", "hour"], [("count", None, "n")])


_SQL_HOURLY_PROFILE = """
SELECT dayofweek(ts)::BIGINT AS dow, extract(hour FROM ts)::BIGINT AS hour,
       count(*)::BIGINT AS n
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Q: benford_digits — first-significant-digit distribution


def q_benford_digits(sf_dir: str):
    """First-significant-digit distribution of order totalprice vs the
    Benford expectation log₁₀(1+1/d) — the classic synthetic-data /
    fraud smell test (vectorized numpy digit extraction + grouped_agg
    combiner; 9 rows out). The digit formula
    floor(v/10^floor(log₁₀ v)) is written identically in both engines
    (clamped to [1,9]) so boundary ulps agree."""
    from edkray.ops.aggregate import grouped_agg

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def _digit(b: pa.Table) -> pa.Table:
        v = b["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[v > 0]
        d = np.floor(v / np.power(10.0, np.floor(np.log10(v))))
        d = np.clip(d, 1, 9).astype(np.int64)
        return pa.table({"digit": pa.array(d, pa.int64())})

    digits = ds.map_batches(_digit, batch_format="pyarrow")
    counts = grouped_agg(digits, ["digit"], [("count", None, "n")])

    def _p(b: pa.Table) -> pa.Table:
        d = b["digit"].to_numpy().astype(np.float64)
        exp = np.round(np.log10(1.0 + 1.0 / d), 6)
        return b.append_column("p_benford", pa.array(exp, pa.float64()))

    return counts.map_batches(_p, batch_format="pyarrow")


_SQL_BENFORD_DIGITS = """
WITH d AS (
  SELECT least(greatest(
           floor(o_totalprice / pow(10, floor(log10(o_totalprice)))), 1), 9)::BIGINT AS digit
  FROM orders WHERE o_totalprice > 0
)
SELECT digit, count(*)::BIGINT AS n,
       round(log10(1.0 + 1.0 / digit), 6) AS p_benford
FROM d GROUP BY digit
"""


# --------------------------------------------------------------------------
# Q: bearing_sectors — compass-rose histogram of trajectory legs


def q_bearing_sectors(sf_dir: str):
    """Eight-sector compass histogram of per-user leg headings
    (ops/window.py:bearing_sector_counts — one key co-shuffle,
    vectorized spherical trig, narrow per-bucket sector counts).
    Oracle replays the atan2 initial-bearing formula over the same
    LAG pairs."""
    from edkray.ops.window import bearing_sector_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    pts = ds.map_batches(lambda b: _add_lonlat(b, "event_id"),
                         batch_format="pyarrow")
    return bearing_sector_counts(pts, ["user_id"], "ts", "lon", "lat",
                                 tiebreak=["event_id"])


_SQL_BEARING_SECTORS = f"""
WITH p AS (
  SELECT user_id, ts, event_id,
         radians({_sql_lon('event_id')}) AS lon,
         radians({_sql_lat('event_id')}) AS lat
  FROM events
), l AS (
  SELECT user_id, lon, lat,
         lag(lon) OVER w AS plon, lag(lat) OVER w AS plat
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), b AS (
  SELECT fmod(degrees(atan2(
           sin(lon - plon) * cos(lat),
           cos(plat) * sin(lat) - sin(plat) * cos(lat) * cos(lon - plon)
         )) + 360.0, 360.0) AS theta
  FROM l WHERE plon IS NOT NULL
)
SELECT floor(fmod(theta + 22.5, 360.0) / 45.0)::BIGINT AS sector,
       count(*)::BIGINT AS n
FROM b GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q: mad_quantity — robust spread (median + MAD) per return flag


def q_mad_quantity(sf_dir: str):
    """Median and median-absolute-deviation of line quantity per
    return flag (ops/aggregate.py:grouped_mad — ONE value-histogram
    shuffle yields both statistics; the deviation histogram regroups
    in-bucket, no second corpus pass). Oracle: nested quantile_disc
    (type-1), matched rule-for-rule."""
    from edkray.ops.aggregate import grouped_mad

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    return grouped_mad(ds, ["l_returnflag"], "l_quantity")


_SQL_MAD_QUANTITY = """
WITH m AS (
  SELECT l_returnflag, quantile_disc(l_quantity, 0.5) AS med
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag, any_value(m.med) AS med,
       quantile_disc(abs(l.l_quantity - m.med), 0.5) AS mad
FROM lineitem l JOIN m USING (l_returnflag)
GROUP BY l.l_returnflag
"""


# --------------------------------------------------------------------------
# Q: acctbal_percent_rank — supplier balance percentile within nation


def q_acctbal_percent_rank(sf_dir: str):
    """percent_rank of every supplier's account balance within its
    nation (ops/aggregate.py:grouped_percent_rank — one key
    co-shuffle, vectorized min-rank window; the corpus is annotated,
    not reduced). Oracle: SQL percent_rank()."""
    from edkray.ops.aggregate import grouped_percent_rank

    ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
    out = grouped_percent_rank(ds, ["s_nationkey"], "s_acctbal")
    return out.map_batches(
        lambda b: _round_cols(b, ["pr"], 6), batch_format="pyarrow"
    )


_SQL_ACCTBAL_PERCENT_RANK = """
SELECT s_suppkey, s_nationkey, s_acctbal,
       round(percent_rank() OVER (PARTITION BY s_nationkey
                                  ORDER BY s_acctbal), 6) AS pr
FROM supplier
"""


# --------------------------------------------------------------------------
# Q: lang_ttr — lexical diversity (type-token ratio) per language


def q_lang_ttr(sf_dir: str):
    """Corpus type-token ratio per language: distinct terms / total
    tokens (count_distinct's deduped-pair shuffle + grouped_agg's
    combiner totals; the two language-sized results merge driver-side
    — a report, not a corpus). Oracle: unnest + count(DISTINCT)."""
    import pandas as _pd

    from edkray.ops.aggregate import count_distinct, grouped_agg

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def _tok(b: pa.Table) -> pa.Table:
        import polars as pl
        return (
            pl.from_arrow(b)
            .select(
                pl.col("lang"),
                pl.col("text").str.extract_all(r"\S+").alias("term"),
            )
            .explode("term")
            .drop_nulls("term")
            .to_arrow()
        )

    tok = ds.map_batches(_tok, batch_format="pyarrow")
    tok = tok.materialize()  # reused by both the total and the distinct pass
    totals = grouped_agg(tok, ["lang"], [("count", None, "n_tokens")]).to_pandas()
    nd = count_distinct(tok, ["lang"], "term", alias="n_terms").to_pandas()
    out = _pd.merge(totals, nd, on="lang")
    out["ttr"] = (out["n_terms"] / out["n_tokens"]).round(6)
    return pa.Table.from_pandas(out[["lang", "n_tokens", "n_terms", "ttr"]],
                                preserve_index=False)


_SQL_LANG_TTR = r"""
WITH tok AS (
  SELECT lang, unnest(regexp_extract_all(text, '\S+')) AS term
  FROM documents
)
SELECT lang, count(*)::BIGINT AS n_tokens,
       count(DISTINCT term)::BIGINT AS n_terms,
       round(count(DISTINCT term) / count(*)::DOUBLE, 6) AS ttr
FROM tok GROUP BY lang
"""


# --------------------------------------------------------------------------
# Q: top_tokens_per_lang — most frequent terms per language


def q_top_tokens_per_lang(sf_dir: str, k: int = 3):
    """Top-3 terms per language by corpus frequency (grouped_agg
    combiner counts + top_k_per_group's per-batch head-k before the
    shuffle), ties broken by term ascending. Oracle: row_number over
    (n DESC, term)."""
    from edkray.ops.aggregate import grouped_agg, top_k_per_group

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def _tok(b: pa.Table) -> pa.Table:
        import polars as pl
        return (
            pl.from_arrow(b)
            .select(
                pl.col("lang"),
                pl.col("text").str.extract_all(r"\S+").alias("term"),
            )
            .explode("term")
            .drop_nulls("term")
            .to_arrow()
        )

    counts = grouped_agg(ds.map_batches(_tok, batch_format="pyarrow"),
                         ["lang", "term"], [("count", None, "n")])
    return top_k_per_group(counts, ["lang"], ["n", "term"], k,
                           descending=[True, False])


_SQL_TOP_TOKENS_PER_LANG = r"""
WITH c AS (
  SELECT lang, term, count(*)::BIGINT AS n FROM (
    SELECT lang, unnest(regexp_extract_all(text, '\S+')) AS term
    FROM documents
  ) GROUP BY 1, 2
)
SELECT lang, term, n,
       row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) - 1 AS "rank"
FROM c QUALIFY "rank" < 3
"""


# --------------------------------------------------------------------------
# Q: monthly_growth — month-over-month order-count growth


def q_monthly_growth(sf_dir: str):
    """Monthly order counts with the month-over-month growth rate
    (grouped_agg combiner counts; the LAG ratio folds driver-side over
    the REPORT-SIZED month table under an enforced bound). Oracle:
    date_trunc + LAG."""
    from edkray.ops.aggregate import grouped_agg

    ds = _read(sf_dir, "orders", ["o_orderdate"])

    def _month(b: pa.Table) -> pa.Table:
        return pa.table({
            "month": pc.cast(pc.floor_temporal(b["o_orderdate"], unit="month"),
                             pa.date32())
        })

    counts = grouped_agg(ds.map_batches(_month, batch_format="pyarrow"),
                         ["month"], [("count", None, "n")])
    df = counts.to_pandas(limit=100_000).sort_values("month").reset_index(drop=True)
    prev = df["n"].shift(1)
    df["growth"] = ((df["n"] - prev) / prev).round(6)
    return pa.table({
        "month": pa.array(df["month"], pa.date32()),
        "n": pa.array(df["n"].astype("int64"), pa.int64()),
        "growth": pa.array(df["growth"], pa.float64()),
    })


_SQL_MONTHLY_GROWTH = """
WITH c AS (
  SELECT date_trunc('month', o_orderdate)::DATE AS month,
         count(*)::BIGINT AS n
  FROM orders GROUP BY 1
)
SELECT month, n,
       round((n - lag(n) OVER (ORDER BY month))
             / lag(n) OVER (ORDER BY month)::DOUBLE, 6) AS growth
FROM c
"""


# --------------------------------------------------------------------------
# Q: abc_parts — Pareto/ABC cumulative-revenue classification


def q_abc_parts(sf_dir: str):
    """ABC inventory classification: parts ranked by revenue, class A
    while the running share ≤ 70%, B ≤ 90%, else C
    (ops/rank.py:ordered_cumsum — range-partitioned exact prefix sum,
    one co-shuffle, never a global sort). Revenue is INTEGER cents so
    the running total is bit-exact vs the SQL window sum; class
    boundaries compare in integer math (cum·10 ≤ total·7). Output:
    per-class part count + revenue share."""
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.rank import ordered_cumsum

    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def _cents(b: pa.Table) -> pa.Table:
        v = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_partkey": b["l_partkey"],
            "cents": pa.array(np.round(v * 100.0).astype(np.int64), pa.int64()),
        })

    rev = grouped_agg(ds.map_batches(_cents, batch_format="pyarrow"),
                      ["l_partkey"], [("sum", "cents", "rev")])
    cum, total = ordered_cumsum(rev, "rev", "rev", ["l_partkey"],
                                descending=True)
    total = int(total)

    def _classify(b: pa.Table) -> pa.Table:
        c = b["cum"].to_numpy(zero_copy_only=False)
        cls = np.where(c * 10 <= total * 7, "A",
                       np.where(c * 10 <= total * 9, "B", "C"))
        return pa.table({
            "cls": pa.array(cls, pa.string()),
            "rev": b["rev"],
        })

    classed = cum.map_batches(_classify, batch_format="pyarrow")
    out = grouped_agg(classed, ["cls"],
                      [("count", None, "n_parts"), ("sum", "rev", "class_rev")])

    def _share(b: pa.Table) -> pa.Table:
        share = b["class_rev"].to_numpy(zero_copy_only=False) / total
        return b.append_column("share", pa.array(np.round(share, 6), pa.float64()))

    return out.map_batches(_share, batch_format="pyarrow")


_SQL_ABC_PARTS = """
WITH rev AS (
  SELECT l_partkey, sum(round(l_extendedprice * 100)::BIGINT) AS rev
  FROM lineitem GROUP BY 1
), w AS (
  SELECT rev,
         sum(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum,
         sum(rev) OVER () AS tot
  FROM rev
), c AS (
  SELECT rev, tot,
         CASE WHEN cum * 10 <= tot * 7 THEN 'A'
              WHEN cum * 10 <= tot * 9 THEN 'B'
              ELSE 'C' END AS cls
  FROM w
)
SELECT cls, count(*)::BIGINT AS n_parts, sum(rev)::BIGINT AS class_rev,
       round(sum(rev) / any_value(tot)::DOUBLE, 6) AS share
FROM c GROUP BY cls
"""


# --------------------------------------------------------------------------
# Q: cohort_retention — weekly cohort × week-offset active users


def q_cohort_retention(sf_dir: str):
    """Weekly cohort retention matrix: users grouped by first-activity
    week, counted as retained in every later week they act (distinct
    (user, week) pairs via the combiner — the corpus never joins; the
    cohort join runs over the deduped pair table through the native
    hash join). Oracle: min-week + self join."""
    from edkray.ops.aggregate import distinct, grouped_agg
    from edkray.ops.joins import hash_join

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def _week(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "week": pc.cast(pc.floor_temporal(b["ts"], unit="week"), pa.date32()),
        })

    uw = distinct(ds.map_batches(_week, batch_format="pyarrow"),
                  ["user_id", "week"])
    cohort = grouped_agg(uw, ["user_id"], [("min", "week", "cohort_week")])
    j = hash_join(uw, cohort, on=["user_id"])

    def _offset(b: pa.Table) -> pa.Table:
        off = (
            b["week"].cast(pa.int32()).to_numpy(zero_copy_only=False).astype(np.int64)
            - b["cohort_week"].cast(pa.int32()).to_numpy(zero_copy_only=False)
        ) // 7
        return pa.table({
            "cohort_week": b["cohort_week"],
            "week_offset": pa.array(off, pa.int64()),
        })

    offs = j.map_batches(_offset, batch_format="pyarrow")
    return grouped_agg(offs, ["cohort_week", "week_offset"],
                       [("count", None, "n_users")])


_SQL_COHORT_RETENTION = """
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS week FROM events
), c AS (
  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1
)
SELECT c.cohort_week, (uw.week - c.cohort_week) // 7 AS week_offset,
       count(*)::BIGINT AS n_users
FROM uw JOIN c USING (user_id)
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Q: new_user_rate — share of each day's actives seen for the first time


def q_new_user_rate(sf_dir: str):
    """Per-day novelty: users whose global first active day is that
    day, as a share of the day's distinct actives (distinct (user,
    day) combiner pairs; first-day counts and daily actives are both
    day-keyed narrows that merge driver-side — a report, not a
    corpus). Oracle: min-day + conditional count."""
    import pandas as _pd

    from edkray.ops.aggregate import count_distinct, distinct, grouped_agg

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def _day(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "day": pc.cast(pc.floor_temporal(b["ts"], unit="day"), pa.date32()),
        })

    ud = distinct(ds.map_batches(_day, batch_format="pyarrow"),
                  ["user_id", "day"])
    ud = ud.materialize()  # reused by the first-day and the actives pass
    first = grouped_agg(ud, ["user_id"], [("min", "day", "day")])
    new_per_day = grouped_agg(first, ["day"], [("count", None, "n_new")]).to_pandas()
    actives = count_distinct(ud, ["day"], "user_id", alias="n_active").to_pandas()
    out = _pd.merge(actives, new_per_day, on="day", how="left")
    out["n_new"] = out["n_new"].fillna(0).astype("int64")
    out["new_rate"] = (out["n_new"] / out["n_active"]).round(6)
    out = out.sort_values("day")
    return pa.table({
        "day": pa.array(out["day"], pa.date32()),
        "n_active": pa.array(out["n_active"].astype("int64"), pa.int64()),
        "n_new": pa.array(out["n_new"], pa.int64()),
        "new_rate": pa.array(out["new_rate"], pa.float64()),
    })


_SQL_NEW_USER_RATE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), f AS (
  SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1
)
SELECT ud.day, count(*)::BIGINT AS n_active,
       count(*) FILTER (WHERE f.first_day = ud.day)::BIGINT AS n_new,
       round(count(*) FILTER (WHERE f.first_day = ud.day)
             / count(*)::DOUBLE, 6) AS new_rate
FROM ud JOIN f USING (user_id)
GROUP BY ud.day
"""


# --------------------------------------------------------------------------
# Q: winsorized_price — robust mean price per line status


def q_winsorized_price(sf_dir: str):
    """5/95-winsorized mean extended price per line status
    (ops/aggregate.py:grouped_winsorized_mean — one value-histogram
    shuffle yields both clamp thresholds AND the clamped mean; no
    second corpus pass). Oracle: quantile_disc thresholds +
    avg(clamped), shared 4-dp rounding."""
    from edkray.ops.aggregate import grouped_winsorized_mean

    ds = _read(sf_dir, "lineitem", ["l_linestatus", "l_extendedprice"])
    out = grouped_winsorized_mean(ds, ["l_linestatus"], "l_extendedprice")
    return out.map_batches(
        lambda b: _round_cols(b, ["wmean"], 4), batch_format="pyarrow"
    )


_SQL_WINSORIZED_PRICE = """
WITH t AS (
  SELECT l_linestatus,
         quantile_disc(l_extendedprice, 0.05) AS lo,
         quantile_disc(l_extendedprice, 0.95) AS hi,
         count(*)::BIGINT AS n
  FROM lineitem GROUP BY 1
)
SELECT l.l_linestatus, any_value(t.n) AS n,
       any_value(t.lo) AS lo, any_value(t.hi) AS hi,
       round(avg(least(greatest(l.l_extendedprice, t.lo), t.hi)), 4) AS wmean
FROM lineitem l JOIN t USING (l_linestatus)
GROUP BY l.l_linestatus
"""


# --------------------------------------------------------------------------
# Q: peak_hour — each user's busiest hour-of-day (argmax with tiebreak)


def q_peak_hour(sf_dir: str):
    """Per-user argmax: the hour-of-day with the most events, ties to
    the earliest hour (grouped_agg combiner counts +
    top_k_per_group's per-batch head-1 — the canonical distributed
    argmax). Oracle: row_number over (n DESC, hour)."""
    from edkray.ops.aggregate import grouped_agg, top_k_per_group

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def _hour(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "hour": pc.cast(pc.hour(b["ts"]), pa.int64()),
        })

    counts = grouped_agg(ds.map_batches(_hour, batch_format="pyarrow"),
                         ["user_id", "hour"], [("count", None, "n")])
    top = top_k_per_group(counts, ["user_id"], ["n", "hour"], 1,
                          descending=[True, False])
    return top.map_batches(lambda b: b.drop_columns(["rank"]),
                           batch_format="pyarrow")


_SQL_PEAK_HOUR = """
WITH c AS (
  SELECT user_id, extract(hour FROM ts)::BIGINT AS hour,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id, hour, n FROM c
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY n DESC, hour) = 1
"""


# --------------------------------------------------------------------------
# Q: embedding_quant — per-dimension int8 quantization parameters


def q_embedding_quant(sf_dir: str):
    """Per-dimension min/max and int8 scale over the embedding matrix
    — the calibration table a vector-store quantizer ships (vectorized
    per-batch per-dim extrema, 64 partial rows per batch on the wire,
    narrow min/max fold). Oracle: 1-indexed list extraction against a
    dim series."""
    from edkray.ops.aggregate import grouped_agg

    ds = _read(sf_dir, "embeddings", ["embedding"])

    def _dims(b: pa.Table) -> pa.Table:
        m = np.stack(b["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        d = m.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
            "mn": pa.array(m.min(axis=0)),
            "mx": pa.array(m.max(axis=0)),
        })

    parts = ds.map_batches(_dims, batch_format="pyarrow")
    folded = grouped_agg(parts, ["dim"],
                         [("min", "mn", "mn"), ("max", "mx", "mx")])

    def _scale(b: pa.Table) -> pa.Table:
        mn = b["mn"].to_numpy(zero_copy_only=False)
        mx = b["mx"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "scale", pa.array(np.round((mx - mn) / 255.0, 6), pa.float64()))

    return folded.map_batches(_scale, batch_format="pyarrow")


_SQL_EMBEDDING_QUANT = """
WITH d AS (
  SELECT i AS dim, embedding[i]::DOUBLE AS x
  FROM embeddings, range(1, 65) t(i)
)
SELECT dim, min(x) AS mn, max(x) AS mx,
       round((max(x) - min(x)) / 255.0, 6) AS scale
FROM d GROUP BY dim
"""


# --------------------------------------------------------------------------
# Q: customer_order_counts — LEFT OUTER join keeping zero-order customers


def q_customer_order_counts(sf_dir: str):
    """Order count per customer INCLUDING customers with none (the
    left-outer completeness case an inner groupby silently drops):
    orders pre-aggregate to (custkey, n) via the combiner, then the
    native hash-partitioned left_outer join against the customer key
    column — both shuffle sides are narrow. Oracle: LEFT JOIN +
    coalesce."""
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    counts = grouped_agg(orders, ["o_custkey"], [("count", None, "n_orders")])
    j = hash_join(cust, counts, on=["c_custkey"], right_on=["o_custkey"],
                  how="left_outer")

    def _fill(b: pa.Table) -> pa.Table:
        n = b["n_orders"].to_numpy(zero_copy_only=False)
        n = np.nan_to_num(n.astype(np.float64), nan=0.0).astype(np.int64)
        return pa.table({"c_custkey": b["c_custkey"],
                         "n_orders": pa.array(n, pa.int64())})

    return j.map_batches(_fill, batch_format="pyarrow")


_SQL_CUSTOMER_ORDER_COUNTS = """
SELECT c.c_custkey, coalesce(o.n, 0)::BIGINT AS n_orders
FROM customer c
LEFT JOIN (SELECT o_custkey, count(*)::BIGINT AS n
           FROM orders GROUP BY 1) o
  ON c.c_custkey = o.o_custkey
"""


# --------------------------------------------------------------------------
# Q: daily_orders_vs_events — FULL OUTER day alignment of two streams


def q_daily_orders_vs_events(sf_dir: str):
    """Daily order counts FULL-OUTER-aligned with daily event counts —
    days present in either stream appear, the other side zero-filled
    (two combiner-narrow daily aggregates, one native full_outer hash
    join over day keys; no corpus rows move). Oracle: FULL OUTER JOIN
    + coalesce."""
    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_orderdate"])
    events = _read(sf_dir, "events", ["ts"])

    def _day(col):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                "day": pc.cast(pc.floor_temporal(b[col], unit="day"), pa.date32())
            })
        return f

    od = grouped_agg(orders.map_batches(_day("o_orderdate"),
                                        batch_format="pyarrow"),
                     ["day"], [("count", None, "n_orders")])
    ed = grouped_agg(events.map_batches(_day("ts"), batch_format="pyarrow"),
                     ["day"], [("count", None, "n_events")])
    ed = ed.map_batches(lambda b: b.rename_columns(["eday", "n_events"]),
                        batch_format="pyarrow")
    j = hash_join(od, ed, on=["day"], right_on=["eday"], how="full_outer")

    def _fill(b: pa.Table) -> pa.Table:
        import polars as pl
        # Ray's full_outer join coalesces the right key into "day"
        return (
            pl.from_arrow(b)
            .with_columns(
                pl.col("n_orders").fill_null(0).cast(pl.Int64),
                pl.col("n_events").fill_null(0).cast(pl.Int64),
            )
            .select(["day", "n_orders", "n_events"])
            .to_arrow()
        )

    return j.map_batches(_fill, batch_format="pyarrow")


_SQL_DAILY_ORDERS_VS_EVENTS = """
WITH od AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*)::BIGINT AS n_orders
  FROM orders GROUP BY 1
), ed AS (
  SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS n_events
  FROM events GROUP BY 1
)
SELECT coalesce(od.day, ed.day) AS day,
       coalesce(od.n_orders, 0)::BIGINT AS n_orders,
       coalesce(ed.n_events, 0)::BIGINT AS n_events
FROM od FULL OUTER JOIN ed ON od.day = ed.day
"""


# --------------------------------------------------------------------------
# registry


def queries() -> dict:
    # Ordering note: the correctness driver checks the FIRST 50 entries in
    # insertion order.  The window below front-loads (a) queries that never
    # had a driver row in rounds 1-4, (b) queries whose semantics changed in
    # round 5, and (c) new round-5 queries; previously-green entries follow.
    return {
        # -- (a) never driver-checked before round 5 ------------------------
        "pagerank_scores": q_pagerank,
        "robots_kept": q_robots_kept,
        "doc_chunks": q_doc_chunks,
        "inlink_counts": q_inlink_counts,
        "anchor_texts": q_anchor_texts,
        "snapshot_diff": q_snapshot_diff,
        "quarantine_counts": q_quarantine_counts,
        "approx_quantiles": q_approx_quantiles,
        "jsonl_scan": q_jsonl_scan,
        "cooc_pairs": q_cooc_pairs,
        "pmi_pairs": q_pmi_pairs,
        "domain_rollup": q_domain_rollup,
        "embedding_stats": q_embedding_stats,
        "embedding_cov": q_embedding_cov,
        "pca_scores": q_pca_scores,
        "mahalanobis": q_mahalanobis,
        "lang_centroids": q_lang_centroids,
        "zscore_embeddings": q_zscore_embeddings,
        "random_projection": q_random_projection,
        "group_split": q_group_split,
        "web_ingest": q_web_ingest,
        "warclike_scan": q_warclike_scan,
        "gzip_decode": q_gzip_decode,
        "ccnet_buckets": q_ccnet_buckets,
        "packed_sequences": q_packed_sequences,
        "lm_scores": q_lm_scores,
        "curation": q_curation,
        "dedup_clusters": q_dedup_clusters,
        "paragraph_dedup": q_paragraph_dedup,
        # -- (b) semantics/harness changed in round 5 -----------------------
        "semdedup": q_semdedup,
        "minhash_jaccard_pairs": q_minhash_jaccard_pairs,
        "ivf_topk": q_ivf_topk,
        # -- (c) new round-5 queries ----------------------------------------
        "transform_points": q_transform_points,
        "resample_read": q_resample_read,
        "page_titles": q_page_titles,
        "recrawl_priority": q_recrawl_priority,
        "triangle_count": q_triangle_count,
        "image_stats": q_image_stats,
        "audio_features": q_audio_features,
        "domain_dup_rate": q_domain_dup_rate,
        "bpe_merges": q_bpe_merges,
        "linear_fit": q_linear_fit,
        "cell_neighborhood": q_cell_neighborhood,
        "tfidf_terms": q_tfidf_terms,
        "radius_pairs": q_radius_pairs,
        "spatial_clusters": q_spatial_clusters,
        "user_ewma": q_user_ewma,
        "weighted_orders": q_weighted_orders,
        "ntile_orders": q_ntile_orders,
        "rollup_lineitem": q_rollup_lineitem,
        "mode_event_type": q_mode_event_type,
        "skyline_orders": q_skyline_orders,
        "idw_grid": q_idw_grid,
        "flag_quartiles": q_flag_quartiles,
        "typo_pairs": q_typo_pairs,
        "funnel_steps": q_funnel_steps,
        "user_gaps": q_user_gaps,
        "running_totals": q_running_totals,
        "user_type_pivot": q_user_type_pivot,
        "vocab_overlap": q_vocab_overlap,
        "vocab_only_docs": q_vocab_only_docs,
        "price_histogram": q_price_histogram,
        "above_avg_orders": q_above_avg_orders,
        "region_nations": q_region_nations,
        "user_trajectories": q_user_trajectories,
        # -- last driver row in rounds 1-3 ----------------------------------
        "bbox_customers": q_bbox_customers,
        "catalog": q_catalog,
        "mercator_customers": q_mercator_customers,
        "scaled_quantity": q_scaled_quantity,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        # -- below the driver's 50-query window (green in earlier rounds) ----
        "users_per_type": q_users_per_type,
        "approx_users_per_type": q_approx_users_per_type,
        "suppliers_by_nation": q_suppliers_by_nation,
        "top_orders_per_priority": q_top_orders_per_priority,
        "customers_without_orders": q_customers_without_orders,
        "lsh_embedding_pairs": q_lsh_embedding_pairs,
        "fingerprints": q_fingerprints,
        "s2_cells": q_s2_cells,
        "hex_cells": q_hex_cells,
        "sample_orders": q_sample_orders,
        "cosine_dup_pairs": q_cosine_dup_pairs,
        # -- green in CORRECTNESS_r04 (past the 50-query window) ------------
        "pricing_summary": q_pricing_summary,
        "region_rollup": q_region_rollup,
        "top_revenue_orders": q_top_revenue_orders,
        "daily_events": q_daily_events,
        "pushdown_daily": q_pushdown_daily,
        "sessionize_events": q_sessionize,
        "sliding_windows": q_sliding_windows,
        "dedup_lineitem_first": q_dedup_lineitem_first,
        "distinct_flags": q_distinct_flags,
        "asof_orders": q_asof_orders,
        "asof_orders_large": q_asof_orders_large,
        "asof_keyless": q_asof_keyless,
        "interp_orders": q_interp_orders,
        "interp_orders_large": q_interp_orders_large,
        "stack_read": q_stack_read,
        "overview_pyramid": q_overview_pyramid,
        "tile_overlay": q_tile_overlay,
        "cells_histogram": q_cells_histogram,
        "tile_counts": q_tile_counts,
        "tile_rank": q_tile_rank,
        "pip_admin": q_pip_admin,
        "spatial_flagship": q_spatial_flagship,
        "knn_parts": q_knn_parts,
        "token_stats": q_token_stats,
        "bpe_tokens": q_bpe_tokens,
        "quality_by_source": q_quality_by_source,
        "langid": q_langid,
        "repetition_stats": q_repetition_stats,
        "contamination": q_contamination,
        "stratified_sample": q_stratified_sample,
        "length_quantiles": q_length_quantiles,
        "pii_scrub": q_pii_scrub,
        "html_extract": q_html_extract,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "embedding_topk": q_embedding_topk,
        "kmeans_clusters": q_kmeans_clusters,
        "cluster_sample": q_cluster_sample,
        "bm25_topk": q_bm25_topk,
        "dsir_scores": q_dsir_scores,
        "temperature_mix": q_temperature_mix,
        "dsir_resample": q_dsir_resample,
        "dup_spans": q_dup_spans,
        "window_events": q_window_events,
        "shuffle_shards": q_shuffle_shards,
        "heavy_hitters": q_heavy_hitters,
        "normalized_dedup": q_normalized_dedup,
        "incremental_dedup": q_incremental_dedup,
        "url_canon": q_url_canon,
        "gopher_quality": q_gopher_quality,
        # -- post-deadline round-5 additions (beyond the driver window) ------
        "hits_scores": q_hits_scores,
        "zonal_stats": q_zonal_stats,
        "event_transitions": q_event_transitions,
        "flag_price_corr": q_flag_price_corr,
        "cube_orders": q_cube_orders,
        "bfs_hops": q_bfs_hops,
        "fetch_windows": q_fetch_windows,
        "activity_streaks": q_activity_streaks,
        "user_entropy": q_user_entropy,
        "priority_status_chisq": q_priority_status_chisq,
        "rank_ties_orders": q_rank_ties_orders,
        "type_user_jaccard": q_type_user_jaccard,
        "source_lang_kl": q_source_lang_kl,
        "inverted_index": q_inverted_index,
        "daily_dense": q_daily_dense,
        "gap_autocorr": q_gap_autocorr,
        "weighted_median_price": q_weighted_median_price,
        "gini_orders": q_gini_orders,
        "genmeans_quantity": q_genmeans_quantity,
        "hourly_profile": q_hourly_profile,
        "benford_digits": q_benford_digits,
        "bearing_sectors": q_bearing_sectors,
        "mad_quantity": q_mad_quantity,
        "acctbal_percent_rank": q_acctbal_percent_rank,
        "lang_ttr": q_lang_ttr,
        "top_tokens_per_lang": q_top_tokens_per_lang,
        "monthly_growth": q_monthly_growth,
        "abc_parts": q_abc_parts,
        "cohort_retention": q_cohort_retention,
        "new_user_rate": q_new_user_rate,
        "winsorized_price": q_winsorized_price,
        "peak_hour": q_peak_hour,
        "embedding_quant": q_embedding_quant,
        "customer_order_counts": q_customer_order_counts,
        "daily_orders_vs_events": q_daily_orders_vs_events,
    }


def oracle_sql() -> dict:
    return {
        "pricing_summary": _SQL_PRICING,
        "region_rollup": _SQL_REGION,
        "top_revenue_orders": _SQL_TOP_REVENUE,
        "daily_events": _SQL_DAILY,
        "pushdown_daily": _SQL_PUSHDOWN_DAILY,
        "sessionize_events": _SQL_SESSION,
        "sliding_windows": _SQL_SLIDING,
        "dedup_lineitem_first": _SQL_DEDUP_LI,
        "distinct_flags": _SQL_DISTINCT,
        "asof_orders": _SQL_ASOF,
        "interp_orders": _SQL_INTERP,
        "interp_orders_large": _SQL_INTERP,
        "stack_read": _SQL_STACK,
        # large-large path, same semantics → same oracle
        "asof_orders_large": _SQL_ASOF,
        "asof_keyless": _SQL_ASOF_KEYLESS,
        # each level recomputed from base in SQL (sum associative)
        "overview_pyramid": _sql_pyramid(8, 5),
        "tile_overlay": _SQL_OVERLAY,
        "cells_histogram": _SQL_CELLS,
        "tile_counts": _SQL_TILES,
        "tile_rank": _SQL_TILE_RANK,
        "pip_admin": _sql_pip(),
        "spatial_flagship": _sql_spatial_flagship(),
        "knn_parts": _SQL_KNN,
        "token_stats": _SQL_TOKENS,
        # rust-regex / RE2-pinned GPT-2-ish pre-tokenizer pattern
        "bpe_tokens": _SQL_BPE_TOKENS,
        "quality_by_source": _SQL_QUALITY,
        "langid": _sql_langid(),
        "repetition_stats": _SQL_REPETITION,
        "contamination": _SQL_CONTAMINATION,
        "stratified_sample": _SQL_STRATIFIED,
        "length_quantiles": _SQL_LENGTH_QUANTILES,
        "pii_scrub": _sql_pii(),
        "html_extract": _sql_html_extract(),
        "ngram_jaccard_pairs": _SQL_JACCARD,
        "embedding_topk": _SQL_EMB_TOPK,
        # same Lloyd iterations replayed CTE-by-CTE in DuckDB
        "kmeans_clusters": _sql_kmeans(4, 2),
        # kmeans oracle wrapped with the Knuth-hash stratified rank
        "cluster_sample": _sql_cluster_sample(4, 2, 30),
        # kmeans replay + within-cluster pairwise-cosine prune
        "semdedup": _sql_semdedup(4, 2, 0.95),
        # same split-tokenization, idf and saturation formula in SQL
        "bm25_topk": _sql_bm25(10),
        # identical polyhash-mod-64 bucketing + smoothing replayed in SQL
        "dsir_scores": _sql_dsir(64, 1.0),
        # same pow/floor quota + Knuth-hash window rank in SQL
        "temperature_mix": _sql_temperature_mix(150, 0.5),
        # dsir SQL composed with the identical hash-seeded Gumbel key
        "dsir_resample": _sql_dsir_resample(100),
        # same 32-char grams by substr, grouped on the gram string
        "dup_spans": _SQL_DUP_SPANS,
        # ts BETWEEN the same literal window bounds
        "window_events": _SQL_WINDOW_EVENTS,
        # row_number over the same Knuth-hash order
        "shuffle_shards": _sql_shuffle_shards(64),
        # exact count > n/(k+1): sketch affects work, never the result
        "heavy_hitters": _sql_heavy_hitters(30),
        # pinned normalizer regexes + first-by-id window in SQL
        "normalized_dedup": _SQL_NORMALIZED_DEDUP,
        "incremental_dedup": _SQL_INCREMENTAL_DEDUP,
        "url_canon": _sql_url_canon(),
        "gopher_quality": _SQL_GOPHER,
        "pagerank_scores": _sql_pagerank(),
        # same 3 HITS iterations unrolled CTE-by-CTE, L1 normalization
        "hits_scores": _sql_hits(),
        # _sql_pip containment predicate + inline zonal aggregates
        "zonal_stats": _sql_zonal_stats(),
        "event_transitions": _SQL_EVENT_TRANSITIONS,
        "flag_price_corr": _SQL_FLAG_PRICE_CORR,
        "cube_orders": _SQL_CUBE_ORDERS,
        # bounded recursive-CTE closure over the same quadratic graph
        "bfs_hops": _sql_bfs_hops(),
        # running-max new-group islands replayed with SQL windows
        "fetch_windows": _SQL_FETCH_WINDOWS,
        # day − row_number() islands anchor
        "activity_streaks": _SQL_ACTIVITY_STREAKS,
        "user_entropy": _SQL_USER_ENTROPY,
        "priority_status_chisq": _SQL_PRIORITY_STATUS_CHISQ,
        "rank_ties_orders": _SQL_RANK_TIES_ORDERS,
        "type_user_jaccard": _SQL_TYPE_USER_JACCARD,
        "source_lang_kl": _SQL_SOURCE_LANG_KL,
        "inverted_index": _SQL_INVERTED_INDEX,
        "daily_dense": _SQL_DAILY_DENSE,
        "gap_autocorr": _SQL_GAP_AUTOCORR,
        "weighted_median_price": _SQL_WEIGHTED_MEDIAN_PRICE,
        "gini_orders": _SQL_GINI_ORDERS,
        "genmeans_quantity": _SQL_GENMEANS_QUANTITY,
        "hourly_profile": _SQL_HOURLY_PROFILE,
        "benford_digits": _SQL_BENFORD_DIGITS,
        "bearing_sectors": _SQL_BEARING_SECTORS,
        "mad_quantity": _SQL_MAD_QUANTITY,
        "acctbal_percent_rank": _SQL_ACCTBAL_PERCENT_RANK,
        "lang_ttr": _SQL_LANG_TTR,
        "top_tokens_per_lang": _SQL_TOP_TOKENS_PER_LANG,
        "monthly_growth": _SQL_MONTHLY_GROWTH,
        "abc_parts": _SQL_ABC_PARTS,
        "cohort_retention": _SQL_COHORT_RETENTION,
        "new_user_rate": _SQL_NEW_USER_RATE,
        "winsorized_price": _SQL_WINSORIZED_PRICE,
        "peak_hour": _SQL_PEAK_HOUR,
        "embedding_quant": _SQL_EMBEDDING_QUANT,
        "customer_order_counts": _SQL_CUSTOMER_ORDER_COUNTS,
        "daily_orders_vs_events": _SQL_DAILY_ORDERS_VS_EVENTS,
        "robots_kept": _SQL_ROBOTS,
        "doc_chunks": _SQL_DOC_CHUNKS,
        "inlink_counts": _SQL_INLINK_COUNTS,
        "anchor_texts": _sql_anchor_texts(),
        "snapshot_diff": _SQL_SNAPSHOT_DIFF,
        "quarantine_counts": _sql_quarantine(),
        "approx_quantiles": _SQL_APPROX_QUANTILES,
        "page_titles": _SQL_PAGE_TITLES,
        "recrawl_priority": _SQL_RECRAWL_PRIORITY,
        "triangle_count": _SQL_TRIANGLE_COUNT,
        "image_stats": _SQL_IMAGE_STATS,
        "audio_features": _SQL_AUDIO_FEATURES,
        "jsonl_scan": _SQL_JSONL_SCAN,
        "cooc_pairs": _sql_cooc(),
        "pmi_pairs": _sql_pmi(),
        "domain_rollup": _sql_domain_rollup(),
        "embedding_stats": _SQL_EMBEDDING_STATS,
        "embedding_cov": _SQL_EMBEDDING_COV,
        "lang_centroids": _SQL_LANG_CENTROIDS,
        "zscore_embeddings": _SQL_ZSCORE_EMBEDDINGS,
        "random_projection": _sql_random_projection(),
        "group_split": _SQL_GROUP_SPLIT,
        "web_ingest": _sql_web_ingest(),
        "warclike_scan": _SQL_WARCLIKE,
        "gzip_decode": _SQL_GZIP_DECODE,
        # lm oracle + quantile_disc terciles + same bucket rule
        "ccnet_buckets": _sql_ccnet_buckets(30),
        # shuffle-shard SQL + per-shard window prefix sum
        "packed_sequences": _sql_packed_sequences(64, 512),
        # same counts, pruning and stupid-backoff formula in DuckDB
        "lm_scores": _sql_lm_scores(30),
        # every stage's existing SQL mirror composed into one query
        "curation": _sql_curation(20, 0.6),
        "cosine_dup_pairs": _SQL_COS_DUP,
        "domain_dup_rate": _SQL_DOMAIN_DUP_RATE,
        "linear_fit": _SQL_LINEAR_FIT,
        "cell_neighborhood": _SQL_CELL_NEIGHBORHOOD,
        "tfidf_terms": _SQL_TFIDF,
        "radius_pairs": _SQL_RADIUS_PAIRS,
        "spatial_clusters": _SQL_SPATIAL_CLUSTERS,
        "user_ewma": _SQL_USER_EWMA,
        "weighted_orders": _SQL_WEIGHTED_ORDERS,
        "ntile_orders": _SQL_NTILE_ORDERS,
        "rollup_lineitem": _SQL_ROLLUP_LINEITEM,
        "mode_event_type": _SQL_MODE_EVENT_TYPE,
        "skyline_orders": _SQL_SKYLINE_ORDERS,
        "idw_grid": _SQL_IDW_GRID,
        "flag_quartiles": _SQL_FLAG_QUARTILES,
        "typo_pairs": _SQL_TYPO_PAIRS,
        "funnel_steps": _SQL_FUNNEL_STEPS,
        "user_gaps": _SQL_USER_GAPS,
        "running_totals": _SQL_RUNNING_TOTALS,
        "user_type_pivot": _SQL_USER_TYPE_PIVOT,
        "vocab_overlap": _SQL_VOCAB_OVERLAP,
        "vocab_only_docs": _SQL_VOCAB_ONLY_DOCS,
        "price_histogram": _SQL_PRICE_HISTOGRAM,
        "above_avg_orders": _SQL_ABOVE_AVG_ORDERS,
        "region_nations": _SQL_REGION_NATIONS,
        "user_trajectories": _SQL_USER_TRAJECTORIES,
        "bbox_customers": _SQL_BBOX,
        "catalog": _SQL_CATALOG,
        "users_per_type": _SQL_USERS_PER_TYPE,
        "suppliers_by_nation": _SQL_SUPPLIERS_BY_NATION,
        "top_orders_per_priority": _SQL_TOP_PER_PRIORITY,
        "customers_without_orders": _SQL_NO_ORDERS,
        "mercator_customers": _SQL_MERCATOR,
        # Krüger n⁶ UTM + MODIS sinusoidal series replayed term-by-term
        "transform_points": _sql_transform_points(),
        # warp index arithmetic replayed over a row_number() view
        "resample_read": _sql_resample(777),
        "scaled_quantity": _SQL_SCALED,
        "sample_orders": _SQL_SAMPLE,
        # banded LSH with exact verification: miss prob ~1.6e-5/pair →
        # output equals the exact cosine pair set on these corpora
        # (asserted by the recall test); same SQL as cosine_dup_pairs
        # minus the cosine column
        "lsh_embedding_pairs": _SQL_COS_DUP,
        # LSH candidates + exact-Jaccard verification: equals the full
        # exact pair set at threshold 0.5 (recall test asserts)
        "minhash_jaccard_pairs": _sql_jaccard(0.5),
        # recursive-CTE transitive closure over the exact J≥0.5 pairs;
        # the engine's LSH pair set equals it (q_minhash_pairs argument)
        "dedup_clusters": _SQL_DEDUP_CLUSTERS,
        # chunk-derived paragraph view mirrored verbatim in SQL
        "paragraph_dedup": _SQL_PARAGRAPH_DEDUP,
        # expression-by-expression DuckDB mirror of the aperture-7 lattice
        "hex_cells": _sql_hex_cells(),
        # exhaustive-probe IVF is exact → same oracle as embedding_topk
        "ivf_topk": _SQL_EMB_TOPK,
        # est-filtered pair set equals the exact J≥0.5 set on this corpus
        "minhash_pairs": f"SELECT id_a, id_b FROM ({_sql_jaccard(0.5)})",
        # exact counts + HLL-within-3σ boolean (out-of-bounds sketch →
        # hll_ok=false → hash mismatch)
        "approx_users_per_type": _SQL_APPROX_USERS,
        # op-by-op DuckDB SimHash + brute-force Hamming (banding is
        # pigeonhole-exact at ham≤3, so sets are equal by construction)
        "simhash_pairs": _sql_simhash_pairs(3),
        # op-by-op DuckDB winnowing mirror (poly hashes, window min,
        # distinct-xor fold), bit-identical
        "fingerprints": _sql_fingerprints(),
        # recursive-CTE Hilbert walk, bit-identical to geo.s2 (3 corpora
        # + 20k random sweep)
        "s2_cells": _sql_s2_cells(10),
    }
