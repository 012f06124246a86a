"""Time / space path-template expansion + date re-parsing.

Re-implements the reference's plan-time expansion semantics
(engines/s3.py:39-221 — strftime token inference, left-inclusive date
ranges, ``{var}`` grid substitution with spatial pruning, regex date
extraction) as driver-side plan construction: the expansion product is
small (dates × cells), so it stays on the driver and feeds
``ray.data.read_parquet(paths)`` / ``from_items``.
"""

from __future__ import annotations

import datetime as dt
import itertools
import re
from dataclasses import dataclass, field

import numpy as np

from edkray.geo.pip import bbox_intersects

_STRFTIME_TOKENS = re.compile(r"%[YmjdHMS]")
# granularity implied by the finest strftime token present
_UNIT_RANK = {"%Y": 0, "%m": 1, "%j": 2, "%d": 2, "%H": 3, "%M": 4, "%S": 5}
_UNIT_DELTA = {
    0: ("year", None),
    1: ("month", None),
    2: ("day", dt.timedelta(days=1)),
    3: ("hour", dt.timedelta(hours=1)),
    4: ("minute", dt.timedelta(minutes=1)),
    5: ("second", dt.timedelta(seconds=1)),
}
_VAR_RE = re.compile(r"\{(\w+)\}")


def extract_time_tokens(template: str) -> list[str]:
    """strftime tokens present in a template (reference s3.py:57-73)."""
    return _STRFTIME_TOKENS.findall(template)


def smallest_time_unit(template: str) -> str | None:
    """Finest granularity implied by the template's tokens
    (reference ``smallest_unit``, s3.py:75-135)."""
    toks = extract_time_tokens(template)
    if not toks:
        return None
    return _UNIT_DELTA[max(_UNIT_RANK[t] for t in toks)][0]


def expand_time(template: str, start: dt.datetime, end: dt.datetime) -> list[tuple[dt.datetime, str]]:
    """Left-inclusive [start, end) date expansion at the template's own
    granularity → [(date, formatted_path)] (reference s3.py:138-181)."""
    toks = extract_time_tokens(template)
    if not toks:
        return [(dt.datetime(1970, 1, 1), template)]  # epoch sentinel, dataset.py:782-784
    rank = max(_UNIT_RANK[t] for t in toks)
    unit, delta = _UNIT_DELTA[rank]
    dates: list[dt.datetime] = []
    if unit == "year":
        dates = [dt.datetime(y, 1, 1) for y in range(start.year, end.year + 1)]
    elif unit == "month":
        y, m = start.year, start.month
        while (y, m) <= (end.year, end.month):
            dates.append(dt.datetime(y, m, 1))
            y, m = (y + 1, 1) if m == 12 else (y, m + 1)
        dates = [d for d in dates if d < end]
    else:
        # floor start to the unit, step by delta, left-inclusive
        floors = {
            "day": lambda d: d.replace(hour=0, minute=0, second=0, microsecond=0),
            "hour": lambda d: d.replace(minute=0, second=0, microsecond=0),
            "minute": lambda d: d.replace(second=0, microsecond=0),
            "second": lambda d: d.replace(microsecond=0),
        }
        cur = floors[unit](start)
        while cur < end:
            dates.append(cur)
            cur = cur + delta
    return [(d, d.strftime(template)) for d in dates]


@dataclass
class GridCell:
    """One grid cell: substitution vars + bbox (the modis.kml analogue)."""

    variables: dict[str, str]
    bbox: tuple[float, float, float, float]  # xmin, ymin, xmax, ymax


@dataclass
class ExpandResult:
    date: dt.datetime
    path: str
    variables: dict[str, str] = field(default_factory=dict)


def expand_space(
    paths: list[tuple[dt.datetime, str]],
    grid: list[GridCell],
    query_bbox: tuple[float, float, float, float] | None,
) -> list[ExpandResult]:
    """Substitute ``{var}`` placeholders with grid-cell variables,
    keeping only cells intersecting the query bbox (reference
    s3.py:183-221 — the grid semi-join)."""
    if not paths:
        return []
    varnames = set(_VAR_RE.findall(paths[0][1]))
    if not varnames:
        return [ExpandResult(d, p) for d, p in paths]
    if query_bbox is not None:
        boxes = np.array([c.bbox for c in grid])
        keep = bbox_intersects(
            boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3], *query_bbox
        )
        grid = [c for c, k in zip(grid, keep) if k]
    if not grid:
        raise ValueError("no grid cells intersect the query bbox")  # dataset.py:276-277
    out = []
    for (date, path), cell in itertools.product(paths, grid):
        missing = varnames - set(cell.variables)
        if missing:
            raise KeyError(f"grid cell missing template vars: {missing}")
        p = path
        for k, v in cell.variables.items():
            p = p.replace("{%s}" % k, v)
        out.append(ExpandResult(date, p, dict(cell.variables)))
    return out


def date_pattern(template: str) -> re.Pattern:
    """Template → regex with named groups for date re-extraction from
    concrete paths (reference s3.py:324-373)."""
    mapping = {
        "%Y": r"(?P<Y>\d{4})",
        "%m": r"(?P<m>\d{2})",
        "%d": r"(?P<d>\d{2})",
        "%j": r"(?P<j>\d{3})",
        "%H": r"(?P<H>\d{2})",
        "%M": r"(?P<M>\d{2})",
        "%S": r"(?P<S>\d{2})",
    }
    pat = re.escape(template)
    for tok, rx in mapping.items():
        pat = pat.replace(re.escape(tok), rx)
    pat = re.sub(r"\\\*", r"[^/]*", pat)
    pat = re.sub(r"\\\{\w+\\\}", r"[^/]*", pat)
    return re.compile(pat)


def parse_date(path: str, pattern: re.Pattern) -> dt.datetime | None:
    """Extract a datetime from a concrete path using a template pattern;
    day-of-year (%j) resolved like the reference (s3.py:324-373)."""
    m = pattern.search(path)
    if not m:
        return None
    g = m.groupdict()
    year = int(g.get("Y") or 1970)
    if g.get("j"):
        base = dt.datetime(year, 1, 1) + dt.timedelta(days=int(g["j"]) - 1)
        month, day = base.month, base.day
    else:
        month, day = int(g.get("m") or 1), int(g.get("d") or 1)
    return dt.datetime(
        year, month, day, int(g.get("H") or 0), int(g.get("M") or 0), int(g.get("S") or 0)
    )


def validate_wildcards(template: str) -> None:
    """Reject ``**``; allow single ``*``/``?`` (reference helpers.py:15-31)."""
    if "**" in template:
        raise ValueError("recursive wildcard ** is not supported")
