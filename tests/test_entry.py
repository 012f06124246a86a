"""Driver-contract test: every queries() entry runs at sf0.001; every
SQL-expressible one matches its oracle_sql() via DuckDB — the same gate
the driver applies (row count + sorted-column schema + values)."""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as E

    return E.queries(), E.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    from edkray.queries import _TABLES

    c = duckdb.connect()
    for t in _TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return c


def _names():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from edkray.queries import queries

    return sorted(queries())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(name, contract, con, sf_dir):
    from tools.selfcheck import compare, to_pandas

    qs, oracles = contract
    ray_df = to_pandas(qs[name](sf_dir))
    assert ray_df is not None
    if name not in oracles:
        assert len(ray_df) >= 0  # rows-only contract
        return
    sql_df = con.execute(oracles[name]).fetchdf()
    problems = compare(name, ray_df, sql_df)
    assert not problems, problems
