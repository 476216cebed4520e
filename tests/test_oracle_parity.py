"""Driver-style oracle parity: run every ``queries()`` entry at sf0.001 and
compare against its DuckDB ``oracle_sql()`` — row count, column names, and an
order-insensitive value comparison — mirroring the graft driver's
CORRECTNESS gate so mismatches surface in pytest first."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


@pytest.fixture(scope="module")
def registry(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


def _checked_names():
    from elastiknn_ray.pipelines.queries import ORACLE_SQL

    return sorted(ORACLE_SQL.keys())


@pytest.mark.parametrize("name", _checked_names())
def test_query_matches_oracle(registry, name):
    queries, oracles = registry
    got = _normalize(_to_df(queries[name](SF)))
    want = _normalize(_duck(oracles[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            pd.testing.assert_series_equal(
                a.astype(float), b.astype(float), check_names=False, atol=0, rtol=0
            )
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), f"{name}.{c}"


def test_rows_only_queries_run(registry):
    queries, oracles = registry
    for name in sorted(set(queries) - set(oracles)):
        df = _to_df(queries[name](SF))
        assert df is not None
        assert set(df.columns), name


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = _to_df(e.entry())
    assert list(df.columns) == ["doc_id", "cluster_id"]
