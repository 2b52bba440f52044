"""Driver-contract + relational operator tests (SURVEY.md §5)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"user_id", "bucket_hour", "n_detections", "crowded"}


def test_contract_shapes():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "queries() must not be empty"
    for name in oracles:
        assert name in qs, f"oracle {name} has no query"


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    """Differential check against DuckDB — mirrors the driver's t2 gate."""
    sdf = entry_mod.queries()[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(entry_mod.oracle_sql()[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    order = {c: i for i, c in enumerate(sdf.columns)}
    dorder = {c: i for i, c in enumerate(dcols)}

    def norm(rows, idx):
        return sorted(
            tuple(_cell(row[idx[c]]) for c in sorted(idx)) for row in rows
        )

    assert norm(srows, order) == norm(drows, dorder)


def _cell(v):
    if v is None:
        return "\x00"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)
