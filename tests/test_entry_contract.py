"""Driver contract sanity: entry() smoke, queries()/oracle_sql() key
parity, and a spot oracle comparison via DuckDB (the full 35-query sweep is
tools/selfcheck.py; these keep `pytest -x -q` fast)."""

import os

import duckdb
import pytest

import __spark_entry__ as entry


def test_queries_and_oracles_align():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs)
    missing_oracle = set(qs) - set(os_)
    assert missing_oracle == set(), f"rows-only queries: {missing_oracle}"


def test_entry_returns_rows(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"route", "translation", "cnt"}


@pytest.mark.parametrize("name", ["exact_events", "pipeline_e2e", "minhash_signatures"])
def test_spot_oracle_parity(spark, testdata_dir, name):
    sdf = entry.queries()[name](spark, testdata_dir).toPandas()
    con = duckdb.connect()
    for t in ["events", "documents", "embeddings"]:
        p = f"{testdata_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    odf = con.execute(entry.oracle_sql()[name]).df()
    assert len(sdf) == len(odf)
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    assert scols == ocols
    s = sdf[scols].sort_values(scols).reset_index(drop=True)
    o = odf[ocols].sort_values(ocols).reset_index(drop=True)
    for c in scols:
        assert list(s[c].fillna("∅")) == list(o[c].fillna("∅")), c
