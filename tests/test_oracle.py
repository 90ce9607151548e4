"""Every registry query vs its DuckDB oracle — the local mirror of the
driver's t2 correctness gate, run at sf0.001 for speed."""

from __future__ import annotations

import pytest

from firefly_vcut_spark.oracle import compare
from firefly_vcut_spark.plans import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    q = QUERIES[name]
    if q.sql is None:
        df = q.fn(spark, sf_dir)
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    res = compare(name, spark, sf_dir, q.fn, q.sql)
    assert res.ok, f"{name}: {res.detail}"


def test_all_queries_have_unique_output_columns(spark, sf_dir):
    for name, q in QUERIES.items():
        cols = q.fn(spark, sf_dir).columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate output columns {cols}"
