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


def _family(name: str) -> str:
    """Query-family bucket for first-50 coverage (driver truncation
    insurance — registry._FRONT50)."""
    if name.startswith("t_"):
        return "temporal_join"
    if name.startswith("p_queue"):
        return "p"
    if name.startswith("w_"):
        return "stream_window"
    if name.startswith(("w1", "w2")):
        return name[:2]
    for fam in ("corpus", "dedup", "ann", "text", "mm", "agg", "win", "st", "set", "fjson"):
        if name.startswith(fam + "_"):
            return fam
    return name.split("_")[0].rstrip("0123456789")


def test_every_family_represented_or_fully_driver_recorded():
    """The driver records only the first 50 registry entries. A query
    family may be absent from that window ONLY if every one of its
    members is already green in a committed driver record
    (CORRECTNESS_r*.json) — so the window can rotate onto
    never-recorded names without truncation ever hiding a family the
    driver has NEVER checked. (r9: the earlier strict form — every
    family in every window — would burn 16 of 50 slots on anchors for
    fully-recorded families and push full driver coverage past r10.)"""
    import glob
    import json
    import os

    names = list(QUERIES)
    first50 = {_family(n) for n in names[:50]}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ever_green: set[str] = set()
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        for name, rec in json.load(open(f)).items():
            if rec.get("rows_match") and rec.get("err") is None:
                ever_green.add(name)
    missing = [
        n
        for n in names
        if _family(n) not in first50 and n not in ever_green
    ]
    assert not missing, (
        f"queries in families outside the first-50 window that have "
        f"never been driver-recorded green: {missing}"
    )


def test_all_queries_have_unique_output_columns(spark, sf_dir):
    for name, q in QUERIES.items():
        cols = q.fn(spark, sf_dir).columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate output columns {cols}"
