"""Banding-tuning eval: the floored-ppm S-curve math is replayed
bit-for-bit by a Python referee in BOTH engines, and the chosen-row
logic picks the cheapest candidate meeting the recall target."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from firefly_vcut_spark.plans import all_queries
from firefly_vcut_spark.plans.lsh_tuning_sql import (
    CANDIDATE_BANDINGS,
    TARGET_RECALL_PPM,
    _PPM,
    _detect_ppm_expr,
    detect_ppm_py,
)

QS = all_queries()


def test_detect_expr_matches_python_referee_in_both_engines(spark):
    """For random j_ppm values and every candidate banding, the
    generated square-and-multiply expression evaluates to EXACTLY the
    Python referee's value in DuckDB and in Spark — the bit-for-bit
    guarantee the oracle hash rests on."""
    rng = random.Random(20260816)
    js = [0, 1, _PPM, _PPM - 1] + [rng.randrange(_PPM + 1) for _ in range(40)]
    con = duckdb.connect()
    rows = spark.createDataFrame([(j,) for j in js], "j_ppm long")
    for b, r in CANDIDATE_BANDINGS:
        expect = {j: detect_ppm_py(j, b, r) for j in js}
        # DuckDB
        got_duck = dict(
            con.execute(
                f"SELECT j_ppm, {_detect_ppm_expr('j_ppm', b, r, '//')} "
                f"FROM (SELECT CAST(unnest({js!r}) AS BIGINT) AS j_ppm)"
            ).fetchall()
        )
        assert got_duck == expect, (b, r)
        # Spark
        got_spark = {
            row["j_ppm"]: row["d"]
            for row in rows.select(
                "j_ppm", F.expr(_detect_ppm_expr("j_ppm", b, r, "DIV")).alias("d")
            ).collect()
        }
        assert got_spark == expect, (b, r)


def test_detect_monotone_in_similarity():
    for b, r in CANDIDATE_BANDINGS:
        vals = [detect_ppm_py(j, b, r) for j in range(0, _PPM + 1, 50_000)]
        assert vals == sorted(vals)
        assert vals[0] == 0 and vals[-1] == _PPM


def test_chosen_row_is_cheapest_meeting_target(spark, sf_dir):
    rows = QS["dedup_lsh_band_tuning"].fn(spark, sf_dir).collect()
    assert len(rows) == len(CANDIDATE_BANDINGS)
    chosen = [r for r in rows if r["chosen"] == 1]
    meeting = [r for r in rows if r["exp_recall_ppm"] >= TARGET_RECALL_PPM]
    if meeting:
        assert len(chosen) == 1
        best = min(
            meeting,
            key=lambda r: (r["fp_at_j03_ppm"], r["num_hashes"], r["bands"]),
        )
        assert (chosen[0]["bands"], chosen[0]["rows_per_band"]) == (
            best["bands"],
            best["rows_per_band"],
        )
    else:
        assert not chosen


def test_fixed_catalog_equals_flagship_when_cap_not_binding(spark, sf_dir):
    """At gate SF (max doc_id 499) the song_id < 5000 cap selects the
    whole fixture catalog, so w1_fixed_catalog must equal the flagship
    row-for-row — the property that makes its gate-scale oracle check
    the same machinery the sfN scaling runs exercise."""
    fixed = {tuple(r) for r in QS["w1_fixed_catalog"].fn(spark, sf_dir).collect()}
    flag = {
        tuple(r)
        for r in QS["w1_flagship_occurrence_scan"].fn(spark, sf_dir).collect()
    }
    assert fixed == flag and flag
