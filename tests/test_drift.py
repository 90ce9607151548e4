"""Drift-detection semantics (plans/drift_sql.py): the detectors must
FIRE on planted drift and stay silent on stationary data — the oracle
pair only proves engine parity, not that the statistic works."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from firefly_vcut_spark.plans.drift_sql import cusum_daily, distribution_drift

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double, user_id long"
    )


def test_distribution_drift_fires_on_planted_shift(spark):
    # AM: 50/50 click/view. PM: 90/10 — event_type drifts, the value
    # band (all rows value=10.0) and cohort mix stay identical.
    rows = []
    for i in range(100):
        rows.append((BASE + dt.timedelta(minutes=i), "click" if i % 2 == 0 else "view", 10.0, i % 8))
    for i in range(100):
        rows.append(
            (BASE + dt.timedelta(hours=13, minutes=i), "click" if i % 10 != 0 else "view", 10.0, i % 8)
        )
    out = distribution_drift(_events(spark, rows), F.hour("ts") < 12)
    tv = {r["feature"]: r["feature_tv_ppm"] for r in out.collect()}
    # event_type: AM click share 0.5 -> PM 0.9 => TV = 0.4 = 400000 ppm
    assert tv["event_type"] == 400_000
    assert tv["value_band"] == 0
    assert tv["user_cohort"] <= 4  # flooring residue only


def test_distribution_drift_counts_are_exact(spark):
    rows = [
        (BASE, "click", 49.99, 1),           # AM, band 0 (4999 cents)
        (BASE, "click", 50.00, 2),           # AM, band 1 (5000 cents)
        (BASE + dt.timedelta(hours=14), "view", 150.0, 1),  # PM, band 3
    ]
    out = {
        (r["feature"], r["bucket"]): r
        for r in distribution_drift(_events(spark, rows), F.hour("ts") < 12).collect()
    }
    assert out[("value_band", "0")]["ref_cnt"] == 1
    assert out[("value_band", "1")]["ref_cnt"] == 1
    assert out[("value_band", "3")]["cur_cnt"] == 1
    # ppm shares floor exactly: 1/2 AM => 500000
    assert out[("value_band", "0")]["ref_ppm"] == 500_000
    assert out[("value_band", "3")]["cur_ppm"] == 1_000_000


def test_cusum_flat_series_is_zero(spark):
    rows = [
        (BASE + dt.timedelta(days=d, minutes=m), "click", 10.0, 1)
        for d in range(10)
        for m in range(3)
    ]
    out = cusum_daily(_events(spark, rows)).collect()
    assert len(out) == 10
    assert all(int(r["cusum_num"]) == 0 for r in out)


def test_cusum_argmax_at_planted_changepoint(spark):
    # days 0-9 at 100 cents/day, days 10-19 at 300 cents/day: the
    # level shift is after day index 9 — |CUSUM| peaks exactly there.
    rows = [
        (BASE + dt.timedelta(days=d), "click", 1.0 if d < 10 else 3.0, 1)
        for d in range(20)
    ]
    out = sorted(cusum_daily(_events(spark, rows)).collect(), key=lambda r: r["day"])
    peak_day = max(out, key=lambda r: abs(int(r["cusum_num"])))["day"]
    assert peak_day == "2024-01-10"
    # exact numerator at the peak: k=10, cum=1000, N=20, T=4000
    # => 1000*20 - 10*4000 = -20000
    assert int(out[9]["cusum_num"]) == -20_000
    # the series returns to exactly 0 at the end (telescoping identity)
    assert int(out[-1]["cusum_num"]) == 0


def test_distribution_drift_matches_python_reference(spark):
    """Randomized referee: the Spark report must equal a from-scratch
    Python computation of counts, floored ppm shares, and TV — exact
    integer semantics, not approximate agreement."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        rows = []
        for i in range(400):
            hour = rng.randrange(24)
            et = rng.choice(["click", "view", "purchase"])
            value = rng.randrange(0, 20000) / 100.0  # 2-decimal, < 200
            uid = rng.randrange(0, 32)
            rows.append(
                (BASE + dt.timedelta(hours=hour, seconds=i), et, value, uid)
            )
        out = {
            (r["feature"], r["bucket"]): r
            for r in distribution_drift(
                _events(spark, rows), F.hour("ts") < 12
            ).collect()
        }
        # python referee
        counts: dict = {}
        for ts, et, value, uid in rows:
            is_ref = ts.hour < 12
            for feat, bucket in (
                ("event_type", et),
                ("value_band", str(int(round(value * 100)) // 5000)),
                ("user_cohort", str(uid % 8)),
            ):
                c = counts.setdefault((feat, bucket), [0, 0])
                c[0 if is_ref else 1] += 1
        assert set(out) == set(counts)
        for feat in {f for f, _ in counts}:
            ref_tot = sum(c[0] for (f, _), c in counts.items() if f == feat)
            cur_tot = sum(c[1] for (f, _), c in counts.items() if f == feat)
            deltas = 0
            for (f, b), (rc, cc) in counts.items():
                if f != feat:
                    continue
                r = out[(f, b)]
                assert (r["ref_cnt"], r["cur_cnt"]) == (rc, cc)
                rppm, cppm = rc * 1_000_000 // ref_tot, cc * 1_000_000 // cur_tot
                assert (r["ref_ppm"], r["cur_ppm"]) == (rppm, cppm)
                assert r["delta_ppm"] == abs(rppm - cppm)
                deltas += abs(rppm - cppm)
            for (f, b), (rc, cc) in counts.items():
                if f == feat:
                    assert out[(f, b)]["feature_tv_ppm"] == deltas // 2
