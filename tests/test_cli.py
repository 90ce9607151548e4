"""CLI surface: tick / sync-occurrences (incl. dry-run) / search, as
a user of the reference CLI would drive them."""

from __future__ import annotations

import json
import subprocess
import sys

from firefly_vcut_spark.operators.fuzzy import fuzzy_occurrence_scan
from firefly_vcut_spark.sources import fixtures as fx


def _run(*argv: str):
    return subprocess.run(
        [sys.executable, "-m", "firefly_vcut_spark.cli", *argv],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=420,
    )


def test_cli_tick_then_sync_and_search(tmp_path):
    wh = str(tmp_path / "wh")
    r = _run("tick", "--warehouse", wh)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["streamed"] == 10
    assert report["occurrences"] > 0

    r2 = _run("sync-occurrences", "--warehouse", wh, "--dry-run", "--threshold", "90")
    assert r2.returncode == 0, r2.stderr[-2000:]
    lines = [ln for ln in r2.stdout.splitlines() if ln.startswith("[dry-run]")]
    assert all("score=" in ln for ln in lines)

    r3 = _run("search", "--doc-id", "13", "--text", "the fast key")
    assert r3.returncode == 0, r3.stderr[-2000:]
    assert "score=" in r3.stdout

    # error path: probing a doc that has no transcript
    r4 = _run("search", "--doc-id", "14", "--text", "x")
    assert r4.returncode == 2
    assert "no transcript" in r4.stderr


def test_threshold_monotonicity(spark, sf_dir):
    """SURVEY §5 property: raising the threshold only removes rows."""
    segs = fx.segments(spark, sf_dir)
    songs = fx.songs(spark, sf_dir)
    at40 = {
        (r.song_id, r.doc_id)
        for r in fuzzy_occurrence_scan(segs, songs, threshold=40).collect()
    }
    at60 = {
        (r.song_id, r.doc_id)
        for r in fuzzy_occurrence_scan(segs, songs, threshold=60).collect()
    }
    assert at60 <= at40
    assert len(at60) < len(at40)


def test_cli_list_run_lint(capsys):
    import json

    from firefly_vcut_spark.cli import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out and "corpus_prepare_manifest" in out

    assert main(["run", "a5_scalar_accumulators"]) == 0
    rows = [json.loads(line) for line in capsys.readouterr().out.splitlines()]
    assert len(rows) == 1

    assert main(["lint", "j1_join_archive_profile"]) == 0
    tail = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert tail == {"query": "j1_join_archive_profile", "findings": 0}

    assert main(["run", "nope"]) == 2
