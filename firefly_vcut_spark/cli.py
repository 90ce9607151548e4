"""Command-line surface mirroring the reference CLI
(cmdline.py:34-58's transcriber / sync_archives / sync_occurrences /
search), re-hosted on the Spark pipeline:

  python -m firefly_vcut_spark.cli tick --warehouse DIR [--sf-dir DIR]
      one cron tick: discover → stream → transcribe → occurrences
      (modal/cron.py:14-21's main()).
  python -m firefly_vcut_spark.cli sync-occurrences --warehouse DIR
      [--threshold N] [--dry-run]
      stage 4 only, with the reference's --threshold / -n dry-run
      semantics (cmdline.py:222-367).
  python -m firefly_vcut_spark.cli search --doc-id N --text STR
      ad-hoc fuzzy probe of one transcript: best window + score
      (cmdline.py:477-505's search command).
  python -m firefly_vcut_spark.cli bench
      delegate to bench.py.
"""

from __future__ import annotations

import argparse
import json
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _spark():
    from firefly_vcut_spark.session import get_spark

    return get_spark("firefly_vcut_spark-cli")


def cmd_tick(args: argparse.Namespace) -> int:
    from firefly_vcut_spark.pipeline import run_pipeline

    spark = _spark()
    report = run_pipeline(spark, args.sf_dir, args.warehouse, stream_limit=args.limit)
    print(
        json.dumps(
            {
                "discovered": report.discovered,
                "streamed": report.streamed,
                "transcribed": report.transcribed,
                "occurrences": report.occurrences,
            }
        )
    )
    return 0


def cmd_sync_occurrences(args: argparse.Namespace) -> int:
    from pyspark.sql import functions as F

    from firefly_vcut_spark.operators.fuzzy import fuzzy_occurrence_scan
    from firefly_vcut_spark.pipeline import Warehouse, stage_occurrences
    from firefly_vcut_spark.sources import fixtures as fx

    spark = _spark()
    wh = Warehouse(spark, args.warehouse)
    if not wh.exists("transcripts"):
        print("no transcripts in warehouse; run `tick` first", file=sys.stderr)
        return 2
    songs = fx.songs(spark, args.sf_dir)
    if args.dry_run:
        found = fuzzy_occurrence_scan(
            wh.read("transcripts"), songs, threshold=args.threshold, id_col="archive_id"
        )
        for r in found.orderBy(F.asc("song_id"), F.asc("archive_id")).collect():
            print(
                f"[dry-run] song={r.song_id} archive={r.archive_id} "
                f"start={r.start} page={r.page} score={r.score}"
            )
        return 0
    n = stage_occurrences(wh, songs)
    print(json.dumps({"occurrences": n}))
    return 0


def cmd_backfill(args: argparse.Namespace) -> int:
    from firefly_vcut_spark.pipeline import Warehouse, backfill_occurrences
    from firefly_vcut_spark.sources import fixtures as fx

    spark = _spark()
    wh = Warehouse(spark, args.warehouse)
    if not wh.exists("transcripts"):
        print("no transcripts in warehouse; run `tick` first", file=sys.stderr)
        return 2
    n = backfill_occurrences(
        wh, fx.songs(spark, args.sf_dir), args.song_id, args.latest
    )
    print(json.dumps({"backfilled": n, "song_id": args.song_id}))
    return 0


def cmd_search(args: argparse.Namespace) -> int:
    from pyspark.sql import functions as F

    from firefly_vcut_spark.operators.fuzzy import fuzzy_occurrence_scan
    from firefly_vcut_spark.sources import fixtures as fx

    spark = _spark()
    segs = fx.segments(spark, args.sf_dir).filter(F.col("doc_id") == args.doc_id)
    if segs.isEmpty():
        print(f"no transcript for doc_id={args.doc_id}", file=sys.stderr)
        return 2
    probe = spark.createDataFrame(
        [(0, "probe", args.text)], "song_id long, title string, lyrics_fragment string"
    )
    hits = fuzzy_occurrence_scan(segs, probe, threshold=0.0).collect()
    for r in hits:
        print(f"score={r.score} start={r.start} page={r.page} seg_idx={r.seg_idx}")
    return 0


def cmd_bench(args: argparse.Namespace) -> int:
    import bench

    bench.main()
    return 0


def cmd_run(args: argparse.Namespace) -> int:
    """Run any registry query by name and print its rows as JSON lines."""
    from firefly_vcut_spark.plans import all_queries

    qs = all_queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    spark = _spark()
    for r in qs[args.name].fn(spark, args.sf_dir).collect():
        print(json.dumps(r.asDict(), default=str))
    return 0


def cmd_list(args: argparse.Namespace) -> int:
    from firefly_vcut_spark.plans import all_queries

    for name, q in all_queries().items():
        tags = ",".join(q.tags)
        print(f"{name}\t[{tags}]")
    return 0


def cmd_lint(args: argparse.Namespace) -> int:
    """Lint a registry query's executed plan for scale anti-patterns."""
    from firefly_vcut_spark.plans import all_queries
    from firefly_vcut_spark.plans.lint import lint_plan

    qs = all_queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    spark = _spark()
    findings = lint_plan(qs[args.name].fn(spark, args.sf_dir))
    for f in findings:
        print(f)
    print(json.dumps({"query": args.name, "findings": len(findings)}))
    return 0 if not findings else 1


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="firefly_vcut_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("tick", help="run one full pipeline tick")
    t.add_argument("--warehouse", required=True)
    t.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    t.add_argument("--limit", type=int, default=10)
    t.set_defaults(fn=cmd_tick)

    s = sub.add_parser("sync-occurrences", help="stage 4 only")
    s.add_argument("--warehouse", required=True)
    s.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    s.add_argument("--threshold", type=float, default=40.0)
    s.add_argument("-n", "--dry-run", action="store_true")
    s.set_defaults(fn=cmd_sync_occurrences)

    bf = sub.add_parser(
        "backfill", help="re-scan latest N transcripts for one song (force update)"
    )
    bf.add_argument("--warehouse", required=True)
    bf.add_argument("--song-id", type=int, required=True)
    bf.add_argument("--latest", type=int, default=20)
    bf.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    bf.set_defaults(fn=cmd_backfill)

    q = sub.add_parser("search", help="fuzzy-probe one transcript")
    q.add_argument("--doc-id", type=int, required=True)
    q.add_argument("--text", required=True)
    q.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    q.set_defaults(fn=cmd_search)

    b = sub.add_parser("bench", help="run the benchmark")
    b.set_defaults(fn=cmd_bench)

    r = sub.add_parser("run", help="run a registry query, print JSON rows")
    r.add_argument("name")
    r.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    r.set_defaults(fn=cmd_run)

    ls = sub.add_parser("list", help="list registry queries")
    ls.set_defaults(fn=cmd_list)

    ln = sub.add_parser("lint", help="lint a query's executed plan")
    ln.add_argument("name")
    ln.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ln.set_defaults(fn=cmd_lint)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
