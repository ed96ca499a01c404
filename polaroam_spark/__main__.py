"""Command-line entry points — ``python -m polaroam_spark <cmd>``.

The reference ships a typer CLI stub with no commands
(reference cli.py:12-16) and drives everything from batch scripts
(reference get_stops_and_clusters.py). This CLI packages those
driver workflows:

  ingest   vendor parquet/CSV -> canonical localized pings, partitioned
  stops    pings -> stop events + per-event medians
  cluster  medians -> DBSCAN stop locations + medoids
  label    clustered stops -> home/work labels (+ wide export)

Each stage reads/writes parquet so the pipeline is restartable stage
by stage, mirroring the reference's disk-staged batch driver.
"""

from __future__ import annotations

import argparse
import sys


def _spark(args):
    from polaroam_spark import get_spark

    return get_spark(app_name=f"polaroam-{args.cmd}")


def cmd_ingest(args) -> None:
    from polaroam_spark.sources.io import (
        CSV_VENDOR_COLUMNS,
        PARQUET_VENDOR_COLUMNS,
        hash_uid,
        localize_timestamps,
        read_pings_csv,
        read_pings_parquet,
        users_with_min_days,
        write_sorted_partitioned,
    )

    spark = _spark(args)
    if args.format == "csv":
        columns = CSV_VENDOR_COLUMNS if args.vendor_columns else None
        df = read_pings_csv(
            spark, args.input, columns=columns, max_error=args.max_error
        )
    else:
        columns = PARQUET_VENDOR_COLUMNS if args.vendor_columns else None
        df = read_pings_parquet(
            spark, args.input, columns=columns, max_error=args.max_error
        )
    df = localize_timestamps(df, args.tz)
    if args.hash_uid:
        df = hash_uid(df)
    if args.min_days > 0:
        df = users_with_min_days(df, min_days=args.min_days)
    write_sorted_partitioned(df, args.output)


def cmd_stops(args) -> None:
    from polaroam_spark.api import StopDetect

    spark = _spark(args)
    model = StopDetect(
        r1=args.r1,
        min_size=args.min_size,
        min_staying_time=args.min_staying_time,
        max_time_between=args.max_time_between,
    )
    events = model.fit_predict(spark.read.parquet(args.input))
    medians = model.compute_label_medians()
    events.write.mode("overwrite").parquet(f"{args.output}/stop_events")
    medians.write.mode("overwrite").parquet(f"{args.output}/stop_medians")


def cmd_cluster(args) -> None:
    from polaroam_spark.operators.clustering import (
        attach_medoids,
        cluster_stops_dbscan,
        cluster_stops_dbscan_distributed,
    )

    spark = _spark(args)
    med = spark.read.parquet(args.input)
    if args.distributed:
        labeled = cluster_stops_dbscan_distributed(
            med, r2=args.r2,
            min_spacial_resolution=args.min_spacial_resolution,
        )
    else:
        labeled = cluster_stops_dbscan(
            med, r2=args.r2,
            min_spacial_resolution=args.min_spacial_resolution,
        )
    attach_medoids(labeled).write.mode("overwrite").parquet(args.output)


def cmd_label(args) -> None:
    from polaroam_spark.operators.homework import (
        detect_home,
        detect_work,
        home_work_wide,
        prepare_labeling,
    )

    spark = _spark(args)
    df = prepare_labeling(spark.read.parquet(args.input))
    df = detect_home(df, total_days=args.total_days)
    df = detect_work(df, total_days=args.total_days)
    df.write.mode("overwrite").parquet(f"{args.output}/labeled")
    home_work_wide(df).write.mode("overwrite").parquet(
        f"{args.output}/home_work_wide"
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="polaroam_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="vendor data -> localized pings")
    pi.add_argument("--input", required=True)
    pi.add_argument("--output", required=True)
    pi.add_argument("--format", choices=["parquet", "csv"], default="parquet")
    pi.add_argument("--vendor-columns", action="store_true")
    pi.add_argument("--tz", default="UTC")
    pi.add_argument("--max-error", type=float, default=20.0)
    pi.add_argument("--hash-uid", action="store_true")
    pi.add_argument("--min-days", type=int, default=0)
    pi.set_defaults(fn=cmd_ingest)

    ps = sub.add_parser("stops", help="pings -> stop events + medians")
    ps.add_argument("--input", required=True)
    ps.add_argument("--output", required=True)
    ps.add_argument("--r1", type=float, default=10.0)
    ps.add_argument("--min-size", type=int, default=2)
    ps.add_argument("--min-staying-time", type=int, default=300)
    ps.add_argument("--max-time-between", type=int, default=86400)
    ps.set_defaults(fn=cmd_stops)

    pc = sub.add_parser("cluster", help="medians -> stop locations")
    pc.add_argument("--input", required=True)
    pc.add_argument("--output", required=True)
    pc.add_argument("--r2", type=float, default=10.0)
    pc.add_argument("--min-spacial-resolution", type=float, default=0.0)
    pc.add_argument("--distributed", action="store_true")
    pc.set_defaults(fn=cmd_cluster)

    pl = sub.add_parser("label", help="clustered stops -> home/work")
    pl.add_argument("--input", required=True)
    pl.add_argument("--output", required=True)
    pl.add_argument("--total-days", type=int, default=30)
    pl.set_defaults(fn=cmd_label)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
