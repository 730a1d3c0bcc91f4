"""spark-submit entry point mirroring the reference CLI.

Subcommands ≙ src/cli.cpp:26-54: pipeline, repart, count, merge,
aggregate, combine, filter, dump — plus `bench`. Run as:

    spark-submit --py-files kmtricks_spark.zip -m kmtricks_spark.cli \
        pipeline --input pages.parquet --run-dir /tmp/run1 --kmer-size 8 \
        --hard-min 2 --soft-min 3 --recurrence-min 2 --until matrix

Flag names follow Appendix A of SURVEY.md (cli.cpp:121-377 surface).
"""

from __future__ import annotations

import argparse
import json
import sys

from kmtricks_spark.config import KmConfig, get_spark


def _cfg_from(args) -> KmConfig:
    return KmConfig(
        k=args.kmer_size,
        m=args.minimizer_size,
        nb_partitions=args.nb_partitions,
        hard_min=args.hard_min,
        soft_min=args.soft_min,
        recurrence_min=args.recurrence_min,
        share_min=args.share_min,
        bloom_bits=args.bloom_size,
        bfc_width=args.bitw,
    )


def _add_common(p):
    p.add_argument("--run-dir", required=True)
    p.add_argument("--kmer-size", type=int, default=8)
    p.add_argument("--minimizer-size", type=int, default=4)
    p.add_argument("--nb-partitions", type=int, default=32)
    p.add_argument("--hard-min", type=int, default=2)
    p.add_argument("--soft-min", type=int, default=2)
    p.add_argument("--soft-min-quantile", type=float, default=None)
    p.add_argument("--recurrence-min", type=int, default=1)
    p.add_argument("--share-min", type=int, default=0)
    p.add_argument("--bloom-size", type=int, default=10_000_000)
    p.add_argument("--bitw", type=int, default=2)
    p.add_argument("--restrict-to-list", type=str, default=None,
                   help="comma-separated partition ids")
    p.add_argument("--cores", type=int, default=None)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="kmtricks-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pipe = sub.add_parser("pipeline", help="full run: counts..bloom")
    _add_common(pipe)
    pipe.add_argument("--input", required=True)
    pipe.add_argument("--until", choices=["counts", "histogram", "matrix", "pa", "bloom"])

    for stage in ("counts", "histogram", "matrix", "pa", "bloom"):
        sp = sub.add_parser(stage, help=f"run only the {stage} stage")
        _add_common(sp)
        sp.add_argument("--input", required=False)

    dump = sub.add_parser("dump", help="stage table -> stdout sample")
    dump.add_argument("--run-dir", required=True)
    dump.add_argument("--stage", required=True)
    dump.add_argument("--limit", type=int, default=20)
    dump.add_argument("--cores", type=int, default=None)

    args = ap.parse_args(argv)
    spark = get_spark(cores=args.cores)
    try:
        if args.cmd == "dump":
            df = spark.read.parquet(f"{args.run_dir}/{args.stage}")
            df.show(args.limit, truncate=False)
            return 0
        from kmtricks_spark.plans.pipeline import Pipeline

        restrict = (
            [int(x) for x in args.restrict_to_list.split(",")]
            if args.restrict_to_list
            else None
        )
        pl = Pipeline(
            spark,
            _cfg_from(args),
            args.run_dir,
            getattr(args, "input", None),
            until=(args.cmd if args.cmd != "pipeline" else args.until),
            restrict_to=restrict,
            soft_min_quantile=args.soft_min_quantile,
        )
        status = pl.run()
        print(json.dumps(status))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
