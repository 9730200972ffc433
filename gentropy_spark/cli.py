"""CLI step runner — the engine's counterpart of gentropy's step CLI.

Re-expresses the reference's Hydra-driven step execution
(/root/reference/src/gentropy/cli.py + per-step modules) as a plain
argparse interface over the query registry:

    python -m gentropy_spark.cli list
    python -m gentropy_spark.cli run window_clump_leads \
        --sf-dir /root/testdata/sf0.01 --out /tmp/out.parquet

``run`` executes one registry query and writes parquet (or prints a
sample with --show). Chained steps are just repeated invocations —
each step is pure (reads tables, writes one output), exactly the
reference's step contract.
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gentropy_spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list available queries/steps")

    run = sub.add_parser("run", help="run one query/step")
    run.add_argument("query", help="registry key (see `list`)")
    run.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    run.add_argument("--out", help="parquet output path")
    run.add_argument("--show", type=int, default=0, help="print first N rows")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from gentropy_spark.plans import full_registry

    registry = full_registry()

    if args.cmd == "list":
        for name, spec in sorted(registry.items()):
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name}\t{kind}")
        return 0

    if args.query not in registry:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2

    from gentropy_spark.session import get_session

    spark = get_session(app_name=f"gentropy_spark.{args.query}")
    df = registry[args.query].fn(spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    if args.show:
        df.show(args.show, truncate=False)
    if not args.out and not args.show:
        print(f"rows: {df.count()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
