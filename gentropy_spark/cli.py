"""CLI step runner — the engine's counterpart of gentropy's step CLI.

Re-expresses the reference's Hydra-driven step execution
(/root/reference/src/gentropy/cli.py + config.py step registry) as a
plain argparse interface over the query registry:

    python -m gentropy_spark.cli list
    python -m gentropy_spark.cli run window_clump_leads \
        --sf-dir /root/testdata/sf0.01 --out /tmp/out.parquet
    python -m gentropy_spark.cli dag --config pipeline.json [--dry-run]

``run`` executes one registry query and writes parquet (or prints a
sample with --show). ``dag`` executes a CONFIGURED PIPELINE: the JSON
config declares steps with dependencies; steps run in deterministic
topological order (alphabetical among ready steps), each writing one
parquet output — the role of the reference's config.py:1-893 step DAG
without the Hydra dependency:

    {"sf_dir": "/root/testdata/sf0.01",
     "out_dir": "/tmp/pipeline_out",
     "steps": {
       "clump":  {"query": "window_clump_leads"},
       "pics":   {"query": "pics_finemap", "after": ["clump"]},
       "scored": {"query": "l2g_score_gbm", "after": ["clump"]}}}

Each step is pure (reads tables, writes one output), exactly the
reference's step contract; re-running a completed DAG is idempotent
(overwrite mode). Users migrating an existing Hydra YAML translate it
with ``python -m gentropy_spark.hydra_compat pipeline.yaml`` (all 36
reference step names map to registry keys — see hydra_compat.py).
"""

from __future__ import annotations

import argparse
import json
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

    dag = sub.add_parser("dag", help="run a configured step DAG")
    dag.add_argument("--config", required=True, help="pipeline JSON path")
    dag.add_argument(
        "--dry-run",
        action="store_true",
        help="print the execution order without running",
    )
    return p


def topo_order(steps: dict[str, dict]) -> list[str]:
    """Deterministic topological order (alphabetical among ready steps).

    Raises ValueError on unknown dependencies or cycles.
    """
    deps = {name: set(cfg.get("after", [])) for name, cfg in steps.items()}
    for name, ds in deps.items():
        unknown = ds - deps.keys()
        if unknown:
            raise ValueError(f"step {name!r} depends on unknown {sorted(unknown)}")
    order: list[str] = []
    done: set[str] = set()
    while len(order) < len(deps):
        ready = sorted(
            n for n in deps if n not in done and deps[n] <= done
        )
        if not ready:
            remaining = sorted(set(deps) - done)
            raise ValueError(f"dependency cycle among {remaining}")
        order.append(ready[0])
        done.add(ready[0])
    return order


def run_dag(config_path: str, dry_run: bool = False) -> list[str]:
    """Execute (or plan) the configured pipeline; returns step order.

    The config is validated against the typed per-step schemas
    (gentropy_spark/config.py — the reference's Hydra step configs)
    BEFORE any Spark work; a bad config fails with every violation's
    field path.
    """
    from gentropy_spark.config import resolve_step, validate_config

    with open(config_path) as fh:
        cfg = json.load(fh)
    errors = validate_config(cfg)
    if errors:
        raise ValueError("invalid config:\n  " + "\n  ".join(errors))
    steps = cfg["steps"]
    order = topo_order(steps)
    if dry_run:
        return order

    from gentropy_spark.session import get_session, release_caches

    spark = get_session(app_name="gentropy_spark.dag")
    sf_dir = cfg.get(
        "sf_dir", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    out_dir = cfg["out_dir"]
    for name in order:
        step = steps[name]
        fn = resolve_step(step["query"], step.get("params", {}))
        out = os.path.join(out_dir, name)
        fn(spark, sf_dir).write.mode("overwrite").parquet(out)
        release_caches()
        print(f"step {name} ({step['query']}) -> {out}")
    return order


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from gentropy_spark.plans import full_registry

    registry = full_registry()

    if args.cmd == "list":
        for name, spec in sorted(registry.items()):
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name}\t{kind}")
        return 0

    if args.cmd == "dag":
        try:
            order = run_dag(args.config, dry_run=args.dry_run)
        except (ValueError, KeyError, OSError) as exc:
            print(f"dag error: {exc}", file=sys.stderr)
            return 2
        if args.dry_run:
            print(" -> ".join(order))
        return 0

    if args.query == "l2g_train":
        # Training step (not a registry query): fits the deterministic
        # GBM on the extended feature matrix and writes the frozen-model
        # artifact as JSON (reference: method/l2g/trainer.py).
        from gentropy_spark.operators.l2g_trainer import train_l2g
        from gentropy_spark.session import get_session

        spark = get_session(app_name="gentropy_spark.l2g_train")
        artifact = train_l2g(spark, args.sf_dir)
        payload = json.dumps(artifact, indent=1, sort_keys=True)
        if args.out:
            with open(args.out, "w") as fh:
                fh.write(payload)
            print(f"wrote {args.out}")
        else:
            print(payload)
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
