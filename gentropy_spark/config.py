"""Typed per-step configuration schemas for the DAG runner.

The reference registers a typed dataclass config per step and lets
Hydra validate it before execution
(/root/reference/src/gentropy/config.py:1-893). This module is the
dependency-free counterpart: each parameterizable step declares a
``Param`` schema (type, default, bounds, choices); ``validate_config``
checks a pipeline JSON against it BEFORE any Spark work and reports
every violation with a full field path (``steps.clump.params.window``),
and ``resolve_step`` turns a validated step into the (spark, sf_dir)
callable the runner executes — the registry query for plain steps, a
parameter-bound operator closure for parameterized ones.

Steps without a schema accept no params (a supplied param is a config
error, mirroring Hydra's strict struct mode).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Param:
    """One typed step parameter: type, default, optional bounds/choices."""

    type: type
    default: Any
    min: float | None = None
    max: float | None = None
    choices: tuple[Any, ...] | None = None

    def check(self, value: Any, path: str) -> list[str]:
        errs: list[str] = []
        # bool is an int subclass — reject it for numeric params.
        if self.type in (int, float) and isinstance(value, bool):
            errs.append(f"{path}: expected {self.type.__name__}, got bool")
            return errs
        if self.type is float and isinstance(value, int):
            value = float(value)
        if not isinstance(value, self.type):
            errs.append(
                f"{path}: expected {self.type.__name__}, "
                f"got {type(value).__name__}"
            )
            return errs
        if self.min is not None and value < self.min:
            errs.append(f"{path}: {value!r} < min {self.min!r}")
        if self.max is not None and value > self.max:
            errs.append(f"{path}: {value!r} > max {self.max!r}")
        if self.choices is not None and value not in self.choices:
            errs.append(f"{path}: {value!r} not in {list(self.choices)!r}")
        return errs


def _clump_params() -> dict[str, Param]:
    from gentropy_spark.plans.genomics import CLUMP_WINDOW_US, SIGNIF_MIN

    return {
        "window": Param(int, CLUMP_WINDOW_US, min=1),
        "min_signif": Param(float, SIGNIF_MIN, min=0.0),
    }


def _locus_breaker_params() -> dict[str, Param]:
    from gentropy_spark.plans.genomics import (
        LB_BASELINE,
        LB_DIST_US,
        LB_FLANK_US,
        LB_LEAD,
    )

    return {
        "baseline_signif": Param(float, LB_BASELINE, min=0.0),
        "distance_cutoff": Param(int, LB_DIST_US, min=1),
        "lead_signif": Param(float, LB_LEAD, min=0.0),
        "flank": Param(int, LB_FLANK_US, min=0),
    }


def _minhash_params() -> dict[str, Param]:
    from gentropy_spark.plans.llm_pipeline import (
        MINHASH_BANDS,
        MINHASH_NUM_HASHES,
    )

    return {
        "num_hashes": Param(int, MINHASH_NUM_HASHES, min=2, max=512),
        "bands": Param(int, MINHASH_BANDS, min=1, max=128),
        "min_jaccard": Param(float, 0.2, min=0.0, max=1.0),
    }


def _ivf_params() -> dict[str, Param]:
    from gentropy_spark.plans.llm_pipeline import IVF_N_CENTROIDS, IVF_N_PROBE

    return {
        "n_centroids": Param(int, IVF_N_CENTROIDS, min=1),
        "n_probe": Param(int, IVF_N_PROBE, min=1),
        "k": Param(int, 5, min=1),
    }


def _pics_params() -> dict[str, Param]:
    from gentropy_spark.plans.genomics import PICS_TAU

    return {"tau": Param(int, PICS_TAU, min=1)}


# Parameterizable steps: query key -> lazy schema factory. Lazy so that
# importing this module never triggers the plan-module import chain.
STEP_PARAM_SCHEMAS: dict[str, Callable[[], dict[str, Param]]] = {
    "window_clump_leads": _clump_params,
    "locus_breaker": _locus_breaker_params,
    "dedup_minhash_lsh": _minhash_params,
    "ann_ivf_topk": _ivf_params,
    "pics_finemap": _pics_params,
}


def _bind_params(query: str, params: dict[str, Any]) -> Callable[
    [SparkSession, str], DataFrame
]:
    """Parameter-bound operator closure for a parameterized step."""
    if query == "window_clump_leads":

        def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
            from gentropy_spark.operators.clumping import window_clump
            from gentropy_spark.plans.genomics import sumstats

            return window_clump(
                sumstats(spark, sf_dir),
                window=params["window"],
                min_signif=params["min_signif"],
            )

        return fn
    if query == "locus_breaker":

        def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
            from gentropy_spark.operators.clumping import locus_breaker
            from gentropy_spark.plans.genomics import sumstats

            return locus_breaker(
                sumstats(spark, sf_dir),
                baseline_signif=params["baseline_signif"],
                distance_cutoff=params["distance_cutoff"],
                lead_signif=params["lead_signif"],
                flank=params["flank"],
            )

        return fn
    if query == "dedup_minhash_lsh":

        def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
            from gentropy_spark.operators.dedup import minhash_lsh_pairs
            from gentropy_spark.sources.readers import read_table

            return minhash_lsh_pairs(
                read_table(spark, sf_dir, "documents"),
                num_hashes=params["num_hashes"],
                bands=params["bands"],
                min_jaccard=params["min_jaccard"],
            )

        return fn
    if query == "ann_ivf_topk":

        def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
            from pyspark.sql import functions as F

            from gentropy_spark.operators.similarity import ivf_topk
            from gentropy_spark.plans.llm_pipeline import EMB_DIM
            from gentropy_spark.sources.readers import read_table

            emb = read_table(spark, sf_dir, "embeddings")
            queries = emb.filter(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("vec"),
            )
            corpus = emb.filter(F.col("vec_id") >= 10).select(
                F.col("vec_id").alias("corpus_id"),
                F.col("embedding").alias("vec"),
            )
            return ivf_topk(
                queries,
                corpus,
                n_centroids=params["n_centroids"],
                n_probe=params["n_probe"],
                k=params["k"],
                dim=EMB_DIM,
            )

        return fn
    if query == "pics_finemap":

        def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
            from pyspark.sql import functions as F

            from gentropy_spark.operators.clumping import _cluster_seq
            from gentropy_spark.operators.finemapping import pics
            from gentropy_spark.plans.genomics import (
                CLUMP_WINDOW_US,
                SIGNIF_MIN,
                sumstats,
            )

            ss = sumstats(spark, sf_dir).filter(F.col("signif") >= SIGNIF_MIN)
            clustered = _cluster_seq(
                ss, "study_id", "contig", "pos", "point_id", CLUMP_WINDOW_US
            )
            return pics(clustered, tau=params["tau"])

        return fn
    raise ValueError(f"no parameter binding for {query!r}")  # pragma: no cover


def validate_config(cfg: Any) -> list[str]:
    """Validate a pipeline config dict; returns ALL errors (field paths).

    Checks the global shape (sf_dir/out_dir/steps), each step's query
    against the registry, dependency names, and every supplied param
    against the step's typed schema (unknown params and params on
    schema-less steps are errors — Hydra strict-struct behavior).
    """
    errs: list[str] = []
    if not isinstance(cfg, dict):
        return ["config: expected object"]
    for key, typ in (("sf_dir", str), ("out_dir", str)):
        if key in cfg and not isinstance(cfg[key], typ):
            errs.append(f"{key}: expected {typ.__name__}")
    steps = cfg.get("steps")
    if not isinstance(steps, dict) or not steps:
        errs.append("steps: expected non-empty object")
        return errs

    from gentropy_spark.plans import full_registry

    registry = full_registry()
    for name, step in steps.items():
        path = f"steps.{name}"
        if not isinstance(step, dict):
            errs.append(f"{path}: expected object")
            continue
        unknown_keys = set(step) - {"query", "after", "params"}
        if unknown_keys:
            errs.append(f"{path}: unknown keys {sorted(unknown_keys)}")
        query = step.get("query")
        if not isinstance(query, str) or query not in registry:
            errs.append(f"{path}.query: unknown query {query!r}")
            continue
        after = step.get("after", [])
        if not isinstance(after, list) or not all(
            isinstance(a, str) for a in after
        ):
            errs.append(f"{path}.after: expected list of step names")
        else:
            for a in after:
                if a not in steps:
                    errs.append(f"{path}.after: unknown step {a!r}")
        params = step.get("params", {})
        if not isinstance(params, dict):
            errs.append(f"{path}.params: expected object")
            continue
        schema = (
            STEP_PARAM_SCHEMAS[query]() if query in STEP_PARAM_SCHEMAS else {}
        )
        for pname, pval in params.items():
            if pname not in schema:
                known = sorted(schema) if schema else "none (step takes no params)"
                errs.append(f"{path}.params.{pname}: unknown param; known: {known}")
                continue
            errs.extend(schema[pname].check(pval, f"{path}.params.{pname}"))
    return errs


def resolve_step(
    query: str, params: dict[str, Any]
) -> Callable[[SparkSession, str], DataFrame]:
    """Validated step -> executable (defaults filled for omitted params)."""
    from gentropy_spark.plans import full_registry

    if query in STEP_PARAM_SCHEMAS:
        schema = STEP_PARAM_SCHEMAS[query]()
        bound = {
            k: (
                float(params[k])
                if p.type is float and k in params
                else params.get(k, p.default)
            )
            for k, p in schema.items()
        }
        if params:
            return _bind_params(query, bound)
    return full_registry()[query].fn
