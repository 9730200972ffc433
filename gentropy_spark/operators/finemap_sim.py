"""Fine-mapping simulation & calibration harness.

Reference: finemapping_simulations.py — simulate GWAS z-scores from an
LD matrix with known causal variants (:187 ``SimSumStatFromLD``), run
the fine-mapper on each significant simulated locus, and score the
recovered credible sets against the planted truth (:20
``ProvideSummary``: accuracy, lead accuracy, sensitivity, false
positives). This is the calibration evidence for the SuSiE-inf / CARMA
ports: a well-calibrated fine-mapper's credible sets should contain a
causal variant at roughly their coverage level.

Differences from the reference, by design:
- Deterministic: draws come from a caller-seeded ``numpy`` Generator
  (the reference uses the global RNG), so the calibration numbers in
  tests are byte-reproducible.
- No scipy: significance is tested via ``erfc`` (χ²(1) sf of z² ==
  erfc(|z|/√2)), and the multivariate-normal draw is an explicit
  Cholesky transform.
- The LD matrix builder is included (AR(1) correlation, ρ^|i-j|) so
  the harness is self-contained; the reference slices real gnomAD LD.
"""

from __future__ import annotations

import math

import numpy as np

# GWAS genome-wide significance on the z scale: erfc(|z|/sqrt(2)) <= 5e-8.
P_SIG = 5e-8


def ar1_ld(m: int, rho: float = 0.9) -> np.ndarray:
    """AR(1)-structured LD matrix: R[i, j] = rho^|i-j| (always PSD)."""
    idx = np.arange(m)
    return rho ** np.abs(idx[:, None] - idx[None, :])


def sim_sumstats_from_ld(
    n_causal: int,
    he2_reggen: float,
    U: np.ndarray,
    n: int,
    rng: np.random.Generator,
) -> dict:
    """Simulate a GWAS z-vector with ``n_causal`` planted causals.

    Mirrors the reference math (finemapping_simulations.py:208-228):
    per-causal variance Tau = n·he2/n_causal, joint z for causals ~
    N(0, Tau), marginal mean μ = U·jz, observed GWAS z ~ N(μ, U).
    """
    m = U.shape[0]
    tau = n * he2_reggen / n_causal
    causal_idx = rng.choice(np.arange(m), size=n_causal, replace=False)
    jz = np.zeros(m)
    jz[causal_idx] = rng.normal(0.0, 1.0, size=n_causal) * math.sqrt(tau)
    mu = U @ jz
    # N(mu, U) via Cholesky (jitter for numerical PSD slack)
    chol = np.linalg.cholesky(U + 1e-10 * np.eye(m))
    z = mu + chol @ rng.normal(0.0, 1.0, size=m)
    pvals = np.array([math.erfc(abs(v) / math.sqrt(2.0)) for v in z])
    return {"Z": z, "P": pvals, "causal_idx": np.sort(causal_idx)}


def run_finemap_calibration(
    n_iter: int = 20,
    m: int = 60,
    n_causal: int = 2,
    he2_reggen: float = 0.003,
    sample_size: int = 100_000,
    rho: float = 0.9,
    seed: int = 7,
    method: str = "susie_inf",
    coverage: float = 0.99,
) -> dict:
    """Simulate → fine-map → score, ``n_iter`` times.

    Returns the reference's summary dict shape
    (finemapping_simulations.py:29-41): successful_runs, number_of_cs,
    expected_results, false_positives, accuracy, accuracy_lead,
    sensitivity — plus the per-iteration records for inspection.
    """
    from gentropy_spark.operators.susie import credible_sets, susie_inf_fit

    U = ar1_ld(m, rho)
    rng = np.random.default_rng(seed)
    records: list[dict] = []
    successful = 0
    for it in range(n_iter):
        sim = sim_sumstats_from_ld(n_causal, he2_reggen, U, sample_size, rng)
        if not (sim["P"] <= P_SIG).any():
            continue
        successful += 1
        causal = set(int(i) for i in sim["causal_idx"])
        if method == "susie_inf":
            fit = susie_inf_fit(sim["Z"], R=U, n=sample_size, L=n_causal + 3)
            sets = credible_sets(fit["PIP"], U, coverage=coverage)
            pip = fit["PIP"]
            for cs in sets:
                lead = max(cs, key=lambda i: float(np.max(pip[i])))
                records.append(
                    {
                        "iteration": it,
                        "cs_size": len(cs),
                        "is_in_x": bool(causal & set(cs)),
                        "is_in_lead": lead in causal,
                    }
                )
        elif method == "carma":
            from gentropy_spark.operators.carma_full import carma_shotgun

            fit = carma_shotgun(sim["Z"], U, num_causal=n_causal + 3)
            # CARMA yields marginal PIPs, not per-effect sets: score the
            # top-PIP prefix reaching ``coverage`` as one credible set.
            order = np.argsort(-fit["pip"], kind="stable")
            csum = np.cumsum(fit["pip"][order])
            k = int(np.searchsorted(csum, min(coverage, csum[-1] - 1e-12))) + 1
            cs = [int(i) for i in order[:k]]
            records.append(
                {
                    "iteration": it,
                    "cs_size": len(cs),
                    "is_in_x": bool(causal & set(cs)),
                    "is_in_lead": int(order[0]) in causal,
                }
            )
        else:
            raise ValueError(f"unknown method {method!r}")
    n_cs = len(records)
    n_hit = sum(r["is_in_x"] for r in records)
    n_lead = sum(r["is_in_lead"] for r in records)
    return {
        "method": method,
        "successful_runs": successful,
        "number_of_cs": n_cs,
        "expected_results": n_causal * successful,
        "false_positives": round((n_cs - n_hit) / n_cs, 6) if n_cs else None,
        "accuracy": round(n_hit / n_cs, 6) if n_cs else None,
        "accuracy_lead": round(n_lead / n_cs, 6) if n_cs else None,
        "sensitivity": round(n_hit / (n_causal * successful), 6)
        if successful
        else None,
        "records": records,
    }
