"""Ensembl Variation REST client (r9) — rsID → variant coordinates.

Mirrors the reference's datasource/ensembl/api.py:11
``fetch_coordinates_from_rsids`` (batch POST to the PUBLIC Ensembl
REST API, mapping parse, valid-chromosome filter) with one structural
change: the HTTP layer is an injectable ``transport`` callable, so
the parsing/batching logic is unit-testable offline and a retrying /
cached / mocked transport drops in without touching the parse. The
default transport posts to the public endpoint with stdlib urllib —
no third-party HTTP dependency.

Driver-side by design: the reference uses this for small curation
lists (hundreds of rsIDs), not datasets. For dataset-scale rsID
resolution use the variant-index joins (plans/variants.py H13/H57) —
hitting a public REST API from executors at 100 TB scale would be
wrong on every axis (rate limits, retries, determinism).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from typing import Any

ENSEMBL_VARIATION_URL = "https://rest.ensembl.org/variation/human"
VALID_CHROMOSOMES = frozenset(
    [str(i) for i in range(1, 23)] + ["X", "Y", "MT"]
)

Transport = Callable[[list[str]], dict[str, dict[str, Any]]]


def _default_transport(rsids: list[str]) -> dict[str, dict[str, Any]]:
    """POST one batch to the public Ensembl REST endpoint (stdlib)."""
    from urllib import request

    req = request.Request(
        ENSEMBL_VARIATION_URL,
        data=json.dumps({"ids": rsids}).encode("utf-8"),
        headers={
            "Content-Type": "application/json",
            "Accept": "application/json",
        },
        method="POST",
    )
    with request.urlopen(req) as response:  # noqa: S310 — fixed public URL
        return json.loads(response.read().decode())


def parse_variation_response(
    response: dict[str, dict[str, Any]],
) -> dict[str, list[str]]:
    """Mappings → ``chrom_pos_ref_alt`` ids, reference semantics.

    The first allele_string element is the reference allele, the rest
    are alternates (one variant id per alternate); mappings outside
    the canonical chromosome set are dropped; rsIDs with no mappings
    are omitted entirely.
    """
    out: dict[str, list[str]] = {}
    for rsid, data in response.items():
        for mapping in data.get("mappings") or []:
            chrom = mapping.get("seq_region_name")
            if chrom not in VALID_CHROMOSOMES:
                continue
            alleles = str(mapping.get("allele_string", "")).split("/")
            if len(alleles) < 2:
                continue
            ref, alts = alleles[0], alleles[1:]
            out[rsid] = [
                f"{chrom}_{mapping['start']}_{ref}_{alt}" for alt in alts
            ]
    return out


def fetch_coordinates_from_rsids(
    rsids: list[str],
    batch_size: int = 200,
    pause_time: float = 1.0,
    transport: Transport | None = None,
) -> dict[str, list[str]]:
    """Batch-resolve rsIDs to variant ids via the Ensembl REST API.

    Reference parity: datasource/ensembl/api.py:11 — same batching,
    same inter-batch pause, same error wrapping; ``transport``
    defaults to the real endpoint and is injectable for tests.
    """
    send = transport or _default_transport
    results: dict[str, list[str]] = {}
    for i in range(0, len(rsids), batch_size):
        batch = rsids[i : i + batch_size]
        try:
            results.update(parse_variation_response(send(batch)))
        except Exception as exc:  # noqa: BLE001 — reference contract
            raise RuntimeError(
                f"Error processing batch {i // batch_size + 1}: {exc}"
            ) from exc
        if i + batch_size < len(rsids) and pause_time:
            time.sleep(pause_time)
    return results
