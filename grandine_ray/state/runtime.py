"""Shared runtime helpers for streaming-graph scheduling decisions."""
from __future__ import annotations

import ray
import ray.data as rd


def pin_local(ds: rd.Dataset) -> rd.Dataset:
    """Pin a small intermediate ONLY in single-node (local/test/bench) mode.

    Two all-to-all exchanges in one streaming graph starve the upstream map
    stage of CPU slots at low parallelism (measured 44 s vs 5 s for the
    tiler's prepare stage at 8 cpus, and an outright deadlock in the dedup
    verify graph at 8 cpus), so local runs pin the small intermediate
    between them. On a multi-node cluster the pipeline must stream instead
    — pinning e.g. the full candidate-pair set of a dup-heavy 10^12-doc
    corpus (~10^10 pairs, ~160 GB of ids) is avoidable object-store spill
    pressure there, while the CPU-starvation pathology needs low total
    parallelism to bite.
    """
    try:
        alive = [n for n in ray.nodes() if n.get("Alive", False)]
    except Exception:  # not initialised yet — behave like local
        alive = [None]
    if len(alive) <= 1:
        return ds.materialize()
    return ds
