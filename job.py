"""Cluster job entrypoint (north rule: launched via ``ray job submit``).

    ray job submit --working-dir . -- python job.py \
        --in /data/documents --out /data/tiles --zoom 0-14 [--mapping m.yml]

On a cluster, ``ray.init()`` with no address connects to the running Ray
runtime provided by the job server; standalone it starts a local session.
The pipeline itself is identical either way — partitioned, resumable,
with per-partition lineage manifests and job metrics (see SCALE.md).
"""
from __future__ import annotations

import argparse
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--in", dest="inp", required=True)
    p.add_argument("--out", dest="out", required=True)
    p.add_argument("--zoom", default="0-8")
    p.add_argument("--mapping", default=None)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--strategy", default="prepared",
                   choices=["prepared", "direct", "salted"])
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        if os.environ.get("RAY_ADDRESS") in (None, "", "local"):
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
        else:  # pragma: no cover — cluster path (ray job submit)
            ray.init()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from grandine_ray.cli import parse_zooms
    from grandine_ray.pipelines.tiler import finalize_job, run_tiler

    t0 = time.time()
    manifest = run_tiler(
        args.inp, out_dir=args.out, zooms=parse_zooms(args.zoom),
        resume=not args.no_resume,
        mapping_yaml=open(args.mapping).read() if args.mapping else None,
    )
    rows = finalize_job(manifest, args.out, wall_s=time.time() - t0)
    total = sum(r["rows"] for r in rows)
    print(f"job complete: {total} tiles, {len(rows)} partitions "
          f"(this run), metrics in {args.out}/JOB.json")
    ray.shutdown()


if __name__ == "__main__":
    main()
