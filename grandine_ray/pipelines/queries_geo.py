"""Round-3 geospatial extension: tile pyramid rollup.

The aggregation pyramid every tile heatmap needs: counts at a base zoom
roll up to all ancestor tiles by integer coordinate halving (x >> d,
y >> d — exact, no float tile math in the rollup itself). One
vectorized fan-out (base row → Z+1 ancestor rows) feeds fused-key
partial counts, so the shuffle carries the tile-domain aggregate; at a
deeper base zoom the fan-out stays Z+1 rows per base assignment and the
groupby output is bounded by the occupied-tile count per level (a
quadtree: ≤ 4× the base level, summed ≈ 4/3 of it).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ROLLUP_BASE_Z = 6


def q_tile_rollup(sf_dir: str):
    """Feature-assignment counts per tile at EVERY zoom 0..6, derived by
    rolling the base-zoom coverage up the pyramid (parent = coords >> 1
    per level). Matches tile_counts at z=6 by construction; ancestors
    count each base assignment once."""
    from ray.data.aggregate import Sum

    from ..index import xyz
    from ..stages.coverage import make_coverage_fn
    from .queries import _features_ds

    Z = ROLLUP_BASE_Z
    tiled = _features_ds(sf_dir).map_batches(
        make_coverage_fn([Z]), batch_format="pyarrow")

    def ancestors(b: pa.Table) -> pa.Table:
        _, x, y = xyz.tile_key_unpack(
            b["tile_key"].to_numpy(zero_copy_only=False))
        n = len(x)
        d = np.tile(np.arange(Z + 1, dtype=np.int64), n)  # Z-k shifts
        xr = np.repeat(x, Z + 1) >> d
        yr = np.repeat(y, Z + 1) >> d
        zr = Z - d
        key = xyz.tile_key(zr, xr, yr).view(np.int64)  # z ≤ 6 ⇒ < 2^62
        keys, counts = np.unique(key, return_counts=True)
        return pa.table({
            "k": pa.array(keys, pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        })

    agg = tiled.map_batches(ancestors, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n", alias_name="n"))

    def unpack(b: pa.Table) -> pa.Table:
        z, x, y = xyz.tile_key_unpack(
            b["k"].to_numpy(zero_copy_only=False).view(np.uint64))
        return pa.table({
            "z": pa.array(z, pa.int64()),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
            "n": pc.cast(b["n"], pa.int64()),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


QUERIES_GEO = {
    "tile_rollup": q_tile_rollup,
}


def _oracle_sql_geo() -> dict[str, str]:
    # built lazily: the coverage CTE lives in queries.py (circular at
    # module load — queries.py imports this module at its tail)
    from .queries import _COVERAGE_CTE

    return {
        "tile_rollup": _COVERAGE_CTE + f"""
, base AS (SELECT x, y FROM cov WHERE z = {ROLLUP_BASE_Z})
, lv AS (SELECT UNNEST(generate_series(0, {ROLLUP_BASE_Z})) AS z)
SELECT CAST(lv.z AS BIGINT) AS z,
       CAST(base.x >> ({ROLLUP_BASE_Z} - lv.z) AS BIGINT) AS x,
       CAST(base.y >> ({ROLLUP_BASE_Z} - lv.z) AS BIGINT) AS y,
       CAST(COUNT(*) AS BIGINT) AS n
FROM base CROSS JOIN lv
GROUP BY 1, 2, 3""",
    }
