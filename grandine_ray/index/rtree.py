"""STR-packed static R-tree over bboxes (reference X5: lib/spatial/spatial.go
RTreeCollection, rtreego-based, branching 32/64 — here a bulk-loaded
Sort-Tile-Recursive packing, the right shape for build-once-query-many actor
state).

Fully numpy: nodes stored as level-order arrays; queries are vectorized
interval tests per level.
"""
from __future__ import annotations

import numpy as np

FANOUT = 32


class STRtree:
    def __init__(self, bboxes: np.ndarray, fanout: int = FANOUT):
        """bboxes: float64 [n, 4] (minx, miny, maxx, maxy)."""
        self.bboxes = np.asarray(bboxes, dtype=np.float64).reshape(-1, 4)
        n = len(self.bboxes)
        self.fanout = fanout
        if n == 0:
            self.levels = []
            self.order = np.empty(0, dtype=np.int64)
            return
        # STR packing: sort by center-x into vertical slices, then by center-y
        cx = (self.bboxes[:, 0] + self.bboxes[:, 2]) / 2
        cy = (self.bboxes[:, 1] + self.bboxes[:, 3]) / 2
        n_leaves = int(np.ceil(n / fanout))
        n_slices = int(np.ceil(np.sqrt(n_leaves)))
        per_slice = int(np.ceil(n / n_slices))
        by_x = np.argsort(cx, kind="stable")
        order_parts = []
        for s in range(n_slices):
            sl = by_x[s * per_slice:(s + 1) * per_slice]
            order_parts.append(sl[np.argsort(cy[sl], kind="stable")])
        self.order = np.concatenate(order_parts)

        # build levels bottom-up: each level is [m, 4] of parent bboxes
        cur = self.bboxes[self.order]
        self.levels = []
        while len(cur) > 1:
            m = int(np.ceil(len(cur) / fanout))
            pad = m * fanout - len(cur)
            if pad:
                padded = np.vstack([cur, np.repeat(cur[-1:], pad, axis=0)])
            else:
                padded = cur
            grp = padded.reshape(m, fanout, 4)
            parents = np.empty((m, 4))
            parents[:, 0] = grp[:, :, 0].min(axis=1)
            parents[:, 1] = grp[:, :, 1].min(axis=1)
            parents[:, 2] = grp[:, :, 2].max(axis=1)
            parents[:, 3] = grp[:, :, 3].max(axis=1)
            self.levels.append(parents)
            cur = parents
        self.levels.reverse()  # root first

    def query(self, minx, miny, maxx, maxy) -> np.ndarray:
        """Indices (into the original bboxes) whose bbox overlaps the query."""
        if len(self.order) == 0:
            return np.empty(0, dtype=np.int64)
        nodes = np.array([0], dtype=np.int64)
        for li, level in enumerate(self.levels):
            bb = level[nodes]
            hit = ~((bb[:, 0] > maxx) | (bb[:, 2] < minx)
                    | (bb[:, 1] > maxy) | (bb[:, 3] < miny))
            nodes = nodes[hit]
            if len(nodes) == 0:
                return np.empty(0, dtype=np.int64)
            children = (nodes[:, None] * self.fanout + np.arange(self.fanout)[None, :])
            nxt_size = (len(self.levels[li + 1]) if li + 1 < len(self.levels)
                        else len(self.order))
            nodes = children.reshape(-1)
            nodes = nodes[nodes < nxt_size]
        bb = self.bboxes[self.order[nodes]]
        hit = ~((bb[:, 0] > maxx) | (bb[:, 2] < minx)
                | (bb[:, 1] > maxy) | (bb[:, 3] < miny))
        return self.order[nodes[hit]]
