"""Little-endian WKB codec over ragged numpy arrays.

Semantics follow the reference engine's WKB subset
(/root/reference/lib/spatial/wkb.go, geom.go:197-283): little-endian only;
Point(1) / LineString(2) / Polygon(3) only; polygon rings are serialized
closed (first vertex repeated at the end) but held *unclosed* in memory
(closing vertex stripped on read: wkb.go:167; re-added on write: wkb.go:105).
Empty linestrings / polygons are rejected (wkb.go:136-138,156-159).

The in-memory batch representation is a struct-of-ragged-arrays
(:class:`GeomBatch`) so projections / bboxes / clips run as vectorized numpy
kernels over the flat coordinate array rather than per-vertex Python loops.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

GEOM_EMPTY = 0
GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3

_HDR = struct.Struct("<BI")          # endianness byte + geom type
_U32 = struct.Struct("<I")


class WKBError(ValueError):
    pass


@dataclass
class GeomBatch:
    """Ragged batch of geometries.

    coords            float64 [total_points, 2] (x=lon, y=lat)
    ring_offsets      int64 [n_rings + 1] into coords
    geom_offsets      int64 [n_geoms + 1] into ring_offsets
    types             uint8 [n_geoms] (1/2/3)

    A Point is one ring of one vertex; a LineString one ring; a Polygon
    1..R rings (unclosed).
    """

    types: np.ndarray
    coords: np.ndarray
    ring_offsets: np.ndarray
    geom_offsets: np.ndarray

    def __len__(self) -> int:
        return len(self.types)

    # ------------------------------------------------------------------ views
    def geom_point_ranges(self) -> tuple[np.ndarray, np.ndarray]:
        """(start, stop) vertex index per geometry."""
        starts = self.ring_offsets[self.geom_offsets[:-1]]
        stops = self.ring_offsets[self.geom_offsets[1:]]
        return starts, stops

    def rings_of(self, i: int) -> list[np.ndarray]:
        out = []
        for r in range(self.geom_offsets[i], self.geom_offsets[i + 1]):
            out.append(self.coords[self.ring_offsets[r]:self.ring_offsets[r + 1]])
        return out

    def bboxes(self) -> np.ndarray:
        """float64 [n, 4]: minx, miny, maxx, maxy (mirrors geom.go:339-355)."""
        n = len(self.types)
        out = np.empty((n, 4), dtype=np.float64)
        starts, stops = self.geom_point_ranges()
        # np.minimum.reduceat needs non-empty ranges; geometries always have >=1 pt
        x = self.coords[:, 0]
        y = self.coords[:, 1]
        if n:
            out[:, 0] = np.minimum.reduceat(x, starts)
            out[:, 1] = np.minimum.reduceat(y, starts)
            out[:, 2] = np.maximum.reduceat(x, starts)
            out[:, 3] = np.maximum.reduceat(y, starts)
            # reduceat quirk: reduceat(x, starts) reduces x[starts[i]:starts[i+1]]
            # which equals our ranges only when geometries are contiguous —
            # they are (stops[i] == starts[i+1], stops[-1] == len(x)).
        return out

    def slice(self, idx: np.ndarray) -> "GeomBatch":
        """Take geometries by integer index array (copies)."""
        idx = np.asarray(idx, dtype=np.int64)
        n_rings = (self.geom_offsets[idx + 1] - self.geom_offsets[idx])
        new_geom_off = np.zeros(len(idx) + 1, dtype=np.int64)
        np.cumsum(n_rings, out=new_geom_off[1:])
        ring_idx = _expand_ranges(self.geom_offsets[idx], self.geom_offsets[idx + 1])
        ring_sizes = self.ring_offsets[ring_idx + 1] - self.ring_offsets[ring_idx]
        new_ring_off = np.zeros(len(ring_idx) + 1, dtype=np.int64)
        np.cumsum(ring_sizes, out=new_ring_off[1:])
        pt_idx = _expand_ranges(self.ring_offsets[ring_idx], self.ring_offsets[ring_idx + 1])
        return GeomBatch(
            types=self.types[idx].copy(),
            coords=self.coords[pt_idx],
            ring_offsets=new_ring_off,
            geom_offsets=new_geom_off,
        )


def _expand_ranges(starts: np.ndarray, stops: np.ndarray) -> np.ndarray:
    """Concatenate arange(starts[i], stops[i]) vectorized (empty ranges ok)."""
    lens = stops - starts
    nz = lens > 0
    if not nz.all():
        starts = starts[nz]
        lens = lens[nz]
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    heads = np.zeros(len(starts), dtype=np.int64)
    np.cumsum(lens[:-1], out=heads[1:])
    out[heads] = starts
    out[heads[1:]] -= starts[:-1] + lens[:-1] - 1
    return np.cumsum(out)


def expand_ranges(starts, stops):
    return _expand_ranges(np.asarray(starts, np.int64), np.asarray(stops, np.int64))


# --------------------------------------------------------------------- decode
def decode_wkb_batch(blobs) -> GeomBatch:
    """Decode a sequence of LE-WKB byte strings into a GeomBatch.

    Fast path: if every blob is a 21-byte point, decode fully vectorized.
    """
    blobs = list(blobs)
    n = len(blobs)
    if n and all(len(b) == 21 for b in blobs):
        raw = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(n, 21)
        if (raw[:, 0] == 1).all() and (raw[:, 1] == GEOM_POINT).all() and not raw[:, 2:5].any():
            coords = np.ascontiguousarray(raw[:, 5:]).view(np.float64).reshape(n, 2)
            off = np.arange(n + 1, dtype=np.int64)
            return GeomBatch(
                types=np.full(n, GEOM_POINT, dtype=np.uint8),
                coords=coords.copy(),
                ring_offsets=off,
                geom_offsets=off.copy(),
            )

    # mixed batch: vectorize point AND linestring rows, loop only polygons
    lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=n)
    maybe_pt = lens == 21
    pt_coords = None
    if maybe_pt.any():
        sel = np.nonzero(maybe_pt)[0]
        raw = np.frombuffer(
            b"".join(blobs[i] for i in sel.tolist()), dtype=np.uint8
        ).reshape(-1, 21)
        ok = (raw[:, 0] == 1) & (raw[:, 1] == GEOM_POINT) & ~raw[:, 2:5].any(axis=1)
        if ok.all():
            pt_coords = np.ascontiguousarray(raw[:, 5:]).view(np.float64).reshape(-1, 2)
        else:
            maybe_pt[:] = False  # fall back entirely (weird 21-byte blobs)

    # vectorized linestrings: header-sniff, join once, bulk-validate + gather
    ln_coords = None
    ln_counts = None
    maybe_ln = np.zeros(n, dtype=bool)
    for i, b in enumerate(blobs):
        if not maybe_pt[i] and len(b) >= 9 and b[0] == 1 and b[1] == GEOM_LINESTRING:
            maybe_ln[i] = True
    if maybe_ln.any():
        sel = np.nonzero(maybe_ln)[0].tolist()
        joined = np.frombuffer(b"".join(blobs[i] for i in sel), dtype=np.uint8)
        off = np.zeros(len(sel), dtype=np.int64)
        if len(sel) > 1:
            np.cumsum(lens[sel][:-1], out=off[1:])
        hdr_ok = (joined[off + 2] == 0) & (joined[off + 3] == 0) & (joined[off + 4] == 0)
        cnt = (
            joined[off + 5].astype(np.int64)
            | (joined[off + 6].astype(np.int64) << 8)
            | (joined[off + 7].astype(np.int64) << 16)
            | (joined[off + 8].astype(np.int64) << 24)
        )
        valid = hdr_ok & (cnt > 0) & (lens[sel] >= 9 + 16 * cnt)
        if valid.all():
            starts = off + 9
            idx = _expand_ranges(starts, starts + 16 * cnt)
            ln_coords = np.ascontiguousarray(joined[idx]).view("<f8").reshape(-1, 2)
            ln_counts = cnt
        else:
            maybe_ln[:] = False  # malformed somewhere: exact errors via loop

    # vectorized SINGLE-RING polygons (the dominant polygon shape): same
    # header-sniff + bulk-gather as linestrings, ring count pinned to 1
    pg_coords = None
    pg_counts = None
    maybe_pg = np.zeros(n, dtype=bool)
    for i, b in enumerate(blobs):
        if (not maybe_pt[i] and not maybe_ln[i] and len(b) >= 13
                and b[0] == 1 and b[1] == GEOM_POLYGON):
            maybe_pg[i] = True
    if maybe_pg.any():
        sel = np.nonzero(maybe_pg)[0].tolist()
        joined = np.frombuffer(b"".join(blobs[i] for i in sel), dtype=np.uint8)
        off = np.zeros(len(sel), dtype=np.int64)
        if len(sel) > 1:
            np.cumsum(lens[sel][:-1], out=off[1:])
        hdr_ok = (joined[off + 2] == 0) & (joined[off + 3] == 0) & (joined[off + 4] == 0)
        one_ring = ((joined[off + 5] == 1) & (joined[off + 6] == 0)
                    & (joined[off + 7] == 0) & (joined[off + 8] == 0))
        cnt = (
            joined[off + 9].astype(np.int64)
            | (joined[off + 10].astype(np.int64) << 8)
            | (joined[off + 11].astype(np.int64) << 16)
            | (joined[off + 12].astype(np.int64) << 24)
        )
        valid = hdr_ok & one_ring & (cnt > 0) & (lens[sel] >= 13 + 16 * cnt)
        if not valid.all():
            # multi-ring / malformed candidates take the exact loop; the
            # single-ring majority still goes vectorized
            maybe_pg[np.asarray(sel)[~valid]] = False
            off = off[valid]
            cnt = cnt[valid]
        if len(cnt):
            starts = off + 13
            idx = _expand_ranges(starts, starts + 16 * cnt)
            pg_coords = np.ascontiguousarray(joined[idx]).view("<f8").reshape(-1, 2)
            # strip closing vertex (wkb.go:167): rings stored unclosed
            pstart = np.zeros(len(cnt), dtype=np.int64)
            if len(cnt) > 1:
                np.cumsum(cnt[:-1], out=pstart[1:])
            plast = pstart + cnt - 1
            closed = ((cnt > 1)
                      & (pg_coords[pstart, 0] == pg_coords[plast, 0])
                      & (pg_coords[pstart, 1] == pg_coords[plast, 1]))
            if closed.any():
                keep = np.ones(len(pg_coords), dtype=bool)
                keep[plast[closed]] = False
                pg_coords = pg_coords[keep]
            pg_counts = cnt - closed.astype(np.int64)

    types = np.empty(n, dtype=np.uint8)
    coords_parts: list[np.ndarray] = []
    ring_sizes: list[int] = []
    geom_nrings = np.empty(n, dtype=np.int64)
    npts_per_geom = np.empty(n, dtype=np.int64)
    li = 0
    pgi = 0
    for i, b in enumerate(blobs):
        if pt_coords is not None and maybe_pt[i]:
            types[i] = GEOM_POINT
            ring_sizes.append(1)
            geom_nrings[i] = 1
            npts_per_geom[i] = 1
            continue
        if ln_coords is not None and maybe_ln[i]:
            types[i] = GEOM_LINESTRING
            c = int(ln_counts[li])
            li += 1
            ring_sizes.append(c)
            geom_nrings[i] = 1
            npts_per_geom[i] = c
            continue
        if pg_coords is not None and maybe_pg[i]:
            types[i] = GEOM_POLYGON
            c = int(pg_counts[pgi])
            pgi += 1
            ring_sizes.append(c)
            geom_nrings[i] = 1
            npts_per_geom[i] = c
            continue
        t, parts, sizes = _decode_one(b)
        types[i] = t
        coords_parts.extend(parts)
        ring_sizes.extend(sizes)
        geom_nrings[i] = len(sizes)
        npts_per_geom[i] = sum(sizes)
    ring_off = np.zeros(len(ring_sizes) + 1, dtype=np.int64)
    np.cumsum(np.asarray(ring_sizes, dtype=np.int64), out=ring_off[1:])
    geom_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(geom_nrings, out=geom_off[1:])
    total_pts = int(npts_per_geom.sum())
    coords = np.empty((total_pts, 2), dtype=np.float64)
    g_starts = ring_off[geom_off[:-1]]
    g_stops = ring_off[geom_off[1:]]
    if pt_coords is not None and maybe_pt.any():
        coords[g_starts[maybe_pt]] = pt_coords
    if ln_coords is not None and maybe_ln.any():
        dst = _expand_ranges(g_starts[maybe_ln], g_stops[maybe_ln])
        coords[dst] = ln_coords
    if pg_coords is not None and maybe_pg.any():
        dst = _expand_ranges(g_starts[maybe_pg], g_stops[maybe_pg])
        coords[dst] = pg_coords
    if coords_parts:
        flat = np.concatenate(coords_parts).reshape(-1, 2)
        rest = ~maybe_pt & ~maybe_ln & ~maybe_pg
        if pt_coords is None:
            rest |= maybe_pt  # point fast path disabled: points decoded in loop
        if ln_coords is None:
            rest |= maybe_ln
        if pg_coords is None:
            rest |= maybe_pg
        dst = _expand_ranges(g_starts[rest], g_stops[rest])
        coords[dst] = flat
    return GeomBatch(types=types, coords=coords, ring_offsets=ring_off, geom_offsets=geom_off)


def _decode_one(b: bytes) -> tuple[int, list[np.ndarray], list[int]]:
    if len(b) < 5:
        raise WKBError("EOF: short WKB header")
    endian, gtype = _HDR.unpack_from(b, 0)
    if endian != 1:
        raise WKBError("only little endian is supported")
    if gtype == GEOM_POINT:
        if len(b) < 21:
            raise WKBError("EOF: short point")
        return gtype, [np.frombuffer(b, dtype="<f8", count=2, offset=5)], [1]
    if gtype == GEOM_LINESTRING:
        (npts,) = _U32.unpack_from(b, 5)
        if npts == 0:
            raise WKBError("a linestring needs to have at least one point")
        if len(b) < 9 + 16 * npts:
            raise WKBError("EOF: short linestring")
        return gtype, [np.frombuffer(b, dtype="<f8", count=2 * npts, offset=9)], [int(npts)]
    if gtype == GEOM_POLYGON:
        (nrings,) = _U32.unpack_from(b, 5)
        if nrings == 0:
            raise WKBError("a polygon needs to have at least one ring")
        parts, sizes = [], []
        pos = 9
        for _ in range(nrings):
            if len(b) < pos + 4:
                raise WKBError("EOF: short polygon ring header")
            (npts,) = _U32.unpack_from(b, pos)
            if npts == 0:
                raise WKBError("a ring needs to have at least one point")
            pos += 4
            if len(b) < pos + 16 * npts:
                raise WKBError("EOF: short polygon ring")
            ring = np.frombuffer(b, dtype="<f8", count=2 * npts, offset=pos)
            pos += 16 * npts
            # strip closing vertex (wkb.go:167): ring stored unclosed
            if npts > 1 and ring[0] == ring[-2] and ring[1] == ring[-1]:
                ring = ring[:-2]
                npts -= 1
            parts.append(ring)
            sizes.append(int(npts))
        return gtype, parts, sizes
    raise WKBError(f"unsupported GeomType: {gtype}")


# --------------------------------------------------------------------- encode
def encode_point(x: float, y: float) -> bytes:
    return b"\x01" + _U32.pack(GEOM_POINT) + struct.pack("<dd", x, y)


def encode_linestring(pts: np.ndarray) -> bytes:
    pts = np.asarray(pts, dtype="<f8").reshape(-1, 2)
    return (
        b"\x01" + _U32.pack(GEOM_LINESTRING) + _U32.pack(len(pts)) + pts.tobytes()
    )


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    """rings given unclosed; closing vertex re-added on write (wkb.go:105)."""
    out = [b"\x01", _U32.pack(GEOM_POLYGON), _U32.pack(len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype="<f8").reshape(-1, 2)
        closed = np.vstack([ring, ring[:1]])
        out.append(_U32.pack(len(closed)))
        out.append(closed.tobytes())
    return b"".join(out)


def encode_linestrings_bulk(coords: np.ndarray, sizes: np.ndarray) -> list[bytes]:
    """Bulk LE-WKB encode of many single-ring linestrings.

    coords: [total_pts, 2] concatenated vertices; sizes: points per line.
    One output buffer is assembled with vectorized scatter/gather, then
    sliced per line — no per-line struct packing.
    """
    sizes = np.asarray(sizes, dtype=np.int64)
    n = len(sizes)
    if n == 0:
        return []
    byte_lens = 9 + 16 * sizes
    bounds = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(byte_lens, out=bounds[1:])
    buf = np.zeros(int(bounds[-1]), dtype=np.uint8)
    starts = bounds[:-1]
    buf[starts] = 1                       # little-endian marker
    buf[starts + 1] = GEOM_LINESTRING
    # uint32 LE point count at offset 5
    cnt = sizes.astype(np.uint32)
    buf[starts + 5] = (cnt & 0xFF).astype(np.uint8)
    buf[starts + 6] = ((cnt >> 8) & 0xFF).astype(np.uint8)
    buf[starts + 7] = ((cnt >> 16) & 0xFF).astype(np.uint8)
    buf[starts + 8] = ((cnt >> 24) & 0xFF).astype(np.uint8)
    dst = _expand_ranges(starts + 9, starts + 9 + 16 * sizes)
    buf[dst] = (
        np.ascontiguousarray(np.asarray(coords, dtype="<f8").reshape(-1, 2))
        .view(np.uint8).reshape(-1)
    )
    raw = buf.tobytes()
    return [raw[bounds[i]:bounds[i + 1]] for i in range(n)]


def encode_wkb_batch(gb: GeomBatch) -> list[bytes]:
    out: list[bytes] = []
    pt_mask = gb.types == GEOM_POINT
    if pt_mask.all() and len(gb):
        # vectorized: 21-byte records
        n = len(gb)
        raw = np.empty((n, 21), dtype=np.uint8)
        raw[:, 0] = 1
        raw[:, 1] = GEOM_POINT
        raw[:, 2:5] = 0
        starts, _ = gb.geom_point_ranges()
        raw[:, 5:] = np.ascontiguousarray(gb.coords[starts]).view(np.uint8).reshape(n, 16)
        buf = raw.tobytes()
        return [buf[i * 21:(i + 1) * 21] for i in range(n)]
    for i in range(len(gb)):
        t = gb.types[i]
        rings = gb.rings_of(i)
        if t == GEOM_POINT:
            out.append(encode_point(rings[0][0, 0], rings[0][0, 1]))
        elif t == GEOM_LINESTRING:
            out.append(encode_linestring(rings[0]))
        elif t == GEOM_POLYGON:
            out.append(encode_polygon(rings))
        else:
            raise WKBError(f"unsupported GeomType: {t}")
    return out


def batch_from_parts(
    types, coords, ring_offsets, geom_offsets
) -> GeomBatch:
    return GeomBatch(
        types=np.asarray(types, dtype=np.uint8),
        coords=np.asarray(coords, dtype=np.float64).reshape(-1, 2),
        ring_offsets=np.asarray(ring_offsets, dtype=np.int64),
        geom_offsets=np.asarray(geom_offsets, dtype=np.int64),
    )
