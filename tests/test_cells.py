"""S2-style / H3-style cell encoder tests (engine-defined schemes, X7)."""
import numpy as np

from grandine_ray.index import cells


def test_s2_deterministic_and_level_bits():
    lon = np.array([13.4, -74.0, 139.7, 0.0, -179.9])
    lat = np.array([52.5, 40.7, 35.7, 0.0, -85.0])
    c1 = cells.s2_cell_id(lon, lat, level=12)
    c2 = cells.s2_cell_id(lon, lat, level=12)
    assert (c1 == c2).all()
    assert ((c1 & np.uint64(31)) == 12).all()


def test_s2_locality():
    # nearby points share coarse parents; far points don't
    c = cells.s2_cell_id(np.array([13.40, 13.41, -74.0]),
                         np.array([52.50, 52.505, 40.7]), level=12)
    p = cells.s2_parent(c, 6)
    assert p[0] == p[1]
    assert p[0] != p[2]
    assert ((p & np.uint64(31)) == 6).all()


def test_s2_hilbert_curve_locality_beats_morton():
    # The Hilbert position ordering must be a true space-filling curve:
    # consecutive positions are grid-adjacent (step == 1), whereas Morton
    # interleave jumps up to 2^bits-ish at quadrant seams.  This is the
    # property the cell-range join partitioner relies on.
    bits = 6
    n = 1 << bits
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ii, jj = ii.ravel(), jj.ravel()
    d = cells._hilbert_pos(ii, jj, bits)
    # bijective onto [0, n*n)
    assert sorted(d.tolist()) == list(range(n * n))
    order = np.argsort(d)
    step = (np.abs(np.diff(ii[order].astype(np.int64)))
            + np.abs(np.diff(jj[order].astype(np.int64))))
    assert step.max() == 1  # Hilbert: every consecutive pair adjacent
    # Morton comparison: interleave bits, sort, measure steps
    mi, mj = ii.astype(np.uint64), jj.astype(np.uint64)
    m = np.zeros(len(mi), dtype=np.uint64)
    for b in range(bits):
        m |= ((mi >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b + 1)
        m |= ((mj >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b)
    morder = np.argsort(m)
    mstep = (np.abs(np.diff(ii[morder].astype(np.int64)))
             + np.abs(np.diff(jj[morder].astype(np.int64))))
    assert mstep.max() > 1 and mstep.mean() > step.mean()


def test_s2_parent_hierarchy():
    lon = np.random.default_rng(0).uniform(-179, 179, 200)
    lat = np.random.default_rng(1).uniform(-85, 85, 200)
    fine = cells.s2_cell_id(lon, lat, level=14)
    coarse_direct = cells.s2_cell_id(lon, lat, level=8)
    coarse_via_parent = cells.s2_parent(fine, 8)
    assert (coarse_direct == coarse_via_parent).all()


def test_s2_distinct_faces():
    # all six faces reachable
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lat = np.array([0.0, 0.0, 89.9, 0.0, 0.0, -89.9])
    c = cells.s2_cell_id(lon, lat, level=4)
    faces = (c >> np.uint64(2 * 4 + 5)).tolist()
    assert sorted(faces) == [0, 1, 2, 3, 4, 5]


def test_h3ish_roundtrip_neighbors():
    lon = np.array([13.4, -74.0])
    lat = np.array([52.5, 40.7])
    c = cells.h3ish_cell_id(lon, lat, res=9)
    n = cells.h3ish_neighbors(c)
    assert n.shape == (2, 6)
    # neighbors are distinct and don't include the cell itself
    for i in range(2):
        assert len(set(n[i].tolist())) == 6
        assert c[i] not in n[i]


def test_h3ish_locality_and_resolution():
    c_fine = cells.h3ish_cell_id(np.array([13.4, 13.4001]),
                                 np.array([52.5, 52.5001]), res=7)
    assert c_fine[0] == c_fine[1]
    c_coarse = cells.h3ish_cell_id(np.array([13.4]), np.array([52.5]), res=3)
    assert (c_coarse >> np.uint64(56))[0] == 3


def test_geohash_known_vectors():
    import numpy as np

    from grandine_ray.index.cells import geohash_encode

    assert geohash_encode([10.40744], [57.64911], 7)[0] == b"u4pruyd"
    assert geohash_encode([-5.6], [42.6], 5)[0] == b"ezs42"
    assert geohash_encode([0.0], [0.0], 4)[0] == b"s000"
    got = geohash_encode([180.0, -180.0], [90.0, -90.0], 4)
    assert list(got) == [b"zzzz", b"0000"]


def test_geohash_scalar_parity_and_prefix_locality():
    import numpy as np

    from grandine_ray.index.cells import geohash_encode
    from grandine_ray.oracle.expected import _geohash_scalar

    rng = np.random.default_rng(4)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    got = geohash_encode(lon, lat, 8)
    for i in range(500):
        assert got[i].decode() == _geohash_scalar(lon[i], lat[i], 8)
    # prefix property: truncating the hash = encoding at lower precision
    got5 = geohash_encode(lon, lat, 5)
    assert all(g8[:5] == g5 for g8, g5 in zip(got, got5))
    # locality: nearby points share long prefixes
    a = geohash_encode([13.0], [52.0], 9)[0]
    b = geohash_encode([13.0 + 1e-7], [52.0 + 1e-7], 9)[0]
    assert a[:6] == b[:6]
