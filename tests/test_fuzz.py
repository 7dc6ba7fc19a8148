"""Property/fuzz tests (reference analog: go-fuzz harnesses for WKB and
Spaten, lib/spatial/fuzz.go + lib/spaten/fuzz.go)."""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from grandine_ray.geom import twkb, wkb
from grandine_ray.sources import spaten as sp

coord = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                  allow_infinity=False, width=64)


@given(st.lists(st.tuples(coord, coord), min_size=1, max_size=40))
@settings(max_examples=200, deadline=None)
def test_wkb_linestring_roundtrip(pts):
    arr = np.asarray(pts, dtype=np.float64)
    blob = wkb.encode_linestring(arr)
    gb = wkb.decode_wkb_batch([blob])
    assert gb.types[0] == wkb.GEOM_LINESTRING
    assert np.array_equal(gb.rings_of(0)[0], arr)
    assert wkb.encode_wkb_batch(gb)[0] == blob


@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=12),
       st.lists(st.tuples(coord, coord), min_size=3, max_size=8))
@settings(max_examples=100, deadline=None)
def test_wkb_polygon_roundtrip(outer, hole):
    rings = [np.asarray(outer, dtype=np.float64)]
    # avoid accidental equality of ring-first/ring-last (closing strip rule)
    if not np.array_equal(rings[0][0], rings[0][-1]):
        blob = wkb.encode_polygon(rings + [np.asarray(hole, dtype=np.float64)]
                                  if not np.array_equal(
                                      np.asarray(hole)[0], np.asarray(hole)[-1])
                                  else rings)
        gb = wkb.decode_wkb_batch([blob])
        assert wkb.encode_wkb_batch(gb)[0] == blob


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=300, deadline=None)
def test_wkb_fuzz_no_crash(data):
    """Arbitrary bytes either decode or raise WKBError — never crash
    (fuzz.go contract)."""
    try:
        wkb.decode_wkb_batch([data])
    except wkb.WKBError:
        pass


@given(st.binary(min_size=0, max_size=128))
@settings(max_examples=300, deadline=None)
def test_spaten_fuzz_no_crash(data):
    """Arbitrary bytes → SpatenError or clean parse (lib/spaten/fuzz.go)."""
    try:
        list(sp.iter_blocks(data))
    except (sp.SpatenError, wkb.WKBError):
        pass
    except IndexError:
        pytest.fail("raw IndexError escaping the Spaten parser")


@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=30),
       st.integers(min_value=0, max_value=7))
@settings(max_examples=100, deadline=None)
def test_twkb_roundtrip_precision(pts, precision):
    arr = np.round(np.asarray(pts, dtype=np.float64), precision)
    blob = twkb.encode_linestring(arr, precision=precision)
    gtype, got = twkb.decode(blob)
    assert np.allclose(got, arr, atol=10.0 ** -precision / 2 + 1e-9)


@given(st.lists(st.tuples(st.floats(-100, 100, allow_nan=False),
                          st.floats(-100, 100, allow_nan=False)),
                min_size=2, max_size=20),
       st.floats(-50, 40), st.floats(-50, 40))
@settings(max_examples=150, deadline=None)
def test_clip_line_invariants(pts, bx, by):
    """Clipped output always lies within the (rounded) box and preserves
    at-most-input vertex count per part ordering."""
    from grandine_ray.geom.clip import clip_line

    arr = np.asarray(pts, dtype=np.float64)
    parts = clip_line(arr, bx, by, bx + 20, by + 20)
    for part in parts:
        assert len(part) >= 1
        assert (part[:, 0] >= bx - 1e-6).all() and (part[:, 0] <= bx + 20 + 1e-6).all()
        assert (part[:, 1] >= by - 1e-6).all() and (part[:, 1] <= by + 20 + 1e-6).all()


@given(st.lists(st.tuples(st.floats(-100, 100, allow_nan=False),
                          st.floats(-100, 100, allow_nan=False)),
                min_size=3, max_size=10))
@settings(max_examples=150, deadline=None)
def test_clip_polygon_invariants(ring):
    from grandine_ray.geom.clip import clip_polygon

    arr = np.asarray(ring, dtype=np.float64)
    out = clip_polygon([arr], -10, -10, 10, 10)
    for poly in out:
        for r in poly:
            assert (r[:, 0] >= -10 - 1e-6).all() and (r[:, 0] <= 10 + 1e-6).all()
            assert (r[:, 1] >= -10 - 1e-6).all() and (r[:, 1] <= 10 + 1e-6).all()
