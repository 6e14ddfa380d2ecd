"""Property-based tests (hypothesis) over the engine's pure-numpy core:
cell-index codec, grid codec/area, and the PIP kernel vs the independent
Sunday-winding implementation. No SparkSession — these pin the invariants
the distributed kernels rely on, at fuzzed inputs rather than fixtures.
"""
import numpy as np
from hypothesis import assume, given, settings, strategies as st

from aezspark import cellindex as ci
from aezspark.geometry import Polygon, point_seg_dist_deg
from aezspark.fixtures.oracle import winding_contains
from aezspark.grid import GridSpec

# strictly inside the globe so encode() never clamps (clamping is a
# separate, deliberate behavior tested below)
lats = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False,
                 allow_infinity=False)
lons = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False,
                 allow_infinity=False)
ress = st.integers(min_value=0, max_value=ci.MAX_RES)


@given(lats, lons, ress)
def test_cell_center_reencodes_to_same_cell(lat, lon, res):
    """center(encode(p)) is strictly inside its cell, so re-encoding the
    center must return the identical cell id — the property the kNN
    candidate expansion and tile lookup both rely on."""
    cell = ci.encode(lat, lon, res)
    clat, clon = ci.center(cell)
    assert ci.encode(clat, clon, res) == cell


@given(lats, lons, ress)
def test_decode_bounds_and_res(lat, lon, res):
    r, y, x = ci.decode(ci.encode(lat, lon, res))
    assert int(r) == res
    assert 0 <= int(y) < ci.ny(res)
    assert 0 <= int(x) < ci.nx(res)


@given(lats, lons, ress, st.integers(min_value=0, max_value=ci.MAX_RES))
def test_parent_matches_direct_encode(lat, lon, res, parent_res):
    """Ancestor-by-bit-shift must equal encoding the point directly at the
    coarser resolution (the alignment law behind the x3 resolution join)."""
    assume(parent_res <= res)
    cell = ci.encode(lat, lon, res)
    assert ci.parent(cell, parent_res) == ci.encode(lat, lon, parent_res)


def test_max_res_x_fits_its_field():
    """Regression pin (hypothesis-found): lat=0, lon=76, res=18 — at res 19
    the child x = 2^28 overflowed the old symmetric 28/28 (y, x) packing into
    the y field, collapsing the 4 children to 2 distinct ids. The layout now
    gives x (the 720-column axis) 29 bits."""
    kids = ci.children(int(ci.encode(0.0, 76.0, 18)))
    assert len(set(kids.tolist())) == 4
    # the widest legal (y, x) must fit their fields, and an id built from
    # them must decode back intact at MAX_RES
    assert ci.nx(ci.MAX_RES) - 1 <= ci.X_MASK
    assert ci.ny(ci.MAX_RES) - 1 <= ci.Y_MASK
    ymax, xmax = ci.ny(ci.MAX_RES) - 1, ci.nx(ci.MAX_RES) - 1
    cell = (ci.MAX_RES << ci.RES_SHIFT) | (ymax << ci.Y_SHIFT) | xmax
    r, y, x = ci.decode(cell)
    assert (int(r), int(y), int(x)) == (ci.MAX_RES, ymax, xmax)
    assert cell > 0  # sign bit untouched


@given(lats, lons, st.integers(min_value=0, max_value=ci.MAX_RES - 1))
def test_children_partition_parent(lat, lon, res):
    cell = int(ci.encode(lat, lon, res))
    kids = ci.children(cell)
    assert len(set(kids.tolist())) == 4
    assert all(int(ci.parent(k, res)) == cell for k in kids)


@given(lats, lons, st.integers(min_value=1, max_value=10),
       st.integers(min_value=1, max_value=3))
def test_kring_contains_cell_and_is_bounded(lat, lon, res, k):
    cell = int(ci.encode(lat, lon, res))
    ring = ci.kring(cell, k)
    assert cell in set(np.asarray(ring).ravel().tolist())
    assert len(np.asarray(ring).ravel()) <= (2 * k + 1) ** 2


@given(st.integers(min_value=0, max_value=359),
       st.integers(min_value=0, max_value=719))
def test_gridspec_center_roundtrip(y, x):
    g = GridSpec(grid_id=1, px_deg=0.5)
    yy, xx = g.lonlat_to_yx(g.center_lon(x), g.center_lat(y))
    assert (int(yy), int(xx)) == (y, x)
    ry, rx = g.yx(g.cell_id(y, x))
    assert (int(ry), int(rx)) == (y, x)


@given(st.integers(min_value=0, max_value=359))
def test_km2_symmetric_about_equator_and_positive(y):
    g = GridSpec(grid_id=1, px_deg=0.5)
    a = float(g.km2_row(y))
    b = float(g.km2_row(g.ny - 1 - y))
    assert a > 0
    assert abs(a - b) <= 1e-6 * a  # north/south mirror rows have equal area


def test_km2_total_is_earth_surface():
    """Σ pixel areas over the whole 0.5° grid ≈ the WGS84-sphere surface —
    the formula's global consistency check (not hypothesis; exact sum)."""
    g = GridSpec(grid_id=1, px_deg=0.5)
    rows = g.km2_row(np.arange(g.ny))
    total = float((rows * g.nx).sum())
    assert abs(total - 5.10e8) / 5.10e8 < 0.01


@st.composite
def convex_polygons(draw):
    """Random convex polygon: sorted angles around a center, CCW ring."""
    n = draw(st.integers(min_value=3, max_value=9))
    cx = draw(st.floats(min_value=-150, max_value=150))
    cy = draw(st.floats(min_value=-60, max_value=60))
    angles = sorted(draw(st.lists(
        st.floats(min_value=0.0, max_value=2 * np.pi - 1e-3),
        min_size=n, max_size=n, unique=True)))
    radii = draw(st.lists(st.floats(min_value=0.5, max_value=8.0),
                          min_size=n, max_size=n))
    xs = np.array([cx + r * np.cos(a) for a, r in zip(angles, radii)])
    ys = np.array([cy + r * np.sin(a) for a, r in zip(angles, radii)])
    ring_x = np.append(xs, xs[0])
    ring_y = np.append(ys, ys[0])
    return ring_x, ring_y


@settings(max_examples=150, deadline=None)
@given(convex_polygons(), st.lists(st.tuples(
    st.floats(min_value=-160, max_value=160),
    st.floats(min_value=-70, max_value=70)), min_size=1, max_size=30))
def test_pip_agrees_with_independent_winding(ring, pts):
    """The engine's even-odd crossing test and the oracle's Sunday winding
    implementation must agree on every off-boundary point of a simple
    polygon — fuzzed, not just at fixture polygons."""
    ring_x, ring_y = ring
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    # exclude near-boundary points: both algorithms are exact off the
    # boundary but may differ ON it (documented; fixtures avoid edges)
    d = point_seg_dist_deg(lon, lat, ring_x[:-1], ring_y[:-1],
                           ring_x[1:], ring_y[1:]).min(axis=1)
    keep = d > 1e-7
    assume(keep.any())
    poly = Polygon(1, "T", ring_x, ring_y)
    got = poly.contains(lon[keep], lat[keep])
    ref = winding_contains(lon[keep], lat[keep], ring_x, ring_y)
    assert (got == ref).all()


@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1,
                max_size=20),
       st.integers(min_value=-1000, max_value=1000),
       st.integers(min_value=0, max_value=400))
def test_manifest_prune_is_sound(values, lo, span):
    """Scan-planning soundness law: a file whose recorded [min, max] covers
    ANY value inside the queried range must be KEPT. (The converse —
    pruning files that provably miss — is effectiveness, pinned in the
    snapshot-table tests; this pins that pruning can never be lossy, for
    fuzzed value sets and ranges including empty and degenerate ones.)"""
    from aezspark.tables import _file_may_match

    hi = lo + span
    fstats = {"k": [min(values), max(values)]}
    any_in_range = any(lo <= v <= hi for v in values)
    kept = _file_may_match(fstats, {"k": (lo, hi)})
    if any_in_range:
        assert kept
    # missing / poisoned stats are always kept
    assert _file_may_match({"k": None}, {"k": (lo, hi)})
    assert _file_may_match(None, {"k": (lo, hi)})
    assert _file_may_match({}, {"k": (lo, hi)})
