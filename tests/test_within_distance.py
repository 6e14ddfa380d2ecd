"""Spatial range join (within-distance): inside → dist 0, boundary ≤ d
matches, beyond-d excluded, many-to-many, parity with a dense scan."""

import numpy as np

from aezspark.geometry import BoundaryIndex, Polygon, point_seg_dist_deg


def _index():
    a = Polygon(0, "A", np.array([0.0, 10.0, 10.0, 0.0, 0.0]),
                np.array([0.0, 0.0, 10.0, 10.0, 0.0]))
    b = Polygon(1, "B", np.array([20.0, 30.0, 30.0, 20.0, 20.0]),
                np.array([0.0, 0.0, 10.0, 10.0, 0.0]))
    return BoundaryIndex([a, b])


def test_within_semantics():
    idx = _index()
    lon = np.array([5.0, 12.0, 16.0, 50.0, 15.0])
    lat = np.array([5.0, 5.0, 5.0, 5.0, 5.0])
    pt, pp, d = idx.within(lon, lat, 3.0)
    pairs = {(int(p), int(f)): float(x) for p, f, x in zip(pt, pp, d)}
    assert pairs[(0, 0)] == 0.0            # inside A
    assert (1, 0) in pairs                 # 2° east of A's boundary
    assert pairs[(1, 0)] > 0
    assert (2, 0) not in pairs             # 6° away: beyond d
    assert all(p != 3 for p, _ in pairs)   # 50°: matches nothing
    # point 4 at lon 15 is ~5° from BOTH A and B: no match at d=3
    pt2, pp2, _ = idx.within(lon, lat, 6.0)
    m = {(int(p), int(f)) for p, f in zip(pt2, pp2)}
    assert (4, 0) in m and (4, 1) in m     # many-to-many at d=6


def test_within_matches_dense_scan():
    idx = _index()
    rng = np.random.default_rng(17)
    lon = rng.uniform(-10, 45, 3000)
    lat = rng.uniform(-10, 20, 3000)
    d = 2.5
    pt, pp, dist = idx.within(lon, lat, d)
    got = {(int(p), int(f)): float(x) for p, f, x in zip(pt, pp, dist)}
    expected = {}
    for f, poly in enumerate(idx.polygons):
        inside = poly.contains(lon, lat)
        x1, y1, x2, y2 = poly.segments()
        dd = point_seg_dist_deg(lon, lat, x1, y1, x2, y2).min(axis=1)
        for i in np.flatnonzero(inside | (dd <= d)):
            expected[(int(i), f)] = 0.0 if inside[i] else float(dd[i])
    assert got == expected
