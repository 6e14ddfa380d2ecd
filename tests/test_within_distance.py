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


def test_dist_km_metric_contract():
    """The kNN/within-distance km metric contract, made explicit and pinned
    (VERDICT r5 #7): dist_km = equirectangular-scaled degrees (lon scaled by
    cos of the query point's latitude) x KM_PER_DEG. Three numeric claims:

    1. For boundary-resolution edges (<= 1 deg extent) the metric tracks the
       spherical geodesic to <= ~0.7% at ANY latitude up to 85 deg — the
       cos(lat) scaling is what buys this; an unscaled lon metric would be
       off by 1/cos(85) ~ 11x.
    2. The divergence is REAL for multi-degree edges at extreme latitude
       (the cos is evaluated at the point, not along the segment): a
       constructed 15-deg edge at 84 deg lat exceeds 1% error. This is the
       documented approximation, not a bug.
    3. Ranking: candidates whose true geodesic distances differ by more
       than the error bound never swap order.
    """
    import numpy as np

    from aezspark.geometry import (KM_PER_DEG, haversine_km,
                                   point_seg_dist_deg)

    def geodesic_pt_seg(plon, plat, x1, y1, x2, y2, n=20001):
        t = np.linspace(0.0, 1.0, n)
        return haversine_km(plat, plon, y1 + (y2 - y1) * t,
                            x1 + (x2 - x1) * t).min()

    rng = np.random.default_rng(7)

    # 1: short edges, all latitudes
    worst = 0.0
    for lat0 in (0.0, 45.0, 60.0, 75.0, 85.0):
        for _ in range(60):
            plon = rng.uniform(-10, 10)
            plat = lat0 + rng.uniform(-0.5, 0.5)
            x1, y1 = plon + rng.uniform(-1, 1), plat + rng.uniform(-1, 1)
            x2 = x1 + rng.uniform(-0.5, 0.5)
            y2 = y1 + rng.uniform(-0.5, 0.5)
            d_eng = point_seg_dist_deg([plon], [plat], [x1], [y1],
                                       [x2], [y2])[0, 0] * KM_PER_DEG
            d_geo = geodesic_pt_seg(plon, plat, x1, y1, x2, y2)
            if d_geo > 1e-3:
                worst = max(worst, abs(d_eng - d_geo) / d_geo)
    assert worst < 0.007, f"short-edge error {worst:.4%} broke the contract"

    # 2: the divergence exists and is where we say it is
    d_eng = point_seg_dist_deg([0.0], [84.0], [2.0], [86.5],
                               [17.0], [84.5])[0, 0] * KM_PER_DEG
    d_geo = geodesic_pt_seg(0.0, 84.0, 2.0, 86.5, 17.0, 84.5)
    assert abs(d_eng - d_geo) / d_geo > 0.01

    # 3: order preserved when separations exceed the bound
    for _ in range(40):
        plon, plat = rng.uniform(-10, 10), rng.uniform(70, 85)
        segs = [(plon + rng.uniform(-2, 2), plat + rng.uniform(-2, 2),
                 rng.uniform(-0.8, 0.8), rng.uniform(-0.8, 0.8))
                for _ in range(6)]
        eng = [point_seg_dist_deg([plon], [plat], [a], [b],
                                  [a + dx], [b + dy])[0, 0] * KM_PER_DEG
               for a, b, dx, dy in segs]
        geo = [geodesic_pt_seg(plon, plat, a, b, a + dx, b + dy)
               for a, b, dx, dy in segs]
        order_e = np.argsort(eng)
        order_g = np.argsort(geo)
        for i, j in zip(order_e, order_g):
            if i != j:
                # a swap is only allowed between near-ties (within 2x the
                # short-edge error bound)
                assert abs(geo[i] - geo[j]) / max(geo[i], geo[j], 1e-9) < 0.014
