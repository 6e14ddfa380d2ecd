"""Unit tests for the pure-numpy spatial core (no Spark session needed).

Mirrors the reference's unit layer: km² closed form (test_geoutil.py:9-17),
plus cell-index codec and PIP-vs-brute-force property checks (SURVEY §5).
"""

import numpy as np
import pytest

from aezspark import cellindex, geometry
from aezspark.grid import GridSpec


class TestKm2:
    def test_equator_1km_grid(self):
        # the reference's closed-form expectation (test_geoutil.py:9-17):
        # on the 43200×21600 1km grid, the pixel row nearest the equator is
        # ~0.8588 km², within 1%.
        g = GridSpec(grid_id=0, px_deg=360.0 / 43200)
        mid = g.ny // 2  # first row south of the equator
        val = float(g.km2_row(np.array([mid]))[0])
        assert val == pytest.approx((40075.017 / 43200) * (40007.863 / 43200), rel=1e-2)

    def test_symmetry_north_south(self):
        g = GridSpec(grid_id=0, px_deg=1.0)
        north = g.km2_row(np.arange(90))
        south = g.km2_row(np.arange(90, 180))
        assert np.allclose(north, south[::-1], rtol=1e-9)

    def test_total_earth_area(self):
        g = GridSpec(grid_id=0, px_deg=0.5)
        total = g.km2_row(np.arange(g.ny)).sum() * g.nx
        assert total == pytest.approx(510.07e6, rel=2e-3)  # Earth surface km²


class TestGridCodec:
    def test_roundtrip(self):
        g = GridSpec(grid_id=3, px_deg=2.5)
        y = np.array([0, 5, 71])
        x = np.array([0, 100, 143])
        cid = g.cell_id(y, x)
        y2, x2 = g.yx(cid)
        assert (y2 == y).all() and (x2 == x).all()

    def test_lonlat_to_yx_center_roundtrip(self):
        g = GridSpec(grid_id=1, px_deg=2.5)
        y = np.arange(g.ny)
        x = np.arange(g.nx)[: g.ny]
        lat = g.center_lat(y)
        lon = g.center_lon(x)
        y2, x2 = g.lonlat_to_yx(lon, lat)
        assert (y2 == y).all() and (x2 == x).all()


class TestCellIndex:
    def test_encode_decode_center(self):
        rng = np.random.default_rng(7)
        lat = rng.uniform(-89, 89, 1000)
        lon = rng.uniform(-179.9, 179.9, 1000)
        for res in (0, 3, 8):
            c = cellindex.encode(lat, lon, res)
            clat, clon = cellindex.center(c)
            px = cellindex.res_px(res)
            assert np.abs(clat - lat).max() <= px / 2 + 1e-9
            assert np.abs(clon - lon).max() <= px / 2 + 1e-9

    def test_parent_contains_child(self):
        rng = np.random.default_rng(8)
        lat = rng.uniform(-89, 89, 500)
        lon = rng.uniform(-179.9, 179.9, 500)
        fine = cellindex.encode(lat, lon, 9)
        coarse = cellindex.encode(lat, lon, 4)
        assert (cellindex.parent(fine, 4) == coarse).all()

    def test_children_of_parent(self):
        c = cellindex.encode(10.0, 20.0, 5)
        kids = cellindex.children(int(c))
        assert (cellindex.parent(kids, 5) == c).all()
        assert len(set(kids.tolist())) == 4

    def test_kring_counts_and_wrap(self):
        c = cellindex.encode(0.0, 179.9, 3)  # near the antimeridian: x wraps
        ring = cellindex.kring(c, k=1)
        assert ring.shape == (1, 9)
        assert len(set(ring[0].tolist())) == 9
        assert int(c) in ring[0].tolist()


class TestPIP:
    def _world_index(self):
        from aezspark.fixtures import world

        return geometry.BoundaryIndex(world.polygons())

    def test_pip_vs_bruteforce(self):
        from aezspark.fixtures import world

        polys = world.polygons()
        idx = self._world_index()
        rng = np.random.default_rng(42)
        lon = rng.uniform(-179, 179, 4000)
        lat = rng.uniform(-75, 80, 4000)
        pt, pp = idx.pip(lon, lat, many_to_many=True)
        got = set(zip(pt.tolist(), pp.tolist()))
        want = set()
        for pos, poly in enumerate(polys):
            hit = poly.contains(lon, lat)
            for i in np.flatnonzero(hit):
                want.add((int(i), pos))
        assert got == want
        assert len(want) > 100  # non-trivial selectivity

    def test_hole_excluded(self):
        idx = self._world_index()
        # Deltaland has a hole lon[0.2,10.2] lat[40.2,50.2]
        pt, pp = idx.pip(np.array([5.0]), np.array([45.0]))
        countries = idx.countries()
        assert "Deltaland" not in {countries[p] for p in pp}
        pt2, pp2 = idx.pip(np.array([-5.0]), np.array([45.0]))
        assert "Deltaland" in {countries[p] for p in pp2}

    def test_overlap_double_match(self):
        idx = self._world_index()
        # lon 22, lat 20 is inside both Alphaland and Epsilonia
        pt, pp = idx.pip(np.array([22.0]), np.array([20.0]), many_to_many=True)
        assert len(pt) == 2
        pt1, pp1 = idx.pip(np.array([22.0]), np.array([20.0]), many_to_many=False)
        assert len(pt1) == 1

    def test_nearest_matches_bruteforce(self):
        idx = self._world_index()
        rng = np.random.default_rng(3)
        lon = rng.uniform(-179, 179, 200)
        lat = rng.uniform(-60, 60, 200)
        pos, dist = idx.nearest(lon, lat)
        # brute force: per poly min segment distance
        d = geometry.point_seg_dist_deg(lon, lat, idx.seg_x1, idx.seg_y1,
                                        idx.seg_x2, idx.seg_y2)
        best = np.full(len(lon), np.inf)
        bestf = np.zeros(len(lon), dtype=int)
        for f in range(len(idx.polygons)):
            md = d[:, idx.seg_feat == f].min(axis=1)
            better = md < best
            best[better] = md[better]
            bestf[better] = f
        assert (pos == bestf).all()
        assert np.allclose(dist, best)

    def test_haversine(self):
        # quarter meridian ≈ 10007.5 km
        assert geometry.haversine_km(0, 0, 90, 0) == pytest.approx(10007.5, rel=1e-3)
