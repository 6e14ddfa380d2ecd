"""The oracle's independent winding-number containment (ADVICE r1): it must
agree with the engine's even-odd test on simple polygons, and the cross-check
must actually detect a lying containment."""

import numpy as np
import pytest

from aezspark.fixtures.oracle import contains_checked, winding_contains
from aezspark.geometry import Polygon, point_in_ring


def _star(n, cx, cy, r0, r1, seed):
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(r0, r1, n)
    xs = cx + rad * np.cos(ang)
    ys = cy + rad * np.sin(ang)
    return np.append(xs, xs[0]), np.append(ys, ys[0])


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_winding_agrees_with_even_odd_on_simple_polygons(seed):
    xs, ys = _star(17, 10.0, 20.0, 5.0, 14.0, seed)
    rng = np.random.default_rng(seed + 100)
    lon = rng.uniform(-10, 30, 5000)
    lat = rng.uniform(0, 40, 5000)
    assert (winding_contains(lon, lat, xs, ys)
            == point_in_ring(lon, lat, xs, ys)).all()


def test_contains_checked_detects_disagreement():
    xs, ys = _star(11, 0.0, 0.0, 3.0, 6.0, 9)

    class LyingPolygon(Polygon):
        def contains(self, lon, lat):
            return ~super().contains(lon, lat)

    poly = LyingPolygon(0, "X", xs, ys)
    with pytest.raises(AssertionError, match="containment disagreement"):
        contains_checked(poly, np.array([0.0, 50.0]), np.array([0.0, 50.0]))


def test_contains_checked_with_holes():
    outer = (np.array([0.0, 20.0, 20.0, 0.0, 0.0]),
             np.array([0.0, 0.0, 20.0, 20.0, 0.0]))
    hole = (np.array([5.0, 15.0, 15.0, 5.0, 5.0]),
            np.array([5.0, 5.0, 15.0, 15.0, 5.0]))
    poly = Polygon(0, "X", outer[0], outer[1], [hole[0]], [hole[1]])
    lon = np.array([1.0, 10.0, 25.0])
    lat = np.array([1.0, 10.0, 25.0])
    got = contains_checked(poly, lon, lat)
    assert got.tolist() == [True, False, False]
