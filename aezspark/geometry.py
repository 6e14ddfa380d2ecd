"""Vectorized polygon geometry in pure numpy — PIP, distances, boundary index.

GDAL/shapely are unavailable here, so the engine implements its own geometry
kernel (this is also what makes it a from-scratch engine rather than a GDAL
wrapper). Semantics replace the reference's rasterized-mask containment
(prepare_feature_masks.py:9-63 builds per-country bitmaps; the probe at
extract_country_data.py:231-245 tests mask==1): we evaluate true
point-in-polygon of pixel centers / document points against polygon rings.

Conventions:
  * rings are closed (first == last vertex) arrays of (lons, lats);
  * even-odd (crossing number) rule; a point on a horizontal edge follows the
    half-open ray-casting rule (documented vertex rule — fixtures avoid
    degenerate on-edge points, SURVEY §7);
  * polygons may have holes; containment = in exterior and in no hole;
  * no antimeridian handling (fixture worlds avoid it).

Everything is vectorized over points; per-polygon loops are over the (small,
broadcast) dim table only.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def point_in_ring(lon, lat, ring_lons, ring_lats):
    """Even-odd crossing-number test, vectorized over N points.

    Classic ray casting: cast a ray in +lon; count edge crossings.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    rx = np.asarray(ring_lons, dtype=np.float64)
    ry = np.asarray(ring_lats, dtype=np.float64)
    inside = np.zeros(lon.shape, dtype=bool)
    x1, y1 = rx[:-1], ry[:-1]
    x2, y2 = rx[1:], ry[1:]
    for i in range(x1.shape[0]):
        a_y, b_y = y1[i], y2[i]
        if a_y == b_y:
            continue  # horizontal edge never crosses the half-open ray rule
        crosses = (a_y > lat) != (b_y > lat)
        if not crosses.any():
            continue
        x_at = x1[i] + (lat - a_y) * (x2[i] - x1[i]) / (b_y - a_y)
        inside ^= crosses & (lon < x_at)
    return inside


def point_seg_dist_deg(lon, lat, x1, y1, x2, y2):
    """Min distance (in equirectangular-scaled degrees) from N points to M
    segments. Longitude is scaled by cos(lat) so distances are isotropic enough
    for nearest-zone ranking at fixture latitudes (documented approximation;
    exact geodesics are out of scope, matching the reference which has no
    distance op at all). Returns (N, M)."""
    lon = np.asarray(lon, dtype=np.float64)[:, None]
    lat = np.asarray(lat, dtype=np.float64)[:, None]
    scale = np.cos(np.radians(lat))
    px = lon * scale
    py = lat
    ax1 = np.asarray(x1, dtype=np.float64)[None, :] * scale
    ay1 = np.asarray(y1, dtype=np.float64)[None, :] + 0.0 * px
    ax2 = np.asarray(x2, dtype=np.float64)[None, :] * scale
    ay2 = np.asarray(y2, dtype=np.float64)[None, :] + 0.0 * px
    dx = ax2 - ax1
    dy = ay2 - ay1
    seg_len2 = dx * dx + dy * dy
    seg_len2 = np.where(seg_len2 == 0.0, 1e-300, seg_len2)
    t = ((px - ax1) * dx + (py - ay1) * dy) / seg_len2
    t = np.clip(t, 0.0, 1.0)
    cx = ax1 + t * dx
    cy = ay1 + t * dy
    return np.sqrt((px - cx) ** 2 + (py - cy) ** 2)


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km (spherical, R=6371.0088)."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(a, dtype=np.float64))
                              for a in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * 6371.0088 * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


@dataclass
class Polygon:
    """One boundary feature: exterior ring + optional holes + metadata."""

    feature_id: int
    country: str
    ring_lons: np.ndarray
    ring_lats: np.ndarray
    hole_lons: list = field(default_factory=list)
    hole_lats: list = field(default_factory=list)

    @property
    def bbox(self):
        return (float(self.ring_lats.min()), float(self.ring_lats.max()),
                float(self.ring_lons.min()), float(self.ring_lons.max()))

    def contains(self, lon, lat):
        inside = point_in_ring(lon, lat, self.ring_lons, self.ring_lats)
        for hx, hy in zip(self.hole_lons, self.hole_lats):
            inside &= ~point_in_ring(lon, lat, hx, hy)
        return inside

    def segments(self):
        """All boundary segments (exterior + holes) as (x1, y1, x2, y2)."""
        xs = [self.ring_lons]
        ys = [self.ring_lats]
        xs += list(self.hole_lons)
        ys += list(self.hole_lats)
        x1 = np.concatenate([a[:-1] for a in xs])
        x2 = np.concatenate([a[1:] for a in xs])
        y1 = np.concatenate([a[:-1] for a in ys])
        y2 = np.concatenate([a[1:] for a in ys])
        return x1, y1, x2, y2


class BoundaryIndex:
    """Broadcastable spatial index over a (small) polygon dim table.

    The numpy stand-in for an STRtree: a uniform lon/lat bucket grid (pixel
    size adapted to the median polygon bbox, so each polygon covers O(10)
    buckets) mapping bucket → candidate feature ids via bbox cover. The whole
    object is pickled into the Spark broadcast for mapInPandas kernels. This
    replaces the reference's per-country mask files — the offline index build
    of prepare_feature_masks.py:66-91 — with an in-memory index whose build is
    O(features · buckets).
    """

    def __init__(self, polygons: list[Polygon], index_px: float | None = None):
        self.polygons = polygons
        if index_px is None:
            spans = []
            for p in polygons:
                lat_min, lat_max, lon_min, lon_max = p.bbox
                spans.append(max(lat_max - lat_min, lon_max - lon_min))
            med = float(np.median(spans)) if spans else 10.0
            index_px = max(med / 3.0, 0.25)
        self.index_px = float(index_px)
        self.index_nx = int(np.ceil(360.0 / self.index_px))
        buckets: dict[int, list[int]] = {}
        for i, poly in enumerate(polygons):
            lat_min, lat_max, lon_min, lon_max = poly.bbox
            x0, y0 = self._bx(lon_min), self._by(lat_max)
            x1, y1 = self._bx(lon_max), self._by(lat_min)
            for by in range(y0, y1 + 1):
                for bx in range(x0, x1 + 1):
                    buckets.setdefault(by * self.index_nx + bx, []).append(i)
        self.cell_to_feats = {c: np.array(v, dtype=np.int64) for c, v in buckets.items()}
        # flattened segment arrays for kNN distance scans
        segs = [p.segments() for p in polygons]
        self.seg_x1 = np.concatenate([s[0] for s in segs])
        self.seg_y1 = np.concatenate([s[1] for s in segs])
        self.seg_x2 = np.concatenate([s[2] for s in segs])
        self.seg_y2 = np.concatenate([s[3] for s in segs])
        self.seg_feat = np.concatenate([
            np.full(len(s[0]), i, dtype=np.int64) for i, s in enumerate(segs)])

    def _bx(self, lon) -> int:
        return int(np.floor((lon + 180.0) / self.index_px))

    def _by(self, lat) -> int:
        return int(np.floor((90.0 - lat) / self.index_px))

    def bucket_of(self, lon, lat):
        """Vectorized bucket key for points."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        bx = np.floor((lon + 180.0) / self.index_px).astype(np.int64)
        by = np.floor((90.0 - lat) / self.index_px).astype(np.int64)
        return by * self.index_nx + bx

    def candidates(self, cells):
        """Candidate polygon positions for an array of bucket keys.
        Returns (point_idx, poly_pos) COO pairs."""
        cells = np.asarray(cells, dtype=np.int64)
        pt_idx = []
        poly_pos = []
        # group points by cell so each distinct cell is looked up once
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        bounds = np.flatnonzero(np.diff(sorted_cells)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(cells)]))
        for s, e in zip(starts, ends):
            feats = self.cell_to_feats.get(int(sorted_cells[s]))
            if feats is None:
                continue
            pts = order[s:e]
            pt_idx.append(np.repeat(pts, len(feats)))
            poly_pos.append(np.tile(feats, len(pts)))
        if not pt_idx:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        return np.concatenate(pt_idx), np.concatenate(poly_pos)

    def pip(self, lon, lat, many_to_many: bool = True):
        """Point-in-polygon over N points → COO (point_idx, poly_pos) matches.

        many_to_many=True preserves the reference's overlapping-claims
        semantics (each country mask rasterized independently —
        prepare_feature_masks.py:66-91 — so a pixel can belong to several
        countries and is double-counted; SURVEY §7 'double counting is a
        feature'). many_to_many=False keeps the lowest feature_id.
        """
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        pt_idx, poly_pos = self.candidates(self.bucket_of(lon, lat))
        keep_pt = []
        keep_poly = []
        # evaluate candidates grouped per polygon: one vectorized ring test each
        order = np.argsort(poly_pos, kind="stable")
        pt_idx = pt_idx[order]
        poly_pos = poly_pos[order]
        bounds = np.flatnonzero(np.diff(poly_pos)) + 1
        starts = np.concatenate(([0], bounds)) if len(poly_pos) else []
        ends = np.concatenate((bounds, [len(poly_pos)])) if len(poly_pos) else []
        for s, e in zip(starts, ends):
            pos = int(poly_pos[s])
            pts = pt_idx[s:e]
            hit = self.polygons[pos].contains(lon[pts], lat[pts])
            keep_pt.append(pts[hit])
            keep_poly.append(np.full(int(hit.sum()), pos, dtype=np.int64))
        if keep_pt:
            pt = np.concatenate(keep_pt)
            pp = np.concatenate(keep_poly)
        else:
            pt = np.empty(0, dtype=np.int64)
            pp = np.empty(0, dtype=np.int64)
        if not many_to_many and len(pt):
            order = np.lexsort((pp, pt))
            pt, pp = pt[order], pp[order]
            first = np.concatenate(([True], np.diff(pt) != 0))
            pt, pp = pt[first], pp[first]
        return pt, pp

    def nearest(self, lon, lat):
        """Nearest feature (by boundary distance) for each of N points.
        Returns (poly_pos, dist_deg). Brute-force over the broadcast segment
        set — bounded because the dim table is broadcastable by design."""
        d = point_seg_dist_deg(lon, lat, self.seg_x1, self.seg_y1,
                               self.seg_x2, self.seg_y2)
        # min distance per feature, then argmin across features
        n_feat = len(self.polygons)
        best = np.full((len(np.atleast_1d(lon)), n_feat), np.inf)
        for f in range(n_feat):
            cols = self.seg_feat == f
            if cols.any():
                best[:, f] = d[:, cols].min(axis=1)
        pos = best.argmin(axis=1)
        return pos, best[np.arange(best.shape[0]), pos]

    def feature_ids(self):
        return np.array([p.feature_id for p in self.polygons], dtype=np.int64)

    def countries(self):
        return np.array([p.country for p in self.polygons], dtype=object)
