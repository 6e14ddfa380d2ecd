"""The synthetic boundary world: 11 features exercising every hard semantic.

Mirrors the shapes FIXTURES.md §2 calls for (and the reference's pain points,
SURVEY.md §7): rectangles, an L-shape, a polygon with a hole, a deliberately
overlapping pair (double-counting semantics of the per-country masks,
prepare_feature_masks.py:66-91), two features normalizing to one country
(admin_names.py:4-73 many-to-one), one feature normalizing to None (dropped,
extract_country_data.py:223-224), and list-valued region membership
(admin_names.py:81-408, e.g. 'American Samoa' → ['Asia (Sans Japan)','USA']).

All coordinates avoid cell-center/vertex coincidences on the fixture grids and
the antimeridian.
"""

from __future__ import annotations

import numpy as np

from ..geometry import Polygon

# admin-name normalization dim (analog of admin_names.adminmap / lookup()).
ADMINMAP: dict[str, str | None] = {
    "Zeta Isles": "Zetaland",            # second feature of Zetaland
    "Nulland Bank": None,                # dropped feature
    "Great Etaria": "Etaria",            # rename
}


def normalize_admin(admin: str) -> str | None:
    """admin_names.lookup semantics (admin_names.py:75-77): mapped name, or
    identity when unmapped; None ⇒ feature dropped."""
    return ADMINMAP.get(admin, admin)


# country → list of regions (analog of admin_names.region_mapping; LIST-valued:
# a country may roll up into several regions, extract_country_data.py:260-262).
REGION_MAPPING: dict[str, list[str] | None] = {
    "Alphaland": ["OECD90"],
    "Betaria": ["Latin America"],
    "Gammastan": ["Asia (Sans Japan)"],
    "Deltaland": ["Middle East and Africa"],
    "Epsilonia": ["OECD90", "EU"],       # many-to-many rollup
    "Zetaland": ["Eastern Europe"],
    "Etaria": ["Eastern Europe"],
    "Thetaland": ["China"],
    "Iotia": ["India"],
    "Kappia": None,                      # country with no region (skipped in rollup)
}

REGIONS = ["OECD90", "Eastern Europe", "Asia (Sans Japan)", "Middle East and Africa",
           "Latin America", "China", "India", "EU", "USA"]


def _ring(coords):
    lons = np.array([c[0] for c in coords] + [coords[0][0]], dtype=np.float64)
    lats = np.array([c[1] for c in coords] + [coords[0][1]], dtype=np.float64)
    return lons, lats


def _rect(lon0, lat0, lon1, lat1):
    return _ring([(lon0, lat0), (lon1, lat0), (lon1, lat1), (lon0, lat1)])


# (feature_id, admin, a3, rings) — country derived via normalize_admin.
_FEATURES = [
    # 0: plain rectangle
    (0, "Alphaland", "ALP", _rect(5.2, 10.2, 25.2, 30.2), []),
    # 1: rectangle in the southern hemisphere
    (1, "Betaria", "BET", _rect(-40.2, -20.2, -10.2, 5.2), []),
    # 2: L-shape (concave)
    (2, "Gammastan", "GAM", _ring([(60.2, 20.2), (85.2, 20.2), (85.2, 30.2),
                                   (72.2, 30.2), (72.2, 45.2), (60.2, 45.2)]), []),
    # 3: rectangle with a rectangular hole
    (3, "Deltaland", "DEL", _rect(-10.2, 35.2, 20.2, 55.2),
     [_rect(0.2, 40.2, 10.2, 50.2)]),
    # 4: overlaps Alphaland's eastern strip (double-counting fixture)
    (4, "Epsilonia", "EPS", _rect(20.2, 10.2, 45.2, 35.2), []),
    # 5+6: two features, one country
    (5, "Zeta Isles", "ZET", _rect(100.2, -35.2, 110.2, -25.2), []),
    (6, "Zetaland", "ZET", _rect(112.2, -35.2, 135.2, -15.2), []),
    # 7: normalizes to None → dropped everywhere
    (7, "Nulland Bank", "NUL", _rect(-120.2, -5.2, -110.2, 5.2), []),
    # 8: big northern country (hot/skewed key) — renamed by ADMINMAP
    (8, "Great Etaria", "ETA", _rect(30.2, 55.2, 120.2, 75.2), []),
    # 9: southern mid-size
    (9, "Thetaland", "THE", _rect(-80.2, -45.2, -50.2, -25.2), []),
    # 10: small island (single coarse cell scale)
    (10, "Iotia", "IOT", _rect(150.2, -5.2, 154.2, -1.2), []),
    # 11: country with region=None
    (11, "Kappia", "KAP", _rect(-170.2, 60.2, -150.2, 70.2), []),
]


def raw_features():
    """The 'shapefile': (feature_id, admin, a3, ring, holes) tuples, in file
    order (the reference iterates features in shapefile order,
    extract_country_data.py:222)."""
    return _FEATURES


def polygons(keep_dropped: bool = False) -> list[Polygon]:
    """Post-normalization Polygon list (None-admins dropped), file order."""
    out = []
    for fid, admin, _a3, (rlons, rlats), holes in _FEATURES:
        country = normalize_admin(admin)
        if country is None and not keep_dropped:
            continue
        out.append(Polygon(
            feature_id=fid, country=country or "",
            ring_lons=rlons, ring_lats=rlats,
            hole_lons=[h[0] for h in holes], hole_lats=[h[1] for h in holes]))
    return out


def boundaries_records():
    """Rows for the `boundaries` parquet dim table (FIXTURES.md §2 schema)."""
    rows = []
    for fid, admin, a3, (rlons, rlats), holes in _FEATURES:
        country = normalize_admin(admin)
        rows.append({
            "feature_id": fid,
            "a3": a3,
            "admin": admin,
            "country": country,
            "regions": REGION_MAPPING.get(country) if country else None,
            "ring_lats": rlats.tolist(),
            "ring_lons": rlons.tolist(),
            "hole_lats": [h[1].tolist() for h in holes],
            "hole_lons": [h[0].tolist() for h in holes],
            "bbox": {
                "lat_min": float(rlats.min()), "lat_max": float(rlats.max()),
                "lon_min": float(rlons.min()), "lon_max": float(rlons.max()),
            },
        })
    return rows
