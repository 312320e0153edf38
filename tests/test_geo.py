"""Geospatial tests: haversine against published city distances, the
grid-bucketed radius join vs a brute-force cross join (including
antimeridian wrap), and the Maps-tool adapter envelopes replayed
through fixture transports."""

from __future__ import annotations

import json
import math

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.operators.geo import haversine_km, radius_join
from aden_hive_fork_spark.sources.geo_source import (
    GEOCODE_URL,
    MISSING_KEY_ERROR,
    MapsClient,
    geocode_table,
    handle_status,
    local_distance_matrix,
    maps_geocode,
)
from aden_hive_fork_spark.sources.search_source import FixtureGetTransport

# (name, lat, lon); pairwise great-circle distances are published
CITIES = [
    ("paris", 48.8566, 2.3522),
    ("london", 51.5074, -0.1278),
    ("nyc", 40.7128, -74.0060),
    ("sydney", -33.8688, 151.2093),
    ("suva", -18.1416, 178.4419),       # west of the antimeridian
    ("apia", -13.8333, -171.7667),      # east of the antimeridian
]


def test_haversine_published_distances(spark):
    df = spark.createDataFrame(
        [
            (48.8566, 2.3522, 51.5074, -0.1278),     # Paris-London ~344 km
            (40.7128, -74.0060, 51.5074, -0.1278),   # NYC-London ~5570 km
            (-18.1416, 178.4419, -13.8333, -171.7667),  # Suva-Apia ~1150 km
        ],
        ["lat1", "lon1", "lat2", "lon2"],
    )
    out = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"),
                     F.col("lat2"), F.col("lon2")).alias("d")
    ).collect()
    assert abs(out[0]["d"] - 344) < 5
    assert abs(out[1]["d"] - 5570) < 20
    assert abs(out[2]["d"] - 1150) < 20  # crosses the antimeridian


def brute_pairs(pts, radius):
    def hav(a, b):
        dphi = math.radians(b[1] - a[1]) / 2
        dlam = math.radians(b[2] - a[2]) / 2
        x = (math.sin(dphi) ** 2
             + math.cos(math.radians(a[1])) * math.cos(math.radians(b[1]))
             * math.sin(dlam) ** 2)
        return 2 * 6371.0 * math.asin(math.sqrt(x))

    return {
        (a[0], b[0]) for a in pts for b in pts if hav(a, b) <= radius
    }


def test_radius_join_matches_brute_force_incl_wraparound(spark):
    pts = spark.createDataFrame(
        [(n, la, lo) for n, la, lo in CITIES], ["name", "lat", "lon"]
    )
    pois = pts.select(
        F.col("name").alias("poi"),
        F.col("lat").alias("plat"),
        F.col("lon").alias("plon"),
    )
    got = {
        (r["name"], r["poi"])
        for r in radius_join(
            pts, pois, radius_km=1200.0,
            lat_col="lat", lon_col="lon",
            right_lat_col="plat", right_lon_col="plon",
            max_abs_lat=66.0,
        ).collect()
    }
    want = brute_pairs(CITIES, 1200.0)
    assert got == want
    # the wraparound pair must be present (suva–apia ~1150 km)
    assert ("suva", "apia") in got and ("apia", "suva") in got
    # and every self-pair exactly once (array_distinct dedup guard)
    assert sum(1 for a, b in got if a == b) == len(CITIES)


def test_radius_join_no_duplicates_with_huge_radius(spark):
    """Radius larger than the globe → lon ring collapses; neighbor
    dedup must keep each pair exactly once."""
    pts = spark.createDataFrame(
        [(n, la, lo) for n, la, lo in CITIES], ["name", "lat", "lon"]
    )
    pois = pts.select(F.col("name").alias("poi"),
                      F.col("lat").alias("plat"),
                      F.col("lon").alias("plon"))
    rows = radius_join(
        pts, pois, radius_km=25_000.0,
        lat_col="lat", lon_col="lon",
        right_lat_col="plat", right_lon_col="plon",
    ).collect()
    assert len(rows) == len(CITIES) ** 2  # every pair, exactly once


def test_radius_join_validation():
    with pytest.raises(ValueError):
        radius_join(None, None, radius_km=0)
    with pytest.raises(ValueError):
        radius_join(None, None, radius_km=10, max_abs_lat=85)


# ---------------------------------------------------------------------------
# maps adapter
# ---------------------------------------------------------------------------
GEOCODE_BODY = json.dumps(
    {
        "status": "OK",
        "results": [
            {
                "formatted_address": "1600 Amphitheatre Pkwy, CA 94043, USA",
                "geometry": {
                    "location": {"lat": 37.4224, "lng": -122.0842},
                    "location_type": "ROOFTOP",
                },
                "place_id": "ChIJ2eUgeAK6j4AR",
                "types": ["street_address"],
                "address_components": [{"long_name": "1600"}],
            }
        ],
    }
).encode()


def geocode_fixture(params, body=GEOCODE_BODY, status=200):
    t = FixtureGetTransport()
    t.fixtures[FixtureGetTransport.key(GEOCODE_URL, params)] = (status, body)
    return t


def test_geocode_envelope_and_wire_shape():
    t = geocode_fixture({"address": "1600 Amphitheatre"})
    out = MapsClient("KEY", t).geocode(address="1600 Amphitheatre")
    assert out == {
        "query": "1600 Amphitheatre",
        "results": [
            {
                "formatted_address": "1600 Amphitheatre Pkwy, CA 94043, USA",
                "location": {"lat": 37.4224, "lng": -122.0842},
                "location_type": "ROOFTOP",
                "place_id": "ChIJ2eUgeAK6j4AR",
                "types": ["street_address"],
                "address_components": [{"long_name": "1600"}],
            }
        ],
        "total": 1,
    }
    # key param went out on the wire (excluded from fixture keys)
    assert t.requests[0][1]["key"] == "KEY"


def test_geocode_api_status_mapping():
    assert handle_status("OK") is None
    assert handle_status("ZERO_RESULTS") is None
    assert handle_status("REQUEST_DENIED") == {
        "error": (
            "Request denied — check that the API is enabled and the key "
            "is valid"
        )
    }
    assert handle_status("WEIRD") == {"error": "API error: WEIRD"}
    assert handle_status("UNKNOWN_ERROR", "backend hiccup") == {
        "error": "Server error — please retry. backend hiccup"
    }
    body = json.dumps({"status": "OVER_QUERY_LIMIT"}).encode()
    out = MapsClient("K", geocode_fixture({"address": "x"}, body)).geocode(
        address="x"
    )
    assert out == {"error": "Too many requests. Try again later"}


def test_geocode_validation_and_missing_key():
    assert MapsClient("K", None).geocode() == {
        "error": "Either address or components is required"
    }
    assert maps_geocode("somewhere") == MISSING_KEY_ERROR
    c = MapsClient("K", None)
    assert c.reverse_geocode(91.0, 0.0) == {
        "error": "latitude must be between -90 and 90"
    }
    assert c.reverse_geocode(0.0, 200.0) == {
        "error": "longitude must be between -180 and 180"
    }


def test_reverse_geocode_envelope():
    t = geocode_fixture({"latlng": "37.4224,-122.0842"})
    out = MapsClient("K", t).reverse_geocode(37.4224, -122.0842)
    assert out["total"] == 1
    assert out["latitude"] == 37.4224
    assert out["results"][0]["place_id"] == "ChIJ2eUgeAK6j4AR"


def test_local_distance_matrix():
    out = local_distance_matrix(
        [(48.8566, 2.3522)], [(51.5074, -0.1278), (48.8566, 2.3522)]
    )
    d = out["rows"][0]["elements"]
    assert abs(d[0]["distance_km"] - 344) < 5
    assert d[1]["distance_km"] == 0.0
    assert out["metric"] == "haversine_km"
    # API-limit parity
    far = [(0.0, float(i)) for i in range(26)]
    assert "max 25 each" in local_distance_matrix(far, [(0, 0)])["error"]


def test_geocode_table_distributed(spark):
    addresses = spark.createDataFrame(
        [("1600 Amphitheatre",), ("nowhere-ville",)], ["address"]
    )

    def factory():
        from aden_hive_fork_spark.sources.geo_source import MapsClient

        def transport(url, params, headers):
            if params.get("address") == "1600 Amphitheatre":
                return 200, GEOCODE_BODY
            return 200, json.dumps(
                {"status": "OK", "results": []}
            ).encode()

        return MapsClient("K", transport)

    out = {r["address"]: r.asDict()
           for r in geocode_table(addresses, factory).collect()}
    hit = out["1600 Amphitheatre"]
    assert hit["lat"] == 37.4224 and hit["lon"] == -122.0842
    assert hit["error"] is None
    miss = out["nowhere-ville"]
    assert miss["total"] == 0 and miss["lat"] is None


def test_radius_join_high_lat_boundary_pairs(spark):
    """Adversarial case for the longitude cell bound: at lat 60 with
    R=1500 km the EXACT max lon separation (2*asin(sin(R/2Re)/cosL)
    = 27.17 deg) exceeds the linear R/(111*cosL) approximation
    (27.03 deg). A pair in that window, placed across a cell
    boundary, is missed by the linear bound — the cell width must
    come from the exact spherical formula."""
    base = 27.027027 * 3 - 180.0 - 0.001
    pts = spark.createDataFrame(
        [("a", 60.0, base)], ["name", "lat", "lon"]
    )
    pois = spark.createDataFrame(
        [("b", 60.0, base + 27.15)], ["poi", "plat", "plon"]
    )
    got = radius_join(
        pts, pois, radius_km=1500.0,
        lat_col="lat", lon_col="lon",
        right_lat_col="plat", right_lon_col="plon",
        max_abs_lat=60.0,
    ).collect()
    assert len(got) == 1  # dist ~1499.05 km <= 1500
    assert abs(got[0]["dist_km"] - 1499.05) < 0.5

    # dense sweep at the extreme latitude: grid join == brute force
    lons = [i * 1.7 for i in range(212)]  # 0 .. 358.7 wrapped later
    cities = [(f"p{i}", 60.0, ((lo + 180) % 360) - 180)
              for i, lo in enumerate(lons)]
    df = spark.createDataFrame(cities, ["name", "lat", "lon"])
    dfr = df.select(F.col("name").alias("poi"),
                    F.col("lat").alias("plat"),
                    F.col("lon").alias("plon"))
    got = {
        (r["name"], r["poi"])
        for r in radius_join(
            df, dfr, radius_km=1500.0,
            lat_col="lat", lon_col="lon",
            right_lat_col="plat", right_lon_col="plon",
            max_abs_lat=60.0,
        ).collect()
    }
    assert got == brute_pairs(cities, 1500.0)
