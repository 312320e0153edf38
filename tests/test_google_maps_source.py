"""Google Maps connector conformance tests: the API-status protocol
(OK/ZERO_RESULTS pass, friendly table otherwise), geocode/reverse
validation and flattening, directions legs/steps flattening, distance
matrix rows×elements, place search param shaping, and the distributed
geocode tier (google_maps_tool.py parity)."""

from __future__ import annotations

from aden_hive_fork_spark.sources.google_maps_source import (
    DIRECTIONS_URL,
    DISTANCE_MATRIX_URL,
    GEOCODE_URL,
    PLACE_SEARCH_URL,
    GoogleMapsClient,
    handle_status,
    maps_geocode_table,
)
from aden_hive_fork_spark.sources.rest_connector import (
    FixtureRestTransport,
    jdump,
)

GEO_ITEM = {
    "formatted_address": "1600 Amphitheatre Pkwy, Mountain View, CA",
    "geometry": {"location": {"lat": 37.42, "lng": -122.08},
                 "location_type": "ROOFTOP"},
    "place_id": "ChIJx",
    "types": ["street_address"],
    "address_components": [{"long_name": "1600"}],
}


def test_handle_status_protocol():
    assert handle_status("OK") is None
    assert handle_status("ZERO_RESULTS") is None
    assert handle_status("REQUEST_DENIED")["error"].startswith(
        "Request denied")
    assert handle_status("OVER_QUERY_LIMIT", "quota hit")["error"].endswith(
        ". quota hit")
    assert handle_status("WEIRD")["error"] == "API error: WEIRD"


def test_geocode_flattening_and_key_in_params():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", GEOCODE_URL, {"address": "1600 Amphitheatre"},
        ): (200, jdump({"status": "OK", "results": [GEO_ITEM]})),
    })
    c = GoogleMapsClient("mk", t)
    env = c.geocode("1600 Amphitheatre")
    assert env["total"] == 1
    assert env["results"][0]["location"] == {"lat": 37.42, "lng": -122.08}
    assert t.requests[0][2]["key"] == "mk"  # key rides in params
    assert c.geocode()["error"] == (
        "Either address or components is required")


def test_reverse_geocode_range_validation():
    c = GoogleMapsClient("mk", FixtureRestTransport())
    assert "Latitude" in c.reverse_geocode(91, 0)["error"]
    assert "Longitude" in c.reverse_geocode(0, 181)["error"]


def test_directions_flattening():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", DIRECTIONS_URL,
            {"origin": "A", "destination": "B", "mode": "driving",
             "units": "metric"},
        ): (200, jdump({"status": "OK", "routes": [{
            "summary": "I-95", "overview_polyline": {"points": "abc"},
            "warnings": [], "waypoint_order": [],
            "legs": [{"start_address": "A", "end_address": "B",
                      "distance": {"value": 1000},
                      "duration": {"value": 60},
                      "steps": [{"html_instructions": "Go",
                                 "distance": {"value": 1000},
                                 "duration": {"value": 60},
                                 "travel_mode": "DRIVING"}]}],
        }]})),
    })
    env = GoogleMapsClient("mk", t).directions("A", "B")
    assert env["total_routes"] == 1
    route = env["routes"][0]
    assert route["overview_polyline"] == "abc"
    assert route["legs"][0]["steps"][0]["instruction"] == "Go"
    c = GoogleMapsClient("mk", FixtureRestTransport())
    assert c.directions("", "B")["error"] == "Origin is required"


def test_distance_matrix_rows_elements():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", DISTANCE_MATRIX_URL,
            {"origins": "A|B", "destinations": "C", "mode": "driving",
             "units": "metric"},
        ): (200, jdump({"status": "OK",
                        "origin_addresses": ["A", "B"],
                        "destination_addresses": ["C"],
                        "rows": [
                            {"elements": [{"status": "OK",
                                           "distance": {"value": 5},
                                           "duration": {"value": 9},
                                           "duration_in_traffic":
                                               {"value": 12}}]},
                            {"elements": [{"status": "NOT_FOUND"}]},
                        ]})),
    })
    env = GoogleMapsClient("mk", t).distance_matrix("A|B", "C")
    assert env["rows"][0]["elements"][0]["duration_in_traffic"] == {
        "value": 12}
    assert env["rows"][1]["elements"][0]["status"] == "NOT_FOUND"
    assert "distance" in env["rows"][1]["elements"][0]  # shape-stable


def test_place_search_param_shaping():
    t = FixtureRestTransport()
    c = GoogleMapsClient("mk", t)
    assert "Query or page_token" in c.place_search()["error"]
    c.place_search("pizza", location="1,2", radius=99999, minprice=0,
                   maxprice=2, opennow=True)
    params = t.requests[0][2]
    assert params["radius"] == "50000"  # capped
    assert params["minprice"] == "0" and params["maxprice"] == "2"
    assert params["opennow"] == "true"
    # pagetoken path short-circuits
    c.place_search("pizza", page_token="tok2", radius=100)
    assert t.requests[1][2]["pagetoken"] == "tok2"


def test_zero_results_is_valid_empty():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", GEOCODE_URL, {"address": "nowhere"},
        ): (200, jdump({"status": "ZERO_RESULTS", "results": []})),
    })
    env = GoogleMapsClient("mk", t).geocode("nowhere")
    assert env == {"query": "nowhere", "results": [], "total": 0}


def test_geocode_table_distributed(spark):
    fixtures = {
        FixtureRestTransport.key(
            "GET", GEOCODE_URL, {"address": "HQ"},
        ): (200, jdump({"status": "OK", "results": [GEO_ITEM]})),
        FixtureRestTransport.key(
            "GET", GEOCODE_URL, {"address": "denied"},
        ): (200, jdump({"status": "REQUEST_DENIED"})),
        FixtureRestTransport.key(
            "GET", GEOCODE_URL, {"address": "nowhere"},
        ): (200, jdump({"status": "ZERO_RESULTS", "results": []})),
    }
    addrs = spark.createDataFrame([("HQ",), ("denied",), ("nowhere",)],
                                  "address string")
    out = {r["address"]: r for r in maps_geocode_table(
        addrs, lambda: GoogleMapsClient("mk", FixtureRestTransport(fixtures))
    ).collect()}
    assert out["HQ"]["lat"] == 37.42 and out["HQ"]["place_id"] == "ChIJx"
    assert out["denied"]["error"].startswith("Request denied")
    # ZERO_RESULTS: no match but no error either
    assert out["nowhere"]["error"] is None and out["nowhere"]["lat"] is None
