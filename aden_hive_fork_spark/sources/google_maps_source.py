"""Google Maps Platform connector — geocoding, routing and place
intelligence with envelope parity, on the pluggable REST transport
seam.

Reference analogs (tools/src/aden_tools/tools/google_maps_tool/
google_maps_tool.py): API-key-in-params client (:45-55); the
API-level status protocol ``handle_status`` (:56-82 — OK and
ZERO_RESULTS are valid, the rest map through a friendly table with
``error_message`` appended); geocode (:106-190 — address-or-
components validation, flattened results with formatted_address/
location/place_id/types); reverse geocode (:195-278 — lat/lng range
validation, latlng param); directions (:281-408 — routes→legs→steps
flattening, overview_polyline, waypoint_order); distance matrix
(:411-505 — rows×elements with per-element status); place details
(:508-582 — default fields list, reviews_sort); place text search
(:584-698 — radius cap 50000, price-level window, pagetoken
short-circuit).

Executor tier: ``maps_geocode_table`` geocodes a TABLE of address
rows (mapInPandas, map-only, per-row error envelopes) — address
normalization as a columnar step in an entity-resolution pipeline.

Relationship to ``sources/geo_source.py`` (round 4): geo_source
carries the geocode/reverse pair on the legacy GET-transport seam
plus the deterministic LOCAL haversine distance tier and the
analytics joins in ``operators/geo`` (q119). THIS module is the full
Maps Platform surface — adds directions, the REMOTE distance matrix,
and the Places pair — on the unified 5-arg REST seam shared by every
round-6 connector. New code should prefer this module; geo_source
remains the offline-true local tier.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame

GEOCODE_URL = "https://maps.googleapis.com/maps/api/geocode/json"
DIRECTIONS_URL = "https://maps.googleapis.com/maps/api/directions/json"
DISTANCE_MATRIX_URL = "https://maps.googleapis.com/maps/api/distancematrix/json"
PLACE_DETAILS_URL = "https://maps.googleapis.com/maps/api/place/details/json"
PLACE_SEARCH_URL = "https://maps.googleapis.com/maps/api/place/textsearch/json"

NO_CREDS = {
    "error": "Google Maps API key not configured",
    "help": (
        "Set GOOGLE_MAPS_API_KEY environment variable. "
        "Get a key at https://console.cloud.google.com/apis/credentials "
        "and enable the Geocoding, Directions, Distance Matrix, and "
        "Places APIs."
    ),
}

DEFAULT_PLACE_FIELDS = (
    "name,formatted_address,geometry,rating,"
    "formatted_phone_number,website,opening_hours,"
    "reviews,price_level,types"
)

_STATUS_MESSAGES = {
    "OVER_DAILY_LIMIT": "API key invalid, billing not enabled, or daily "
                        "limit exceeded",
    "OVER_QUERY_LIMIT": "Too many requests. Try again later",
    "REQUEST_DENIED": "Request denied — check that the API is enabled and "
                      "the key is valid",
    "INVALID_REQUEST": "Invalid request — check required parameters",
    "MAX_ELEMENTS_EXCEEDED": "Too many origins × destinations "
                             "(max 625 elements)",
    "MAX_DIMENSIONS_EXCEEDED": "Too many origins or destinations "
                               "(max 25 each)",
    "MAX_WAYPOINTS_EXCEEDED": "Too many waypoints (max 25)",
    "NOT_FOUND": "One or more locations could not be found",
    "UNKNOWN_ERROR": "Server error — please retry",
}


def handle_status(api_status: str, error_message: str = "") -> dict | None:
    """API-level status → error envelope; OK / ZERO_RESULTS pass
    (google_maps_tool.py:56-82)."""
    if api_status in ("OK", "ZERO_RESULTS"):
        return None
    message = _STATUS_MESSAGES.get(api_status, f"API error: {api_status}")
    if error_message:
        message = f"{message}. {error_message}"
    return {"error": message}


def _flat_geocode_item(item: dict) -> dict:
    return {
        "formatted_address": item.get("formatted_address", ""),
        "location": item.get("geometry", {}).get("location", {}),
        "location_type": item.get("geometry", {}).get("location_type", ""),
        "place_id": item.get("place_id", ""),
        "types": item.get("types", []),
        "address_components": item.get("address_components", []),
    }


class GoogleMapsClient:
    """Maps Platform client. ``transport(method, url, params,
    json_body, headers) -> (status, bytes)``; the API key rides in
    params (excluded from fixture keys via _CRED_PARAMS)."""

    def __init__(self, api_key: str, transport):
        self._api_key = api_key
        self.transport = transport

    def _get(self, url: str, params: dict) -> dict:
        params = dict(params)
        params["key"] = self._api_key
        try:
            status, body = self.transport("GET", url, params, None, {})
        except Exception as e:
            return {"error": f"Network error: {e}"}
        if status != 200:
            return {"error": f"HTTP {status}: "
                             f"{body.decode(errors='replace')[:200]}"}
        try:
            data = json.loads(body)
        except Exception:
            return {"error": "HTTP 200: unparseable body"}
        status_error = handle_status(
            data.get("status", "UNKNOWN_ERROR"),
            data.get("error_message", ""),
        )
        if status_error:
            return status_error
        return data

    def geocode(self, address: str = "", components: str = "",
                bounds: str = "", region: str = "",
                language: str = "") -> dict:
        if not address and not components:
            return {"error": "Either address or components is required"}
        params: dict = {}
        for k, v in (("address", address), ("components", components),
                     ("bounds", bounds), ("region", region),
                     ("language", language)):
            if v:
                params[k] = v
        data = self._get(GEOCODE_URL, params)
        if "error" in data:
            return data
        results = [_flat_geocode_item(it) for it in data.get("results", [])]
        return {"query": address or components, "results": results,
                "total": len(results)}

    def reverse_geocode(self, latitude: float, longitude: float,
                        result_type: str = "", location_type: str = "",
                        language: str = "") -> dict:
        if not (-90 <= latitude <= 90):
            return {"error": "Latitude must be between -90 and 90"}
        if not (-180 <= longitude <= 180):
            return {"error": "Longitude must be between -180 and 180"}
        params: dict = {"latlng": f"{latitude},{longitude}"}
        for k, v in (("result_type", result_type),
                     ("location_type", location_type),
                     ("language", language)):
            if v:
                params[k] = v
        data = self._get(GEOCODE_URL, params)
        if "error" in data:
            return data
        results = [_flat_geocode_item(it) for it in data.get("results", [])]
        return {"coordinates": {"lat": latitude, "lng": longitude},
                "results": results, "total": len(results)}

    def directions(self, origin: str, destination: str,
                   mode: str = "driving", waypoints: str = "",
                   alternatives: bool = False, units: str = "metric",
                   avoid: str = "", departure_time: str = "",
                   language: str = "") -> dict:
        if not origin:
            return {"error": "Origin is required"}
        if not destination:
            return {"error": "Destination is required"}
        params: dict = {"origin": origin, "destination": destination,
                        "mode": mode, "units": units}
        if waypoints:
            params["waypoints"] = waypoints
        if alternatives:
            params["alternatives"] = "true"
        for k, v in (("avoid", avoid), ("departure_time", departure_time),
                     ("language", language)):
            if v:
                params[k] = v
        data = self._get(DIRECTIONS_URL, params)
        if "error" in data:
            return data
        routes = []
        for route in data.get("routes", []):
            legs = []
            for leg in route.get("legs", []):
                steps = [
                    {"instruction": s.get("html_instructions", ""),
                     "distance": s.get("distance", {}),
                     "duration": s.get("duration", {}),
                     "travel_mode": s.get("travel_mode", "")}
                    for s in leg.get("steps", [])
                ]
                legs.append({
                    "start_address": leg.get("start_address", ""),
                    "end_address": leg.get("end_address", ""),
                    "distance": leg.get("distance", {}),
                    "duration": leg.get("duration", {}),
                    "duration_in_traffic": leg.get("duration_in_traffic"),
                    "steps": steps,
                })
            routes.append({
                "summary": route.get("summary", ""),
                "legs": legs,
                "overview_polyline": route.get(
                    "overview_polyline", {}).get("points", ""),
                "warnings": route.get("warnings", []),
                "waypoint_order": route.get("waypoint_order", []),
            })
        return {"origin": origin, "destination": destination, "mode": mode,
                "routes": routes, "total_routes": len(routes)}

    def distance_matrix(self, origins: str, destinations: str,
                        mode: str = "driving", units: str = "metric",
                        avoid: str = "", departure_time: str = "",
                        language: str = "") -> dict:
        if not origins:
            return {"error": "Origins is required"}
        if not destinations:
            return {"error": "Destinations is required"}
        params: dict = {"origins": origins, "destinations": destinations,
                        "mode": mode, "units": units}
        for k, v in (("avoid", avoid), ("departure_time", departure_time),
                     ("language", language)):
            if v:
                params[k] = v
        data = self._get(DISTANCE_MATRIX_URL, params)
        if "error" in data:
            return data
        rows = []
        for row in data.get("rows", []):
            elements = []
            for element in row.get("elements", []):
                elem = {"status": element.get("status", ""),
                        "distance": element.get("distance", {}),
                        "duration": element.get("duration", {})}
                if "duration_in_traffic" in element:
                    elem["duration_in_traffic"] = element[
                        "duration_in_traffic"]
                elements.append(elem)
            rows.append({"elements": elements})
        return {"origin_addresses": data.get("origin_addresses", []),
                "destination_addresses": data.get(
                    "destination_addresses", []),
                "rows": rows}

    def place_details(self, place_id: str,
                      fields: str = DEFAULT_PLACE_FIELDS,
                      language: str = "",
                      reviews_sort: str = "most_relevant") -> dict:
        if not place_id:
            return {"error": "place_id is required"}
        params: dict = {"place_id": place_id, "fields": fields,
                        "reviews_sort": reviews_sort}
        if language:
            params["language"] = language
        data = self._get(PLACE_DETAILS_URL, params)
        if "error" in data:
            return data
        return {"place_id": place_id, "result": data.get("result", {})}

    def place_search(self, query: str = "", location: str = "",
                     radius: int = 0, type: str = "", language: str = "",
                     opennow: bool = False, minprice: int = -1,
                     maxprice: int = -1, region: str = "",
                     page_token: str = "") -> dict:
        if not query and not page_token:
            return {"error": "Query or page_token is required"}
        params: dict = {}
        if page_token:
            params["pagetoken"] = page_token
        if query:
            params["query"] = query
        if location:
            params["location"] = location
        if radius > 0:
            params["radius"] = str(min(radius, 50000))
        if type:
            params["type"] = type
        if language:
            params["language"] = language
        if opennow:
            params["opennow"] = "true"
        if 0 <= minprice <= 4:
            params["minprice"] = str(minprice)
        if 0 <= maxprice <= 4:
            params["maxprice"] = str(maxprice)
        if region:
            params["region"] = region
        data = self._get(PLACE_SEARCH_URL, params)
        if "error" in data:
            return data
        results = [
            {"name": it.get("name", ""),
             "formatted_address": it.get("formatted_address", ""),
             "location": it.get("geometry", {}).get("location", {}),
             "rating": it.get("rating"),
             "user_ratings_total": it.get("user_ratings_total"),
             "place_id": it.get("place_id", ""),
             "types": it.get("types", [])}
            for it in data.get("results", [])
        ]
        return {"query": query, "results": results, "total": len(results),
                "next_page_token": data.get("next_page_token")}


GEOCODE_SCHEMA = (
    "address string, formatted_address string, lat double, lng double, "
    "place_id string, location_type string, error string"
)


def maps_geocode_table(addresses: DataFrame, client_factory,
                       addr_col: str = "address") -> DataFrame:
    """Geocode a TABLE of addresses on the executors (mapInPandas,
    map-only, per-row error envelopes): first result per address.
    ``client_factory`` must pickle by value (lambda/closure)."""
    import pandas as pd

    cols = [f.split()[0] for f in GEOCODE_SCHEMA.split(",")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for addr in pdf[addr_col]:
                env = client.geocode(str(addr))
                if "error" in env:
                    rows.append({"address": addr, "formatted_address": None,
                                 "lat": None, "lng": None, "place_id": None,
                                 "location_type": None,
                                 "error": env["error"]})
                    continue
                if not env["results"]:
                    rows.append({"address": addr, "formatted_address": None,
                                 "lat": None, "lng": None, "place_id": None,
                                 "location_type": None, "error": None})
                    continue
                top = env["results"][0]
                rows.append({
                    "address": addr,
                    "formatted_address": top["formatted_address"],
                    "lat": top["location"].get("lat"),
                    "lng": top["location"].get("lng"),
                    "place_id": top["place_id"],
                    "location_type": top["location_type"],
                    "error": None,
                })
            yield pd.DataFrame(rows, columns=cols)

    return addresses.select(addr_col).mapInPandas(run, GEOCODE_SCHEMA)
