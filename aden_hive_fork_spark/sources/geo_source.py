"""Geocoding / maps clients — the reference Maps tool's wire shapes
over the shared pluggable GET transport, plus a deterministic LOCAL
distance tier and a distributed geocode fan-out.

Reference analogs (envelope parity, verified field-by-field):
tools/src/aden_tools/tools/google_maps_tool/google_maps_tool.py —
``maps_geocode`` (:106-193: params, HTTP + API-status error handling,
``{query, results[{formatted_address, location, location_type,
place_id, types, address_components}], total}``),
``maps_reverse_geocode`` (:195-279), API status→message map
(:56-82), missing-key envelope (:33-40).

The reference resolves distance matrices through the remote API; the
LOCAL tier here (``local_distance_matrix``) computes haversine
great-circle distances deterministically — same split as the vision
tool's local tier: offline-true analytics now, the REST adapter seam
for road distances when configured.

Scale: one-address clients are driver-side (reference interactive
shape); ``geocode_table`` fans a table of addresses out on the
executors (``mapInPandas``, per-row error envelopes). The analytic
joins over geocoded output live in ``operators/geo`` (pure-column
haversine + grid-bucketed radius join, q119).

The FULL Maps Platform surface (directions, remote distance matrix,
place details/search) lives in ``sources/google_maps_source.py`` on
the unified round-6 REST transport seam; this module remains the
offline-true local tier.
"""

from __future__ import annotations

import json
import math
from typing import Iterator

from pyspark.sql import DataFrame

GEOCODE_URL = "https://maps.googleapis.com/maps/api/geocode/json"

MISSING_KEY_ERROR = {
    "error": "Google Maps API key not configured",
    "help": (
        "Get a key at https://console.cloud.google.com/apis/credentials "
        "and enable the Geocoding, Directions, Distance Matrix, and "
        "Places APIs."
    ),
}

# API-level status → message (google_maps_tool.py:56-82 parity)
_STATUS_MESSAGES = {
    "OVER_DAILY_LIMIT": (
        "API key invalid, billing not enabled, or daily limit exceeded"
    ),
    "OVER_QUERY_LIMIT": "Too many requests. Try again later",
    "REQUEST_DENIED": (
        "Request denied — check that the API is enabled and the key is valid"
    ),
    "INVALID_REQUEST": "Invalid request — check required parameters",
    "MAX_ELEMENTS_EXCEEDED": (
        "Too many origins × destinations (max 625 elements)"
    ),
    "MAX_DIMENSIONS_EXCEEDED": (
        "Too many origins or destinations (max 25 each)"
    ),
    "MAX_WAYPOINTS_EXCEEDED": "Too many waypoints (max 25)",
    "NOT_FOUND": "One or more locations could not be found",
    "UNKNOWN_ERROR": "Server error — please retry",
}


def handle_status(api_status: str, error_message: str = "") -> dict | None:
    """None for OK/ZERO_RESULTS; the mapped error envelope otherwise."""
    if api_status in ("OK", "ZERO_RESULTS"):
        return None
    message = _STATUS_MESSAGES.get(api_status, f"API error: {api_status}")
    if error_message:
        message = f"{message}. {error_message}"
    return {"error": message}


class MapsClient:
    """Geocoding client over the shared GET seam
    (``transport(url, params, headers) -> (status, body)`` —
    ``get_http_transport`` live, ``FixtureGetTransport`` replay; the
    ``key`` credential param is excluded from fixture keys)."""

    def __init__(self, api_key: str, transport):
        self.api_key = api_key
        self.transport = transport

    def _get(self, url: str, params: dict) -> tuple[int, bytes]:
        params = dict(params)
        params["key"] = self.api_key
        return self.transport(url, params, {})

    def _call(self, params: dict, parse) -> dict:
        try:
            status, body = self._get(GEOCODE_URL, params)
        except TimeoutError:
            return {"error": "Request timed out"}
        except Exception as e:
            return {"error": f"Network error: {e}"}
        if status != 200:
            return {
                "error": f"HTTP {status}: "
                f"{body.decode('utf-8', 'replace')[:200]}"
            }
        try:
            data = json.loads(body)
        except ValueError as e:
            return {"error": f"Geocoding failed: {e}"}
        status_error = handle_status(
            data.get("status", "UNKNOWN_ERROR"), data.get("error_message", "")
        )
        if status_error:
            return status_error
        return parse(data)

    def geocode(self, address: str = "", components: str = "",
                bounds: str = "", region: str = "",
                language: str = "") -> dict:
        """maps_geocode envelope (google_maps_tool.py:106-193)."""
        if not address and not components:
            return {"error": "Either address or components is required"}
        params: dict = {}
        for k, v in (("address", address), ("components", components),
                     ("bounds", bounds), ("region", region),
                     ("language", language)):
            if v:
                params[k] = v

        def parse(data: dict) -> dict:
            results = [
                {
                    "formatted_address": item.get("formatted_address", ""),
                    "location": item.get("geometry", {}).get("location", {}),
                    "location_type": item.get("geometry", {}).get(
                        "location_type", ""
                    ),
                    "place_id": item.get("place_id", ""),
                    "types": item.get("types", []),
                    "address_components": item.get("address_components", []),
                }
                for item in data.get("results", [])
            ]
            return {
                "query": address or components,
                "results": results,
                "total": len(results),
            }

        return self._call(params, parse)

    def reverse_geocode(self, latitude: float, longitude: float,
                        result_type: str = "", location_type: str = "",
                        language: str = "") -> dict:
        """maps_reverse_geocode envelope
        (google_maps_tool.py:195-279)."""
        if not (-90 <= latitude <= 90):
            return {"error": "latitude must be between -90 and 90"}
        if not (-180 <= longitude <= 180):
            return {"error": "longitude must be between -180 and 180"}
        params: dict = {"latlng": f"{latitude},{longitude}"}
        for k, v in (("result_type", result_type),
                     ("location_type", location_type),
                     ("language", language)):
            if v:
                params[k] = v

        def parse(data: dict) -> dict:
            results = [
                {
                    "formatted_address": item.get("formatted_address", ""),
                    "location": item.get("geometry", {}).get("location", {}),
                    "place_id": item.get("place_id", ""),
                    "types": item.get("types", []),
                }
                for item in data.get("results", [])
            ]
            return {
                "latitude": latitude,
                "longitude": longitude,
                "results": results,
                "total": len(results),
            }

        return self._call(params, parse)


def maps_geocode(address: str, client: MapsClient | None = None,
                 **kw) -> dict:
    """Driver envelope with the missing-key guard
    (google_maps_tool.py:96-104)."""
    if client is None:
        return dict(MISSING_KEY_ERROR)
    return client.geocode(address=address, **kw)


def _haversine_km(lat1, lon1, lat2, lon2) -> float:
    dphi = math.radians(lat2 - lat1) / 2
    dlam = math.radians(lon2 - lon1) / 2
    a = (
        math.sin(dphi) ** 2
        + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
        * math.sin(dlam) ** 2
    )
    return 2 * 6371.0 * math.asin(math.sqrt(a))


def local_distance_matrix(origins: list[tuple[float, float]],
                          destinations: list[tuple[float, float]]) -> dict:
    """Deterministic LOCAL tier of the distance-matrix envelope:
    great-circle (haversine) km instead of the remote road network —
    the offline-true analog, same envelope shape (rows of elements).
    Caps mirror the API limits (25×25, 625 elements)."""
    if len(origins) > 25 or len(destinations) > 25:
        return {"error": "Too many origins or destinations (max 25 each)"}
    if len(origins) * len(destinations) > 625:
        return {"error": "Too many origins × destinations (max 625 elements)"}
    rows = []
    for olat, olon in origins:
        elements = [
            {
                "status": "OK",
                "distance_km": round(
                    _haversine_km(olat, olon, dlat, dlon), 3
                ),
            }
            for dlat, dlon in destinations
        ]
        rows.append({"elements": elements})
    return {
        "rows": rows,
        "origins": len(origins),
        "destinations": len(destinations),
        "metric": "haversine_km",
    }


GEOCODE_SCHEMA = (
    "address string, formatted_address string, lat double, lon double,"
    " place_id string, location_type string, total int, error string"
)


def geocode_table(addresses: DataFrame, client_factory,
                  address_col: str = "address") -> DataFrame:
    """Geocode a TABLE of addresses on the executors (``mapInPandas``
    — map-only, per-row error envelopes; first result per address,
    the reference's interactive convention). ``client_factory``
    builds the per-executor MapsClient and must pickle by value."""
    import pandas as pd

    cols = [f.split()[0] for f in GEOCODE_SCHEMA.split(",")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for addr in pdf[address_col]:
                base = {
                    "address": addr, "formatted_address": None,
                    "lat": None, "lon": None, "place_id": None,
                    "location_type": None, "total": None, "error": None,
                }
                env = client.geocode(address=str(addr))
                if "error" in env:
                    base["error"] = env["error"]
                elif env["results"]:
                    top = env["results"][0]
                    loc = top.get("location", {})
                    base.update(
                        formatted_address=top["formatted_address"],
                        lat=loc.get("lat"), lon=loc.get("lng"),
                        place_id=top["place_id"],
                        location_type=top["location_type"],
                        total=env["total"],
                    )
                else:
                    base["total"] = 0
                rows.append(base)
            yield pd.DataFrame(rows, columns=cols)

    return addresses.select(address_col).mapInPandas(run, GEOCODE_SCHEMA)
