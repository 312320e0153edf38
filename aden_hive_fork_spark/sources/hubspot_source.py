"""HubSpot CRM connector — the reference hubspot tool's query
surface with envelope parity, on the pluggable REST transport seam.

Reference analogs (tools/src/aden_tools/tools/hubspot_tool/
hubspot_tool.py): client ``_HubSpotClient`` (:25-126) — Bearer +
JSON against CRM API v3; error map ``_handle_response`` (:39-55:
401/403/404/429 + the ``{"message"}`` error body); generic object
surface ``search_objects`` (:57-77, POST /crm/v3/objects/{type}/
search with query/properties/limit≤100), ``get_object`` (:79-96,
comma-joined properties param), ``create_object`` (:98-110,
``{"properties": ...}`` body), ``update_object`` (:112-126, PATCH);
typed wrappers for contacts / companies / deals with their default
property lists (:164-491 — contacts default
["email","firstname","lastname"], companies ["name","domain",
"industry"], deals ["dealname","amount","dealstage","closedate"]).

Executor tier: ``hubspot_objects_table`` hydrates a TABLE of
(object_type, object_id) rows (mapInPandas, map-only, per-row error
envelopes) into flat property rows — CRM data as a broadcastable
dimension for warehouse joins.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame

HUBSPOT_API_BASE = "https://api.hubapi.com"

CONTACT_PROPS = ["email", "firstname", "lastname"]
COMPANY_PROPS = ["name", "domain", "industry"]
DEAL_PROPS = ["dealname", "amount", "dealstage", "closedate"]

NO_CREDS = {
    "error": "HubSpot credentials not configured",
    "help": "Set HUBSPOT_ACCESS_TOKEN environment variable",
}


class HubSpotClient:
    """HubSpot CRM API v3 client. ``transport(method, url, params,
    json_body, headers) -> (status, bytes)``."""

    def __init__(self, access_token: str, transport):
        self._token = access_token
        self.transport = transport

    @property
    def _headers(self) -> dict[str, str]:
        return {
            "Authorization": f"Bearer {self._token}",
            "Content-Type": "application/json",
            "Accept": "application/json",
        }

    def _handle(self, status: int, body: bytes) -> dict:
        if status == 401:
            return {"error": "Invalid or expired HubSpot access token"}
        if status == 403:
            return {"error": "Insufficient permissions. Check your "
                             "HubSpot app scopes."}
        if status == 404:
            return {"error": "Resource not found"}
        if status == 429:
            return {"error": "HubSpot rate limit exceeded. Try again later."}
        if status >= 400:
            try:
                detail = json.loads(body).get(
                    "message", body.decode(errors="replace"))
            except Exception:
                detail = body.decode(errors="replace")
            return {"error": f"HubSpot API error (HTTP {status}): {detail}"}
        try:
            return json.loads(body)
        except Exception:
            return {}

    def _request(self, method, path, params=None, json_body=None) -> dict:
        try:
            status, body = self.transport(
                method, f"{HUBSPOT_API_BASE}{path}", params, json_body,
                self._headers,
            )
        except Exception as e:
            return {"error": f"Network error: {e}"}
        return self._handle(status, body)

    # --- generic object surface (hubspot_tool.py:57-126) ---
    def search_objects(self, object_type: str, query: str = "",
                       properties=None, limit: int = 10) -> dict:
        body: dict = {"limit": min(limit, 100)}
        if query:
            body["query"] = query
        if properties:
            body["properties"] = properties
        return self._request(
            "POST", f"/crm/v3/objects/{object_type}/search",
            json_body=body,
        )

    def get_object(self, object_type: str, object_id: str,
                   properties=None) -> dict:
        params = {}
        if properties:
            params["properties"] = ",".join(properties)
        return self._request(
            "GET", f"/crm/v3/objects/{object_type}/{object_id}", params
        )

    def create_object(self, object_type: str,
                      properties: dict) -> dict:
        return self._request(
            "POST", f"/crm/v3/objects/{object_type}",
            json_body={"properties": properties},
        )

    def update_object(self, object_type: str, object_id: str,
                      properties: dict) -> dict:
        return self._request(
            "PATCH", f"/crm/v3/objects/{object_type}/{object_id}",
            json_body={"properties": properties},
        )

    # --- typed wrappers with the reference default props ---
    def search_contacts(self, query="", properties=None, limit=10) -> dict:
        return self.search_objects("contacts", query,
                                   properties or CONTACT_PROPS, limit)

    def get_contact(self, contact_id, properties=None) -> dict:
        return self.get_object("contacts", contact_id, properties)

    def create_contact(self, properties: dict) -> dict:
        return self.create_object("contacts", properties)

    def update_contact(self, contact_id, properties: dict) -> dict:
        return self.update_object("contacts", contact_id, properties)

    def search_companies(self, query="", properties=None, limit=10) -> dict:
        return self.search_objects("companies", query,
                                   properties or COMPANY_PROPS, limit)

    def get_company(self, company_id, properties=None) -> dict:
        return self.get_object("companies", company_id, properties)

    def create_company(self, properties: dict) -> dict:
        return self.create_object("companies", properties)

    def update_company(self, company_id, properties: dict) -> dict:
        return self.update_object("companies", company_id, properties)

    def search_deals(self, query="", properties=None, limit=10) -> dict:
        return self.search_objects("deals", query,
                                   properties or DEAL_PROPS, limit)

    def get_deal(self, deal_id, properties=None) -> dict:
        return self.get_object("deals", deal_id, properties)

    def create_deal(self, properties: dict) -> dict:
        return self.create_object("deals", properties)

    def update_deal(self, deal_id, properties: dict) -> dict:
        return self.update_object("deals", deal_id, properties)


OBJECT_SCHEMA = (
    "object_type string, object_id string, properties string, "
    "created_at string, updated_at string, error string"
)


def hubspot_objects_table(ids: DataFrame, client_factory,
                          properties=None) -> DataFrame:
    """Hydrate a TABLE of (object_type, object_id) rows on the
    executors (mapInPandas, map-only, per-row error envelopes);
    fetched properties land as a canonical JSON string column for
    downstream ``from_json``/extraction. ``client_factory`` must
    pickle by value (lambda/closure)."""
    import pandas as pd

    cols = [f.split()[0] for f in OBJECT_SCHEMA.split(",")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for otype, oid in zip(pdf["object_type"], pdf["object_id"]):
                env = client.get_object(str(otype), str(oid), properties)
                if "error" in env:
                    rows.append({"object_type": otype, "object_id": oid,
                                 "properties": None, "created_at": None,
                                 "updated_at": None,
                                 "error": env["error"]})
                    continue
                rows.append({
                    "object_type": otype,
                    "object_id": env.get("id", oid),
                    "properties": json.dumps(
                        env.get("properties", {}), sort_keys=True),
                    "created_at": env.get("createdAt"),
                    "updated_at": env.get("updatedAt"),
                    "error": None,
                })
            yield pd.DataFrame(rows, columns=cols)

    return ids.select("object_type", "object_id").mapInPandas(
        run, OBJECT_SCHEMA)
