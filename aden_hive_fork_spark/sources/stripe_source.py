"""Stripe connector — the reference stripe tool's query surface
with envelope parity, speaking Stripe's public REST wire on the
pluggable transport seam.

The reference wraps the vendor SDK (tools/src/aden_tools/tools/
stripe_tool/stripe_tool.py:35-608 — `_StripeClient` over
`stripe.StripeClient`); this module keeps its METHOD surface and
flattened envelopes (`_format_customer` :119-132,
`_format_subscription` :228-250, `_format_payment_intent` :314-329,
`_format_charge` :362-381, `_format_refund` :429-442,
`_format_invoice` :506-526; list envelopes `{has_more, <plural>}`
:102-117 etc.) but derives the wire from the public Stripe API
contract instead of an SDK: Bearer auth against
``https://api.stripe.com/v1``, GET lists with query params, POST
mutations with form-encoded bodies (nested keys bracket-encoded:
``metadata[k]=v``), errors as ``{"error": {"message", ...}}``.

Executor tier: ``stripe_charges_table`` pages charges for a TABLE of
customer ids (mapInPandas, map-only, per-row error envelopes) — the
finance-side dimension a revenue pipeline joins broadcast against
warehouse facts.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame

STRIPE_API_BASE = "https://api.stripe.com/v1"

NO_CREDS = {
    "error": "Stripe credentials not configured",
    "help": "Set STRIPE_API_KEY environment variable",
}


def form_encode(params: dict, _prefix: str = "") -> dict:
    """Flatten nested dicts/lists into Stripe's bracket form keys:
    ``{"metadata": {"a": 1}} -> {"metadata[a]": 1}``;
    ``{"expand": ["x"]} -> {"expand[0]": "x"}``. None values drop."""
    flat: dict = {}
    for k, v in params.items():
        key = f"{_prefix}[{k}]" if _prefix else str(k)
        if isinstance(v, dict):
            flat.update(form_encode(v, key))
        elif isinstance(v, (list, tuple)):
            for i, sv in enumerate(v):
                if isinstance(sv, dict):
                    flat.update(form_encode(sv, f"{key}[{i}]"))
                else:
                    flat[f"{key}[{i}]"] = sv
        elif v is not None:
            flat[key] = v
    return flat


def _fmt_customer(c: dict) -> dict:
    return {k: c.get(k) for k in (
        "id", "email", "name", "phone", "description", "created",
        "currency", "delinquent", "metadata")}


def _fmt_subscription(s: dict) -> dict:
    out = {k: s.get(k) for k in (
        "id", "customer", "status", "current_period_start",
        "current_period_end", "cancel_at_period_end", "canceled_at",
        "trial_end", "created", "metadata")}
    out["items"] = [
        {"id": it.get("id"),
         "price_id": (it.get("price") or {}).get("id"),
         "quantity": it.get("quantity")}
        for it in (s.get("items") or {}).get("data", [])
    ]
    return out


def _fmt_payment_intent(pi: dict) -> dict:
    return {k: pi.get(k) for k in (
        "id", "amount", "amount_received", "currency", "status",
        "customer", "description", "receipt_email", "payment_method",
        "created", "metadata")}


def _fmt_charge(c: dict) -> dict:
    return {k: c.get(k) for k in (
        "id", "amount", "amount_captured", "amount_refunded", "currency",
        "status", "paid", "refunded", "customer", "description",
        "receipt_email", "receipt_url", "payment_intent", "created",
        "metadata")}


def _fmt_refund(r: dict) -> dict:
    return {k: r.get(k) for k in (
        "id", "amount", "currency", "status", "charge", "payment_intent",
        "reason", "created", "metadata")}


def _fmt_invoice(inv: dict) -> dict:
    return {k: inv.get(k) for k in (
        "id", "customer", "subscription", "status", "amount_due",
        "amount_paid", "amount_remaining", "currency", "description",
        "hosted_invoice_url", "invoice_pdf", "due_date", "created",
        "period_start", "period_end", "metadata")}


class StripeClient:
    """Stripe API client. ``transport(method, url, params, json_body,
    headers) -> (status, bytes)``. Mutations carry their form payload
    via ``params`` (Stripe POSTs are form-encoded, never JSON) —
    ``rest_http_transport`` urlencodes params into the body for POST
    when json_body is None and the method is POST/DELETE; the fixture
    transport keys on them the same way either way."""

    def __init__(self, api_key: str, transport):
        self._api_key = api_key
        self.transport = transport

    def _request(self, method: str, path: str, params: dict | None = None
                 ) -> dict:
        try:
            status, body = self.transport(
                method, f"{STRIPE_API_BASE}{path}",
                form_encode(params or {}), None,
                {"Authorization": f"Bearer {self._api_key}",
                 "Content-Type": "application/x-www-form-urlencoded"},
            )
        except Exception as e:
            return {"error": f"Network error: {e}"}
        try:
            data = json.loads(body)
        except Exception:
            data = {}
        if status == 401:
            return {"error": "Invalid Stripe API key"}
        if status == 429:
            return {"error": "Stripe rate limit exceeded. Try again later."}
        if status >= 400:
            msg = (data.get("error") or {}).get("message") or f"HTTP {status}"
            return {"error": f"Stripe API error: {msg}"}
        return data

    # --- customers (stripe_tool.py:46-132) ---
    def create_customer(self, email, name=None, phone=None,
                        description=None, metadata=None) -> dict:
        params = {"email": email, "name": name, "phone": phone,
                  "description": description, "metadata": metadata}
        data = self._request("POST", "/customers", params)
        return data if "error" in data else _fmt_customer(data)

    def get_customer(self, customer_id: str) -> dict:
        data = self._request("GET", f"/customers/{customer_id}")
        return data if "error" in data else _fmt_customer(data)

    def get_customer_by_email(self, email: str) -> dict:
        data = self._request("GET", "/customers", {"email": email,
                                                   "limit": 1})
        if "error" in data:
            return data
        found = data.get("data", [])
        if not found:
            return {"error": f"No customer found with email: {email}"}
        return _fmt_customer(found[0])

    def update_customer(self, customer_id, email=None, name=None,
                        phone=None, description=None, metadata=None) -> dict:
        params = {"email": email, "name": name, "phone": phone,
                  "description": description, "metadata": metadata}
        data = self._request("POST", f"/customers/{customer_id}", params)
        return data if "error" in data else _fmt_customer(data)

    def list_customers(self, limit=10, starting_after=None,
                       email=None) -> dict:
        params = {"limit": min(limit, 100),
                  "starting_after": starting_after, "email": email}
        data = self._request("GET", "/customers", params)
        if "error" in data:
            return data
        return {"has_more": data.get("has_more", False),
                "customers": [_fmt_customer(c)
                              for c in data.get("data", [])]}

    # --- subscriptions (stripe_tool.py:134-250) ---
    def get_subscription(self, subscription_id: str) -> dict:
        data = self._request("GET", f"/subscriptions/{subscription_id}")
        return data if "error" in data else _fmt_subscription(data)

    def list_subscriptions(self, customer_id=None, status=None,
                           limit=10) -> dict:
        params = {"limit": min(limit, 100), "customer": customer_id,
                  "status": status}
        data = self._request("GET", "/subscriptions", params)
        if "error" in data:
            return data
        return {"has_more": data.get("has_more", False),
                "subscriptions": [_fmt_subscription(s)
                                  for s in data.get("data", [])]}

    def cancel_subscription(self, subscription_id: str,
                            at_period_end: bool = False) -> dict:
        if at_period_end:
            data = self._request(
                "POST", f"/subscriptions/{subscription_id}",
                {"cancel_at_period_end": "true"},
            )
        else:
            data = self._request(
                "DELETE", f"/subscriptions/{subscription_id}"
            )
        return data if "error" in data else _fmt_subscription(data)

    # --- payment intents (stripe_tool.py:252-329) ---
    def create_payment_intent(self, amount, currency="usd", customer=None,
                              description=None, receipt_email=None,
                              metadata=None) -> dict:
        params = {"amount": amount, "currency": currency,
                  "customer": customer, "description": description,
                  "receipt_email": receipt_email, "metadata": metadata}
        data = self._request("POST", "/payment_intents", params)
        return data if "error" in data else _fmt_payment_intent(data)

    def get_payment_intent(self, payment_intent_id: str) -> dict:
        data = self._request("GET",
                             f"/payment_intents/{payment_intent_id}")
        return data if "error" in data else _fmt_payment_intent(data)

    def list_payment_intents(self, customer_id=None, limit=10) -> dict:
        params = {"limit": min(limit, 100), "customer": customer_id}
        data = self._request("GET", "/payment_intents", params)
        if "error" in data:
            return data
        return {"has_more": data.get("has_more", False),
                "payment_intents": [_fmt_payment_intent(pi)
                                    for pi in data.get("data", [])]}

    # --- charges (stripe_tool.py:331-381) ---
    def list_charges(self, customer_id=None, limit=10,
                     starting_after=None) -> dict:
        params = {"limit": min(limit, 100), "customer": customer_id,
                  "starting_after": starting_after}
        data = self._request("GET", "/charges", params)
        if "error" in data:
            return data
        return {"has_more": data.get("has_more", False),
                "charges": [_fmt_charge(c) for c in data.get("data", [])]}

    def get_charge(self, charge_id: str) -> dict:
        data = self._request("GET", f"/charges/{charge_id}")
        return data if "error" in data else _fmt_charge(data)

    # --- refunds (stripe_tool.py:383-442) ---
    def create_refund(self, charge_id=None, payment_intent_id=None,
                      amount=None, reason=None) -> dict:
        params = {"charge": charge_id, "payment_intent": payment_intent_id,
                  "amount": amount, "reason": reason}
        data = self._request("POST", "/refunds", params)
        return data if "error" in data else _fmt_refund(data)

    def list_refunds(self, charge_id=None, limit=10) -> dict:
        params = {"limit": min(limit, 100), "charge": charge_id}
        data = self._request("GET", "/refunds", params)
        if "error" in data:
            return data
        return {"has_more": data.get("has_more", False),
                "refunds": [_fmt_refund(r) for r in data.get("data", [])]}

    # --- invoices (stripe_tool.py:444-526) ---
    def list_invoices(self, customer_id=None, status=None,
                      limit=10) -> dict:
        params = {"limit": min(limit, 100), "customer": customer_id,
                  "status": status}
        data = self._request("GET", "/invoices", params)
        if "error" in data:
            return data
        return {"has_more": data.get("has_more", False),
                "invoices": [_fmt_invoice(i) for i in data.get("data", [])]}

    def get_invoice(self, invoice_id: str) -> dict:
        data = self._request("GET", f"/invoices/{invoice_id}")
        return data if "error" in data else _fmt_invoice(data)


CHARGE_SCHEMA = (
    "customer string, charge_id string, amount bigint, "
    "amount_refunded bigint, currency string, status string, "
    "paid boolean, created bigint, error string"
)


def stripe_charges_table(customers: DataFrame, client_factory,
                         limit: int = 100,
                         id_col: str = "customer") -> DataFrame:
    """Fetch charges for a TABLE of Stripe customer ids on the
    executors (mapInPandas, map-only, per-row error envelopes).
    ``client_factory`` must pickle by value (lambda/closure)."""
    import pandas as pd

    cols = [f.split()[0] for f in CHARGE_SCHEMA.split(",")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for cust in pdf[id_col]:
                env = client.list_charges(str(cust), limit=limit)
                if "error" in env:
                    rows.append({"customer": cust, "charge_id": None,
                                 "amount": None, "amount_refunded": None,
                                 "currency": None, "status": None,
                                 "paid": None, "created": None,
                                 "error": env["error"]})
                    continue
                for ch in env["charges"]:
                    rows.append({
                        "customer": cust, "charge_id": ch.get("id"),
                        "amount": ch.get("amount"),
                        "amount_refunded": ch.get("amount_refunded"),
                        "currency": ch.get("currency"),
                        "status": ch.get("status"),
                        "paid": ch.get("paid"),
                        "created": ch.get("created"),
                        "error": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return customers.select(id_col).mapInPandas(run, CHARGE_SCHEMA)
