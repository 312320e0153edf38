"""Stripe + HubSpot connector conformance tests: Stripe's
form-encoded wire and flattened envelopes, the HubSpot CRM v3
object surface and error maps, and both distributed table tiers
(stripe_tool.py / hubspot_tool.py parity)."""

from __future__ import annotations

import json

from aden_hive_fork_spark.sources.hubspot_source import (
    HUBSPOT_API_BASE,
    HubSpotClient,
    hubspot_objects_table,
)
from aden_hive_fork_spark.sources.rest_connector import (
    FixtureRestTransport,
    jdump,
)
from aden_hive_fork_spark.sources.stripe_source import (
    STRIPE_API_BASE,
    StripeClient,
    form_encode,
    stripe_charges_table,
)


# --------------------------------------------------------------- Stripe
def test_form_encode_brackets():
    assert form_encode({"metadata": {"a": 1, "b": "x"}}) == {
        "metadata[a]": 1, "metadata[b]": "x"}
    assert form_encode({"expand": ["x", "y"]}) == {
        "expand[0]": "x", "expand[1]": "y"}
    assert form_encode({"items": [{"price": "p1"}]}) == {
        "items[0][price]": "p1"}
    assert form_encode({"email": None, "name": "n"}) == {"name": "n"}


CUSTOMER_BODY = jdump({
    "id": "cus_1", "object": "customer", "email": "a@x", "name": "Ada",
    "phone": None, "description": "vip", "created": 1722000000,
    "currency": "usd", "delinquent": False, "metadata": {"tier": "gold"},
    "invoice_settings": {"should": "be dropped"},
})


def test_stripe_customer_envelope_flattening_and_wire():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{STRIPE_API_BASE}/customers",
            {"email": "a@x", "name": "Ada", "description": "vip",
             "metadata[tier]": "gold"},
        ): (200, CUSTOMER_BODY),
    })
    c = StripeClient("sk_test_1", t)
    env = c.create_customer("a@x", name="Ada", description="vip",
                            metadata={"tier": "gold"})
    assert env["id"] == "cus_1" and env["metadata"] == {"tier": "gold"}
    assert "invoice_settings" not in env  # flattened to the parity set
    _, _, _, _, headers = t.requests[0]
    assert headers["Authorization"] == "Bearer sk_test_1"
    assert headers["Content-Type"] == "application/x-www-form-urlencoded"


def test_stripe_error_map():
    for status, expect in [
        (401, "Invalid Stripe API key"),
        (429, "Stripe rate limit exceeded. Try again later."),
    ]:
        t = FixtureRestTransport({
            FixtureRestTransport.key(
                "GET", f"{STRIPE_API_BASE}/charges/ch_9", {},
            ): (status, b"{}"),
        })
        assert StripeClient("sk", t).get_charge("ch_9")["error"] == expect
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", f"{STRIPE_API_BASE}/charges/ch_9", {},
        ): (402, jdump({"error": {"message": "Your card was declined."}})),
    })
    assert StripeClient("sk", t).get_charge("ch_9") == {
        "error": "Stripe API error: Your card was declined."}


def test_stripe_get_customer_by_email_and_list_envelope():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", f"{STRIPE_API_BASE}/customers",
            {"email": "a@x", "limit": 1},
        ): (200, jdump({"object": "list", "has_more": False,
                        "data": [json.loads(CUSTOMER_BODY)]})),
        FixtureRestTransport.key(
            "GET", f"{STRIPE_API_BASE}/customers",
            {"email": "none@x", "limit": 1},
        ): (200, jdump({"object": "list", "has_more": False, "data": []})),
    })
    c = StripeClient("sk", t)
    assert c.get_customer_by_email("a@x")["id"] == "cus_1"
    assert "No customer found" in c.get_customer_by_email("none@x")["error"]


def test_stripe_subscription_items_flattening():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", f"{STRIPE_API_BASE}/subscriptions/sub_1", {},
        ): (200, jdump({
            "id": "sub_1", "customer": "cus_1", "status": "active",
            "current_period_start": 1, "current_period_end": 2,
            "cancel_at_period_end": False, "created": 1,
            "items": {"object": "list", "data": [
                {"id": "si_1", "price": {"id": "price_1"}, "quantity": 3},
            ]},
            "metadata": {},
        })),
    })
    env = StripeClient("sk", t).get_subscription("sub_1")
    assert env["items"] == [
        {"id": "si_1", "price_id": "price_1", "quantity": 3}]


def test_stripe_charges_table_distributed(spark):
    def charge(cid, i):
        return {"id": f"ch_{cid}_{i}", "amount": 1000 + i,
                "amount_refunded": 0, "currency": "usd",
                "status": "succeeded", "paid": True, "customer": cid,
                "created": 1722000000 + i}

    fixtures = {
        FixtureRestTransport.key(
            "GET", f"{STRIPE_API_BASE}/charges",
            {"limit": 100, "customer": "cus_1"},
        ): (200, jdump({"has_more": False,
                        "data": [charge("cus_1", 1), charge("cus_1", 2)]})),
        FixtureRestTransport.key(
            "GET", f"{STRIPE_API_BASE}/charges",
            {"limit": 100, "customer": "cus_gone"},
        ): (401, b"{}"),
    }
    ids = spark.createDataFrame([("cus_1",), ("cus_gone",)],
                                "customer string")
    out = stripe_charges_table(
        ids, lambda: StripeClient("sk", FixtureRestTransport(fixtures))
    ).collect()
    ok = [r for r in out if r["error"] is None]
    assert {r["charge_id"] for r in ok} == {"ch_cus_1_1", "ch_cus_1_2"}
    assert {r["amount"] for r in ok} == {1001, 1002}
    bad = [r for r in out if r["error"] is not None]
    assert bad[0]["customer"] == "cus_gone"


# -------------------------------------------------------------- HubSpot
def test_hubspot_search_wire_and_default_props():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{HUBSPOT_API_BASE}/crm/v3/objects/contacts/search",
            None,
            {"limit": 10, "query": "ada",
             "properties": ["email", "firstname", "lastname"]},
        ): (200, jdump({"total": 1, "results": [
            {"id": "101", "properties": {"email": "ada@x"}}]})),
    })
    c = HubSpotClient("pat-1", t)
    env = c.search_contacts("ada")
    assert env["total"] == 1 and env["results"][0]["id"] == "101"
    _, _, _, _, headers = t.requests[0]
    assert headers["Authorization"] == "Bearer pat-1"


def test_hubspot_get_object_properties_param():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", f"{HUBSPOT_API_BASE}/crm/v3/objects/deals/55",
            {"properties": "dealname,amount"},
        ): (200, jdump({"id": "55",
                        "properties": {"dealname": "Big", "amount": "100"}})),
    })
    env = HubSpotClient("p", t).get_deal("55", ["dealname", "amount"])
    assert env["properties"]["dealname"] == "Big"


def test_hubspot_error_map():
    cases = [
        (401, "Invalid or expired HubSpot access token"),
        (403, "Insufficient permissions. Check your HubSpot app scopes."),
        (404, "Resource not found"),
        (429, "HubSpot rate limit exceeded. Try again later."),
    ]
    for status, expect in cases:
        t = FixtureRestTransport({
            FixtureRestTransport.key(
                "GET", f"{HUBSPOT_API_BASE}/crm/v3/objects/contacts/1", {},
            ): (status, b"{}"),
        })
        assert HubSpotClient("p", t).get_contact("1")["error"] == expect
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", f"{HUBSPOT_API_BASE}/crm/v3/objects/contacts/1", {},
        ): (400, jdump({"message": "bad property"})),
    })
    assert HubSpotClient("p", t).get_contact("1") == {
        "error": "HubSpot API error (HTTP 400): bad property"}


def test_hubspot_create_update_bodies():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{HUBSPOT_API_BASE}/crm/v3/objects/companies", None,
            {"properties": {"name": "ACME", "domain": "acme.example"}},
        ): (201, jdump({"id": "900"})),
        FixtureRestTransport.key(
            "PATCH", f"{HUBSPOT_API_BASE}/crm/v3/objects/companies/900",
            None, {"properties": {"industry": "tooling"}},
        ): (200, jdump({"id": "900",
                        "properties": {"industry": "tooling"}})),
    })
    c = HubSpotClient("p", t)
    assert c.create_company({"name": "ACME",
                             "domain": "acme.example"})["id"] == "900"
    assert c.update_company("900", {"industry": "tooling"})[
        "properties"]["industry"] == "tooling"


def test_hubspot_objects_table_distributed(spark):
    fixtures = {
        FixtureRestTransport.key(
            "GET", f"{HUBSPOT_API_BASE}/crm/v3/objects/contacts/101", {},
        ): (200, jdump({"id": "101", "properties": {"email": "a@x"},
                        "createdAt": "2026-08-01T00:00:00Z",
                        "updatedAt": "2026-08-02T00:00:00Z"})),
        FixtureRestTransport.key(
            "GET", f"{HUBSPOT_API_BASE}/crm/v3/objects/deals/55", {},
        ): (404, b"{}"),
    }
    ids = spark.createDataFrame(
        [("contacts", "101"), ("deals", "55")],
        "object_type string, object_id string",
    )
    out = hubspot_objects_table(
        ids, lambda: HubSpotClient("p", FixtureRestTransport(fixtures))
    ).collect()
    by_id = {r["object_id"]: r for r in out}
    assert json.loads(by_id["101"]["properties"]) == {"email": "a@x"}
    assert by_id["55"]["error"] == "Resource not found"
