"""Apollo + Brevo + Cal.com + Razorpay connector conformance tests:
auth wires (X-Api-Key header, api-key header, apiKey query param,
HTTP Basic), error maps, envelope flattening, match_found semantics,
and the distributed enrichment/payments tiers (apollo_tool.py /
brevo_tool.py / calcom_tool.py / razorpay_tool.py parity)."""

from __future__ import annotations

import base64

from aden_hive_fork_spark.sources.apollo_source import (
    APOLLO_API_BASE,
    ApolloClient,
    apollo_enrich_table,
)
from aden_hive_fork_spark.sources.business_source import (
    BREVO_API_BASE,
    CALCOM_API_BASE,
    RAZORPAY_API_BASE,
    BrevoClient,
    CalcomClient,
    RazorpayClient,
    razorpay_payments_table,
)
from aden_hive_fork_spark.sources.rest_connector import (
    FixtureRestTransport,
    jdump,
)

PERSON = {
    "id": "p1", "first_name": "Ada", "last_name": "L", "name": "Ada L",
    "title": "CTO", "email": "ada@acme.example",
    "email_status": "verified", "linkedin_url": "https://li/ada",
    "city": "SF", "state": "CA", "country": "US",
    "organization": {"id": "o1", "name": "ACME",
                     "primary_domain": "acme.example",
                     "industry": "software",
                     "estimated_num_employees": 250},
    "should_be_dropped": True,
}


# --------------------------------------------------------------- Apollo
def test_apollo_enrich_person_match_and_flatten():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{APOLLO_API_BASE}/people/match", None,
            {"reveal_personal_emails": False, "reveal_phone_number": False,
             "email": "ada@acme.example"},
        ): (200, jdump({"person": PERSON})),
    })
    c = ApolloClient("ak", t)
    env = c.enrich_person(email="ada@acme.example")
    assert env["match_found"] is True
    p = env["person"]
    assert p["organization"]["domain"] == "acme.example"
    assert p["organization"]["employee_count"] == 250
    assert "should_be_dropped" not in p
    assert t.requests[0][4]["X-Api-Key"] == "ak"


def test_apollo_no_match_graceful():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{APOLLO_API_BASE}/people/match", None,
            {"reveal_personal_emails": False, "reveal_phone_number": False,
             "email": "none@x"},
        ): (200, jdump({"person": None})),
    })
    env = ApolloClient("ak", t).enrich_person(email="none@x")
    assert env == {"match_found": False,
                   "message": "No matching person found"}


def test_apollo_error_map():
    c = ApolloClient("ak", lambda *a: (403, b"{}"))
    env = c.enrich_company("x.example")
    assert "credits" in env["error"] and "help" in env
    c = ApolloClient("ak", lambda *a: (422, jdump({"error": "bad domain"})))
    assert c.enrich_company("x")["error"] == "Invalid parameters: bad domain"
    c = ApolloClient("ak", lambda *a: (429, b"{}"))
    assert "rate limit" in c.enrich_company("x")["error"].lower()


def test_apollo_search_people_filter_body_and_pagination():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{APOLLO_API_BASE}/mixed_people/search", None,
            {"per_page": 5, "page": 1, "person_titles": ["CTO"],
             "organization_num_employees_ranges": ["51,200"]},
        ): (200, jdump({
            "pagination": {"total_entries": 42, "page": 1, "per_page": 5},
            "people": [PERSON],
        })),
    })
    env = ApolloClient("ak", t).search_people(
        titles=["CTO"], company_sizes=["51,200"], limit=5)
    assert env["total"] == 42 and env["per_page"] == 5
    assert env["results"][0]["organization"]["name"] == "ACME"


def test_apollo_enrich_table_distributed(spark):
    fixtures = {
        FixtureRestTransport.key(
            "POST", f"{APOLLO_API_BASE}/people/match", None,
            {"reveal_personal_emails": False, "reveal_phone_number": False,
             "email": "ada@acme.example"},
        ): (200, jdump({"person": PERSON})),
        FixtureRestTransport.key(
            "POST", f"{APOLLO_API_BASE}/people/match", None,
            {"reveal_personal_emails": False, "reveal_phone_number": False,
             "email": "none@x"},
        ): (200, jdump({"person": None})),
    }
    emails = spark.createDataFrame(
        [("ada@acme.example",), ("none@x",)], "email string")
    out = {r["email"]: r for r in apollo_enrich_table(
        emails, lambda: ApolloClient("ak", FixtureRestTransport(fixtures))
    ).collect()}
    assert out["ada@acme.example"]["org_domain"] == "acme.example"
    assert out["none@x"]["match_found"] is False


# ---------------------------------------------------------------- Brevo
def test_brevo_send_email_camelcase_payload():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{BREVO_API_BASE}/smtp/email", None,
            {"to": [{"email": "a@x"}], "subject": "Hi",
             "htmlContent": "<b>x</b>",
             "sender": {"email": "me@x", "name": "Me"},
             "textContent": "x", "tags": ["t1"]},
        ): (201, jdump({"messageId": "<msg1>"})),
    })
    c = BrevoClient("bk", t)
    env = c.send_email([{"email": "a@x"}], "Hi", "<b>x</b>",
                       {"email": "me@x", "name": "Me"},
                       text_content="x", tags=["t1"])
    assert env["messageId"] == "<msg1>"
    assert t.requests[0][4]["api-key"] == "bk"


def test_brevo_error_map_and_204():
    c = BrevoClient("bk", lambda *a: (204, b""))
    assert c.update_contact("a@x", attributes={"X": 1}) == {"success": True}
    c = BrevoClient("bk", lambda *a: (400, jdump({"message": "bad email"})))
    assert c.create_contact(email="x") == {"error": "Bad request: bad email"}
    c = BrevoClient("bk", lambda *a: (401, b"{}"))
    assert c.get_contact("a@x") == {"error": "Invalid Brevo API key"}


# --------------------------------------------------------------- Cal.com
def test_calcom_apikey_in_params_and_booking_body():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{CALCOM_API_BASE}/bookings", {"apiKey": "ck"},
            {"eventTypeId": 7, "start": "2026-08-20T10:00:00Z",
             "responses": {"name": "Ada", "email": "a@x",
                           "guests": ["g@x"]},
             "timeZone": "UTC", "language": "en", "metadata": {}},
        ): (200, jdump({"booking": {"id": 99, "status": "ACCEPTED"}})),
    })
    c = CalcomClient("ck", t)
    env = c.create_booking(7, "2026-08-20T10:00:00Z", "Ada", "a@x",
                           guests=["g@x"])
    assert env["booking"]["id"] == 99
    # the key rode in params — and the fixture key EXCLUDED it
    assert t.requests[0][2]["apiKey"] == "ck"
    k_with = FixtureRestTransport.key(
        "POST", f"{CALCOM_API_BASE}/bookings", {"apiKey": "other"},
        {"x": 1})
    k_none = FixtureRestTransport.key(
        "POST", f"{CALCOM_API_BASE}/bookings", {}, {"x": 1})
    assert k_with == k_none


def test_calcom_filters_and_error_map():
    t = FixtureRestTransport()
    CalcomClient("ck", t).list_bookings(status="upcoming",
                                        start_date="2026-08-01")
    params = t.requests[0][2]
    assert params["afterStart"] == "2026-08-01"
    c = CalcomClient("ck", lambda *a: (401, b"{}"))
    assert c.list_schedules() == {
        "error": "Invalid or expired Cal.com API key"}


# -------------------------------------------------------------- Razorpay
def test_razorpay_basic_auth_and_payment_flatten():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", f"{RAZORPAY_API_BASE}/payments",
            {"count": 2, "skip": 0},
        ): (200, jdump({"count": 2, "items": [
            {"id": "pay_1", "amount": 5000, "currency": "INR",
             "status": "captured", "method": "upi", "email": "a@x",
             "contact": "+91", "created_at": 1722000000,
             "notes": {"drop": "me"}},
            {"id": "pay_2", "amount": 700, "currency": "INR",
             "status": "failed"},
        ]})),
    })
    c = RazorpayClient("rzp_key", "rzp_secret", t)
    env = c.list_payments(count=2)
    assert env["count"] == 2
    assert env["payments"][0]["id"] == "pay_1"
    assert "notes" not in env["payments"][0]
    cred = base64.b64decode(
        t.requests[0][4]["Authorization"].split()[1]).decode()
    assert cred == "rzp_key:rzp_secret"


def test_razorpay_error_description_body():
    c = RazorpayClient("k", "s", lambda *a: (
        400, jdump({"error": {"description": "amount too small"}})))
    assert c.create_refund("pay_1", amount=1) == {
        "error": "Bad request: amount too small"}
    c = RazorpayClient("k", "s", lambda *a: (401, b"{}"))
    assert c.get_payment("pay_1") == {
        "error": "Invalid Razorpay API credentials"}


def test_razorpay_payments_table_distributed(spark):
    def page_body(page):
        return jdump({"count": 1, "items": [
            {"id": f"pay_p{page}", "amount": 100 + page,
             "currency": "INR", "status": "captured", "method": "card",
             "email": "a@x", "created_at": 1722000000 + page},
        ]})

    fixtures = {
        FixtureRestTransport.key(
            "GET", f"{RAZORPAY_API_BASE}/payments",
            {"count": 100, "skip": 0},
        ): (200, page_body(0)),
        FixtureRestTransport.key(
            "GET", f"{RAZORPAY_API_BASE}/payments",
            {"count": 100, "skip": 100},
        ): (200, page_body(1)),
    }
    pages = spark.createDataFrame([(0,), (1,)], "page bigint")
    out = razorpay_payments_table(
        pages,
        lambda: RazorpayClient("k", "s", FixtureRestTransport(fixtures)),
    ).collect()
    assert {r["payment_id"] for r in out} == {"pay_p0", "pay_p1"}
    assert {r["amount"] for r in out} == {100, 101}
