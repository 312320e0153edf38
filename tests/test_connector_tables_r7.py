"""Envelope-parity tests for the six table tiers added in round 7
(Exa, SerpAPI, Telegram, Brevo, Cal.com, Google Docs, email) — each
pulls a fixture wire through the full client→transport→mapInPandas
path and checks both the happy rows and the per-row error
envelope."""

from __future__ import annotations

from aden_hive_fork_spark.sources.rest_connector import (
    FixtureRestTransport,
    jdump,
)


def test_exa_search_table_rows_and_error(spark):
    from aden_hive_fork_spark.sources.exa_source import (
        EXA_API_BASE,
        ExaSearchProvider,
        exa_search_table,
    )

    fixtures = {
        FixtureRestTransport.key(
            "POST", f"{EXA_API_BASE}/search", None,
            {"query": "alpha", "numResults": 3, "contents": {}},
        ): (200, jdump({"results": [
            {"title": "t1", "url": "u1", "publishedDate": "2026-01-01",
             "author": "a1"},
            {"title": "t2", "url": "u2", "publishedDate": "2026-01-02",
             "author": "a2"},
        ]})),
        FixtureRestTransport.key(
            "POST", f"{EXA_API_BASE}/search", None,
            {"query": "beta", "numResults": 3, "contents": {}},
        ): (401, b"{}"),
    }
    qs = spark.createDataFrame([("alpha",), ("beta",)], "query string")
    got = exa_search_table(
        qs,
        lambda: ExaSearchProvider("k", FixtureRestTransport(fixtures)),
        num_results=3, include_text=False,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query"], []).append(r)
    assert [r["url"] for r in sorted(by_q["alpha"], key=lambda r: r["rank"])
            ] == ["u1", "u2"]
    assert by_q["beta"][0]["error"] == "Invalid Exa API key"
    assert by_q["beta"][0]["rank"] is None


def test_serpapi_scholar_table_rows_and_error(spark):
    from aden_hive_fork_spark.sources.serpapi_source import (
        SERPAPI_BASE,
        SerpAPIClient,
        serpapi_scholar_table,
    )

    fixtures = {
        FixtureRestTransport.key(
            "GET", SERPAPI_BASE,
            {"engine": "google_scholar", "q": "olap", "num": 2, "start": 0},
        ): (200, jdump({"organic_results": [
            {"title": "p1", "link": "l1",
             "inline_links": {"cited_by": {"total": 7}}},
        ]})),
    }
    qs = spark.createDataFrame([("olap",), ("missing",)], "query string")
    got = {r["query"]: r for r in serpapi_scholar_table(
        qs, lambda: SerpAPIClient("k", FixtureRestTransport(fixtures)),
        num_results=2,
    ).collect()}
    assert got["olap"]["cited_by_count"] == 7
    assert got["olap"]["rank"] == 1
    # no fixture → 404 wire → error envelope row
    assert got["missing"]["error"] is not None
    assert got["missing"]["cited_by_count"] is None


def test_telegram_send_table_receipts(spark):
    from aden_hive_fork_spark.sources.messaging_source import (
        TELEGRAM_API_BASE,
        TelegramClient,
        telegram_send_table,
    )

    fixtures = {
        FixtureRestTransport.key(
            "POST", f"{TELEGRAM_API_BASE}tok/sendMessage", None,
            {"chat_id": "7", "text": "hi", "disable_notification": False},
        ): (200, jdump({"ok": True, "result": {"message_id": 42}})),
        FixtureRestTransport.key(
            "POST", f"{TELEGRAM_API_BASE}tok/sendMessage", None,
            {"chat_id": "8", "text": "yo", "disable_notification": False},
        ): (403, jdump({"description": "bot blocked"})),
    }
    msgs = spark.createDataFrame(
        [("7", "hi"), ("8", "yo")], "chat_id string, text string"
    )
    got = {r["chat_id"]: r for r in telegram_send_table(
        msgs, lambda: TelegramClient("tok", FixtureRestTransport(fixtures)),
    ).collect()}
    assert got["7"]["message_id"] == 42 and got["7"]["ok"] is True
    assert got["8"]["error"] is not None and got["8"]["message_id"] is None


def test_brevo_contacts_table_rows_and_error(spark):
    from aden_hive_fork_spark.sources.business_source import (
        BREVO_API_BASE,
        BrevoClient,
        brevo_contacts_table,
    )

    fixtures = {
        FixtureRestTransport.key(
            "GET", f"{BREVO_API_BASE}/contacts/a@x.example"
        ): (200, jdump({"id": 5, "email": "a@x.example",
                        "attributes": {"LTV": 77}})),
        FixtureRestTransport.key(
            "GET", f"{BREVO_API_BASE}/contacts/b@x.example"
        ): (404, b"{}"),
    }
    ids = spark.createDataFrame(
        [("a@x.example",), ("b@x.example",)], "identifier string"
    )
    got = {r["identifier"]: r for r in brevo_contacts_table(
        ids, lambda: BrevoClient("k", FixtureRestTransport(fixtures)),
    ).collect()}
    assert got["a@x.example"]["ltv"] == 77
    assert got["a@x.example"]["contact_id"] == 5
    assert got["b@x.example"]["error"] == "Resource not found"


def test_calcom_bookings_table_rows_and_error(spark):
    from aden_hive_fork_spark.sources.business_source import (
        CALCOM_API_BASE,
        CalcomClient,
        calcom_bookings_table,
    )

    fixtures = {
        FixtureRestTransport.key(
            "GET", f"{CALCOM_API_BASE}/bookings",
            {"limit": 50, "eventTypeId": 3},
        ): (200, jdump({"bookings": [
            {"id": 31, "status": "accepted",
             "startTime": "2026-08-01T09:00:00Z"},
            {"id": 32, "status": "cancelled",
             "startTime": "2026-08-02T09:00:00Z"},
        ]})),
        FixtureRestTransport.key(
            "GET", f"{CALCOM_API_BASE}/bookings",
            {"limit": 50, "eventTypeId": 4},
        ): (401, b"{}"),
    }
    ets = spark.createDataFrame([(3,), (4,)], "event_type_id bigint")
    got = {}
    for r in calcom_bookings_table(
        ets, lambda: CalcomClient("k", FixtureRestTransport(fixtures)),
    ).collect():
        got.setdefault(r["event_type_id"], []).append(r)
    assert sorted(b["booking_id"] for b in got[3]) == [31, 32]
    assert got[4][0]["error"] == "Invalid or expired Cal.com API key"


def test_docs_documents_table_text_extraction(spark):
    from aden_hive_fork_spark.sources.google_docs_source import (
        GOOGLE_DOCS_API_BASE,
        GoogleDocsClient,
        docs_documents_table,
        document_plain_text,
    )

    doc = {
        "documentId": "d1", "title": "Notes",
        "body": {"content": [
            {"paragraph": {"elements": [
                {"textRun": {"content": "hello "}},
                {"textRun": {"content": "world\n"}},
            ]}},
            {"sectionBreak": {}},
        ]},
    }
    assert document_plain_text(doc) == "hello world\n"
    fixtures = {
        FixtureRestTransport.key(
            "GET", f"{GOOGLE_DOCS_API_BASE}/documents/d1"
        ): (200, jdump(doc)),
        FixtureRestTransport.key(
            "GET", f"{GOOGLE_DOCS_API_BASE}/documents/d2"
        ): (404, b"{}"),
    }
    ids = spark.createDataFrame([("d1",), ("d2",)], "document_id string")
    got = {r["document_id"]: r for r in docs_documents_table(
        ids, lambda: GoogleDocsClient("t", FixtureRestTransport(fixtures)),
    ).collect()}
    assert got["d1"]["title"] == "Notes" and got["d1"]["n_chars"] == 12
    assert got["d2"]["error"] == "Document not found"


def test_email_send_table_receipts(spark):
    from aden_hive_fork_spark.sources.email_source import (
        RESEND_API_BASE,
        EmailSender,
        email_send_table,
    )

    fixtures = {
        FixtureRestTransport.key(
            "POST", f"{RESEND_API_BASE}/emails", None,
            {"from": "noreply@x.example", "to": ["a@x.example"],
             "subject": "s1", "html": "<p>1</p>"},
        ): (200, jdump({"id": "re-1"})),
        FixtureRestTransport.key(
            "POST", f"{RESEND_API_BASE}/emails", None,
            {"from": "noreply@x.example", "to": ["b@x.example"],
             "subject": "s2", "html": "<p>2</p>"},
        ): (422, jdump({"message": "invalid recipient"})),
    }
    msgs = spark.createDataFrame(
        [("a@x.example", "s1", "<p>1</p>"), ("b@x.example", "s2", "<p>2</p>")],
        "to string, subject string, html string",
    )
    got = {r["to"]: r for r in email_send_table(
        msgs,
        lambda: EmailSender(FixtureRestTransport(fixtures),
                            resend_api_key="k",
                            from_email="noreply@x.example"),
    ).collect()}
    assert got["a@x.example"]["message_id"] == "re-1"
    assert got["a@x.example"]["success"] is True
    assert got["b@x.example"]["error"] == (
        "Resend API error: invalid recipient"
    )
