"""Gmail connector conformance tests: wire shapes, error map, header
flattening, urlsafe-b64 body decode, batch semantics (50-cap,
per-id errors, 204 no-content), draft MIME construction, and the
distributed message-hydration tier (gmail_tool.py parity)."""

from __future__ import annotations

import base64

from aden_hive_fork_spark.sources.gmail_source import (
    GMAIL_API_BASE,
    GmailClient,
    extract_body,
    gmail_messages_table,
    parse_headers,
)
from aden_hive_fork_spark.sources.rest_connector import (
    FixtureRestTransport,
    jdump,
)


def _b64(s: str) -> str:
    return base64.urlsafe_b64encode(s.encode()).decode()


MSG_FULL = {
    "id": "m1",
    "threadId": "t1",
    "labelIds": ["INBOX", "UNREAD"],
    "snippet": "Quarterly numbers attached",
    "payload": {
        "headers": [
            {"name": "Subject", "value": "Q3 report"},
            {"name": "From", "value": "cfo@acme.example"},
            {"name": "To", "value": "me@acme.example"},
            {"name": "Date", "value": "Mon, 3 Aug 2026 09:00:00 +0000"},
            {"name": "X-Mailer", "value": "should-be-dropped"},
        ],
        "parts": [
            {"mimeType": "text/html",
             "body": {"data": _b64("<b>hi</b>")}},
            {"mimeType": "text/plain",
             "body": {"data": _b64("plain wins")}},
        ],
    },
}


def test_list_messages_wire_and_envelope():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", f"{GMAIL_API_BASE}/messages",
            {"q": "is:unread", "maxResults": 100},
        ): (200, jdump({
            "messages": [{"id": "m1", "threadId": "t1"}],
            "resultSizeEstimate": 1,
            "nextPageToken": "tok2",
        })),
    })
    env = GmailClient("at", t).list_messages()
    assert env["messages"] == [{"id": "m1", "threadId": "t1"}]
    assert env["result_size_estimate"] == 1
    assert env["next_page_token"] == "tok2"
    _, _, _, _, headers = t.requests[0]
    assert headers["Authorization"] == "Bearer at"
    assert headers["Content-Type"] == "application/json"


def test_max_results_clamped_1_to_500():
    t = FixtureRestTransport()
    GmailClient("a", t).list_messages(max_results=9999)
    assert t.requests[0][2]["maxResults"] == 500
    GmailClient("a", t).list_messages(max_results=0)
    assert t.requests[1][2]["maxResults"] == 1


def test_get_message_full_flattens_headers_and_decodes_body():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", f"{GMAIL_API_BASE}/messages/m1", {"format": "full"},
        ): (200, jdump(MSG_FULL)),
    })
    env = GmailClient("a", t).get_message("m1", format="full")
    assert env["subject"] == "Q3 report"
    assert env["from"] == "cfo@acme.example"
    assert "x-mailer" not in env
    assert env["body"] == "plain wins"  # text/plain preferred over html
    assert env["labels"] == ["INBOX", "UNREAD"]


def test_extract_body_prefers_plain_then_html_then_direct():
    assert extract_body(
        {"body": {"data": _b64("direct")}}
    ) == "direct"
    assert extract_body(
        {"parts": [{"mimeType": "text/html", "body": {"data": _b64("<i>h</i>")}}]}
    ) == "<i>h</i>"
    assert extract_body({"parts": []}) is None


def test_parse_headers_keeps_common_only():
    out = parse_headers([
        {"name": "CC", "value": "x@y"}, {"name": "Received", "value": "hop"},
    ])
    assert out == {"cc": "x@y"}


def test_error_map_parity():
    for status, expect in [(401, "Gmail token expired or invalid"),
                           (404, "Message not found")]:
        t = FixtureRestTransport({
            FixtureRestTransport.key(
                "GET", f"{GMAIL_API_BASE}/messages/m9",
                {"format": "metadata"},
            ): (status, b"{}"),
        })
        env = GmailClient("a", t).get_message("m9")
        assert env["error"] == expect


def test_message_id_traversal_rejected():
    env = GmailClient("a", FixtureRestTransport()).get_message("../secrets")
    assert "Invalid message_id" in env["error"]


def test_batch_modify_204_no_content_and_validation():
    c = GmailClient("a", FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{GMAIL_API_BASE}/messages/batchModify", None,
            {"ids": ["m1", "m2"], "removeLabelIds": ["UNREAD"]},
        ): (204, b""),
    }))
    assert c.batch_modify_messages(["m1", "m2"], remove_labels=["UNREAD"]) == {
        "success": True, "count": 2}
    assert "required" in c.batch_modify_messages([], add_labels=["X"])["error"]
    assert "At least one" in c.batch_modify_messages(["m1"])["error"]


def test_batch_get_caps_at_50_and_collects_per_id_errors():
    c = GmailClient("a", FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", f"{GMAIL_API_BASE}/messages/m1", {"format": "metadata"},
        ): (200, jdump(MSG_FULL)),
        FixtureRestTransport.key(
            "GET", f"{GMAIL_API_BASE}/messages/gone", {"format": "metadata"},
        ): (404, b"{}"),
    }))
    assert "Maximum 50" in c.batch_get_messages([f"m{i}" for i in range(51)])[
        "error"]
    env = c.batch_get_messages(["m1", "gone"])
    assert env["count"] == 1 and env["messages"][0]["id"] == "m1"
    assert env["errors"] == [
        {"message_id": "gone", "error": "Message not found"}]


def test_create_draft_builds_mime_raw():
    t = FixtureRestTransport()
    c = GmailClient("a", t)
    assert "required" in c.create_draft("", "s", "<p>b</p>")["error"]
    c.create_draft("to@x.example", "Hello", "<p>body</p>")
    _, url, _, json_body, _ = t.requests[0]
    assert url.endswith("/drafts")
    raw = base64.urlsafe_b64decode(json_body["message"]["raw"])
    assert b"To: to@x.example" in raw and b"Subject: Hello" in raw
    assert b"<p>body</p>" in raw


def test_labels_roundtrip():
    c = GmailClient("a", FixtureRestTransport({
        FixtureRestTransport.key("GET", f"{GMAIL_API_BASE}/labels"): (
            200, jdump({"labels": [{"id": "INBOX", "name": "INBOX",
                                    "type": "system"}]})),
        FixtureRestTransport.key(
            "POST", f"{GMAIL_API_BASE}/labels", None,
            {"name": "Agent/Important", "labelListVisibility": "labelShow",
             "messageListVisibility": "show"},
        ): (200, jdump({"id": "Label_7", "name": "Agent/Important",
                        "type": "user"})),
    }))
    assert c.list_labels()["labels"][0]["id"] == "INBOX"
    env = c.create_label("Agent/Important")
    assert env == {"success": True, "id": "Label_7",
                   "name": "Agent/Important", "type": "user"}


def test_messages_table_distributed(spark):
    fixtures = {
        FixtureRestTransport.key(
            "GET", f"{GMAIL_API_BASE}/messages/m1", {"format": "full"},
        ): (200, jdump(MSG_FULL)),
        FixtureRestTransport.key(
            "GET", f"{GMAIL_API_BASE}/messages/gone", {"format": "full"},
        ): (404, b"{}"),
    }
    ids = spark.createDataFrame([("m1",), ("gone",)], "message_id string")
    out = gmail_messages_table(
        ids, lambda: GmailClient("a", FixtureRestTransport(fixtures))
    ).collect()
    by_id = {r["message_id"]: r for r in out}
    assert by_id["m1"]["subject"] == "Q3 report"
    assert by_id["m1"]["body"] == "plain wins"
    assert by_id["m1"]["labels"] == "INBOX,UNREAD"
    assert by_id["gone"]["error"] == "Message not found"
