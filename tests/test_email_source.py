"""Outbound email connector conformance tests: dual-provider routing,
recipient normalization, subject/body validation, the override
intercept, Resend's Bearer wire, Gmail's raw-MIME send, and the
threaded reply flow with In-Reply-To/References (email_tool.py
parity)."""

from __future__ import annotations

import base64

from aden_hive_fork_spark.sources.email_source import (
    GMAIL_GET_URL,
    GMAIL_SEND_URL,
    RESEND_API_BASE,
    EmailSender,
    normalize_recipients,
)
from aden_hive_fork_spark.sources.rest_connector import (
    FixtureRestTransport,
    jdump,
)


def test_normalize_recipients():
    assert normalize_recipients("a@x") == ["a@x"]
    assert normalize_recipients("  ") is None
    assert normalize_recipients(["a@x", " ", 3, "b@x"]) == ["a@x", "b@x"]
    assert normalize_recipients([]) is None
    assert normalize_recipients(None) is None


def test_validation_and_provider_requirements():
    s = EmailSender(FixtureRestTransport(), resend_api_key="rk")
    assert "recipient" in s.send_email([], "s", "<p>", "resend")["error"]
    assert "Subject" in s.send_email("a@x", "", "<p>", "resend")["error"]
    assert "Subject" in s.send_email("a@x", "x" * 999, "<p>",
                                     "resend")["error"]
    assert "body" in s.send_email("a@x", "s", "", "resend")["error"]
    # resend requires a sender
    env = s.send_email("a@x", "s", "<p>", "resend")
    assert env["error"] == "Sender email is required"
    # missing creds per provider
    none = EmailSender(FixtureRestTransport())
    assert "Resend credentials" in none.send_email(
        "a@x", "s", "<p>", "resend", from_email="me@x")["error"]
    assert "Gmail credentials" in none.send_email(
        "a@x", "s", "<p>", "gmail")["error"]


def test_resend_wire_and_envelope():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{RESEND_API_BASE}/emails", None,
            {"from": "me@x", "to": ["a@x"], "subject": "Hi",
             "html": "<p>b</p>", "cc": ["c@x"]},
        ): (200, jdump({"id": "re_1"})),
    })
    s = EmailSender(t, resend_api_key="rk", from_email="me@x")
    env = s.send_email("a@x", "Hi", "<p>b</p>", "resend", cc="c@x")
    assert env == {"success": True, "provider": "resend", "id": "re_1",
                   "to": ["a@x"], "subject": "Hi"}
    assert t.requests[0][4]["Authorization"] == "Bearer rk"


def test_gmail_send_raw_mime():
    captured = {}

    def transport(method, url, params, json_body, headers):
        captured.update(url=url, body=json_body, headers=headers)
        return 200, jdump({"id": "m9", "threadId": "t9"})

    s = EmailSender(transport, gmail_access_token="at")
    env = s.send_email(["a@x", "b@x"], "Hello", "<p>hi</p>", "gmail")
    assert env["success"] and env["provider"] == "gmail"
    assert env["thread_id"] == "t9"
    assert captured["url"] == GMAIL_SEND_URL
    raw = base64.urlsafe_b64decode(captured["body"]["raw"])
    assert b"To: a@x, b@x" in raw and b"Subject: Hello" in raw
    assert b"<p>hi</p>" in raw


def test_override_to_intercepts_all_mail():
    captured = {}

    def transport(method, url, params, json_body, headers):
        captured.update(body=json_body)
        return 200, jdump({"id": "m1"})

    s = EmailSender(transport, gmail_access_token="at",
                    override_to="qa@test.example")
    s.send_email(["real@x"], "Launch", "<p>", "gmail",
                 cc=["boss@x"], bcc=["audit@x"])
    raw = base64.urlsafe_b64decode(captured["body"]["raw"])
    assert b"To: qa@test.example" in raw
    assert b"boss@x" not in raw and b"audit@x" not in raw
    assert b"[TEST -> real@x] Launch" in raw


def test_gmail_reply_threads_properly():
    fixtures = {
        FixtureRestTransport.key(
            "GET", f"{GMAIL_GET_URL}/m1",
            {"format": "metadata",
             "metadataHeaders": ["Message-ID", "Subject", "From"]},
        ): (200, jdump({
            "threadId": "t1",
            "payload": {"headers": [
                {"name": "Message-ID", "value": "<orig@mail>"},
                {"name": "Subject", "value": "Quarterly numbers"},
                {"name": "From", "value": "cfo@acme.example"},
            ]},
        })),
    }
    sent = {}

    class T(FixtureRestTransport):
        def __call__(self, method, url, params=None, json_body=None,
                     headers=None):
            if url == GMAIL_SEND_URL:
                sent.update(body=json_body)
                return 200, jdump({"id": "r1", "threadId": "t1"})
            return super().__call__(method, url, params, json_body,
                                    headers)

    s = EmailSender(T(fixtures), gmail_access_token="at")
    env = s.gmail_reply_email("m1", "<p>ack</p>")
    assert env["success"] and env["thread_id"] == "t1"
    assert sent["body"]["threadId"] == "t1"
    raw = base64.urlsafe_b64decode(sent["body"]["raw"])
    assert b"Subject: Re: Quarterly numbers" in raw
    assert b"In-Reply-To: <orig@mail>" in raw
    assert b"References: <orig@mail>" in raw
    assert b"To: cfo@acme.example" in raw


def test_gmail_reply_error_paths():
    s = EmailSender(FixtureRestTransport(), gmail_access_token="at")
    assert "message_id is required" in s.gmail_reply_email("", "<p>")["error"]
    assert "body" in s.gmail_reply_email("m1", "")["error"]

    def not_found(method, url, params, json_body, headers):
        return 404, b"{}"

    s = EmailSender(not_found, gmail_access_token="at")
    assert "not found" in s.gmail_reply_email("gone", "<p>")["error"]


def test_reply_subject_already_re_not_doubled():
    fixtures = {
        FixtureRestTransport.key(
            "GET", f"{GMAIL_GET_URL}/m2",
            {"format": "metadata",
             "metadataHeaders": ["Message-ID", "Subject", "From"]},
        ): (200, jdump({
            "threadId": "t2",
            "payload": {"headers": [
                {"name": "Message-Id", "value": "<o2@mail>"},
                {"name": "Subject", "value": "RE: ping"},
                {"name": "From", "value": "a@x"},
            ]},
        })),
    }
    sent = {}

    class T(FixtureRestTransport):
        def __call__(self, method, url, params=None, json_body=None,
                     headers=None):
            if url == GMAIL_SEND_URL:
                sent.update(body=json_body)
                return 200, jdump({"id": "r2"})
            return super().__call__(method, url, params, json_body,
                                    headers)

    EmailSender(T(fixtures), gmail_access_token="at").gmail_reply_email(
        "m2", "<p>")
    raw = base64.urlsafe_b64decode(sent["body"]["raw"])
    assert b"Subject: RE: ping" in raw and b"Re: RE:" not in raw
    # Message-Id casing variant still threads
    assert b"In-Reply-To: <o2@mail>" in raw
