"""Outbound email connector — the reference email tool's
dual-provider send surface (Resend / Gmail) with envelope parity, on
the pluggable REST transport seam.

Reference analogs (tools/src/aden_tools/tools/email_tool/
email_tool.py): Resend send (:28-59 — SDK call here re-derived from
Resend's public REST wire: POST /emails with Bearer auth,
``{"from", "to", "subject", "html", "cc", "bcc"}``, success envelope
``{success, provider, id, to, subject}``); Gmail send (:61-114 —
multipart/alternative MIME, urlsafe-b64 raw, POST
``users/me/messages/send``); recipient normalization (:139-148 —
string→list, blank-filtered, empty→None); validation (:150-180 —
recipient required, subject 1..998 per RFC 2822, html required,
Resend requires from_email); the ``EMAIL_OVERRIDE_TO`` intercept
(:176-183 — all outbound mail redirected, subject prefixed with the
original recipients, injectable here instead of env-read);
threaded Gmail reply (:251-420 — fetch original for
threadId/Message-ID/Subject/From, "Re: " prefix, In-Reply-To +
References headers, raw+threadId send).
"""

from __future__ import annotations

import base64
import json

RESEND_API_BASE = "https://api.resend.com"
GMAIL_SEND_URL = "https://gmail.googleapis.com/gmail/v1/users/me/messages/send"
GMAIL_GET_URL = "https://gmail.googleapis.com/gmail/v1/users/me/messages"

RESEND_NO_CREDS = {
    "error": "Resend credentials not configured",
    "help": "Set RESEND_API_KEY environment variable. "
            "Get a key at https://resend.com/api-keys",
}

GMAIL_NO_CREDS = {
    "error": "Gmail credentials not configured",
    "help": "Connect a Google account",
}


def normalize_recipients(value) -> list[str] | None:
    """string → [string]; blank entries filtered; empty → None
    (email_tool.py:139-148)."""
    if value is None:
        return None
    if isinstance(value, str):
        return [value] if value.strip() else None
    filtered = [v for v in value if isinstance(v, str) and v.strip()]
    return filtered if filtered else None


def _build_mime(to: list[str], subject: str, html: str,
                from_email=None, cc=None, bcc=None,
                in_reply_to: str | None = None) -> str:
    from email.mime.multipart import MIMEMultipart
    from email.mime.text import MIMEText

    msg = MIMEMultipart("alternative")
    msg["To"] = ", ".join(to)
    msg["Subject"] = subject
    if from_email:
        msg["From"] = from_email
    if in_reply_to:
        msg["In-Reply-To"] = in_reply_to
        msg["References"] = in_reply_to
    if cc:
        msg["Cc"] = ", ".join(cc)
    if bcc:
        msg["Bcc"] = ", ".join(bcc)
    msg.attach(MIMEText(html, "html"))
    return base64.urlsafe_b64encode(msg.as_bytes()).decode("ascii")


class EmailSender:
    """Dual-provider outbound email. ``transport(method, url, params,
    json_body, headers) -> (status, bytes)``.

    ``override_to`` replaces the reference's EMAIL_OVERRIDE_TO env
    intercept: when set, ALL outbound mail is redirected there, cc/bcc
    dropped, and the subject prefixed with the original recipients —
    the provider wire sees only the override address."""

    def __init__(self, transport, resend_api_key: str | None = None,
                 gmail_access_token: str | None = None,
                 from_email: str | None = None,
                 override_to: str | None = None):
        self.transport = transport
        self.resend_api_key = resend_api_key
        self.gmail_access_token = gmail_access_token
        self.from_email = from_email
        self.override_to = override_to

    def send_email(self, to, subject: str, html: str, provider: str,
                   from_email=None, cc=None, bcc=None) -> dict:
        from_email = from_email or self.from_email
        to_list = normalize_recipients(to)
        if not to_list:
            return {"error": "At least one recipient email is required"}
        if not subject or len(subject) > 998:
            return {"error": "Subject must be 1-998 characters"}
        if not html:
            return {"error": "Email body (html) is required"}
        cc_list = normalize_recipients(cc)
        bcc_list = normalize_recipients(bcc)

        if self.override_to:
            original_to = to_list
            to_list = [self.override_to]
            cc_list = bcc_list = None
            subject = f"[TEST -> {', '.join(original_to)}] {subject}"

        if provider == "resend" and not from_email:
            return {
                "error": "Sender email is required",
                "help": "Pass from_email or configure a default sender",
            }
        if provider == "gmail":
            if not self.gmail_access_token:
                return dict(GMAIL_NO_CREDS)
            return self._send_via_gmail(to_list, subject, html, from_email,
                                        cc_list, bcc_list)
        if not self.resend_api_key:
            return dict(RESEND_NO_CREDS)
        return self._send_via_resend(to_list, subject, html, from_email,
                                     cc_list, bcc_list)

    def _send_via_resend(self, to, subject, html, from_email, cc, bcc
                         ) -> dict:
        payload: dict = {"from": from_email, "to": to,
                         "subject": subject, "html": html}
        if cc:
            payload["cc"] = cc
        if bcc:
            payload["bcc"] = bcc
        try:
            status, body = self.transport(
                "POST", f"{RESEND_API_BASE}/emails", None, payload,
                {"Authorization": f"Bearer {self.resend_api_key}",
                 "Content-Type": "application/json"},
            )
        except Exception as e:
            return {"error": f"Email send failed: {e}"}
        try:
            data = json.loads(body)
        except Exception:
            data = {}
        if status != 200:
            msg = data.get("message") or f"HTTP {status}"
            return {"error": f"Resend API error: {msg}"}
        return {"success": True, "provider": "resend",
                "id": data.get("id", ""), "to": to, "subject": subject}

    def _gmail_headers(self) -> dict:
        return {"Authorization": f"Bearer {self.gmail_access_token}",
                "Content-Type": "application/json"}

    def _send_via_gmail(self, to, subject, html, from_email, cc, bcc,
                        thread_id: str | None = None,
                        in_reply_to: str | None = None) -> dict:
        raw = _build_mime(to, subject, html, from_email, cc, bcc,
                          in_reply_to)
        payload: dict = {"raw": raw}
        if thread_id:
            payload["threadId"] = thread_id
        try:
            status, body = self.transport(
                "POST", GMAIL_SEND_URL, None, payload,
                self._gmail_headers(),
            )
        except Exception as e:
            return {"error": f"Email send failed: {e}"}
        if status == 401:
            return {"error": "Gmail token expired or invalid",
                    "help": "Re-authorize the Google account"}
        if status != 200:
            return {"error": f"Gmail API error (HTTP {status}): "
                             f"{body.decode(errors='replace')}"}
        try:
            data = json.loads(body)
        except Exception:
            data = {}
        out = {"success": True, "provider": "gmail",
               "id": data.get("id", ""), "to": to, "subject": subject}
        if data.get("threadId"):
            out["thread_id"] = data["threadId"]
        return out

    def _fetch_original(self, message_id: str) -> dict:
        try:
            status, body = self.transport(
                "GET", f"{GMAIL_GET_URL}/{message_id}",
                {"format": "metadata",
                 "metadataHeaders": ["Message-ID", "Subject", "From"]},
                None, self._gmail_headers(),
            )
        except Exception as e:
            return {"error": f"Failed to fetch original message: {e}"}
        if status == 401:
            return {"error": "Gmail token expired or invalid",
                    "help": "Re-authorize the Google account"}
        if status == 404:
            return {"error": f"Original message not found: {message_id}"}
        if status != 200:
            return {"error": f"Gmail API error (HTTP {status}): "
                             f"{body.decode(errors='replace')}"}
        data = json.loads(body)
        headers = {h["name"]: h["value"]
                   for h in data.get("payload", {}).get("headers", [])}
        return {
            "thread_id": data.get("threadId"),
            "message_id_header": headers.get(
                "Message-ID", headers.get("Message-Id", "")),
            "subject": headers.get("Subject", ""),
            "from": headers.get("From", ""),
        }

    def gmail_reply_email(self, message_id: str, html: str, cc=None,
                          bcc=None) -> dict:
        if not message_id or not message_id.strip():
            return {"error": "message_id is required"}
        if not html:
            return {"error": "Reply body (html) is required"}
        if not self.gmail_access_token:
            return dict(GMAIL_NO_CREDS)
        original = self._fetch_original(message_id)
        if "error" in original:
            return original
        subject = original["subject"]
        if not subject.lower().startswith("re:"):
            subject = f"Re: {subject}"
        to_list = [original["from"]]
        cc_list = normalize_recipients(cc)
        bcc_list = normalize_recipients(bcc)
        if self.override_to:
            prefixed = f"[TEST -> {original['from']}] {subject}"
            to_list, cc_list, bcc_list = [self.override_to], None, None
            subject = prefixed
        return self._send_via_gmail(
            to_list, subject, html, None, cc_list, bcc_list,
            thread_id=original["thread_id"],
            in_reply_to=original["message_id_header"] or None,
        )


# ----------------------------------------------------------------- table tier
SEND_RECEIPT_SCHEMA = (
    "to string, subject string, provider string, message_id string, "
    "success boolean, error string"
)


def email_send_table(messages, sender_factory, provider: str = "resend",
                     to_col: str = "to", subject_col: str = "subject",
                     html_col: str = "html"):
    """Send a TABLE of (to, subject, html) messages through the
    outbound-email connector on the executors (mapInPandas, map-only)
    and return the delivery receipts. ``sender_factory`` must pickle
    by value (lambda/closure)."""
    import pandas as pd

    cols = [f.split()[0] for f in SEND_RECEIPT_SCHEMA.split(",")]

    def run(batches):
        sender = sender_factory()
        for pdf in batches:
            rows = []
            for to, subject, html in zip(
                pdf[to_col], pdf[subject_col], pdf[html_col]
            ):
                env = sender.send_email(str(to), str(subject), str(html),
                                        provider)
                if "error" in env:
                    rows.append({"to": to, "subject": subject,
                                 "provider": provider, "message_id": None,
                                 "success": None, "error": env["error"]})
                    continue
                rows.append({
                    "to": to, "subject": subject, "provider": provider,
                    "message_id": env.get("id"),
                    "success": bool(env.get("success")), "error": None,
                })
            yield pd.DataFrame(rows, columns=cols)

    return messages.select(to_col, subject_col, html_col).mapInPandas(
        run, SEND_RECEIPT_SCHEMA
    )
