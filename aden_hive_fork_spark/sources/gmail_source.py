"""Gmail REST connector — the reference gmail tool's query surface
with envelope parity, on the pluggable REST transport seam.

Reference analogs (tools/src/aden_tools/tools/gmail_tool/
gmail_tool.py): request shape ``_gmail_request`` (:63-76, Bearer +
JSON against ``/gmail/v1/users/me``); error map ``_handle_error``
(:78-91: 200/204 ok, 401 token-expired, 404 message-not-found, else
status+text); header flattening ``_parse_headers`` (:103-110 —
subject/from/to/date/cc only); ``gmail_list_messages`` (:113-162,
max_results clamped 1..500, q/maxResults/pageToken params);
``gmail_get_message`` (:165-231, format metadata|full|minimal,
flattened result); body decode ``_extract_body`` (:233-255,
urlsafe-b64, text/plain then text/html parts); trash (:257-287);
modify labels (:290-356); batchModify (:358-408, 204 no-content);
batch get (:411-487, max 50, per-id error list); create_draft
(:490-548, MIME raw urlsafe-b64); labels list/create (:551-629).

Two tiers: ``GmailClient`` is the interactive driver shape;
``gmail_messages_table`` hydrates a TABLE of message ids on the
executors (mapInPandas, map-only, per-row error envelopes) into flat
rows ready for text analytics (dedup, language-ID, PII scans).
"""

from __future__ import annotations

import base64
from typing import Iterator

from pyspark.sql import DataFrame

from .rest_connector import sanitize_path_param

GMAIL_API_BASE = "https://gmail.googleapis.com/gmail/v1/users/me"

NO_CREDS = {
    "error": "Gmail credentials not configured",
    "help": "Set GOOGLE_ACCESS_TOKEN or connect a Google account",
}


def parse_headers(headers: list[dict]) -> dict:
    """Flatten the common RFC-822 headers (gmail_tool.py:103-110)."""
    result: dict[str, str] = {}
    for h in headers:
        name = h.get("name", "").lower()
        if name in ("subject", "from", "to", "date", "cc"):
            result[name] = h.get("value", "")
    return result


def extract_body(payload: dict) -> str | None:
    """Plain-text body from a Gmail message payload
    (gmail_tool.py:233-255): direct body first, else the first
    text/plain part, else the first text/html part."""
    body = payload.get("body", {})
    if body.get("data"):
        try:
            return base64.urlsafe_b64decode(body["data"]).decode("utf-8")
        except Exception:
            pass
    parts = payload.get("parts", [])
    for mime_type in ("text/plain", "text/html"):
        for part in parts:
            if part.get("mimeType") == mime_type:
                data = part.get("body", {}).get("data")
                if data:
                    try:
                        return base64.urlsafe_b64decode(data).decode("utf-8")
                    except Exception:
                        pass
    return None


def _flatten_message(data: dict, format: str) -> dict:
    result: dict = {
        "id": data.get("id"),
        "threadId": data.get("threadId"),
        "labels": data.get("labelIds", []),
        "snippet": data.get("snippet", ""),
    }
    payload = data.get("payload", {})
    headers = payload.get("headers", [])
    if headers:
        result.update(parse_headers(headers))
    if format == "full":
        body_text = extract_body(payload)
        if body_text:
            result["body"] = body_text
    return result


class GmailClient:
    """Gmail API client with reference envelope parity.

    ``transport(method, url, params, json_body, headers) ->
    (status, bytes)``."""

    def __init__(self, access_token: str, transport):
        self._token = access_token
        self.transport = transport

    def _request(self, method, path, params=None, json_body=None):
        return self.transport(
            method,
            f"{GMAIL_API_BASE}/{path}",
            params,
            json_body,
            {
                "Authorization": f"Bearer {self._token}",
                "Content-Type": "application/json",
            },
        )

    @staticmethod
    def _handle_error(status: int, body: bytes) -> dict | None:
        if status in (200, 204):
            return None
        if status == 401:
            return {
                "error": "Gmail token expired or invalid",
                "help": "Re-authorize the Google account",
            }
        if status == 404:
            return {"error": "Message not found"}
        return {
            "error": f"Gmail API error (HTTP {status}): "
                     f"{body.decode(errors='replace')}"
        }

    def _json(self, body: bytes) -> dict:
        import json

        try:
            return json.loads(body)
        except Exception:
            return {}

    def list_messages(self, query: str = "is:unread", max_results: int = 100,
                      page_token: str | None = None) -> dict:
        max_results = max(1, min(500, max_results))
        params: dict = {"q": query, "maxResults": max_results}
        if page_token:
            params["pageToken"] = page_token
        try:
            status, body = self._request("GET", "messages", params)
        except Exception as e:
            return {"error": f"Request failed: {e}"}
        err = self._handle_error(status, body)
        if err:
            return err
        data = self._json(body)
        return {
            "messages": data.get("messages", []),
            "result_size_estimate": data.get("resultSizeEstimate", 0),
            "next_page_token": data.get("nextPageToken"),
        }

    def get_message(self, message_id: str, format: str = "metadata") -> dict:
        if not message_id:
            return {"error": "message_id is required"}
        try:
            message_id = sanitize_path_param(message_id, "message_id")
        except ValueError as e:
            return {"error": str(e)}
        try:
            status, body = self._request(
                "GET", f"messages/{message_id}", {"format": format}
            )
        except Exception as e:
            return {"error": f"Request failed: {e}"}
        err = self._handle_error(status, body)
        if err:
            return err
        return _flatten_message(self._json(body), format)

    def trash_message(self, message_id: str) -> dict:
        if not message_id:
            return {"error": "message_id is required"}
        try:
            message_id = sanitize_path_param(message_id, "message_id")
        except ValueError as e:
            return {"error": str(e)}
        try:
            status, body = self._request(
                "POST", f"messages/{message_id}/trash"
            )
        except Exception as e:
            return {"error": f"Request failed: {e}"}
        err = self._handle_error(status, body)
        if err:
            return err
        return {"success": True, "message_id": message_id}

    def modify_message(self, message_id: str, add_labels=None,
                       remove_labels=None) -> dict:
        if not message_id:
            return {"error": "message_id is required"}
        try:
            message_id = sanitize_path_param(message_id, "message_id")
        except ValueError as e:
            return {"error": str(e)}
        if not add_labels and not remove_labels:
            return {"error": "At least one of add_labels or remove_labels "
                             "is required"}
        payload: dict = {}
        if add_labels:
            payload["addLabelIds"] = list(add_labels)
        if remove_labels:
            payload["removeLabelIds"] = list(remove_labels)
        try:
            status, body = self._request(
                "POST", f"messages/{message_id}/modify", json_body=payload
            )
        except Exception as e:
            return {"error": f"Request failed: {e}"}
        err = self._handle_error(status, body)
        if err:
            return err
        data = self._json(body)
        return {"success": True, "message_id": message_id,
                "labels": data.get("labelIds", [])}

    def batch_modify_messages(self, message_ids, add_labels=None,
                              remove_labels=None) -> dict:
        message_ids = list(message_ids or [])
        if not message_ids:
            return {"error": "message_ids list is required and must not "
                             "be empty"}
        if not add_labels and not remove_labels:
            return {"error": "At least one of add_labels or remove_labels "
                             "is required"}
        payload: dict = {"ids": message_ids}
        if add_labels:
            payload["addLabelIds"] = list(add_labels)
        if remove_labels:
            payload["removeLabelIds"] = list(remove_labels)
        try:
            status, body = self._request(
                "POST", "messages/batchModify", json_body=payload
            )
        except Exception as e:
            return {"error": f"Request failed: {e}"}
        err = self._handle_error(status, body)  # 204 No Content on success
        if err:
            return err
        return {"success": True, "count": len(message_ids)}

    def batch_get_messages(self, message_ids, format: str = "metadata"
                           ) -> dict:
        if not message_ids:
            return {"error": "message_ids list is required and must not "
                             "be empty"}
        if len(message_ids) > 50:
            return {"error": "Maximum 50 message IDs per call"}
        messages, errors = [], []
        for mid in message_ids:
            try:
                mid = sanitize_path_param(mid, "message_id")
            except ValueError as e:
                errors.append({"message_id": mid, "error": str(e)})
                continue
            try:
                status, body = self._request(
                    "GET", f"messages/{mid}", {"format": format}
                )
            except Exception as e:
                errors.append({"message_id": mid,
                               "error": f"Request failed: {e}"})
                continue
            err = self._handle_error(status, body)
            if err:
                errors.append({"message_id": mid, **err})
                continue
            messages.append(_flatten_message(self._json(body), format))
        return {"messages": messages, "count": len(messages),
                "errors": errors}

    def create_draft(self, to: str, subject: str, html: str) -> dict:
        if not to or not to.strip():
            return {"error": "Recipient email (to) is required"}
        if not subject or not subject.strip():
            return {"error": "Subject is required"}
        if not html:
            return {"error": "Email body (html) is required"}
        from email.mime.text import MIMEText

        msg = MIMEText(html, "html")
        msg["To"] = to
        msg["Subject"] = subject
        raw = base64.urlsafe_b64encode(msg.as_bytes()).decode("ascii")
        try:
            status, body = self._request(
                "POST", "drafts", json_body={"message": {"raw": raw}}
            )
        except Exception as e:
            return {"error": f"Request failed: {e}"}
        err = self._handle_error(status, body)
        if err:
            return err
        data = self._json(body)
        return {
            "success": True,
            "draft_id": data.get("id", ""),
            "message_id": data.get("message", {}).get("id", ""),
        }

    def list_labels(self) -> dict:
        try:
            status, body = self._request("GET", "labels")
        except Exception as e:
            return {"error": f"Request failed: {e}"}
        err = self._handle_error(status, body)
        if err:
            return err
        return {"labels": self._json(body).get("labels", [])}

    def create_label(self, name: str,
                     label_list_visibility: str = "labelShow",
                     message_list_visibility: str = "show") -> dict:
        if not name or not name.strip():
            return {"error": "Label name is required"}
        payload = {
            "name": name,
            "labelListVisibility": label_list_visibility,
            "messageListVisibility": message_list_visibility,
        }
        try:
            status, body = self._request("POST", "labels", json_body=payload)
        except Exception as e:
            return {"error": f"Request failed: {e}"}
        err = self._handle_error(status, body)
        if err:
            return err
        data = self._json(body)
        return {
            "success": True,
            "id": data.get("id", ""),
            "name": data.get("name", ""),
            "type": data.get("type", "user"),
        }


MESSAGE_SCHEMA = (
    "message_id string, thread_id string, subject string, sender string, "
    "recipient string, msg_date string, snippet string, labels string, "
    "body string, error string"
)


def gmail_messages_table(ids: DataFrame, client_factory,
                         format: str = "full",
                         id_col: str = "message_id") -> DataFrame:
    """Hydrate a TABLE of Gmail message ids on the executors
    (mapInPandas, map-only, no shuffle): one flat row per message,
    per-row error envelopes. ``client_factory`` builds the
    per-executor client and must pickle by value (lambda/closure).

    The output is a normal text table — feed it straight into the
    dedup / language-ID / PII operators. At scale the fetch
    parallelism is the input partitioning; repartition the id table
    to the connector's rate budget."""
    import pandas as pd

    cols = [f.split()[0] for f in MESSAGE_SCHEMA.split(",")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for mid in pdf[id_col]:
                env = client.get_message(str(mid), format=format)
                if "error" in env:
                    rows.append({"message_id": mid, "thread_id": None,
                                 "subject": None, "sender": None,
                                 "recipient": None, "msg_date": None,
                                 "snippet": None, "labels": None,
                                 "body": None, "error": env["error"]})
                    continue
                rows.append({
                    "message_id": env.get("id"),
                    "thread_id": env.get("threadId"),
                    "subject": env.get("subject"),
                    "sender": env.get("from"),
                    "recipient": env.get("to"),
                    "msg_date": env.get("date"),
                    "snippet": env.get("snippet"),
                    "labels": ",".join(env.get("labels", [])),
                    "body": env.get("body"),
                    "error": None,
                })
            yield pd.DataFrame(rows, columns=cols)

    return ids.select(id_col).mapInPandas(run, MESSAGE_SCHEMA)
