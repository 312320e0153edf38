"""Google Docs connector — document authoring/reading via Docs API v1
and Drive v3 with envelope parity, on the pluggable REST transport
seam.

Reference analogs (tools/src/aden_tools/tools/google_docs_tool/
google_docs_tool.py): image-URI validation (:49-81 — scheme
whitelist http/https, URL regex, netloc required); end-index
derivation for appends (:84-100 — last element endIndex − 1, before
the final newline); service-account JWT assembly + token exchange
(:102-200 — RS256 header/claims with documents+drive scopes, 1-hour
expiry, jwt-bearer grant; the RSA signer is pluggable here since the
container has no crypto lib, with the reference's own fallback of a
pre-exchanged ``access_token``); client error map (:212-232 —
401/403 with the required scope, 404, 429, Google's nested
``error.message``); create/get/batchUpdate (:237-264, 60 s budget
for batch); insertText at index or end (:266-292); replaceAllText
template fill (:294-314); insertInlineImage with PT-sized
objectSize (:316-344); updateTextStyle with a fields mask
(:346-390); createParagraphBullets (:392-409); Drive-side comments
add/list (:411-453, ``fields=*`` / pageSize clamp 1..100); Drive
export with base64 content envelope (:455-476).
"""

from __future__ import annotations

import base64
import json
import re
import time
from urllib.parse import urlparse

GOOGLE_DOCS_API_BASE = "https://docs.googleapis.com/v1"
GOOGLE_DRIVE_API_BASE = "https://www.googleapis.com/drive/v3"
GOOGLE_OAUTH_TOKEN_URL = "https://oauth2.googleapis.com/token"

ALLOWED_IMAGE_SCHEMES = {"https", "http"}
URL_PATTERN = re.compile(
    r"^https?://"
    r"(?:(?:[A-Z0-9](?:[A-Z0-9-]{0,61}[A-Z0-9])?\.)+[A-Z]{2,6}\.?|"
    r"localhost|"
    r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})"
    r"(?::\d+)?"
    r"(?:/?|[/?]\S+)$",
    re.IGNORECASE,
)

NO_CREDS = {
    "error": "Google Docs credentials not configured",
    "help": "Set GOOGLE_DOCS_ACCESS_TOKEN environment variable",
}


def validate_image_uri(uri: str) -> dict | None:
    """None when valid; error envelope otherwise
    (google_docs_tool.py:49-81)."""
    if not uri or not uri.strip():
        return {"error": "Image URI cannot be empty"}
    parsed = urlparse(uri)
    if not parsed.scheme:
        return {"error": "Invalid image URI: missing scheme. "
                         "Use https:// or http://"}
    if parsed.scheme.lower() not in ALLOWED_IMAGE_SCHEMES:
        return {
            "error": f"Invalid image URI scheme: '{parsed.scheme}'. "
                     f"Only {', '.join(sorted(ALLOWED_IMAGE_SCHEMES))} "
                     f"are allowed."
        }
    if not URL_PATTERN.match(uri):
        return {"error": f"Invalid image URI format: '{uri}'"}
    if not parsed.netloc:
        return {"error": "Invalid image URI: missing domain"}
    return None


def document_end_index(doc: dict) -> int:
    """Append position: last element's endIndex − 1, before the final
    newline (google_docs_tool.py:84-100)."""
    content = doc.get("body", {}).get("content", [])
    if content:
        return content[-1].get("endIndex", 1) - 1
    return 1


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def build_service_account_jwt(sa_data: dict, *, now: int | None = None,
                              signer=None) -> str | None:
    """Assemble the RS256 service-account JWT
    (google_docs_tool.py:134-175). ``signer(signing_input: bytes) ->
    signature bytes`` is the RSA seam — the reference uses the
    ``cryptography`` lib, absent here, so live deployments inject
    one; returns None without it (the reference's ImportError
    fallback)."""
    private_key = sa_data.get("private_key")
    client_email = sa_data.get("client_email")
    token_uri = sa_data.get("token_uri", GOOGLE_OAUTH_TOKEN_URL)
    if not private_key or not client_email:
        return None
    if signer is None:
        return None
    now = int(time.time()) if now is None else now
    header = {"alg": "RS256", "typ": "JWT"}
    claims = {
        "iss": client_email,
        "sub": client_email,
        "aud": token_uri,
        "iat": now,
        "exp": now + 3600,
        "scope": (
            "https://www.googleapis.com/auth/documents "
            "https://www.googleapis.com/auth/drive.file "
            "https://www.googleapis.com/auth/drive"
        ),
    }
    signing_input = (
        f"{_b64url(json.dumps(header).encode())}."
        f"{_b64url(json.dumps(claims).encode())}"
    )
    signature = signer(signing_input.encode())
    return f"{signing_input}.{_b64url(signature)}"


def service_account_token(service_account_json: str, transport,
                          signer=None, now: int | None = None
                          ) -> str | None:
    """Service-account JSON → access token
    (google_docs_tool.py:102-200): non-service-account JSON falls
    back to its ``access_token`` field; a signed JWT is exchanged via
    the jwt-bearer grant; signing unavailable → the same
    ``access_token`` fallback the reference uses on ImportError."""
    try:
        sa_data = json.loads(service_account_json)
    except json.JSONDecodeError:
        return None
    if sa_data.get("type") != "service_account":
        return sa_data.get("access_token")
    jwt_token = build_service_account_jwt(sa_data, now=now, signer=signer)
    if jwt_token is None:
        return sa_data.get("access_token")
    token_uri = sa_data.get("token_uri", GOOGLE_OAUTH_TOKEN_URL)
    try:
        status, body = transport(
            "POST", token_uri,
            {"grant_type": "urn:ietf:params:oauth:grant-type:jwt-bearer",
             "assertion": jwt_token},
            None, {},
        )
    except Exception:
        return None
    if status == 200:
        try:
            return json.loads(body).get("access_token")
        except Exception:
            return None
    return None


class GoogleDocsClient:
    """Docs API v1 + Drive v3 client. ``transport(method, url, params,
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

    @staticmethod
    def _handle(status: int, body: bytes) -> dict:
        if status == 401:
            return {"error": "Invalid or expired Google access token"}
        if status == 403:
            return {
                "error": "Insufficient permissions. Check your Google API "
                         "scopes. Required scopes: "
                         "https://www.googleapis.com/auth/documents"
            }
        if status == 404:
            return {"error": "Document not found"}
        if status == 429:
            return {"error": "Google API rate limit exceeded. "
                             "Try again later."}
        if status >= 400:
            try:
                detail = json.loads(body).get("error", {}).get(
                    "message", body.decode(errors="replace"))
            except Exception:
                detail = body.decode(errors="replace")
            return {"error": f"Google Docs API error (HTTP {status}): "
                             f"{detail}"}
        try:
            return json.loads(body)
        except Exception:
            return {}

    def _call(self, method, url, params=None, json_body=None) -> dict:
        try:
            status, body = self.transport(method, url, params, json_body,
                                          self._headers)
        except Exception as e:
            return {"error": f"Network error: {e}"}
        return self._handle(status, body)

    # --- documents (google_docs_tool.py:237-264) ---
    def create_document(self, title: str) -> dict:
        return self._call("POST", f"{GOOGLE_DOCS_API_BASE}/documents",
                          None, {"title": title})

    def get_document(self, document_id: str) -> dict:
        return self._call(
            "GET", f"{GOOGLE_DOCS_API_BASE}/documents/{document_id}"
        )

    def batch_update(self, document_id: str, requests: list[dict]) -> dict:
        return self._call(
            "POST",
            f"{GOOGLE_DOCS_API_BASE}/documents/{document_id}:batchUpdate",
            None, {"requests": requests},
        )

    # --- content ops (google_docs_tool.py:266-409) ---
    def insert_text(self, document_id: str, text: str, index=None,
                    segment_id=None) -> dict:
        location: dict = {}
        if segment_id:
            location["segmentId"] = segment_id
        if index is not None:
            location["index"] = index
        else:
            doc = self.get_document(document_id)
            if "error" in doc:
                return doc
            location["index"] = document_end_index(doc)
        return self.batch_update(document_id, [
            {"insertText": {"location": location, "text": text}}
        ])

    def replace_all_text(self, document_id: str, find_text: str,
                         replace_text: str,
                         match_case: bool = True) -> dict:
        if not find_text:
            return {"error": "find_text cannot be empty"}
        return self.batch_update(document_id, [{
            "replaceAllText": {
                "containsText": {"text": find_text,
                                 "matchCase": match_case},
                "replaceText": replace_text,
            }
        }])

    def insert_image(self, document_id: str, image_uri: str, index: int,
                     width_pt=None, height_pt=None) -> dict:
        validation_error = validate_image_uri(image_uri)
        if validation_error:
            return validation_error
        request: dict = {
            "insertInlineImage": {"location": {"index": index},
                                  "uri": image_uri}
        }
        if width_pt is not None or height_pt is not None:
            object_size: dict = {}
            if width_pt is not None:
                object_size["width"] = {"magnitude": width_pt, "unit": "PT"}
            if height_pt is not None:
                object_size["height"] = {"magnitude": height_pt,
                                         "unit": "PT"}
            request["insertInlineImage"]["objectSize"] = object_size
        return self.batch_update(document_id, [request])

    def format_text(self, document_id: str, start_index: int,
                    end_index: int, bold=None, italic=None, underline=None,
                    font_size_pt=None, foreground_color=None) -> dict:
        text_style: dict = {}
        fields: list[str] = []
        if bold is not None:
            text_style["bold"] = bold
            fields.append("bold")
        if italic is not None:
            text_style["italic"] = italic
            fields.append("italic")
        if underline is not None:
            text_style["underline"] = underline
            fields.append("underline")
        if font_size_pt is not None:
            text_style["fontSize"] = {"magnitude": font_size_pt,
                                      "unit": "PT"}
            fields.append("fontSize")
        if foreground_color is not None:
            text_style["foregroundColor"] = {
                "color": {"rgbColor": foreground_color}}
            fields.append("foregroundColor")
        if not fields:
            return {"error": "No formatting options specified"}
        return self.batch_update(document_id, [{
            "updateTextStyle": {
                "range": {"startIndex": start_index,
                          "endIndex": end_index},
                "textStyle": text_style,
                "fields": ",".join(fields),
            }
        }])

    def create_list(self, document_id: str, start_index: int,
                    end_index: int,
                    bullet_preset: str = "BULLET_DISC_CIRCLE_SQUARE"
                    ) -> dict:
        return self.batch_update(document_id, [{
            "createParagraphBullets": {
                "range": {"startIndex": start_index,
                          "endIndex": end_index},
                "bulletPreset": bullet_preset,
            }
        }])

    # --- Drive-side comments / export (google_docs_tool.py:411-476) ---
    def add_comment(self, document_id: str, content: str,
                    quoted_text=None) -> dict:
        body: dict = {"content": content}
        if quoted_text:
            body["quotedFileContent"] = {"value": quoted_text}
        return self._call(
            "POST",
            f"{GOOGLE_DRIVE_API_BASE}/files/{document_id}/comments",
            {"fields": "*"}, body,
        )

    def list_comments(self, document_id: str, page_size: int = 20,
                      page_token=None,
                      include_deleted: bool = False) -> dict:
        params: dict = {
            "fields": "comments(*),nextPageToken",
            "pageSize": max(1, min(page_size, 100)),
            "includeDeleted": str(include_deleted).lower(),
        }
        if page_token:
            params["pageToken"] = page_token
        return self._call(
            "GET",
            f"{GOOGLE_DRIVE_API_BASE}/files/{document_id}/comments",
            params,
        )

    def export_document(self, document_id: str,
                        mime_type: str = "application/pdf") -> dict:
        try:
            status, body = self.transport(
                "GET",
                f"{GOOGLE_DRIVE_API_BASE}/files/{document_id}/export",
                {"mimeType": mime_type}, None, self._headers,
            )
        except Exception as e:
            return {"error": f"Network error: {e}"}
        if status == 200:
            return {
                "document_id": document_id,
                "mime_type": mime_type,
                "content_base64": base64.b64encode(body).decode(),
                "size_bytes": len(body),
            }
        return self._handle(status, body)


# ----------------------------------------------------------------- table tier
def document_plain_text(doc: dict) -> str:
    """Concatenate every textRun in the document body — the Docs
    analog of pdf text extraction (reference reads documents through
    google_docs_tool.py's get_document and walks the same
    body.content/paragraph.elements/textRun.content path)."""
    out = []
    for el in (doc.get("body") or {}).get("content", []):
        for pe in (el.get("paragraph") or {}).get("elements", []):
            tr = pe.get("textRun")
            if tr and tr.get("content"):
                out.append(tr["content"])
    return "".join(out)


DOCUMENT_SCHEMA = (
    "document_id string, title string, n_chars bigint, error string"
)


def docs_documents_table(doc_ids, client_factory,
                         id_col: str = "document_id"):
    """Hydrate a TABLE of Google Doc ids on the executors
    (mapInPandas, map-only, per-row error envelopes): title + plain-
    text length per document. ``client_factory`` must pickle by
    value."""
    import pandas as pd

    cols = [f.split()[0] for f in DOCUMENT_SCHEMA.split(",")]

    def run(batches):
        client = client_factory()
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                env = client.get_document(str(did))
                if "error" in env:
                    rows.append({"document_id": did, "title": None,
                                 "n_chars": None, "error": env["error"]})
                    continue
                rows.append({
                    "document_id": did, "title": env.get("title"),
                    "n_chars": len(document_plain_text(env)),
                    "error": None,
                })
            yield pd.DataFrame(rows, columns=cols)

    return doc_ids.select(id_col).mapInPandas(run, DOCUMENT_SCHEMA)
