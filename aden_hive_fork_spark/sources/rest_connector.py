"""Shared REST transport seam for the SaaS tabular connectors
(GitHub / Gmail / Slack / Calendar / Stripe / HubSpot families).

The reference implements each connector as an httpx client talking to
the service's public REST API (e.g. tools/src/aden_tools/tools/
github_tool/github_tool.py:64-489, gmail_tool/gmail_tool.py:63-93).
This repo keeps that public wire shape but routes every request
through ONE pluggable callable::

    transport(method, url, params, json_body, headers) -> (status, bytes)

so the SAME request-building / error-mapping / parsing code runs
against live HTTP (``rest_http_transport``) or recorded fixtures
(``FixtureRestTransport`` — the record/replay pattern shared with
``search_source.FixtureGetTransport`` and the vision/LLM adapters).
Credentials never enter the fixture key, so fixtures recorded under
one token replay under any.

The connectors built on this seam each ship two tiers:

* a driver-side client with envelope parity to the reference tool
  (the interactive agent-call shape), and
* a ``*_table`` executor tier (``mapInPandas``, map-only, per-row
  error envelopes) that runs a TABLE of fetches in parallel and
  yields normal rows for downstream joins — the 100 TB shape, where
  connector output is a dimension Spark broadcasts against facts.
"""

from __future__ import annotations

import json


def sanitize_path_param(param: str, param_name: str = "parameter") -> str:
    """Reject URL path components that could traverse the API path
    (github_tool.py:25-41's contract: no '/' or '..')."""
    if "/" in param or ".." in param:
        raise ValueError(f"Invalid {param_name}: cannot contain '/' or '..'")
    return param


def sanitize_error_message(error: Exception) -> str:
    """Never echo an exception that may embed an Authorization header
    (github_tool.py:44-61's contract)."""
    s = str(error)
    if "Authorization" in s or "Bearer" in s:
        return "Network error occurred"
    return f"Network error: {s}"


def rest_http_transport(timeout: float = 30.0):
    """Live transport (stdlib urllib; the sandbox has no external
    network, so tests exercise the fixture transport — request
    building and parsing above this seam are transport-agnostic)."""

    def send(method, url, params=None, json_body=None, headers=None):
        import urllib.error
        import urllib.parse
        import urllib.request

        full = url
        if params:
            full = f"{url}?{urllib.parse.urlencode(params)}"
        data = None
        if json_body is not None:
            data = json.dumps(json_body).encode()
        req = urllib.request.Request(
            full, data=data, headers=dict(headers or {}), method=method
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    return send


class FixtureRestTransport:
    """Record/replay transport: responses keyed by
    (method, url, sorted params, canonical-JSON body). Credential
    material (headers, and any param named in ``_CRED_PARAMS``) is
    excluded from the key. ``record`` mode wraps a live transport and
    stores every response for offline replay."""

    _CRED_PARAMS = {"key", "apikey", "apiKey", "api_key", "token",
                    "access_token"}

    def __init__(self, fixtures: dict | None = None, live=None):
        self.fixtures: dict[tuple, tuple[int, bytes]] = dict(fixtures or {})
        self.live = live
        self.requests: list[tuple] = []

    @classmethod
    def key(cls, method, url, params=None, json_body=None) -> tuple:
        return (
            method.upper(),
            url,
            tuple(
                sorted(
                    (k, str(v))
                    for k, v in (params or {}).items()
                    if k not in cls._CRED_PARAMS
                )
            ),
            json.dumps(json_body, sort_keys=True) if json_body is not None
            else None,
        )

    def __call__(self, method, url, params=None, json_body=None,
                 headers=None):
        self.requests.append(
            (method, url, dict(params or {}), json_body, dict(headers or {}))
        )
        k = self.key(method, url, params, json_body)
        if k in self.fixtures:
            return self.fixtures[k]
        if self.live is not None:  # record mode
            resp = self.live(method, url, params, json_body, headers)
            self.fixtures[k] = resp
            return resp
        return 404, b'{"message": "no fixture for request"}'


def jdump(obj) -> bytes:
    """Fixture-building helper: canonical JSON bytes."""
    return json.dumps(obj).encode()
