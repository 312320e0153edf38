"""Google Calendar connector — the reference calendar tool's query
surface with envelope parity, on the pluggable REST transport seam.

Reference analogs (tools/src/aden_tools/tools/calendar_tool/
calendar_tool.py): URL-encoded ids ``_encode_id`` (:118-120);
token-safe error truncation ``_sanitize_error`` (:122-133); IANA
timezone validation (:140-145); date-only regex for all-day events
(:138-139); ``_handle_response`` error map (:146-177: 401/403/404/
429, then Google's ``{"error": {"message"}}`` body); list events
(:179-278 — maxResults 1..2500, singleEvents+orderBy=startTime,
flattened event rows with attendee emails); get event (:274-315);
create event (:317-434 — all-day vs dateTime bodies, timezone on
both ends, attendees→Meet conferenceData, sendUpdates param);
delete event (:590-640, 204 → success message); list calendars
(:642-703, flattened calendarList); get calendar (:705-744);
freeBusy availability (:746-823, per-calendar busy/error shaping).

Two tiers: ``CalendarClient`` is the interactive driver shape;
``calendar_events_table`` pulls events for a TABLE of calendar ids
on the executors (mapInPandas, map-only, per-row error envelopes).
"""

from __future__ import annotations

import re
from typing import Iterator
from urllib.parse import quote

from pyspark.sql import DataFrame

CALENDAR_API_BASE = "https://www.googleapis.com/calendar/v3"

_DATE_ONLY_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")

NO_CREDS = {
    "error": "Calendar credentials not configured",
    "help": "Set GOOGLE_CALENDAR_ACCESS_TOKEN environment variable",
}


def encode_id(id_value: str) -> str:
    """URL-encode a calendar/event id for safe path use
    (calendar_tool.py:118-120)."""
    return quote(id_value, safe="")


def sanitize_error(e: Exception) -> str:
    """Token-safe error text (calendar_tool.py:122-133): redact when
    Bearer/Authorization appear; truncate long messages."""
    msg = str(e)
    if "Bearer" in msg or "Authorization" in msg:
        return f"{type(e).__name__}: Request failed (details redacted for security)"
    if len(msg) > 200:
        return f"{type(e).__name__}: {msg[:200]}..."
    return msg


def validate_timezone(tz: str) -> dict | None:
    """IANA timezone check (calendar_tool.py:140-145)."""
    from zoneinfo import available_timezones

    if tz not in available_timezones():
        return {"error": f"Invalid timezone '{tz}'. Use IANA format "
                         f"(e.g., 'America/New_York')"}
    return None


def flatten_event(item: dict) -> dict:
    """One API event → flat row (calendar_tool.py:246-261)."""
    start = item.get("start", {})
    end = item.get("end", {})
    out = {
        "id": item.get("id"),
        "summary": item.get("summary", "(No title)"),
        "start": start.get("dateTime") or start.get("date"),
        "end": end.get("dateTime") or end.get("date"),
        "location": item.get("location"),
        "status": item.get("status"),
        "html_link": item.get("htmlLink"),
        "description": item.get("description"),
        "hangoutLink": item.get("hangoutLink"),
    }
    if item.get("attendees"):
        out["attendees"] = [a.get("email") for a in item["attendees"]]
    return out


class CalendarClient:
    """Google Calendar API client with reference envelope parity.

    ``transport(method, url, params, json_body, headers) ->
    (status, bytes)``. ``request_id_factory`` is the injectable seam
    for the Meet conferenceData requestId (deterministic in tests;
    uuid-based live, calendar_tool.py:410)."""

    def __init__(self, access_token: str, transport,
                 request_id_factory=None):
        self._token = access_token
        self.transport = transport
        self._request_id = request_id_factory or (
            lambda: f"meet-{__import__('uuid').uuid4().hex[:12]}"
        )

    def _headers(self) -> dict[str, str]:
        return {
            "Authorization": f"Bearer {self._token}",
            "Content-Type": "application/json",
        }

    def _handle(self, status: int, body: bytes) -> dict:
        import json as _json

        if status == 401:
            return {
                "error": "Invalid or expired OAuth token",
                "help": "Re-authorize the Google account",
            }
        if status == 403:
            return {
                "error": "Access denied. Check calendar permissions.",
                "help": "Ensure the OAuth token has calendar.events scope",
            }
        if status == 404:
            return {"error": "Resource not found"}
        if status == 429:
            return {"error": "Rate limit exceeded. Try again later."}
        if status >= 400:
            try:
                message = _json.loads(body).get("error", {}).get(
                    "message", "Unknown error")
                return {"error": f"API error: {message}"}
            except Exception:
                return {"error": f"API request failed: HTTP {status}"}
        try:
            return _json.loads(body)
        except Exception:
            return {}

    def _request(self, method, path, params=None, json_body=None):
        return self.transport(method, f"{CALENDAR_API_BASE}{path}", params,
                              json_body, self._headers())

    def list_events(self, calendar_id="primary", time_min=None,
                    time_max=None, max_results=10, query=None) -> dict:
        if max_results < 1 or max_results > 2500:
            return {"error": "max_results must be between 1 and 2500"}
        params: dict = {
            "maxResults": max_results,
            "singleEvents": "true",
            "orderBy": "startTime",
        }
        # the reference defaults time_min to now(); keep it explicit
        # and injectable here — a renamed now() default would make the
        # fixture key time-dependent
        if time_min:
            params["timeMin"] = time_min
        if time_max:
            params["timeMax"] = time_max
        if query:
            params["q"] = query
        try:
            status, body = self._request(
                "GET", f"/calendars/{encode_id(calendar_id)}/events", params
            )
        except Exception as e:
            return {"error": f"Network error: {sanitize_error(e)}"}
        result = self._handle(status, body)
        if "error" in result:
            return result
        events = [flatten_event(it) for it in result.get("items", [])]
        return {"calendar_id": calendar_id, "events": events,
                "total": len(events)}

    def get_event(self, event_id, calendar_id="primary") -> dict:
        if not event_id:
            return {"error": "event_id is required"}
        try:
            status, body = self._request(
                "GET",
                f"/calendars/{encode_id(calendar_id)}/events/"
                f"{encode_id(event_id)}",
            )
        except Exception as e:
            return {"error": f"Network error: {sanitize_error(e)}"}
        return self._handle(status, body)

    def create_event(self, summary, start_time, end_time,
                     calendar_id="primary", description=None, location=None,
                     attendees=None, send_notifications=True, timezone=None,
                     all_day=False) -> dict:
        if not summary:
            return {"error": "summary is required"}
        if not start_time:
            return {"error": "start_time is required"}
        if not end_time:
            return {"error": "end_time is required"}
        if timezone and not all_day:
            tz_error = validate_timezone(timezone)
            if tz_error:
                return tz_error
        if all_day:
            if not _DATE_ONLY_RE.match(start_time):
                return {"error": "all-day events require date-only format "
                                 "for start_time (YYYY-MM-DD)"}
            if not _DATE_ONLY_RE.match(end_time):
                return {"error": "all-day events require date-only format "
                                 "for end_time (YYYY-MM-DD)"}
            event_body: dict = {
                "summary": summary,
                "start": {"date": start_time},
                "end": {"date": end_time},
            }
        else:
            event_body = {
                "summary": summary,
                "start": {"dateTime": start_time},
                "end": {"dateTime": end_time},
            }
            if timezone:
                event_body["start"]["timeZone"] = timezone
                event_body["end"]["timeZone"] = timezone
        if description is not None:
            event_body["description"] = description
        if location is not None:
            event_body["location"] = location
        params: dict = {"sendUpdates": "all" if send_notifications else "none"}
        if attendees:
            event_body["attendees"] = [{"email": e} for e in attendees]
            event_body["conferenceData"] = {
                "createRequest": {
                    "requestId": self._request_id(),
                    "conferenceSolutionKey": {"type": "hangoutsMeet"},
                }
            }
            params["conferenceDataVersion"] = 1
        try:
            status, body = self._request(
                "POST", f"/calendars/{encode_id(calendar_id)}/events",
                params, event_body,
            )
        except Exception as e:
            return {"error": f"Network error: {sanitize_error(e)}"}
        return self._handle(status, body)

    def delete_event(self, event_id, calendar_id="primary",
                     send_notifications=True) -> dict:
        if not event_id:
            return {"error": "event_id is required"}
        params = {"sendUpdates": "all" if send_notifications else "none"}
        try:
            status, body = self._request(
                "DELETE",
                f"/calendars/{encode_id(calendar_id)}/events/"
                f"{encode_id(event_id)}",
                params,
            )
        except Exception as e:
            return {"error": f"Network error: {sanitize_error(e)}"}
        if status == 204:
            return {"success": True, "message": f"Event {event_id} deleted"}
        return self._handle(status, body)

    def list_calendars(self, max_results=100) -> dict:
        if max_results < 1 or max_results > 250:
            return {"error": "max_results must be between 1 and 250"}
        try:
            status, body = self._request(
                "GET", "/users/me/calendarList", {"maxResults": max_results}
            )
        except Exception as e:
            return {"error": f"Network error: {sanitize_error(e)}"}
        result = self._handle(status, body)
        if "error" in result:
            return result
        calendars = [
            {
                "id": it.get("id"),
                "summary": it.get("summary"),
                "description": it.get("description"),
                "primary": it.get("primary", False),
                "access_role": it.get("accessRole"),
                "background_color": it.get("backgroundColor"),
            }
            for it in result.get("items", [])
        ]
        return {"calendars": calendars, "total": len(calendars)}

    def get_calendar(self, calendar_id) -> dict:
        if not calendar_id:
            return {"error": "calendar_id is required"}
        try:
            status, body = self._request(
                "GET", f"/calendars/{encode_id(calendar_id)}"
            )
        except Exception as e:
            return {"error": f"Network error: {sanitize_error(e)}"}
        return self._handle(status, body)

    def check_availability(self, time_min, time_max, calendars=None,
                           timezone="UTC") -> dict:
        if not time_min:
            return {"error": "time_min is required"}
        if not time_max:
            return {"error": "time_max is required"}
        if calendars is None:
            calendars = ["primary"]
        request_body = {
            "timeMin": time_min,
            "timeMax": time_max,
            "timeZone": timezone,
            "items": [{"id": c} for c in calendars],
        }
        try:
            status, body = self._request(
                "POST", "/freeBusy", None, request_body
            )
        except Exception as e:
            return {"error": f"Network error: {sanitize_error(e)}"}
        result = self._handle(status, body)
        if "error" in result:
            return result
        formatted = {}
        for cal_id, cal_data in result.get("calendars", {}).items():
            if "errors" in cal_data:
                formatted[cal_id] = {
                    "error": cal_data["errors"][0].get(
                        "reason", "Unknown error")
                }
            else:
                formatted[cal_id] = {"busy": cal_data.get("busy", [])}
        return {"time_min": time_min, "time_max": time_max,
                "timezone": timezone, "calendars": formatted}


EVENT_SCHEMA = (
    "calendar_id string, event_id string, summary string, start string, "
    "end string, location string, status string, n_attendees int, "
    "error string"
)


def calendar_events_table(calendar_ids: DataFrame, client_factory,
                          time_min=None, time_max=None, max_results=250,
                          id_col: str = "calendar_id") -> DataFrame:
    """Pull events for a TABLE of calendar ids on the executors
    (mapInPandas, map-only, no shuffle): one row per event, per-row
    error envelopes. ``client_factory`` must pickle by value."""
    import pandas as pd

    cols = [f.split()[0] for f in EVENT_SCHEMA.split(",")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for cid in pdf[id_col]:
                env = client.list_events(str(cid), time_min=time_min,
                                         time_max=time_max,
                                         max_results=max_results)
                if "error" in env:
                    rows.append({"calendar_id": cid, "event_id": None,
                                 "summary": None, "start": None, "end": None,
                                 "location": None, "status": None,
                                 "n_attendees": None, "error": env["error"]})
                    continue
                for ev in env["events"]:
                    rows.append({
                        "calendar_id": cid, "event_id": ev.get("id"),
                        "summary": ev.get("summary"),
                        "start": ev.get("start"), "end": ev.get("end"),
                        "location": ev.get("location"),
                        "status": ev.get("status"),
                        "n_attendees": len(ev.get("attendees", []) or []),
                        "error": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return calendar_ids.select(id_col).mapInPandas(run, EVENT_SCHEMA)
