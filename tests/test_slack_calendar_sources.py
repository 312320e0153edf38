"""Slack + Google Calendar connector conformance tests: the Slack
ok:false in-band error protocol, dual-token search, wire shapes, the
Calendar error map / all-day validation / freeBusy shaping, and both
distributed table tiers (slack_tool.py / calendar_tool.py parity)."""

from __future__ import annotations

from aden_hive_fork_spark.sources.calendar_source import (
    CALENDAR_API_BASE,
    CalendarClient,
    calendar_events_table,
    encode_id,
    flatten_event,
    sanitize_error,
)
from aden_hive_fork_spark.sources.rest_connector import (
    FixtureRestTransport,
    jdump,
)
from aden_hive_fork_spark.sources.slack_source import (
    SLACK_API_BASE,
    SlackClient,
    slack_history_table,
)


# --------------------------------------------------------------- Slack
def test_slack_ok_false_error_protocol():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{SLACK_API_BASE}/chat.postMessage", None,
            {"channel": "C1", "text": "hi"},
        ): (200, jdump({"ok": False, "error": "channel_not_found"})),
    })
    env = SlackClient("xoxb-1", t).post_message("C1", "hi")
    assert env == {"error": "Channel not found or bot is not a member",
                   "error_code": "channel_not_found"}


def test_slack_missing_scope_includes_needed():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{SLACK_API_BASE}/pins.add", None,
            {"channel": "C1", "timestamp": "1.2"},
        ): (200, jdump({"ok": False, "error": "missing_scope",
                        "needed": "pins:write"})),
    })
    env = SlackClient("xoxb-1", t).pin_message("C1", "1.2")
    assert env["error"] == "Missing required scope: pins:write"


def test_slack_http_error_and_success_paths():
    t = FixtureRestTransport({
        FixtureRestTransport.key("POST", f"{SLACK_API_BASE}/auth.test"): (
            500, b"oops"),
    })
    assert SlackClient("x", t).auth_test() == {"error": "HTTP error 500: oops"}
    t2 = FixtureRestTransport({
        FixtureRestTransport.key("POST", f"{SLACK_API_BASE}/auth.test"): (
            200, jdump({"ok": True, "team": "acme", "user_id": "U1"})),
    })
    env = SlackClient("x", t2).auth_test()
    assert env["ok"] and env["team"] == "acme"


def test_slack_reaction_strips_colons():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{SLACK_API_BASE}/reactions.add", None,
            {"channel": "C1", "timestamp": "1.2", "name": "tada"},
        ): (200, jdump({"ok": True})),
    })
    assert SlackClient("x", t).add_reaction("C1", "1.2", ":tada:")["ok"]


def test_slack_search_uses_user_token_and_hints():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", f"{SLACK_API_BASE}/search.messages",
            {"query": "deploy", "count": 20, "sort": "timestamp",
             "sort_dir": "desc"},
        ): (200, jdump({"ok": False, "error": "not_allowed_token_type"})),
    })
    c = SlackClient("xoxb-bot", t, user_token="xoxp-user")
    env = c.search_messages("deploy")
    # hint rewritten per reference
    assert "User Token (xoxp-)" in env["error"] and "help" in env
    # and the request carried the USER token
    assert t.requests[0][4]["Authorization"] == "Bearer xoxp-user"


def test_slack_history_params_clamped():
    t = FixtureRestTransport()
    SlackClient("x", t).get_history("C1", limit=5000, oldest="1.0")
    _, _, params, _, _ = t.requests[0]
    assert params == {"channel": "C1", "limit": 1000, "oldest": "1.0"}


def test_slack_history_table_distributed(spark):
    fixtures = {
        FixtureRestTransport.key(
            "GET", f"{SLACK_API_BASE}/conversations.history",
            {"channel": "C1", "limit": 200},
        ): (200, jdump({"ok": True, "messages": [
            {"ts": "2.0", "user": "U1", "text": "ship it",
             "reactions": [{"name": "rocket", "count": 3}]},
            {"ts": "1.0", "user": "U2", "text": "wip",
             "thread_ts": "1.0", "reply_count": 2},
        ]})),
        FixtureRestTransport.key(
            "GET", f"{SLACK_API_BASE}/conversations.history",
            {"channel": "Cgone", "limit": 200},
        ): (200, jdump({"ok": False, "error": "channel_not_found"})),
    }
    chans = spark.createDataFrame([("C1",), ("Cgone",)], "channel string")
    out = slack_history_table(
        chans, lambda: SlackClient("x", FixtureRestTransport(fixtures))
    ).collect()
    ok = {r["ts"]: r for r in out if r["error"] is None}
    assert ok["2.0"]["reactions"] == "rocket:3"
    assert ok["1.0"]["reply_count"] == 2
    bad = [r for r in out if r["error"] is not None]
    assert len(bad) == 1 and bad[0]["channel"] == "Cgone"


# ------------------------------------------------------------ Calendar
EVENTS_BODY = jdump({
    "items": [
        {"id": "e1", "summary": "Standup",
         "start": {"dateTime": "2026-08-03T09:00:00Z"},
         "end": {"dateTime": "2026-08-03T09:15:00Z"},
         "status": "confirmed",
         "attendees": [{"email": "a@x"}, {"email": "b@x"}]},
        {"id": "e2",
         "start": {"date": "2026-08-04"}, "end": {"date": "2026-08-05"},
         "status": "confirmed"},
    ]
})


def test_calendar_list_events_flattens():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", f"{CALENDAR_API_BASE}/calendars/primary/events",
            {"maxResults": 10, "singleEvents": "true",
             "orderBy": "startTime"},
        ): (200, EVENTS_BODY),
    })
    env = CalendarClient("at", t).list_events()
    assert env["total"] == 2
    e1, e2 = env["events"]
    assert e1["attendees"] == ["a@x", "b@x"]
    assert e2["summary"] == "(No title)"  # default per reference
    assert e2["start"] == "2026-08-04"  # date fallback for all-day


def test_calendar_error_map():
    for status, expect in [(401, "Invalid or expired OAuth token"),
                           (404, "Resource not found"),
                           (429, "Rate limit exceeded. Try again later.")]:
        t = FixtureRestTransport({
            FixtureRestTransport.key(
                "GET", f"{CALENDAR_API_BASE}/calendars/primary/events/e9",
            ): (status, b"{}"),
        })
        assert CalendarClient("a", t).get_event("e9")["error"] == expect
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", f"{CALENDAR_API_BASE}/calendars/primary/events/e9",
        ): (400, jdump({"error": {"message": "Bad time range"}})),
    })
    assert CalendarClient("a", t).get_event("e9")["error"] == (
        "API error: Bad time range")


def test_calendar_create_event_all_day_validation_and_meet_link():
    c = CalendarClient("a", FixtureRestTransport())
    env = c.create_event("X", "2026-08-03T09:00:00", "2026-08-04",
                         all_day=True)
    assert "date-only" in env["error"]
    env = c.create_event("X", "s", "e", timezone="Not/AZone")
    assert "Invalid timezone" in env["error"]

    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{CALENDAR_API_BASE}/calendars/primary/events",
            {"sendUpdates": "all", "conferenceDataVersion": 1},
            {"summary": "Sync",
             "start": {"dateTime": "2026-08-03T09:00:00",
                       "timeZone": "America/New_York"},
             "end": {"dateTime": "2026-08-03T10:00:00",
                     "timeZone": "America/New_York"},
             "attendees": [{"email": "a@x"}],
             "conferenceData": {"createRequest": {
                 "requestId": "meet-fixed",
                 "conferenceSolutionKey": {"type": "hangoutsMeet"}}}},
        ): (200, jdump({"id": "new1", "hangoutLink": "https://meet/x"})),
    })
    c2 = CalendarClient("a", t, request_id_factory=lambda: "meet-fixed")
    env = c2.create_event("Sync", "2026-08-03T09:00:00",
                          "2026-08-03T10:00:00", attendees=["a@x"],
                          timezone="America/New_York")
    assert env["id"] == "new1"


def test_calendar_delete_204_and_encode_id():
    assert encode_id("a b/c@d") == "a%20b%2Fc%40d"
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "DELETE", f"{CALENDAR_API_BASE}/calendars/primary/events/e1",
            {"sendUpdates": "none"},
        ): (204, b""),
    })
    env = CalendarClient("a", t).delete_event("e1", send_notifications=False)
    assert env == {"success": True, "message": "Event e1 deleted"}


def test_calendar_freebusy_shaping():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{CALENDAR_API_BASE}/freeBusy", None,
            {"timeMin": "t0", "timeMax": "t1", "timeZone": "UTC",
             "items": [{"id": "primary"}, {"id": "team"}]},
        ): (200, jdump({"calendars": {
            "primary": {"busy": [{"start": "t0", "end": "tm"}]},
            "team": {"errors": [{"reason": "notFound"}]},
        }})),
    })
    env = CalendarClient("a", t).check_availability("t0", "t1",
                                                    ["primary", "team"])
    assert env["calendars"]["primary"]["busy"][0]["end"] == "tm"
    assert env["calendars"]["team"] == {"error": "notFound"}


def test_calendar_sanitize_error_redacts_and_truncates():
    assert "redacted" in sanitize_error(Exception("Bearer abc"))
    long = sanitize_error(Exception("x" * 500))
    assert long.endswith("...") and len(long) < 260


def test_calendar_events_table_distributed(spark):
    fixtures = {
        FixtureRestTransport.key(
            "GET", f"{CALENDAR_API_BASE}/calendars/primary/events",
            {"maxResults": 250, "singleEvents": "true",
             "orderBy": "startTime"},
        ): (200, EVENTS_BODY),
        FixtureRestTransport.key(
            "GET", f"{CALENDAR_API_BASE}/calendars/gone/events",
            {"maxResults": 250, "singleEvents": "true",
             "orderBy": "startTime"},
        ): (404, b"{}"),
    }
    ids = spark.createDataFrame([("primary",), ("gone",)],
                                "calendar_id string")
    out = calendar_events_table(
        ids, lambda: CalendarClient("a", FixtureRestTransport(fixtures))
    ).collect()
    ok = {r["event_id"]: r for r in out if r["error"] is None}
    assert ok["e1"]["n_attendees"] == 2
    assert ok["e2"]["start"] == "2026-08-04"
    bad = [r for r in out if r["error"] is not None]
    assert bad[0]["calendar_id"] == "gone"


def test_flatten_event_defaults():
    out = flatten_event({})
    assert out["summary"] == "(No title)" and out["start"] is None
