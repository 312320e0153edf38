"""Slack Web API connector — the reference slack tool's query
surface with envelope parity, on the pluggable REST transport seam.

Reference analogs (tools/src/aden_tools/tools/slack_tool/
slack_tool.py): client ``_SlackClient`` (:25-480) — dual-token
headers (bot vs user, :33-45: the search API requires a user token);
``_handle_response`` (:47-71: HTTP!=200 → error string, then Slack's
in-band ``ok:false`` protocol mapped through a friendly error table,
``error_code`` preserved); chat post/update/delete/schedule
(:73-96, :185-241); conversations list/history/replies/create/
archive/invite (:98-144, :243-275, :421-438); reactions add/remove
(:146-164, :277-295); users info/list (:166-174, :297-305); auth
test (:176-183); search.messages with the not_allowed_token_type
hint (:390-419); pins (:440-467); topic (:378-388).

Two tiers: ``SlackClient`` is the interactive driver shape;
``slack_history_table`` pulls message history for a TABLE of
channels on the executors (mapInPandas, map-only, per-row error
envelopes) — workspace history becomes a normal text table for the
dedup / search / quality operators.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

SLACK_API_BASE = "https://slack.com/api"

# friendly error table (slack_tool.py:56-65)
ERROR_MESSAGES = {
    "invalid_auth": "Invalid Slack bot token",
    "token_revoked": "Slack bot token has been revoked",
    "channel_not_found": "Channel not found or bot is not a member",
    "not_in_channel": "Bot is not a member of this channel",
    "is_archived": "Channel is archived",
    "msg_too_long": "Message text is too long",
    "ratelimited": "Rate limit exceeded. Try again later.",
}

NO_CREDS = {
    "error": "Slack credentials not configured",
    "help": "Set SLACK_BOT_TOKEN environment variable",
}


class SlackClient:
    """Slack Web API client with reference envelope parity.

    ``transport(method, url, params, json_body, headers) ->
    (status, bytes)``. ``user_token`` (xoxp-) is only used by
    ``search_messages`` — Slack's search API rejects bot tokens."""

    def __init__(self, bot_token: str, transport,
                 user_token: str | None = None):
        self._token = bot_token
        self._user_token = user_token
        self.transport = transport

    def _headers(self, user: bool = False) -> dict[str, str]:
        token = (self._user_token or self._token) if user else self._token
        return {
            "Authorization": f"Bearer {token}",
            "Content-Type": "application/json; charset=utf-8",
        }

    def _call(self, method, api, params=None, json_body=None,
              user: bool = False) -> dict:
        import json as _json

        status, body = self.transport(
            method, f"{SLACK_API_BASE}/{api}", params, json_body,
            self._headers(user),
        )
        if status != 200:
            return {"error": f"HTTP error {status}: "
                             f"{body.decode(errors='replace')}"}
        try:
            data = _json.loads(body)
        except Exception:
            return {"error": "HTTP error 200: unparseable body"}
        if not data.get("ok", False):
            code = data.get("error", "unknown_error")
            if code == "missing_scope":
                msg = f"Missing required scope: {data.get('needed', 'unknown')}"
            else:
                msg = ERROR_MESSAGES.get(code, f"Slack API error: {code}")
            return {"error": msg, "error_code": code}
        return data

    # --- chat (slack_tool.py:73-96, 185-241) ---
    def post_message(self, channel, text, thread_ts=None, blocks=None) -> dict:
        body = {"channel": channel, "text": text}
        if thread_ts:
            body["thread_ts"] = thread_ts
        if blocks:
            body["blocks"] = blocks
        return self._call("POST", "chat.postMessage", json_body=body)

    def update_message(self, channel, ts, text, blocks=None) -> dict:
        body = {"channel": channel, "ts": ts, "text": text}
        if blocks:
            body["blocks"] = blocks
        return self._call("POST", "chat.update", json_body=body)

    def delete_message(self, channel, ts) -> dict:
        return self._call("POST", "chat.delete",
                          json_body={"channel": channel, "ts": ts})

    def schedule_message(self, channel, text, post_at: int,
                         thread_ts=None) -> dict:
        body = {"channel": channel, "text": text, "post_at": post_at}
        if thread_ts:
            body["thread_ts"] = thread_ts
        return self._call("POST", "chat.scheduleMessage", json_body=body)

    # --- conversations (slack_tool.py:98-144, 243-275, 421-438) ---
    def list_conversations(self, types="public_channel,private_channel",
                           limit=100, cursor=None) -> dict:
        params = {"types": types, "limit": min(limit, 1000),
                  "exclude_archived": True}
        if cursor:
            params["cursor"] = cursor
        return self._call("GET", "conversations.list", params)

    def get_history(self, channel, limit=20, oldest=None, latest=None) -> dict:
        params = {"channel": channel, "limit": min(limit, 1000)}
        if oldest:
            params["oldest"] = oldest
        if latest:
            params["latest"] = latest
        return self._call("GET", "conversations.history", params)

    def get_thread_replies(self, channel, thread_ts, limit=50) -> dict:
        return self._call("GET", "conversations.replies", {
            "channel": channel, "ts": thread_ts, "limit": min(limit, 1000),
        })

    def create_channel(self, name, is_private=False) -> dict:
        return self._call("POST", "conversations.create",
                          json_body={"name": name, "is_private": is_private})

    def archive_channel(self, channel) -> dict:
        return self._call("POST", "conversations.archive",
                          json_body={"channel": channel})

    def invite_to_channel(self, channel, users: str) -> dict:
        return self._call("POST", "conversations.invite",
                          json_body={"channel": channel, "users": users})

    def set_channel_topic(self, channel, topic) -> dict:
        return self._call("POST", "conversations.setTopic",
                          json_body={"channel": channel, "topic": topic})

    # --- reactions / pins (slack_tool.py:146-164, 277-295, 440-467) ---
    def add_reaction(self, channel, timestamp, name) -> dict:
        return self._call("POST", "reactions.add", json_body={
            "channel": channel, "timestamp": timestamp,
            "name": name.strip(":"),
        })

    def remove_reaction(self, channel, timestamp, name) -> dict:
        return self._call("POST", "reactions.remove", json_body={
            "channel": channel, "timestamp": timestamp,
            "name": name.strip(":"),
        })

    def pin_message(self, channel, timestamp) -> dict:
        return self._call("POST", "pins.add", json_body={
            "channel": channel, "timestamp": timestamp})

    def unpin_message(self, channel, timestamp) -> dict:
        return self._call("POST", "pins.remove", json_body={
            "channel": channel, "timestamp": timestamp})

    def list_pins(self, channel) -> dict:
        return self._call("GET", "pins.list", {"channel": channel})

    # --- users / auth (slack_tool.py:166-183, 297-305) ---
    def get_user_info(self, user_id) -> dict:
        return self._call("GET", "users.info", {"user": user_id})

    def list_users(self, limit=100) -> dict:
        return self._call("GET", "users.list", {"limit": min(limit, 1000)})

    def auth_test(self) -> dict:
        return self._call("POST", "auth.test")

    # --- search (slack_tool.py:390-419) ---
    def search_messages(self, query, count=20, sort="timestamp") -> dict:
        result = self._call("GET", "search.messages", {
            "query": query, "count": min(count, 100), "sort": sort,
            "sort_dir": "desc",
        }, user=True)
        if result.get("error_code") == "not_allowed_token_type":
            result["error"] = ("Search requires User Token (xoxp-). "
                               "Set SLACK_USER_TOKEN env var.")
            result["help"] = ("Get user token from Slack App > OAuth > "
                              "User OAuth Token")
        return result


HISTORY_SCHEMA = (
    "channel string, ts string, user string, text string, thread_ts string, "
    "reply_count bigint, reactions string, error string"
)


def slack_history_table(channels: DataFrame, client_factory,
                        limit: int = 200,
                        channel_col: str = "channel") -> DataFrame:
    """Pull message history for a TABLE of channel ids on the
    executors (mapInPandas, map-only, no shuffle): one row per
    message, per-row error envelopes. ``client_factory`` builds the
    per-executor client and must pickle by value (lambda/closure).

    Workspace history is bounded (channels × retention), a dimension
    at warehouse scale — broadcast it against facts; repartition the
    channel table to the API rate budget."""
    import pandas as pd

    cols = [f.split()[0] for f in HISTORY_SCHEMA.split(",")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for ch in pdf[channel_col]:
                env = client.get_history(str(ch), limit=limit)
                if "error" in env:
                    rows.append({"channel": ch, "ts": None, "user": None,
                                 "text": None, "thread_ts": None,
                                 "reply_count": None, "reactions": None,
                                 "error": env["error"]})
                    continue
                for m in env.get("messages", []):
                    reactions = ",".join(
                        f"{r.get('name')}:{r.get('count')}"
                        for r in m.get("reactions", [])
                    )
                    rows.append({
                        "channel": ch, "ts": m.get("ts"),
                        "user": m.get("user"), "text": m.get("text"),
                        "thread_ts": m.get("thread_ts"),
                        "reply_count": m.get("reply_count"),
                        "reactions": reactions or None,
                        "error": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return channels.select(channel_col).mapInPandas(run, HISTORY_SCHEMA)
