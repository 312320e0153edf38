"""Discord + Telegram messaging connectors — the reference tools'
query surfaces with envelope parity, on the pluggable REST transport
seam.

Discord (tools/src/aden_tools/tools/discord_tool/discord_tool.py):
``Bot <token>`` auth (:38-42); 429 retry honoring the body's
``retry_after`` with exponential fallback, capped at 60 s and 3
total attempts (:43-62); response map (:64-91: 204 → success
envelope, 429 → retry_after envelope, !=200 → ``HTTP {code}:
{message}``); guild/channel listing with text-channel filter
(types 0 and 5, :93-106); send (2000-char cap, :108-121 + :233-241);
message history with before/after pagination (:123-140).

Telegram (telegram_tool.py): token rides IN THE URL PATH
(``/bot<token>/<method>`` — the Bot API's own design, :30-32);
error map (:34-55: 401 invalid token, 400 with ``description``,
403 blocked, 404 chat not found, 429); sendMessage with
parse_mode / disable_notification (:57-77); sendDocument with
caption (:79-100); getMe health check (:102-108).

Executor tier: ``discord_messages_table`` pulls channel history for
a TABLE of channel ids (mapInPandas, map-only, per-row error
envelopes) — community/support chatter as a text corpus for the
dedup / quality / search operators.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame

DISCORD_API_BASE = "https://discord.com/api/v10"
MAX_MESSAGE_LENGTH = 2000
TEXT_CHANNEL_TYPES = (0, 5)
MAX_RETRIES = 2
MAX_RETRY_WAIT = 60

TELEGRAM_API_BASE = "https://api.telegram.org/bot"

DISCORD_NO_CREDS = {
    "error": "Discord credentials not configured",
    "help": "Set DISCORD_BOT_TOKEN environment variable or configure "
            "via credential store",
}

TELEGRAM_NO_CREDS = {
    "error": "Telegram bot token not configured",
    "help": "Set TELEGRAM_BOT_TOKEN environment variable or configure "
            "via credential store. Get your token from @BotFather on "
            "Telegram.",
}


class DiscordClient:
    """Discord API client. ``transport(method, url, params, json_body,
    headers) -> (status, bytes)``; ``sleep`` injectable so the 429
    backoff tests run instantly."""

    def __init__(self, bot_token: str, transport, *, sleep=None):
        self._token = bot_token
        self.transport = transport
        self.sleep = sleep if sleep is not None else __import__("time").sleep

    @property
    def _headers(self) -> dict[str, str]:
        return {
            "Authorization": f"Bot {self._token}",
            "Content-Type": "application/json",
        }

    def _request(self, method, url, params=None, json_body=None):
        status, body = 0, b""
        for attempt in range(MAX_RETRIES + 1):
            status, body = self.transport(
                method, url, params, json_body, self._headers
            )
            if status == 429 and attempt < MAX_RETRIES:
                try:
                    wait = min(
                        float(json.loads(body).get("retry_after", 1)),
                        MAX_RETRY_WAIT,
                    )
                except Exception:
                    wait = min(2 ** attempt, MAX_RETRY_WAIT)
                self.sleep(wait)
                continue
            break
        return self._handle(status, body)

    @staticmethod
    def _handle(status: int, body: bytes):
        if status == 204:
            return {"success": True}
        if status == 429:
            try:
                data = json.loads(body)
                retry_after = data.get("retry_after", 60)
                message = data.get("message", "Rate limit exceeded")
            except Exception:
                retry_after, message = 60, "Rate limit exceeded"
            return {
                "error": f"Discord rate limit exceeded. "
                         f"Retry after {retry_after}s",
                "retry_after": retry_after,
                "message": message,
            }
        if status != 200:
            try:
                message = json.loads(body).get(
                    "message", body.decode(errors="replace"))
            except Exception:
                message = body.decode(errors="replace")
            return {"error": f"HTTP {status}: {message}"}
        try:
            return json.loads(body)
        except Exception:
            return {"error": "HTTP 200: unparseable body"}

    def list_guilds(self):
        return self._request("GET", f"{DISCORD_API_BASE}/users/@me/guilds")

    def list_channels(self, guild_id: str, text_only: bool = True):
        result = self._request(
            "GET", f"{DISCORD_API_BASE}/guilds/{guild_id}/channels"
        )
        if isinstance(result, dict) and "error" in result:
            return result
        if text_only:
            result = [c for c in result
                      if c.get("type") in TEXT_CHANNEL_TYPES]
        return result

    def send_message(self, channel_id: str, content: str, *,
                     tts: bool = False):
        if len(content) > MAX_MESSAGE_LENGTH:
            return {
                "error": f"Message exceeds {MAX_MESSAGE_LENGTH} "
                         "character limit",
                "max_length": MAX_MESSAGE_LENGTH,
                "provided": len(content),
            }
        return self._request(
            "POST", f"{DISCORD_API_BASE}/channels/{channel_id}/messages",
            json_body={"content": content, "tts": tts},
        )

    def get_messages(self, channel_id: str, limit: int = 50,
                     before=None, after=None):
        params: dict = {"limit": min(limit, 100)}
        if before:
            params["before"] = before
        if after:
            params["after"] = after
        return self._request(
            "GET", f"{DISCORD_API_BASE}/channels/{channel_id}/messages",
            params,
        )


class TelegramClient:
    """Telegram Bot API client. The token is part of the URL path by
    the Bot API's own design — fixture tests use a fixed token; the
    fixture key therefore includes it (unlike header-auth connectors
    where credentials stay out of keys)."""

    def __init__(self, bot_token: str, transport):
        self._token = bot_token
        self.transport = transport

    @property
    def _base_url(self) -> str:
        return f"{TELEGRAM_API_BASE}{self._token}"

    @staticmethod
    def _handle(status: int, body: bytes) -> dict:
        def desc(default):
            try:
                return json.loads(body).get(
                    "description", body.decode(errors="replace"))
            except Exception:
                return default

        if status == 401:
            return {"error": "Invalid Telegram bot token"}
        if status == 400:
            return {"error": f"Bad request: {desc('bad request')}"}
        if status == 403:
            return {"error": "Bot was blocked by the user or lacks "
                             "permissions"}
        if status == 404:
            return {"error": "Chat not found"}
        if status == 429:
            return {"error": "Rate limit exceeded. Try again later."}
        if status >= 400:
            return {"error": f"Telegram API error (HTTP {status}): "
                             f"{desc('error')}"}
        try:
            return json.loads(body)
        except Exception:
            return {}

    def send_message(self, chat_id: str, text: str, parse_mode=None,
                     disable_notification: bool = False) -> dict:
        payload: dict = {"chat_id": chat_id, "text": text,
                         "disable_notification": disable_notification}
        if parse_mode:
            payload["parse_mode"] = parse_mode
        status, body = self.transport(
            "POST", f"{self._base_url}/sendMessage", None, payload, {}
        )
        return self._handle(status, body)

    def send_document(self, chat_id: str, document: str, caption=None,
                      parse_mode=None) -> dict:
        payload: dict = {"chat_id": chat_id, "document": document}
        if caption:
            payload["caption"] = caption
        if parse_mode:
            payload["parse_mode"] = parse_mode
        status, body = self.transport(
            "POST", f"{self._base_url}/sendDocument", None, payload, {}
        )
        return self._handle(status, body)

    def get_me(self) -> dict:
        status, body = self.transport(
            "GET", f"{self._base_url}/getMe", None, None, {}
        )
        return self._handle(status, body)


DISCORD_MSG_SCHEMA = (
    "channel_id string, message_id string, author string, content string, "
    "timestamp string, error string"
)


def discord_messages_table(channels: DataFrame, client_factory,
                           limit: int = 100,
                           id_col: str = "channel_id") -> DataFrame:
    """Pull message history for a TABLE of Discord channel ids on the
    executors (mapInPandas, map-only, per-row error envelopes).
    ``client_factory`` must pickle by value (lambda/closure)."""
    import pandas as pd

    cols = [f.split()[0] for f in DISCORD_MSG_SCHEMA.split(",")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for ch in pdf[id_col]:
                env = client.get_messages(str(ch), limit=limit)
                if isinstance(env, dict) and "error" in env:
                    rows.append({"channel_id": ch, "message_id": None,
                                 "author": None, "content": None,
                                 "timestamp": None, "error": env["error"]})
                    continue
                for m in env:
                    rows.append({
                        "channel_id": ch,
                        "message_id": m.get("id"),
                        "author": (m.get("author") or {}).get("username"),
                        "content": m.get("content"),
                        "timestamp": m.get("timestamp"),
                        "error": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return channels.select(id_col).mapInPandas(run, DISCORD_MSG_SCHEMA)


TELEGRAM_SEND_SCHEMA = (
    "chat_id string, text string, message_id bigint, ok boolean, "
    "error string"
)


def telegram_send_table(messages: DataFrame, client_factory,
                        chat_col: str = "chat_id",
                        text_col: str = "text") -> DataFrame:
    """Send a TABLE of (chat_id, text) notifications through the
    Telegram connector on the executors (mapInPandas, map-only) and
    return the delivery receipts — the outbound twin of
    discord_messages_table. ``client_factory`` must pickle by
    value."""
    import pandas as pd

    cols = [f.split()[0] for f in TELEGRAM_SEND_SCHEMA.split(",")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for chat, text in zip(pdf[chat_col], pdf[text_col]):
                env = client.send_message(str(chat), str(text))
                if "error" in env:
                    rows.append({"chat_id": chat, "text": text,
                                 "message_id": None, "ok": None,
                                 "error": env["error"]})
                    continue
                rows.append({
                    "chat_id": chat, "text": text,
                    "message_id": (env.get("result") or {}).get(
                        "message_id"),
                    "ok": bool(env.get("ok")), "error": None,
                })
            yield pd.DataFrame(rows, columns=cols)

    return messages.select(chat_col, text_col).mapInPandas(
        run, TELEGRAM_SEND_SCHEMA
    )
