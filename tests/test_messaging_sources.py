"""Discord + Telegram connector conformance tests: Bot-token auth,
429 retry_after backoff, text-channel filtering, the 2000-char cap,
Telegram's in-path token wire and error map, and the distributed
Discord history tier (discord_tool.py / telegram_tool.py parity)."""

from __future__ import annotations

from aden_hive_fork_spark.sources.messaging_source import (
    DISCORD_API_BASE,
    TELEGRAM_API_BASE,
    DiscordClient,
    TelegramClient,
    discord_messages_table,
)
from aden_hive_fork_spark.sources.rest_connector import (
    FixtureRestTransport,
    jdump,
)


# --------------------------------------------------------------- Discord
def test_discord_bot_auth_and_guilds():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", f"{DISCORD_API_BASE}/users/@me/guilds",
        ): (200, jdump([{"id": "g1", "name": "Acme HQ"}])),
    })
    c = DiscordClient("tok", t, sleep=lambda s: None)
    assert c.list_guilds() == [{"id": "g1", "name": "Acme HQ"}]
    assert t.requests[0][4]["Authorization"] == "Bot tok"


def test_discord_channel_text_filter():
    channels = [
        {"id": "c1", "type": 0}, {"id": "c2", "type": 2},  # voice
        {"id": "c3", "type": 5}, {"id": "c4", "type": 4},  # category
    ]
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", f"{DISCORD_API_BASE}/guilds/g1/channels",
        ): (200, jdump(channels)),
    })
    c = DiscordClient("tok", t, sleep=lambda s: None)
    assert [ch["id"] for ch in c.list_channels("g1")] == ["c1", "c3"]
    assert len(c.list_channels("g1", text_only=False)) == 4


def test_discord_message_length_cap():
    c = DiscordClient("tok", FixtureRestTransport(), sleep=lambda s: None)
    env = c.send_message("c1", "x" * 2001)
    assert env["max_length"] == 2000 and env["provided"] == 2001


def test_discord_429_retry_honors_retry_after_then_surfaces():
    calls = {"n": 0}
    sleeps = []

    def transport(method, url, params, json_body, headers):
        calls["n"] += 1
        if calls["n"] == 1:
            return 429, jdump({"retry_after": 2.5, "message": "slow down"})
        return 200, jdump({"id": "m1"})

    c = DiscordClient("tok", transport, sleep=sleeps.append)
    assert c.send_message("c1", "hi") == {"id": "m1"}
    assert sleeps == [2.5]
    # exhausted retries → the retry_after envelope surfaces
    always = DiscordClient(
        "tok", lambda *a: (429, jdump({"retry_after": 9})),
        sleep=lambda s: None,
    )
    env = always.send_message("c1", "hi")
    assert env["retry_after"] == 9 and "rate limit" in env["error"].lower()


def test_discord_204_and_error_map():
    c = DiscordClient("tok", lambda *a: (204, b""), sleep=lambda s: None)
    assert c.list_guilds() == {"success": True}
    c = DiscordClient(
        "tok", lambda *a: (403, jdump({"message": "Missing Access"})),
        sleep=lambda s: None,
    )
    assert c.list_guilds() == {"error": "HTTP 403: Missing Access"}


def test_discord_messages_table_distributed(spark):
    fixtures = {
        FixtureRestTransport.key(
            "GET", f"{DISCORD_API_BASE}/channels/c1/messages",
            {"limit": 100},
        ): (200, jdump([
            {"id": "m2", "author": {"username": "ada"}, "content": "ship",
             "timestamp": "2026-08-02T10:00:00Z"},
            {"id": "m1", "author": {"username": "lin"}, "content": "wip",
             "timestamp": "2026-08-01T10:00:00Z"},
        ])),
        FixtureRestTransport.key(
            "GET", f"{DISCORD_API_BASE}/channels/cgone/messages",
            {"limit": 100},
        ): (404, jdump({"message": "Unknown Channel"})),
    }
    chans = spark.createDataFrame([("c1",), ("cgone",)],
                                  "channel_id string")
    out = discord_messages_table(
        chans,
        lambda: DiscordClient("tok", FixtureRestTransport(fixtures),
                              sleep=lambda s: None),
    ).collect()
    ok = {r["message_id"]: r for r in out if r["error"] is None}
    assert ok["m2"]["author"] == "ada" and ok["m1"]["content"] == "wip"
    bad = [r for r in out if r["error"] is not None]
    assert bad[0]["error"] == "HTTP 404: Unknown Channel"


# -------------------------------------------------------------- Telegram
def test_telegram_token_in_path_and_send():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{TELEGRAM_API_BASE}123:abc/sendMessage", None,
            {"chat_id": "@chan", "text": "hello",
             "disable_notification": False, "parse_mode": "HTML"},
        ): (200, jdump({"ok": True, "result": {"message_id": 7}})),
    })
    c = TelegramClient("123:abc", t)
    env = c.send_message("@chan", "hello", parse_mode="HTML")
    assert env["result"]["message_id"] == 7
    assert t.requests[0][1].startswith(f"{TELEGRAM_API_BASE}123:abc/")


def test_telegram_error_map():
    cases = [
        (401, "Invalid Telegram bot token"),
        (403, "Bot was blocked by the user or lacks permissions"),
        (404, "Chat not found"),
        (429, "Rate limit exceeded. Try again later."),
    ]
    for status, expect in cases:
        c = TelegramClient("t", lambda *a, _s=status: (_s, b"{}"))
        assert c.get_me()["error"] == expect
    c = TelegramClient(
        "t", lambda *a: (400, jdump({"description": "chat_id is empty"})),
    )
    assert c.send_message("", "x") == {"error": "Bad request: chat_id is empty"}


def test_telegram_send_document_payload():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{TELEGRAM_API_BASE}t/sendDocument", None,
            {"chat_id": "42", "document": "https://x/report.pdf",
             "caption": "Q3"},
        ): (200, jdump({"ok": True})),
    })
    assert TelegramClient("t", t).send_document(
        "42", "https://x/report.pdf", caption="Q3")["ok"]
