"""Envelope-parity tests for the connected-account registry
(sources/accounts.py vs reference account_info_tool.py:19-35)."""

from __future__ import annotations

from aden_hive_fork_spark.sources.accounts import (
    AccountRegistry,
    get_account_info,
)


def test_no_store_configured_message():
    out = get_account_info(None)
    assert out == {
        "accounts": [],
        "message": "No credential store configured",
    }


def test_all_accounts_and_count():
    reg = AccountRegistry()
    reg.register("google", "acct-1", email="a@example.com")
    reg.register("slack", "acct-2", workspace="eng", username="bot")
    out = get_account_info(reg)
    assert out["count"] == 2
    assert {a["provider"] for a in out["accounts"]} == {"google", "slack"}
    slack = next(a for a in out["accounts"] if a["provider"] == "slack")
    assert slack["workspace"] == "eng" and slack["username"] == "bot"


def test_provider_filter():
    reg = AccountRegistry()
    reg.register("google", "acct-1", email="a@example.com")
    reg.register("google", "acct-3", email="b@example.com")
    reg.register("slack", "acct-2")
    out = get_account_info(reg, provider="google")
    assert out["count"] == 2
    assert [a["account_id"] for a in out["accounts"]] == ["acct-1", "acct-3"]


def test_unregister():
    reg = AccountRegistry()
    reg.register("stripe", "acct-9")
    assert reg.unregister("stripe", "acct-9") is True
    assert reg.unregister("stripe", "acct-9") is False
    assert get_account_info(reg)["count"] == 0


def test_register_overwrites_same_key():
    reg = AccountRegistry()
    reg.register("github", "acct-1", username="old")
    reg.register("github", "acct-1", username="new")
    out = get_account_info(reg, provider="github")
    assert out["count"] == 1
    assert out["accounts"][0]["username"] == "new"
