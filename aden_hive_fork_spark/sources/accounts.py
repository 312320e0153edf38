"""Connected-account registry — the analog of the reference's account
info tool (tools/src/aden_tools/tools/account_info_tool/
account_info_tool.py:19-35): let a caller enumerate which provider
accounts are wired up, with identity labels, before issuing queries.

The repo's connectors take injected clients/transports instead of a
credential vault (the vault itself is scoped-out control plane, SURVEY
§7.5), so the registry holds what the envelope exposes: provider,
account id, and identity labels (email / username / workspace). The
reference returns ``{"accounts": [], "message": ...}`` when no store
is configured and ``{"accounts": [...], "count": n}`` otherwise
(account_info_tool.py:29-35); both shapes are mirrored here.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Account:
    """One connected account: identity labels are free-form
    (email, username, workspace — whatever the provider exposes)."""

    provider: str
    account_id: str
    identity: dict = field(default_factory=dict)

    def info(self) -> dict:
        return {
            "account_id": self.account_id,
            "provider": self.provider,
            **self.identity,
        }


class AccountRegistry:
    """Registry of connected accounts, keyed (provider, account_id).

    Connectors register on construction; ``get_account_info`` is the
    query surface (account_info_tool.py:20 get_account_info)."""

    def __init__(self) -> None:
        self._accounts: dict[tuple[str, str], Account] = {}

    def register(
        self, provider: str, account_id: str, **identity
    ) -> Account:
        acct = Account(provider, account_id, dict(identity))
        self._accounts[(provider, account_id)] = acct
        return acct

    def unregister(self, provider: str, account_id: str) -> bool:
        return self._accounts.pop((provider, account_id), None) is not None

    def list_accounts(self, provider: str) -> list[dict]:
        return [
            a.info()
            for k, a in sorted(self._accounts.items())
            if a.provider == provider
        ]

    def get_all_account_info(self) -> list[dict]:
        return [a.info() for _, a in sorted(self._accounts.items())]


def get_account_info(
    registry: AccountRegistry | None = None, provider: str = ""
) -> dict:
    """account_info_tool.py:20-35 envelope: no registry → empty list +
    message; provider filter optional; count always present on the
    configured path."""
    if registry is None:
        return {"accounts": [], "message": "No credential store configured"}
    accounts = (
        registry.list_accounts(provider)
        if provider
        else registry.get_all_account_info()
    )
    return {"accounts": accounts, "count": len(accounts)}
