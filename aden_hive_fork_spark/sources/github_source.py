"""GitHub REST v3 connector — the reference github tool's query
surface with envelope parity, on the pluggable REST transport seam.

Reference analogs (tools/src/aden_tools/tools/github_tool/
github_tool.py): client ``_GitHubClient`` (:64-489) — repos
(:106-171), issues (:173-273), pull requests (:275-346), code search
(:348-367), branches (:369-407), stargazers (:409-432), user profile
/ email discovery (:434-489); response envelope ``_handle_response``
(:78-102: 401/403/404/422/>=400 error map, else
``{"success": True, "data": ...}``); path-param sanitization
(:25-41); token-safe error messages (:44-61); missing-credential
envelope (:510-526).

Two tiers: ``GitHubClient`` is the interactive driver shape;
``github_issues_table`` / ``github_repos_table`` run a TABLE of
fetches on the executors (mapInPandas, map-only, per-row error
envelopes) and yield flat rows — connector output becomes a normal
dimension that joins the warehouse (broadcast at scale).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

from .rest_connector import sanitize_error_message, sanitize_path_param

GITHUB_API_BASE = "https://api.github.com"

NO_CREDS = {
    "error": "GitHub credentials not configured",
    "help": (
        "Set GITHUB_TOKEN environment variable or configure via "
        "credential store. Get a token at https://github.com/settings/tokens"
    ),
}


class GitHubClient:
    """GitHub REST API v3 client (github_tool.py:64-489).

    ``transport(method, url, params, json_body, headers) ->
    (status, bytes)`` — ``rest_http_transport`` live,
    ``FixtureRestTransport`` replay."""

    def __init__(self, token: str, transport):
        self._token = token
        self.transport = transport

    @property
    def _headers(self) -> dict[str, str]:
        return {
            "Authorization": f"Bearer {self._token}",
            "Accept": "application/vnd.github+json",
            "X-GitHub-Api-Version": "2022-11-28",
        }

    def _request(self, method, path, params=None, json_body=None) -> dict:
        import json as _json

        try:
            status, body = self.transport(
                method, f"{GITHUB_API_BASE}{path}", params, json_body,
                self._headers,
            )
        except Exception as e:  # network-layer failure
            return {"error": sanitize_error_message(e)}
        # error map with reference parity (github_tool.py:78-102)
        if status == 401:
            return {"error": "Invalid or expired GitHub token"}
        if status == 403:
            return {"error": "Forbidden - check token permissions or rate limit"}
        if status == 404:
            return {"error": "Resource not found"}
        if status == 422:
            try:
                detail = _json.loads(body).get("message", "Validation failed")
            except Exception:
                detail = "Validation failed"
            return {"error": f"Validation error: {detail}"}
        if status >= 400:
            try:
                detail = _json.loads(body).get("message", body.decode(errors="replace"))
            except Exception:
                detail = body.decode(errors="replace")
            return {"error": f"GitHub API error (HTTP {status}): {detail}"}
        try:
            return {"success": True, "data": _json.loads(body)}
        except Exception:
            return {"success": True, "data": {}}

    # --- repositories (github_tool.py:106-171) ---
    def list_repos(self, username=None, visibility="all", sort="updated",
                   limit=30) -> dict:
        if username:
            username = sanitize_path_param(username, "username")
            path = f"/users/{username}/repos"
        else:
            path = "/user/repos"
        return self._request("GET", path, {
            "visibility": visibility, "sort": sort, "per_page": min(limit, 100),
        })

    def get_repo(self, owner: str, repo: str) -> dict:
        owner = sanitize_path_param(owner, "owner")
        repo = sanitize_path_param(repo, "repo")
        return self._request("GET", f"/repos/{owner}/{repo}")

    def search_repos(self, query: str, sort=None, limit=30) -> dict:
        params = {"q": query, "per_page": min(limit, 100)}
        if sort:
            params["sort"] = sort
        return self._request("GET", "/search/repositories", params)

    # --- issues (github_tool.py:173-273) ---
    def list_issues(self, owner, repo, state="open", page=1, limit=30) -> dict:
        owner = sanitize_path_param(owner, "owner")
        repo = sanitize_path_param(repo, "repo")
        return self._request("GET", f"/repos/{owner}/{repo}/issues", {
            "state": state, "per_page": min(limit, 100), "page": max(1, page),
        })

    def get_issue(self, owner, repo, issue_number: int) -> dict:
        owner = sanitize_path_param(owner, "owner")
        repo = sanitize_path_param(repo, "repo")
        return self._request(
            "GET", f"/repos/{owner}/{repo}/issues/{issue_number}"
        )

    def create_issue(self, owner, repo, title, body=None, labels=None,
                     assignees=None) -> dict:
        owner = sanitize_path_param(owner, "owner")
        repo = sanitize_path_param(repo, "repo")
        payload = {"title": title}
        if body:
            payload["body"] = body
        if labels:
            payload["labels"] = labels
        if assignees:
            payload["assignees"] = assignees
        return self._request(
            "POST", f"/repos/{owner}/{repo}/issues", json_body=payload
        )

    def update_issue(self, owner, repo, issue_number, title=None, body=None,
                     state=None, labels=None) -> dict:
        owner = sanitize_path_param(owner, "owner")
        repo = sanitize_path_param(repo, "repo")
        payload = {}
        if title:
            payload["title"] = title
        if body is not None:
            payload["body"] = body
        if state:
            payload["state"] = state
        if labels is not None:
            payload["labels"] = labels
        return self._request(
            "PATCH", f"/repos/{owner}/{repo}/issues/{issue_number}",
            json_body=payload,
        )

    # --- pull requests (github_tool.py:275-346) ---
    def list_pull_requests(self, owner, repo, state="open", page=1,
                           limit=30) -> dict:
        owner = sanitize_path_param(owner, "owner")
        repo = sanitize_path_param(repo, "repo")
        return self._request("GET", f"/repos/{owner}/{repo}/pulls", {
            "state": state, "per_page": min(limit, 100), "page": max(1, page),
        })

    def get_pull_request(self, owner, repo, pull_number: int) -> dict:
        owner = sanitize_path_param(owner, "owner")
        repo = sanitize_path_param(repo, "repo")
        return self._request(
            "GET", f"/repos/{owner}/{repo}/pulls/{pull_number}"
        )

    def create_pull_request(self, owner, repo, title, head, base, body=None,
                            draft=False) -> dict:
        owner = sanitize_path_param(owner, "owner")
        repo = sanitize_path_param(repo, "repo")
        payload = {"title": title, "head": head, "base": base, "draft": draft}
        if body:
            payload["body"] = body
        return self._request(
            "POST", f"/repos/{owner}/{repo}/pulls", json_body=payload
        )

    # --- search / branches / stargazers (github_tool.py:348-432) ---
    def search_code(self, query: str, limit=30) -> dict:
        return self._request("GET", "/search/code", {
            "q": query, "per_page": min(limit, 100),
        })

    def list_branches(self, owner, repo, limit=30) -> dict:
        owner = sanitize_path_param(owner, "owner")
        repo = sanitize_path_param(repo, "repo")
        return self._request("GET", f"/repos/{owner}/{repo}/branches", {
            "per_page": min(limit, 100),
        })

    def get_branch(self, owner, repo, branch) -> dict:
        owner = sanitize_path_param(owner, "owner")
        repo = sanitize_path_param(repo, "repo")
        branch = sanitize_path_param(branch, "branch")
        return self._request(
            "GET", f"/repos/{owner}/{repo}/branches/{branch}"
        )

    def list_stargazers(self, owner, repo, page=1, limit=30) -> dict:
        owner = sanitize_path_param(owner, "owner")
        repo = sanitize_path_param(repo, "repo")
        return self._request("GET", f"/repos/{owner}/{repo}/stargazers", {
            "per_page": min(limit, 100), "page": max(1, page),
        })

    # --- users (github_tool.py:434-489) ---
    def get_user_profile(self, username: str) -> dict:
        username = sanitize_path_param(username, "username")
        return self._request("GET", f"/users/{username}")

    def get_user_emails(self, username: str) -> dict:
        """Public-email discovery: profile email plus commit-author
        emails from recent public PushEvents, deduplicated, noreply
        addresses dropped (github_tool.py:447-489)."""
        username = sanitize_path_param(username, "username")
        emails: dict[str, str] = {}
        profile = self.get_user_profile(username)
        if profile.get("success"):
            email = (profile.get("data") or {}).get("email")
            if email:
                emails[email] = "profile"
        events = self._request(
            "GET", f"/users/{username}/events/public", {"per_page": 30}
        )
        if events.get("success"):
            for event in events["data"] or []:
                if event.get("type") != "PushEvent":
                    continue
                for commit in event.get("payload", {}).get("commits", []):
                    email = commit.get("author", {}).get("email", "")
                    if email and "@" in email and "noreply" not in email.lower():
                        emails.setdefault(email, "commit")
        return {
            "username": username,
            "emails": [{"email": e, "source": s} for e, s in emails.items()],
            "total": len(emails),
        }


ISSUE_SCHEMA = (
    "owner string, repo string, number bigint, title string, state string, "
    "user_login string, created_at string, updated_at string, "
    "n_comments bigint, is_pull boolean, error string"
)


def github_issues_table(repos: DataFrame, client_factory,
                        state: str = "all", limit: int = 100) -> DataFrame:
    """Fetch issues for a TABLE of (owner, repo) rows on the executors
    — mapInPandas, map-only, no shuffle; one output row per issue,
    per-row error envelopes (a failed repo yields one row with
    ``error`` set). ``client_factory`` builds the per-executor client
    and must pickle by value (lambda/closure).

    At scale the issue table is a dimension: join it broadcast against
    warehouse facts; the fact side never moves."""
    import pandas as pd

    cols = [f.split()[0] for f in ISSUE_SCHEMA.split(",")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for owner, repo in zip(pdf["owner"], pdf["repo"]):
                env = client.list_issues(str(owner), str(repo), state=state,
                                         limit=limit)
                if "error" in env:
                    rows.append({"owner": owner, "repo": repo, "number": None,
                                 "title": None, "state": None,
                                 "user_login": None, "created_at": None,
                                 "updated_at": None, "n_comments": None,
                                 "is_pull": None, "error": env["error"]})
                    continue
                for it in env["data"] or []:
                    rows.append({
                        "owner": owner, "repo": repo,
                        "number": it.get("number"),
                        "title": it.get("title"),
                        "state": it.get("state"),
                        "user_login": (it.get("user") or {}).get("login"),
                        "created_at": it.get("created_at"),
                        "updated_at": it.get("updated_at"),
                        "n_comments": it.get("comments"),
                        "is_pull": "pull_request" in it,
                        "error": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return repos.select("owner", "repo").mapInPandas(run, ISSUE_SCHEMA)


REPO_SCHEMA = (
    "owner string, name string, full_name string, stars bigint, "
    "forks bigint, language string, pushed_at string, error string"
)


def github_repos_table(owners: DataFrame, client_factory,
                       limit: int = 100) -> DataFrame:
    """Fetch repository listings for a TABLE of owner rows on the
    executors (same contract as github_issues_table)."""
    import pandas as pd

    cols = [f.split()[0] for f in REPO_SCHEMA.split(",")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for owner in pdf["owner"]:
                env = client.list_repos(str(owner), limit=limit)
                if "error" in env:
                    rows.append({"owner": owner, "name": None,
                                 "full_name": None, "stars": None,
                                 "forks": None, "language": None,
                                 "pushed_at": None, "error": env["error"]})
                    continue
                for r in env["data"] or []:
                    rows.append({
                        "owner": owner, "name": r.get("name"),
                        "full_name": r.get("full_name"),
                        "stars": r.get("stargazers_count"),
                        "forks": r.get("forks_count"),
                        "language": r.get("language"),
                        "pushed_at": r.get("pushed_at"),
                        "error": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return owners.select("owner").mapInPandas(run, REPO_SCHEMA)
