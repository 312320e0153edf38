"""GitHub connector conformance tests: REST wire shapes, the
reference error map, path-param sanitization, email discovery, and
the distributed issues/repos table tiers — all replayed through the
fixture REST transport (github_tool.py parity)."""

from __future__ import annotations

import json

from aden_hive_fork_spark.sources.github_source import (
    GITHUB_API_BASE,
    GitHubClient,
    github_issues_table,
    github_repos_table,
)
from aden_hive_fork_spark.sources.rest_connector import (
    FixtureRestTransport,
    jdump,
    sanitize_error_message,
    sanitize_path_param,
)

REPOS_BODY = jdump([
    {"name": "engine", "full_name": "acme/engine", "stargazers_count": 410,
     "forks_count": 32, "language": "Scala", "pushed_at": "2026-08-01T00:00:00Z"},
    {"name": "docs", "full_name": "acme/docs", "stargazers_count": 12,
     "forks_count": 3, "language": None, "pushed_at": "2026-07-21T00:00:00Z"},
])

ISSUES_BODY = jdump([
    {"number": 7, "title": "Reader drops nulls", "state": "open",
     "user": {"login": "ada"}, "created_at": "2026-08-01T09:00:00Z",
     "updated_at": "2026-08-02T10:00:00Z", "comments": 4},
    {"number": 9, "title": "Speed up shuffle", "state": "open",
     "user": {"login": "lin"}, "created_at": "2026-08-03T11:00:00Z",
     "updated_at": "2026-08-03T12:00:00Z", "comments": 0,
     "pull_request": {"url": "https://api.github.com/repos/acme/engine/pulls/9"}},
])


def _client(fixtures):
    return GitHubClient("tok-123", FixtureRestTransport(fixtures))


def test_list_repos_wire_shape_and_envelope():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", f"{GITHUB_API_BASE}/users/acme/repos",
            {"visibility": "all", "sort": "updated", "per_page": 30},
        ): (200, REPOS_BODY),
    })
    c = GitHubClient("tok-123", t)
    env = c.list_repos("acme")
    assert env["success"] is True
    assert [r["name"] for r in env["data"]] == ["engine", "docs"]
    # wire: Bearer auth + GitHub media type headers were sent
    _, _, params, _, headers = t.requests[0]
    assert headers["Authorization"] == "Bearer tok-123"
    assert headers["Accept"] == "application/vnd.github+json"
    assert headers["X-GitHub-Api-Version"] == "2022-11-28"
    assert params["per_page"] == 30


def test_limit_clamped_to_100():
    t = FixtureRestTransport()
    GitHubClient("t", t).search_repos("spark", limit=500)
    assert t.requests[0][2]["per_page"] == 100


def test_error_map_parity():
    base = f"{GITHUB_API_BASE}/repos/acme/engine"
    for status, expect in [
        (401, "Invalid or expired GitHub token"),
        (403, "Forbidden - check token permissions or rate limit"),
        (404, "Resource not found"),
    ]:
        t = FixtureRestTransport({
            FixtureRestTransport.key("GET", base, None, None): (status, b"{}"),
        })
        assert GitHubClient("t", t).get_repo("acme", "engine") == {
            "error": expect
        }
    t = FixtureRestTransport({
        FixtureRestTransport.key("GET", base, None, None): (
            422, jdump({"message": "bad field"})),
    })
    assert GitHubClient("t", t).get_repo("acme", "engine") == {
        "error": "Validation error: bad field"
    }
    t = FixtureRestTransport({
        FixtureRestTransport.key("GET", base, None, None): (
            500, jdump({"message": "boom"})),
    })
    assert GitHubClient("t", t).get_repo("acme", "engine") == {
        "error": "GitHub API error (HTTP 500): boom"
    }


def test_path_traversal_rejected():
    try:
        sanitize_path_param("a/../b", "owner")
        assert False, "should raise"
    except ValueError as e:
        assert "owner" in str(e)


def test_error_message_never_leaks_token():
    msg = sanitize_error_message(Exception("Authorization: Bearer tok-123"))
    assert "tok-123" not in msg and msg == "Network error occurred"


def test_create_issue_posts_payload():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{GITHUB_API_BASE}/repos/acme/engine/issues", None,
            {"title": "t", "body": "b", "labels": ["bug"]},
        ): (201, jdump({"number": 11})),
    })
    env = GitHubClient("t", t).create_issue(
        "acme", "engine", "t", body="b", labels=["bug"]
    )
    assert env == {"success": True, "data": {"number": 11}}


def test_update_issue_is_patch_with_sparse_payload():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "PATCH", f"{GITHUB_API_BASE}/repos/acme/engine/issues/7", None,
            {"state": "closed"},
        ): (200, jdump({"number": 7, "state": "closed"})),
    })
    env = GitHubClient("t", t).update_issue("acme", "engine", 7, state="closed")
    assert env["success"] and env["data"]["state"] == "closed"


def test_get_user_emails_merges_profile_and_commits():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", f"{GITHUB_API_BASE}/users/ada", None, None,
        ): (200, jdump({"login": "ada", "email": "ada@example.com"})),
        FixtureRestTransport.key(
            "GET", f"{GITHUB_API_BASE}/users/ada/events/public",
            {"per_page": 30}, None,
        ): (200, jdump([
            {"type": "PushEvent", "payload": {"commits": [
                {"author": {"email": "ada@work.example"}},
                {"author": {"email": "x@users.noreply.github.com"}},
                {"author": {"email": "ada@example.com"}},
            ]}},
            {"type": "WatchEvent"},
        ])),
    })
    env = GitHubClient("t", t).get_user_emails("ada")
    assert env["total"] == 2
    by_email = {e["email"]: e["source"] for e in env["emails"]}
    # profile source wins for the duplicated address; noreply dropped
    assert by_email == {"ada@example.com": "profile",
                        "ada@work.example": "commit"}


def test_fixture_key_excludes_credentials():
    k1 = FixtureRestTransport.key("GET", "u", {"q": "x", "token": "a"})
    k2 = FixtureRestTransport.key("GET", "u", {"q": "x", "token": "b"})
    assert k1 == k2


def test_issues_table_distributed(spark):
    fixtures = {
        FixtureRestTransport.key(
            "GET", f"{GITHUB_API_BASE}/repos/acme/engine/issues",
            {"state": "all", "per_page": 100, "page": 1},
        ): (200, ISSUES_BODY),
        FixtureRestTransport.key(
            "GET", f"{GITHUB_API_BASE}/repos/acme/gone/issues",
            {"state": "all", "per_page": 100, "page": 1},
        ): (404, b"{}"),
    }
    repos = spark.createDataFrame(
        [("acme", "engine"), ("acme", "gone")], "owner string, repo string"
    )
    # factory pickles by value: fixtures dict rides into the closure
    out = github_issues_table(
        repos,
        lambda: GitHubClient("t", FixtureRestTransport(fixtures)),
        state="all",
    ).collect()
    ok = [r for r in out if r["error"] is None]
    bad = [r for r in out if r["error"] is not None]
    assert {r["number"] for r in ok} == {7, 9}
    assert [r["is_pull"] for r in sorted(ok, key=lambda r: r["number"])] == [
        False, True]
    assert len(bad) == 1 and bad[0]["repo"] == "gone"
    assert bad[0]["error"] == "Resource not found"


def test_repos_table_distributed(spark):
    fixtures = {
        FixtureRestTransport.key(
            "GET", f"{GITHUB_API_BASE}/users/acme/repos",
            {"visibility": "all", "sort": "updated", "per_page": 100},
        ): (200, REPOS_BODY),
    }
    owners = spark.createDataFrame([("acme",)], "owner string")
    out = github_repos_table(
        owners, lambda: GitHubClient("t", FixtureRestTransport(fixtures))
    ).collect()
    assert {r["full_name"] for r in out} == {"acme/engine", "acme/docs"}
    assert {r["stars"] for r in out} == {410, 12}
