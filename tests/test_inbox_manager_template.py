"""Integration test: the reference's email_inbox_management template
on plans.Pipeline against a STATEFUL local-HTTP Gmail fake (state
lives in the pytest process; executors reach it over loopback, so
label/trash/draft effects are real and assertable) — rule parsing,
batch-capped fetch, batched label execution, custom labels, summary
report, success criteria."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from aden_hive_fork_spark.plans.inbox_manager import (
    build_inbox_pipeline,
    evaluate_success_criteria,
    parse_rule,
)

STATE: dict = {}


def _fresh_state():
    def msg(subject, sender, snippet):
        return {"subject": subject, "from": sender, "snippet": snippet,
                "labels": {"INBOX", "UNREAD"}, "trashed": False}

    return {
        "messages": {
            "m1": msg("Weekly newsletter digest", "news@letter.example",
                      "your newsletter issue"),
            "m2": msg("Invoice overdue", "billing@vendor.example",
                      "please pay the invoice"),
            "m3": msg("Lunch?", "friend@pal.example", "are you free"),
            "m4": msg("Newsletter special", "promo@letter.example",
                      "newsletter deals"),
            "m5": msg("Security alert", "alerts@bank.example",
                      "new device sign-in"),
            "m6": msg("Old thread", "old@pal.example", "misc note"),
        },
        "drafts": [],
        "labels": {},
        "batch_modify_calls": 0,
    }


class _GmailHandler(BaseHTTPRequestHandler):
    def _json(self, code, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        parts = u.path.strip("/").split("/")
        msgs = STATE["messages"]
        if parts == ["messages"]:
            inbox = [
                {"id": mid, "threadId": mid}
                for mid, m in sorted(msgs.items())
                if "INBOX" in m["labels"] and not m["trashed"]
            ]
            n = int(q.get("maxResults", 100))
            return self._json(200, {
                "messages": inbox[:n],
                "resultSizeEstimate": len(inbox),
            })
        if parts[0] == "messages" and len(parts) == 2:
            m = msgs.get(parts[1])
            if m is None:
                return self._json(404, {})
            return self._json(200, {
                "id": parts[1], "threadId": parts[1],
                "snippet": m["snippet"],
                "labelIds": sorted(m["labels"]),
                "payload": {"headers": [
                    {"name": "Subject", "value": m["subject"]},
                    {"name": "From", "value": m["from"]},
                    {"name": "To", "value": "me@example.com"},
                    {"name": "Date", "value": "Mon, 3 Aug 2026"},
                ]},
            })
        if parts == ["labels"]:
            return self._json(200, {"labels": [
                {"id": i, "name": n_}
                for n_, i in STATE["labels"].items()
            ]})
        self._json(404, {})

    def do_POST(self):
        u = urlparse(self.path)
        parts = u.path.strip("/").split("/")
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n) or b"{}")
        msgs = STATE["messages"]
        if parts == ["messages", "batchModify"]:
            STATE["batch_modify_calls"] += 1
            for mid in body["ids"]:
                m = msgs[mid]
                m["labels"] |= set(body.get("addLabelIds", []))
                m["labels"] -= set(body.get("removeLabelIds", []))
            self.send_response(204)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        if parts[0] == "messages" and parts[-1] == "trash":
            msgs[parts[1]]["trashed"] = True
            return self._json(200, {})
        if parts == ["drafts"]:
            STATE["drafts"].append(body)
            return self._json(200, {
                "id": f"d{len(STATE['drafts'])}",
                "message": {"id": "x"},
            })
        if parts == ["labels"]:
            name = body["name"]
            STATE["labels"][name] = f"Label_{len(STATE['labels']) + 1}"
            return self._json(200, {
                "id": STATE["labels"][name], "name": name,
                "type": "user",
            })
        self._json(404, {})

    def log_message(self, *args):
        pass


@pytest.fixture(scope="module")
def gmail_base():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _GmailHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _client_factory(base):
    """Pickles by value (closes only over the base URL string); the
    transport rewrites the Gmail API base onto the loopback fake."""

    def factory():
        import json as _json
        import urllib.error
        import urllib.request
        from urllib.parse import urlencode

        from aden_hive_fork_spark.sources.gmail_source import (
            GMAIL_API_BASE,
            GmailClient,
        )

        def transport(method, url, params=None, json_body=None,
                      headers=None):
            path = url[len(GMAIL_API_BASE):]
            target = base + path
            if params:
                target += "?" + urlencode(params)
            data = (
                _json.dumps(json_body).encode()
                if json_body is not None else None
            )
            req = urllib.request.Request(
                target, data=data, method=method,
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req, timeout=10) as resp:
                    return resp.status, resp.read()
            except urllib.error.HTTPError as e:
                return e.code, e.read()

        return GmailClient("test-token", transport)

    return factory


def test_parse_rule_verbs_and_scopes():
    p = parse_rule("Archive newsletters")
    assert p["action"] == "modify" and p["remove_labels"] == ["INBOX"]
    assert p["match_value"] == "newsletter"
    p = parse_rule("trash anything from promo@letter.example")
    assert p["action"] == "trash" and p["match_field"] == "sender"
    p = parse_rule("draft a reply to emails containing invoice")
    assert p["action"] == "draft" and p["match_value"] == "invoice"
    p = parse_rule("label emails from alerts@bank.example as alerts")
    assert p["action"] == "label" and p["label_name"] == "alerts"
    assert parse_rule("do a backflip")["action"] == "none"


@pytest.fixture()
def run_report(spark, gmail_base):
    STATE.clear()
    STATE.update(_fresh_state())
    pipe = build_inbox_pipeline(_client_factory(gmail_base))
    df = spark.createDataFrame(
        [(0,
          "Archive newsletters; "
          "trash anything from promo@letter.example; "
          "draft a reply to emails containing invoice; "
          "label emails from alerts@bank.example as alerts; "
          "mark as read emails from friend@pal.example",
          5)],
        "run_id long, rules string, max_emails int",
    )
    return pipe.run(df)["report"].collect()


def test_actions_execute_against_state(run_report):
    msgs = STATE["messages"]
    # m1 archived (newsletter): INBOX removed, email preserved —
    # the non-destructive-default constraint
    assert "INBOX" not in msgs["m1"]["labels"]
    assert not msgs["m1"]["trashed"]
    # m4 matches both the archive and the explicit trash rule
    assert msgs["m4"]["trashed"]
    # m2 got a draft reply; drafts only, nothing sent
    assert len(STATE["drafts"]) == 1
    # m5: custom label created once, then applied by id
    assert "alerts" in STATE["labels"]
    assert STATE["labels"]["alerts"] in msgs["m5"]["labels"]
    # m3 marked read
    assert "UNREAD" not in msgs["m3"]["labels"]
    # m6 is outside the batch cap (max_emails=5, ids sorted):
    # respect-batch-limit means it was never touched
    assert msgs["m6"]["labels"] == {"INBOX", "UNREAD"}
    assert not msgs["m6"]["trashed"]


def test_batching_and_report(run_report):
    rows = {(r["run_id"], r["action"]): r for r in run_report}
    assert rows[(0, "modify")]["n_emails"] == 3  # m1+m4 archive, m3 read
    assert rows[(0, "trash")]["n_emails"] == 1
    assert rows[(0, "draft")]["n_emails"] == 1
    assert rows[(0, "label")]["n_emails"] == 1
    assert all(r["n_failed"] == 0 for r in run_report)
    assert "Invoice overdue" in rows[(0, "draft")]["subjects"]


def test_success_criteria(spark, gmail_base):
    STATE.clear()
    STATE.update(_fresh_state())
    from aden_hive_fork_spark.plans.inbox_manager import (
        _act_node,
        _fetch_node,
        _intake,
    )

    factory = _client_factory(gmail_base)
    df = spark.createDataFrame(
        [(0, "mark as read emails containing newsletter", 6)],
        "run_id long, rules string, max_emails int",
    )
    log = _act_node(factory)(_fetch_node(factory)(_intake(df)))
    crits = {
        r["criterion"]: r
        for r in evaluate_success_criteria(log, n_inbox=6).collect()
    }
    assert len(crits) == 4
    assert all(r["passed"] for r in crits.values()), crits
    assert abs(sum(r["weight"] for r in crits.values()) - 1.0) < 1e-9
