"""Email Inbox Management — the reference's email_inbox_management
template on this engine's surface (sixth capstone).

Reference parity: examples/templates/email_inbox_management/
(agent.py:24-97 Goal — four weighted success criteria and the
respect-batch-limit / non-destructive-default / draft-not-send
constraints; edges intake → fetch-emails → classify-and-act → report,
all ON_SUCCESS; nodes/__init__.py the four NodeSpecs). The reference
processes one inbox per conversation with an LLM applying free-text
rules chunk by chunk; the Spark-first form manages a TABLE of runs
(rules × batch limits) in one pass:

- **intake** (client-facing) parses each run's free-text rules with
  the deterministic rule tier (``parse_rule`` — the heuristic member
  of the repo's rule/LLM two-tier discipline): action verb → Gmail
  label algebra (the node prompt's GMAIL LABEL REFERENCE table,
  nodes/__init__.py:160-173), optional "from X" / "containing X" /
  "newsletters" match scopes;
- **fetch-emails** pages ``GmailClient.list_messages`` to AT MOST
  the run's ``max_emails`` (constraint respect-batch-limit — the cap
  is enforced by construction) and hydrates the id table on the
  executors (``sources/gmail_source.gmail_messages_table``, map-only,
  per-row error envelopes);
- **classify-and-act** joins emails × parsed rules, emits one
  decision per match PLUS an explicit ``no_action`` row for
  unmatched emails (criterion batch-completeness: nothing is
  silently skipped), then EXECUTES on the executors: label changes
  grouped by identical (add, remove) into ONE batchModify per group
  per partition (the prompt's "ALWAYS prefer batch"), trash and
  draft per row, custom labels resolved/created ONCE driver-side and
  applied by id. Drafts are created, never sent (constraint
  draft-not-send — the client has no send wire at all); archive is
  a label removal, only explicit trash rules trash (constraint
  non-destructive-default);
- **report** rolls the action log up per (run, action): counts,
  affected subjects, failures — the reference's summary table.

Scale: runs and rules are dimensions; the fetch and act passes are
map-only connector tiers whose parallelism is the id-table
partitioning; the decision join is emails × |rules| (broadcast).
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import DataFrame, functions as F

from .deep_research import Goal, SuccessCriterion
from .graph import Edge, Node, Pipeline
from .vuln_assessment import Constraint

GOAL = Goal(
    id="email-inbox-management",
    name="Email Inbox Management",
    description=(
        "Manage Gmail inbox emails autonomously using user-defined "
        "free-text rules: fetch inbox emails up to a configurable "
        "batch size, apply the rules, and execute the appropriate "
        "Gmail actions."
    ),
    success_criteria=(
        SuccessCriterion(
            "correct-action-execution",
            "Actions applied correctly to the right emails per rules",
            "action_correctness", ">=95%", 0.30,
        ),
        SuccessCriterion(
            "action-report",
            "Summary report: emails affected per action type, subjects",
            "report_completeness", "100%", 0.25,
        ),
        SuccessCriterion(
            "batch-completeness",
            "All fetched emails processed; none silently skipped",
            "emails_processed_ratio", "100%", 0.30,
        ),
        SuccessCriterion(
            "label-management",
            "Custom labels created and applied when rules require",
            "label_coverage", "100%", 0.15,
        ),
    ),
    constraints=(
        Constraint("respect-batch-limit",
                   "Never process more than max_emails.",
                   "hard", "operational"),
        Constraint("non-destructive-default",
                   "Archive preserves the email; only explicit trash "
                   "rules trash.", "hard", "safety"),
        Constraint("draft-not-send",
                   "Create draft replies, NEVER send.",
                   "hard", "safety"),
    ),
)

# the node prompt's GMAIL LABEL REFERENCE, as a verb table
_VERBS = [
    ("mark as unread", "modify", ["UNREAD"], []),
    ("mark as read", "modify", [], ["UNREAD"]),
    ("mark important", "modify", ["IMPORTANT"], []),
    ("remove important", "modify", [], ["IMPORTANT"]),
    ("unstar", "modify", [], ["STARRED"]),
    ("star", "modify", ["STARRED"], []),
    ("archive", "modify", [], ["INBOX"]),
    ("mark as spam", "modify", ["SPAM"], ["INBOX"]),
    ("spam", "modify", ["SPAM"], ["INBOX"]),
    ("trash", "trash", [], []),
    ("delete", "trash", [], []),
    ("draft a reply", "draft", [], []),
    ("draft replies", "draft", [], []),
    ("draft reply", "draft", [], []),
    ("reply", "draft", [], []),
]

_LABEL_RE = re.compile(r"\blabel\b.*?\s+as\s+['\"]?([\w -]+?)['\"]?\s*$")
_FROM_RE = re.compile(r"\bfrom\s+([^\s,;]+)")
_CONTAIN_RE = re.compile(r"\b(?:containing|about|mentioning)\s+['\"]?([\w -]+?)['\"]?\s*$")


def parse_rule(text: str) -> dict:
    """Free-text rule → structured decision: ``action`` (modify |
    trash | draft | label | none), label algebra, and the match
    scope. Unrecognized verbs parse to action='none' (surfaced, not
    guessed — the heuristic tier never invents destructive actions)."""
    t = " ".join(str(text or "").lower().split())
    out = {
        "action": "none", "add_labels": [], "remove_labels": [],
        "label_name": None, "match_field": None, "match_value": None,
    }
    m = _LABEL_RE.search(t)
    if m and "label" in t:
        out["action"] = "label"
        out["label_name"] = m.group(1).strip()
    else:
        for verb, action, add, rem in _VERBS:
            if verb in t:
                out["action"] = action
                out["add_labels"] = list(add)
                out["remove_labels"] = list(rem)
                break
    m = _FROM_RE.search(t)
    if m:
        out["match_field"], out["match_value"] = "sender", m.group(1)
    else:
        m = _CONTAIN_RE.search(t)
        if m:
            out["match_field"] = "text"
            out["match_value"] = m.group(1).strip()
        elif "newsletter" in t:
            out["match_field"], out["match_value"] = "text", "newsletter"
    return out


def _intake(df: DataFrame) -> DataFrame:
    """Client-facing intake: split each run's rules on ';' and parse
    every clause with the deterministic tier."""
    spark = df.sparkSession
    rows = []
    for r in df.collect():  # runs are a dimension (few rows)
        clauses = [
            c.strip() for c in str(r["rules"]).split(";") if c.strip()
        ]
        for i, clause in enumerate(clauses):
            p = parse_rule(clause)
            rows.append((
                r["run_id"], int(r["max_emails"]), i, clause,
                p["action"], p["add_labels"], p["remove_labels"],
                p["label_name"], p["match_field"], p["match_value"],
            ))
    return spark.createDataFrame(
        rows,
        "run_id long, max_emails int, rule_id int, rule string, "
        "action string, add_labels array<string>, "
        "remove_labels array<string>, label_name string, "
        "match_field string, match_value string",
    )


def _fetch_node(client_factory: Callable):
    from ..sources.gmail_source import gmail_messages_table

    def fn(rules: DataFrame) -> DataFrame:
        rules = rules.localCheckpoint(eager=True)
        spark = rules.sparkSession
        runs = [
            (int(r["run_id"]), int(r["max_emails"]))
            for r in rules.select("run_id", "max_emails")
            .distinct().collect()
        ]
        client = client_factory()
        id_rows = []
        for run_id, max_emails in sorted(runs):
            fetched, token = 0, None
            while fetched < max_emails:
                env = client.list_messages(
                    query="label:INBOX",
                    max_results=min(500, max_emails - fetched),
                    page_token=token,
                )
                if "error" in env:
                    break
                for m in env["messages"]:
                    if fetched >= max_emails:  # respect-batch-limit
                        break
                    id_rows.append((run_id, m["id"]))
                    fetched += 1
                token = env.get("next_page_token")
                if not token or not env["messages"]:
                    break
        ids = spark.createDataFrame(
            id_rows or [], "run_id long, message_id string"
        )
        emails = gmail_messages_table(
            ids.select("message_id").distinct(),
            client_factory,
            format="metadata",
        )
        out = ids.join(emails, "message_id")
        # rules ride along for the next node
        return out.join(
            rules.drop("max_emails"), "run_id"
        )

    return fn


def _decide(df: DataFrame) -> DataFrame:
    """(email × rule) → decision rows; unmatched emails get ONE
    explicit no_action row per run (batch-completeness)."""
    text = F.concat_ws(
        " ", F.coalesce("subject", F.lit("")),
        F.coalesce("snippet", F.lit("")),
    )
    matches = (
        F.when(F.col("match_field").isNull(), F.lit(True))
        .when(
            F.col("match_field") == "sender",
            F.lower(F.coalesce("sender", F.lit(""))).contains(
                F.lower("match_value")
            ),
        )
        .otherwise(F.lower(text).contains(F.lower("match_value")))
    )
    decided = df.filter(F.col("action") != "none").filter(matches)
    email_cols = [
        "run_id", "message_id", "subject", "sender", "error",
    ]
    acted_ids = decided.select("run_id", "message_id").distinct()
    unmatched = (
        df.select(*email_cols).distinct()
        .join(acted_ids, ["run_id", "message_id"], "left_anti")
        .select(
            "run_id", "message_id", "subject", "sender",
            F.lit(-1).cast("int").alias("rule_id"),
            F.lit("no_action").alias("action"),
            F.array().cast("array<string>").alias("add_labels"),
            F.array().cast("array<string>").alias("remove_labels"),
            F.lit(None).cast("string").alias("label_name"),
        )
    )
    return decided.select(
        "run_id", "message_id", "subject", "sender", "rule_id",
        "action", "add_labels", "remove_labels", "label_name",
    ).unionByName(unmatched)


def _act_node(client_factory: Callable):
    import pandas as pd  # noqa: F401 — executor import

    def fn(df: DataFrame) -> DataFrame:
        decisions = _decide(df).localCheckpoint(eager=True)
        spark = df.sparkSession
        # resolve custom labels ONCE driver-side (create if missing)
        names = [
            r["label_name"]
            for r in decisions.filter(F.col("action") == "label")
            .select("label_name").distinct().collect()
        ]
        label_ids: dict[str, str] = {}
        if names:
            client = client_factory()
            existing = {
                lb["name"]: lb["id"]
                for lb in client.list_labels().get("labels", [])
            }
            for name in sorted(names):
                if name in existing:
                    label_ids[name] = existing[name]
                else:
                    env = client.create_label(name)
                    label_ids[name] = env.get("id", name)
        lid_map = dict(label_ids)

        schema = (
            "run_id long, message_id string, subject string, "
            "rule_id int, action string, detail string, error string"
        )

        def run(batches):
            import pandas as pd

            client = client_factory()
            for pdf in batches:
                rows = []
                # batch label changes by identical (add, remove)
                groups: dict[tuple, list[int]] = {}
                for idx, r in pdf.iterrows():
                    action = r["action"]
                    if action == "label":
                        key = ((lid_map.get(r["label_name"],
                                            r["label_name"]),), ())
                        groups.setdefault(key, []).append(idx)
                    elif action == "modify":
                        key = (tuple(r["add_labels"]),
                               tuple(r["remove_labels"]))
                        groups.setdefault(key, []).append(idx)
                done: dict[int, tuple[str, str]] = {}
                for (add, rem), idxs in sorted(groups.items()):
                    ids = [str(pdf.loc[i, "message_id"]) for i in idxs]
                    env = client.batch_modify_messages(
                        ids, list(add) or None, list(rem) or None
                    )
                    err = env.get("error")
                    det = f"add={list(add)} remove={list(rem)}"
                    for i in idxs:
                        done[i] = (det, err)
                for idx, r in pdf.iterrows():
                    action, err, det = r["action"], None, None
                    if idx in done:
                        det, err = done[idx]
                    elif action == "trash":
                        env = client.trash_message(str(r["message_id"]))
                        err = env.get("error")
                        det = "trashed"
                    elif action == "draft":
                        env = client.create_draft(
                            to=str(r["sender"] or ""),
                            subject=f"Re: {r['subject']}",
                            html=(
                                f"<p>Replying to: {r['subject']}</p>"
                            ),
                        )
                        err = env.get("error")
                        det = f"draft_id={env.get('draft_id')}"
                    elif action == "no_action":
                        det = "evaluated, no rule matched"
                    rows.append({
                        "run_id": r["run_id"],
                        "message_id": r["message_id"],
                        "subject": r["subject"],
                        "rule_id": int(r["rule_id"]),
                        "action": action,
                        "detail": det,
                        "error": err,
                    })
                yield pd.DataFrame(
                    rows,
                    columns=["run_id", "message_id", "subject",
                             "rule_id", "action", "detail", "error"],
                )

        return decisions.mapInPandas(run, schema)

    return fn


def _report(actions: DataFrame) -> DataFrame:
    """Summary per (run, action): counts, affected subjects (sorted),
    failures — the reference report node's table."""
    return (
        actions.groupBy("run_id", "action")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_emails"),
            F.array_sort(F.collect_set("subject")).alias("subjects"),
            F.sum(
                F.when(F.col("error").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_failed"),
        )
        .orderBy("run_id", "action")
    )


def build_inbox_pipeline(client_factory: Callable) -> Pipeline:
    """intake → fetch-emails → classify-and-act → report (agent.py
    edges, linear; the report → intake forever-alive edge is
    conversation lifecycle — rerun the pipeline for the next cycle)."""
    nodes = [
        Node("intake", _intake, client_facing=True,
             output_keys=("rules", "max_emails")),
        Node("fetch-emails", _fetch_node(client_factory),
             output_keys=("emails",)),
        Node("classify-and-act", _act_node(client_factory),
             output_keys=("actions_taken",)),
        Node("report", _report, client_facing=True,
             output_keys=("summary_report",)),
    ]
    edges = [
        Edge("intake", "fetch-emails", condition="always", priority=1),
        Edge("fetch-emails", "classify-and-act", condition="always",
             priority=1),
        Edge("classify-and-act", "report", condition="always",
             priority=1),
    ]
    return Pipeline(
        nodes, edges, entry="intake", terminals=["report"],
        max_visits=3,
    )


def evaluate_success_criteria(
    actions: DataFrame, n_inbox: int
) -> DataFrame:
    """The four weighted criteria over the action log (one row per
    criterion). ``n_inbox`` = inbox size, to check the batch cap."""
    agg = actions.agg(
        F.countDistinct("message_id").alias("n_processed"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0))
        .alias("n_failed"),
        F.count(F.lit(1)).alias("n_actions"),
        F.sum(
            F.when(
                (F.col("action") == "label")
                & F.col("error").isNull(),
                1,
            ).otherwise(0)
        ).alias("n_label_ok"),
        F.sum(F.when(F.col("action") == "label", 1).otherwise(0))
        .alias("n_label"),
    )
    rows = []
    for crit in GOAL.success_criteria:
        if crit.id == "correct-action-execution":
            measured = F.col("n_actions") - F.col("n_failed")
            passed = (
                (F.col("n_actions") - F.col("n_failed"))
                * 100 >= F.col("n_actions") * 95
            )
        elif crit.id == "action-report":
            measured, passed = F.col("n_actions"), F.lit(True)
        elif crit.id == "batch-completeness":
            measured = F.col("n_processed")
            passed = F.col("n_processed") >= F.lit(min(n_inbox, 1))
        else:  # label-management
            measured = F.col("n_label_ok")
            passed = F.col("n_label_ok") == F.col("n_label")
        rows.append(
            agg.select(
                F.lit(crit.id).alias("criterion"),
                F.lit(crit.weight).alias("weight"),
                measured.cast("long").alias("measured"),
                passed.alias("passed"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
