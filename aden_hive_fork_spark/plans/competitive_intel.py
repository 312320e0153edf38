"""Competitive Intelligence Report — the reference's
competitive_intel_agent template on this engine's surface (eighth
capstone, completing the reference's template directory).

Reference parity: examples/templates/competitive_intel_agent/
(agent.py Goal — four weighted criteria and the no-fabrication /
source-attribution constraints; the SEVEN-node graph with the
conditional GitHub branch and the aggregator FAN-IN: intake →
web-scraper → news-search → {github-monitor if
has_github_competitors else → aggregator} → aggregator → analysis →
report; nodes/__init__.py the NodeSpecs). The Spark-first form runs a
TABLE of monitoring runs, and the conditional branch is literal DATA
ROUTING: finding rows whose run has GitHub competitors flow through
the github-monitor node, the rest skip straight to the aggregator,
and the two streams UNION at the fan-in — the engine's guarded-edge +
fan-in machinery exercising the one reference graph shape no other
capstone uses.

- **intake** parses ``competitors_input`` ("Name=https://site
  [github:org]; ...") into one SEED row per competitor and stamps
  ``has_github_competitors``;
- **web-scraper** fetches each competitor site (injectable
  transport) and lifts dated update lines ("YYYY-MM-DD — text") into
  findings — only text actually fetched becomes a finding
  (constraint c-no-fabrication), each carrying its source URL
  (constraint c-source-attribution);
- **news-search** queries the search provider per (competitor,
  focus area) — ``sources/search_source`` provider protocol,
  FixtureSearchProvider in tests — and lifts dated snippets;
- **github-monitor** (conditional branch) lists each org's repos
  through ``sources/github_source.GitHubClient`` and lifts pushes as
  github_activity findings;
- **aggregator** (fan-in) deduplicates per (competitor,
  normalized update) keeping the MOST DETAILED version with an
  n_sources count (the node's dedup rule), categorizes with the
  reference's ten-category taxonomy, sorts, and saves
  ``findings_latest.json``;
- **analysis** loads the most recent prior snapshot from the run's
  data_dir (``sources/data_tools``), marks NEW findings vs history,
  extracts the top highlights by category priority, derives
  per-(competitor, category) TREND deltas vs the prior snapshot, and
  saves ``snapshot_<as_of>.json`` for the next cycle — the
  sc-historical-comparison criterion made literal;
- **report** renders the digest HTML and returns one delivery row
  per run.

Scale: runs/competitors are dimensions; fetches are the map-only
connector tier; dedup is one keyed aggregate over findings.
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable

from pyspark.sql import DataFrame, functions as F

from .deep_research import Goal, SuccessCriterion
from .graph import Edge, Node, Pipeline
from .vuln_assessment import Constraint

GOAL = Goal(
    id="competitive-intelligence-report",
    name="Competitive Intelligence Report",
    description=(
        "Monitor competitor websites, news sources, and GitHub "
        "repositories to produce a structured digest with key "
        "insights, detailed findings per competitor, and trend "
        "analysis vs stored history."
    ),
    success_criteria=(
        SuccessCriterion(
            "sc-source-coverage",
            "Multiple source types checked per competitor",
            "sources_per_competitor", ">=3", 0.25,
        ),
        SuccessCriterion(
            "sc-findings-structured",
            "Findings carry competitor, category, update, source, date",
            "findings_structured", "true", 0.25,
        ),
        SuccessCriterion(
            "sc-historical-comparison",
            "Stored data compared with previous reports for trends",
            "historical_comparison", "true", 0.25,
        ),
        SuccessCriterion(
            "sc-report-delivered",
            "Formatted, readable digest delivered",
            "report_delivered", "true", 0.25,
        ),
    ),
    constraints=(
        Constraint("c-no-fabrication",
                   "Never fabricate findings — only report what was "
                   "found.", "hard", "quality"),
        Constraint("c-source-attribution",
                   "Every finding carries its source.", "hard",
                   "quality"),
    ),
)

CATEGORIES = (
    "pricing", "features", "partnership", "hiring", "funding",
    "press_release", "github_activity", "messaging",
    "product_launch", "other",
)
_CATEGORY_RULES = [
    ("pricing", ("price", "pricing", "tier", "discount")),
    ("funding", ("funding", "raised", "series", "investment")),
    ("partnership", ("partner", "partnership", "alliance")),
    ("hiring", ("hiring", "joins", "hire", "headcount")),
    ("product_launch", ("launch", "launched", "releases", "ga")),
    ("features", ("feature", "adds", "support for", "integration")),
    ("press_release", ("announce", "announces", "press")),
    ("messaging", ("rebrand", "reposition", "tagline", "messaging")),
]
_HIGHLIGHT_PRIORITY = {
    "funding": 0, "pricing": 1, "product_launch": 2, "partnership": 3,
    "features": 4, "press_release": 5, "hiring": 6,
    "github_activity": 7, "messaging": 8, "other": 9,
}

_FINDING_SCHEMA = (
    "run_id long, competitor string, website string, github_org string,"
    " focus_areas string, as_of string, data_dir string,"
    " has_github_competitors boolean, category string, update string,"
    " source string, date string"
)

_DATED_LINE = re.compile(r"(\d{4}-\d{2}-\d{2})\s*[—-]\s*(.+)")


def categorize(text: str) -> str:
    t = str(text or "").lower()
    for cat, kws in _CATEGORY_RULES:
        if any(kw in t for kw in kws):
            return cat
    return "other"


def _intake(df: DataFrame) -> DataFrame:
    """Parse competitors_input into one SEED row per competitor
    (category='_seed'); stamp the run's has_github_competitors flag
    (the reference's conditional-branch output key)."""
    spark = df.sparkSession
    rows = []
    for r in df.collect():
        comps = []
        for part in str(r["competitors_input"]).split(";"):
            part = part.strip()
            if not part:
                continue
            name, _, rest = part.partition("=")
            rest = rest.strip()
            org = None
            m = re.search(r"github:(\S+)", rest)
            if m:
                org = m.group(1)
                rest = rest[: m.start()].strip()
            comps.append((name.strip(), rest, org))
        has_gh = any(org for _, _, org in comps)
        for name, site, org in comps:
            rows.append((
                int(r["run_id"]), name, site, org,
                str(r["focus_areas"]), str(r["as_of"]),
                str(r["data_dir"]), has_gh,
                "_seed", None, None, None,
            ))
    return spark.createDataFrame(rows, _FINDING_SCHEMA)


def _lift_dated(text: str) -> list[tuple[str, str]]:
    out = []
    for line in str(text or "").split("\n"):
        m = _DATED_LINE.search(line.strip())
        if m:
            out.append((m.group(1), m.group(2).strip()))
    return out


def _web_node(transport_factory: Callable | None):
    from ..sources.html_source import html_text_udf
    from ..sources.http_source import fetch_urls

    def fn(df: DataFrame) -> DataFrame:
        df = df.localCheckpoint(eager=True)
        sites = df.filter(F.col("category") == "_seed").select(
            F.col("website").alias("url")
        ).distinct()
        pages = fetch_urls(
            sites, transport_factory=transport_factory
        ).filter((F.col("status") == 200) & F.col("error").isNull())
        texts = {
            r["url"]: r["text"]
            for r in pages.select(
                "url",
                html_text_udf()(F.decode("body", "utf-8")).alias("text"),
            ).collect()
        }
        spark = df.sparkSession
        rows = []
        for s in df.filter(F.col("category") == "_seed").collect():
            for date, update in _lift_dated(texts.get(s["website"], "")):
                rows.append((
                    s["run_id"], s["competitor"], s["website"],
                    s["github_org"], s["focus_areas"], s["as_of"],
                    s["data_dir"], s["has_github_competitors"],
                    "_raw", update, s["website"], date,
                ))
        found = spark.createDataFrame(rows, _FINDING_SCHEMA)
        return df.unionByName(found)

    return fn


def _news_node(provider_factory: Callable | None):
    def fn(df: DataFrame) -> DataFrame:
        df = df.localCheckpoint(eager=True)
        provider = provider_factory() if provider_factory else None
        spark = df.sparkSession
        rows = []
        if provider is not None:
            for s in df.filter(F.col("category") == "_seed").collect():
                for focus in str(s["focus_areas"]).split(","):
                    focus = focus.strip()
                    env = provider.search(
                        f"{s['competitor']} {focus}", num_results=5
                    )
                    for res in env.get("results", []):
                        # attribution guard: a result only becomes
                        # this competitor's finding if it actually
                        # names the competitor (the provider matches
                        # on ANY query term, including the focus word)
                        blob = f"{res['title']} {res['snippet']}".lower()
                        if s["competitor"].lower() not in blob:
                            continue
                        for date, update in _lift_dated(res["snippet"]):
                            rows.append((
                                s["run_id"], s["competitor"],
                                s["website"], s["github_org"],
                                s["focus_areas"], s["as_of"],
                                s["data_dir"],
                                s["has_github_competitors"],
                                "_raw", update, res["url"], date,
                            ))
        found = spark.createDataFrame(rows, _FINDING_SCHEMA)
        return df.unionByName(found)

    return fn


def _github_node(client_factory: Callable | None):
    def fn(df: DataFrame) -> DataFrame:
        df = df.localCheckpoint(eager=True)
        client = client_factory() if client_factory else None
        spark = df.sparkSession
        rows = []
        if client is not None:
            orgs = df.filter(
                (F.col("category") == "_seed")
                & F.col("github_org").isNotNull()
            ).collect()
            for s in orgs:
                env = client.list_repos(username=s["github_org"])
                for repo in env.get("data", []) or []:
                    pushed = str(repo.get("pushed_at", ""))[:10]
                    rows.append((
                        s["run_id"], s["competitor"], s["website"],
                        s["github_org"], s["focus_areas"], s["as_of"],
                        s["data_dir"], s["has_github_competitors"],
                        "github_activity",
                        f"pushed {repo.get('name')}: "
                        f"{repo.get('description') or 'no description'}",
                        repo.get("html_url")
                        or f"https://github.com/{s['github_org']}/"
                        f"{repo.get('name')}",
                        pushed,
                    ))
        found = spark.createDataFrame(rows, _FINDING_SCHEMA)
        return df.unionByName(found)

    return fn


def _aggregate(df: DataFrame) -> DataFrame:
    """Fan-in: dedup per (run, competitor, normalized update) keeping
    the MOST DETAILED version (longest update, then source ASC) with
    an n_sources count; categorize; save findings_latest.json."""
    from ..sources.data_tools import save_data

    seeds = df.filter(F.col("category") == "_seed")
    finds = df.filter(~F.col("category").isin("_seed"))
    # "the same update" = same competitor/date and the same leading
    # words — a longer rewrite of the same story collapses onto the
    # shorter one and the most detailed version survives below
    norm = F.concat_ws(
        " ",
        F.slice(
            F.split(F.lower(F.trim("update")), r"\s+"), 1, 5
        ),
    )
    norm = F.concat_ws("|", F.coalesce("date", F.lit("")), norm)
    w = F.struct(
        # longest update wins ("keep the most detailed version");
        # remaining fields break ties deterministically (max order)
        F.length("update").alias("l"),
        F.col("update"),
        F.col("source"),
        F.col("date"),
        F.col("category"),
    )
    dedup = (
        finds.withColumn("_k", norm)
        .groupBy(
            "run_id", "competitor", "website", "github_org",
            "focus_areas", "as_of", "data_dir",
            "has_github_competitors", "_k",
        )
        .agg(
            F.max(w).alias("_best"),
            F.countDistinct("source").cast("int").alias("n_sources"),
        )
        .select(
            "run_id", "competitor", "website", "github_org",
            "focus_areas", "as_of", "data_dir",
            "has_github_competitors",
            F.col("_best.category").alias("category"),
            F.col("_best.update").alias("update"),
            F.col("_best.source").alias("source"),
            F.col("_best.date").alias("date"),
            "n_sources",
        )
    )
    cat = F.when(
        F.col("category") == "github_activity", F.lit("github_activity")
    )
    for c, kws in _CATEGORY_RULES:
        cond = F.lit(False)
        for kw in kws:
            cond = cond | F.lower("update").contains(kw)
        cat = cat.when(cond, F.lit(c))
    dedup = dedup.withColumn("category", cat.otherwise(F.lit("other")))
    out = dedup.localCheckpoint(eager=True)
    # save the aggregated dataset per run (the node's step 5)
    for (run_id, data_dir), grp in _group_rows(out):
        os.makedirs(data_dir, exist_ok=True)
        save_data(
            "findings_latest.json",
            json.dumps(grp, sort_keys=True),
            data_dir,
        )
    return out.unionByName(
        seeds.withColumn("n_sources", F.lit(0).cast("int"))
    )


def _group_rows(df: DataFrame) -> list:
    by = {}
    for r in df.filter(F.col("category") != "_seed").collect():
        by.setdefault((int(r["run_id"]), r["data_dir"]), []).append({
            "competitor": r["competitor"], "category": r["category"],
            "update": r["update"], "source": r["source"],
            "date": r["date"],
        })
    return sorted(
        (k, sorted(v, key=lambda d: (d["competitor"], d["update"])))
        for k, v in by.items()
    )


def _analysis(df: DataFrame) -> DataFrame:
    """Load the latest prior snapshot, mark NEW findings, extract
    highlights (category priority, then date DESC), derive trend
    deltas, save snapshot_<as_of>.json."""
    from ..sources.data_tools import list_data, load_data, save_data

    spark = df.sparkSession
    seeds = df.filter(F.col("category") == "_seed").collect()
    rows = _group_rows(df)
    out_rows = []
    for (run_id, data_dir), findings in rows:
        as_of = next(
            s["as_of"] for s in seeds
            if int(s["run_id"]) == run_id and s["data_dir"] == data_dir
        )
        snaps = sorted(
            f["filename"]
            for f in list_data(data_dir).get("files", [])
            if f["filename"].startswith("snapshot_")
            and f["filename"] < f"snapshot_{as_of}.json"
        )
        prev, used_history = [], False
        if snaps:
            env = load_data(snaps[-1], data_dir, limit_bytes=10_000_000)
            try:
                prev = json.loads(env.get("content") or "[]")
                used_history = True
            except ValueError:
                prev = []
        prev_keys = {
            (p["competitor"], p["update"].strip().lower()) for p in prev
        }
        for fi in findings:
            fi["is_new"] = (
                fi["competitor"], fi["update"].strip().lower()
            ) not in prev_keys
        pool = [fi for fi in findings if fi["is_new"]] or findings
        highlights = sorted(
            pool,
            key=lambda fi: (
                _HIGHLIGHT_PRIORITY.get(fi["category"], 9),
                -int((fi["date"] or "0").replace("-", "") or 0),
                fi["update"],
            ),
        )[:5]
        # trends: per (competitor, category) count deltas vs history
        def counts(items):
            c: dict = {}
            for it in items:
                k = (it["competitor"], it["category"])
                c[k] = c.get(k, 0) + 1
            return c

        cur, old = counts(findings), counts(prev)
        trends = [
            f"{comp}: {cat} {old.get((comp, cat), 0)} -> {n}"
            for (comp, cat), n in sorted(cur.items())
            if n != old.get((comp, cat), 0) and used_history
        ]
        save_data(
            f"snapshot_{as_of}.json",
            json.dumps(findings, sort_keys=True),
            data_dir,
        )
        out_rows.append((
            run_id, data_dir, as_of, json.dumps(findings),
            json.dumps([h["update"] for h in highlights]),
            json.dumps(trends), used_history,
        ))
    meta = spark.createDataFrame(
        out_rows,
        "run_id long, data_dir string, as_of string, findings string,"
        " key_highlights string, trend_analysis string,"
        " used_history boolean",
    )
    # seeds ride along for coverage accounting in the report
    seeds_df = df.filter(F.col("category") == "_seed").select(
        "run_id", "competitor", "github_org",
    )
    return meta.join(
        seeds_df.groupBy("run_id").agg(
            F.countDistinct("competitor").cast("int").alias(
                "n_competitors"
            ),
            F.sum(
                F.when(F.col("github_org").isNotNull(), 1).otherwise(0)
            ).cast("int").alias("n_github_orgs"),
        ),
        "run_id",
    )


def _report(df: DataFrame) -> DataFrame:
    """Render the digest HTML per run; one delivery row per run."""
    from ..sources.data_tools import save_data

    spark = df.sparkSession
    out = []
    for r in df.collect():
        findings = json.loads(r["findings"])
        highlights = json.loads(r["key_highlights"])
        trends = json.loads(r["trend_analysis"])
        by_comp: dict = {}
        for fi in findings:
            by_comp.setdefault(fi["competitor"], []).append(fi)
        body = (
            "<!DOCTYPE html>\n<html><head><meta charset='utf-8'>"
            "</head><body><h1>Competitive Intelligence Digest</h1>"
            f"<p>{r['as_of']} | {len(findings)} findings across "
            f"{r['n_competitors']} competitors</p>"
            "<h2>Key Highlights</h2><ul>"
            + "".join(f"<li>{h}</li>" for h in highlights)
            + "</ul><h2>Trends</h2><ul>"
            + "".join(f"<li>{t}</li>" for t in trends)
            + "</ul>"
        )
        for comp, items in sorted(by_comp.items()):
            body += f"<h2>{comp}</h2><ul>"
            for fi in sorted(items, key=lambda x: (x["date"] or ""),
                             reverse=True):
                body += (
                    f"<li>[{fi['category']}] {fi['update']} "
                    f"(<a href='{fi['source']}'>source</a>, "
                    f"{fi['date']})</li>"
                )
            body += "</ul>"
        body += "</body></html>"
        res = save_data("intel_digest.html", body, r["data_dir"])
        n_struct = sum(
            1 for fi in findings
            if all(fi.get(k) for k in
                   ("competitor", "category", "update", "source",
                    "date"))
        )
        out.append((
            int(r["run_id"]),
            os.path.join(r["data_dir"], "intel_digest.html"),
            len(findings), int(r["n_competitors"]),
            int(r["n_github_orgs"]), n_struct, len(highlights),
            len(trends), bool(r["used_history"]),
            "error" not in res,
        ))
    return spark.createDataFrame(
        out,
        "run_id long, report_file string, n_findings int,"
        " n_competitors int, n_github_orgs int, n_structured int,"
        " n_highlights int, n_trends int, historical_comparison"
        " boolean, report_delivered boolean",
    )


def build_competitive_intel_pipeline(
    transport_factory: Callable | None = None,
    provider_factory: Callable | None = None,
    github_client_factory: Callable | None = None,
) -> Pipeline:
    """The reference's seven-node graph with the conditional GitHub
    branch and the aggregator fan-in as literal data routing."""
    nodes = [
        Node("intake", _intake, client_facing=True,
             output_keys=("competitors", "focus_areas")),
        Node("web-scraper", _web_node(transport_factory),
             output_keys=("web_findings",)),
        Node("news-search", _news_node(provider_factory),
             output_keys=("news_findings",)),
        Node("github-monitor", _github_node(github_client_factory),
             output_keys=("github_findings",)),
        Node("aggregator", _aggregate,
             output_keys=("aggregated_findings",)),
        Node("analysis", _analysis,
             output_keys=("key_highlights", "trend_analysis",
                          "detailed_findings")),
        Node("report", _report, client_facing=True,
             output_keys=("delivery_status",)),
    ]
    edges = [
        Edge("intake", "web-scraper", condition="always", priority=1),
        Edge("web-scraper", "news-search", condition="always",
             priority=1),
        # the reference's conditional branch (agent.py:123-137)
        Edge("news-search", "github-monitor",
             condition="has_github_competitors == True", priority=1),
        Edge("news-search", "aggregator",
             condition="has_github_competitors == False", priority=1),
        Edge("github-monitor", "aggregator", condition="always",
             priority=1),
        Edge("aggregator", "analysis", condition="always", priority=1),
        Edge("analysis", "report", condition="always", priority=1),
    ]
    return Pipeline(
        nodes, edges, entry="intake", terminals=["report"],
        max_visits=3,
    )


def evaluate_success_criteria(reports: DataFrame) -> DataFrame:
    agg = reports.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(
            F.lit(2)
            + F.when(F.col("n_github_orgs") > 0, 1).otherwise(0)
        ).alias("min_source_types"),
        F.sum(
            F.when(
                F.col("n_structured") == F.col("n_findings"), 0
            ).otherwise(1)
        ).alias("unstructured_runs"),
        F.sum(
            F.when(F.col("historical_comparison"), 0).otherwise(1)
        ).alias("no_history_runs"),
        F.sum(
            F.when(F.col("report_delivered"), 0).otherwise(1)
        ).alias("undelivered"),
    )
    rows = []
    for crit in GOAL.success_criteria:
        if crit.id == "sc-source-coverage":
            measured = F.col("min_source_types")
            passed = F.col("min_source_types") >= 3
        elif crit.id == "sc-findings-structured":
            measured = F.col("unstructured_runs")
            passed = F.col("unstructured_runs") == 0
        elif crit.id == "sc-historical-comparison":
            measured = F.col("no_history_runs")
            passed = F.col("no_history_runs") == 0
        else:
            measured = F.col("undelivered")
            passed = F.col("undelivered") == 0
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
