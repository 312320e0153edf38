"""Job Hunter — the reference's job_hunter template on this engine's
surface (seventh capstone).

Reference parity: examples/templates/job_hunter/ (agent.py Goal —
five weighted criteria; edges intake → job-search → job-review →
customize, all ON_SUCCESS; nodes/__init__.py the four NodeSpecs —
intake/job-review/customize client-facing). The reference hunts for
one candidate per conversation with an LLM doing the analysis; the
Spark-first form serves a TABLE of candidates in one pass, with every
judgment replaced by the deterministic tier:

- **intake** (client-facing): resume text taken directly OR extracted
  from an attached PDF (``sources/pdf_source.pdf_extract_pages`` —
  the node's pdf_file_path branch); skills = the taxonomy keywords
  present in the resume (word-boundary match); target roles = the
  3-5 roles whose skill sets the resume best covers — identified
  from ACTUAL experience, never invented (the node's core rule);
- **job-search**: per (candidate, role) the reference's five job-board
  search URLs are fetched executor-side (``fetch_urls`` with the
  injectable transport), listing anchors parsed
  (``title | company | location`` anchor convention, href containing
  /job/), detail pages fetched for descriptions, and the TOP 10 per
  candidate kept by skill-hit relevance (rank: hits DESC, url ASC) —
  only fetched URLs are ever reported (no fabrication);
- **job-review** (client-facing): the user's selection arrives as
  data — ``selection`` = 'all' or '1,3,5' indices into the presented
  ranking (the reference's exact reply format);
- **customize** (client-facing, terminal): per selected job a
  truthful customization list (the job's required skills MISSING
  from the resume become "keywords to add"; present ones become
  "experiences to emphasize" — enhance presentation, never
  fabricate), a <150-word cold email naming the company, role, and a
  real matched skill, the chunked HTML build (save_data + one
  append_data per job section + footer), and Gmail DRAFTS (never
  send) in batches of ≤5 with the reference's skip-all-on-error
  rule when Gmail is not connected.

Scale: candidates are a dimension; board/detail fetches are the
map-only connector tier; ranking is one keyed window per candidate.
"""

from __future__ import annotations

import os
import re
from typing import Callable

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .deep_research import Goal, SuccessCriterion
from .graph import Edge, Node, Pipeline
from .vuln_assessment import Constraint

GOAL = Goal(
    id="job-hunter",
    name="Job Hunter",
    description=(
        "Analyze a resume, find matching job openings on public job "
        "boards, let the user select, and produce per-job application "
        "materials (resume customization list + cold outreach email)."
    ),
    success_criteria=(
        SuccessCriterion(
            "role-match", "Target roles reflect actual experience",
            "role_match_accuracy", ">=0.8", 0.2,
        ),
        SuccessCriterion(
            "job-relevance", "Found jobs match the target roles",
            "job_relevance_score", ">=0.8", 0.2,
        ),
        SuccessCriterion(
            "customization-specificity",
            "Customizations are specific to each job",
            "customization_specificity", ">=0.85", 0.2,
        ),
        SuccessCriterion(
            "email-personalization",
            "Cold emails are personalized per company/role",
            "email_personalization_score", ">=0.85", 0.2,
        ),
        SuccessCriterion(
            "user-approval", "User's selection is respected",
            "approval_rate", ">=0.9", 0.2,
        ),
    ),
    constraints=(
        Constraint("truthful-materials",
                   "Enhance presentation, never fabricate experience.",
                   "hard", "quality"),
        Constraint("drafts-not-send",
                   "Create email drafts only, never send.",
                   "hard", "safety"),
    ),
)

# the reference's five job boards (nodes/__init__.py job-search)
JOB_BOARDS = (
    "https://www.linkedin.com/jobs/search/?keywords={role}",
    "https://www.indeed.com/jobs?q={role}",
    "https://www.glassdoor.com/Job/jobs.htm?sc.keyword={role}",
    "https://wellfound.com/jobs?q={role}",
    "https://remoteok.com/remote-{role}-jobs",
)

# deterministic role taxonomy (the LLM's "identify 3-5 role types
# from ACTUAL experience" as a skills-coverage argmax)
ROLE_SKILLS = {
    "Data Engineer": ("spark", "sql", "etl", "airflow", "python",
                      "kafka"),
    "Backend Engineer": ("python", "go", "java", "api", "postgres",
                         "microservices"),
    "ML Engineer": ("pytorch", "tensorflow", "ml", "python",
                    "mlops", "spark"),
    "Data Scientist": ("statistics", "python", "sql", "ml",
                       "pandas", "experimentation"),
    "DevOps Engineer": ("kubernetes", "terraform", "aws", "ci",
                        "docker", "linux"),
    "Frontend Engineer": ("react", "typescript", "javascript",
                          "css", "html"),
}
_ALL_SKILLS = sorted({s for v in ROLE_SKILLS.values() for s in v})
N_ROLES_MIN, N_ROLES_MAX, N_JOBS = 3, 5, 10


def _present(text: str, skills) -> list[str]:
    t = " " + re.sub(r"[^a-z0-9]+", " ", str(text or "").lower()) + " "
    return [s for s in skills if f" {s} " in t]


def _intake_node(pdf_reader: Callable[[str], str] | None = None):
    """Client-facing intake. ``pdf_reader`` (path -> text) defaults to
    the repo PDF extractor; rows with resume_pdf_path take the
    reference's pdf_file_path branch."""

    def default_reader(path: str) -> str:
        from ..sources.pdf_source import pdf_extract_pages

        with open(path, "rb") as f:
            return "\n".join(t for _, t in pdf_extract_pages(f.read()))

    reader = pdf_reader or default_reader

    def fn(df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        rows = []
        for r in df.collect():  # candidates are a dimension
            text = r["resume_text"]
            if r["resume_pdf_path"]:
                text = reader(r["resume_pdf_path"])
            skills = _present(text, _ALL_SKILLS)
            scored = sorted(
                (
                    (-len(set(skills) & set(req)), role)
                    for role, req in ROLE_SKILLS.items()
                    if set(skills) & set(req)
                ),
            )
            roles = [role for _, role in scored[:N_ROLES_MAX]]
            rows.append((
                int(r["candidate_id"]), text, skills, roles,
                str(r["selection"] or "all"),
            ))
        return spark.createDataFrame(
            rows,
            "candidate_id long, resume_text string, "
            "skills array<string>, target_roles array<string>, "
            "selection string",
        )

    return fn


def _search_node(transport_factory: Callable | None):
    from ..sources.html_source import (
        html_links_extract_udf,
        html_text_udf,
        html_title_udf,
    )
    from ..sources.http_source import fetch_urls

    def fn(df: DataFrame) -> DataFrame:
        cands = df.localCheckpoint(eager=True)
        from urllib.parse import quote

        pairs = cands.select(
            "candidate_id", F.explode("target_roles").alias("role")
        ).collect()
        spark = cands.sparkSession
        board_rows = sorted(
            {
                (int(p["candidate_id"]), p["role"],
                 b.format(role=quote(p["role"])))
                for p in pairs
                for b in JOB_BOARDS
            }
        )
        boards = spark.createDataFrame(
            board_rows, "candidate_id long, role string, url string"
        )
        fronts = fetch_urls(
            boards.select("url").distinct(),
            transport_factory=transport_factory,
        ).filter((F.col("status") == 200) & F.col("error").isNull())
        listings = (
            boards.join(fronts, "url")
            .select(
                "candidate_id",
                "role",
                F.explode(
                    html_links_extract_udf()(
                        F.decode(F.col("body"), "utf-8")
                    )
                ).alias("link"),
            )
            .select(
                "candidate_id",
                "role",
                F.col("link.href").alias("job_url"),
                F.split(F.col("link.text"), r"\s*\|\s*").alias("_p"),
            )
            .filter(F.col("job_url").contains("/job/"))
            .select(
                "candidate_id",
                "role",
                "job_url",
                F.element_at("_p", 1).alias("title"),
                F.element_at("_p", 2).alias("company"),
                F.coalesce(F.element_at("_p", 3), F.lit("Remote"))
                .alias("location"),
            )
            .distinct()
        )
        details = fetch_urls(
            listings.select(F.col("job_url").alias("url")).distinct(),
            transport_factory=transport_factory,
        ).filter((F.col("status") == 200) & F.col("error").isNull())
        detailed = listings.join(
            details.select(
                F.col("url").alias("job_url"),
                html_text_udf()(
                    F.decode(F.col("body"), "utf-8")
                ).alias("description"),
                html_title_udf()(
                    F.decode(F.col("body"), "utf-8")
                ).alias("_dt"),
            ),
            "job_url",
        )
        skills_map = cands.select("candidate_id", "skills", "selection")
        # word-boundary skill hits via space-normalized containment
        # (rlike needs a literal pattern; skills are a column)
        norm_desc = F.concat(
            F.lit(" "),
            F.regexp_replace(F.lower("description"), r"[^a-z0-9]+", " "),
            F.lit(" "),
        )
        hits = F.size(
            F.filter(
                "skills",
                lambda s: norm_desc.contains(
                    F.concat(F.lit(" "), s, F.lit(" "))
                ),
            )
        )
        w = Window.partitionBy("candidate_id").orderBy(
            F.desc("skill_hits"), F.asc("job_url")
        )
        return (
            detailed.join(skills_map, "candidate_id")
            .withColumn("skill_hits", hits)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= N_JOBS)
            .select(
                "candidate_id", "rank", "title", "company",
                "location", "job_url", "description", "skill_hits",
                "skills", "selection",
            )
        )

    return fn


def _review(df: DataFrame) -> DataFrame:
    """Client-facing review: apply the user's selection ('all' or
    '1,3,5' indices into the presented ranking)."""
    sel = F.trim(F.lower("selection"))
    picked = F.when(sel == "all", F.lit(True)).otherwise(
        F.array_contains(
            F.transform(
                F.split("selection", r"\s*,\s*"),
                lambda x: x.cast("int"),
            ),
            F.col("rank"),
        )
    )
    return df.withColumn("_picked", picked).filter("_picked").drop(
        "_picked"
    )


def _customize_node(
    gmail_client_factory: Callable | None, data_dir_of: Callable | None
):
    from ..sources.data_tools import append_data, save_data

    def fn(df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        jobs = df.collect()  # ≤ N_JOBS per candidate (dimension)
        by_cand: dict[int, list] = {}
        for j in jobs:
            by_cand.setdefault(int(j["candidate_id"]), []).append(j)
        client = gmail_client_factory() if gmail_client_factory else None
        out = []
        for cid, sel in sorted(by_cand.items()):
            sel = sorted(sel, key=lambda j: j["rank"])
            data_dir = (
                data_dir_of(cid) if data_dir_of else f"/tmp/jobhunt/{cid}"
            )
            os.makedirs(data_dir, exist_ok=True)
            fname = "application_materials.html"
            toc = "".join(
                f"<li><a href='#job-{j['rank']}'>{j['title']} at "
                f"{j['company']}</a></li>"
                for j in sel
            )
            res = save_data(
                fname,
                "<!DOCTYPE html>\n<html><head><meta charset='utf-8'>"
                "</head><body><h1>Application Materials</h1>"
                f"<div class='toc'><ul>{toc}</ul></div>",
                data_dir,
            )
            ok = "error" not in res
            emails = []
            for j in sel:
                req = set()
                for role, skills in ROLE_SKILLS.items():
                    req |= set(_present(j["description"], skills))
                have = sorted(req & set(j["skills"]))
                missing = sorted(req - set(j["skills"]))
                # truthful-materials: present skills are emphasized,
                # missing ones are "keywords to add" suggestions —
                # nothing is claimed that isn't in the resume
                email = (
                    f"Subject: {j['title']} — experienced "
                    f"{have[0] if have else 'engineer'}\n"
                    f"Hi {j['company']} team,\n"
                    f"I saw your {j['title']} opening and believe my "
                    f"background in {', '.join(have[:3]) or 'software'}"
                    f" fits well. I would love to talk about how I "
                    f"can contribute. My resume is attached.\n"
                    f"Best regards"
                )
                emails.append((j, email))
                section = (
                    f"<div class='job-section' id='job-{j['rank']}'>"
                    f"<h2>{j['title']} at {j['company']}</h2>"
                    f"<p class='job-url'><a href='{j['job_url']}'>"
                    f"{j['job_url']}</a></p>"
                    "<div class='customization-list'>"
                    "<h3>Experiences to Emphasize</h3><ul>"
                    + "".join(f"<li>{s}</li>" for s in have)
                    + "</ul><h3>Keywords to Add (if truthful)</h3><ul>"
                    + "".join(f"<li>{s}</li>" for s in missing)
                    + "</ul></div>"
                    f"<div class='email-card'>{email}</div></div>"
                )
                res = append_data(fname, section, data_dir)
                ok = ok and "error" not in res
            res = append_data(fname, "</body>\n</html>", data_dir)
            ok = ok and "error" not in res
            n_drafts, skipped = 0, False
            if client is None:
                skipped = True  # "Gmail not connected"
            else:
                for batch_start in range(0, len(emails), 5):
                    if skipped:
                        break
                    for j, email in emails[batch_start:batch_start + 5]:
                        subject = email.split("\n", 1)[0][9:]
                        body = email.split("\n", 1)[1]
                        domain = re.sub(
                            r"[^a-z0-9]+", "-", j["company"].lower()
                        ).strip("-")
                        env = client.create_draft(
                            to=f"hiring@{domain}.example",
                            subject=subject,
                            html=f"<p>{body}</p>",
                        )
                        if "error" in env:
                            skipped = True  # skip ALL remaining
                            break
                        n_drafts += 1
            out.append((
                cid, os.path.join(data_dir, fname), len(sel),
                sum(1 for j in sel if j["skill_hits"] > 0),
                n_drafts, skipped, bool(ok),
            ))
        return spark.createDataFrame(
            out,
            "candidate_id long, materials_file string, n_jobs int, "
            "n_relevant int, n_drafts int, drafts_skipped boolean, "
            "report_ok boolean",
        )

    return fn


def build_job_hunter_pipeline(
    transport_factory: Callable | None = None,
    gmail_client_factory: Callable | None = None,
    data_dir_of: Callable | None = None,
    pdf_reader: Callable | None = None,
) -> Pipeline:
    """intake → job-search → job-review → customize (agent.py edges,
    linear, customize terminal)."""
    nodes = [
        Node("intake", _intake_node(pdf_reader), client_facing=True,
             output_keys=("resume_text", "role_analysis")),
        Node("job-search", _search_node(transport_factory),
             output_keys=("job_listings",)),
        Node("job-review", _review, client_facing=True,
             output_keys=("selected_jobs",)),
        Node("customize",
             _customize_node(gmail_client_factory, data_dir_of),
             client_facing=True,
             output_keys=("application_materials",)),
    ]
    edges = [
        Edge("intake", "job-search", condition="always", priority=1),
        Edge("job-search", "job-review", condition="always",
             priority=1),
        Edge("job-review", "customize", condition="always",
             priority=1),
    ]
    return Pipeline(
        nodes, edges, entry="intake", terminals=["customize"],
        max_visits=3,
    )
