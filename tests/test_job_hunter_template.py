"""Integration test: the reference's job_hunter template on
plans.Pipeline — PDF resume intake, fixture job boards, relevance
ranking, user selection, truthful materials, draft batching with the
skip-on-error rule."""

from __future__ import annotations

import os
import re

import pytest

from aden_hive_fork_spark.plans.job_hunter import (
    JOB_BOARDS,
    build_job_hunter_pipeline,
)

RESUME = (
    "Senior engineer. 7 years building Spark and SQL ETL pipelines in "
    "Python with Airflow orchestration and Kafka streams. Some "
    "Postgres and API work."
)


def _make_boards():
    """12 job detail pages spread across the 5 boards' search pages.
    j11 404s (must never be reported)."""
    jobs = {
        f"https://boards.example/job/j{i}": (
            f"<html><head><title>Job {i}</title></head><body><p>"
            + desc
            + "</p></body></html>"
        )
        for i, desc in enumerate([
            "Looking for spark sql etl python airflow experience",
            "Backend role: python api postgres microservices",
            "ML role: pytorch python ml mlops",
            "Data engineer: spark kafka sql",
            "DevOps: kubernetes terraform aws docker",
            "Frontend: react typescript css",
            "Data scientist: statistics python pandas sql",
            "ETL developer: sql etl airflow",
            "Platform: go java api",
            "Analytics engineer: sql python spark",
            "Junior web: html css",
            "Ghost job: spark sql (dead link)",
        ])
    }

    def listing(i, title, company, loc="Remote"):
        return (
            f"<a href='https://boards.example/job/j{i}'>"
            f"{title} | {company} | {loc}</a>"
        )

    anchors = [
        listing(0, "Data Engineer", "Acme"),
        listing(1, "Backend Engineer", "Beta Corp", "NYC"),
        listing(2, "ML Engineer", "Gamma AI"),
        listing(3, "Data Engineer", "Delta"),
        listing(4, "DevOps Engineer", "Epsilon"),
        listing(5, "Frontend Engineer", "Zeta"),
        listing(6, "Data Scientist", "Eta"),
        listing(7, "ETL Developer", "Theta"),
        listing(8, "Platform Engineer", "Iota"),
        listing(9, "Analytics Engineer", "Kappa"),
        listing(10, "Junior Web Dev", "Lambda"),
        listing(11, "Data Engineer", "Mu (dead)"),
    ]
    search_pages = {}
    for bi in range(len(JOB_BOARDS)):
        page = "".join(anchors[i] for i in range(len(anchors))
                       if i % len(JOB_BOARDS) == bi)
        search_pages[bi] = f"<html><body>{page}</body></html>"

    def factory():
        def transport(url):
            if url.endswith("/job/j11"):
                return {"status": 404, "error": "http_404"}
            if url in jobs:
                return {"status": 200, "body": jobs[url]}
            for bi, board in enumerate(JOB_BOARDS):
                prefix = board.split("{role}")[0]
                if url.startswith(prefix):
                    return {"status": 200, "body": search_pages[bi]}
            return {"status": 404, "error": "http_404"}

        return transport

    return factory


class _DraftRecorder:
    def __init__(self, fail_after: int | None = None):
        self.drafts = []
        self.fail_after = fail_after

    def create_draft(self, to, subject, html):
        if (self.fail_after is not None
                and len(self.drafts) >= self.fail_after):
            return {"error": "Gmail not connected"}
        self.drafts.append({"to": to, "subject": subject, "html": html})
        return {"success": True, "draft_id": f"d{len(self.drafts)}"}


def _run(spark, tmp_path, selection="all", recorder=None,
         resume_pdf=None):
    pipe = build_job_hunter_pipeline(
        transport_factory=_make_boards(),
        gmail_client_factory=(lambda: recorder) if recorder else None,
        data_dir_of=lambda cid: str(tmp_path / f"c{cid}"),
    )
    df = spark.createDataFrame(
        [(0, None if resume_pdf else RESUME, resume_pdf, selection)],
        "candidate_id long, resume_text string, "
        "resume_pdf_path string, selection string",
    )
    return pipe.run(df)["customize"].collect()


def test_end_to_end_all_selected(spark, tmp_path):
    rec = _DraftRecorder()
    rows = _run(spark, tmp_path, "all", rec)
    assert len(rows) == 1
    r = rows[0]
    assert r["n_jobs"] == 10  # ten found (12 minus dead link minus cut)
    assert r["n_relevant"] >= 8  # skill hits on nearly every job
    assert r["report_ok"] and os.path.exists(r["materials_file"])
    html = open(r["materials_file"]).read()
    assert "boards.example/job/j11" not in html  # dead link never reported
    # truthful materials: emphasized skills come from the resume
    assert "Experiences to Emphasize" in html
    assert "Keywords to Add (if truthful)" in html
    # drafts: one per selected job, never sent
    assert r["n_drafts"] == 10 and not r["drafts_skipped"]
    assert all(d["to"].startswith("hiring@") for d in rec.drafts)
    # personalization: every email names the company's domain slug
    for d in rec.drafts:
        assert re.match(r"hiring@[a-z0-9-]+\.example", d["to"])


def test_user_selection_respected(spark, tmp_path):
    rec = _DraftRecorder()
    rows = _run(spark, tmp_path, "1, 3, 5", rec)
    r = rows[0]
    assert r["n_jobs"] == 3  # approval: only the picked ranks
    assert r["n_drafts"] == 3


def test_draft_failure_skips_remaining(spark, tmp_path):
    rec = _DraftRecorder(fail_after=2)
    rows = _run(spark, tmp_path, "all", rec)
    r = rows[0]
    assert r["n_drafts"] == 2 and r["drafts_skipped"]
    # no gmail connected at all -> all skipped, pipeline still green
    rows = _run(spark, tmp_path, "all", recorder=None)
    assert rows[0]["n_drafts"] == 0 and rows[0]["drafts_skipped"]
    assert rows[0]["report_ok"]


def test_pdf_resume_branch(spark, tmp_path):
    from aden_hive_fork_spark.sources.pdf_source import pdf_write

    pdf_path = str(tmp_path / "resume.pdf")
    pdf_write(pdf_path, [RESUME])
    rows = _run(spark, tmp_path, "all", resume_pdf=pdf_path)
    assert rows[0]["n_jobs"] == 10  # same roles found via the PDF path
