"""Criteria→test-case surface with approval tracking — the agent-
testing harness data model and its Spark-side suite analytics.

Reference parity: core/framework/testing/test_case.py:15-136 (Test
model, ApprovalStatus/TestType enums, approve/modify/reject/
record_result lifecycle, is_approved/pass_rate), test_result.py:15-80
(TestResult + ErrorCategory). The reference generates test stubs with
an LLM and REQUIRES user approval before a test joins the suite; here
generation is the deterministic templating tier (one stub per success
criterion + per constraint — an LLM backend can refine the stub text
through the usual functions.llm_tier seam) and the approval state
machine is enforced exactly: a PENDING or REJECTED test never reaches
the approved suite.

Spark side: ``tests_table`` turns a case list into a DataFrame, and
``approval_funnel`` / ``suite_pass_rates`` are the keyed aggregations
a team dashboard needs (counts by approval status; per-goal/criteria
pass rates over approved tests only). ``categorize_result`` is the
single-result Python twin of state.categorizer.categorize_errors —
the same pattern lists and confidence formula, so one result debugged
locally and a billion results classified distributed agree exactly
(pinned by a differential test).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .categorizer import (
    EDGE_CASE_PATTERNS,
    FIX_SUGGESTIONS,
    IMPLEMENTATION_ERROR_PATTERNS,
    LOGIC_ERROR_PATTERNS,
)

# string enums (reference StrEnum values, verbatim contract)
APPROVAL_PENDING = "pending"
APPROVAL_APPROVED = "approved"
APPROVAL_MODIFIED = "modified"
APPROVAL_REJECTED = "rejected"

TEST_CONSTRAINT = "constraint"
TEST_SUCCESS_CRITERIA = "outcome"
TEST_EDGE_CASE = "edge_case"

CATEGORY_LOGIC = "logic_error"
CATEGORY_IMPLEMENTATION = "implementation_error"
CATEGORY_EDGE = "edge_case"


class ApprovalError(ValueError):
    """Raised when a lifecycle transition violates the approval
    contract (e.g. recording a run on an unapproved test)."""


@dataclass
class TestCase:
    """A test generated from a goal's success criterion or constraint.

    Mirrors reference test_case.py:33-136; never enters the suite
    without approval."""

    __test__ = False  # not a pytest class (reference does the same)

    id: str
    goal_id: str
    parent_criteria_id: str
    test_type: str
    test_name: str
    description: str
    test_code: str = ""
    input: dict[str, Any] = field(default_factory=dict)
    expected_output: dict[str, Any] = field(default_factory=dict)
    generated_by: str = "template"
    llm_confidence: float = 0.0
    approval_status: str = APPROVAL_PENDING
    approved_by: str | None = None
    rejection_reason: str | None = None
    original_code: str | None = None
    last_result: str | None = None
    run_count: int = 0
    pass_count: int = 0
    fail_count: int = 0

    # -- lifecycle (reference :95-125) ---------------------------------
    def approve(self, approved_by: str = "user") -> None:
        self.approval_status = APPROVAL_APPROVED
        self.approved_by = approved_by

    def modify(self, new_code: str, approved_by: str = "user") -> None:
        self.original_code = self.test_code
        self.test_code = new_code
        self.approval_status = APPROVAL_MODIFIED
        self.approved_by = approved_by

    def reject(self, reason: str) -> None:
        self.approval_status = APPROVAL_REJECTED
        self.rejection_reason = reason

    def record_result(self, passed: bool) -> None:
        if not self.is_approved:
            raise ApprovalError(
                f"test {self.id!r} is {self.approval_status!r} — only "
                "approved/modified tests run (reference approval contract)"
            )
        self.last_result = "passed" if passed else "failed"
        self.run_count += 1
        if passed:
            self.pass_count += 1
        else:
            self.fail_count += 1

    @property
    def is_approved(self) -> bool:
        return self.approval_status in (APPROVAL_APPROVED, APPROVAL_MODIFIED)

    @property
    def pass_rate(self) -> float | None:
        if self.run_count == 0:
            return None
        return self.pass_count / self.run_count


@dataclass
class TestResult:
    """One execution outcome (reference test_result.py:30-80)."""

    __test__ = False  # not a pytest class

    test_id: str
    passed: bool
    duration_ms: int = 0
    error_message: str | None = None
    stack_trace: str | None = None
    runtime_logs: list[dict[str, Any]] = field(default_factory=list)
    run_id: str | None = None


def criteria_to_testcases(
    goal_id: str,
    success_criteria: list[tuple[str, str]],
    constraints: list[tuple[str, str]] = (),
) -> list[TestCase]:
    """Deterministic stub generation: one PENDING test per success
    criterion (type 'outcome') and per constraint (type 'constraint').
    ``success_criteria``/``constraints`` are (id, description) pairs.
    The reference's LLM writes richer test_code; the ids, linkage, and
    PENDING state — the part the approval workflow depends on — are
    identical."""
    cases = []
    for cid, desc in success_criteria:
        slug = cid.replace("-", "_")
        cases.append(
            TestCase(
                id=f"{goal_id}::outcome::{cid}",
                goal_id=goal_id,
                parent_criteria_id=cid,
                test_type=TEST_SUCCESS_CRITERIA,
                test_name=f"test_outcome_{slug}",
                description=f"Validates success criterion: {desc}",
            )
        )
    for cid, desc in constraints:
        slug = cid.replace("-", "_")
        cases.append(
            TestCase(
                id=f"{goal_id}::constraint::{cid}",
                goal_id=goal_id,
                parent_criteria_id=cid,
                test_type=TEST_CONSTRAINT,
                test_name=f"test_constraint_{slug}",
                description=f"Validates constraint: {desc}",
            )
        )
    return cases


# ---------------------------------------------------------------------------
# single-result categorization — the Python twin of
# state.categorizer.categorize_errors (same patterns, same formula)
# ---------------------------------------------------------------------------


def _result_text(result: TestResult) -> str:
    parts = []
    if result.error_message:
        parts.append(result.error_message)
    if result.stack_trace:
        parts.append(result.stack_trace)
    for log in result.runtime_logs:
        if str(log.get("level", "")).upper() in ("ERROR", "CRITICAL", "WARNING"):
            parts.append(str(log.get("msg", "")))
    return " ".join(parts)


def categorize_result(result: TestResult) -> tuple[str | None, float]:
    """(category, confidence) for one TestResult — None for passes
    (reference categorizer.py:89-140)."""
    if result.passed:
        return None, 1.0
    text = _result_text(result).lower()
    n_logic = sum(1 for p in LOGIC_ERROR_PATTERNS if p in text)
    n_impl = sum(1 for p in IMPLEMENTATION_ERROR_PATTERNS if p in text)
    n_edge = sum(1 for p in EDGE_CASE_PATTERNS if p in text)
    total = n_logic + n_impl + n_edge
    if total == 0:
        return CATEGORY_IMPLEMENTATION, 0.3
    if n_logic >= n_impl and n_logic >= n_edge:
        dom, cat = n_logic, CATEGORY_LOGIC
    elif n_impl >= n_edge:
        dom, cat = n_impl, CATEGORY_IMPLEMENTATION
    else:
        dom, cat = n_edge, CATEGORY_EDGE
    return cat, min(0.9, 0.5 + (dom / total) * 0.4)


def fix_suggestion(category: str) -> str:
    return FIX_SUGGESTIONS[category]


# ---------------------------------------------------------------------------
# Spark-side suite analytics
# ---------------------------------------------------------------------------

_TESTS_SCHEMA = (
    "id string, goal_id string, parent_criteria_id string,"
    " test_type string, test_name string, approval_status string,"
    " run_count int, pass_count int, fail_count int"
)


def tests_table(spark: SparkSession, cases: list[TestCase]) -> DataFrame:
    rows = [
        (
            c.id,
            c.goal_id,
            c.parent_criteria_id,
            c.test_type,
            c.test_name,
            c.approval_status,
            c.run_count,
            c.pass_count,
            c.fail_count,
        )
        for c in cases
    ]
    return spark.createDataFrame(rows, _TESTS_SCHEMA)


def approval_funnel(tests: DataFrame) -> DataFrame:
    """Counts per (goal, approval_status) — the review-queue view."""
    return tests.groupBy("goal_id", "approval_status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def suite_pass_rates(tests: DataFrame) -> DataFrame:
    """Per-(goal, criteria) pass rates over APPROVED tests only (the
    reference never counts unapproved tests)."""
    approved = tests.filter(
        F.col("approval_status").isin(APPROVAL_APPROVED, APPROVAL_MODIFIED)
    )
    return approved.groupBy("goal_id", "parent_criteria_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tests"),
        F.sum("run_count").cast("bigint").alias("runs"),
        F.sum("pass_count").cast("bigint").alias("passes"),
        (
            F.sum("pass_count").cast("double")
            / F.nullif(F.sum("run_count").cast("double"), F.lit(0.0))
        ).alias("pass_rate"),
    )


# ---------------------------------------------------------------------------
# suite persistence (reference testing/test_storage.py:1-261 — file
# CRUD per test; here the suite snapshots through the same versioned
# parquet + atomic pointer protocol every other store in this engine
# uses, so concurrent readers never see a torn suite)
# ---------------------------------------------------------------------------


def save_tests(
    spark: SparkSession, cases: list[TestCase], path: str
) -> int:
    """Publish the suite as a new immutable version; returns it."""
    from ..operators.layout import publish_version

    return publish_version(tests_table(spark, cases), path)


def load_tests(spark: SparkSession, path: str) -> DataFrame:
    """The currently-published suite table (schema _TESTS_SCHEMA)."""
    from ..operators.layout import read_pointer
    import os

    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(f"no test suite published at {path}")
    return spark.read.parquet(os.path.join(path, ptr["path"]))
