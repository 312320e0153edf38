"""Criteria→test-case surface (state/testcase): approval lifecycle,
stub generation, suite analytics, and the python/Spark categorizer
differential."""

from __future__ import annotations

import pytest

from aden_hive_fork_spark.state.testcase import (
    APPROVAL_MODIFIED,
    APPROVAL_PENDING,
    APPROVAL_REJECTED,
    ApprovalError,
    TestCase,
    TestResult,
    approval_funnel,
    categorize_result,
    criteria_to_testcases,
    fix_suggestion,
    suite_pass_rates,
)
from aden_hive_fork_spark.state.testcase import tests_table as _tests_table


def _case(**kw):
    base = dict(
        id="g::outcome::c1",
        goal_id="g",
        parent_criteria_id="c1",
        test_type="outcome",
        test_name="test_outcome_c1",
        description="d",
    )
    base.update(kw)
    return TestCase(**base)


def test_lifecycle_approve_and_record():
    c = _case()
    assert c.approval_status == APPROVAL_PENDING
    assert not c.is_approved and c.pass_rate is None
    c.approve("alice")
    assert c.is_approved and c.approved_by == "alice"
    c.record_result(True)
    c.record_result(False)
    c.record_result(True)
    assert (c.run_count, c.pass_count, c.fail_count) == (3, 2, 1)
    assert c.pass_rate == pytest.approx(2 / 3)
    assert c.last_result == "passed"


def test_modify_keeps_original_code():
    c = _case(test_code="assert old")
    c.modify("assert new", approved_by="bob")
    assert c.approval_status == APPROVAL_MODIFIED
    assert c.original_code == "assert old"
    assert c.test_code == "assert new"
    c.record_result(True)  # modified counts as approved


def test_unapproved_tests_never_run():
    c = _case()
    with pytest.raises(ApprovalError):
        c.record_result(True)
    c.reject("too vague")
    assert c.approval_status == APPROVAL_REJECTED
    assert c.rejection_reason == "too vague"
    with pytest.raises(ApprovalError):
        c.record_result(True)


def test_criteria_to_testcases_linkage():
    cases = criteria_to_testcases(
        "goal-x",
        success_criteria=[("source-diversity", "many sources")],
        constraints=[("no-hallucination", "corpus only")],
    )
    assert [c.test_type for c in cases] == ["outcome", "constraint"]
    assert cases[0].id == "goal-x::outcome::source-diversity"
    assert cases[0].parent_criteria_id == "source-diversity"
    assert cases[1].test_name == "test_constraint_no_hallucination"
    assert all(c.approval_status == APPROVAL_PENDING for c in cases)


def test_suite_analytics(spark):
    cases = criteria_to_testcases(
        "g", [("c1", "d1"), ("c2", "d2")], [("k1", "d3")]
    )
    cases[0].approve()
    cases[0].record_result(True)
    cases[0].record_result(False)
    cases[1].reject("dup")
    # cases[2] stays pending
    df = _tests_table(spark, cases)
    funnel = {
        (r["goal_id"], r["approval_status"]): r["n"]
        for r in approval_funnel(df).collect()
    }
    assert funnel == {
        ("g", "approved"): 1,
        ("g", "rejected"): 1,
        ("g", "pending"): 1,
    }
    rates = suite_pass_rates(df).collect()
    assert len(rates) == 1  # approved tests only
    assert rates[0]["parent_criteria_id"] == "c1"
    assert rates[0]["pass_rate"] == pytest.approx(0.5)


def test_categorize_result_matches_distributed_classifier(spark):
    """The python single-result path and the Spark column path must
    agree bit-for-bit on category and confidence."""
    from aden_hive_fork_spark.state.categorizer import categorize_errors

    texts = [
        "TypeError: tool call failed in node executor",
        "timeout waiting for upstream response",
        "goal not achieved: success criteria not met",
        "ValueError: unexpected empty result from connector",
        "mysterious failure with no known signature",
        "TypeError after goal not achieved: criteria not met",
    ]
    py = [
        categorize_result(
            TestResult(test_id="t", passed=False, error_message=t)
        )
        for t in texts
    ]
    df = spark.createDataFrame([(t,) for t in texts], "error string")
    dist = {
        r["error"]: (r["category"], r["confidence"])
        for r in categorize_errors(df, "error").collect()
    }
    for t, (cat, conf) in zip(texts, py):
        d_cat, d_conf = dist[t]
        assert d_cat == cat, t
        assert d_conf == pytest.approx(conf, abs=0), t


def test_passed_result_uncategorized():
    cat, conf = categorize_result(TestResult(test_id="t", passed=True))
    assert cat is None and conf == 1.0
    assert "Fix the code" in fix_suggestion("implementation_error")


def test_runtime_logs_feed_categorization():
    r = TestResult(
        test_id="t",
        passed=False,
        error_message="it broke",
        runtime_logs=[
            {"level": "ERROR", "msg": "rate limit exceeded upstream"},
            {"level": "DEBUG", "msg": "TypeError should be ignored"},
        ],
    )
    cat, conf = categorize_result(r)
    assert cat == "edge_case"  # DEBUG line excluded, ERROR line counted


def test_save_and_load_suite_roundtrip(spark, tmp_path):
    from aden_hive_fork_spark.state.testcase import load_tests, save_tests

    cases = criteria_to_testcases("g", [("c1", "d1")], [("k1", "d2")])
    cases[0].approve()
    cases[0].record_result(True)
    path = str(tmp_path / "suite")
    v1 = save_tests(spark, cases, path)
    assert v1 == 0  # first published version
    loaded = {r["id"]: r for r in load_tests(spark, path).collect()}
    assert loaded["g::outcome::c1"]["approval_status"] == "approved"
    assert loaded["g::outcome::c1"]["pass_count"] == 1
    # publishing again versions, never overwrites
    cases[1].reject("dup")
    v2 = save_tests(spark, cases, path)
    assert v2 == v1 + 1
    assert (
        load_tests(spark, path)
        .filter("approval_status = 'rejected'")
        .count()
        == 1
    )


def test_load_without_publish_raises(spark, tmp_path):
    from aden_hive_fork_spark.state.testcase import load_tests

    with pytest.raises(FileNotFoundError):
        load_tests(spark, str(tmp_path / "none"))
