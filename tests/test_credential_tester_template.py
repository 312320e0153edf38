"""Integration test: the reference's credential_tester template on
plans.Pipeline with a fixture prober — account enumeration through
the registry, map-only verification with per-row error envelopes,
and the single-criterion evaluation."""

from __future__ import annotations

import pytest

from aden_hive_fork_spark.sources.accounts import AccountRegistry


@pytest.fixture()
def registry():
    r = AccountRegistry()
    r.register("github", "work", email="dev@x.y")
    r.register("slack", "team", workspace="eng")
    r.register("gmail", "stale", email="old@x.y")
    return r


def _make_factory():
    # NESTED defs pickle by value (the executor-bound-callable rule —
    # a module-level def in a test module pickles by REFERENCE and
    # Python workers can't import test modules)
    def factory():
        def probe(provider: str, account_id: str) -> dict:
            if account_id == "stale":
                return {"error": "401 unauthorized: token expired"}
            if provider == "github":
                return {"data": {"login": "dev", "rate_remaining": 4999}}
            return {"data": {"ok": True}}

        return probe

    return factory


def _run(spark, registry):
    from aden_hive_fork_spark.plans.credential_tester import (
        accounts_df,
        build_credential_tester_pipeline,
    )

    pipe = build_credential_tester_pipeline(_make_factory())
    out = pipe.run(accounts_df(spark, registry))
    return pipe, out["tester"]


def test_verification_envelopes(spark, registry):
    pipe, res = _run(spark, registry)
    rows = {r["account_id"]: r for r in res.collect()}
    assert set(rows) == {"work", "team", "stale"}
    assert rows["work"]["api_call_success"]
    assert "login" in rows["work"]["detail"]
    assert rows["work"]["error"] is None
    assert not rows["stale"]["api_call_success"]
    assert "401" in rows["stale"]["error"]
    assert rows["stale"]["detail"] is None
    assert pipe.last_trace == ["tester"]  # single-node reference shape


def test_prober_exception_becomes_envelope(spark, registry):
    """A prober that RAISES must still yield a per-row error envelope
    — the *_table contract: no task death on one bad credential."""
    from aden_hive_fork_spark.plans.credential_tester import (
        accounts_df,
        verify_accounts_table,
    )

    def factory():
        def probe(provider, account_id):
            if account_id == "team":
                raise ConnectionError("dns failure")
            return {"data": {"ok": True}}

        return probe

    rows = {
        r["account_id"]: r
        for r in verify_accounts_table(
            accounts_df(spark, registry), factory
        ).collect()
    }
    assert not rows["team"]["api_call_success"]
    assert "ConnectionError: dns failure" in rows["team"]["error"]
    assert rows["work"]["api_call_success"]


def test_success_criterion_fraction(spark, registry):
    from aden_hive_fork_spark.plans.credential_tester import (
        evaluate_success_criteria,
    )

    _, res = _run(spark, registry)
    crit = evaluate_success_criteria(res).collect()[0]
    assert crit["criterion_id"] == "api-call-success"
    assert crit["weight"] == 1.0
    assert crit["progress"] == pytest.approx(2 / 3)


def test_goal_metadata_parity():
    from aden_hive_fork_spark.plans.credential_tester import GOAL

    assert GOAL.id == "credential-tester"
    assert len(GOAL.success_criteria) == 1
    assert GOAL.success_criteria[0].weight == 1.0
    assert GOAL.constraints == ()  # reference: empty


def test_empty_registry_yields_empty_result(spark):
    from aden_hive_fork_spark.plans.credential_tester import (
        accounts_df,
        build_credential_tester_pipeline,
    )

    pipe = build_credential_tester_pipeline(_make_factory())
    out = pipe.run(accounts_df(spark, AccountRegistry()))
    assert out["tester"].count() == 0
