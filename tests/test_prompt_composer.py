"""functions/prompt_composer — the three-layer onion prompt:
scalar/column byte-equality, layer dropout, narrative truncation,
accounts grouping/filtering, transition markers."""

from __future__ import annotations

from datetime import datetime, timezone

from aden_hive_fork_spark.functions.prompt_composer import (
    build_accounts_prompt,
    build_narrative,
    build_transition_marker,
    compose_prompt_col,
    compose_system_prompt,
)


def test_all_layers_in_order():
    p = compose_system_prompt(
        "I am the agent.",
        "Focus on reports.",
        narrative="We scoped the project.",
        accounts_prompt="Connected accounts: x",
    )
    i_id = p.index("I am the agent.")
    i_acc = p.index("Connected accounts: x")
    i_nar = p.index("--- Context (what has happened so far) ---")
    i_foc = p.index("--- Current Focus ---")
    assert i_id < i_acc < i_nar < i_foc
    assert "We scoped the project." in p
    assert "Focus on reports." in p


def test_layer_dropout_and_datetime_stamp():
    assert compose_system_prompt(None, None) == ""
    only_focus = compose_system_prompt(None, "do x")
    assert only_focus.startswith("\n--- Current Focus ---\ndo x")
    now = datetime(2026, 3, 2, 14, 30, tzinfo=timezone.utc)
    stamped = compose_system_prompt("id", None, now=now)
    assert stamped.startswith("id\n\nCurrent date and time: 2026-03-02 14:30")
    # empty prompt + stamp -> just the stamp (reference _with_datetime)
    assert compose_system_prompt(None, None, now=now).startswith(
        "Current date and time:"
    )


def test_column_form_matches_scalar(spark):
    rows = [
        ("synthesize findings", "phase 1 done", "acct block"),
        ("", None, None),  # empty focus, no narrative/accounts
        (None, "only narrative", None),
    ]
    df = spark.createDataFrame(
        rows, "focus string, narrative string, accounts string"
    )
    out = df.select(
        compose_prompt_col(
            "I am the agent.", "focus", "narrative", "accounts"
        ).alias("p"),
        "focus",
        "narrative",
        "accounts",
    ).collect()
    for r in out:
        expected = compose_system_prompt(
            "I am the agent.", r["focus"] or None,
            narrative=r["narrative"], accounts_prompt=r["accounts"],
        )
        assert r["p"] == expected, (r["focus"], r["narrative"])


def test_narrative_truncation_and_path():
    mem = {"plan": "x" * 500, "skip": None, "n": 3}
    nar = build_narrative(
        mem, ["intake", "research"], {"intake": "collect the topic"}
    )
    assert "- intake: collect the topic" in nar
    assert "- research" in nar
    assert "x" * 200 + "..." in nar
    assert "x" * 201 not in nar
    assert "skip" not in nar
    assert "- n: 3" in nar
    assert build_narrative({}, []) == ""


def test_accounts_flat_and_grouped():
    accounts = [
        {"provider": "google", "alias": "work",
         "identity": {"email": "w@x.y"}},
        {"provider": "slack", "alias": "team", "identity": {}},
    ]
    flat = build_accounts_prompt(accounts)
    assert "- google/work (email: w@x.y)" in flat
    assert "- slack/team" in flat

    grouped = build_accounts_prompt(
        accounts,
        tool_provider_map={
            "gmail_list": "google",
            "slack_post": "slack",
        },
    )
    assert "google:" in grouped and "slack:" in grouped
    assert "tools: gmail_list" in grouped
    # node filter: only google tools visible to this node
    filtered = build_accounts_prompt(
        accounts,
        tool_provider_map={
            "gmail_list": "google",
            "slack_post": "slack",
        },
        node_tool_names=["gmail_list"],
    )
    assert "google:" in filtered
    assert "slack:" not in filtered
    assert build_accounts_prompt([]) == ""


def test_transition_marker_sections():
    marker = build_transition_marker(
        "research",
        "report",
        {"findings": "y" * 400, "none_key": None},
        ["write_file", "search"],
        node_descriptions={"report": "assemble the cited report"},
        adapt_content="watch for dup sources",
    )
    assert marker.startswith("--- PHASE TRANSITION: research → report ---")
    assert "Completed: research" in marker
    assert "y" * 300 + "..." in marker
    assert "none_key" not in marker
    assert "Available tools: search, write_file" in marker  # sorted
    assert "Now entering: report" in marker
    assert "  assemble the cited report" in marker
    assert "--- Agent Memory ---\nwatch for dup sources" in marker
    assert marker.endswith("--- END TRANSITION ---")
