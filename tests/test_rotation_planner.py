"""rotation_planner: pins the window policy (canaries, never-checked,
red-last-time, oldest-verdict fill, deterministic tiebreak) on
synthetic verdict histories, and sanity-checks the real repo state.
"""

from __future__ import annotations

import json

from tools.rotation_planner import CANARIES, WINDOW, latest_verdicts, plan


def _rec(ok=True, err=None, hash_match=True):
    return {
        "rows_match": ok,
        "schema_match": ok,
        "hash_match": hash_match,
        "err": err,
    }


def test_latest_verdict_takes_newest_round(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q1": _rec(ok=True), "q2": _rec(ok=True)})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q1": _rec(ok=False), "q3": _rec(err="boom")})
    )
    v = latest_verdicts(str(tmp_path / "CORRECTNESS_r*.json"))
    assert v["q1"] == (2, False)  # newest round wins
    assert v["q2"] == (1, True)
    assert v["q3"] == (2, False)  # err => not ok


def test_rows_only_check_counts_as_ok(tmp_path):
    (tmp_path / "CORRECTNESS_r04.json").write_text(
        json.dumps({"q": _rec(ok=True, hash_match=None)})
    )
    v = latest_verdicts(str(tmp_path / "CORRECTNESS_r*.json"))
    assert v["q"] == (4, True)


def test_plan_ordering_policy():
    names = [*CANARIES, "new1", "red1", "old2", "old1", "new2", "fresh"]
    verdicts = {
        CANARIES[0]: (5, True),
        CANARIES[1]: (5, True),
        "red1": (5, False),
        "old1": (2, True),
        "old2": (2, True),   # same round as old1 -> registry order breaks tie
        "fresh": (5, True),
    }
    got = plan(names, verdicts)
    assert got == [
        *CANARIES,
        "new1", "new2",       # never-checked, registry order
        "red1",               # red last time
        "old2", "old1",       # oldest verdicts, registry order tiebreak
        "fresh",
    ]


def test_plan_caps_at_window():
    names = [*CANARIES] + [f"q{i}" for i in range(200)]
    got = plan(names, {})
    assert len(got) == WINDOW
    assert got[:2] == CANARIES


def test_real_repo_state_is_consistent():
    v = latest_verdicts()
    assert v["crowded_frames"][1] is True
    proposed = plan_names = None
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.registry import (
        _ALL,
    )

    proposed = plan(list(_ALL), v)
    assert len(proposed) == WINDOW
    # every never-checked registry query must be inside the window
    never = [n for n in _ALL if n not in v]
    assert set(never) <= set(proposed)
