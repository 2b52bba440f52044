"""The round-margin audit tool's SQL rewriter (tools/
round_margin_audit.py) — the guard for the guard: widen_rounds must
widen every round(expr, d) exactly once, survive nesting and
case-variants, map AS-aliased columns to their quantum, and leave
single-arg round() untouched; midpoint_margin must measure distance
to the rounding-boundary grid."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.round_margin_audit import midpoint_margin, widen_rounds  # noqa: E402


def test_widen_simple_and_alias_map():
    sql = "SELECT round(avg(x), 6) AS m, round(sum(y), 2) AS s FROM t"
    wide, digits, col_d = widen_rounds(sql)
    assert wide == "SELECT round(avg(x), 12) AS m, round(sum(y), 8) AS s FROM t"
    assert digits == [6, 2]
    assert col_d == {"m": 6, "s": 2}


def test_nested_rounds_preserved_outer_widened():
    """Only the OUTPUT rounding is widened; an interior round is part
    of the value's semantics and must stay untouched — widening it
    would audit a different expression than the one that ships."""
    sql = "SELECT round(round(a / b, 4) * c, 6) AS v FROM t"
    wide, digits, col_d = widen_rounds(sql)
    assert wide == "SELECT round(round(a / b, 4) * c, 12) AS v FROM t"
    assert digits == [6]
    assert col_d == {"v": 6}


def test_widen_ignores_single_arg_round_and_case():
    sql = "SELECT ROUND(x) AS r, Round(y, 3) AS q FROM t"
    wide, digits, col_d = widen_rounds(sql)
    assert digits == [3]
    assert col_d == {"q": 3}
    assert "ROUND(x)" in wide  # untouched


def test_widen_commas_inside_nested_calls():
    sql = "SELECT round(coalesce(a, b), 2) AS z FROM t"
    wide, digits, col_d = widen_rounds(sql)
    assert digits == [2] and col_d == {"z": 2}
    assert wide == "SELECT round(coalesce(a, b), 8) AS z FROM t"


def test_midpoint_margin():
    # d=2: boundaries at k*0.01 + 0.005
    assert midpoint_margin(0.125, 2) < 1e-12  # exactly on a midpoint
    assert abs(midpoint_margin(0.12, 2) - 0.005) < 1e-12  # on the grid
    assert abs(midpoint_margin(-0.125, 2)) < 1e-12  # sign-symmetric
    assert abs(midpoint_margin(3.1204, 2) - 0.0046) < 1e-9
