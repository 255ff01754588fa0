"""Physical-plan regression gate: the whole registry's plans stay clean.

Wraps tools/explain_all.py's audit as a test, so an accidental cross join,
a scan that stops pruning columns, or a row-at-a-time Python stage fails
CI the moment it appears instead of waiting for a manual tool run."""

from __future__ import annotations

from tools.explain_all import audit

from tests.conftest import SF_SMALL


def test_no_plan_red_flags(spark):
    flags = audit(spark, SF_SMALL, verbose=False)
    assert flags == []
