"""Certification-window registry invariants (no Spark session needed).

The driver certifies exactly the FIRST 50 entries of ``queries()``; these
checks fail the suite loudly if an entry is added without updating the
window lists (the round-3 failure mode: 15 operators shipped twice with
no driver verdict)."""

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_correctness() -> dict:
    paths = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not paths:
        return {}
    with open(paths[-1]) as f:
        return json.load(f)


def test_registry_window_invariants():
    from pyspark_data_quality_spark.entry_queries import (
        _CERT_PRIORITY,
        _CERT_ROTATED,
        ENTRY_QUERIES,
        ORACLE_SQL,
    )

    ks = list(ENTRY_QUERIES)
    # lists are disjoint, known, and duplicate-free
    assert not set(_CERT_PRIORITY) & set(_CERT_ROTATED)
    assert set(_CERT_PRIORITY) <= set(ks)
    assert set(_CERT_ROTATED) <= set(ks)
    assert len(set(_CERT_PRIORITY)) == len(_CERT_PRIORITY)
    assert len(set(_CERT_ROTATED)) == len(_CERT_ROTATED)
    # ordering applied: priority first, rotated last
    assert ks[: len(_CERT_PRIORITY)] == _CERT_PRIORITY
    assert ks[-len(_CERT_ROTATED):] == _CERT_ROTATED
    # every oracle key corresponds to a registered query
    assert set(ORACLE_SQL) <= set(ks)

    # THE invariant: no entry that lacks a driver verdict may sit outside
    # the 50-slot certification window
    latest = _latest_correctness()
    if latest:
        uncertified_outside = [k for k in ks[50:] if k not in latest]
        assert not uncertified_outside, (
            f"entries with no driver verdict are OUTSIDE the certification "
            f"window: {uncertified_outside} — add them to _CERT_PRIORITY "
            f"and rotate multi-green entries out"
        )


def test_registry_bench_line_budget():
    """The compact bench suite line must fit the driver's 2000-char tail
    buffer even at 1-decimal timings (~21 bytes/entry + header)."""
    from pyspark_data_quality_spark.entry_queries import ENTRY_QUERIES

    est = 90 + sum(len(k) + 8 for k in ENTRY_QUERIES)
    assert est < 1990, (
        f"estimated bench line {est} bytes for {len(ENTRY_QUERIES)} entries "
        "— the driver will truncate; trim the suite or shorten names"
    )
