"""Certification-window registry invariants (no Spark session needed).

The driver certifies exactly the FIRST 50 entries of ``queries()``; these
checks fail the suite loudly if an entry is added without updating the
window lists (the round-3 failure mode: 15 operators shipped twice with
no driver verdict).

Round-5 fix: the window invariant unions driver verdicts across ALL
``CORRECTNESS_r*.json`` files. The round-4 form checked only the latest
file, which conflated "no verdict in the latest round" with "no verdict
ever" — deliberately-rotated double-green entries flipped the suite red
the moment the driver wrote a new round file. An entry with any prior
verdict may legally sit outside the window; staleness (no verdict in the
last 2 rounds) is a warning, not a failure."""

import glob
import json
import os
import re
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _correctness_files() -> list[tuple[int, dict]]:
    """(round_number, verdicts) for every CORRECTNESS_r*.json, ascending."""
    out = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            out.append((int(m.group(1)), json.load(f)))
    return out


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

    rounds = _correctness_files()
    if not rounds:
        return

    # THE invariant: no entry that has NEVER received a driver verdict (in
    # any round) may sit outside the 50-slot certification window.
    ever_certified: set[str] = set()
    for _, verdicts in rounds:
        ever_certified |= set(verdicts)
    uncertified_outside = [k for k in ks[50:] if k not in ever_certified]
    assert not uncertified_outside, (
        f"entries with no driver verdict in ANY round are OUTSIDE the "
        f"certification window: {uncertified_outside} — add them to "
        f"_CERT_PRIORITY and rotate multi-green entries out"
    )

    # Advisory (non-fatal): a certified entry whose LATEST verdict is >=2
    # rounds old is going stale — rotate it back into slots 1-50 soon.
    # (Never-certified entries inside the window are about to get their
    # first verdict; never-certified outside it already hard-failed above.)
    latest_round = rounds[-1][0]
    last_seen = {}
    for rnum, verdicts in rounds:
        for k in verdicts:
            last_seen[k] = rnum
    stale = sorted(
        k for k in ks
        if k in last_seen and last_seen[k] <= latest_round - 2
    )
    if stale:
        warnings.warn(
            f"{len(stale)} entries have no driver verdict in the last 2 "
            f"rounds (stale certification): {stale}",
            stacklevel=1,
        )


def test_registry_bench_line_budget():
    """The compact bench suite line must fit the driver's 2000-char tail
    buffer WHOLE with >300 chars of headroom. Measure the actual line
    bench.py would emit (worst-case timing widths) rather than an
    estimate."""
    from bench import suite_line
    from pyspark_data_quality_spark.entry_queries import ENTRY_QUERIES

    # worst-case 1-dp timing renders as 99.9 (4 chars; a single query
    # sustained at 100+ s would already blow the driver's round budget,
    # so wider timings are unreachable). The real r4 suite averaged ~1 s
    # per query (3-char timings), so the emitted line runs ~160 chars
    # shorter than this bound.
    timings = {k: 99.9 for k in ENTRY_QUERIES}
    line = suite_line(8291.7, timings, sf=0.1)
    # bounded BY CONSTRUCTION: suite_line truncates the per-query map
    # (slowest-first retention) before it can overflow the driver's
    # ~2000-char tail buffer, whatever the entry count.
    assert len(line) <= 1900, f"suite line {len(line)} chars > 1900 budget"
    parsed = json.loads(line)
    assert parsed["n"] == len(ENTRY_QUERIES)  # n covers the FULL suite
    assert parsed["metric"] == "dq_suite_seconds"

    # at REALISTIC widths (r4 averaged ~1 s/query) the full map must fit
    # untruncated — if this trips, entry names have grown too fat and
    # per-query visibility is being lost to truncation.
    realistic = suite_line(83.0, {k: 1.0 for k in ENTRY_QUERIES}, sf=0.1)
    assert "dropped" not in json.loads(realistic), (
        f"even ~1 s/query timings overflow the stdout line for "
        f"{len(ENTRY_QUERIES)} entries — shorten new entry names"
    )

    # truncation path: absurd entry volume still yields a parseable line
    # with the slowest queries retained.
    big = {f"dq_entry_{i:03d}": float(i % 50) for i in range(400)}
    tline = suite_line(9999.0, big, sf=0.1)
    tparsed = json.loads(tline)
    assert len(tline) <= 1900
    assert tparsed["n"] == 400 and tparsed["dropped"] > 0
    kept = tparsed["queries"]
    dropped_vals = [round(v, 1) for k, v in big.items()
                    if (k[3:] if k.startswith("dq_") else k) not in kept]
    # slowest retained, fastest dropped (ties may straddle the cut)
    assert min(kept.values()) >= max(dropped_vals)
