"""Regenerate docs/CERTIFICATION.md from the registry + CORRECTNESS_r*.json,
and refresh docs/oracle_sql_hashes.json (the content-hash baseline that
lets `_apply_cert_order` detect oracle-SQL edits and force re-certification).

The window order itself is COMPUTED at import (entry_queries: never-
certified first, then content-stale, then stalest-first) — this script
just renders the resulting schedule and maintains the hash snapshot.
RUN AT ROUND START, before editing any oracle SQL: entries certified in
the newest CORRECTNESS round were certified against the code as it stood
then, so their CURRENT hashes are the certified hashes. (Seeding all
entries is only correct immediately after a full local oracle gate —
pass --seed-all then.) At ROUND END, after oracle edits, pass
--render-only: it regenerates the schedule without refreshing hashes,
so edited-after-cert entries stay flagged into the next round's window.
python scripts/make_cert_ledger.py [--seed-all | --render-only]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark_data_quality_spark.entry_queries import (  # noqa: E402
    ENTRY_QUERIES,
    ORACLE_SQL,
    oracle_sql_hash,
)


def refresh_hash_snapshot(latest_round: dict | None, seed_all: bool) -> int:
    """Update docs/oracle_sql_hashes.json. With ``seed_all`` (only valid
    right after a full local oracle-gate run) every oracle entry's current
    hash is recorded as certified; otherwise only entries the newest
    CORRECTNESS round actually certified (hash_match true) are refreshed —
    entries outside that window keep their previously recorded hash, so a
    mid-rotation SQL edit keeps flagging them stale until re-certified.
    Returns the number of entries updated."""
    path = os.path.join(REPO, "docs", "oracle_sql_hashes.json")
    try:
        with open(path) as f:
            snap = json.load(f)
    except (OSError, ValueError):
        snap = {}
    updated = 0
    for k, sql in ORACLE_SQL.items():
        certify = seed_all or (
            latest_round is not None
            and latest_round.get(k, {}).get("hash_match") is True
        )
        if certify:
            h = oracle_sql_hash(sql)
            if snap.get(k) != h:
                snap[k] = h
                updated += 1
    # entries deleted from the registry drop out of the snapshot
    snap = {k: v for k, v in snap.items() if k in ORACLE_SQL}
    with open(path, "w") as f:
        json.dump(dict(sorted(snap.items())), f, indent=1)
        f.write("\n")
    return updated


def main() -> None:
    # flag validation FIRST: an invalid invocation must not have already
    # rewritten the ledger file by the time it errors out
    flags = set(sys.argv[1:])
    unknown = flags - {"--seed-all", "--render-only"}
    if unknown:
        raise SystemExit(
            f"make_cert_ledger: unknown flag(s) {sorted(unknown)} "
            "(valid: --seed-all, --render-only)"
        )
    if "--render-only" in flags and "--seed-all" in flags:
        raise SystemExit(
            "make_cert_ledger: --seed-all and --render-only are mutually "
            "exclusive (seed blesses every current hash, render-only "
            "touches none) — pick the one that matches where you are in "
            "the round"
        )

    rounds: list[tuple[int, dict]] = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rounds.append((int(m.group(1)), json.load(f)))

    def stat(k: str, r: dict) -> str:
        if k not in r:
            return "—"
        v = r[k]
        if v.get("hash_match"):
            return "pass"
        if v.get("err") == "no_oracle":
            return "rows-only"
        return "FAIL"

    ks = list(ENTRY_QUERIES)
    hdr = " | ".join(f"r{n:02d}" for n, _ in rounds)
    sep = "|".join("---" for _ in rounds)
    lines = [
        "# Certification ledger",
        "",
        "The driver's correctness harness certifies exactly the FIRST 50",
        "entries of `queries()` per round. With more entries than slots, the",
        "registry order is COMPUTED at import from the verdict files",
        "(`entry_queries._apply_cert_order`): never-certified entries first",
        "(including entries whose oracle SQL hash no longer matches",
        "docs/oracle_sql_hashes.json — their recorded verdict certifies",
        "different semantics), then certified entries stalest-first, so",
        "re-certification rotates automatically as the driver writes each",
        "round's CORRECTNESS file.",
        "This table is the audit trail — per entry: oracle kind,",
        "driver verdicts so far, and its current window position. Locally,",
        "`scripts/check_oracle.py` runs ALL entries every round regardless of",
        "window position. Regenerate with `python scripts/make_cert_ledger.py`.",
        "",
        f"| # | entry | oracle | {hdr} | window |",
        f"|---|---|---|{sep}|---|",
    ]
    for i, k in enumerate(ks, 1):
        o = "sql" if k in ORACLE_SQL else "rows-only"
        w = "certify" if i <= 50 else "rotated out"
        cells = " | ".join(stat(k, r) for _, r in rounds)
        lines.append(f"| {i} | {k} | {o} | {cells} | {w} |")
    lines += [
        "",
        "Rotation rule: every entry with NO driver verdict occupies the",
        "window; entries rotated out hold consecutive green verdicts on code",
        "paths untouched in the current round.",
    ]
    out = os.path.join(REPO, "docs", "CERTIFICATION.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(ks)} entries, {len(rounds)} recorded rounds")

    if "--render-only" in sys.argv[1:]:
        # round-END mode: regenerate the schedule WITHOUT touching the
        # hash snapshot. A non-seed refresh here would bless oracle SQL
        # edited AFTER the driver's round-start certification (the cert
        # was for the pre-edit SQL), silently un-flagging entries that
        # must re-enter the window — the r11 dq_vclust near-miss.
        print("oracle_sql_hashes.json: unchanged (--render-only)")
        return
    latest = rounds[-1][1] if rounds else None
    n_upd = refresh_hash_snapshot(latest, "--seed-all" in sys.argv[1:])
    print(f"oracle_sql_hashes.json: {n_upd} entries refreshed")


if __name__ == "__main__":
    main()
