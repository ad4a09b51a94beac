"""Regenerate docs/CERTIFICATION.md from the registry + CORRECTNESS_r*.json.

The window order itself is COMPUTED at import (entry_queries: never-
certified first, then stalest-first) — this script just renders the
resulting schedule. Run after adding entries or when the driver writes
a new CORRECTNESS file:  python scripts/make_cert_ledger.py
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
)


def main() -> None:
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
        "(`entry_queries._apply_cert_order`): never-certified entries first,",
        "then certified entries stalest-first, so re-certification rotates",
        "automatically as the driver writes each round's CORRECTNESS file.",
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


if __name__ == "__main__":
    main()
