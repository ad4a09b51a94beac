#!/usr/bin/env bash
# Round-start routine — run BEFORE editing anything in a new round:
#
#   1. make_cert_ledger.py   refreshes docs/CERTIFICATION.md AND records
#      the oracle-SQL hashes of entries the newest CORRECTNESS round
#      certified (the content-hash staleness baseline; see
#      docs/CERTIFICATION.md header). Must run before SQL edits so the
#      recorded hashes are the certified ones.
#   2. check_oracle.py       full local gate: every entry vs DuckDB at
#      sf0.01. Certifies that HEAD (not just the driver's 50-slot
#      window) hash-matches. Transcript worth committing per round.
#   3. audit_plans.py --assert   plan gate: fails on row-at-a-time
#      Python UDFs or nested-loop joins outside the documented
#      whitelist.
#
# Then: pytest tests/ -x -q, and bench.py for the perf baseline.
set -euo pipefail
cd "$(dirname "$0")/.."

python scripts/make_cert_ledger.py
python scripts/check_oracle.py
# stdout stays visible: on a gate failure the violating entries must be
# diagnosable from the transcript (set -e aborts right here)
python scripts/audit_plans.py --assert && echo "plan gate: clean"
python scripts/gen_api_index.py
