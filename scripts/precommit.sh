#!/usr/bin/env bash
# Structural snapshot gate.
#
# Rounds 3/5/7 shipped snapshot commits whose new queries no gate ever
# saw; round 8 escalated to a snapshot that did not COMPILE, zeroing the
# round's entire driver-side correctness record (BENCH_r08 rc=1,
# CORRECTNESS_r08 = {}). In-suite guards (RegistryCoverageSpec) cannot
# catch that failure mode because they run downstream of `sbt compile`.
# This script is the gate that runs UPSTREAM of the commit itself:
#
#   1. Test/compile           — main + test sources must build
#   2. RegistryCoverageSpec   — rows-only query gates + doc-rot pins
#                               (pure JVM, no SparkSession, seconds)
#
# Installed as .git/hooks/pre-commit (commits touching only non-code
# files skip the sbt run, so doc/evidence commits stay instant). The
# end-of-round snapshot MUST pass through this hook — a commit that
# fails here would have produced zero round evidence anyway; refusing
# it keeps HEAD at the last state the gates actually saw.
#
# Full-gate reminder (not run here, too slow for a hook — see
# .claude/skills/verify/SKILL.md): graft.Verify sf0.01 + selfcheck.py
# + sbt test + graft.Bench.
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"

# Doc-only commits (evidence files, markdown) don't need a build.
if git rev-parse --verify HEAD >/dev/null 2>&1; then
  staged=$(git diff --cached --name-only HEAD)
else
  staged=$(git diff --cached --name-only)
fi
if ! grep -qE '\.(scala|sbt)$|^project/' <<< "$staged"; then
  echo "[precommit] no Scala/build changes staged — skipping build gate"
  exit 0
fi

if ! command -v sbt >/dev/null 2>&1; then
  echo "[precommit] WARNING: sbt not on PATH — cannot verify, refusing commit" >&2
  exit 1
fi

echo "[precommit] Test/compile + RegistryCoverageSpec …"
sbt -batch "Test/compile" "testOnly graft.RegistryCoverageSpec" >/tmp/precommit.log 2>&1 || {
  echo "[precommit] FAILED — commit refused. Tail of /tmp/precommit.log:" >&2
  tail -n 25 /tmp/precommit.log >&2
  exit 1
}
grep -E 'Tests: succeeded' /tmp/precommit.log | tail -1
echo "[precommit] green — commit allowed"
