#!/usr/bin/env bash
# Compile guard (round-15 lesson): a commit must never land a tree that
# does not compile — the round-15 end-of-round snapshot did, and the
# driver's bench/verify gate scored the whole round 0/80 over one
# missing import. Installed as .git/hooks/pre-commit (see below); also
# callable directly before any snapshot step.
#
#   ln -sf ../../scripts/precommit.sh .git/hooks/pre-commit
#
# Compiles BOTH main and test sources (incremental — seconds when the
# tree is clean). Exits non-zero, blocking the commit, on any error.
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
echo "[precommit] sbt compile + Test/compile on the exact tree being committed..."
sbt -batch compile Test/compile > /tmp/graft_precommit.log 2>&1 || {
  echo "[precommit] COMPILE FAILED — commit blocked. Tail of log:" >&2
  tail -30 /tmp/graft_precommit.log >&2
  exit 1
}
echo "[precommit] compile green."
