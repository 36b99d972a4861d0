#!/usr/bin/env bash
# Pre-commit guard: the committed tree must COMPILE, tests included.
#
# Round 10 shipped a snapshot whose test tree had four 'not found: value
# lit' errors — the spec gates for a whole DML tier never ran as
# committed. This hook makes that impossible: any commit that stages a
# Scala source runs `sbt Test/compile` (incremental — seconds when the
# tree was just built) and refuses the commit on failure.
#
# Installed as .git/hooks/pre-commit by tools/install-hooks.sh (run once
# per clone; hooks don't travel with the repo). Docs-only commits skip
# the compile. Emergency bypass: GRAFT_SKIP_GUARD=1 git commit ... —
# deliberately loud, never the default.
set -u
if [ "${GRAFT_SKIP_GUARD:-0}" = "1" ]; then
  echo "[pre-commit] GRAFT_SKIP_GUARD=1 — compile guard bypassed" >&2
  exit 0
fi
if git diff --cached --name-only | grep -q '\.scala$\|build\.sbt$'; then
  echo "[pre-commit] Scala sources staged — verifying Test/compile ..." >&2
  if ! sbt -batch Test/compile >/tmp/graft-precommit.log 2>&1; then
    echo "[pre-commit] REFUSING COMMIT: sbt Test/compile failed." >&2
    tail -30 /tmp/graft-precommit.log >&2
    exit 1
  fi
  echo "[pre-commit] Test/compile green." >&2
fi
exit 0
