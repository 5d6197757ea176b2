#!/usr/bin/env bash
# Pre-commit fast suite (VERDICT r4 next-round #7).
#
# Two end-of-round r4 commits shipped without running any tests and left
# a 2-minute-catchable failure at HEAD (stale run_torch unpacks). This
# script is the habit encoded: run it before EVERY commit.
#
#   tools/precommit.sh            # fast targeted set (~2 min)
#   tools/precommit.sh --full     # the whole non-slow suite (~6-9 min)
#   tools/precommit.sh tests/test_foo.py ...   # the named files + the
#                                 # always-on tooling/CLI core
#
# The fast set = the tooling tests (guard the parity-harness caches), the
# CLI surface, and the pure-math cores — the areas end-of-round commits
# historically touch. It is NOT a substitute for the full suite in CI;
# it is the floor below which no commit should ship.
set -euo pipefail
cd "$(dirname "$0")/.."

FAST=(
  tests/test_full_shape_tooling.py
  tests/test_cli.py
  tests/test_scorers.py
  tests/test_loss.py
  tests/test_optim.py
  tests/test_checkpoint.py
  tests/test_eval_rank.py
)

if [[ "${1:-}" == "--full" ]]; then
  exec python -m pytest tests/ -q -m "not slow"
fi

extra=("$@")
exec python -m pytest "${FAST[@]}" "${extra[@]}" -q
