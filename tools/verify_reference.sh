#!/usr/bin/env bash
# One-command reference verification (VERDICT r2 next-round #2).
#
# Discharges the "reconstructed from memory" residual: the parity oracle
# (tests/oracle_torch.py) and the hyperparameter table (best_config.sh)
# were written from memory of the upstream code because /root/reference is
# an empty mount and this machine has zero egress. On first contact with
# either a populated mount or a network, run THIS — it acquires the real
# source if needed and runs every check in tools/verify_reference.py,
# writing REFERENCE_VERIFICATION.json.
#
# Usage:
#   tools/verify_reference.sh                  # mount at /root/reference,
#                                              #   else network fetch
#   REFERENCE_DIR=/path tools/verify_reference.sh
#   KGE_REF_URL=https://... tools/verify_reference.sh   # pin a source URL
#   WITH_DATA=1 tools/verify_reference.sh      # also fetch datasets and run
#                                              #   the real-data smoke leg
#
# Exit codes: 0 verified-pass, 1 verified-FAIL (a reconstruction was
# wrong — fix the repo!), 2 nothing verifiable here.
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
REF="${REFERENCE_DIR:-/root/reference}"
URL="${KGE_REF_URL:-https://github.com/kahrabian/KnowledgeGraphEmbedding/archive/refs/heads/master.tar.gz}"
FALLBACK_URL="https://github.com/DeepGraphLearning/KnowledgeGraphEmbedding/archive/refs/heads/master.tar.gz"

if [ ! -f "$REF/codes/model.py" ]; then
  echo "reference mount $REF has no codes/model.py — trying network fetch" >&2
  WORK="$(mktemp -d)"
  trap 'rm -rf "$WORK"' EXIT
  fetched=0
  for u in "$URL" "$FALLBACK_URL"; do
    if curl -fsSL --retry 2 -o "$WORK/ref.tar.gz" "$u" 2>/dev/null \
        || wget -q -O "$WORK/ref.tar.gz" "$u" 2>/dev/null; then
      tar -xzf "$WORK/ref.tar.gz" -C "$WORK"
      inner="$(find "$WORK" -maxdepth 2 -name model.py -path '*/codes/*' | head -1)"
      if [ -n "$inner" ]; then
        REF="$(dirname "$(dirname "$inner")")"
        echo "fetched reference source from $u -> $REF" >&2
        fetched=1
        break
      fi
    fi
  done
  if [ "$fetched" = 0 ]; then
    echo "no populated mount and no network — cannot verify here" >&2
    # Still invoke the driver so the SKIPPED report is written uniformly.
    exec python "$REPO_ROOT/tools/verify_reference.py" --reference "$REF"
  fi
fi

ARGS=(--reference "$REF")
if [ "${WITH_DATA:-0}" = 1 ]; then
  DATA_DIR="${DATA_DIR:-$REPO_ROOT/data}"
  if [ ! -d "$DATA_DIR/FB15k-237" ]; then
    "$REPO_ROOT/tools/fetch_data.sh" "$DATA_DIR"
  fi
  ARGS+=(--data "$DATA_DIR")
fi

exec python "$REPO_ROOT/tools/verify_reference.py" "${ARGS[@]}"
