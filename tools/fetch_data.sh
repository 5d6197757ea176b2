#!/usr/bin/env bash
# Fetch the reference benchmark datasets into data/ (VERDICT r1 next-item #2).
#
# The reference repository (kahrabian/KnowledgeGraphEmbedding, a fork of
# DeepGraphLearning/KnowledgeGraphEmbedding — the RotatE ICLR'19 code) ships
# the datasets as committed TSVs under data/<NAME>/ in the exact layout this
# framework reads (entities.dict / relations.dict / train|valid|test.txt;
# see data/README.md). This script reproduces that tree on any networked
# machine so every best_config.sh line runs unchanged.
#
# Integrity: the AUTHORITATIVE check is the published per-dataset
# vocabulary/triple count validation below (data/README.md) — a truncated
# download or re-pointed URL fails it loudly. The archive sha256 recorded
# into tools/data.sha256.lock on first fetch is ADVISORY for the default
# branch-archive URLs (refs/heads/master is a moving target: any upstream
# commit — or a GitHub tarball-compression change — legitimately changes
# the hash); a mismatch warns and defers to the count validation. For true
# lockfile semantics pin an immutable commit archive and opt into strict
# mode:
#   KGE_DATA_URL="https://github.com/<owner>/KnowledgeGraphEmbedding/archive/<commit>.tar.gz" \
#   FETCH_STRICT=1 tools/fetch_data.sh
#
# Usage:  tools/fetch_data.sh [DEST_DIR]             (default: <repo>/data)
#         tools/fetch_data.sh --validate-only [DIR]  (no network: check an
#                                                     already-populated tree)

set -euo pipefail

REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
VALIDATE_ONLY=0
if [ "${1:-}" = "--validate-only" ]; then
  VALIDATE_ONLY=1
  shift
fi
DEST="${1:-$REPO_ROOT/data}"
LOCK="$REPO_ROOT/tools/data.sha256.lock"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

# Canonical sources, in preference order: a user-pinned URL (commit
# archives recommended), then the reference fork, then the upstream RotatE
# repository it forked (identical data/ tree).
URLS=(
  ${KGE_DATA_URL:+"$KGE_DATA_URL"}
  "https://github.com/kahrabian/KnowledgeGraphEmbedding/archive/refs/heads/master.tar.gz"
  "https://github.com/DeepGraphLearning/KnowledgeGraphEmbedding/archive/refs/heads/master.tar.gz"
)

if [ "$VALIDATE_ONLY" = 0 ]; then

ARCHIVE="$WORK/kge_reference.tar.gz"
fetched=""
for url in "${URLS[@]}"; do
  echo ">> fetching $url"
  if curl -fL --retry 3 -o "$ARCHIVE" "$url"; then
    fetched="$url"
    break
  fi
  echo "!! fetch failed, trying next source" >&2
done
[ -n "$fetched" ] || { echo "!! all sources failed" >&2; exit 1; }

SHA="$(sha256sum "$ARCHIVE" | cut -d' ' -f1)"
if [ -f "$LOCK" ] && awk -v u="$fetched" '$1==u{f=1}END{exit !f}' "$LOCK"; then
  WANT="$(awk -v u="$fetched" '$1==u{print $2; exit}' "$LOCK")"
  if [ "$SHA" != "$WANT" ]; then
    echo "!! sha256 differs from lockfile for $fetched" >&2
    echo "   locked:  $WANT" >&2
    echo "   fetched: $SHA" >&2
    if [ "${FETCH_STRICT:-0}" = 1 ]; then
      echo "   FETCH_STRICT=1: aborting" >&2
      exit 1
    fi
    echo "   (branch archives move with upstream commits; continuing —" >&2
    echo "    the per-dataset count validation below is authoritative;" >&2
    echo "    update $LOCK to silence, or pin KGE_DATA_URL to a commit" >&2
    echo "    archive with FETCH_STRICT=1 for hard pinning)" >&2
  else
    echo ">> sha256 matches lockfile"
  fi
else
  echo "$fetched $SHA" >> "$LOCK"
  echo ">> recorded sha256 into ${LOCK#$REPO_ROOT/} (commit this)"
fi

echo ">> extracting data/ tree"
tar -xzf "$ARCHIVE" -C "$WORK"
SRC="$(find "$WORK" -maxdepth 2 -type d -name data | head -1)"
[ -n "$SRC" ] || { echo "!! no data/ directory inside archive" >&2; exit 1; }

mkdir -p "$DEST"
cp -r "$SRC"/. "$DEST"/

fi  # VALIDATE_ONLY

# --- published-count validation (data/README.md table) --------------------
# name  entities relations train valid test    ("-" = not pinned: the
# countries S2/S3 splits drop evidence edges and their exact train sizes
# are not in the published table — vocab sizes still checked)
EXPECTED="
FB15k         14951 1345 483142 50000 59071
FB15k-237     14541  237 272115 17535 20466
wn18          40943   18 141442  5000  5000
wn18rr        40943   11  86835  3034  3134
YAGO3-10     123182   37 1079040 5000  5000
countries_S1    271    2   1111    24    24
countries_S2    271    2      -    24    24
countries_S3    271    2      -    24    24
"

status=0
found_any=0
while read -r name ne nr ntr nva nte; do
  [ -z "$name" ] && continue
  d="$DEST/$name"
  [ -d "$d" ] || { echo "-- $name: not in archive (skipped)"; continue; }
  found_any=1
  ok=1
  for spec in "entities.dict:$ne" "relations.dict:$nr" \
              "train.txt:$ntr" "valid.txt:$nva" "test.txt:$nte"; do
    f="${spec%%:*}"; want="${spec##*:}"
    [ "$want" = "-" ] && continue
    got="$(grep -c . "$d/$f" || true)"   # counts non-empty lines, CRLF-safe
    if [ "$got" != "$want" ]; then
      echo "!! $name/$f: $got lines, expected $want" >&2
      ok=0; status=1
    fi
  done
  [ "$ok" = 1 ] && echo "ok $name"
done <<< "$EXPECTED"

[ "$found_any" = 1 ] || { echo "!! archive contained none of the known datasets" >&2; exit 1; }
exit $status
