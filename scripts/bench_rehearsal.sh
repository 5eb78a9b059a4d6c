#!/usr/bin/env bash
# Pre-snapshot process guard (VERDICT r4 next-round #1c).
#
# Simulates the driver's round-end benchmark run from COMMITTED state
# only: clone HEAD into a temp dir (exactly what the driver sees — no
# working-tree files, no local .keycache/.xla_cache beyond what is
# force-added), run `timeout 480 python bench.py`, and require a parsed
# value > 0.  Rounds 2-4 each shipped a broken judged artifact because
# hot-path code landed AFTER the last bench run; the rule this script
# enforces: NO hot-path commit after its last green run.
#
# Usage: scripts/bench_rehearsal.sh   (from the repo root; exit 0 = green)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
TMP="$(mktemp -d /tmp/bench_rehearsal.XXXXXX)"
trap 'rm -rf "$TMP"' EXIT

git -C "$REPO" clone --quiet --no-local --depth 1 "file://$REPO" "$TMP/co" \
  || { echo "REHEARSAL: clone failed"; exit 1; }

cd "$TMP/co"
OUT="$(timeout 480 python bench.py 2>"$TMP/stderr.log")"
RC=$?
echo "--- bench stderr (last 12 lines) ---"
tail -12 "$TMP/stderr.log"
echo "--- bench stdout ---"
echo "$OUT"

LINE="$(echo "$OUT" | grep -E '^\{' | tail -1)"
VALUE="$(python - "$LINE" <<'EOF'
import json, sys
try:
    print(json.loads(sys.argv[1]).get("value", 0.0))
except Exception:
    print(0.0)
EOF
)"
OK="$(python -c "print(1 if float('${VALUE:-0}') > 0 else 0)")"
if [ "$RC" -eq 0 ] && [ "$OK" = "1" ]; then
  echo "REHEARSAL GREEN: value=$VALUE (rc=$RC)"
  exit 0
fi
echo "REHEARSAL RED: rc=$RC value=${VALUE:-none} — do NOT snapshot hot-path changes"
exit 1
