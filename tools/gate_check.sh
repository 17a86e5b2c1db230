#!/usr/bin/env bash
# One-line GATE_STAMP-vs-tree verdict (round-13 verdict item 4; round-15
# verdict item 1): round 13 shipped with a stale GATE_STAMP because the
# end-of-round snapshot scooped up ungated work, and rounds 12-15 all
# shipped ungated — so as of round 16 a stale or missing stamp EXITS
# NON-ZERO. Any snapshot/automation path that runs this script aborts on
# a stale stamp instead of recording it as archaeology. graft.Verify
# still runs it for the evidence line (Verify ignores the exit code —
# a mid-round Verify against WIP is expected to see a stale stamp).
set -uo pipefail
cd "$(dirname "$0")/.."
h="$({ sha256sum build.sbt
       find src -type f -name '*.scala' -print0 | sort -z | xargs -0 sha256sum
     } | sha256sum | cut -d' ' -f1)"
if [ ! -f GATE_STAMP ]; then
  echo "[gate-check] NO GATE_STAMP (tree=${h:0:12})"
  exit 1
fi
read -r stamp ts mode < GATE_STAMP
if [ "$stamp" = "$h" ]; then
  echo "[gate-check] GATE_STAMP MATCHES tree ${h:0:12} ($ts $mode)"
  exit 0
else
  echo "[gate-check] GATE_STAMP STALE: stamp=${stamp:0:12} tree=${h:0:12} ($ts $mode) — run tools/gate.sh"
  exit 1
fi
