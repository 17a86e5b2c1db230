#!/usr/bin/env bash
# One-line GATE_STAMP-vs-tree verdict (round-13 verdict item 4): round 13
# shipped with a stale GATE_STAMP because the end-of-round snapshot scooped
# up ungated work, and the mismatch was only found by judge archaeology.
# graft.Verify runs this at the end of every dump, so the stamp status is a
# visible line in the driver's round artifacts. Exit code is always 0 — the
# line is evidence, not a gate (the pre-commit hook is the gate).
set -uo pipefail
cd "$(dirname "$0")/.."
h="$({ sha256sum build.sbt
       find src -type f -name '*.scala' -print0 | sort -z | xargs -0 sha256sum
     } | sha256sum | cut -d' ' -f1)"
if [ ! -f GATE_STAMP ]; then
  echo "[gate-check] NO GATE_STAMP (tree=${h:0:12})"
  exit 0
fi
read -r stamp ts mode < GATE_STAMP
if [ "$stamp" = "$h" ]; then
  echo "[gate-check] GATE_STAMP MATCHES tree ${h:0:12} ($ts $mode)"
else
  echo "[gate-check] GATE_STAMP STALE: stamp=${stamp:0:12} tree=${h:0:12} ($ts $mode) — run tools/gate.sh"
fi
