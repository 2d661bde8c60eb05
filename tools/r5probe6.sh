#!/bin/bash
set -u
cd /root/repo
LOG=${1:-/root/repo/.r5probe6.log}
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  env "${@:2}" timeout 3000 python "$1" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run tools/r5probe6.py
run tools/r5probe.py RZ_UNROLL=2
run tools/r5probe.py RZ_UNROLL=4
echo ALL_DONE >> "$LOG"
