#!/bin/bash
set -u
cd /root/repo
LOG=${1:-/root/repo/.r5probe4.log}
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  env "${@:2}" timeout 3000 python "$1" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run tools/r5parity.py
run tools/r5probe4.py
echo "=== bench ===" >> "$LOG"
timeout 3000 python bench.py >> "$LOG" 2>&1
echo "--- rc=$? ---" >> "$LOG"
echo ALL_DONE >> "$LOG"
