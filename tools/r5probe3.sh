#!/bin/bash
set -u
cd /root/repo
LOG=${1:-/root/repo/.r5probe3.log}
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  env "${@:2}" timeout 2400 python "$1" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run tools/r5parity.py RZ_DOT=ksplit
run tools/r5parity.py RZ_DOT=split4
run tools/r5probe.py RZ_DOT=ksplit RZ_KSTATS=1
run tools/r5probe2.py
echo ALL_DONE >> "$LOG"
