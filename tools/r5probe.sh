#!/bin/bash
# Sequential variant sweep on the TPU (one process at a time; generous
# timeouts because the tunneled compile helper has 8-350s variance).
set -u
cd /root/repo
LOG=${1:-/root/repo/.r5probe.log}
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  env "$@" timeout 2400 python tools/r5probe.py >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run RZ_KSTATS=1
run RZ_DOT=split4
run RZ_DOT=split3
run RZ_DOT=single
run RZ_DOT=split4 RZ_UNROLL=2
echo ALL_DONE >> "$LOG"
