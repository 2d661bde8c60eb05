#!/bin/bash
set -u
cd /root/repo
LOG=${1:-/root/repo/.r5probe5.log}
: > "$LOG"
echo "=== probe5 ===" >> "$LOG"
timeout 3000 python tools/r5probe5.py >> "$LOG" 2>&1
echo "--- rc=$? ---" >> "$LOG"
echo "=== probe4 (instanced parity fixed) ===" >> "$LOG"
timeout 2000 python tools/r5probe4.py >> "$LOG" 2>&1
echo "--- rc=$? ---" >> "$LOG"
echo "=== bench ===" >> "$LOG"
timeout 4000 python bench.py >> "$LOG" 2>&1
echo "--- rc=$? ---" >> "$LOG"
echo ALL_DONE >> "$LOG"
