#!/bin/bash
# Fast-suite gate for queue stages (round-4 verdict Weak #1: an artifact
# contradicting a pinned test landed in the end-of-round snapshot because
# nothing ran even the fast suite).
#
# Usage: gate_suite.sh <queue-logfile> [artifact-path ...]
#
# Runs `pytest -m "not slow"`; on RED, appends the failure tail to the
# queue log and `git checkout --` reverts the listed artifact paths so a
# contradicting measurement cannot be committed silently. Exit 0 = green.
cd /root/repo || exit 2
LOG="${1:-/tmp/queue.log}"
if timeout 4200 python -m pytest tests/ -m "not slow" -x -q \
    > /tmp/gate_suite.log 2>&1; then
  echo "$(date) gate_suite: GREEN" >> "$LOG"
  exit 0
fi
echo "$(date) gate_suite: RED — reverting: ${*:2}" >> "$LOG"
tail -30 /tmp/gate_suite.log >> "$LOG"
if [ $# -gt 1 ]; then
  git -C /root/repo checkout -- "${@:2}" 2>> "$LOG"
fi
exit 1
