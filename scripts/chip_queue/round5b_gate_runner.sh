#!/bin/bash
# Sequential gate runner: processes lines of /tmp/gates_todo (each line =
# artifact paths for one gate_suite invocation). Stops when /tmp/gates_stop
# exists and all lines are processed.
cd /root/repo
LOG=/tmp/queue.log
TODO=/tmp/gates_todo
DONE_N=0
touch $TODO
while true; do
  TOTAL=$(wc -l < $TODO)
  if [ "$DONE_N" -lt "$TOTAL" ]; then
    DONE_N=$((DONE_N+1))
    LINE=$(sed -n "${DONE_N}p" $TODO)
    echo "$(date) gate_runner: gating [$LINE]" >> $LOG
    bash scripts/chip_queue/gate_suite.sh $LOG $LINE
    echo "$(date) gate_runner: gate [$LINE] rc=$?" >> $LOG
  else
    [ -f /tmp/gates_stop ] && break
    sleep 30
  fi
done
echo "$(date) gate_runner: finished" >> $LOG
