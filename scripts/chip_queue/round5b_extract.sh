#!/bin/bash
# CPU chain: interval extraction for the sweep clips (waits for renders).
cd /root/repo
LOG=/tmp/extract_r5.log
while ! grep -q "HARD2_DONE" /tmp/render_r5.log 2>/dev/null; do sleep 60; done
echo "$(date) extract: begins" >> $LOG
restore_unextracted() {
  for c in synth_001 synth_hard_001 synth_hard_002; do
    if [ -d /tmp/old_intervals_$c ] && [ -z "$(ls -A data/clips/$c/intervals 2>/dev/null)" ]; then
      rm -rf data/clips/$c/intervals
      mv /tmp/old_intervals_$c data/clips/$c/intervals
      echo "$(date) extract: restored pre-existing intervals for $c" >> $LOG
    fi
  done
}
trap restore_unextracted EXIT
for c in synth_001 synth_hard_001 synth_hard_002; do
  if [ -d data/clips/$c/intervals ]; then
    mv data/clips/$c/intervals /tmp/old_intervals_$c
    mkdir -p data/clips/$c/intervals
  fi
done
nice -n 10 timeout 3600 python scripts/extract_intervals.py --clip-id synth_001 --start 0 --duration 5 --platform cpu >> $LOG 2>&1
nice -n 10 timeout 3600 python scripts/extract_intervals.py --clip-id synth_001 --start 7 --duration 5 --platform cpu >> $LOG 2>&1
nice -n 10 timeout 3600 python scripts/extract_intervals.py --clip-id synth_001 --start 5 --duration 5 --platform cpu >> $LOG 2>&1
for c in synth_hard_001 synth_hard_002; do
  nice -n 10 timeout 3600 python scripts/extract_intervals.py --clip-id $c --start 0 --duration 5 --platform cpu >> $LOG 2>&1
  nice -n 10 timeout 3600 python scripts/extract_intervals.py --clip-id $c --start 7 --duration 5 --platform cpu >> $LOG 2>&1
done
echo "$(date) EXTRACT_DONE" >> $LOG
