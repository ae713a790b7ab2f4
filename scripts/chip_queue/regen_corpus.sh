#!/bin/bash
# Regenerate interval frames + processed triplets after renders finish and
# bench.py is done on the chip (markers in /tmp/render_corpus.log, /tmp/queue.log).
cd /root/repo
LOG=/tmp/regen_corpus.log
while ! grep -q "RENDER_DONE" /tmp/render_corpus.log 2>/dev/null; do sleep 60; done
while ! grep -q "starting vfimamba full training\|bench rc=" /tmp/queue.log 2>/dev/null; do sleep 60; done
echo "$(date) regen: extraction begins" >> $LOG

# Committed interval dirs hold meta.json only (frames were not carried over);
# move them aside so re-extraction recreates the same ids in order.
# A trap restores any moved dir that extraction failed to repopulate, so a
# timed-out run can never leave data/clips/*/intervals stripped.
restore_unextracted() {
  for c in synth_001 synth_hard_001 synth_hard_002; do
    if [ -d /tmp/old_intervals_$c ] && [ -z "$(ls -A data/clips/$c/intervals 2>/dev/null)" ]; then
      rm -rf data/clips/$c/intervals
      mv /tmp/old_intervals_$c data/clips/$c/intervals
      echo "$(date) regen: restored pre-existing intervals for $c (extraction failed)" >> $LOG
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

set -x
# synth_001: intervals 0000@0s, 0001@7s, 0002@5s (duration 5)
nice -n 10 timeout 3600 python scripts/extract_intervals.py --clip-id synth_001 --start 0 --duration 5 --platform cpu >> $LOG 2>&1
nice -n 10 timeout 3600 python scripts/extract_intervals.py --clip-id synth_001 --start 7 --duration 5 --platform cpu >> $LOG 2>&1
nice -n 10 timeout 3600 python scripts/extract_intervals.py --clip-id synth_001 --start 5 --duration 5 --platform cpu >> $LOG 2>&1
# hard clips: 0000@0s, 0001@7s
for c in synth_hard_001 synth_hard_002; do
  nice -n 10 timeout 3600 python scripts/extract_intervals.py --clip-id $c --start 0 --duration 5 --platform cpu >> $LOG 2>&1
  nice -n 10 timeout 3600 python scripts/extract_intervals.py --clip-id $c --start 7 --duration 5 --platform cpu >> $LOG 2>&1
done
set +x
echo "$(date) regen: extraction done" >> $LOG

# processed triplet data (benchmark.py harness): 60fps source -> 30fps input + 60fps GT
nice -n 10 timeout 3600 python scripts/preprocess_video.py data/raw/synth_001.mp4 --clip-name synth_001 \
  --input-fps 30 --target-fps 60 --target-resolution 1920x1080 >> $LOG 2>&1
nice -n 10 timeout 3600 python scripts/preprocess_video.py data/raw/synth_hard_001.mp4 --clip-name synth_hard_001 \
  --input-fps 30 --target-fps 60 --target-resolution 1920x1080 >> $LOG 2>&1
echo "$(date) REGEN_DONE" >> $LOG
