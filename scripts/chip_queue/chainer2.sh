#!/bin/bash
# Fire stage2 only after BOTH the vfimamba retrain and the corpus regen.
while ! grep -q "stage1b FINISHED" /tmp/queue.log 2>/dev/null; do sleep 120; done
while ! grep -q "REGEN_DONE" /tmp/regen_corpus.log 2>/dev/null; do sleep 120; done
bash /tmp/stage2_sweep.sh
