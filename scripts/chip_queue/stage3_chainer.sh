#!/bin/bash
while ! grep -q "stage2 FINISHED" /tmp/queue.log 2>/dev/null; do sleep 120; done
bash /tmp/stage3.sh
