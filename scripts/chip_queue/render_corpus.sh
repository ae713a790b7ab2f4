#!/bin/bash
cd /root/repo
set -x
nice -n 19 python scripts/make_synthetic_clip.py data/raw/synth_001.mp4 --preset smooth
nice -n 19 python scripts/make_synthetic_clip.py data/raw/synth_hard_001.mp4 --preset hard
nice -n 19 python scripts/make_synthetic_clip.py data/raw/synth_hard_002.mp4 --preset routing
nice -n 19 python scripts/make_synthetic_clip.py data/raw/synth_hard_30fps.mp4 --preset hard --fps 30 --seconds 10
echo RENDER_DONE
