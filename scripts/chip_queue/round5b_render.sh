#!/bin/bash
cd /root/repo
LOG=/tmp/render_r5.log
set -x
nice -n 19 python scripts/make_synthetic_clip.py data/raw/synth_calib.mp4 --preset hard --seed 417 >> $LOG 2>&1 && echo CALIB_HARD_DONE >> $LOG
nice -n 19 python scripts/make_synthetic_clip.py data/raw/synth_calib_routing.mp4 --preset routing --seed 418 >> $LOG 2>&1 && echo CALIB_ROUTING_DONE >> $LOG
nice -n 19 python scripts/make_synthetic_clip.py data/raw/synth_calib_smooth.mp4 --preset smooth --seed 419 >> $LOG 2>&1 && echo CALIB_SMOOTH_DONE >> $LOG
nice -n 19 python scripts/make_synthetic_clip.py data/raw/synth_hard_001.mp4 --preset hard >> $LOG 2>&1 && echo HARD1_DONE >> $LOG
nice -n 19 python scripts/make_synthetic_clip.py data/raw/synth_001.mp4 --preset smooth >> $LOG 2>&1 && echo SMOOTH1_DONE >> $LOG
nice -n 19 timeout 3600 python scripts/preprocess_video.py data/raw/synth_hard_001.mp4 --clip-name synth_hard_001 --input-fps 30 --target-fps 60 --target-resolution 1920x1080 >> $LOG 2>&1 && echo PREP_HARD1_DONE >> $LOG
nice -n 19 timeout 3600 python scripts/preprocess_video.py data/raw/synth_001.mp4 --clip-name synth_001 --input-fps 30 --target-fps 60 --target-resolution 1920x1080 >> $LOG 2>&1 && echo PREP_SMOOTH1_DONE >> $LOG
nice -n 19 python scripts/make_synthetic_clip.py data/raw/synth_hard_002.mp4 --preset routing >> $LOG 2>&1 && echo HARD2_DONE >> $LOG
nice -n 19 python scripts/make_synthetic_clip.py data/raw/synth_hard_30fps.mp4 --preset hard --fps 30 --seconds 10 >> $LOG 2>&1 && echo DEPLOY_CLIP_DONE >> $LOG
echo RENDER_ALL_DONE >> $LOG
