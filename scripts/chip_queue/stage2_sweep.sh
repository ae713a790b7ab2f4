#!/bin/bash
# Stage 2: re-run the sweep corpus on the real chip (after vfimamba training).
#   a) synth_hard_001 priority methods (concordance set) on intervals 0,1
#   b) synth_001 adaptive rows refreshed with the trained heavy expert
#   c) synth_001 stale optical_flow_*/uafi rows refreshed (post-e9941ef code)
#   d) synth_hard_001 remaining methods (full corpus breadth)
# Each phase under its own timeout; --resume/--replace make crashes cheap.
cd /root/repo
LOG=/tmp/queue.log
echo "$(date) stage2: sweep begins" >> $LOG

echo "$(date) stage2-gate: vfimamba checkpoint gate" >> $LOG
mkdir -p outputs/train_r3
timeout 3600 python scripts/gate_checkpoint.py --candidate vfimamba \
  --incumbent vfimamba_s --weights weights/vfimamba.npz \
  --demote-to weights/vfimamba_partial.npz \
  --record outputs/train_r3/gate_vfimamba.json >> $LOG 2>&1
echo "$(date) stage2-gate done rc=$?" >> $LOG
timeout 3600 python scripts/eval_vfi_quality.py \
  --models vfimamba,vfimamba_s,rife,lanczos \
  > outputs/train_r3/eval_vfimamba.txt 2>&1

echo "$(date) stage2a: synth_hard priority" >> $LOG
timeout 10800 python scripts/run_experiments.py --clip synth_hard_001 \
  --intervals 0,1 --heavy --resume \
  --experiment degraded,bicubic_blend,lanczos_blend,optical_flow_basic,uafi_default,ughi_default,rife_default,adaptive_default,adaptive_aggressive,mcar_default \
  >> outputs/sweep_r3.log 2>&1
echo "$(date) stage2a done rc=$?" >> $LOG

echo "$(date) stage2a2: synth_hard_002 routing-corpus keystone" >> $LOG
if [ -d data/clips/synth_hard_002/intervals/interval_0000 ]; then
  timeout 10800 python scripts/run_experiments.py --clip synth_hard_002 \
    --intervals 0,1 --heavy --resume \
    --experiment degraded,bicubic_blend,lanczos_blend,optical_flow_basic,uafi_default,ughi_default,rife_default,adaptive_default,adaptive_aggressive,mcar_default \
    >> outputs/sweep_r3.log 2>&1
  echo "$(date) stage2a2 done rc=$?" >> $LOG
else
  echo "$(date) stage2a2 SKIPPED (synth_hard_002 not extracted)" >> $LOG
fi

echo "$(date) stage2b: synth_001 adaptive refresh" >> $LOG
timeout 7200 python scripts/run_experiments.py --clip synth_001 \
  --intervals 0,1,2 --heavy --replace \
  --experiment adaptive_conservative,adaptive_default,adaptive_aggressive \
  >> outputs/sweep_r3.log 2>&1
echo "$(date) stage2b done rc=$?" >> $LOG

echo "$(date) stage2c: synth_001 stale optical_flow/uafi refresh" >> $LOG
timeout 7200 python scripts/run_experiments.py --clip synth_001 \
  --intervals 0,1 --replace \
  --experiment optical_flow_basic,optical_flow_edge,optical_flow_sharp,uafi_default \
  >> outputs/sweep_r3.log 2>&1
echo "$(date) stage2c done rc=$?" >> $LOG

echo "$(date) stage2d: synth_hard remaining breadth" >> $LOG
timeout 10800 python scripts/run_experiments.py --clip synth_hard_001 \
  --intervals 0,1 --heavy --resume \
  --experiment control,lanczos_blend_edge,lanczos_blend_sharp,bicubic_blend_edge,optical_flow_edge,optical_flow_sharp,rife_fast,adaptive_conservative,mcar_aggressive \
  >> outputs/sweep_r3.log 2>&1
echo "$(date) stage2d done rc=$?" >> $LOG

echo "$(date) stage2e: analysis-layer regeneration" >> $LOG
timeout 1800 python scripts/generate_comprehensive_report.py >> $LOG 2>&1
timeout 1800 python scripts/generate_comprehensive_report.py \
  --results outputs/cpu_fallback/experiment_results.json \
  --output-dir outputs/cpu_fallback \
  --note "Rows measured on the CPU path during the round-3 TPU-tunnel outage; quality numbers comparable, times are not." >> $LOG 2>&1
timeout 1800 python scripts/compare_baseline.py >> $LOG 2>&1
timeout 1800 python scripts/generate_figures.py >> $LOG 2>&1 || true
timeout 1800 python scripts/analyze_results.py >> $LOG 2>&1 || true
echo "$(date) stage2e done rc=$?" >> $LOG
echo "$(date) stage2 FINISHED" >> $LOG
