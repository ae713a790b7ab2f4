#!/usr/bin/env bash
# Environment setup (reference setup_wsl.sh analog, for TPU hosts).
#
# The reference's 8-stage WSL2/CUDA setup (apt deps, venv, torch cu121,
# clone 4 external model repos, download weights) collapses for the native
# framework: there are no external model repos (architectures are built in)
# and weights are trained or converted locally. Stages:
set -euo pipefail

echo "== [1/6] Python check"
python3 - <<'EOF'
import sys
assert sys.version_info >= (3, 10), f"need Python >=3.10, have {sys.version}"
print(f"  Python {sys.version.split()[0]} OK")
EOF

echo "== [2/6] Virtualenv (skipped if already inside one)"
python3 - <<'EOF'
import sys
print("  in venv" if sys.prefix != getattr(sys, "base_prefix", sys.prefix)
      else "  not in a venv (recommended: python3 -m venv .venv && . .venv/bin/activate)")
EOF

echo "== [3/6] Dependencies"
if python3 -c "import jax, flax, optax, cv2, numpy" 2>/dev/null; then
  echo "  core deps present (jax/flax/optax/opencv/numpy)"
else
  echo "  installing..."
  pip install -U "jax[tpu]" flax optax orbax-checkpoint chex einops \
      opencv-python-headless numpy scipy pandas matplotlib pyyaml psutil
fi

echo "== [4/6] Project directories"
mkdir -p data/clips data/processed outputs weights
echo "  data/ outputs/ weights/ ready"

echo "== [5/6] Verification"
python3 verify_setup.py || true

echo "== [6/6] Next steps"
cat <<'EOF'
  1. Register a source clip:   python scripts/register_clip.py clip.mp4 --clip-id my_clip
  2. Extract intervals:        python scripts/extract_intervals.py --clip-id my_clip --count 3 --duration 5
  3. Preprocess triplets:      python scripts/preprocess_video.py clip.mp4
  4. Benchmark:                python benchmark.py -d data/processed -o outputs/benchmarks
  5. Train native weights:     python scripts/train.py --model rife --steps 20000
  6. Process a video:          python process.py --input in.mp4 --output out.mp4 --method adaptive
EOF
