"""vfisr_tpu — TPU-native Gaming VFI+SR framework.

A ground-up JAX/XLA/Pallas re-design of the Gaming VFI+SR benchmark toolkit
(reference: mykolas-perevicius/Video-Frame-Interpolation-A-Benchmark-Study-
and-Lessons-from-Failed-Novel-Approache). The reference pipeline turns
1080p@30fps gaming footage into 1440p@120fps via frame interpolation (VFI)
plus super-resolution (SR); this package provides the same capabilities as
batched, jit-compiled, HBM-resident tensor programs:

- ``core``       — frame layout/dtype conventions, resize/warp/color kernels
                   (cv2-parity golden-tested).
- ``ops``        — classical vision kernels: Farneback-style dense optical
                   flow, SSIM, Laplacian/Canny-style edges, morphology.
- ``models``     — model zoo behind the reference's ``BaseModel`` contract:
                   traditional baselines, RIFE-style IFNet, SPAN SR,
                   VFIMamba-style SSM, SAFA-style joint model, and the
                   AdaptiveVFI branchless router.
- ``evaluation`` — PSNR/SSIM/LPIPS, temporal-consistency and gaming metrics,
                   motion-difficulty stratification, device-time profiling.
- ``data``       — clip registry, interval extraction, triplet preprocessing.
- ``parallel``   — mesh/sharding helpers for multi-chip scale-out.
- ``pipeline``   — streaming video processing (decode → device → encode).
- ``train``      — pjit'd training/distillation steps for the neural models.

Array conventions (TPU-first):
- Host boundary: numpy ``uint8`` HWC RGB frames (matches reference
  models/base.py:80-110 contract).
- Device: ``float32``/``bfloat16`` NHWC in [0, 1]; batch dimension first;
  static shapes everywhere under jit.
"""

__version__ = "0.1.0"
