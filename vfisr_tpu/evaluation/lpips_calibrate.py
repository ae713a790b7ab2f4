"""Calibrate LPIPS linear heads without the official weights.

The official LPIPS v0.1 heads are trained on human 2AFC judgments
(reference uses them via pyiqa/lpips, evaluation/metrics.py:129-159);
this environment has zero egress, so those weights cannot exist here.
Random-feature LPIPS (He-init AlexNet + uniform heads) is a documented
proxy, but its heads are uncalibrated — VERDICT r2 task 6 asks for heads
that are *learned*, with pinned evidence that the resulting metric
rank-orders distortions sensibly.

Method (the 2AFC recipe with synthetic supervision):

1. Base patches come from the synthetic gaming world (detail textures,
   gradients, noise — the content domain this repo benchmarks).
2. Each patch is distorted by 7 families at 5 severities: gaussian blur,
   gaussian noise, down-up resampling, ghost blending (the VFI failure
   mode), elastic warp error, quantization, contrast shift.
3. Ranking pairs:
   - WITHIN-FAMILY: stronger severity is farther from the reference
     (unambiguous ground truth by construction).
   - CROSS-FAMILY: only where PSNR and SSIM *agree with margin* on the
     ordering (ΔPSNR > 1 dB and ΔSSIM > 0.01) — the metric-consensus
     supervision suggested by the round-2 verdict. Disagreements are
     dropped (that is exactly where human data would be needed).
4. Heads w_i = softplus(θ_i) (non-negative, like the official clamped
   heads) minimize a logistic ranking loss on D(ref, far) − D(ref, near).

The learned heads ship as ``weights/lpips_heads.npz``; LPIPS reports
``lpips_mode='calibrated_heads'`` so rows are never conflated with
official-weight LPIPS. Validation (pinned in tests/test_lpips_calibration):
held-out 2AFC accuracy and within-family Spearman monotonicity.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfisr_tpu.evaluation.lpips import LPIPS

PATCH = 64
FAMILIES = ("blur", "noise", "downup", "ghost", "warp", "quant", "contrast")
SEVERITIES = (1, 2, 3, 4, 5)


# ---------------------------------------------------------------------------
# Base patches: synthetic gaming-domain content
# ---------------------------------------------------------------------------

def make_base_patches(rng: np.random.Generator, n: int) -> np.ndarray:
    """[n, PATCH, PATCH, 3] float32 in [0,1]: textures/edges/gradients."""
    import cv2

    out = np.empty((n, PATCH, PATCH, 3), np.float32)
    for i in range(n):
        kind = i % 4
        if kind == 0:  # smooth multi-scale texture
            small = rng.random((PATCH // 8, PATCH // 8, 3)).astype(np.float32)
            img = cv2.resize(small, (PATCH, PATCH), interpolation=cv2.INTER_CUBIC)
        elif kind == 1:  # hard-edged panels + glyph (game HUD / signage)
            img = np.full((PATCH, PATCH, 3), rng.random(3), np.float32)
            u8 = (img * 255).astype(np.uint8)
            for _ in range(4):
                p0 = rng.integers(0, PATCH, 2)
                p1 = rng.integers(0, PATCH, 2)
                col = tuple(int(c) for c in rng.integers(0, 255, 3))
                cv2.rectangle(u8, tuple(p0), tuple(p1), col, -1)
            cv2.putText(u8, "A7", (8, PATCH - 8), cv2.FONT_HERSHEY_SIMPLEX,
                        0.8, (255, 255, 255), 1)
            img = u8.astype(np.float32) / 255.0
        elif kind == 2:  # fine detail: speckle over gradient
            gy = np.linspace(0, 1, PATCH, dtype=np.float32)
            img = np.stack([np.tile(gy[:, None], (1, PATCH))] * 3, axis=-1)
            img = img * rng.random(3)[None, None]
            speck = rng.random((PATCH, PATCH)) > 0.95
            img[speck] = rng.random((int(speck.sum()), 3))
        else:  # band-limited noise (mid frequency)
            small = rng.random((PATCH // 2, PATCH // 2, 3)).astype(np.float32)
            img = cv2.resize(small, (PATCH, PATCH), interpolation=cv2.INTER_LINEAR)
        out[i] = np.clip(img, 0.0, 1.0)
    return out


# ---------------------------------------------------------------------------
# Distortions (severity 1..5)
# ---------------------------------------------------------------------------

def distort(img: np.ndarray, family: str, severity: int,
            rng: np.random.Generator) -> np.ndarray:
    """Apply one distortion family at integer severity 1..5. [H,W,3]→same."""
    import cv2

    s = float(severity)
    x = img.astype(np.float32)
    if family == "blur":
        return cv2.GaussianBlur(x, (0, 0), 0.4 + 0.5 * s)
    if family == "noise":
        return np.clip(x + rng.normal(0, 0.015 * s, x.shape).astype(np.float32),
                       0, 1)
    if family == "downup":
        f = 1.0 + 0.35 * s
        h, w = x.shape[:2]
        small = cv2.resize(x, (max(int(w / f), 4), max(int(h / f), 4)),
                           interpolation=cv2.INTER_AREA)
        return cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)
    if family == "ghost":
        # blend with a shifted copy — the linear-blend VFI failure mode
        d = int(round(s * 2))
        shifted = np.roll(x, (d, d), axis=(0, 1))
        return 0.5 * x + 0.5 * shifted
    if family == "warp":
        h, w = x.shape[:2]
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        amp = 0.6 * s
        map_x = xx + amp * np.sin(2 * np.pi * yy / 16.0)
        map_y = yy + amp * np.cos(2 * np.pi * xx / 16.0)
        return cv2.remap(x, map_x, map_y, cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REFLECT)
    if family == "quant":
        levels = max(int(48 / s), 3)
        return np.round(x * levels) / levels
    if family == "contrast":
        g = 1.0 + 0.10 * s
        return np.clip((x - 0.5) * g + 0.5 + 0.02 * s, 0, 1)
    raise ValueError(family)


# ---------------------------------------------------------------------------
# Ranking-pair construction
# ---------------------------------------------------------------------------

def build_pairs(rng: np.random.Generator, n_patches: int = 48,
                cross_per_patch: int = 10):
    """Returns (refs, near, far) arrays of aligned ranking triplets."""
    from vfisr_tpu.evaluation.metrics import (
        compute_psnr_simple,
        compute_ssim_simple,
    )

    bases = make_base_patches(rng, n_patches)
    refs: List[np.ndarray] = []
    near: List[np.ndarray] = []
    far: List[np.ndarray] = []
    for b in bases:
        dist: Dict[Tuple[str, int], np.ndarray] = {}
        for fam in FAMILIES:
            for sev in SEVERITIES:
                dist[(fam, sev)] = distort(b, fam, sev, rng)
        # within-family: adjacent + extreme severity pairs
        for fam in FAMILIES:
            for lo, hi in ((1, 3), (2, 4), (3, 5), (1, 5)):
                refs.append(b)
                near.append(dist[(fam, lo)])
                far.append(dist[(fam, hi)])
        # cross-family: PSNR+SSIM consensus with margin
        keys = list(dist.keys())
        for _ in range(cross_per_patch):
            ia, ib = rng.choice(len(keys), 2, replace=False)
            ka, kb = keys[int(ia)], keys[int(ib)]
            if ka[0] == kb[0]:
                continue  # same family is covered above
            da, db = dist[ka], dist[kb]
            u8 = lambda v: (v * 255).astype(np.uint8)  # noqa: E731
            psnr_a = compute_psnr_simple(u8(da), u8(b))
            psnr_b = compute_psnr_simple(u8(db), u8(b))
            ssim_a = compute_ssim_simple(u8(da), u8(b))
            ssim_b = compute_ssim_simple(u8(db), u8(b))
            if psnr_a - psnr_b > 1.0 and ssim_a - ssim_b > 0.01:
                refs.append(b); near.append(da); far.append(db)
            elif psnr_b - psnr_a > 1.0 and ssim_b - ssim_a > 0.01:
                refs.append(b); near.append(db); far.append(da)
    return (np.stack(refs), np.stack(near), np.stack(far))


# ---------------------------------------------------------------------------
# Head training
# ---------------------------------------------------------------------------

def _tap_distances(lp: LPIPS, a: np.ndarray, b: np.ndarray) -> List[np.ndarray]:
    """Per-tap normalized-feature squared distances, channel-resolved.

    Returns 5 arrays [N, C_i]: spatial mean of (unit(a)-unit(b))^2 — the
    quantity the linear head weights. Precomputing these makes head
    training a tiny convex-ish problem (no conv re-evaluation per step).
    """
    xa = lp._prep(a)
    xb = lp._prep(b)

    # One jitted program per LPIPS instance (cached on the instance):
    # a fresh @jax.jit closure per call would re-trace the AlexNet
    # feature stack for every one of the hundreds of calibration calls.
    taps = getattr(lp, "_taps_jit", None)
    if taps is None:
        @jax.jit
        def taps(xa, xb):
            fa = lp._features(xa)
            fb = lp._features(xb)
            out = []
            for ya, yb in zip(fa, fb):
                na = ya * jax.lax.rsqrt(jnp.sum(ya * ya, axis=-1, keepdims=True) + 1e-10)
                nb = yb * jax.lax.rsqrt(jnp.sum(yb * yb, axis=-1, keepdims=True) + 1e-10)
                out.append(jnp.mean((na - nb) ** 2, axis=(1, 2)))  # [N, C]
            return out

        lp._taps_jit = taps

    return [np.asarray(t) for t in taps(xa, xb)]


def train_heads(refs: np.ndarray, near: np.ndarray, far: np.ndarray,
                steps: int = 600, lr: float = 0.05, seed: int = 0,
                batch: int = 256) -> Dict[str, np.ndarray]:
    """Fit softplus-parameterized heads with a logistic ranking loss."""
    import optax

    lp = LPIPS(weights_path="__nonexistent__", seed=0, load_calibrated=False)  # random features
    # precompute channel-resolved tap distances once
    tn = []
    tf = []
    for i in range(0, len(refs), batch):
        sl = slice(i, i + batch)
        dn = _tap_distances(lp, near[sl], refs[sl])
        df = _tap_distances(lp, far[sl], refs[sl])
        tn.append(dn)
        tf.append(df)
    taps_near = [np.concatenate([c[i] for c in tn]) for i in range(5)]
    taps_far = [np.concatenate([c[i] for c in tf]) for i in range(5)]

    dims = [t.shape[1] for t in taps_near]
    rng = jax.random.PRNGKey(seed)
    theta = [jnp.full((d,), -2.0) + 0.01 * jax.random.normal(k, (d,))
             for d, k in zip(dims, jax.random.split(rng, 5))]

    tx = optax.adam(lr)
    opt_state = tx.init(theta)
    tnear = [jnp.asarray(t) for t in taps_near]
    tfar = [jnp.asarray(t) for t in taps_far]

    @jax.jit
    def step(theta, opt_state):
        def loss_fn(theta):
            d_near = sum(jnp.sum(t * jax.nn.softplus(th), axis=1)
                         for t, th in zip(tnear, theta))
            d_far = sum(jnp.sum(t * jax.nn.softplus(th), axis=1)
                        for t, th in zip(tfar, theta))
            # logistic ranking: want d_far > d_near
            margin = (d_far - d_near) / 0.05
            return jnp.mean(jax.nn.softplus(-margin))

        loss, grads = jax.value_and_grad(loss_fn)(theta)
        updates, opt_state = tx.update(grads, opt_state)
        theta = optax.apply_updates(theta, updates)
        return theta, opt_state, loss

    last = None
    for _ in range(steps):
        theta, opt_state, last = step(theta, opt_state)
    heads = {f"lin{i}_w": np.asarray(jax.nn.softplus(t), np.float32)
             for i, t in enumerate(theta)}
    heads["final_loss"] = np.asarray(float(last), np.float32)
    return heads


def evaluate_heads(heads: Dict[str, np.ndarray], refs, near, far,
                   lp: LPIPS = None) -> dict:
    """2AFC accuracy + within-metric stats for a head set."""
    lp = lp or LPIPS(weights_path="__nonexistent__", seed=0, load_calibrated=False)
    dn_taps = _tap_distances(lp, near, refs)
    df_taps = _tap_distances(lp, far, refs)
    d_near = sum((t * heads[f"lin{i}_w"]).sum(axis=1)
                 for i, t in enumerate(dn_taps))
    d_far = sum((t * heads[f"lin{i}_w"]).sum(axis=1)
                for i, t in enumerate(df_taps))
    acc = float(np.mean(d_far > d_near))
    return {"accuracy_2afc": acc, "n_pairs": int(len(refs))}


def severity_spearman(heads: Dict[str, np.ndarray], rng=None,
                      n_patches: int = 8) -> Dict[str, float]:
    """Within-family Spearman rank correlation of distance vs severity."""
    rng = rng or np.random.default_rng(123)
    lp = LPIPS(weights_path="__nonexistent__", seed=0, load_calibrated=False)
    bases = make_base_patches(rng, n_patches)
    out = {}
    for fam in FAMILIES:
        rhos = []
        for b in bases:
            ds = []
            for sev in SEVERITIES:
                d = distort(b, fam, sev, rng)
                taps = _tap_distances(lp, d[None], b[None])
                ds.append(float(sum((t * heads[f"lin{i}_w"]).sum()
                                    for i, t in enumerate(taps))))
            ranks = np.argsort(np.argsort(ds))
            ideal = np.arange(len(SEVERITIES))
            n = len(ideal)
            rho = 1 - 6 * np.sum((ranks - ideal) ** 2) / (n * (n ** 2 - 1))
            rhos.append(rho)
        out[fam] = float(np.mean(rhos))
    return out


def uniform_heads() -> Dict[str, np.ndarray]:
    """The uncalibrated (random_features mode) baseline heads."""
    lp = LPIPS(weights_path="__nonexistent__", seed=0, load_calibrated=False)
    return {f"lin{i}_w": np.asarray(lp.params[f"lin{i}_w"]) for i in range(5)}


def calibrate(out_path: str = None, seed: int = 0,
              n_patches: int = 48, steps: int = 600) -> dict:
    """Full pipeline: build pairs, train, evaluate, save. Returns report."""
    from vfisr_tpu.utils.paths import REPO_ROOT

    out_path = out_path or os.path.join(REPO_ROOT, "weights", "lpips_heads.npz")
    rng = np.random.default_rng(seed)
    refs, near, far = build_pairs(rng, n_patches=n_patches)
    n_hold = max(len(refs) // 5, 1)
    perm = rng.permutation(len(refs))
    tr, ho = perm[n_hold:], perm[:n_hold]
    heads = train_heads(refs[tr], near[tr], far[tr], steps=steps, seed=seed)
    report = {
        "train": evaluate_heads(heads, refs[tr], near[tr], far[tr]),
        "holdout": evaluate_heads(heads, refs[ho], near[ho], far[ho]),
        "holdout_uniform": evaluate_heads(uniform_heads(), refs[ho],
                                          near[ho], far[ho]),
        "spearman": severity_spearman(heads),
        "spearman_uniform": severity_spearman(uniform_heads()),
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **{k: v for k, v in heads.items() if k.startswith("lin")})
    report["weights_path"] = out_path
    return report
