"""Training data pipelines for the native VFI models.

Two sources:
- ``TripletCropDataset``: random crops from preprocessed triplet data
  (data/processed/<clip>/, the extract-intervals contract) — real frames,
  real motion, GT midpoints.
- ``synthetic_batch``: procedurally generated motion (textured layers with
  affine motion + a static HUD overlay) — lets training start with zero
  real data and specifically exercises the gaming failure modes (HUD
  ghosting) the reference benchmarks.
"""

from __future__ import annotations

import json
import random
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import cv2
import numpy as np


class TripletCropDataset:
    """Random (frame0, frame1, gt, t) crops from triplet directories."""

    def __init__(
        self,
        processed_dir: str | Path = "data/processed",
        crop: int = 192,
        seed: int = 0,
    ):
        self.crop = crop
        self.rng = random.Random(seed)
        self.entries: List[dict] = []
        processed = Path(processed_dir)
        if processed.exists():
            for clip_dir in sorted(processed.iterdir()):
                tpath = clip_dir / "triplets.json"
                if not tpath.exists():
                    continue
                triplets = json.loads(tpath.read_text())
                for t in triplets:
                    for gt_name, pos in zip(t["gt_intermediate"], t["temporal_positions"]):
                        self.entries.append(
                            {
                                "f0": clip_dir / "input_1080p30" / "frames" / t["input_frame_0"],
                                "f1": clip_dir / "input_1080p30" / "frames" / t["input_frame_1"],
                                "gt": clip_dir / "ground_truth" / "frames" / gt_name,
                                "t": pos,
                            }
                        )

    def __len__(self):
        return len(self.entries)

    def batches(self, batch_size: int, steps: int) -> Iterator[dict]:
        if not self.entries:
            raise RuntimeError("no triplet data found")
        c = self.crop
        for _ in range(steps):
            f0s, f1s, gts, ts = [], [], [], []
            for _ in range(batch_size):
                e = self.rng.choice(self.entries)
                f0 = cv2.cvtColor(cv2.imread(str(e["f0"])), cv2.COLOR_BGR2RGB)
                f1 = cv2.cvtColor(cv2.imread(str(e["f1"])), cv2.COLOR_BGR2RGB)
                gt = cv2.cvtColor(cv2.imread(str(e["gt"])), cv2.COLOR_BGR2RGB)
                # GT may be at a higher resolution: downscale to input size
                if gt.shape[:2] != f0.shape[:2]:
                    gt = cv2.resize(gt, (f0.shape[1], f0.shape[0]),
                                    interpolation=cv2.INTER_AREA)
                h, w = f0.shape[:2]
                y = self.rng.randint(0, max(h - c, 0))
                x = self.rng.randint(0, max(w - c, 0))
                f0s.append(f0[y : y + c, x : x + c])
                f1s.append(f1[y : y + c, x : x + c])
                gts.append(gt[y : y + c, x : x + c])
                ts.append(e["t"])
            yield {
                "img0": np.stack(f0s).astype(np.float32) / 255.0,
                "img1": np.stack(f1s).astype(np.float32) / 255.0,
                "gt": np.stack(gts).astype(np.float32) / 255.0,
                "t": np.asarray(ts, np.float32),
            }


def _texture(rng: np.random.Generator, size: int, scale: int) -> np.ndarray:
    base = rng.integers(0, 256, (size // scale, size // scale, 3), np.uint8)
    return cv2.resize(base, (size, size), interpolation=cv2.INTER_CUBIC)


def synthetic_batch(
    rng: np.random.Generator, batch_size: int, crop: int = 192, hud_prob: float = 0.5
) -> dict:
    """Two-layer affine-motion scenes with optional static HUD overlays."""
    c = crop
    f0s, f1s, gts, ts = [], [], [], []
    for _ in range(batch_size):
        canvas = _texture(rng, 2 * c, int(rng.integers(4, 32)))
        fg = _texture(rng, c, int(rng.integers(4, 16)))
        fg_mask = np.zeros((c, c), np.uint8)
        cv2.circle(fg_mask, (c // 2, c // 2), int(rng.integers(c // 8, c // 3)), 1, -1)
        t = float(rng.uniform(0.1, 0.9))
        bgd = rng.uniform(-12, 12, 2)  # background displacement (subpixel)
        fgd = rng.uniform(-20, 20, 2)  # foreground displacement (subpixel)
        brot = float(rng.uniform(-2.0, 2.0))  # camera roll, degrees over the pair
        bzoom = float(rng.uniform(-0.03, 0.03))  # camera zoom over the pair

        def render(pos):
            # background: rotation/zoom about the window centre + subpixel
            # translation, sampled bilinearly from the 2c x 2c canvas
            bx, by = c // 2 + bgd * pos
            M = cv2.getRotationMatrix2D(
                (c / 2 + bx, c / 2 + by), brot * pos, 1.0 + bzoom * pos
            )
            M[:, 2] -= (bx, by)
            frame = cv2.warpAffine(
                canvas, M, (c, c), flags=cv2.INTER_LINEAR,
                borderMode=cv2.BORDER_REFLECT,
            )
            # foreground: subpixel translation, soft-edged composite
            fx, fy = fgd * pos
            Mf = np.float32([[1, 0, fx], [0, 1, fy]])
            fgw = cv2.warpAffine(fg, Mf, (c, c), flags=cv2.INTER_LINEAR)
            mw = cv2.warpAffine(
                fg_mask.astype(np.float32), Mf, (c, c), flags=cv2.INTER_LINEAR
            )[..., None]
            return (frame * (1.0 - mw) + fgw * mw).astype(np.uint8)

        a, b_, g = render(0.0), render(1.0), render(t)
        if rng.random() < hud_prob:  # static HUD that must NOT move
            x0, y0 = int(rng.integers(0, c - 60)), int(rng.integers(0, c - 24))
            for fr in (a, b_, g):
                cv2.rectangle(fr, (x0, y0), (x0 + 56, y0 + 20), (255, 255, 255), -1)
                cv2.putText(fr, "HP", (x0 + 4, y0 + 16), cv2.FONT_HERSHEY_SIMPLEX,
                            0.5, (0, 0, 0), 1)
        f0s.append(a)
        f1s.append(b_)
        gts.append(g)
        ts.append(t)
    return {
        "img0": np.stack(f0s).astype(np.float32) / 255.0,
        "img1": np.stack(f1s).astype(np.float32) / 255.0,
        "gt": np.stack(gts).astype(np.float32) / 255.0,
        "t": np.asarray(ts, np.float32),
    }


def synthetic_sr_batch(
    rng: np.random.Generator, batch_size: int, crop: int = 192, scale: int = 2
) -> dict:
    """LR/HR pairs for SR training from the synthetic gaming scenes.

    HR frames come from synthetic_batch (3 distinct frames per scene);
    LR is the HR degraded with INTER_AREA decimation — the degradation the
    pipeline actually applies (reference scripts/run_experiments.py:818-826
    degrades with cv2 resize before SR upscaling).
    """
    c = crop - (crop % scale)
    vb = synthetic_batch(rng, max(batch_size // 3 + 1, 1), c)
    hrs = np.concatenate([vb["img0"], vb["img1"], vb["gt"]])[:batch_size]
    lrs = np.stack(
        [
            cv2.resize(h, (c // scale, c // scale), interpolation=cv2.INTER_AREA)
            for h in hrs
        ]
    )
    return {"lr": lrs.astype(np.float32), "hr": hrs.astype(np.float32)}


def augment_vfi_batch(rng: np.random.Generator, batch: dict) -> dict:
    """Label-consistent augmentation of a VFI batch: spatial flips /
    transpose (square crops), channel permutation, and time reversal
    (img0 <-> img1 with t -> 1-t). All O(copy) numpy ops."""
    img0, img1, gt, t = batch["img0"], batch["img1"], batch["gt"], batch["t"]
    frames = [img0, img1, gt]
    if rng.random() < 0.5:
        frames = [f[:, :, ::-1] for f in frames]
    if rng.random() < 0.5:
        frames = [f[:, ::-1] for f in frames]
    if frames[0].shape[1] == frames[0].shape[2] and rng.random() < 0.5:
        frames = [np.swapaxes(f, 1, 2) for f in frames]
    if rng.random() < 0.5:
        perm = rng.permutation(3)
        frames = [f[..., perm] for f in frames]
    if rng.random() < 0.5:  # time reversal
        frames = [frames[1], frames[0], frames[2]]
        t = 1.0 - t
    return {
        "img0": np.ascontiguousarray(frames[0]),
        "img1": np.ascontiguousarray(frames[1]),
        "gt": np.ascontiguousarray(frames[2]),
        "t": np.asarray(t, np.float32),
    }


def synthetic_pool_iter(
    rng: np.random.Generator,
    batch_size: int,
    crop: int,
    steps: int,
    fresh_every: int = 8,
    pool_max: int = 512,
) -> Iterator[dict]:
    """Amortized synthetic-batch stream.

    Fresh scene generation costs ~1 s/batch on the single host core —
    ~30x the 32-ms train step — so the stream keeps a pool of generated
    batches and serves cheap augmented samples (augment_vfi_batch), with a
    fresh batch generated every `fresh_every` steps to keep refreshing the
    pool (evicting a random entry once full)."""
    pool: List[dict] = [synthetic_batch(rng, batch_size, crop)]
    for step in range(steps):
        if step % fresh_every == 0:
            fresh = synthetic_batch(rng, batch_size, crop)
            if len(pool) >= pool_max:
                pool[int(rng.integers(len(pool)))] = fresh
            else:
                pool.append(fresh)
            yield fresh
        else:
            yield augment_vfi_batch(rng, pool[int(rng.integers(len(pool)))])
