"""Render a synthetic gaming-like source clip for end-to-end runs.

The reference's experiments run on captured gameplay (`data/clips/
arc_raiders_001`, 3840x1080@60 HEVC — clips_registry.json); no real
footage ships with either repo, so this renders a deterministic
gaming-like clip with the content classes the router/metrics care about:

- parallax-scrolling textured background (smooth camera motion),
- moving foreground sprites (occluders with distinct velocities),
- a particle burst phase (router's particle detector),
- a static HUD with minimap/healthbar/ammo text (HUD masking),
- one hard scene cut (scene-change gate),
- a high-motion camera-pan phase (EXTREME-difficulty strata).

Output: H.264/mp4v 1920x1080 @60fps via cv2 (no ffmpeg in this image).

Usage: python scripts/make_synthetic_clip.py out.mp4 --seconds 12
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _texture(rng, h, w, scale, palette):
    """Smooth random texture: low-res noise upsampled with cubic."""
    small = rng.random((h // scale, w // scale, 3)).astype(np.float32)
    tex = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
    tex = cv2.GaussianBlur(tex, (0, 0), 1.5)
    return np.clip(tex * palette[None, None], 0, 1)


def render_clip(path: str, seconds: float = 12.0, fps: int = 60,
                width: int = 1920, height: int = 1080, seed: int = 7):
    rng = np.random.default_rng(seed)
    n_frames = int(seconds * fps)
    # double-width textures for wraparound scrolling
    bg_far = _texture(rng, height, width * 2, 32, np.array([0.25, 0.35, 0.55]))
    bg_near = _texture(rng, height, width * 2, 16, np.array([0.35, 0.55, 0.35]))
    bg_far2 = _texture(rng, height, width * 2, 24, np.array([0.55, 0.3, 0.25]))
    bg_near2 = _texture(rng, height, width * 2, 12, np.array([0.5, 0.45, 0.3]))
    near_mask = (_texture(rng, height, width * 2, 48, np.array([1.0, 1.0, 1.0]))[..., 0]
                 > 0.55).astype(np.float32)[..., None]

    n_sprites = 6
    spr_size = rng.integers(60, 160, n_sprites)
    spr_y0 = rng.uniform(100, height - 260, n_sprites)
    spr_phase = rng.uniform(0, 2 * np.pi, n_sprites)
    spr_speed = rng.uniform(120, 420, n_sprites)  # px/s
    spr_color = rng.uniform(0.3, 1.0, (n_sprites, 3))

    n_part = 220
    part_pos = rng.uniform([0, 0], [width, height], (n_part, 2))
    part_vel = rng.normal(0, 220, (n_part, 2))

    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (width, height))
    if not writer.isOpened():
        raise RuntimeError(f"cannot open VideoWriter for {path}")

    cut_at = int(n_frames * 0.62)
    for i in range(n_frames):
        t = i / fps
        scene2 = i >= cut_at
        far, near = (bg_far2, bg_near2) if scene2 else (bg_far, bg_near)
        # camera: slow pan, then a fast pan burst in the last 2 s of scene 1
        pan_speed = 90.0
        if not scene2 and i >= cut_at - 2 * fps:
            pan_speed = 900.0  # EXTREME-motion stratum
        cam = (t * pan_speed) % width
        xf = int(cam * 0.4) % width
        xn = int(cam) % width
        frame = far[:, xf:xf + width].copy()
        nm = near_mask[:, xn:xn + width]
        frame = frame * (1 - nm) + near[:, xn:xn + width] * nm

        # sprites (sinusoidal paths)
        for s in range(n_sprites):
            sz = int(spr_size[s])
            x = int((spr_phase[s] * 300 + t * spr_speed[s]) % (width + sz)) - sz
            y = int(spr_y0[s] + 60 * np.sin(2 * np.pi * 0.4 * t + spr_phase[s]))
            x2, y2 = min(x + sz, width), min(y + sz // 2, height)
            x, y = max(x, 0), max(y, 0)
            if x2 > x and y2 > y:
                frame[y:y2, x:x2] = (frame[y:y2, x:x2] * 0.25
                                     + spr_color[s][None, None] * 0.75)

        frame_u8 = (np.clip(frame, 0, 1) * 255).astype(np.uint8)

        # particle burst in the middle third of scene 1 (drawn on uint8 —
        # cv2 5.0 drawing ops require CV_8U)
        if not scene2 and n_frames // 3 < i < cut_at - 2 * fps:
            pp = part_pos + part_vel * (t - n_frames / 3 / fps)
            px = np.mod(pp[:, 0], width).astype(int)
            py = np.mod(pp[:, 1], height).astype(int)
            for k in range(n_part):
                cv2.circle(frame_u8, (px[k], py[k]), 2, (255, 242, 178), -1)

        # static HUD (identical every frame)
        cv2.rectangle(frame_u8, (40, 40), (300, 200), (20, 20, 26), -1)
        cv2.rectangle(frame_u8, (40, 40), (300, 200), (178, 178, 191), 2)
        cv2.putText(frame_u8, "MAP", (60, 80), cv2.FONT_HERSHEY_SIMPLEX,
                    0.8, (230, 230, 230), 2)
        cv2.rectangle(frame_u8, (40, height - 90), (460, height - 50),
                      (26, 26, 26), -1)
        cv2.rectangle(frame_u8, (44, height - 86), (44 + 300, height - 54),
                      (51, 204, 77), -1)
        cv2.putText(frame_u8, "AMMO 30/120", (width - 420, height - 60),
                    cv2.FONT_HERSHEY_SIMPLEX, 1.1, (242, 242, 242), 2)

        writer.write(cv2.cvtColor(frame_u8, cv2.COLOR_RGB2BGR))
    writer.release()
    return n_frames


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("out", help="output video path (e.g. data/raw/synth_001.mp4)")
    parser.add_argument("--seconds", type=float, default=12.0)
    parser.add_argument("--fps", type=int, default=60)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--seed", type=int, default=7)
    args = parser.parse_args()
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    n = render_clip(args.out, args.seconds, args.fps, args.width,
                    args.height, args.seed)
    print(f"Wrote {n} frames to {args.out}")


if __name__ == "__main__":
    main()
