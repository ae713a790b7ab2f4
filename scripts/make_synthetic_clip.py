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


def _detail_texture(rng, h, w, scale, palette):
    """Game-world texture with HIGH-FREQUENCY structure.

    The smooth preset's blurred-noise backgrounds let linear blends tie
    neural VFI (round-2 finding: bicubic_blend beat RIFE on the smooth
    clip). Real gameplay frames are full of hard edges — brick/panel
    grids, signage text, specular speckle — which is exactly what makes
    blends ghost at >5 px displacement (reference interval difficulty:
    mean_flow 12.9 px, hard_pct 31.4%, arc_raiders meta.json). This
    texture stamps those structures into the scrolling world so they
    MOVE with the camera.
    """
    base = _texture(rng, h, w, scale, palette)
    u8 = (base * 255).astype(np.uint8)

    # panel/brick grid: strong axis-aligned edges every 80-140 px
    gy = int(rng.integers(80, 140))
    gx = int(rng.integers(80, 140))
    shade = tuple(int(c) for c in rng.integers(10, 60, 3))
    for y in range(0, h, gy):
        cv2.line(u8, (0, y), (w, y), shade, 2)
    for x in range(0, w, gx):
        cv2.line(u8, (x, 0), (x, h), shade, 2)

    # signage glyphs: short bright strings at random world positions
    glyphs = "ABCDEFGHJKLMNPRSTUVWXYZ0123456789"
    for _ in range(w // 60):
        s = "".join(rng.choice(list(glyphs), rng.integers(3, 8)))
        org = (int(rng.integers(0, max(w - 160, 1))),
               int(rng.integers(min(30, h - 11), h - 10)))
        col = tuple(int(c) for c in rng.integers(150, 255, 3))
        cv2.putText(u8, s, org, cv2.FONT_HERSHEY_SIMPLEX,
                    float(rng.uniform(0.5, 1.4)), col,
                    int(rng.integers(1, 3)))

    # specular speckle: unfiltered pixel noise on a subset of pixels
    speck = rng.random((h, w)) > 0.985
    u8[speck] = rng.integers(180, 255, (int(speck.sum()), 3))

    # fine near-Nyquist checker patches (SR aliasing probes)
    for _ in range(w // 400):
        ph, pw = int(rng.integers(40, 90)), int(rng.integers(60, 140))
        if h <= ph or w <= pw:
            continue
        y0 = int(rng.integers(0, h - ph))
        x0 = int(rng.integers(0, w - pw))
        p = int(rng.integers(2, 4))
        yy, xx = np.mgrid[0:ph, 0:pw]
        checker = (((yy // p) + (xx // p)) % 2 * 160 + 60).astype(np.uint8)
        u8[y0:y0 + ph, x0:x0 + pw] = checker[..., None]

    return u8.astype(np.float32) / 255.0


def _speed_profile(n_frames, fps, cut1, cut2, rng):
    """Per-frame horizontal camera speed (px/s), signed.

    Difficulty mix targets the reference interval (mean pair flow ~13 px,
    hard_pct ~31%): ramps through MEDIUM, sustained HARD phases, one
    EXTREME burst, and a direction-reversing segment after the first cut.
    A keyframe pair spans 2 frames, so pair flow ≈ speed/ (fps/2).
    """
    v = np.zeros(n_frames, np.float32)
    f = np.arange(n_frames) / n_frames
    half_fps = fps / 2.0
    for i in range(n_frames):
        x = f[i]
        if x < 0.15:          # MEDIUM ramp: 4 -> 9 px/pair
            v[i] = half_fps * (4 + (x / 0.15) * 5)
        elif x < 0.30:        # MEDIUM-HARD: 14 px/pair
            v[i] = half_fps * 14
        elif x < cut1:        # EXTREME burst: 30 px/pair
            v[i] = half_fps * 30
        elif x < 0.62:        # reversal: ±14 px/pair sinusoid
            v[i] = half_fps * 14 * np.sin(2 * np.pi * (x - cut1) / 0.17)
        elif x < cut2:        # HARD + particles: 18 px/pair
            v[i] = half_fps * 18
        else:                 # ramp 8 -> 20 px/pair
            v[i] = half_fps * (8 + (x - cut2) / (1 - cut2) * 12)
    return v


def _routing_speed_profile(n_frames, fps):
    """Interleaved-strata speed profile (px/s) + world-advance mask.

    The v1 hard profile has NO truly static pairs (static_pct 0.0) and
    lays strata out sequentially, so (a) the adaptive router's low-res
    motion gate (reference run_experiments.py:848-874, threshold on a
    480x270 single-level Farneback) routes real 4-9 px/pair motion to
    blend — a stratum real gaming footage doesn't have; menus/pause
    screens are genuinely frozen — and (b) any --max-frames prefix
    oversamples the opening ramp. This profile interleaves strata in a
    repeating 2.5 s cycle so every 2 s window is representative:

      static 0.30s (world FROZEN: pause-menu semantics)
      medium 0.90s (13 px/pair)   hard 0.75s (20 px/pair)
      easy   0.20s ( 3 px/pair)   extreme 0.15s (32 px/pair)
      medium 0.20s (13 px/pair)

    Mean pair flow ~13.9 px, hard+extreme ~36% — difficulty-matched to
    the reference interval (mean 12.92, hard 31.4%; arc_raiders
    meta.json). Pan direction alternates per cycle (reversal coverage).
    Returns (speed px/s signed, advance bool) per frame.
    """
    half_fps = fps / 2.0  # px/pair -> px/s
    cycle = [(0.30, 0.0), (0.90, 13.0), (0.75, 20.0),
             (0.20, 3.0), (0.15, 32.0), (0.20, 13.0)]
    cycle_len = sum(d for d, _ in cycle)
    v = np.zeros(n_frames, np.float32)
    advance = np.ones(n_frames, bool)
    for i in range(n_frames):
        t = i / fps
        k = int(t // cycle_len)
        pos = t % cycle_len
        sign = 1.0 if k % 2 == 0 else -1.0
        for dur, pair_flow in cycle:
            if pos < dur:
                v[i] = sign * pair_flow * half_fps
                advance[i] = pair_flow > 0
                break
            pos -= dur
    return v, advance


def render_hard_clip(path: str, seconds: float = 12.0, fps: int = 60,
                     width: int = 1920, height: int = 1080, seed: int = 11,
                     profile: str = "v1"):
    """Reference-grade difficulty: high-frequency world + hard motion.

    Content classes per VERDICT r2 task 4: detailed texture, particle
    systems, occlusion/disocclusion (textured hard-edged sprites over
    parallax layers), static HUD, TWO scene cuts, direction reversal.

    profile="routing" swaps in the interleaved-strata speed profile
    (see _routing_speed_profile): true frozen-world static blocks with
    an animated HUD spinner (frames never bitwise-identical), sprites/
    bob/particles keyed to a world clock that pauses during static
    blocks, particles during hard/extreme phases only.
    """
    rng = np.random.default_rng(seed)
    n_frames = int(seconds * fps)
    margin = 160  # vertical bob room
    th, tw = height + margin, width * 2

    def scene_textures(k):
        r = np.random.default_rng(seed * 1000 + k)
        palettes = [
            (np.array([0.30, 0.38, 0.52]), np.array([0.40, 0.52, 0.36])),
            (np.array([0.52, 0.33, 0.28]), np.array([0.48, 0.44, 0.30])),
            (np.array([0.28, 0.30, 0.36]), np.array([0.36, 0.42, 0.52])),
        ][k % 3]
        far = _detail_texture(r, th, tw, 28, palettes[0])
        near = _detail_texture(r, th, tw, 14, palettes[1])
        mask = (_texture(r, th, tw, 48, np.array([1.0, 1.0, 1.0]))[..., 0]
                > 0.52).astype(np.float32)[..., None]
        return far, near, mask

    scenes = [scene_textures(k) for k in range(3)]
    cut1, cut2 = 0.45, 0.80
    cut1_i, cut2_i = int(n_frames * cut1), int(n_frames * cut2)
    if profile == "routing":
        vx, adv = _routing_speed_profile(n_frames, fps)
        wt = np.cumsum(adv) / fps  # world clock: frozen in static blocks
    else:
        vx = _speed_profile(n_frames, fps, cut1, cut2, rng)
        wt = np.arange(n_frames) / fps
    cam_x = np.cumsum(vx) / fps  # px

    # textured, hard-edged sprites (occluders)
    n_sprites = 8
    spr_size = rng.integers(70, 200, n_sprites)
    y_lo = min(120, 0.1 * height)
    spr_y0 = rng.uniform(y_lo, max(height - 320, y_lo + 1), n_sprites)
    spr_phase = rng.uniform(0, 2 * np.pi, n_sprites)
    spr_speed = rng.uniform(180, 640, n_sprites)  # px/s, some occlude fast
    spr_tex = [
        _detail_texture(np.random.default_rng(seed + 99 + s),
                        int(spr_size[s]), int(spr_size[s]), 8,
                        rng.uniform(0.5, 1.0, 3))
        for s in range(n_sprites)
    ]

    n_part = 300
    part_pos = rng.uniform([0, 0], [width, height], (n_part, 2))
    part_vel = rng.normal(0, 260, (n_part, 2))

    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (width, height))
    if not writer.isOpened():
        raise RuntimeError(f"cannot open VideoWriter for {path}")

    for i in range(n_frames):
        t = i / fps
        w_t = float(wt[i])  # sprite/bob/particle clock (= t for v1)
        scene_k = 0 if i < cut1_i else (1 if i < cut2_i else 2)
        far, near, nm_full = scenes[scene_k]
        cam = cam_x[i]
        xf = int(cam * 0.4) % width
        xn = int(cam) % width
        yb = int(margin / 2 + 50 * np.sin(2 * np.pi * 0.23 * w_t))
        frame = far[yb:yb + height, xf:xf + width].copy()
        nm = nm_full[yb:yb + height, xn:xn + width]
        frame = frame * (1 - nm) + near[yb:yb + height, xn:xn + width] * nm

        # textured sprites: hard edges, crossing paths (occlusion events)
        for s in range(n_sprites):
            sz = int(spr_size[s])
            x = int((spr_phase[s] * 300 + w_t * spr_speed[s]) % (width + 2 * sz)) - sz
            y = int(spr_y0[s] + 90 * np.sin(2 * np.pi * 0.5 * w_t + spr_phase[s]))
            x2, y2 = min(x + sz, width), min(y + sz, height)
            xc, yc = max(x, 0), max(y, 0)
            if x2 > xc and y2 > yc:
                frame[yc:y2, xc:x2] = spr_tex[s][yc - y:y2 - y, xc - x:x2 - x]

        frame_u8 = (np.clip(frame, 0, 1) * 255).astype(np.uint8)

        # particle phases: the EXTREME burst and the second HARD phase
        # (routing profile: any hard/extreme block, >=18 px/pair)
        if profile == "routing":
            in_burst = abs(float(vx[i])) >= 18.0 * fps / 2.0 - 1e-3
        else:
            in_burst = (int(n_frames * 0.30) <= i < cut1_i) or (
                int(n_frames * 0.62) <= i < cut2_i)
        if in_burst:
            pp = part_pos + part_vel * (w_t % 3.0)
            px = np.mod(pp[:, 0], width).astype(int)
            py = np.mod(pp[:, 1], height).astype(int)
            for k in range(n_part):
                cv2.circle(frame_u8, (px[k], py[k]), 2, (255, 242, 178), -1)

        _draw_hud(frame_u8, width, height)
        if profile == "routing":
            # animated HUD spinner: frames are never bitwise-identical,
            # even in frozen-world static blocks (menu-animation analog)
            ang = 2 * np.pi * 1.5 * t
            cx, cy, r = width - 70, 70, 16
            cv2.circle(frame_u8, (cx, cy), r + 4, (60, 60, 70), 2)
            cv2.line(frame_u8, (cx, cy),
                     (int(cx + r * np.cos(ang)), int(cy + r * np.sin(ang))),
                     (240, 240, 250), 3)
        writer.write(cv2.cvtColor(frame_u8, cv2.COLOR_RGB2BGR))
    writer.release()
    return n_frames


def _draw_hud(frame_u8, width, height):
    """Static HUD overlay (identical every frame)."""
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

        _draw_hud(frame_u8, width, height)
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
    parser.add_argument(
        "--preset", default="smooth", choices=["smooth", "hard", "routing"],
        help="'smooth': the round-1/2 clip (kept byte-reproducible); "
        "'hard': reference-grade difficulty — high-frequency texture, "
        "occluding textured sprites, two cuts, ~13 px mean pair flow; "
        "'routing': same world, interleaved strata incl. frozen-world "
        "static blocks (see _routing_speed_profile) so the adaptive "
        "router's low-res motion gate separates pairs the way it does "
        "on real gaming footage")
    args = parser.parse_args()
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    if args.preset == "smooth":
        n = render_clip(args.out, args.seconds, args.fps, args.width,
                        args.height, args.seed)
    else:
        if args.seed == 7:
            args.seed = 11  # hard/routing presets' own default world
        n = render_hard_clip(args.out, args.seconds, args.fps, args.width,
                             args.height, args.seed,
                             profile="routing" if args.preset == "routing"
                             else "v1")
    print(f"Wrote {n} frames to {args.out}")


if __name__ == "__main__":
    main()
