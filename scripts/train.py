#!/usr/bin/env python
"""Train a native VFI model (RIFE / SAFA / VFIMamba) on TPU.

The reference repo has no training at all (frozen external checkpoints,
absent from its snapshot). This CLI fits the native models with the pjit'd
data-parallel train step (vfisr_tpu/train), on triplet data when available
and synthetic gaming-motion scenes otherwise.

    python scripts/train.py --model rife_lite --steps 2000 --batch 16
    python scripts/train.py --model rife --data data/processed --steps 20000
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="rife_lite",
                        choices=["rife", "rife_lite", "safa", "vfimamba",
                                 "vfimamba_s", "span", "span_x4"])
    parser.add_argument("--data", default=None,
                        help="data/processed dir (default: synthetic scenes)")
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--crop", type=int, default=192)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default=None, help="Weight output (.npz)")
    parser.add_argument("--log-every", type=int, default=50)
    parser.add_argument("--save-every", type=int, default=500)
    parser.add_argument("--resume", default=None, help="Resume from .npz")
    parser.add_argument(
        "--level-radius", default=None,
        help="rife models: level warp radius 'ry,rx' to train/finetune at "
        "(the net adapts to the Pallas warp's residual clamp)")
    parser.add_argument(
        "--final-radius", default=None,
        help="rife models: final fusion warp radius 'ry,rx'")
    parser.add_argument(
        "--detail", type=float, default=0.35,
        help="high-frequency structure weight in on-device synthetic "
        "scenes (0 = legacy smooth scenes)")
    parser.add_argument(
        "--data-source", default="auto",
        choices=["auto", "device", "host"],
        help="synthetic-scene generator: 'device' builds batches on-chip "
        "(no host->device transfer — the tunnel moves ~44 MB/s, so a host "
        "batch costs ~30 train steps); 'auto' = device on TPU, host "
        "elsewhere. Ignored with --data.")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vfisr_tpu.models.registry import get_model
    from vfisr_tpu.train.data import (
        TripletCropDataset, synthetic_pool_iter, synthetic_sr_batch,
    )
    from vfisr_tpu.train.train import (
        TrainState, create_train_state, make_sr_train_step, make_train_step,
    )
    from vfisr_tpu.utils.checkpoint import load_params, save_params

    is_sr = args.model.startswith("span")
    # SAFA is a JOINT model (safa_wrapper.py:133-137): apply(img0, img1, t)
    # emits frames at 2x input resolution, so --crop is the INPUT crop and
    # the ground-truth midpoint is supervised at 2x crop.
    is_joint = args.model == "safa"
    reg_name = "span" if args.model.startswith("span") else args.model
    reg_kw = {"scale": 4} if args.model == "span_x4" else {}
    if args.model.startswith("rife") and (args.level_radius or args.final_radius):
        import dataclasses

        from vfisr_tpu.models.sota.rife import RIFELiteModel, RIFEModel

        base_cfg = (RIFELiteModel.CONFIG if args.model == "rife_lite"
                    else RIFEModel.CONFIG)
        overrides = {}
        if args.level_radius:
            overrides["level_warp_radius"] = tuple(
                int(v) for v in args.level_radius.split(","))
        if args.final_radius:
            overrides["final_warp_radius"] = tuple(
                int(v) for v in args.final_radius.split(","))
        reg_kw["config"] = dataclasses.replace(base_cfg, **overrides)
    model = get_model(reg_name, **reg_kw)
    per_block_remat = False
    if args.model.startswith("vfimamba"):
        # Per-BiMambaBlock remat instead of the coarse whole-forward
        # jax.checkpoint: the S6 scan backward temporaries are what OOM'd
        # batch 8/crop 128 (16.05G of 15.75G); per-block remat stores only
        # block boundaries, fitting batch >=16 at crop 128.
        import dataclasses as _dc

        model.cfg = _dc.replace(model.cfg, remat=True)
        per_block_remat = True
    model.load(weights_path=args.resume)
    # grab the underlying module apply fn
    apply_fn = model._apply
    if apply_fn is None:
        raise SystemExit(f"model {args.model} exposes no trainable apply fn")

    state, tx = create_train_state(model.params, learning_rate=args.lr,
                                   total_steps=args.steps)
    if is_sr:
        step_fn = make_sr_train_step(apply_fn, tx)
        sr_scale = 4 if args.model == "span_x4" else 2
        default_out = f"weights/span_x{sr_scale}.npz"
    else:
        step_fn = make_train_step(apply_fn, tx,
                                  use_remat=not per_block_remat)
        default_out = f"weights/{args.model}.npz"

    out_path = args.out or default_out
    # Never silently clobber a shipped checkpoint: a default-out run (e.g.
    # a --level-radius fine-tune) would overwrite weights/<model>.npz at
    # the first --save-every step. Overwriting requires an explicit --out,
    # unless this run is resuming from that same file.
    import os as _os

    if (args.out is None and _os.path.exists(out_path)
            and args.resume != out_path):
        raise SystemExit(
            f"{out_path} already exists; pass --out explicitly to overwrite "
            f"(or --resume {out_path} to continue training it)")
    rng = np.random.default_rng(args.seed)
    use_device_gen = not args.data and (
        args.data_source == "device"
        or (args.data_source == "auto"
            and jax.devices()[0].platform == "tpu")
    )
    batch_iter = None
    if args.data and is_joint:
        raise SystemExit(
            "safa joint training needs GT at 2x the input resolution; "
            "triplet data has same-res midpoints — train on synthetic "
            "scenes (omit --data) or use the VFI-only distill path")
    if args.data and not is_sr:
        ds = TripletCropDataset(args.data, crop=args.crop, seed=args.seed)
        print(f"Training on {len(ds)} triplet crops from {args.data}")
        batch_iter = ds.batches(args.batch, args.steps)
    elif use_device_gen:
        from vfisr_tpu.train.device_data import device_synthetic_batch

        print("Training on synthetic gaming-motion scenes (ON-DEVICE gen)")
        gen_key = jax.random.PRNGKey(args.seed)

        def device_batch(step):
            gen_crop = 2 * args.crop if is_joint else args.crop
            if is_sr:
                # crisp unwarped scenes: the VFI generator's subpixel warp
                # low-passes away the aliased detail SR must learn from
                from vfisr_tpu.train.device_data import device_sr_batch

                b = device_sr_batch(
                    jax.random.fold_in(gen_key, step), args.batch, gen_crop,
                    detail=max(args.detail, 0.5),
                )
            else:
                b = device_synthetic_batch(
                    jax.random.fold_in(gen_key, step), args.batch, gen_crop,
                    detail=args.detail,
                )
            if is_sr:
                from vfisr_tpu.core.resize import resize

                hr = b["gt"]
                lr = resize(
                    hr,
                    (args.crop // sr_scale, args.crop // sr_scale),
                    "area",
                )
                return {"lr": lr, "hr": hr}
            if is_joint:
                from vfisr_tpu.core.resize import resize

                # scene at 2x crop: degrade the endpoint inputs to crop
                # (the deployment regime: low-res pair -> HR midpoints),
                # supervise gt at full scene resolution.
                b = dict(b)
                b["img0"] = resize(b["img0"], (args.crop, args.crop), "area")
                b["img1"] = resize(b["img1"], (args.crop, args.crop), "area")
            return b
    elif is_sr:
        print(f"Training SR x{sr_scale} on synthetic gaming scenes")
        batch_iter = (synthetic_sr_batch(rng, args.batch, args.crop, sr_scale)
                      for _ in range(args.steps))
    elif is_joint:
        print("Training SAFA joint VFI+SR on synthetic scenes (host gen)")

        def _joint_batches():
            from vfisr_tpu.core.resize import resize

            for b in synthetic_pool_iter(rng, args.batch, 2 * args.crop,
                                         args.steps):
                b = dict(b)
                b["img0"] = np.asarray(
                    resize(jnp.asarray(b["img0"]), (args.crop, args.crop),
                           "area"))
                b["img1"] = np.asarray(
                    resize(jnp.asarray(b["img1"]), (args.crop, args.crop),
                           "area"))
                yield b

        batch_iter = _joint_batches()
    else:
        print("Training on synthetic gaming-motion scenes (pooled/augmented)")
        batch_iter = synthetic_pool_iter(rng, args.batch, args.crop, args.steps)

    # Host data generation overlaps device compute: a producer thread keeps
    # a small queue full (cv2 and jax readbacks both release the GIL), and
    # losses stay on-device between log intervals so the step loop never
    # blocks on the ~30 ms tunnel readback. (Unused for on-device gen.)
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=4)
    if batch_iter is not None:

        def producer():
            try:
                for b in batch_iter:
                    q.put(b)
            except Exception:
                import traceback

                traceback.print_exc()
            finally:
                q.put(None)  # always unblock the consumer

        threading.Thread(target=producer, daemon=True).start()

    t0 = time.time()
    window: list = []  # device scalars, read back only at log time
    last_loss = float("nan")
    for step in range(1, args.steps + 1):
        if batch_iter is None:
            batch = device_batch(step)
        else:
            batch = q.get()
            if batch is None:
                break
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, loss = step_fn(state, batch)
        window.append(loss)
        if step % args.log_every == 0:
            last_loss = float(np.mean([float(l) for l in window]))
            window.clear()
            rate = step * args.batch / (time.time() - t0)
            print(f"step {step}/{args.steps}  loss {last_loss:.4f}  "
                  f"{rate:.1f} samples/s", flush=True)
        if step % args.save_every == 0 or step == args.steps:
            save_params(out_path, jax.device_get(state.params))
            print(f"  saved {out_path} @ step {step}", flush=True)
    print(f"Done: final loss {last_loss:.4f} -> {out_path}")


if __name__ == "__main__":
    main()
