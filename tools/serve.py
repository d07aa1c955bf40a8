#!/usr/bin/env python
"""Frame-serving CLI over the single-jit frame program (plr2_tpu/serving.py).

Streams RGB-D frames (synthetic scenes, or YCB-Video frames with their GT
label maps) through FrameEstimator and prints one JSON line per frame with
the per-object poses and the wall latency of the dispatch. The first frame
pays the XLA compile; steady-state wall latency on this dev relay includes
~30-60 ms of transfer overhead per dispatch — for the program-time
throughput numbers see tools/bench_serving.py (chained-loop methodology).

  python tools/serve.py --synthetic --num_frames 8
  python tools/serve.py --synthetic --seg_arch pspnet --seg_scale 2
  python tools/serve.py --synthetic --batch 8        # batched run_frames
  python tools/serve.py --dataset_root /data/YCB_Video_Dataset --num_frames 50
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", type=str, default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--model", type=str, default="",
                   help="checkpoint dir (CheckpointManager layout)")
    p.add_argument("--num_frames", type=int, default=8)
    p.add_argument("--batch", type=int, default=1,
                   help=">1: batched run_frames throughput mode")
    p.add_argument("--max_objects", type=int, default=5)
    p.add_argument("--num_points", type=int, default=1000)
    p.add_argument("--iters", type=int, default=4,
                   help="refinement iterations")
    p.add_argument("--canvas", type=int, default=240)
    p.add_argument("--auto_grow_canvas", action="store_true",
                   help="single-frame mode: when a detection's snapped "
                        "window exceeds the canvas, recompile at the next "
                        "border-list bucket and re-serve the frame instead "
                        "of dropping the object (one extra compile per "
                        "growth)")
    p.add_argument("--seg_arch", type=str, default="",
                   choices=("", "segnet", "pspnet"),
                   help="segment on device instead of using label maps")
    p.add_argument("--seg_model", type=str, default="",
                   help="segmenter variables (save_variables msgpack)")
    p.add_argument("--seg_scale", type=int, default=1)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from plr2_tpu.pipeline import DenseFusionPipeline
    from plr2_tpu.serving import FrameEstimator
    from plr2_tpu.utils.cache import (enable_compilation_cache,
                                      enable_cpu_compilation_cache)

    # CPU AOT artifacts embed host ISA features — keep them out of the
    # shared TPU cache dir (see utils/cache.py)
    enable_cpu_compilation_cache() if args.cpu else enable_compilation_cache()

    num_objects = 21
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    pipe = DenseFusionPipeline(num_points=args.num_points,
                               num_objects=num_objects,
                               phase_upsample=True, dtype=dtype)
    if args.model:
        from plr2_tpu.config import get_preset
        from plr2_tpu.train import CheckpointManager, Trainer

        mgr = CheckpointManager(args.model)
        if mgr.restore() is None:
            sys.exit(f"serve.py: no checkpoint found under {args.model!r} "
                     "(refusing to serve randomly initialized weights)")
        state = Trainer(get_preset("ycb_refine"), pipe).init_state(
            jax.random.key(0))
        variables = mgr.restore_into(state).variables
    else:
        variables = pipe.init(jax.random.key(0), crop_hw=args.canvas,
                              batch=1)
    if args.bf16:
        variables = pipe.cast_variables(variables)

    seg_model = seg_vars = None
    if args.seg_arch:
        from plr2_tpu.models.segnet import build_segmenter
        from plr2_tpu.train.checkpoint import load_variables

        seg_model = build_segmenter(args.seg_arch, num_objects + 1,
                                    dtype=dtype)
        seg_vars = seg_model.init(jax.random.key(1),
                                  jnp.zeros((1, 96, 96, 3), dtype))
        if args.seg_model:
            seg_vars = load_variables(args.seg_model, seg_vars)
        if args.bf16:
            seg_vars = pipe.cast_variables(seg_vars)

    # -- frame source: (color, depth, label, obj_ids, model_points, intr) --
    k = args.max_objects

    def frames():
        if args.synthetic or not args.dataset_root:
            from plr2_tpu.data.synthetic import make_scene

            for i in range(args.num_frames):
                frame, models = make_scene(
                    num_objects=min(k, 8), model_points=500, seed=i)
                oids = np.zeros(k, np.int32)
                present = sorted(frame.poses)
                oids[:len(present)] = present
                mps = np.stack([models[present[j % len(present)]]
                                for j in range(k)])
                intr = [frame.intrinsics[n] for n in
                        ("cx", "cy", "fx", "fy", "cam_scale")]
                yield (frame.color, frame.depth.astype(np.float32),
                       frame.label.astype(np.int32), oids, mps,
                       np.asarray(intr, np.float32))
        else:
            from plr2_tpu.data import YCBDataset

            ds = YCBDataset(args.dataset_root, "test", args.num_points,
                            500, add_noise=False)
            n_mesh = ds.get_num_points_mesh()
            for i in range(min(args.num_frames, len(ds))):
                fr = ds.get_frame(i)
                present = sorted(fr["objects"])[:k]
                oids = np.zeros(k, np.int32)
                oids[:len(present)] = [o + 1 for o in present]
                mps = np.zeros((k, n_mesh, 3), np.float32)
                for j, o in enumerate(present):
                    mps[j] = ds.model_points[o]
                intr = [fr["intrinsics"][n] for n in
                        ("cx", "cy", "fx", "fy", "cam_scale")]
                yield (fr["color"], fr["depth"].astype(np.float32),
                       fr["label"].astype(np.int32), oids, mps,
                       np.asarray(intr, np.float32))

    fe = FrameEstimator(pipe, canvas=args.canvas,
                        refine_iterations=args.iters,
                        seg_model=seg_model, seg_scale=args.seg_scale)

    totals = {"dropped": 0, "oversized": 0}

    def emit(i, ms, oids, poses, slot0=0):
        objs = []
        valid = np.asarray(poses.valid).reshape(-1, k)[slot0]
        oversized = np.asarray(poses.oversized).reshape(-1, k)[slot0]
        for j in range(k):
            objs.append({
                "obj": int(oids[j]),
                "valid": bool(valid[j]),
                "quat": np.asarray(poses.quat, np.float32)
                        .reshape(-1, k, 4)[slot0, j].round(5).tolist(),
                "trans": np.asarray(poses.trans, np.float32)
                         .reshape(-1, k, 3)[slot0, j].round(5).tolist(),
                "conf": float(np.asarray(poses.confidence, np.float32)
                              .reshape(-1, k)[slot0, j]),
            })
        dropped = int(((np.asarray(oids) > 0) & ~valid).sum())
        over = int(oversized.sum())
        totals["dropped"] += dropped
        totals["oversized"] += over
        line = {"frame": i, "ms": round(ms, 2), "objects": objs}
        if dropped:
            line["dropped"] = dropped
        if over:
            line["oversized"] = over
        print(json.dumps(line), flush=True)

    def next_canvas(c):
        from plr2_tpu.data.bbox import BORDER_LIST
        for b in BORDER_LIST:
            if b > c:
                return b
        return c

    def serve_one(fe_, i, color, depth, label, oids, mps, intr):
        """Single-frame dispatch; with --auto_grow_canvas, recompile at
        the next border-list bucket while any detection's window exceeds
        the canvas (the host chain's auto-growing canvas, as a recipe)."""
        t0 = time.perf_counter()
        poses = fe_.run(variables, jnp.asarray(color), jnp.asarray(depth),
                        jnp.asarray(label), jnp.asarray(oids),
                        jnp.asarray(mps), jnp.asarray(intr),
                        jax.random.key(i), seg_variables=seg_vars)
        np.asarray(poses.quat)  # wall latency includes the fetch
        while (args.auto_grow_canvas and bool(np.asarray(poses.oversized).any())
               and next_canvas(fe_.canvas) <= min(fe_.img_h, fe_.img_w)):
            grown = next_canvas(fe_.canvas)
            print(f"oversized window at canvas {fe_.canvas}: recompiling "
                  f"at {grown}", file=sys.stderr, flush=True)
            fe_ = FrameEstimator(pipe, canvas=grown,
                                 refine_iterations=args.iters,
                                 seg_model=seg_model,
                                 seg_scale=args.seg_scale)
            poses = fe_.run(variables, jnp.asarray(color),
                            jnp.asarray(depth), jnp.asarray(label),
                            jnp.asarray(oids), jnp.asarray(mps),
                            jnp.asarray(intr), jax.random.key(i),
                            seg_variables=seg_vars)
            np.asarray(poses.quat)
        emit(i, (time.perf_counter() - t0) * 1e3, oids, poses)
        return fe_

    # graceful drain: first SIGTERM/SIGINT finishes the in-flight frame
    # (batch) and stops emitting cleanly; a second signal aborts. The
    # with-block guarantees the handlers are uninstalled (and the drain
    # message printed) even if a serving loop raises.
    from plr2_tpu.utils.interrupt import GracefulInterrupt
    served = 0
    with GracefulInterrupt() as stop:
        if args.batch <= 1:
            for color, depth, label, oids, mps, intr in frames():
                if stop():
                    break
                fe = serve_one(fe, served, color, depth, label, oids, mps,
                               intr)
                served += 1
        else:
            buf = []
            for item in frames():
                if stop():
                    buf = []
                    break
                buf.append(item)
                if len(buf) < args.batch:
                    continue
                stacked = [jnp.asarray(np.stack(x)) for x in zip(*buf)]
                keys = jax.random.split(jax.random.key(served), len(buf))
                t0 = time.perf_counter()
                poses = fe.run_frames(variables, *stacked, keys,
                                      seg_variables=seg_vars)
                np.asarray(poses.quat)
                ms = (time.perf_counter() - t0) * 1e3 / len(buf)
                for f in range(len(buf)):
                    emit(served + f, ms, np.asarray(stacked[3][f]), poses,
                         slot0=f)
                served += len(buf)
                buf = []
            # tail short of a full batch: serve the leftovers one-by-one
            # through the single-frame program (one extra compile) rather
            # than dropping them
            for color, depth, label, oids, mps, intr in buf:
                if stop():
                    break
                fe = serve_one(fe, served, color, depth, label, oids, mps,
                               intr)
                served += 1
        if stop():
            print("interrupt requested: drained in-flight work and stopped",
                  file=sys.stderr)
        print(f"served {served} frames", file=sys.stderr)
        if totals["dropped"]:
            print(f"dropped {totals['dropped']} object slots "
                  f"({totals['oversized']} oversized windows"
                  + ("" if args.auto_grow_canvas else
                     " — rerun with --auto_grow_canvas or a larger "
                     "--canvas") + ")",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
