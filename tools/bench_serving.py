#!/usr/bin/env python
"""Full-frame serving throughput (BASELINE config 5 as ONE XLA program):
RGB-D frame -> [SegNet] -> masks -> device bbox -> canvas crops -> fused
preprocessing -> batched PoseNet -> 4-iter refine, chained-loop timed.

  python tools/bench_serving.py [K_objects] [--seg] [--seg_arch=pspnet]
      [--f32] [--iters=N] [--frames=F]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from plr2_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k_obj = int(args[0]) if args else 5
    use_seg = any(a == "--seg" or a.startswith("--seg_arch") for a in sys.argv)
    bf16 = "--f32" not in sys.argv
    refine_iterations = 4
    n_frames = 1
    seg_arch = "segnet"
    seg_scale = 1
    for a in sys.argv[1:]:
        if a.startswith("--iters="):
            refine_iterations = int(a.split("=", 1)[1])
        if a.startswith("--frames="):
            n_frames = int(a.split("=", 1)[1])
        if a.startswith("--seg_arch="):
            seg_arch = a.split("=", 1)[1]
        if a.startswith("--seg_scale="):
            seg_scale = int(a.split("=", 1)[1])
    if seg_scale != 1 and not use_seg:
        sys.exit("--seg_scale only affects the segmenter; pass --seg or "
                 "--seg_arch=... (refusing to record a no-seg number "
                 "labeled with a seg knob)")
    n_points, num_objects, canvas = 1000, 21, 240
    inner, reps = 8, 3

    from plr2_tpu.data.synthetic import make_scene
    from plr2_tpu.pipeline import DenseFusionPipeline
    from plr2_tpu.serving import FrameEstimator

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    pipe = DenseFusionPipeline(num_points=n_points, num_objects=num_objects,
                               phase_upsample=True, dtype=dtype)
    variables = pipe.init(jax.random.key(0), crop_hw=canvas, batch=1)
    if bf16:
        variables = pipe.cast_variables(variables)

    seg_model = seg_vars = None
    if use_seg:
        from plr2_tpu.models.segnet import build_segmenter

        seg_model = build_segmenter(seg_arch, num_objects + 1, dtype=dtype)
        seg_vars = seg_model.init(jax.random.key(1),
                                  jnp.zeros((1, 96, 96, 3), dtype))
        if bf16:
            seg_vars = pipe.cast_variables(seg_vars)

    frame, models = make_scene(num_objects=min(k_obj, 8), model_points=500,
                               seed=3)
    obj_ids = np.zeros(k_obj, np.int32)
    present = sorted(frame.poses)
    obj_ids[:len(present)] = present
    mps = np.stack([models[present[i % len(present)]] for i in range(k_obj)])

    fe = FrameEstimator(pipe, canvas=canvas,
                        refine_iterations=refine_iterations,
                        seg_model=seg_model, seg_scale=seg_scale)
    color = jnp.asarray(frame.color)
    depth = jnp.asarray(frame.depth, jnp.float32)
    label = jnp.asarray(frame.label, jnp.int32)
    intr = jnp.asarray([frame.intrinsics[k] for k in
                        ("cx", "cy", "fx", "fy", "cam_scale")], jnp.float32)
    oid = jnp.asarray(obj_ids)
    mps = jnp.asarray(mps)
    key = jax.random.key(0)

    tr = jnp.broadcast_to(jnp.eye(3), (k_obj, 3, 3))
    tt = jnp.zeros((k_obj, 3))

    if n_frames > 1:
        tile = lambda x: jnp.stack([x] * n_frames)
        fcolor, fdepth, flabel = tile(color), tile(depth), tile(label)
        foid, fmps, fintr = tile(oid), tile(mps), tile(intr)
        ftr, ftt = tile(tr), tile(tt)
        fkeys = jax.random.split(key, n_frames)

    @jax.jit
    def loop(depth):
        def body(i, prev):
            if n_frames > 1:
                poses, _ = fe._program_frames(
                    variables, fcolor, fdepth + prev * 1e-12, flabel, foid,
                    fmps, ftr, ftt, fintr, fkeys, seg_vars)
            else:
                poses, _ = fe._program(variables, color, depth + prev * 1e-12,
                                       label, oid, mps, tr, tt, intr, key,
                                       seg_vars)
            out = (jnp.sum(poses.quat.astype(jnp.float32)) +
                   jnp.sum(poses.trans.astype(jnp.float32)) +
                   jnp.sum(poses.confidence.astype(jnp.float32)) +
                   jnp.sum(poses.valid))
            return out * 1e-9
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0))

    np.asarray(loop(depth))

    @jax.jit
    def null_prog(x):
        return jnp.asarray(x, jnp.float32).ravel()[0] * 2.0

    np.asarray(null_prog(depth))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(null_prog(depth))
    overhead = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(loop(depth))
    total = (time.perf_counter() - t0) / reps
    per_frame = max(total - overhead, 1e-9) / inner / n_frames
    mode = (f"seg={seg_arch if use_seg else False}, seg_scale={seg_scale}, "
            f"bf16={bf16}, K={k_obj}, "
            f"refine={refine_iterations}, frames={n_frames}")
    print(f"full-frame serving ({mode}): {per_frame * 1e3:.2f} ms/frame, "
          f"{1.0 / per_frame:.1f} frames/s, "
          f"{k_obj / per_frame:.1f} object-poses/s", flush=True)


if __name__ == "__main__":
    main()
