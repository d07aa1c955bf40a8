"""Benchmark: RGB-D pose-estimation throughput (PoseNet + 2-iter refine).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference pipeline runs ~33 frames/s on its GPU (DenseFusion
paper runtime: ~0.02 s estimation + ~0.01 s refine per frame; BASELINE.md).
vs_baseline = measured frames/s / 33.3.

Flagship config: YCB-scale model (21 objects, 1000 points, 160x160 crops),
batched inference on one chip.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from plr2_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

REFERENCE_FPS = 33.3  # DenseFusion paper runtime on its GPU (BASELINE.md)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    crop, n_points, num_objects = 160, 1000, 21

    from plr2_tpu.pipeline import DenseFusionPipeline

    pipe = DenseFusionPipeline(num_points=n_points, num_objects=num_objects)
    variables = pipe.init(jax.random.key(0), crop_hw=crop, batch=1)
    ks = jax.random.split(jax.random.key(1), 3)
    img = jax.random.normal(ks[0], (batch, crop, crop, 3), jnp.float32)
    points = jax.random.normal(ks[1], (batch, n_points, 3)) * 0.1
    choose = jax.random.randint(ks[2], (batch, n_points), 0, crop * crop)
    obj = jnp.arange(batch, dtype=jnp.int32) % num_objects

    def run():
        return pipe.estimate(variables, img, points, choose, obj,
                             refine_iterations=2)

    # warmup / compile
    est = run()
    est.quat.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        est = run()
    est.quat.block_until_ready()
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(json.dumps({
        "metric": "rgbd_frames_per_sec_per_chip_posenet_2iter_refine",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
