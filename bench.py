"""Benchmark: RGB-D pose-estimation throughput (PoseNet + 2-iter refine).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference pipeline runs ~33 frames/s on its GPU (DenseFusion
paper runtime: ~0.02 s estimation + ~0.01 s refine per frame; BASELINE.md).
vs_baseline = measured frames/s / 33.3.

Default mode is the bf16 fast-inference path (the f32 tree is the
reference-parity training mode; `--f32` benches it) with the
phase-decomposed PSP upsample stages (ops/phase_upconv.py; `--no-phase`
disables: measured 2582 vs 2437 f/s at batch 128, 2229 vs 2176 at 64).
`--pallas` swaps the pose-head MLP ladders and PSP upsample stages to the
hand-written Pallas kernels — measured on v5e (batch 64): bf16 2154 f/s
plain XLA, 2034 with the Pallas heads, 1956 with heads+upsample kernels;
XLA's fused bf16 matmul/conv schedules win end-to-end, so the kernels
stay opt-in (docs/PERF_NOTES.md has the full matrix).

Measurement methodology (important on this environment): the TPU is
reached through a relay with ~30-60 ms per-dispatch latency, and
`block_until_ready` does not reflect remote completion. So the benchmark
runs K chained pipeline iterations INSIDE one jitted `lax.fori_loop`
(each iteration's input is perturbed by the previous output, forcing
serial execution), fetches a few output bytes to the host to guarantee
completion, and subtracts the measured constant dispatch+fetch overhead.

Flagship config: YCB-scale model (21 objects, 1000 points, 160x160 crops),
batched inference on one chip.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from plr2_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

REFERENCE_FPS = 33.3  # DenseFusion paper runtime on its GPU (BASELINE.md)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 128  # measured optimum (64: 2229,
    # 128: 2582, 256: 2454 f/s — bf16+phase, v5e)
    inner = int(args[1]) if len(args) > 1 else 10
    use_bf16 = "--f32" not in sys.argv
    use_pallas = "--pallas" in sys.argv
    no_phase = "--no-phase" in sys.argv
    crop, n_points, num_objects = 160, 1000, 21

    from plr2_tpu.pipeline import DenseFusionPipeline

    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    pipe = DenseFusionPipeline(num_points=n_points, num_objects=num_objects,
                               dtype=dtype, use_pallas=use_pallas,
                               phase_upsample=not (no_phase or use_pallas))
    variables = pipe.init(jax.random.key(0), crop_hw=crop, batch=1)
    if use_bf16:
        variables = pipe.cast_variables(variables)
    ks = jax.random.split(jax.random.key(1), 3)
    img = jax.random.normal(ks[0], (batch, crop, crop, 3), jnp.float32)
    points = jax.random.normal(ks[1], (batch, n_points, 3)) * 0.1
    choose = jax.random.randint(ks[2], (batch, n_points), 0, crop * crop)
    obj = jnp.arange(batch, dtype=jnp.int32) % num_objects

    @jax.jit
    def run_loop(variables, img, points, choose, obj):
        def body(i, carry):
            q_prev, t_prev = carry
            # chain: perturb the image by the previous result so XLA must
            # execute iterations serially (no elision/overlap)
            im = img + q_prev[0, 0] * 1e-9
            est = pipe.estimate(variables, im, points, choose, obj,
                                refine_iterations=2)
            return est.quat.astype(dtype), est.trans.astype(dtype)
        q, t = jax.lax.fori_loop(0, inner, body,
                                 (jnp.zeros((batch, 4), dtype),
                                  jnp.zeros((batch, 3), dtype)))
        return q[0], t[0]

    @jax.jit
    def null_prog(img):
        return img[0, 0, 0, 0] * 2.0

    # warm both programs (fetch forces real completion)
    np.asarray(run_loop(variables, img, points, choose, obj)[0])
    np.asarray(null_prog(img))

    # constant per-dispatch+fetch overhead through the relay
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(null_prog(img))
    overhead = (time.perf_counter() - t0) / 3

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(run_loop(variables, img, points, choose, obj)[0])
    total = (time.perf_counter() - t0) / reps

    compute_s = max(total - overhead, 1e-9)
    fps = batch * inner / compute_s

    # MFU: analytic FLOP count of ONE pipeline step from XLA's cost
    # analysis on the compiled per-step module — the chained loop's
    # while-op body would be counted once, not inner times, so the
    # per-step program is the honest unit (Lowered.cost_analysis()
    # returns None on this backend; the compiled executable's works, and
    # the one-time compile lands in the persistent cache). Peak ref: v5e
    # bf16 MXU ~197 TFLOP/s (matches the measured 161 TF/s on the 8k^3
    # sanity loop at ~82%, docs/PERF_NOTES.md). The same peak applies to
    # the --f32 mode: its matmuls run at DEFAULT precision (bf16
    # operands, f32 accumulate — single MXU pass; TPU semantics), and
    # only the small HIGHEST metric ops are multi-pass. Measured proof:
    # f32 mode sustains 102 TF/s, above any "half peak" a multi-pass
    # assumption would allow.
    # `--skip-mfu` skips the separate per-step lower+compile (cold-cache
    # cost ~5-10 min via the remote compiler); the throughput line alone
    # still satisfies the driver contract.
    peak_tflops = 197.0
    tflops = pct_peak = gflop_frame = None
    if "--skip-mfu" not in sys.argv:
        try:
            est = jax.jit(lambda v, im, p, ch, o: pipe.estimate(
                v, im, p, ch, o, refine_iterations=2))
            ca = est.lower(variables, img, points, choose,
                           obj).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) if ca else 0.0
            if flops > 0:
                gflop_frame = flops / batch / 1e9
                tflops = gflop_frame * fps / 1e3
                pct_peak = 100.0 * tflops / peak_tflops
        except Exception:
            pass  # cost analysis is best-effort; throughput line stands

    line = {
        "metric": "rgbd_frames_per_sec_per_chip_posenet_2iter_refine",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
    }
    if tflops is not None:
        line["gflop_per_frame"] = round(gflop_frame, 2)
        line["achieved_tflops"] = round(tflops, 1)
        line["peak_tflops_ref"] = peak_tflops
        line["pct_peak"] = round(pct_peak, 1)
        # pct_peak's numerator is XLA cost_analysis TOTAL flops (all ops,
        # not just matmuls), so it reads modestly high vs conventional
        # model-matmul-FLOP MFU (ADVICE r4).
        line["flop_basis"] = "xla_cost_analysis_total"
    print(json.dumps(line))


if __name__ == "__main__":
    main()
