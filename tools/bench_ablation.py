#!/usr/bin/env python
"""Pipeline stage ablation benchmark: where does the frame time go?

Times the flagship inference pipeline's stages separately with the
chained-loop methodology (see bench.py): PSPNet color encoder (with the
choose gather), the dense-fusion trunk + pose heads, the 2-iteration
refiner, and the full estimate. Run on TPU:

  python tools/bench_ablation.py [batch]
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


def timed(fn, args, inner=10, reps=3):
    """Chained fori_loop timing; fn(*args, prev_scalar) -> array."""

    @jax.jit
    def loop(*args):
        def body(i, prev):
            out = fn(*args, prev)
            return jnp.asarray(out, jnp.float32).ravel()[0] * 1e-9
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0))

    np.asarray(loop(*args))  # warm

    @jax.jit
    def null_prog(x):
        return jnp.asarray(x, jnp.float32).ravel()[0] * 2.0

    np.asarray(null_prog(args[0]))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(null_prog(args[0]))
    overhead = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(loop(*args))
    total = (time.perf_counter() - t0) / reps
    return max(total - overhead, 1e-9) / inner


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    crop, n_points, num_objects = 160, 1000, 21
    dtype = jnp.bfloat16

    from plr2_tpu.pipeline import DenseFusionPipeline

    pipe = DenseFusionPipeline(num_points=n_points, num_objects=num_objects,
                               dtype=dtype)
    variables = pipe.init(jax.random.key(0), crop_hw=crop, batch=1)
    variables = pipe.cast_variables(variables)
    ks = jax.random.split(jax.random.key(1), 3)
    img = jax.random.normal(ks[0], (batch, crop, crop, 3), jnp.float32)
    points = jax.random.normal(ks[1], (batch, n_points, 3)) * 0.1
    choose = jax.random.randint(ks[2], (batch, n_points), 0, crop * crop)
    obj = jnp.arange(batch, dtype=jnp.int32) % num_objects
    emb = jax.random.normal(ks[1], (batch, n_points, 32), jnp.float32).astype(dtype)

    pn_vars = variables["posenet"]
    cnn_vars = {"params": pn_vars["params"]["cnn"],
                "batch_stats": pn_vars["batch_stats"]["cnn"]}
    from plr2_tpu.models.pspnet import PSPNet
    cnn = PSPNet(emb_dim=32, dtype=dtype)

    def stage_cnn(img, choose, prev):
        return cnn.apply({"params": cnn_vars["params"],
                          "batch_stats": cnn_vars["batch_stats"]},
                         img + prev, choose=choose)

    def stage_posenet(img, points, choose, obj, prev):
        r, t, c, e = pipe.posenet.apply(pn_vars, img + prev, points, choose, obj)
        # consume every output — returning only r lets XLA dead-code-
        # eliminate the t/c head ladders and understates the stage
        return r[0, 0, 0] + t[0, 0, 0] + c[0, 0, 0] + e[0, 0, 0]

    def stage_refiner(points, emb, obj, prev):
        dr, dt = pipe.refiner.apply(variables["refiner"], points + prev, emb, obj)
        return dr[0, 0, 0] + dt[0, 0, 0]

    def stage_full(img, points, choose, obj, prev):
        est = pipe.estimate(variables, img + prev, points, choose, obj,
                            refine_iterations=2)
        return est.quat

    from plr2_tpu.models.posenet import PoseNetFeat

    feat_mod = PoseNetFeat(dtype=dtype)
    fvars = {"params": pn_vars["params"]["feat"]}

    def stage_fusion(points, emb, prev):
        return feat_mod.apply(fvars, points + prev, emb)[0, 0, 0]

    feat = feat_mod.apply(fvars, points, emb)  # (B, N, 1408)

    def stage_heads(feat, obj, prev):
        h = feat + prev
        outs = []
        for tag, od in (("r", 4), ("t", 3), ("c", 1)):
            x = h
            for f, i in ((640, 1), (256, 2), (128, 3)):
                k = pn_vars["params"][f"conv{i}_{tag}"]
                x = jax.nn.relu(x @ k["kernel"] + k["bias"])
            k = pn_vars["params"][f"conv4_{tag}"]
            x = x @ k["kernel"] + k["bias"]
            x = x.reshape(batch, n_points, num_objects, od)
            sel = jnp.broadcast_to(obj[:, None, None, None],
                                   (batch, n_points, 1, od))
            outs.append(jnp.take_along_axis(x, sel, axis=2)[0, 0, 0, 0])
        return outs[0] + outs[1] + outs[2]

    rows = [
        ("pspnet_encoder(img->emb@choose)", stage_cnn, (img, choose)),
        ("fusion_trunk(cloud+emb->1408)", stage_fusion, (points, emb)),
        ("pose_heads(1408->r,t,c,all3)", stage_heads, (feat, obj)),
        ("posenet_full(img->r,t,c)", stage_posenet, (img, points, choose, obj)),
        ("refiner_1iter", stage_refiner, (points, emb, obj)),
        ("estimate_full_2iter_refine", stage_full, (img, points, choose, obj)),
    ]

    if "--encoder" in sys.argv:
        # encoder sub-stages: where do the ~17 ms go?
        from plr2_tpu.models.resnet import DilatedResNet18
        from plr2_tpu.models.pspnet import PSPModule, PSPUpsample

        trunk = DilatedResNet18(dtype=dtype)
        tvars = {"params": cnn_vars["params"]["feats"],
                 "batch_stats": cnn_vars["batch_stats"]["feats"]}

        def stage_trunk(img, prev):
            return trunk.apply(tvars, (img + prev).astype(dtype))

        f8 = trunk.apply(tvars, img.astype(dtype))  # (B, 20, 20, 512)
        psp = PSPModule(dtype=dtype)
        pvars = {"params": cnn_vars["params"]["psp"]}

        def stage_psp(f8, prev):
            return psp.apply(pvars, f8 + prev)

        p0 = psp.apply(pvars, f8)  # (B, 20, 20, 1024)
        ups = []
        cur = p0
        for i, ch in enumerate((256, 64, 64), start=1):
            mod = PSPUpsample(ch, dtype=dtype)
            uvars = {"params": cnn_vars["params"][f"up_{i}"]}
            ups.append((f"up_{i}({cur.shape[1]}->{2*cur.shape[1]}px,"
                        f"{cur.shape[-1]}->{ch}ch)", mod, uvars, cur))
            cur = mod.apply(uvars, cur)

        rows = [("resnet_trunk(160px->20px,512ch)", stage_trunk, (img,)),
                ("psp_module(pool+bottleneck1024)", stage_psp, (f8,))]
        for name, mod, uvars, inp in ups:
            rows.append((name,
                         (lambda m, v: lambda x, prev: m.apply(v, x + prev))(
                             mod, uvars), (inp,)))
            pmod = PSPUpsample(mod.out_channels, dtype=dtype, use_phase=True)
            rows.append((name.replace("(", "_phase("),
                         (lambda m, v: lambda x, prev: m.apply(v, x + prev))(
                             pmod, uvars), (inp,)))
    for name, fn, args in rows:
        s = timed(fn, args)
        print(f"{name:38s} {s * 1e3:8.2f} ms/iter "
              f"({batch / s:9.1f} frames/s)", flush=True)


if __name__ == "__main__":
    main()
