"""Loss tests against an independent NumPy oracle implementing the
reference semantics (per-point hypotheses, confidence weighting, ADD-S via
brute-force nearest neighbour, best-hypothesis re-centring)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plr2_tpu.losses import pose_loss, refine_loss
from plr2_tpu.ops import chamfer_min_distance, nn_distance_xla, nn_index, pairwise_sq_dist


def _np_quat_to_mat(q):
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    m = np.empty(q.shape[:-1] + (3, 3))
    m[..., 0, 0] = 1 - 2 * (y * y + z * z)
    m[..., 0, 1] = 2 * (x * y - w * z)
    m[..., 0, 2] = 2 * (x * z + w * y)
    m[..., 1, 0] = 2 * (x * y + w * z)
    m[..., 1, 1] = 1 - 2 * (x * x + z * z)
    m[..., 1, 2] = 2 * (y * z - w * x)
    m[..., 2, 0] = 2 * (x * z - w * y)
    m[..., 2, 1] = 2 * (y * z + w * x)
    m[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return m


def _np_pose_loss(pred_r, pred_t, pred_c, target, model_points, idx, points,
                  w, refine, sym_list):
    """Direct NumPy transcription of the reference loss math (batch loop)."""
    b, n, _ = pred_r.shape
    m = model_points.shape[1]
    all_dis = np.zeros((b, n))
    for bi in range(b):
        rot = _np_quat_to_mat(pred_r[bi])  # (N,3,3)
        t = points[bi] + pred_t[bi]  # (N,3)
        pred = model_points[bi][None] @ rot.transpose(0, 2, 1) + t[:, None, :]
        if (not refine) and (idx[bi] in sym_list):
            # directed chamfer: each pred point to nearest target point
            d2 = ((pred[:, :, None, :] - target[bi][None, None, :, :]) ** 2).sum(-1)
            dis = np.sqrt(d2.min(-1)).mean(-1)
        else:
            dis = np.linalg.norm(pred - target[bi][None], axis=-1).mean(-1)
        all_dis[bi] = dis
    c = pred_c[..., 0]
    loss = np.mean(all_dis * c - w * np.log(c))
    which = c.argmax(1)
    outs = []
    for bi in range(b):
        rot = _np_quat_to_mat(pred_r[bi])[which[bi]]
        t = (points[bi] + pred_t[bi])[which[bi]]
        np_new = (points[bi] - t) @ rot
        nt_new = (target[bi] - t) @ rot
        outs.append((all_dis[bi, which[bi]], np_new, nt_new))
    return loss, outs


@pytest.fixture
def loss_inputs(rng):
    b, n, m = 2, 32, 24
    pred_r = rng.normal(size=(b, n, 4)).astype(np.float32)
    pred_t = (rng.normal(size=(b, n, 3)) * 0.01).astype(np.float32)
    pred_c = rng.uniform(0.1, 0.9, size=(b, n, 1)).astype(np.float32)
    model_points = rng.normal(size=(b, m, 3)).astype(np.float32) * 0.05
    points = rng.normal(size=(b, n, 3)).astype(np.float32)
    rot_gt = _np_quat_to_mat(rng.normal(size=(b, 4)))
    t_gt = rng.normal(size=(b, 1, 3)) * 0.1
    target = (model_points @ rot_gt.transpose(0, 2, 1) + t_gt).astype(np.float32)
    idx = np.array([1, 7], dtype=np.int32)  # sample 1 is "symmetric" (7 in list)
    return pred_r, pred_t, pred_c, target, model_points, idx, points


@pytest.mark.parametrize("refine", [False, True])
def test_pose_loss_matches_numpy_oracle(loss_inputs, refine):
    pred_r, pred_t, pred_c, target, model_points, idx, points = loss_inputs
    w, sym = 0.015, (7, 8)
    ref_loss, ref_outs = _np_pose_loss(
        pred_r, pred_t, pred_c, target, model_points, idx, points, w, refine, sym)
    out = pose_loss(
        *map(jnp.asarray, (pred_r, pred_t, pred_c, target, model_points, idx, points)),
        w=w, refine=refine, sym_list=sym)
    np.testing.assert_allclose(float(out.loss), ref_loss, rtol=2e-5)
    for bi, (rd, rnp, rnt) in enumerate(ref_outs):
        np.testing.assert_allclose(float(out.dis[bi]), rd, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(out.new_points)[bi], rnp, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.new_target)[bi], rnt, atol=2e-5)


def test_pose_loss_grad_finite_and_flows(loss_inputs):
    pred_r, pred_t, pred_c, target, model_points, idx, points = loss_inputs

    def f(r, t, c):
        return pose_loss(r, t, c, *map(jnp.asarray, (target, model_points, idx, points)),
                         w=0.015, refine=False, sym_list=(7, 8)).loss

    gr, gt, gc = jax.grad(f, argnums=(0, 1, 2))(
        *map(jnp.asarray, (pred_r, pred_t, pred_c)))
    for g in (gr, gt, gc):
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0


def test_refine_loss_matches_oracle(loss_inputs, rng):
    _, _, _, target, model_points, idx, points = loss_inputs
    b = target.shape[0]
    pred_r = rng.normal(size=(b, 1, 4)).astype(np.float32)
    pred_t = (rng.normal(size=(b, 1, 3)) * 0.05).astype(np.float32)
    sym = (7, 8)

    out = refine_loss(
        *map(jnp.asarray, (pred_r, pred_t, target, model_points, idx, points)),
        sym_list=sym)

    for bi in range(b):
        rot = _np_quat_to_mat(pred_r[bi, 0])
        t = pred_t[bi, 0]
        pred = model_points[bi] @ rot.T + t
        if idx[bi] in sym:
            d2 = ((pred[:, None, :] - target[bi][None, :, :]) ** 2).sum(-1)
            dis = np.sqrt(d2.min(-1)).mean()
        else:
            dis = np.linalg.norm(pred - target[bi], axis=-1).mean()
        np.testing.assert_allclose(float(out.dis[bi]), dis, rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(out.new_points)[bi], (points[bi] - t) @ rot, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(out.new_target)[bi], (target[bi] - t) @ rot, atol=2e-5)


def test_chamfer_chunked_equals_direct(rng):
    pred = jnp.asarray(rng.normal(size=(300, 16, 3)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(24, 3)).astype(np.float32))
    direct = jnp.sqrt(jnp.min(pairwise_sq_dist(pred, target[None]), axis=-1))
    chunked = nn_distance_xla(pred, target)  # 300 rows -> 3 chunks of 128
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(direct), atol=1e-5)


def test_nn_distance_custom_vjp_matches_autodiff(rng):
    """The closed-form custom_vjp backward must equal autodiff through the
    argmin-gather formulation — including exact-coincidence rows (d = 0,
    zero subgradient) and the chunked path (H > 128)."""
    pred_np = rng.normal(size=(150, 6, 3)).astype(np.float32)
    target = jnp.asarray(rng.normal(size=(12, 3)).astype(np.float32))
    pred_np[0, 0] = np.asarray(target[3])  # exact coincidence -> d == 0
    pred = jnp.asarray(pred_np)
    cot = jnp.asarray(rng.normal(size=(150, 6)).astype(np.float32))

    def autodiff_ref(p):
        def block(bl):
            idx = jnp.argmin(pairwise_sq_dist(bl, target[None]), axis=-1)
            matched = jnp.take(jax.lax.stop_gradient(target), idx, axis=0)
            d = jnp.sum((bl - matched) ** 2, axis=-1)
            pos = d > 0
            return jnp.sqrt(jnp.where(pos, d, 1.0)) * pos
        return jnp.sum(block(p) * cot)

    g_ref = jax.grad(autodiff_ref)(pred)
    g_new = jax.grad(lambda p: jnp.sum(nn_distance_xla(p, target) * cot))(pred)
    assert bool(jnp.isfinite(g_new).all())
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), atol=1e-5)
    # values identical too
    np.testing.assert_allclose(
        np.asarray(nn_distance_xla(pred, target)),
        np.asarray(jnp.sqrt(jnp.min(pairwise_sq_dist(pred, target[None]), -1))),
        atol=1e-5)


def test_nn_index_matches_bruteforce(rng):
    a = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
    inds = np.asarray(nn_index(a, b))
    brute = ((np.asarray(a)[:, None, :] - np.asarray(b)[None]) ** 2).sum(-1).argmin(-1)
    np.testing.assert_array_equal(inds, brute)


def test_chamfer_gradient_matches_gather_through_argmin(rng):
    """jnp.min subgradient == reference's gather-through-argmin backward."""
    pred = jnp.asarray(rng.normal(size=(1, 8, 3)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(12, 3)).astype(np.float32))

    g_min = jax.grad(lambda p: jnp.sum(chamfer_min_distance(p, target)))(pred)

    def gathered(p):
        inds = nn_index(p[0], target)
        matched = target[inds]
        return jnp.sum(jnp.linalg.norm(p[0] - matched, axis=-1))

    g_gather = jax.grad(gathered)(pred)
    np.testing.assert_allclose(np.asarray(g_min), np.asarray(g_gather), atol=1e-5)


def test_gradients_finite_at_exact_coincidence(rng):
    """Regression: when a predicted point coincides exactly with a target
    point, the clamped pairwise d^2 hits exact zero and naive sqrt/norm
    gradients are NaN; the NaN then leaks through the ADD/ADD-S jnp.where
    select even for NON-symmetric samples. safe_norm must keep all
    gradients finite (torch.norm's zero-subgradient convention)."""
    b, n, m = 1, 4, 6
    model_points = jnp.asarray(rng.normal(size=(b, m, 3)).astype(np.float32) * 0.05)
    points = jnp.zeros((b, n, 3), jnp.float32)
    # identity quaternion, zero translation -> pred == model_points exactly
    pred_r = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (b, n, 1))
    pred_t = jnp.zeros((b, n, 3), jnp.float32)
    pred_c = jnp.full((b, n, 1), 0.5, jnp.float32)
    target = model_points  # exact coincidence
    idx = jnp.zeros((b,), jnp.int32)  # NOT in sym_list

    def f(pr, pt, pc):
        return pose_loss(pr, pt, pc, target, model_points, idx, points,
                         w=0.015, refine=False, sym_list=(7, 8)).loss

    gr, gt, gc = jax.grad(f, argnums=(0, 1, 2))(pred_r, pred_t, pred_c)
    for g in (gr, gt, gc):
        assert bool(jnp.isfinite(g).all()), g

    # refiner loss at exact coincidence
    def fr(pr, pt):
        return jnp.sum(refine_loss(pr, pt, target, model_points, idx, points,
                                   sym_list=(7, 8)).dis)

    g2 = jax.grad(fr, argnums=(0, 1))(pred_r[:, :1], pred_t[:, :1])
    for g in g2:
        assert bool(jnp.isfinite(g).all())


def test_safe_norm_matches_torch_convention(rng):
    from plr2_tpu.ops.knn import safe_norm
    x = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(safe_norm(x)),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-6)
    g = jax.grad(lambda v: jnp.sum(safe_norm(v)))(jnp.zeros((2, 3)))
    np.testing.assert_array_equal(np.asarray(g), 0.0)


# ---------------- torch oracle for the full loss chain ----------------
# Differentiable transcription of the reference loss semantics
# (lib/loss.py loss_calculation + lib/loss_refiner.py [upstream, mount
# empty]) in torch: unlike the NumPy oracle above, this also pins the
# GRADIENTS of the chained loss, exercising the same autograd conventions
# (norm/min subgradients) the reference trained with.

def _t_quat_to_mat(q):
    import torch
    q = q / q.norm(dim=-1, keepdim=True)
    w, x, y, z = q.unbind(-1)
    return torch.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], dim=-1).reshape(q.shape[:-1] + (3, 3))


def _t_pose_loss(pred_r, pred_t, pred_c, target, model_points, idx, points,
                 w, refine, sym_list):
    import torch
    b, n, _ = pred_r.shape
    losses, outs = [], []
    for bi in range(b):
        rot = _t_quat_to_mat(pred_r[bi])                     # (N,3,3)
        t = points[bi] + pred_t[bi]                          # (N,3)
        pred = model_points[bi][None] @ rot.transpose(1, 2) + t[:, None, :]
        if (not refine) and (int(idx[bi]) in sym_list):
            d2 = ((pred[:, :, None, :] - target[bi][None, None]) ** 2).sum(-1)
            dis = d2.min(-1).values.clamp_min(1e-18).sqrt().mean(-1)
        else:
            dis = (pred - target[bi][None]).norm(dim=-1).mean(-1)
        c = pred_c[bi, :, 0]
        losses.append((dis * c - w * torch.log(c)).mean())
        which = int(c.argmax())
        rot_b = rot[which].detach()
        t_b = t[which].detach()
        outs.append((dis[which], (points[bi] - t_b) @ rot_b,
                     (target[bi] - t_b) @ rot_b))
    return torch.stack(losses).mean(), outs


def _t_refine_loss(pred_r, pred_t, target, model_points, idx, points,
                   sym_list):
    import torch
    b = target.shape[0]
    dis_out, np_out, nt_out = [], [], []
    for bi in range(b):
        rot = _t_quat_to_mat(pred_r[bi, 0])
        t = pred_t[bi, 0]
        pred = model_points[bi] @ rot.T + t
        if int(idx[bi]) in sym_list:
            d2 = ((pred[:, None, :] - target[bi][None]) ** 2).sum(-1)
            dis = d2.min(-1).values.clamp_min(1e-18).sqrt().mean()
        else:
            dis = (pred - target[bi]).norm(dim=-1).mean()
        dis_out.append(dis)
        np_out.append((points[bi] - t.detach()) @ rot.detach())
        nt_out.append((target[bi] - t.detach()) @ rot.detach())
    import torch as _torch
    return (_torch.stack(dis_out), _torch.stack(np_out),
            _torch.stack(nt_out))


def test_loss_chain_matches_torch_oracle(loss_inputs, rng):
    """Full curriculum loss chain — pose_loss(refine=True) feeding two
    chained refine_loss iterations — values AND gradients vs torch."""
    import torch

    pred_r, pred_t, pred_c, target, model_points, idx, points = loss_inputs
    b = target.shape[0]
    sym, w = (7, 8), 0.015
    dr = [rng.normal(size=(b, 1, 4)).astype(np.float32) for _ in range(2)]
    dt = [(rng.normal(size=(b, 1, 3)) * 0.05).astype(np.float32)
          for _ in range(2)]

    # ---- jax: chained total = pose loss + per-iteration mean distances
    def jax_chain(pr, pt, pc, dr0, dt0, dr1, dt1):
        out = pose_loss(pr, pt, pc,
                        *map(jnp.asarray, (target, model_points, idx, points)),
                        w=w, refine=True, sym_list=sym)
        total = out.loss
        new_p, new_t = out.new_points, out.new_target
        for d_r, d_t in ((dr0, dt0), (dr1, dt1)):
            ro = refine_loss(d_r, d_t, new_t,
                             jnp.asarray(model_points), jnp.asarray(idx),
                             new_p, sym_list=sym)
            total = total + jnp.mean(ro.dis)
            new_p, new_t = ro.new_points, ro.new_target
        return total, (new_p, new_t)

    args = tuple(map(jnp.asarray, (pred_r, pred_t, pred_c,
                                   dr[0], dt[0], dr[1], dt[1])))
    (j_total, (j_np, j_nt)), j_grads = jax.value_and_grad(
        jax_chain, argnums=tuple(range(7)), has_aux=True)(*args)

    # ---- torch: same chain
    t_args = [torch.tensor(a, requires_grad=True)
              for a in (pred_r, pred_t, pred_c, dr[0], dt[0], dr[1], dt[1])]
    t_pr, t_pt, t_pc, t_dr0, t_dt0, t_dr1, t_dt1 = t_args
    t_target = torch.tensor(target)
    t_mp = torch.tensor(model_points)
    t_points = torch.tensor(points)
    loss0, outs = _t_pose_loss(t_pr, t_pt, t_pc, t_target, t_mp, idx,
                               t_points, w, True, sym)
    total = loss0
    new_p = torch.stack([o[1] for o in outs])
    new_t = torch.stack([o[2] for o in outs])
    for d_r, d_t in ((t_dr0, t_dt0), (t_dr1, t_dt1)):
        dis, new_p, new_t = _t_refine_loss(d_r, d_t, new_t, t_mp, idx,
                                           new_p, sym)
        total = total + dis.mean()
    total.backward()

    np.testing.assert_allclose(float(j_total), float(total), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(j_np), new_p.detach().numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_nt), new_t.detach().numpy(),
                               atol=2e-5)
    for jg, ta in zip(j_grads, t_args):
        np.testing.assert_allclose(np.asarray(jg), ta.grad.numpy(),
                                   atol=5e-4)


@pytest.mark.parametrize("idx_vals", [(0, 2), (7, 8), (0, 7)])
def test_pose_loss_branch_dispatch_matches_oracle(loss_inputs, idx_vals):
    """The lax.switch distance dispatch (no-sym / all-sym / mixed batches
    compute only what they need) is semantically invisible."""
    pred_r, pred_t, pred_c, target, model_points, _, points = loss_inputs
    idx = np.array(idx_vals, dtype=np.int32)
    w, sym = 0.015, (7, 8)
    ref_loss, ref_outs = _np_pose_loss(
        pred_r, pred_t, pred_c, target, model_points, idx, points, w,
        False, sym)
    out = pose_loss(
        *map(jnp.asarray, (pred_r, pred_t, pred_c, target, model_points,
                           idx, points)),
        w=w, refine=False, sym_list=sym)
    np.testing.assert_allclose(float(out.loss), ref_loss, rtol=2e-5)
    for bi, (rd, _, _) in enumerate(ref_outs):
        np.testing.assert_allclose(float(out.dis[bi]), rd, rtol=2e-4)
    # gradients stay finite through every branch
    g = jax.grad(lambda r: pose_loss(
        r, *map(jnp.asarray, (pred_t, pred_c, target, model_points, idx,
                              points)),
        w=w, refine=False, sym_list=sym).loss)(jnp.asarray(pred_r))
    assert bool(jnp.isfinite(g).all())


# ---------------- compacted mixed-batch ADD-S (max_sym_slots) ----------------


def _loss_inputs_mixed(rng, b=6, n=12, m=10):
    return dict(
        pred_r=jnp.asarray(rng.normal(size=(b, n, 4)).astype(np.float32)),
        pred_t=jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32)) * 0.01,
        pred_c=jnp.asarray(rng.uniform(0.2, 0.9, size=(b, n, 1)).astype(np.float32)),
        target=jnp.asarray(rng.normal(size=(b, m, 3)).astype(np.float32)) * 0.05,
        model_points=jnp.asarray(rng.normal(size=(b, m, 3)).astype(np.float32)) * 0.05,
        points=jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32)) * 0.05,
    )


@pytest.mark.parametrize("idx_row", [
    [0, 1, 2, 0, 1, 2],   # 2 sym of 6 (idx 0 is sym) -> compact fires
    [0, 0, 0, 0, 0, 1],   # 5 sym > 4 slots -> falls back to full mixed
    [1, 2, 1, 2, 1, 2],   # no sym
    [0, 0, 0, 0, 0, 0],   # all sym
])
def test_pose_loss_sym_slots_matches_full(rng, idx_row):
    kw = _loss_inputs_mixed(rng)
    idx = jnp.asarray(idx_row, dtype=jnp.int32)
    full = pose_loss(idx=idx, w=0.015, refine=False, sym_list=(0,), **kw)
    comp = pose_loss(idx=idx, w=0.015, refine=False, sym_list=(0,),
                     max_sym_slots=4, **kw)
    np.testing.assert_allclose(float(comp.loss), float(full.loss), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(comp.dis), np.asarray(full.dis),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(comp.new_points),
                               np.asarray(full.new_points), rtol=1e-6)


def test_pose_loss_sym_slots_gradients_match(rng):
    kw = _loss_inputs_mixed(rng)
    idx = jnp.asarray([0, 1, 2, 0, 1, 2], dtype=jnp.int32)

    def f(slots, r, t, c):
        return pose_loss(pred_r=r, pred_t=t, pred_c=c,
                         target=kw["target"], model_points=kw["model_points"],
                         idx=idx, points=kw["points"], w=0.015, refine=False,
                         sym_list=(0,), max_sym_slots=slots).loss

    args = (kw["pred_r"], kw["pred_t"], kw["pred_c"])
    g_full = jax.grad(lambda *a: f(None, *a), argnums=(0, 1, 2))(*args)
    g_comp = jax.grad(lambda *a: f(4, *a), argnums=(0, 1, 2))(*args)
    for gf, gc in zip(g_full, g_comp):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gf),
                                   rtol=1e-5, atol=1e-7)
