"""Phase-decomposed 2x-upsample + 3x3 conv (+ PReLU): the PSPUpsample stage
without ever materializing the 2x-upsampled map.

`conv3x3(zero-pad) ∘ upsample2x(half-pixel bilinear, clamped)` is a linear
operator whose output at phase (p, q) = (row%2, col%2) depends only on a
3x3 window of the LOW-resolution input. So the whole stage is ONE low-res
3x3 conv with 4 composite phase kernels, a depth-to-space, and exact
closed-form border corrections (the bilinear clamp at the first/last
row/col changes the effective kernel there).

Why this beats the naive composition on TPU (measured, v5e, batch 64):
  * the 2x map (e.g. 160x160x64 -> 210 MB bf16 at batch 64) never hits HBM;
  * the conv runs with 4x the output channels at 1/4 the positions — for
    the 64-channel stages that turns a half-MXU-tile Cout=64 conv into a
    full-tile Cout=256 one (up_2/up_3 measured ~35% MXU on the naive path).

Composite kernels: with per-dimension mixing matrices W_p[u, d] mapping
original kernel taps d to composite taps u (derived from the half-pixel
2-tap blend: up[2i] = .25 x[i-1] + .75 x[i], up[2i+1] = .75 x[i] + .25
x[i+1]), K_pq = (W_p ⊗ W_q) · k. Border rows/cols add a rank-1 delta
(D_first / D_last) because the clamped taps re-weight the boundary pixel;
corners add the second-order (D ⊗ D) term.

Replaces the reference's `PSPUpsample` compute (upstream lib/pspnet.py
[upstream, mount empty]) bit-for-bit at f32 (pinned in tests/test_models).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# rows: composite tap u in {-1,0,1}; cols: original tap d in {-1,0,1}
_W = np.array([
    [[0.75, 0.25, 0.0],
     [0.25, 0.75, 0.75],
     [0.0, 0.0, 0.25]],   # phase 0 (even output row/col)
    [[0.25, 0.0, 0.0],
     [0.75, 0.75, 0.25],
     [0.0, 0.25, 0.75]],  # phase 1 (odd)
], dtype=np.float32)

# boundary deltas applied to the boundary source row/col (per phase):
# first index 0 -> first row/col, 1 -> last row/col
_D = np.array([
    [[-0.25, 0.25, 0.0],   # first, phase 0: +.25 (k1 - k0)
     [0.25, 0.0, 0.0]],    # first, phase 1: +.25 k0
    [[0.0, 0.0, 0.25],     # last, phase 0: +.25 k2
     [0.0, 0.25, -0.25]],  # last, phase 1: +.25 (k1 - k2)
], dtype=np.float32)


def _conv(x, k, pad_h, pad_w):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [pad_h, pad_w],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def _compose_kernels(x_dtype, kernel):
    """Original (3,3,Cin,Cout) kernel -> the four composite kernels.

    Linear einsums (autodiff-safe); composition stays f32 even when the
    compute dtype is bf16 — mixing in f32, single cast at the end."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    wmix = jnp.asarray(_W)  # (2, 3, 3) [phase, u, d]
    dmix = jnp.asarray(_D)  # (2, 2, 3) [first/last, phase, d]

    # (3,3,cin, 2,2,cout): composite kernel per (vertical, horizontal) phase
    kk = jnp.einsum("pud,qve,dexy->uvxpqy", wmix, wmix, kernel)
    kk2d = kk.reshape(3, 3, cin, 4 * cout).astype(x_dtype)
    # edge corrections: rows 0 / h-1 (vertical delta x horizontal W),
    # cols 0 / w-1 (vertical W x horizontal delta)
    k_row = jnp.einsum("fpd,qve,dexy->fvxpqy", dmix, wmix, kernel)
    k_col = jnp.einsum("pud,fqe,dexy->fuxpqy", wmix, dmix, kernel)
    k_row = k_row.reshape(2, 3, cin, 4 * cout).astype(x_dtype)
    k_col = k_col.reshape(2, 3, cin, 4 * cout).astype(x_dtype)
    # corner second-order terms (D ⊗ D on the 4 corner pixels)
    k_corner = jnp.einsum("fpd,gqe,dexy->fgxpqy", dmix, dmix, kernel)
    k_corner = k_corner.reshape(2, 2, cin, 4 * cout).astype(x_dtype)
    return kk2d, k_row, k_col, k_corner


def _phase_conv_flat_impl(x, kk2d, k_row, k_col, k_corner):
    """x (B,h,w,Cin) + composite kernels -> flat phase map (B,h,w,4C)."""
    b, h, w, cin = x.shape
    y = _conv(x, kk2d, (1, 1), (1, 1))  # (B, h, w, 4C)

    def row_corr(which, rows):  # boundary row (B, 1, w, cin) -> (B, 1, w, 4C)
        return _conv(rows, k_row[which][None], (0, 0), (1, 1))

    def col_corr(which, cols):  # boundary col (B, h, 1, cin) -> (B, h, 1, 4C)
        return _conv(cols, k_col[which][:, None], (1, 1), (0, 0))

    c_top, c_bot = row_corr(0, x[:, :1]), row_corr(1, x[:, -1:])
    d_lft, d_rgt = col_corr(0, x[:, :, :1]), col_corr(1, x[:, :, -1:])

    # corner terms folded into the row strips (tiny at-adds on
    # (B,1,w,4C) are cheap)
    corner = lambda fi, gi, ri, ci: jnp.einsum(
        "bx,xc->bc", x[:, ri, ci], k_corner[fi, gi])
    c_top = c_top.at[:, 0, 0].add(corner(0, 0, 0, 0))
    c_top = c_top.at[:, 0, -1].add(corner(0, 1, 0, -1))
    c_bot = c_bot.at[:, 0, 0].add(corner(1, 0, -1, 0))
    c_bot = c_bot.at[:, 0, -1].add(corner(1, 1, -1, -1))

    # in-place adds on the FLAT (B, h, w, 4C) map: boundary-only HBM
    # traffic, and the 4C=256+ trailing dim keeps clean (8,128) tiles.
    # (On the 6-D (..., 2, 2, C) view the same .at adds cost ~0.75 ms
    # each — the (2, 2, C) trailing dims pad 2 -> 8 sublanes; full-map
    # strip adds / concat assembly cost ~1-2 extra full-map HBM passes.)
    y = y.at[:, :1].add(c_top)
    y = y.at[:, -1:].add(c_bot)
    y = y.at[:, :, :1].add(d_lft)
    y = y.at[:, :, -1:].add(d_rgt)
    return y


# Scan-safe variant: custom_vjp with a hand-derived linear transpose.
# Autodiff's wgrad for the main 3x3 conv is an image-sized-window
# convolution that XLA's space_to_batch_converter pass aborts on when it
# appears inside the fused accumulation grad-scan at crop >= 160
# (remote-compiler Check failure, space_to_batch_converter.cc:543, v5e /
# jax 0.9.0 — train/fused_trainer.py history, docs/PERF_NOTES.md). The
# backward here contains only plain 3x3/1x3/3x1 dgrad convs (same
# geometry as the forward) and nine shifted (Cin x 4Cout) MXU einsums
# for the weight grads — no wgrad conv for that pass to rewrite.
# Gradient semantics are unchanged (all ops are linear; the transpose is
# exact math), pinned against the dense path's autodiff in
# tests/test_models.py and inside the grad-scan in
# tests/test_fused_accum.py. OPT-IN (scan_safe_vjp=...): in the plain
# batched training step autodiff's one-conv wgrad measures ~3 ms/step
# faster than the nine-einsum form (batch 32 bf16: 46.9 vs 50.2
# ms/step), so the batched path keeps autodiff and only scan contexts
# route here — the same measured-dispatch convention as ops/knn.py.
_phase_conv_flat_cv = jax.custom_vjp(_phase_conv_flat_impl)


def _phase_conv_flat_fwd(x, kk2d, k_row, k_col, k_corner):
    return (_phase_conv_flat_impl(x, kk2d, k_row, k_col, k_corner),
            (x, kk2d, k_row, k_col, k_corner))


def _phase_conv_flat_bwd(res, dy):
    x, kk2d, k_row, k_col, k_corner = res
    b, h, w, cin = x.shape

    # ---- dx: transposes of the stride-1 convs = convs with spatially
    # flipped, IO-swapped kernels (plain small-window dgrads).
    kt = kk2d[::-1, ::-1].transpose(0, 1, 3, 2)  # (3, 3, 4C, cin)
    dx = _conv(dy, kt, (1, 1), (1, 1))
    dy_top, dy_bot = dy[:, :1], dy[:, -1:]
    dy_lft, dy_rgt = dy[:, :, :1], dy[:, :, -1:]
    krt = lambda i: k_row[i][::-1].transpose(0, 2, 1)[None]   # (1,3,4C,cin)
    kct = lambda i: k_col[i][::-1].transpose(0, 2, 1)[:, None]  # (3,1,4C,cin)
    dx = dx.at[:, :1].add(_conv(dy_top, krt(0), (0, 0), (1, 1)))
    dx = dx.at[:, -1:].add(_conv(dy_bot, krt(1), (0, 0), (1, 1)))
    dx = dx.at[:, :, :1].add(_conv(dy_lft, kct(0), (1, 1), (0, 0)))
    dx = dx.at[:, :, -1:].add(_conv(dy_rgt, kct(1), (1, 1), (0, 0)))
    corners = (((0, 0), (0, 0)), ((0, 1), (0, -1)),
               ((1, 0), (-1, 0)), ((1, 1), (-1, -1)))
    for (fi, gi), (r, c) in corners:
        dx = dx.at[:, r, c].add(jnp.einsum(
            "bc,xc->bx", dy[:, r, c], k_corner[fi, gi]))

    # ---- weight grads: shifted whole-map einsums (MXU contractions over
    # B*h*w) instead of the image-window wgrad conv autodiff would emit.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dkk2d = jnp.stack([
        jnp.stack([jnp.einsum("bhwc,bhwd->cd", xp[:, u:u + h, v:v + w], dy)
                   for v in range(3)])
        for u in range(3)])  # (3, 3, cin, 4C)

    def edge_wgrad(strip, dy_strip, n):  # strip (B, n, cin), dy (B, n, 4C)
        sp = jnp.pad(strip, ((0, 0), (1, 1), (0, 0)))
        return jnp.stack([jnp.einsum("bwc,bwd->cd", sp[:, v:v + n], dy_strip)
                          for v in range(3)])  # (3, cin, 4C)

    dk_row = jnp.stack([edge_wgrad(x[:, 0], dy[:, 0], w),
                        edge_wgrad(x[:, -1], dy[:, -1], w)])
    dk_col = jnp.stack([edge_wgrad(x[:, :, 0], dy[:, :, 0], h),
                        edge_wgrad(x[:, :, -1], dy[:, :, -1], h)])
    dk_corner = jnp.stack([
        jnp.stack([jnp.einsum("bx,bc->xc", x[:, r, c], dy[:, r, c])
                   for (fi, gi), (r, c) in corners if fi == f])
        for f in (0, 1)])  # (2, 2, cin, 4C)
    return dx, dkk2d, dk_row, dk_col, dk_corner


_phase_conv_flat_cv.defvjp(_phase_conv_flat_fwd, _phase_conv_flat_bwd)


def _phase_conv_grid(x, kernel, scan_safe_vjp=False):
    """x (B,h,w,Cin), kernel (3,3,Cin,Cout) f32 ->
    (B, h, w, 2, 2, Cout) phase grid == conv3x3(upsample2x(x)) reshaped,
    borders exact. Compute dtype follows x; kernel composition is f32.
    scan_safe_vjp routes the backward through the hand-derived transpose
    (see _phase_conv_flat_cv) — required inside grad-scans at large
    crops, slightly slower in the plain batched step."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    kk2d, k_row, k_col, k_corner = _compose_kernels(x.dtype, kernel)
    f = _phase_conv_flat_cv if scan_safe_vjp else _phase_conv_flat_impl
    y = f(x, kk2d, k_row, k_col, k_corner)
    return y.reshape(b, h, w, 2, 2, cout)


def phase_upconv3x3_prelu(x, kernel, bias, prelu_alpha,
                          scan_safe_vjp=False):
    """PSPUpsample stage: (B,h,w,Cin) -> (B,2h,2w,Cout).

    Equals prelu(conv3x3(upsample2x(x)) + bias) exactly (f32)."""
    b, h, w, _ = x.shape
    cout = kernel.shape[-1]
    y = _phase_conv_grid(x, kernel, scan_safe_vjp) + bias
    y = jnp.where(y >= 0, y, prelu_alpha * y)
    # depth-to-space: (B,h,w,2,2,C) -> (B,2h,2w,C)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, cout)


def phase_upconv3x3_prelu_gather(x, kernel, bias, prelu_alpha, choose,
                                 scan_safe_vjp=False):
    """Same stage, but returns only the rows at `choose` (B, N) flat
    indices into the (2h x 2w) output — the depth-to-space never happens;
    chosen pixels are gathered phase-aware from the low-res phase grid."""
    b, h, w, _ = x.shape
    cout = kernel.shape[-1]
    y = _phase_conv_grid(x, kernel, scan_safe_vjp)  # (B, h, w, 2, 2, C)
    big_w = 2 * w
    r = (choose // big_w).astype(jnp.int32)
    c = (choose % big_w).astype(jnp.int32)
    # gather WIDE rows (all 4 phases = 4C channels) at the low-res pixel,
    # then contract the phase with a one-hot — rows of C=64 are half a
    # lane tile and gather ~15% slower (tools/bench_gather.py)
    low = (r // 2) * w + (c // 2)
    phase = (r % 2) * 2 + (c % 2)
    ywide = y.reshape(b, h * w, 4 * cout)
    # one-hot MXU backward: the scatter-add transpose of this gather costs
    # 2.4x more at training shapes (ops/gather.py)
    from plr2_tpu.ops.gather import gather_rows
    g = gather_rows(ywide, low)  # (B, N, 4C)
    onehot = jax.nn.one_hot(phase, 4, dtype=y.dtype)  # (B, N, 4)
    g = jnp.einsum("bnpc,bnp->bnc", g.reshape(b, -1, 4, cout), onehot)
    g = g + bias
    return jnp.where(g >= 0, g, prelu_alpha * g)
