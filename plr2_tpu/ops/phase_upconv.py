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


def _phase_conv_grid(x, kernel):
    """x (B,h,w,Cin), kernel (3,3,Cin,Cout) f32 ->
    (B, h, w, 2, 2, Cout) phase grid == conv3x3(upsample2x(x)) reshaped,
    borders exact. Compute dtype follows x; kernel composition is f32."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    wmix = jnp.asarray(_W)  # (2, 3, 3) [phase, u, d]
    dmix = jnp.asarray(_D)  # (2, 2, 3) [first/last, phase, d]

    # (3,3,cin, 2,2,cout): composite kernel per (vertical, horizontal) phase
    kk = jnp.einsum("pud,qve,dexy->uvxpqy", wmix, wmix, kernel)
    kk2d = kk.reshape(3, 3, cin, 4 * cout).astype(x.dtype)
    y = _conv(x, kk2d, (1, 1), (1, 1))  # (B, h, w, 4C)

    # edge corrections: rows 0 / h-1 (vertical delta x horizontal W),
    # cols 0 / w-1 (vertical W x horizontal delta) — one 1D conv each
    # producing all 4 phases at once
    k_row = jnp.einsum("fpd,qve,dexy->fvxpqy", dmix, wmix, kernel)
    k_col = jnp.einsum("pud,fqe,dexy->fuxpqy", wmix, dmix, kernel)
    k_row = k_row.reshape(2, 3, cin, 4 * cout).astype(x.dtype)
    k_col = k_col.reshape(2, 3, cin, 4 * cout).astype(x.dtype)

    def row_corr(which, rows):  # boundary row (B, 1, w, cin) -> (B, 1, w, 4C)
        return _conv(rows, k_row[which][None], (0, 0), (1, 1))

    def col_corr(which, cols):  # boundary col (B, h, 1, cin) -> (B, h, 1, 4C)
        return _conv(cols, k_col[which][:, None], (1, 1), (0, 0))

    c_top, c_bot = row_corr(0, x[:, :1]), row_corr(1, x[:, -1:])
    d_lft, d_rgt = col_corr(0, x[:, :, :1]), col_corr(1, x[:, :, -1:])

    # corner second-order terms (D ⊗ D on the 4 corner pixels), folded
    # into the row strips (tiny at-adds on (B,1,w,4C) are cheap)
    k_corner = jnp.einsum("fpd,gqe,dexy->fgxpqy", dmix, dmix, kernel)
    k_corner = k_corner.reshape(2, 2, cin, 4 * cout).astype(x.dtype)
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
    return y.reshape(b, h, w, 2, 2, cout)


def phase_upconv3x3_prelu(x, kernel, bias, prelu_alpha):
    """PSPUpsample stage: (B,h,w,Cin) -> (B,2h,2w,Cout).

    Equals prelu(conv3x3(upsample2x(x)) + bias) exactly (f32)."""
    b, h, w, _ = x.shape
    cout = kernel.shape[-1]
    y = _phase_conv_grid(x, kernel) + bias
    y = jnp.where(y >= 0, y, prelu_alpha * y)
    # depth-to-space: (B,h,w,2,2,C) -> (B,2h,2w,C)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, cout)


def phase_upconv3x3_prelu_gather(x, kernel, bias, prelu_alpha, choose):
    """Same stage, but returns only the rows at `choose` (B, N) flat
    indices into the (2h x 2w) output — the depth-to-space never happens;
    chosen pixels are gathered phase-aware from the low-res phase grid."""
    b, h, w, _ = x.shape
    cout = kernel.shape[-1]
    y = _phase_conv_grid(x, kernel)  # (B, h, w, 2, 2, C)
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
