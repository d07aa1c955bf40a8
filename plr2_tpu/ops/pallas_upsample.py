"""Fused `bilinear-2x-upsample + conv3x3 + PReLU` for the PSP decoder.

The reference decoder (upstream lib/pspnet.py PSPUpsample, SURVEY.md
section 2 #2) runs three of these stages per frame. As separate XLA ops
each stage materializes the 2x-upsampled feature map in HBM (e.g. the
first stage's 40x40x1024 map is ~420 MB per 64-frame batch at f32) and
the gather-based `jax.image.resize` is VPU-unfriendly. This module
provides:

* `upsample2x_bilinear` — exact half-pixel (align_corners=False) bilinear
  2x upsample built from shifted adds + interleaving reshapes. No gathers;
  bit-identical to `jax.image.resize(method="linear")` at scale 2. NOTE:
  measured on v5e, XLA lowers the stack+reshape interleave into layout
  copies that are SLOWER inside the full pipeline than the resize gather
  (1.1k vs 1.9k frames/s end to end) — so the XLA model path keeps
  `jax.image.resize`; this function is the semantics oracle.
* `upconv3x3_prelu_xla` — the unfused composition (backward pass, CPU
  path, VMEM-overflow fallback, and correctness oracle).
* `fused_upconv3x3_prelu` — Pallas TPU kernel. The 2x-upsampled map never
  touches HBM, and no Mosaic-unsupported op is needed (no strided stores,
  value dynamic-slices, interleaving reshapes, or >2D-operand matmuls —
  all of which Mosaic rejected in earlier iterations of this kernel):
    - ROW upsample is two shifted-add planes (even/odd output rows) with
      explicit zero rows where the conv reads its row padding, stored to
      a VMEM scratch so row taps are dynamic ref slices.
    - COLUMN upsample is folded into the conv analytically: for each
      output-column parity, the 3x3 conv over upsampled columns equals a
      3-tap conv over the *un-upsampled* columns with composite kernels
      (linear combinations of the original taps), plus exact closed-form
      corrections on the first/last output column where the conv's zero
      padding differs from the composite's clamped reading.
    - Each program emits its (rows, W, [row-parity x col-parity x Cout])
      block from 18 shifted MXU contractions; the parity groups are
      un-interleaved OUTSIDE the kernel by one XLA reshape+transpose of
      the final activation.
  Backward is a custom VJP through the XLA reference composition (same
  math; the fusion win is forward HBM traffic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Stay under the ~16 MB/core VMEM (pallas_guide.md); blocked operands are
# double-buffered by the pipeline, which the estimate below accounts for.
_VMEM_BUDGET = 13 * 1024 * 1024


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC half-pixel bilinear 2x upsample without gathers.

    Output row 2t = 0.25*x[t-1] + 0.75*x[t]; row 2t+1 = 0.75*x[t] +
    0.25*x[t+1] (edges clamped) — the exact scale-2 half-pixel weights —
    interleaved via stack+reshape. Same along width.
    """

    def interleave(v, axis):
        prev = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 0, 1, axis=axis),
             jax.lax.slice_in_dim(v, 0, v.shape[axis] - 1, axis=axis)], axis)
        nxt = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 1, v.shape[axis], axis=axis),
             jax.lax.slice_in_dim(v, v.shape[axis] - 1, v.shape[axis],
                                  axis=axis)], axis)
        even = 0.25 * prev + 0.75 * v
        odd = 0.75 * v + 0.25 * nxt
        stacked = jnp.stack([even, odd], axis=axis + 1)
        new_shape = list(v.shape)
        new_shape[axis] *= 2
        return stacked.reshape(new_shape)

    return interleave(interleave(x, 1), 2)


def upconv3x3_prelu_xla(x, w, bias, alpha):
    """Reference composition: upsample2x -> conv3x3 (zero pad 1) -> PReLU.

    x: (B, H, W, Cin); w: (3, 3, Cin, Cout); bias: (Cout,); alpha scalar.
    Uses jax.image.resize for the upsample (fastest XLA lowering on TPU).
    """
    b, h, w_in, c = x.shape
    up = jax.image.resize(x, (b, 2 * h, 2 * w_in, c), method="linear")
    y = jax.lax.conv_general_dilated(
        up, w.astype(up.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bias.astype(y.dtype)
    return jnp.where(y >= 0, y, alpha.astype(y.dtype) * y)


def _column_composites(w):
    """Fold the column 2x upsample into the conv taps.

    w: (3, 3, Cin, Cout) HWIO. Returns (kc, wfix):
      kc   (3, 3, Cin, 2*Cout) — composite taps over un-upsampled columns,
           output channel halves = column parities [even | odd];
      wfix (3, Cin, 2*Cout)    — border-correction kernels
           [w(dv=-1) | w(dv=+1)], subtracted from output column 0 (even
           parity) and column W-1 (odd parity) respectively, where the
           composite's clamped reading differs from the conv zero pad.
    """
    wm, w0, wp = w[:, 0], w[:, 1], w[:, 2]  # (3, Cin, Cout) each
    kc0 = jnp.stack([0.75 * wm + 0.25 * w0,
                     0.25 * wm + 0.75 * w0 + 0.75 * wp,
                     0.25 * wp], axis=1)
    kc1 = jnp.stack([0.25 * wm,
                     0.75 * wm + 0.75 * w0 + 0.25 * wp,
                     0.25 * w0 + 0.75 * wp], axis=1)
    kc = jnp.concatenate([kc0, kc1], axis=-1)      # (3, 3, Cin, 2*Cout)
    wfix = jnp.concatenate([wm, wp], axis=-1)      # (3, Cin, 2*Cout)
    return kc, wfix


# plane/row-offset schedule: for output row-parity pr, conv row tap du_k
# (kernel rows 0/1/2 = up-row offsets -1/0/+1), the tap reads the
# even(0)/odd(1) row plane at scratch rows [i0+ofs, i0+ofs+nbh)
_TAPS = {0: ((1, 0), (0, 1), (1, 1)),
         1: ((0, 1), (1, 1), (0, 2))}


def _kernel(x_ref, kc_ref, wfix_ref, b_ref, alpha_ref, out_ref, pl_ref,
            acc_ref):
    x = x_ref[0]                    # (H, W, Cin-block)
    h, w_in, _ = x.shape
    nbh = out_ref.shape[1]          # output rows (per row-parity) per program
    co4 = out_ref.shape[-1]         # 4 * cout_block (row x col parities)
    co2 = co4 // 2
    co = co2 // 2
    i0 = pl.program_id(2) * nbh
    ci = pl.program_id(3)           # innermost: Cin-block accumulation
    dt = x.dtype

    # row-upsampled planes (even rows 2t / odd rows 2t+1), column-clamped,
    # with zero rows where the conv's row padding is read. Built by
    # sub-block stores into zeroed scratch (cheaper than concat values,
    # and Mosaic lowers dynamic slices only on refs anyway). Zero rows:
    # plane0 row H+1 = conv pad at up row 2H, plane1 row 0 = pad at up
    # row -1; plane0 row 0 / plane1 row H+1 are never read.
    prev = jnp.concatenate([x[:1], x[:-1]], 0)
    nxt = jnp.concatenate([x[1:], x[-1:]], 0)
    re = 0.25 * prev + 0.75 * x
    ro = 0.75 * x + 0.25 * nxt
    pl_ref[:] = jnp.zeros_like(pl_ref)
    pl_ref[0, 1:h + 1, 1:w_in + 1] = re
    pl_ref[1, 1:h + 1, 1:w_in + 1] = ro
    pl_ref[0, 1:h + 1, 0:1] = re[:, :1]            # column clamp
    pl_ref[1, 1:h + 1, 0:1] = ro[:, :1]
    pl_ref[0, 1:h + 1, w_in + 1:w_in + 2] = re[:, -1:]
    pl_ref[1, 1:h + 1, w_in + 1:w_in + 2] = ro[:, -1:]

    @pl.when(ci == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dn = (((2,), (0,)), ((), ()))
    for pr in (0, 1):
        acc = jnp.zeros((nbh, w_in, co2), jnp.float32)
        # border corrections: the composite assumes clamped values where
        # the true conv reads zero padding — subtract that contribution
        corr = jnp.zeros((nbh, 1, co2), jnp.float32)
        for du in range(3):
            plane, ofs = _TAPS[pr][du]
            rows = pl_ref[plane, pl.ds(i0 + ofs, nbh)]  # (nbh, W+2, Cib)
            for dw in range(3):
                acc = acc + jax.lax.dot_general(
                    rows[:, dw:dw + w_in, :], kc_ref[du, dw],
                    dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
            wf = wfix_ref[du]                           # (Cib, 2*Cout)
            corr = corr + jnp.concatenate([
                jax.lax.dot_general(rows[:, 1:2, :], wf[:, :co],
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.float32),
                jax.lax.dot_general(rows[:, w_in:w_in + 1, :], wf[:, co:],
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.float32),
            ], axis=-1)
        colidx = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
        chidx = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 2)
        fix_here = ((chidx < co) & (colidx == 0)) | (
            (chidx >= co) & (colidx == w_in - 1))
        half = slice(pr * co2, (pr + 1) * co2)
        acc_ref[:, :, half] = acc_ref[:, :, half] + (
            acc - jnp.where(fix_here, corr, 0.0))

    @pl.when(ci == pl.num_programs(3) - 1)
    def _():
        y = acc_ref[:] + b_ref[0].astype(jnp.float32)
        alpha = alpha_ref[0, 0]
        y = jnp.where(y >= 0, y, alpha * y)
        out_ref[0] = y.astype(dt)


def _pick_blocks(h, w, cin, cout, itemsize):
    """(cout_block, row_blocks, cin_block) fitting the VMEM budget, or
    None -> caller falls back to the unfused XLA composition.

    The kernel's channel axis carries 4*cout_block parity groups and the
    kc block carries 2*cout_block; Mosaic wants trailing block dims to be
    128-multiples or the full dim, so blocks are 64/128-multiples (or the
    full dim). Preference order: unblocked cin, then large cout blocks."""
    for cib in [c for c in (cin, 512, 256, 128) if c <= cin]:
        if cin % cib or cib % 128 and cib != cin:
            continue
        for co in [c for c in (cout, 512, 256, 128, 64) if c <= cout]:
            if cout % co or co % 64 and co != cout:
                continue
            for rb in (1, 2, 4, 8):
                if h % rb:
                    continue
                base = (h * w * cib * itemsize * 5    # x blk + parity temps
                        + 2 * (h + 2) * (w + 2) * cib * itemsize)  # planes
                blocked = (12 * cib * 2 * co * itemsize   # kc + wfix blocks
                           + (h // rb) * w * 4 * co * itemsize)  # out block
                acc = (h // rb) * w * 4 * co * 4      # f32 acc scratch
                if base * 2 + 2 * blocked + acc <= _VMEM_BUDGET:
                    return co, rb, cib
    return None


def _forward(x, w, bias, alpha, interpret: bool):
    b, h, w_in, cin = x.shape
    cout = w.shape[-1]
    blocks = _pick_blocks(h, w_in, cin, cout, x.dtype.itemsize)
    if blocks is None:
        # working set exceeds VMEM — the unfused XLA composition wins there
        return upconv3x3_prelu_xla(x, w, bias, alpha)
    co_block, rb, ci_block = blocks
    n_co = cout // co_block
    n_ci = cin // ci_block

    kc, wfix = _column_composites(w.astype(x.dtype))

    def blockify(t):
        # global parity halves [pc0 all | pc1 all] -> per-cout-block halves
        # [pc0_j | pc1_j] so each grid block sees its own parity pair
        lead = t.shape[:-1]
        t = t.reshape(*lead, 2, n_co, co_block)
        t = jnp.swapaxes(t, -3, -2)
        return t.reshape(*lead, 2 * cout)

    kc, wfix = blockify(kc), blockify(wfix)
    # output channel layout is [cout_block j][row parity][col parity][c]
    bias4 = jnp.broadcast_to(
        bias.reshape(n_co, 1, 1, co_block),
        (n_co, 2, 2, co_block)).reshape(1, 4 * cout).astype(x.dtype)
    alpha2d = jnp.asarray(alpha, jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w_in, 4 * cout), x.dtype),
        grid=(b, n_co, rb, n_ci),  # ci innermost: accumulates into scratch
        in_specs=[
            pl.BlockSpec((1, h, w_in, ci_block),
                         lambda i, j, r, ci: (i, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ci_block, 2 * co_block),
                         lambda i, j, r, ci: (0, 0, ci, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ci_block, 2 * co_block),
                         lambda i, j, r, ci: (0, ci, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * co_block), lambda i, j, r, ci: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j, r, ci: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h // rb, w_in, 4 * co_block),
                               lambda i, j, r, ci: (i, r, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, h + 2, w_in + 2, ci_block), x.dtype),
            pltpu.VMEM((h // rb, w_in, 4 * co_block), jnp.float32),
        ],
        interpret=interpret,
    )(x, kc, wfix, bias4, alpha2d)
    # un-interleave: channels are (cout_block j, row parity, col parity,
    # c); move the parities next to their spatial dims and merge
    out = out.reshape(b, h, w_in, n_co, 2, 2, co_block)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6)
    return out.reshape(b, 2 * h, 2 * w_in, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_upconv3x3_prelu(x, w, bias, alpha, interpret: bool = False):
    """Fused upsample2x + conv3x3 + PReLU; see module docstring."""
    return _forward(x, w, bias, alpha, interpret)


def _fwd(x, w, bias, alpha, interpret):
    return _forward(x, w, bias, alpha, interpret), (x, w, bias, alpha)


def _bwd(interpret, res, g):
    x, w, bias, alpha = res
    _, vjp = jax.vjp(upconv3x3_prelu_xla, x, w, bias, alpha)
    return vjp(g)


fused_upconv3x3_prelu.defvjp(_fwd, _bwd)
