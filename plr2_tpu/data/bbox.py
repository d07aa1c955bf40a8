"""Bounding-box snapping with the reference's border-list semantics
(upstream datasets/*/dataset.py `get_bbox`, SURVEY.md section 2 #8/#9).

The reference snaps each mask bbox dimension UP to the next multiple-of-40
entry of `BORDER_LIST`, re-centres the window, and clamps it into the
image. Crops therefore come in at most ~17 distinct sizes per axis — the
TPU build exploits this by jit-caching the preprocessing per (h, w) bucket
instead of padding everything to one max size.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

BORDER_LIST = [-1, 40, 80, 120, 160, 200, 240, 280, 320,
               360, 400, 440, 480, 520, 560, 600, 640, 680]


def get_bbox_from_mask(mask: np.ndarray, img_h: int = 480, img_w: int = 640
                       ) -> Tuple[int, int, int, int]:
    """mask (H, W) bool -> (rmin, rmax, cmin, cmax) snapped window.

    Replicates the reference algorithm: tight bbox of the mask, +1 on max,
    snap each side length up through BORDER_LIST, re-centre, shift fully
    inside the image.
    """
    rows = np.any(mask, axis=1)
    cols = np.any(mask, axis=0)
    if not rows.any():
        return 0, min(40, img_h), 0, min(40, img_w)
    rmin, rmax = np.flatnonzero(rows)[[0, -1]]
    cmin, cmax = np.flatnonzero(cols)[[0, -1]]
    rmax += 1
    cmax += 1
    return snap_bbox(int(rmin), int(rmax), int(cmin), int(cmax), img_h, img_w)


def snap_bbox(rmin: int, rmax: int, cmin: int, cmax: int,
              img_h: int = 480, img_w: int = 640) -> Tuple[int, int, int, int]:
    """Snap a tight bbox to the border-list window (reference arithmetic)."""
    r_b = rmax - rmin
    for tt in range(len(BORDER_LIST) - 1):
        if BORDER_LIST[tt] < r_b <= BORDER_LIST[tt + 1]:
            r_b = BORDER_LIST[tt + 1]
            break
    c_b = cmax - cmin
    for tt in range(len(BORDER_LIST) - 1):
        if BORDER_LIST[tt] < c_b <= BORDER_LIST[tt + 1]:
            c_b = BORDER_LIST[tt + 1]
            break
    center = [int((rmin + rmax) / 2), int((cmin + cmax) / 2)]
    rmin = center[0] - int(r_b / 2)
    rmax = center[0] + int(r_b / 2)
    cmin = center[1] - int(c_b / 2)
    cmax = center[1] + int(c_b / 2)
    if rmin < 0:
        rmax -= rmin
        rmin = 0
    if cmin < 0:
        cmax -= cmin
        cmin = 0
    if rmax > img_h:
        rmin -= rmax - img_h
        rmax = img_h
    if cmax > img_w:
        cmin -= cmax - img_w
        cmax = img_w
    return rmin, rmax, cmin, cmax


# --- device (jnp) twins, exact vs the host functions above (oracle test in
# tests/test_data.py) — used by the single-jit serving program
# (plr2_tpu/serving.py) to crop on device without a host round-trip. -------

def _snap_len_device(n: jnp.ndarray) -> jnp.ndarray:
    """Snap a side length UP through BORDER_LIST (host loop semantics:
    lengths beyond the last entry stay unsnapped)."""
    border = jnp.asarray(BORDER_LIST[1:], jnp.int32)
    i = jnp.searchsorted(border, n.astype(jnp.int32), side="left")
    snapped = border[jnp.minimum(i, border.shape[0] - 1)]
    return jnp.where(n > border[-1], n, snapped)


def device_snap_bbox(rmin, rmax, cmin, cmax, img_h: int, img_w: int):
    """jnp version of snap_bbox (identical integer arithmetic)."""
    rmin, rmax, cmin, cmax = (jnp.asarray(v, jnp.int32)
                              for v in (rmin, rmax, cmin, cmax))
    r_b = _snap_len_device(rmax - rmin)
    c_b = _snap_len_device(cmax - cmin)
    cr, cc = (rmin + rmax) // 2, (cmin + cmax) // 2
    rmin, rmax = cr - r_b // 2, cr + r_b // 2
    cmin, cmax = cc - c_b // 2, cc + c_b // 2
    rmax = rmax + jnp.maximum(-rmin, 0)
    rmin = jnp.maximum(rmin, 0)
    cmax = cmax + jnp.maximum(-cmin, 0)
    cmin = jnp.maximum(cmin, 0)
    rmin = rmin - jnp.maximum(rmax - img_h, 0)
    rmax = jnp.minimum(rmax, img_h)
    cmin = cmin - jnp.maximum(cmax - img_w, 0)
    cmax = jnp.minimum(cmax, img_w)
    return rmin, rmax, cmin, cmax


def device_bbox_from_mask(mask: jnp.ndarray, img_h: int | None = None,
                          img_w: int | None = None):
    """jnp version of get_bbox_from_mask: (H, W) bool -> snapped window
    (rmin, rmax, cmin, cmax), empty-mask default included.

    img_h/img_w override the clamp bounds: callers that hand in a
    zero-padded mask (the serving program pads bottom/right by `canvas`)
    MUST pass the real image dims here, or windows near the bottom/right
    edge are not shifted inside the image like the host version does."""
    h, w = mask.shape
    img_h = h if img_h is None else img_h
    img_w = w if img_w is None else img_w
    rows = jnp.any(mask, axis=1)
    cols = jnp.any(mask, axis=0)
    nonempty = jnp.any(rows)
    rmin = jnp.argmax(rows).astype(jnp.int32)
    rmax = (h - jnp.argmax(rows[::-1])).astype(jnp.int32)  # last idx + 1
    cmin = jnp.argmax(cols).astype(jnp.int32)
    cmax = (w - jnp.argmax(cols[::-1])).astype(jnp.int32)
    snapped = device_snap_bbox(rmin, rmax, cmin, cmax, img_h, img_w)
    default = (0, min(40, img_h), 0, min(40, img_w))
    return tuple(jnp.where(nonempty, s, jnp.int32(d))
                 for s, d in zip(snapped, default))
