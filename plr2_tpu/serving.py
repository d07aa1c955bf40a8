"""Single-jit frame serving: full RGB-D frame -> per-object refined poses.

The reference's eval chain (upstream tools/eval_ycb.py, SURVEY.md §3.2)
crosses the host/device boundary per object and per refinement iteration:
host NumPy computes the mask/bbox/crop/cloud, the GPU runs PoseNet, then
each refine step re-centres the cloud on host. Here the ENTIRE per-frame
pipeline is one XLA program:

    [SegNet label map (optional)] -> per-object mask -> border-list bbox
    (device twin) -> canvas crop -> fused choose/backproject/normalize
    preprocessing -> batched PoseNet over all objects -> confidence argmax
    -> K-iteration lax.scan refinement -> (quat, trans) per object.

Zero host round-trips per frame; the only transfers are the input frame
up and the K poses down. Crop windows are placed at the canvas top-left
over a zero background, exactly like the host batched path
(`stack_samples`), so results match the host pipeline bit-for-bit on the
deterministic (wrap-sampling) path — pinned in tests/test_serving.py.

Static knobs (one compiled program per combination): canvas size,
max objects per frame K, num_points, refine iterations, segmentation
on/off. Inactive object slots (obj_id <= 0) and too-small masks compute
alongside (static shapes) and are reported invalid.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from plr2_tpu.data.bbox import device_bbox_from_mask
from plr2_tpu.data.preprocess import preprocess_crop
from plr2_tpu.pipeline import DenseFusionPipeline


class FramePoses(NamedTuple):
    quat: jnp.ndarray        # (K, 4) wxyz, normalized
    trans: jnp.ndarray       # (K, 3)
    confidence: jnp.ndarray  # (K,) best per-point confidence
    valid: jnp.ndarray       # (K,) bool: active slot with enough mask pixels
    # (K,) bool: detection whose snapped window exceeds the compiled
    # canvas — the one drop reason a bigger-canvas recompile fixes
    # (tools/serve.py --auto_grow_canvas does exactly that); always
    # implies not valid
    oversized: jnp.ndarray


class FrameEstimator:
    """Compiles and runs the single-jit frame program.

    pipe: the DenseFusionPipeline (its dtype decides f32/bf16 serving).
    seg_model: optional SegNet module — when given, `run` ignores the
        `label` argument and segments the frame on device.
    """

    def __init__(self, pipe: DenseFusionPipeline, *, canvas: int = 240,
                 img_h: int = 480, img_w: int = 640,
                 refine_iterations: int = 4, min_mask_pixels: int = 50,
                 seg_model: Any = None, seg_scale: int = 1, mesh: Any = None):
        if canvas > img_h or canvas > img_w:
            raise ValueError("canvas must fit inside the frame")
        if seg_scale < 1:
            raise ValueError("seg_scale must be >= 1")
        self.pipe = pipe
        self.canvas = canvas
        self.img_h = img_h
        self.img_w = img_w
        self.refine_iterations = refine_iterations
        self.min_mask_pixels = min_mask_pixels
        self.seg_model = seg_model
        self.seg_scale = seg_scale
        # Optional jax.sharding.Mesh with a "data" axis: run_frames shards
        # the frame batch across chips (params replicated, no collectives
        # in the forward — each chip serves F/n_devices frames over ICI-
        # synchronized dispatch). F must be divisible by the mesh size.
        self.mesh = mesh
        self._run = jax.jit(self._program)
        self._run_frames = jax.jit(self._program_frames)
        # poses-only variants for the hot serving paths: returning the full
        # Sample pytree forces XLA to materialize every canvas crop in HBM
        # as a program output; when the caller only wants poses, compile a
        # program whose unused sample outputs are DCE'd instead
        self._run_poses = jax.jit(lambda *a: self._program(*a)[0])
        self._run_frames_poses = jax.jit(
            lambda *a: self._program_frames(*a)[0])

    # -- per-object: mask -> bbox -> canvas crop -> fused preprocessing --

    def _sample_one(self, color, depth, label, intr_vec, obj_id,
                    model_points, target_r, target_t, key):
        # bbox derives from the depth-intersected mask, matching the host
        # full-pipeline chain (eval/full_pipeline.py builds `raw["mask"]`
        # the same way); NOTE the LineMOD loader snaps its bbox from the
        # label alone (data/linemod.py `bbox_mask`, the upstream get_bbox
        # convention) — frames with depth holes crop differently there.
        mask = (label == obj_id) & (depth > 0)
        npix = jnp.sum(mask.astype(jnp.int32))
        # the mask is canvas-padded; clamp windows against the REAL image
        # bounds so edge objects shift inside the frame like the host path
        rmin, rmax, cmin, cmax = device_bbox_from_mask(
            mask, self.img_h, self.img_w)

        c = self.canvas
        # frames are pre-padded by `canvas` on bottom/right, so a slice
        # starting at (rmin, cmin) never clamps — the window lands at the
        # canvas top-left over zeros, exactly like stack_samples
        colc = jax.lax.dynamic_slice(color, (rmin, cmin, jnp.int32(0)),
                                     (c, c, 3))
        depc = jax.lax.dynamic_slice(depth, (rmin, cmin), (c, c))
        maskc = jax.lax.dynamic_slice(mask, (rmin, cmin), (c, c))
        inwin = ((jnp.arange(c, dtype=jnp.int32)[:, None] < rmax - rmin) &
                 (jnp.arange(c, dtype=jnp.int32)[None, :] < cmax - cmin))
        maskc = maskc & inwin

        # clamp the head index for inactive/out-of-range slots (their
        # outputs are discarded via `valid`; an OOB gather is undefined)
        idx = jnp.clip(obj_id - 1, 0, self.pipe.num_objects - 1)
        sample = preprocess_crop(
            colc, depc, maskc, rmin, cmin, intr_vec, model_points,
            target_r, target_t, idx, key,
            num_points=self.pipe.num_points, add_noise=False)
        # the host batched path (stack_samples) zero-pads the NORMALIZED
        # crop — zero the background after normalization to match exactly
        sample = sample._replace(
            img=jnp.where(inwin[..., None], sample.img, 0.0))
        # a snapped window larger than the canvas would be silently
        # truncated (the host chain auto-grows its canvas instead) — flag
        # the slot invalid rather than return a confidently-wrong pose;
        # construct the FrameEstimator with a larger `canvas` for such
        # scenes
        fits = (rmax - rmin <= c) & (cmax - cmin <= c)
        detected = (obj_id > 0) & (npix >= self.min_mask_pixels)
        return sample, detected & fits, detected & ~fits

    def _segment(self, seg_variables, colors):
        """(F, H, W, 3) uint8 -> (F, H, W) int32 labels on device.

        With seg_scale=s > 1 the segmenter runs on an s-times-downsampled
        frame (s x s average pool) and the predicted labels are nearest-
        upsampled back — ~s^2 less segmenter compute and decoder HBM
        traffic, at s-pixel mask quantization (the border-list bbox snap
        absorbs most of it). Opt-in accuracy/throughput trade."""
        s = self.seg_scale
        unit = 32 * s
        ph = -(-self.img_h // unit) * unit - self.img_h
        pw = -(-self.img_w // unit) * unit - self.img_w
        norm = (colors.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        norm = jnp.pad(norm, ((0, 0), (0, ph), (0, pw), (0, 0)))
        if s > 1:
            f, h, w, c = norm.shape
            norm = norm.reshape(f, h // s, s, w // s, s, c).mean(axis=(2, 4))
        logits = self.seg_model.apply(seg_variables, norm)
        labels = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if s > 1:
            f, h, w = labels.shape
            labels = jnp.broadcast_to(labels[:, :, None, :, None],
                                      (f, h, s, w, s))
            labels = labels.reshape(f, h * s, w * s)
        return labels[:, :self.img_h, :self.img_w]

    def _frame_samples(self, color, depth, label, obj_ids, model_points,
                       target_r, target_t, intr_vec, key):
        """One frame -> K preprocessed samples + (valid, oversized)."""
        c = self.canvas
        color = jnp.pad(color, ((0, c), (0, c), (0, 0)))
        depth = jnp.pad(depth, ((0, c), (0, c)))
        label = jnp.pad(label, ((0, c), (0, c)))
        # per-object keys derive from the OBJECT ID (not the slot index),
        # so the stochastic subsample-choose path is bit-exact against the
        # host chain, which folds the same frame key by the same id
        # (eval/full_pipeline.py) — host==device holds in BOTH sampling
        # regimes, not just deterministic wrap (tests/test_serving.py)
        keys = jax.vmap(lambda o: jax.random.fold_in(key, o))(obj_ids)
        return jax.vmap(
            lambda o, m, tr, tt, k: self._sample_one(
                color, depth, label, intr_vec, o, m, tr, tt, k)
        )(obj_ids, model_points, target_r, target_t, keys)

    def _program(self, variables, color, depth, label, obj_ids,
                 model_points, target_r, target_t, intr_vec, key,
                 seg_variables=None):
        if self.seg_model is not None:
            label = self._segment(seg_variables, color[None])[0]
        samples, valid, oversized = self._frame_samples(
            color, depth, label, obj_ids, model_points, target_r, target_t,
            intr_vec, key)
        est = self.pipe.estimate(variables, samples.img, samples.points,
                                 samples.choose, samples.idx,
                                 refine_iterations=self.refine_iterations)
        return FramePoses(quat=est.quat, trans=est.trans,
                          confidence=est.confidence, valid=valid,
                          oversized=oversized), samples

    def _program_frames(self, variables, colors, depths, labels, obj_ids,
                        model_points, target_r, target_t, intr_vecs, keys,
                        seg_variables=None):
        """Batched variant: F frames x K slots in one program. The crops
        flatten to one (F*K)-batch through PoseNet/refine — small
        per-frame object counts underfill the MXU alone."""
        f, k = obj_ids.shape[:2]
        if self.seg_model is not None:
            labels = self._segment(seg_variables, colors)
        samples, valid, oversized = jax.vmap(self._frame_samples)(
            colors, depths, labels, obj_ids, model_points, target_r,
            target_t, intr_vecs, keys)
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((f * k,) + x.shape[2:]), samples)
        est = self.pipe.estimate(variables, flat.img, flat.points,
                                 flat.choose, flat.idx,
                                 refine_iterations=self.refine_iterations)
        poses = FramePoses(
            quat=est.quat.reshape(f, k, 4),
            trans=est.trans.reshape(f, k, 3),
            confidence=est.confidence.reshape(f, k), valid=valid,
            oversized=oversized)
        return poses, samples

    # -- public surface --

    def run(self, variables, color, depth, label, obj_ids, model_points,
            intr_vec, key, seg_variables=None, target_r=None, target_t=None
            ) -> FramePoses:
        """Estimate poses for up to K = len(obj_ids) objects of one frame.

        color (H, W, 3) uint8; depth (H, W) f32 raw units; label (H, W)
        int (ignored when seg_model is set); obj_ids (K,) int32 1-based
        label ids, <= 0 for inactive slots; model_points (K, M, 3);
        intr_vec (5,) [cx cy fx fy cam_scale]. target_r/t (optional GT)
        only affect the returned samples' `target` field for evaluation.
        """
        k = obj_ids.shape[0]
        if target_r is None:
            target_r = jnp.broadcast_to(jnp.eye(3), (k, 3, 3))
        if target_t is None:
            target_t = jnp.zeros((k, 3))
        return self._run_poses(variables, color, depth, label, obj_ids,
                               model_points, target_r, target_t, intr_vec,
                               key, seg_variables)

    def run_with_samples(self, variables, color, depth, label, obj_ids,
                         model_points, intr_vec, key, seg_variables=None,
                         target_r=None, target_t=None):
        """run(), but also returns the preprocessed Sample batch (for
        evaluation: sample.target holds the GT-posed model points when
        target_r/t are given)."""
        k = obj_ids.shape[0]
        if target_r is None:
            target_r = jnp.broadcast_to(jnp.eye(3), (k, 3, 3))
        if target_t is None:
            target_t = jnp.zeros((k, 3))
        return self._run(variables, color, depth, label, obj_ids,
                         model_points, target_r, target_t, intr_vec,
                         key, seg_variables)

    def run_frames(self, variables, colors, depths, labels, obj_ids,
                   model_points, intr_vecs, keys, seg_variables=None,
                   target_r=None, target_t=None) -> FramePoses:
        """Batched serving: F frames at once (leading F axis on every
        argument; obj_ids (F, K)). Returns FramePoses with (F, K, ...)
        fields. Throughput mode — the F*K crops share one PoseNet batch."""
        f, k = obj_ids.shape[:2]
        if target_r is None:
            target_r = jnp.broadcast_to(jnp.eye(3), (f, k, 3, 3))
        if target_t is None:
            target_t = jnp.zeros((f, k, 3))
        if self.mesh is not None:
            from plr2_tpu.parallel.mesh import replicated, shard_batch

            (colors, depths, labels, obj_ids, model_points, target_r,
             target_t, intr_vecs, keys) = shard_batch(
                self.mesh, (colors, depths, labels, obj_ids, model_points,
                            target_r, target_t, intr_vecs, keys))
            rep = replicated(self.mesh)
            variables = jax.device_put(variables, rep)
            if seg_variables is not None:
                seg_variables = jax.device_put(seg_variables, rep)
        return self._run_frames_poses(variables, colors, depths, labels,
                                      obj_ids, model_points, target_r,
                                      target_t, intr_vecs, keys,
                                      seg_variables)
