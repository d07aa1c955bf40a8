"""SegNet training driver — the reference's vanilla_segmentation/train.py +
data_controller.py (SURVEY.md section 2 #15): trains the segmentation
network on (color, label) frames so the full pipeline (BASELINE config 5)
can crop objects without external PoseCNN masks.

Batched jitted steps (no per-sample accumulation here — the reference uses
batch_size 3 with a plain DataLoader); random square crops for augmentation
and fixed-shape TPU batches.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from plr2_tpu.models.segnet import SegNet, segmentation_loss


def frame_crops(frames, crop: int, batch: int, key: np.random.Generator
                ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield batches of random (crop x crop) color/label windows."""
    imgs, labels = [], []
    for fr in frames:
        h, w = fr.label.shape
        r0 = key.integers(0, max(1, h - crop))
        c0 = key.integers(0, max(1, w - crop))
        imgs.append(fr.color[r0:r0 + crop, c0:c0 + crop])
        labels.append(fr.label[r0:r0 + crop, c0:c0 + crop])
        if len(imgs) == batch:
            yield np.stack(imgs), np.stack(labels)
            imgs, labels = [], []
    if imgs:
        yield np.stack(imgs), np.stack(labels)


class SegTrainer:
    def __init__(self, num_classes: int = 22, lr: float = 1e-4,
                 crop: int = 128, batch: int = 3, arch: str = "segnet"):
        from plr2_tpu.models.segnet import build_segmenter

        self.model = build_segmenter(arch, num_classes)
        self.tx = optax.adam(lr)
        self.crop = crop
        self.batch = batch

    def init_state(self, key):
        x = jnp.zeros((1, self.crop, self.crop, 3))
        variables = self.model.init(key, x)
        return {"variables": variables,
                "opt_state": self.tx.init(variables["params"]),
                "best_loss": float("inf")}

    @functools.partial(jax.jit, static_argnames=("self",))
    def train_step(self, variables, opt_state, img, labels, key):
        def loss_fn(params):
            logits, mut = self.model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                img, train=True, mutable=["batch_stats"],
                rngs={"dropout": key})
            return segmentation_loss(logits, labels), mut["batch_stats"]

        (loss, bstats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        updates, opt_state = self.tx.update(grads, opt_state,
                                            variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return ({"params": params, "batch_stats": bstats}, opt_state, loss)

    @functools.partial(jax.jit, static_argnames=("self",))
    def eval_step(self, variables, img, labels):
        logits = self.model.apply(variables, img)
        loss = segmentation_loss(logits, labels)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, acc

    def predict(self, variables, img: jnp.ndarray) -> jnp.ndarray:
        """Full-frame label prediction (pads to a multiple of 32 for the
        5 pool/unpool levels)."""
        h, w = img.shape[-3:-1]
        ph = -(-h // 32) * 32 - h
        pw = -(-w // 32) * 32 - w
        x = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)))
        logits = self.model.apply(variables, x)
        return jnp.argmax(logits[:, :h, :w], axis=-1)

    def train_epoch(self, state: Dict, frames, seed: int = 0,
                    stop_fn=None) -> Dict:
        """One epoch over random crops. `stop_fn` is the graceful-
        preemption hook (utils/interrupt.GracefulInterrupt), checked at
        BATCH boundaries like the pose trainers — completed steps are
        already in state, nothing partial to unwind."""
        rng = np.random.default_rng(seed)
        losses = []
        t0 = time.time()
        order = rng.permutation(len(frames))
        epoch_key = jax.random.key(seed)
        interrupted = False
        for step, (img, labels) in enumerate(frame_crops(
                [frames[i] for i in order], self.crop, self.batch, rng)):
            if stop_fn is not None and stop_fn():
                interrupted = True
                break
            norm = (jnp.asarray(img, jnp.float32) / 255.0 - 0.5) / 0.5
            state["variables"], state["opt_state"], loss = self.train_step(
                state["variables"], state["opt_state"], norm,
                jnp.asarray(labels, jnp.int32),
                jax.random.fold_in(epoch_key, step))
            losses.append(float(loss))
        return {**state,
                "last_epoch_loss": (float(np.mean(losses)) if losses
                                    else float("inf")),
                "seconds": time.time() - t0,
                "interrupted": interrupted}
