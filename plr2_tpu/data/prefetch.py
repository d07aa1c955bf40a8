"""Threaded host-side prefetcher — the TPU build's answer to the
reference's multi-process torch DataLoader workers (SURVEY.md section 2
parallelism table). Worker threads decode frames and run the C++ data
plane (mask->bbox->choose->backproject); the consumer overlaps host decode
with device compute. Threads (not processes) suffice because PIL/NumPy/the
native library all release the GIL on the heavy parts.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from plr2_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD


def host_prepare(raw: Dict, num_points: int, seed: int = 0) -> Dict:
    """Full host-side sample prep via the native data plane.

    Returns numpy arrays ready for device upload: img (normalized crop),
    points, choose, target, model_points, idx. Falls back to the
    Python/JAX path upstream if the native library is unavailable.
    """
    from plr2_tpu import native

    intr = raw["intrinsics"]
    (rmin, rmax, cmin, cmax), choose, count = native.mask_bbox_choose(
        raw["mask"], num_points, seed=seed)
    depth_crop = np.asarray(raw["depth"][rmin:rmax, cmin:cmax], np.float32)
    cloud = native.backproject(
        depth_crop, choose, cmax - cmin, rmin, cmin,
        intr["cx"], intr["cy"], intr["fx"], intr["fy"], intr["cam_scale"])
    img = raw["color"][rmin:rmax, cmin:cmax].astype(np.float32) / 255.0
    img = (img - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
        IMAGENET_STD, np.float32)
    target = raw["model_points"] @ raw["target_r"].T + raw["target_t"]
    return dict(
        points=cloud, choose=choose, img=img,
        target=target.astype(np.float32),
        model_points=np.asarray(raw["model_points"], np.float32),
        idx=np.int32(raw["obj_idx"]), mask_count=count)


class PrefetchLoader:
    """Iterate prepared samples with `num_workers` background threads."""

    def __init__(self, dataset, num_points: int, num_workers: int = 4,
                 prefetch: int = 16, shuffle: bool = False, seed: int = 0):
        self.dataset = dataset
        self.num_points = num_points
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.shuffle = shuffle
        self.seed = seed

    def __len__(self) -> int:
        return len(self.dataset)

    def __iter__(self) -> Iterator[Dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed).shuffle(order)
        work: "queue.Queue[Optional[int]]" = queue.Queue()
        done: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        for i in order:
            work.put(int(i))
        for _ in range(self.num_workers):
            work.put(None)

        def worker(wid: int):
            while True:
                i = work.get()
                if i is None:
                    done.put((None, wid))
                    return
                try:
                    raw = self.dataset.get_raw(i)
                    s = host_prepare(raw, self.num_points,
                                     seed=self.seed * 100003 + i)
                    done.put((("ok", i, s), wid))
                except Exception as e:  # surfaced on the consumer side
                    done.put((("err", i, e), wid))

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.num_workers)]
        for t in threads:
            t.start()

        finished = 0
        pending = {}
        next_pos = 0
        # deliver in submission order for determinism
        pos_of = {int(i): p for p, i in enumerate(order)}
        while finished < self.num_workers or pending:
            if next_pos in pending:
                item = pending.pop(next_pos)
                next_pos += 1
                yield item
                continue
            msg, _ = done.get()
            if msg is None:
                finished += 1
                continue
            kind, i, payload = msg
            if kind == "err":
                raise payload
            pending[pos_of[i]] = payload
