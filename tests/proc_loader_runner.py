"""Subprocess runner for the process-mode PrefetchLoader test.

Run as a script (spawn workers re-import __main__, so the test invokes
this via subprocess instead of spawning from inside pytest). Prints
PROC_LOADER_OK on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from plr2_tpu.data import SyntheticPoseDataset
from plr2_tpu.data.prefetch import PrefetchLoader


def main():
    ds = SyntheticPoseDataset(num_frames=6, num_objects=2, model_points=64,
                              num_points=100, seed=0)
    lt = PrefetchLoader(ds, num_points=100, num_workers=2, raw_mode=True,
                        shuffle=True, seed=3)
    lp = PrefetchLoader(ds, num_points=100, num_workers=2, raw_mode=True,
                        shuffle=True, seed=3, use_processes=True)
    n = 0
    for a, b in zip(lt, lp):
        assert a["index"] == b["index"]
        np.testing.assert_array_equal(a["img_u8"], b["img_u8"])
        np.testing.assert_array_equal(a["choose"], b["choose"])
        np.testing.assert_array_equal(a["points"], b["points"])
        n += 1
    assert n == len(ds)
    # pool reuse across epochs
    second = list(lp)
    assert len(second) == len(ds)
    lp.close()
    print("PROC_LOADER_OK")


if __name__ == "__main__":
    main()
