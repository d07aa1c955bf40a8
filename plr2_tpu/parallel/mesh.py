"""Device-mesh sharding for multi-chip scaling.

The reference is single-GPU (SURVEY.md section 2, parallelism table); its
only parallelism is CPU DataLoader workers. The TPU build scales via SPMD:
a `jax.sharding.Mesh` with a `data` axis, batch-sharded inputs, replicated
parameters, and XLA-inserted all-reduces over ICI for the gradient sum.
A second `model` axis adds Megatron-style tensor parallelism over the
fusion-trunk/head matmul ladders (parallel/tensor_parallel.py,
`tools/train.py --model_parallel N`). A `points` axis shards the point
dimension — sequence parallelism for the chamfer match and the per-point
trunk (parallel/point_parallel.py) — and a `pipe` axis streams frame
microbatches through a ring of refinement stages
(parallel/pipeline_parallel.py). Expert parallelism has no substrate:
the model has no MoE layers (the per-object head weight banks are the
closest analogue at ~11 KB per head — far too small to shard).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     cpu_collectives: Optional[str] = "gloo") -> None:
    """Multi-host initialization over DCN (`jax.distributed.initialize`).

    Single-host/single-chip runs (this environment, and the reference's
    single-GPU topology) never need this; it exists so the same code scales
    to a multi-host TPU pod slice: call once per host before creating the
    mesh, then `make_mesh()` spans all global devices and the same
    NamedSharding-annotated programs run with ICI collectives intra-slice
    and DCN between hosts.

    `cpu_collectives` selects XLA:CPU's cross-process collectives backend
    (gloo) so the same code path runs multi-process on CPU — exercised
    end-to-end by tests/test_distributed.py (two processes, global mesh,
    one sharded optimizer step). Irrelevant to TPU backends; pass None to
    leave the jax default.
    """
    import jax

    if cpu_collectives is not None:
        try:
            jax.config.update("jax_cpu_collectives_implementation",
                              cpu_collectives)
        except Exception:
            pass  # older/newer jax without the knob: keep the default
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """1-D (or reshaped) mesh over the first `n_devices` devices.

    With `shape`, lays the devices out as a multi-axis mesh — e.g.
    ``make_mesh(8, ("data", "model"), shape=(2, 4))`` for 2-way data x
    4-way tensor parallelism (see parallel/tensor_parallel.py). Adjacent
    device ids land on the trailing (`model`) axis so the per-layer
    all-reduces ride the shortest ICI hops.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.asarray(devs[:n])
    if shape is not None:
        if len(shape) != len(axis_names) or int(np.prod(shape)) != n:
            raise ValueError(f"mesh shape {shape} does not lay out "
                             f"{n} devices over axes {axis_names}")
    elif len(axis_names) == 1:
        shape = (n,)
    else:
        # fold all devices into the leading axis by default
        shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(devs.reshape(tuple(shape)), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the `data` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of batched arrays with batch-axis sharding."""
    bs = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, bs), tree)
