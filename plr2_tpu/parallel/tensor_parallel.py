"""Tensor-parallel (Megatron-style) weight sharding over a `model` mesh axis.

The reference stack is single-GPU PyTorch — it has no model parallelism at
all (SURVEY.md section 2 parallelism table; upstream lib/network.py
[upstream, mount empty]). This module is a TPU-native capability addition:
the dense-fusion matmul ladders shard their FEATURE dimensions across a
`model` mesh axis while the batch stays sharded across `data`, so one
program scales over a 2-D (data, model) mesh with XLA's SPMD partitioner
inserting the collectives over ICI.

Design — column/row pairing, one all-reduce per pair:

* a COLUMN-parallel layer shards its kernel's output features (and bias)
  over `model`; its activation comes out feature-sharded with NO
  communication;
* the following ROW-parallel layer shards its kernel's input features (the
  contraction dim) and keeps its bias replicated; the matmul consumes the
  feature-sharded activation shard-for-shard and XLA inserts a single
  all-reduce (psum) over `model` to combine the partial sums.

Pairs used (all fixed architecture sizes — every sharded dim is a multiple
of 8, so meshes up to model=8 divide evenly):

  PoseNetFeat        conv5 (256->512) COL   -> conv6 (512->1024) ROW
  PoseNet heads      conv1 (1408->640) COL  -> conv2 (640->256) ROW
                     conv3 (256->128) COL   -> conv4 (128->K*od) ROW
  PoseRefineNetFeat  conv5 (384->512) COL   -> conv6 (512->1024) ROW
  PoseRefineNet      conv1 (1024->512) COL  -> conv2 (512->128) ROW
                     conv3 (final per-object head): replicated — its
                     output width is num_objects*{4,3}, not a multiple of
                     the lane tile, and it is ~0.1% of the head FLOPs.

The PSPNet color CNN stays replicated (batch-sharded over `data` only):
its convs are spatial and XLA already tiles them well per chip; at this
model size (<30 M params) sharding conv channels buys nothing but halo
exchanges. The Pallas fused-head path (`ModelConfig.use_pallas_model`)
consumes raw kernels inside one kernel and is NOT compatible with a
sharded kernel — tensor parallelism requires the default XLA head path.

Usage (committed-input style — the idiomatic modern-JAX SPMD recipe):

    mesh = make_mesh(8, ("data", "model"), shape=(2, 4))
    variables = shard_variables(mesh, variables)     # weights -> mesh
    init_opt, step = make_train_step(pipe, ..., mesh=None)  # plain jit
    opt_state = init_opt(variables)                  # inherits shardings
    batch = shard_batch(mesh, batch)                 # batch -> data axis
    variables, opt_state, m = step(variables, opt_state, batch, key)

`jax.jit` honors the committed input shardings and GSPMD propagates them
through the program — no in_shardings pytrees, no manual collectives.
tests/test_tensor_parallel.py pins numerical equality vs the single-device
step and sharding stability across steps.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL = {"kernel": P(None, "model"), "bias": P("model")}
_ROW = {"kernel": P("model", None), "bias": P()}
_REPL: Dict[str, P] = {}

# head ladders: conv<i>_{r,t,c} directly under <net>/params
_HEADS = {
    "posenet": {"conv1": _COL, "conv2": _ROW, "conv3": _COL, "conv4": _ROW},
    "refiner": {"conv1": _COL, "conv2": _ROW},  # conv3 replicated
}
# fusion trunks: <net>/params/feat/conv{5,6}
_FEAT = {"conv5": _COL, "conv6": _ROW}

_HEAD_RE = re.compile(r"^conv(\d+)_[rtc]$")


def _path_names(path) -> tuple:
    names = []
    for k in path:
        names.append(getattr(k, "key", getattr(k, "name", str(k))))
    return tuple(names)


def tp_spec(path) -> P:
    """PartitionSpec for one variables-tree leaf path.

    `path` is the jax key path of a leaf under the full variables tree
    {"posenet": {"params", "batch_stats"}, "refiner": {"params"}}.
    """
    names = _path_names(path)
    if len(names) < 4 or names[1] != "params":
        return P()  # batch_stats & anything unexpected: replicated
    net, _, mod, leaf = names[0], names[1], names[2], names[-1]
    if mod == "feat" and len(names) >= 5 and names[3] in _FEAT:
        return _FEAT[names[3]].get(leaf, P())
    m = _HEAD_RE.match(mod)
    if m and net in _HEADS:
        rule = _HEADS[net].get(f"conv{m.group(1)}", _REPL)
        return rule.get(leaf, P())
    return P()


def tp_shardings(mesh: Mesh, variables) -> Any:
    """NamedSharding tree for `variables` under a mesh with a `model` axis.

    Raises if any sharded dimension does not divide by the model-axis size
    (cannot happen with the stock architecture for model <= 8).
    """
    if "model" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'model' axis")
    msize = mesh.shape["model"]

    def one(path, leaf):
        spec = tp_spec(path)
        for dim, name in zip(np.shape(leaf), spec):
            if name == "model" and dim % msize:
                raise ValueError(
                    f"{'/'.join(_path_names(path))}: dim {dim} not divisible "
                    f"by model axis size {msize}")
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, variables)


def shard_variables(mesh: Mesh, variables) -> Any:
    """Device-put the variables tree with tensor-parallel shardings.

    In a multi-process world (mesh spanning hosts, every process holding
    the same host-local tree — the standard same-seed init), the global
    arrays are assembled from each process's LOCAL slices via
    make_array_from_callback: a plain device_put would launch a
    cross-process resharding program, whose gloo context rendezvous
    times out when processes arrive minutes apart (1-CPU hosts,
    tests/dist_step_runner.py)."""
    shardings = tp_shardings(mesh, variables)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(jax.device_put, variables, shardings)

    def put(leaf, sharding):
        host = np.asarray(leaf)
        return jax.make_array_from_callback(host.shape, sharding,
                                            lambda idx: host[idx])

    return jax.tree_util.tree_map(put, variables, shardings)


def sharded_param_count(variables) -> int:
    """Number of parameters that carry a non-trivial tensor-parallel spec
    (diagnostic for logs/tests)."""
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        if any(ax == "model" for ax in tp_spec(path)):
            total += int(np.prod(np.shape(leaf)))
    return total
