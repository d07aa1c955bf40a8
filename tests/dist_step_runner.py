"""Subprocess body for tests/test_distributed.py: one process of a
multi-process CPU jax.distributed run (gloo collectives over the
DCN-path initialization `plr2_tpu.parallel.init_distributed`).

Scenarios (arg 4):
  stage1              — the original two-process check: 1 local device per
                        process, global `data` mesh, one stage-1 sharded
                        optimizer step.
  dptp_refine_save    — 4 processes x 2 virtual local devices: a
                        (data=2, model=4) mesh whose MODEL axis spans the
                        process boundary (Megatron column/row collectives
                        over "DCN"), one JOINT-stage (refine_iterations=2)
                        optimizer step, then an Orbax-style checkpoint
                        save of the stepped variables from process 0.
  dptp_refine_restore — fresh 4-process launch: restore the checkpoint
                        under init_distributed, re-shard over the same
                        dp x tp mesh, verify the restored tree, and run
                        one more joint-stage step.

Usage: python dist_step_runner.py <proc_id> <nproc> <port> [scenario]
                                  [ckpt_path]
Prints one RESULT line the parent test parses and cross-checks.
"""

import os
import sys

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
scenario = sys.argv[4] if len(sys.argv) > 4 else "stage1"
ckpt_path = sys.argv[5] if len(sys.argv) > 5 else ""

if scenario != "stage1":
    # 2 virtual devices per process -> 8 global devices over 4 processes
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=2"
                               ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from plr2_tpu.utils.cache import enable_cpu_compilation_cache  # noqa: E402

enable_cpu_compilation_cache()

from plr2_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding, init_distributed, make_mesh, replicated)

init_distributed(coordinator_address=f"127.0.0.1:{port}",
                 num_processes=nproc, process_id=proc_id)
assert jax.process_count() == nproc, jax.process_count()

import numpy as np  # noqa: E402

from plr2_tpu.parallel.data_parallel import make_train_step  # noqa: E402
from plr2_tpu.pipeline import DenseFusionPipeline  # noqa: E402

# the global batch MUST match test_distributed.py's single-process
# cross-checks byte-for-byte — shared constructor (tests/dist_common.py)
from dist_common import CROP, NPTS, NOBJ, make_full_batch  # noqa: E402


def shard_global_batch(mesh, full, data_shards):
    """Each process contributes the rows its addressable devices cover."""
    batch = full["idx"].shape[0]
    per = batch // data_shards
    # mesh.devices is laid out (data, ...); find which data-blocks this
    # process's devices live in
    blocks = sorted({int(np.argwhere(mesh.devices == d)[0][0])
                     for d in jax.local_devices()})
    rows = np.concatenate([np.arange(b * per, (b + 1) * per) for b in blocks])
    sh = batch_sharding(mesh)
    return {k: jax.make_array_from_process_local_data(
                sh, np.asarray(v)[rows])
            for k, v in full.items()}


def abs_sum(tree) -> float:
    return float(sum(np.abs(np.asarray(x, np.float64)).sum()
                     for x in jax.tree_util.tree_leaves(tree)))


def coord_barrier(name: str, timeout_ms: int = 1_800_000) -> None:
    """Align processes via the coordination service (pure gRPC).

    On this 1-CPU host the processes compile their programs minutes
    apart, but gloo's collective-context rendezvous has a hard ~30 s
    connect timeout — so every cross-process program is AOT-compiled
    first, then the processes meet HERE, then execution (and the gloo
    context init on its first collective) starts aligned."""
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(name, timeout_ms)


if scenario == "stage1":
    mesh = make_mesh()
    assert mesh.devices.size == jax.device_count()
    pipe = DenseFusionPipeline(num_points=NPTS, num_objects=NOBJ)
    # same seed on every process -> identical replicated parameters
    variables = pipe.init(jax.random.key(0), crop_hw=CROP, batch=1)
    init_fn, step = make_train_step(pipe, sym_list=(1,), w=0.015, lr=1e-4,
                                    mesh=mesh)
    opt_state = init_fn(variables)
    full = make_full_batch(2)
    batch = shard_global_batch(mesh, full, nproc)
    # compile-then-align, like the dptp scenarios below: the compile (or
    # cache-load + imports) skew between the two processes must not eat
    # into gloo's ~30 s first-collective window
    step_exe = step.lower(variables, opt_state, batch,
                          jax.random.key(7)).compile()
    coord_barrier("stage1_compiled")
    v, o, m = step_exe(variables, opt_state, batch, jax.random.key(7))
    loss = float(np.asarray(m["loss"]))
    leaf = np.asarray(jax.tree_util.tree_leaves(v["posenet"]["params"])[0])
    print(f"RESULT proc={proc_id} loss={loss:.8f} "
          f"checksum={float(np.abs(leaf).sum()):.8f}", flush=True)
    sys.exit(0)

# ---- dp x tp joint-stage scenarios: (data=2, model=4) over 4 processes ----
from plr2_tpu.parallel.tensor_parallel import shard_variables  # noqa: E402
from plr2_tpu.train.checkpoint import (load_variables,  # noqa: E402
                                       save_variables)


assert jax.device_count() == 8, jax.device_count()
# model axis of size 4 = the 2 local devices of TWO different processes:
# the Megatron all-reduces cross the process boundary
mesh = make_mesh(8, ("data", "model"), shape=(2, 4))
pipe = DenseFusionPipeline(num_points=NPTS, num_objects=NOBJ)
template = pipe.init(jax.random.key(0), crop_hw=CROP, batch=1)

if scenario == "dptp_refine_save":
    variables = template
else:  # dptp_refine_restore: the checkpoint IS the source of truth
    variables = load_variables(ckpt_path, template)
# comparable to the save phase's post-step `checksum=` (refiner params,
# the joint stage's training target)
restored_sum = abs_sum(variables["refiner"]["params"])

vs = shard_variables(mesh, variables)
init_fn, step = make_train_step(pipe, sym_list=(1,), w=0.015, lr=1e-4,
                                refine_iterations=2)
opt_state = init_fn(vs)
full = make_full_batch(4)
batch = shard_global_batch(mesh, full, data_shards=2)
key = jax.random.key(7)
# AOT-compile every cross-process program, THEN align (see coord_barrier)
step_c = step.lower(vs, opt_state, batch, key).compile()
gather = jax.jit(lambda t: t, out_shardings=replicated(mesh))
coord_barrier("step_compiled")
v, o, m = step_c(vs, opt_state, batch, key)
loss = float(np.asarray(m["loss"]))
# tp-sharded -> replicated all-gather: compile, re-align, execute
gather_c = gather.lower(v).compile()
coord_barrier("gather_compiled")
stepped = jax.tree_util.tree_map(lambda x: np.asarray(x), gather_c(v))
stepped_sum = abs_sum(stepped["refiner"]["params"])

if scenario == "dptp_refine_save":
    if proc_id == 0:
        save_variables(ckpt_path, stepped)
    coord_barrier("ckpt_saved")

print(f"RESULT proc={proc_id} loss={loss:.8f} checksum={stepped_sum:.8f} "
      f"restored={restored_sum:.8f}", flush=True)
