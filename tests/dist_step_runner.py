"""Subprocess body for tests/test_distributed.py: one process of a
two-process CPU jax.distributed run. Initializes the distributed runtime
through plr2_tpu.parallel.init_distributed (gloo CPU collectives), builds
the GLOBAL mesh, and runs one mesh-sharded optimizer step with this
process's half of the batch.

Usage: python dist_step_runner.py <process_id> <num_processes> <port>
Prints one RESULT line the parent test parses and cross-checks.
"""

import sys

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from plr2_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding, init_distributed, make_mesh)

init_distributed(coordinator_address=f"127.0.0.1:{port}",
                 num_processes=nproc, process_id=proc_id)
assert jax.process_count() == nproc, jax.process_count()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from plr2_tpu.parallel.data_parallel import make_train_step  # noqa: E402
from plr2_tpu.pipeline import DenseFusionPipeline  # noqa: E402

CROP, NPTS, NOBJ, BATCH = 48, 64, 2, 2

mesh = make_mesh()
assert mesh.devices.size == jax.device_count()

pipe = DenseFusionPipeline(num_points=NPTS, num_objects=NOBJ)
# same seed on every process -> identical replicated parameters
variables = pipe.init(jax.random.key(0), crop_hw=CROP, batch=1)
init_fn, step = make_train_step(pipe, sym_list=(1,), w=0.015, lr=1e-4,
                                mesh=mesh)
opt_state = init_fn(variables)

# the full global batch is generated identically everywhere; each process
# contributes its own slice as a global sharded array
ks = jax.random.split(jax.random.key(1), 5)
full = {
    "img": jax.random.normal(ks[0], (BATCH, CROP, CROP, 3), jnp.float32),
    "points": jax.random.normal(ks[1], (BATCH, NPTS, 3)) * 0.1,
    "choose": jax.random.randint(ks[2], (BATCH, NPTS), 0, CROP * CROP),
    "target": jax.random.normal(ks[3], (BATCH, 64, 3)) * 0.05,
    "model_points": jax.random.normal(ks[3], (BATCH, 64, 3)) * 0.05,
    "idx": jnp.arange(BATCH, dtype=jnp.int32) % NOBJ,
}
per = BATCH // nproc
lo = proc_id * per
data_sh = batch_sharding(mesh)
batch = {k: jax.make_array_from_process_local_data(
             data_sh, np.asarray(v[lo:lo + per]))
         for k, v in full.items()}

v, o, m = step(variables, opt_state, batch, jax.random.key(7))
loss = float(np.asarray(m["loss"]))
leaf = np.asarray(jax.tree_util.tree_leaves(v["posenet"]["params"])[0])
print(f"RESULT proc={proc_id} loss={loss:.8f} "
      f"checksum={float(np.abs(leaf).sum()):.8f}", flush=True)
