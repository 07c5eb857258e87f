"""Child process for the 2-process jax.distributed test (run by
tests/test_multihost.py, not collected by pytest).

Each process owns 2 virtual CPU devices; the pair forms a 4-device global
'data' mesh.  The process feeds its host-local half of the global batch
through ``host_local_batch_to_global`` and runs one psum'd train step —
the SURVEY §5.8 multi-host path end to end.

Usage: python _multihost_child.py <coordinator_port> <process_id> <nprocs>
"""

import os
import sys

port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from msau_tpu.config import ModelConfig, TrainConfig
from msau_tpu.models.msau import build_model
from msau_tpu.parallel.sharding import (
    host_local_batch_to_global,
    make_mesh,
    maybe_initialize_distributed,
)
from msau_tpu.train.optimizer import make_optimizer
from msau_tpu.train.trainer import TrainState, make_train_step

assert maybe_initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
), "distributed init returned False"
assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 2 * nprocs, len(jax.devices())

mesh = make_mesh((-1,), ("data",))
repl = NamedSharding(mesh, P())

cfg = ModelConfig(
    img_channels=4, n_class=3, scale_space_num=2, res_depth=1,
    feat_root=4, num_blocks=1,
)
tcfg = TrainConfig(
    learning_rate=1e-2, optimizer="momentum", lr_decay_staircase=False,
    donate_state=False, matmul_precision="",
)
model = build_model(cfg)
optimizer = make_optimizer(tcfg)

h = w = 16
local_bs = 2  # global batch = nprocs * local_bs = 4


def init_fn():
    import jax.numpy as jnp

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 4)))
    return TrainState.create(params, optimizer)


# jit with replicated out_shardings builds the global (process-spanning)
# train state identically on every process
state = jax.jit(init_fn, out_shardings=repl)()

# deterministic global batch; this host contributes rows
# [pid*local_bs, (pid+1)*local_bs) of it
rng = np.random.default_rng(0)
gx = rng.random((nprocs * local_bs, h, w, 4)).astype(np.float32)
gy = rng.integers(0, 3, (nprocs * local_bs, h, w)).astype(np.int32)
lo, hi = pid * local_bs, (pid + 1) * local_bs
local = {
    "input": gx[lo:hi],
    "label": gy[lo:hi],
    "valid": np.ones((local_bs, h, w), bool),
}
batch = host_local_batch_to_global(local, mesh)
assert batch["input"].shape == (nprocs * local_bs, h, w, 4)

step = make_train_step(model, optimizer, masked=True, donate=False)
new_state, metrics = step(state, batch)
loss = float(metrics["loss"])
gnorm = float(metrics["grad_norm"])
assert np.isfinite(loss), loss
print(f"MULTIHOST_OK pid={pid} loss={loss:.6f} grad_norm={gnorm:.6f}")
