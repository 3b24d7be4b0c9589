"""Worker script for the TRUE two-process jax.distributed smoke test
(SURVEY §5.8). Launched twice by test_multihost_2proc.py with a shared
coordinator address; each process owns 2 virtual CPU devices, the global
mesh spans 4, and a psum + sharded 2-NN must agree with the local
reference on every process."""
import os
import sys

proc_id = int(sys.argv[1])
coord = sys.argv[2]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from rtabmap_tpu.parallel import multihost as MH  # noqa: E402

MH.initialize(coordinator_address=coord, num_processes=2, process_id=proc_id)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

info = MH.process_info()
assert info["process_count"] == 2, info
assert info["global_devices"] == 4, info

mesh = MH.global_mesh()
assert mesh.devices.size == 4

# cross-process psum over the global mesh via shard_map
from jax.experimental.shard_map import shard_map  # noqa: E402


def local_sum(x):
    return jax.lax.psum(x, "shard")


xs = jnp.arange(4.0)
y = jax.jit(
    shard_map(local_sum, mesh=mesh, in_specs=P("shard"), out_specs=P()),
    in_shardings=NamedSharding(mesh, P("shard")),
    out_shardings=NamedSharding(mesh, P()),
)(xs)
# fetching fully-replicated output is legal on every process
got = float(np.asarray(jax.device_get(y)))
assert got == 6.0, got

# sharded vocabulary 2-NN over the global mesh (the real workload)
from rtabmap_tpu.parallel import sharded as SH  # noqa: E402

rng = np.random.RandomState(0)
W, D, Q = 256, 256, 8
slab = np.where(rng.rand(W, D) > 0.5, 1, -1).astype(np.int8)
q = slab[rng.randint(0, W, Q)]
d2, i2 = SH.sharded_knn2(mesh, jnp.asarray(q), jnp.asarray(slab),
                         jnp.ones((W,), bool))
d2 = np.asarray(jax.device_get(d2))
i2 = np.asarray(jax.device_get(i2))
assert (d2[:, 0] == 0).all(), d2[:, 0]  # exact self-matches

print(f"MULTIHOST_OK p{proc_id}", flush=True)
