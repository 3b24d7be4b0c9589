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

# ---- the FULL SLAM ENGINE on the 2-process global mesh (SURVEY §5.8
# end state; VERDICT r4 next #4): every process drives the same host
# loop SPMD-style, the Memory/vocab slabs shard over the 4 global
# devices (2 per process), and the closure decisions must match the
# single-device engine run locally in this same process.
from rtabmap_tpu.datasets.synthetic import FeatureWorld  # noqa: E402
from rtabmap_tpu.engine.rtabmap import Rtabmap  # noqa: E402
from rtabmap_tpu.geometry import camera as C  # noqa: E402
from rtabmap_tpu.utils.params import Parameters  # noqa: E402

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
WAYS = list(range(16)) + list(range(6))


def run_engine(m):
    p = Parameters({"Tpu/VocabularyCapacity": 4096,
                    "Rtabmap/LoopThr": 0.05})
    world = FeatureWorld(CAM, n_ways=24, K=128)
    slam = Rtabmap(CAM, p, node_capacity=32, words_per_frame=128, mesh=m)
    closures, prox = [], 0
    for i, w in enumerate(WAYS):
        pose = world.pose(w, nudge=0.01 if i >= 16 else 0.0)
        st = slam.process(world.frame(w, i), pose, stamp=float(i))
        closures.append(int(st.loop_closure_id))
        prox += int(st.get("Proximity/Space links added/"))
    return closures, prox, slam.get_optimized_poses()


c_ref, px_ref, p_ref = run_engine(None)
c_mh, px_mh, p_mh = run_engine(mesh)
assert any(c > 0 for c in c_ref) or px_ref > 0, "scenario has no closure"
assert c_mh == c_ref, (c_mh, c_ref)
assert px_mh == px_ref, (px_mh, px_ref)
assert set(p_mh) == set(p_ref)
worst = max(np.abs(np.asarray(p_mh[i]) - np.asarray(p_ref[i])).max()
            for i in p_ref)
assert worst < 1e-3, worst
print(f"ENGINE_MULTIHOST_OK p{proc_id} closures="
      f"{sum(1 for c in c_ref if c)} prox={px_ref} worst={worst:.2e}",
      flush=True)

print(f"MULTIHOST_OK p{proc_id}", flush=True)
