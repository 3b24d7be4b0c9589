"""rtabmap_tpu — a TPU-native SLAM framework (RTAB-Map capability target).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
introlab/rtabmap: RGB-D/stereo visual odometry, appearance-based loop
closure (incremental bag-of-visual-words + Bayesian filter), ICP/scan
registration, pose-graph optimization + bundle adjustment, the STM/WM/LTM
bounded-working-set memory model with persistent map stores and
multi-session mapping, occupancy/cloud map assembly, and dataset benchmark
tooling — with the compute path built as batched, statically-shaped device
kernels and the state shardable over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from rtabmap_tpu.utils.params import Parameters  # noqa: F401
