"""COMET-TPU: a TPU-native (JAX/XLA/Pallas) framework for 6-DoF spacecraft pose
estimation from monocular RGB video.

Re-designed from scratch with the capability surface of
wulibingbinglin/COMET-Pose-Estimation (see SURVEY.md), built TPU-first:

- pure-function models (flax.linen) compiled to a single jitted graph
- static shapes, `lax.scan` iteration, fused correlation/attention kernels
- data parallelism via `jax.sharding.Mesh` + NamedSharding (no NCCL-style code)
- float64 metric islands on host (numpy) for evaluation parity
"""

__version__ = "0.1.0"
