"""cnmnet_tpu — a TPU-native multi-frame depth & normal estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of CNMNet
("Occlusion-Aware Depth Estimation with Adaptive Normal Constraints",
ECCV 2020; reference implementation surveyed in SURVEY.md):

* plane-sweep cost volumes built by differentiable homography warps,
* a conv encoder-decoder DepthNet regressing multi-scale inverse depth,
* an occlusion-aware DepthRefineNet fusing per-source-pair hypotheses into a
  refined inverse-depth map plus an occlusion-probability map,
* the Combined Normal Map (CNM) training constraint: a differentiable
  depth->normal operator compared against plane-averaged ground-truth normals.

Design notes (TPU-first, not a port):
* all dense compute is pure-jnp / Pallas under ``jax.jit`` — static shapes,
  ``lax`` control flow, NHWC layouts, bf16 matmul paths;
* scaling is expressed through ``jax.sharding`` meshes (data x tile) rather
  than any explicit communication backend;
* every Pallas kernel has a pure-jnp reference implementation in ``ops/``
  which is the source of truth for tests and the CPU fallback.
"""

__version__ = "0.1.0"
