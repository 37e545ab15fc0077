"""canonicalvoting_tpu — a TPU-native (JAX/XLA/Pallas) framework for oriented 3D
bounding-box detection in point clouds via Canonical Voting.

This is a from-scratch rebuild of the capabilities of qq456cvb/CanonicalVoting
(CVPR 2022, "Canonical Voting: Towards Robust Oriented Bounding Box Detection
in 3D Scenes"), designed TPU-first:

  * the MinkowskiEngine sparse-conv backbone becomes a host-built kernel-map +
    on-device gather-form implicit GEMM that runs on the MXU
    (reference: /root/reference/utils/minkunet.py, MinkowskiEngine);
  * the `hv_cuda` CUDA Hough-voting extension becomes an XLA/Pallas scatter-add
    rotation sweep with a custom VJP
    (reference: /root/reference/houghvoting/src/hv_cuda_kernel.cu);
  * the iterative LCC-aware box peeling becomes a jit-compiled
    `lax.while_loop` that never syncs to host per box
    (reference: /root/reference/eval_joint.py:204-263);
  * data-parallel / sharded execution over `jax.sharding.Mesh` is a new,
    first-class capability (the reference is single-GPU only).
"""

__version__ = "0.1.0"

from canonicalvoting_tpu.config import Config, load_config  # noqa: F401
