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

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache: first-compiles of the big fused
    detection graphs are minutes on the remote-compile path; the cache makes
    every later process start instant. Opt out with CVT_NO_COMPILE_CACHE=1."""
    try:
        import jax

        # Some environments install a site hook that calls
        # jax.config.update("jax_platforms", ...) at interpreter start,
        # which silently overrides the JAX_PLATFORMS env var. Re-assert the
        # user's explicit choice.
        env_platforms = _os.environ.get("JAX_PLATFORMS")
        if env_platforms and jax.config.jax_platforms != env_platforms:
            jax.config.update("jax_platforms", env_platforms)
    except Exception:  # pragma: no cover
        pass
    if _os.environ.get("CVT_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "CVT_COMPILE_CACHE_DIR",
            _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"),
        )
        jax.config.update("jax_compilation_cache_dir",
                          _os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from canonicalvoting_tpu.config import Config, load_config  # noqa: F401
