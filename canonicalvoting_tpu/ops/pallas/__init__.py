from canonicalvoting_tpu.ops.pallas.hv_splat import hv_splat_pallas  # noqa: F401
