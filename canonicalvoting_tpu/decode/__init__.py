from canonicalvoting_tpu.decode.peeling import PeelConfig, peel_boxes  # noqa: F401
