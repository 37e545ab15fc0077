from canonicalvoting_tpu.utils.meters import AverageMeter  # noqa: F401
