"""Learnability regression: the real joint-training path must LEARN.

Trains MinkUNet34C on synthetic scenes through ``run_joint_training`` (the
same loop/losses/schedules as reference train_joint.py:191-473) and runs the
full detection + Scan2CAD-mAP validation pass on held-out synthetic scenes.
Passing proves the loss -> vote -> peel -> NMS -> mAP chain *learns*, not
just that it runs — the strongest in-env proxy for reference mAP parity
(real ScanNet data is not available here).

Needs the real chip: run with  CV_TPU_TESTS=1 python -m pytest -m tpu
(tests/conftest.py forces the CPU backend otherwise; on CPU this training
run would take hours).
"""

import os

import pytest

EPOCHS = 30  # calibrated on TPU v5e: val mAP@0.5 reaches 1.0 by ~epoch 20


@pytest.mark.tpu
def test_joint_training_learns_synthetic(tmp_path):
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU chip (CV_TPU_TESTS=1)")

    from train_joint import build_synthetic

    from canonicalvoting_tpu.config import load_config
    from canonicalvoting_tpu.train.joint_loop import run_joint_training

    cfg = load_config(None, [
        f"max_epoch={EPOCHS}",
        "batch_size=3",
        "num_workers=0",
    ])
    train_ds, val_ds, gt_lookup = build_synthetic(cfg, n_train=8, n_val=2)
    state, ret = run_joint_training(
        cfg, train_ds, val_ds, workdir=str(tmp_path),
        gt_lookup=gt_lookup, eval_every=EPOCHS, cap_multiple=4096,
    )
    assert ret is not None, "validation must have run"
    m50 = float(ret[0.5]["mAP"])
    m25 = float(ret[0.25]["mAP"])
    assert m50 >= 0.8, f"joint training failed to learn: mAP@0.5={m50:.3f}"
    assert m25 >= m50 - 1e-6
