import jax
import jax.numpy as jnp
import numpy as np
import optax

from canonicalvoting_tpu.models.resnet_classifier import (
    SparseResNetClassifier,
    toy_pattern_batch,
)
from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid


def _prep(coords, cap_multiple=64):
    return build_pyramid(coords, PyramidSpec(cap_multiple=cap_multiple))


def test_toy_classifier_learns(rng):
    """Spirit of the reference's utils/resnet.py __main__ smoke: a tiny
    sparse ResNet fits distinguishable synthetic point patterns."""
    model = SparseResNetClassifier(1, 3, layers=(1, 1, 1, 1),
                                   planes=(8, 16, 16, 16), init_dim=8)
    # fixed training set of 6 samples, 2 per class
    samples = []
    while {s[2] for s in samples} != {0, 1, 2} or len(samples) < 6:
        samples.append(toy_pattern_batch(rng))
        if len(samples) > 30:
            break

    preps = []
    for coords, feats, label in samples:
        pyr = _prep(coords)
        n0 = pyr.coords[0].shape[0]
        f = np.zeros((n0, 1), np.float32)
        f[: len(feats)] = feats
        preps.append((f, pyr.as_jax_inputs(), label))

    variables = model.init(jax.random.PRNGKey(0), preps[0][0], preps[0][1], True)
    params = variables["params"]
    stats = variables["batch_stats"]
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    def loss_fn(params, stats, f, p, label):
        logits, upd = model.apply(
            {"params": params, "batch_stats": stats}, f, p, True,
            mutable=["batch_stats"],
        )
        return -jax.nn.log_softmax(logits)[label], upd["batch_stats"]

    first_loss = None
    for epoch in range(15):
        total = 0.0
        for f, p, label in preps:
            (l, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, stats, f, p, label
            )
            upd, opt_state = opt.update(g, opt_state)
            params = optax.apply_updates(params, upd)
            total += float(l)
        if first_loss is None:
            first_loss = total
    assert total < first_loss, (first_loss, total)


def test_metrics_logger(tmp_path):
    from canonicalvoting_tpu.utils.metrics_log import MetricsLogger

    ml = MetricsLogger(str(tmp_path))
    ml.log(1, {"loss": 0.5, "loss_xyz": 0.2})
    ml.log(2, {"loss": 0.4, "loss_xyz": 0.1})
    ml.log_map_table(10, {"mAP": 0.5, "AR": 0.6}, 0.25)
    import json

    lines = open(tmp_path / "metrics.jsonl").read().splitlines()
    assert len(lines) == 3
    assert json.loads(lines[0])["loss"] == 0.5
    assert json.loads(lines[2])["iou0.25/mAP"] == 0.5
    csv_lines = open(tmp_path / "metrics.csv").read().splitlines()
    assert csv_lines[0].startswith("step,")
