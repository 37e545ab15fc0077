import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.config import Config
from canonicalvoting_tpu.data.collate import collate_joint, collate_separate
from canonicalvoting_tpu.data.geometry import NCLASSES
from canonicalvoting_tpu.data.synthetic import make_scene
from canonicalvoting_tpu.models import MinkUNet14A
from canonicalvoting_tpu.ops.voxelize import sparse_quantize
from canonicalvoting_tpu.train.losses import (
    SYM_CODES,
    joint_losses,
    separate_losses,
    symmetry_xyz_loss,
)
from canonicalvoting_tpu.train.schedules import bn_momentum_for_epoch, lr_for_epoch
from canonicalvoting_tpu.train.steps import (
    create_train_state,
    make_joint_train_step,
    make_optimizer,
    make_separate_train_step,
)


def _joint_items(rng, n_scenes=2):
    items = []
    for i in range(n_scenes):
        scene = make_scene(rng, extent=(2.0, 1.5, 2.0), n_background=1500,
                           n_boxes=1, pts_per_box=400)
        coords, idx = sparse_quantize(scene.points, 0.03)
        items.append((
            f"scene{i}", coords, scene.rgb[idx], scene.xyz_labels[idx],
            scene.scale_labels[idx], scene.class_labels[idx],
        ))
    return items


def _tiny_joint_items(rng, n_scenes=2):
    """CPU-sized scenes: 32^3 dense grids after base alignment/rounding."""
    items = []
    for i in range(n_scenes):
        scene = make_scene(rng, extent=(0.5, 0.5, 0.5), n_background=300,
                           n_boxes=1, pts_per_box=150)
        coords, idx = sparse_quantize(scene.points, 0.03)
        items.append((
            f"scene{i}", coords, scene.rgb[idx], scene.xyz_labels[idx],
            scene.scale_labels[idx], scene.class_labels[idx],
        ))
    return items


def test_schedules_match_reference():
    # base 1e-3, decay x0.1 at 80/120/160 (config/config.yaml:32-36)
    assert lr_for_epoch(0, 1e-3, [80, 120, 160], [0.1, 0.1, 0.1]) == 1e-3
    assert abs(lr_for_epoch(80, 1e-3, [80, 120, 160], [0.1, 0.1, 0.1]) - 1e-4) < 1e-12
    assert abs(lr_for_epoch(160, 1e-3, [80, 120, 160], [0.1, 0.1, 0.1]) - 1e-6) < 1e-15
    # bn momentum: 0.5 * 0.5^(epoch//20), floored at 0.001
    assert bn_momentum_for_epoch(0, 20, 0.5) == 0.5
    assert bn_momentum_for_epoch(20, 20, 0.5) == 0.25
    assert bn_momentum_for_epoch(1000, 20, 0.5) == 0.001


def test_joint_losses_match_manual(rng):
    n, nc = 64, NCLASSES
    out = rng.randn(n, 6 * nc + nc + 1).astype(np.float32)
    xyz = rng.randn(n, 3).astype(np.float32)
    scale = rng.uniform(0.2, 1.0, (n, 3)).astype(np.float32)
    cls = rng.randint(0, nc + 1, (n,)).astype(np.int32)
    nvalid = 50

    losses = joint_losses(out, xyz, scale, cls, nvalid, (1.0, 1.0, 1.0))

    # manual reference computation over valid rows
    mask = (cls[:nvalid] >= 0) & (cls[:nvalid] < nc)
    idx = np.clip(cls[:nvalid], 0, nc - 1)
    ox = out[:nvalid, : 3 * nc].reshape(-1, nc, 3)[np.arange(nvalid), idx]
    osc = out[:nvalid, 3 * nc: 6 * nc].reshape(-1, nc, 3)[np.arange(nvalid), idx]
    lx = np.mean((ox[mask] - xyz[:nvalid][mask]) ** 2)
    ls = np.mean((osc[mask] - np.log(scale[:nvalid][mask])) ** 2)
    logits = out[:nvalid, 6 * nc:]
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    lc = -np.mean(np.log(p[np.arange(nvalid), cls[:nvalid]] + 1e-30))
    np.testing.assert_allclose(float(losses["loss_xyz"]), lx, rtol=1e-4)
    np.testing.assert_allclose(float(losses["loss_scale"]), ls, rtol=1e-4)
    np.testing.assert_allclose(float(losses["loss_class"]), lc, rtol=1e-4)


def test_symmetry_loss_matches_loop_oracle(rng):
    """Vectorized min-over-hypotheses == the reference's Python double loop
    (train_separate.py:265-278)."""
    from canonicalvoting_tpu.data.geometry import SYMMETRY_ANGLES, roty

    n, n_obj = 120, 3
    pred = rng.randn(n, 3).astype(np.float32)
    base = rng.randn(n, 3).astype(np.float32)
    obj_id = rng.randint(-1, n_obj, (n,)).astype(np.int32)
    syms = ["__SYM_NONE", "__SYM_ROTATE_UP_4", "__SYM_ROTATE_UP_INF"]
    sym_code = np.array([SYM_CODES[s] for s in syms], np.int32)
    nvalid = 100

    got = float(symmetry_xyz_loss(
        pred, base, obj_id, np.pad(sym_code, (0, 13)), n_obj,
        (1.0, 1.0, 1.0), 16, nvalid,
    ))

    # loop oracle
    per_obj = []
    for o in range(n_obj):
        sel = (obj_id[:nvalid] == o)
        if sel.sum() == 0:
            continue
        hyp_losses = []
        for a in [0.0] + list(SYMMETRY_ANGLES[syms[o]]):
            R = roty(-a)[:3, :3]
            lab = base[:nvalid][sel] @ R.T
            hyp_losses.append(np.mean((pred[:nvalid][sel] - lab) ** 2))
        per_obj.append(min(hyp_losses))
    expected = float(np.mean(per_obj))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_joint_train_step_decreases_loss(rng):
    cfg = Config()
    items = _joint_items(rng)
    batch = collate_joint(items, cap_multiple=512)
    model = MinkUNet14A(3, 6 * NCLASSES + NCLASSES + 1, compute_dtype="float32")
    optimizer = make_optimizer(cfg.weight_decay)
    state = create_train_state(model, optimizer, batch["feats"], batch["pyramid"])
    step = make_joint_train_step(model, optimizer, cfg)

    lr = jnp.float32(1e-3)
    mom = jnp.float32(0.5)
    state, losses0 = step(state, batch, lr, mom)
    l0 = float(losses0["loss"])
    for _ in range(5):
        state, losses = step(state, batch, lr, mom)
    l1 = float(losses["loss"])
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0, (l0, l1)


def test_dense_train_grads_match_gather(rng):
    """backbone="dense" training: same variables, same batch -> same loss
    and same parameter gradients as the gather-form sparse path."""
    import jax.tree_util as jtu

    from canonicalvoting_tpu.data.collate import collate_joint_dense
    from canonicalvoting_tpu.models.dense_unet import DenseMinkUNet
    from canonicalvoting_tpu.train.losses import joint_losses as jl

    cfg = Config()
    # one scene: grad parity is per-path math, batching is covered by
    # test_dense_joint_train_step_runs (B=2); CPU Conv3D grads are slow
    items = _tiny_joint_items(rng, n_scenes=1)
    batch_g = collate_joint(items, cap_multiple=512)
    batch_d = collate_joint_dense(items, cap_multiple=512)
    out_ch = 6 * NCLASSES + NCLASSES + 1
    # tiny channel plan: CPU Conv3D is slow, and parity is plan-independent
    planes = (8, 16, 32, 32, 32, 32, 16, 16)
    from canonicalvoting_tpu.models.minkunet import MinkUNetBase

    model_g = MinkUNetBase(
        in_channels=3, out_channels=out_ch, block="basic",
        layers=(1,) * 8, planes=planes, init_dim=8,
        compute_dtype="float32",
    )
    model_d = DenseMinkUNet(
        in_channels=3, out_channels=out_ch, block="basic",
        layers=(1,) * 8, planes=planes, init_dim=8,
        compute_dtype="float32",
    )
    optimizer = make_optimizer(0.0)
    state = create_train_state(model_g, optimizer, batch_g["feats"],
                               batch_g["pyramid"])
    dims = tuple(batch_d["meta"]["grid_dims"])
    B = batch_d["meta"]["n_scenes"]
    xw = tuple(cfg.xyz_weights)

    def loss_g(params):
        out, _ = model_g.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch_g["feats"], batch_g["pyramid"], True, 0.5,
            mutable=["batch_stats"])
        return jl(out, batch_g["xyz_labels"], batch_g["scale_labels"],
                  batch_g["class_labels"], batch_g["pyramid"]["nvalid"][0],
                  xw)["loss"]

    def loss_d(params):
        out, _ = model_d.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch_d["feats"], batch_d["flat_idx"], batch_d["valid"],
            dims, True, 0.5, n_scenes=B, mutable=["batch_stats"])
        return jl(out, batch_d["xyz_labels"], batch_d["scale_labels"],
                  batch_d["class_labels"], batch_d["nvalid"], xw)["loss"]

    lg, gg = jax.value_and_grad(loss_g)(state.params)
    ld, gd = jax.value_and_grad(loss_d)(state.params)
    np.testing.assert_allclose(float(lg), float(ld), rtol=1e-4)
    flat_g = jtu.tree_flatten_with_path(gg)[0]
    flat_d = dict(jtu.tree_flatten_with_path(gd)[0])
    assert len(flat_g) == len(flat_d)
    for k, vg in flat_g:
        vd = flat_d[k]
        np.testing.assert_allclose(
            np.asarray(vg), np.asarray(vd), atol=5e-4, rtol=5e-3,
            err_msg=jtu.keystr(k))


def test_dense_joint_train_step_runs(rng):
    """The backbone="dense" step function trains end-to-end."""
    from canonicalvoting_tpu.data.collate import collate_joint_dense
    from canonicalvoting_tpu.models.dense_unet import DenseMinkUNet
    from canonicalvoting_tpu.train.steps import create_train_state_dense

    cfg = Config()
    # single tiny scene, 2 steps: this test is dominated by the CPU compile
    # of the dense backward convs — keep the traced graph minimal
    items = _tiny_joint_items(rng, n_scenes=1)
    batch = collate_joint_dense(items, cap_multiple=512)
    out_ch = 6 * NCLASSES + NCLASSES + 1
    model = DenseMinkUNet(
        in_channels=3, out_channels=out_ch, block="basic",
        layers=(1,) * 8, planes=(8, 16, 32, 32, 32, 32, 16, 16), init_dim=8,
        compute_dtype="float32",
    )
    optimizer = make_optimizer(0.0)
    state = create_train_state_dense(model, optimizer, batch)
    step = make_joint_train_step(model, optimizer, cfg, backbone="dense")
    state, losses0 = step(state, batch, jnp.float32(1e-3), jnp.float32(0.5))
    state, losses = step(state, batch, jnp.float32(1e-3), jnp.float32(0.5))
    assert np.isfinite(float(losses0["loss"]))
    assert float(losses["loss"]) < float(losses0["loss"])


def test_separate_train_step_runs(rng):
    cfg = Config()
    items = []
    for i in range(2):
        scene = make_scene(rng, extent=(2.0, 1.5, 2.0), n_background=1200,
                           n_boxes=2, pts_per_box=300)
        coords, idx = sparse_quantize(scene.points, 0.03)
        cls = scene.class_labels[idx]
        obj_lab = (cls < NCLASSES).astype(np.int32)
        # object ids: boxes indexed in scene order
        oid = np.full(len(coords), -1, np.int32)
        for bi, b in enumerate(scene.boxes):
            from canonicalvoting_tpu.data.geometry import rotmat_y
            pw = coords.astype(np.float32) * 0.03
            inv = ((pw - b.center) @ rotmat_y(b.yaw)) / b.scale
            oid[np.all(np.abs(inv) < 1, -1)] = bi
        sym = np.array([1, 3][: len(scene.boxes)], np.int32)
        items.append((
            f"s{i}", coords, scene.rgb[idx], scene.xyz_labels[idx],
            scene.scale_labels[idx], obj_lab, cls, oid, sym,
        ))
    batch = collate_separate(items, cap_multiple=512, max_objects=16)
    model = MinkUNet14A(3, 8, compute_dtype="float32")
    optimizer = make_optimizer(0.0)
    state = create_train_state(model, optimizer, batch["feats"], batch["pyramid"])
    step = make_separate_train_step(model, optimizer, Config(), max_objects=16)
    state, losses = step(state, batch, jnp.float32(1e-3), jnp.float32(0.5))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_separate_training_runs_validation(rng, tmp_path):
    """run_separate_training uses val_ds: every eval_every epochs it runs the
    detection + mAP pass and returns per-category AP/Recall results
    (reference train_separate.py:301-455)."""
    import train_separate as ts
    from canonicalvoting_tpu.train.separate_loop import run_separate_training

    cfg = Config()
    cfg.category = "03001627"  # chair
    cfg.num_workers = 0
    cfg.batch_size = 2
    ds, gt_lookup = ts.build_synthetic_sym(cfg, n_scenes=2)
    model = MinkUNet14A(3, 8, compute_dtype="float32")
    state, ret = run_separate_training(
        cfg, ds, ds, workdir=str(tmp_path), gt_lookup=gt_lookup,
        eval_every=1, max_epoch=1, cap_multiple=512, model=model,
    )
    assert ret is not None
    for thresh in (0.25, 0.5):
        # per-class AP/Recall keys exist for the GT classes and aggregate
        # mAP/AR are finite (the keyed classes come from the synthetic GT)
        ap_keys = [k for k in ret[thresh] if k.endswith("Average Precision")]
        rec_keys = [k for k in ret[thresh] if k.endswith("Recall")]
        assert ap_keys and rec_keys
        assert np.isfinite(ret[thresh]["mAP"])
        assert np.isfinite(ret[thresh]["AR"])


def test_checkpoint_roundtrip(rng, tmp_path):
    from canonicalvoting_tpu.train.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    cfg = Config()
    items = _joint_items(rng, n_scenes=1)
    batch = collate_joint(items, cap_multiple=512)
    model = MinkUNet14A(3, 64, compute_dtype="float32")
    optimizer = make_optimizer(0.0)
    state = create_train_state(model, optimizer, batch["feats"], batch["pyramid"])
    path = str(tmp_path / "epoch10.ckpt")
    save_checkpoint(path, state, 10)
    restored, epoch = restore_checkpoint(path, state)
    assert epoch == 10
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert latest_checkpoint(str(tmp_path)) == path


def test_joint_loop_dense_backbone_wiring(rng, tmp_path):
    """run_joint_training with tpu.train_backbone=dense (the TPU default)
    wires collate_joint_dense + create_train_state_dense + the dense train
    step end-to-end on a tiny model."""
    from canonicalvoting_tpu.config import load_config
    from canonicalvoting_tpu.data.loader import ListDataset
    from canonicalvoting_tpu.models.minkunet import MinkUNetBase
    from canonicalvoting_tpu.train.joint_loop import run_joint_training

    cfg = load_config(None, [
        "max_epoch=1", "batch_size=2", "num_workers=0",
        "tpu.train_backbone=dense", "tpu.conv_dtype=float32",
    ])
    items = _tiny_joint_items(rng, n_scenes=2)
    model = MinkUNetBase(
        in_channels=3, out_channels=6 * NCLASSES + NCLASSES + 1,
        block="basic", layers=(1,) * 8, planes=(8, 16, 16, 16, 16, 16, 8, 8),
        init_dim=8, compute_dtype="float32",
    )
    state, ret = run_joint_training(
        cfg, ListDataset(items), ListDataset(items[:1]),
        workdir=str(tmp_path), gt_lookup=lambda _id: [], eval_every=999,
        cap_multiple=256, model=model,
    )
    # epoch 0 triggers a val (0 % eval_every == 0); with no GT boxes the
    # mAP is all-zero
    assert ret is None or all(
        v["mAP"] == 0.0 for v in ret.values()
    )
    # epochs 0..max_epoch with one batch each (start_epoch defaults to 0,
    # reference config/config.yaml:22)
    assert int(state.step) == 2
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.all(np.isfinite(np.asarray(p))) for p in leaves)


def test_validation_path_escalates_on_budget_exit(rng, monkeypatch, tmp_path):
    """run_joint_validation must use run_scene_with_retry: a scene whose peel
    exits on an iteration budget (truncated=True) gets re-run with escalated
    budgets until the threshold exit, so the detections feeding the mAP
    numbers are never silently incomplete (reference peels unbounded,
    eval_joint.py:204)."""
    import dataclasses

    from canonicalvoting_tpu.config import Config
    from canonicalvoting_tpu.decode.peeling import PeelConfig
    from canonicalvoting_tpu.eval.pipeline import DetectionPipeline
    from canonicalvoting_tpu.train import joint_loop

    peels_seen = []

    @dataclasses.dataclass
    class BudgetedPipeline(DetectionPipeline):
        """Real retry/postprocess logic; the device pass is faked to exit on
        budget until max_iters has been escalated past the 'peak count'."""

        def prepare_quantized(self, coords, feats_raw):
            return ("fake",)

        def run_scene(self, args, peel=None):
            peel = self.peel if peel is None else peel
            peels_seen.append(peel.max_iters)
            if peel.max_iters < 4 * self.peel.max_iters:
                return {
                    "truncated": np.asarray(True),
                    "n_boxes": np.asarray(0), "n_dropped": np.asarray(0),
                    "boxes": np.zeros((peel.max_boxes, 8, 3), np.float32),
                    "scores": np.zeros((peel.max_boxes,), np.float32),
                    "classes": np.zeros((peel.max_boxes,), np.int32),
                }
            box = np.array(
                [[x, y, z] for x in (0.0, 1.0) for y in (0.0, 1.0)
                 for z in (0.0, 1.0)], np.float32)[None]
            boxes = np.zeros((peel.max_boxes, 8, 3), np.float32)
            boxes[0] = box
            scores = np.zeros((peel.max_boxes,), np.float32)
            scores[0] = 0.9
            return {
                "truncated": np.asarray(False),
                "n_boxes": np.asarray(1), "n_dropped": np.asarray(0),
                "boxes": boxes, "scores": scores,
                "classes": np.zeros((peel.max_boxes,), np.int32),
            }

    monkeypatch.setattr(joint_loop, "DetectionPipeline", BudgetedPipeline)

    cfg = Config()
    state = type("S", (), {"params": {}, "batch_stats": {}})()
    coords = np.zeros((4, 3), np.int32)
    feats = np.zeros((4, 3), np.float32)
    val_ds = [("scene0", coords, feats)]
    ret = joint_loop.run_joint_validation(
        cfg, model=None, state=state, val_dataset=val_ds,
        gt_lookup=lambda _id: [],
    )
    # escalated at least once (first call truncated) and the escalated box
    # reached the mAP stage
    assert len(peels_seen) >= 2 and peels_seen[1] == 4 * peels_seen[0]
    assert ret is not None and 0.25 in ret and 0.5 in ret


def test_eval_joint_cli_uses_retry():
    """Wiring guard: the eval_joint CLI's scene loop goes through
    run_scene_with_retry (budget-exit scenes escalate, VERDICT r4 item 4)."""
    import inspect

    import eval_joint

    assert "run_scene_with_retry" in inspect.getsource(eval_joint.main)


def _sep_items(rng, n_scenes=2, extent=(0.6, 0.6, 0.6), n_background=300,
               pts_per_box=150):
    """Separate-trainer items (collate_separate format) at CPU size."""
    from canonicalvoting_tpu.data.geometry import rotmat_y

    items = []
    for i in range(n_scenes):
        scene = make_scene(rng, extent=extent, n_background=n_background,
                           n_boxes=1, pts_per_box=pts_per_box)
        coords, idx = sparse_quantize(scene.points, 0.03)
        cls = scene.class_labels[idx]
        obj_lab = (cls < NCLASSES).astype(np.int32)
        oid = np.full(len(coords), -1, np.int32)
        for bi, b in enumerate(scene.boxes):
            pw = coords.astype(np.float32) * 0.03
            inv = ((pw - b.center) @ rotmat_y(b.yaw)) / b.scale
            oid[np.all(np.abs(inv) < 1, -1)] = bi
        sym = np.array([1], np.int32)
        items.append((
            f"s{i}", coords, scene.rgb[idx], scene.xyz_labels[idx],
            scene.scale_labels[idx], obj_lab, cls, oid, sym,
        ))
    return items


def test_separate_dense_grads_match_gather(rng):
    """The separate trainer's backbone="dense" path: same variables, same
    batch -> same loss and parameter grads as the gather-form path
    (mirrors test_dense_train_grads_match_gather for separate_losses;
    reference trainer /root/reference/train_separate.py:184-298)."""
    import jax.tree_util as jtu

    from canonicalvoting_tpu.models.dense_unet import DenseMinkUNet
    from canonicalvoting_tpu.models.minkunet import MinkUNetBase
    from canonicalvoting_tpu.train.losses import separate_losses as sl

    cfg = Config()
    items = _sep_items(rng, n_scenes=1)
    batch_g = collate_separate(items, cap_multiple=512, max_objects=16)
    batch_d = collate_separate(items, cap_multiple=512, max_objects=16,
                               dense=True)
    planes = (8, 16, 32, 32, 32, 32, 16, 16)
    model_g = MinkUNetBase(
        in_channels=3, out_channels=8, block="basic", layers=(1,) * 8,
        planes=planes, init_dim=8, compute_dtype="float32",
    )
    model_d = DenseMinkUNet(
        in_channels=3, out_channels=8, block="basic", layers=(1,) * 8,
        planes=planes, init_dim=8, compute_dtype="float32",
    )
    optimizer = make_optimizer(0.0)
    state = create_train_state(model_g, optimizer, batch_g["feats"],
                               batch_g["pyramid"])
    dims = tuple(batch_d["meta"]["grid_dims"])
    B = batch_d["meta"]["n_scenes"]
    xw = tuple(cfg.xyz_weights)

    def losses_for(out, batch, nvalid):
        return sl(out, batch["base_xyz"], batch["scale_labels"],
                  batch["obj_labels"], batch["obj_id"], batch["sym_code"],
                  batch["num_objects"], nvalid, xw, 16, cfg.log_scale,
                  cfg.xyz_factor, cfg.scale_factor)["loss"]

    def loss_g(params):
        out, _ = model_g.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch_g["feats"], batch_g["pyramid"], True, 0.5,
            mutable=["batch_stats"])
        return losses_for(out, batch_g, batch_g["pyramid"]["nvalid"][0])

    def loss_d(params):
        out, _ = model_d.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch_d["feats"], batch_d["flat_idx"], batch_d["valid"],
            dims, True, 0.5, n_scenes=B, mutable=["batch_stats"])
        return losses_for(out, batch_d, batch_d["nvalid"])

    lg, gg = jax.value_and_grad(loss_g)(state.params)
    ld, gd = jax.value_and_grad(loss_d)(state.params)
    np.testing.assert_allclose(float(lg), float(ld), rtol=1e-4)
    flat_g = jtu.tree_flatten_with_path(gg)[0]
    flat_d = dict(jtu.tree_flatten_with_path(gd)[0])
    assert len(flat_g) == len(flat_d)
    for k, vg in flat_g:
        np.testing.assert_allclose(
            np.asarray(vg), np.asarray(flat_d[k]), atol=5e-4, rtol=5e-3,
            err_msg=jtu.keystr(k))


def test_separate_loop_dense_backbone_wiring(rng, tmp_path):
    """run_separate_training with tpu.train_backbone=dense wires
    collate_separate(dense=True) + create_train_state_dense + the dense
    separate step end-to-end, and its checkpoints interop with the
    validation pipeline (identical parameter tree)."""
    from canonicalvoting_tpu.config import load_config
    from canonicalvoting_tpu.data.loader import ListDataset
    from canonicalvoting_tpu.models.minkunet import MinkUNetBase
    from canonicalvoting_tpu.train.separate_loop import run_separate_training

    cfg = load_config(None, [
        "max_epoch=1", "batch_size=2", "num_workers=0",
        "category=03001627",
        "tpu.train_backbone=dense", "tpu.conv_dtype=float32",
        "tpu.max_objects=16",
    ])
    items = _sep_items(rng, n_scenes=2)
    model = MinkUNetBase(
        in_channels=3, out_channels=8, block="basic", layers=(1,) * 8,
        planes=(8, 16, 16, 16, 16, 16, 8, 8), init_dim=8,
        compute_dtype="float32",
    )
    state, ret = run_separate_training(
        cfg, ListDataset(items), ListDataset([(it[0], it[1], it[2])
                                              for it in items[:1]]),
        workdir=str(tmp_path), gt_lookup=lambda _id: [], eval_every=999,
        cap_multiple=256, model=model,
    )
    assert int(state.step) == 2
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.all(np.isfinite(np.asarray(p))) for p in leaves)


def test_dense_accum_remat_matches_whole_batch(rng):
    """Gradient accumulation (microbatch=1) with per-block remat on a
    single-scene batch == the whole-batch dense step exactly (remat is
    numerics-preserving; with one scene the BN microbatch semantics
    coincide). This is the TPU train configuration (the un-rematted
    batch-3 backward wants 129.7 GB vs 15.75 GB HBM, RESULTS_r5.md)."""
    import jax.tree_util as jtu

    from canonicalvoting_tpu.data.collate import collate_joint_dense
    from canonicalvoting_tpu.models.dense_unet import DenseMinkUNet
    from canonicalvoting_tpu.train.steps import create_train_state_dense

    cfg = Config()
    items = _tiny_joint_items(rng, n_scenes=1)
    batch_w = collate_joint_dense(items, cap_multiple=512)
    batch_a = collate_joint_dense(items, cap_multiple=512, microbatch=1)
    assert "microbatches" in batch_a and len(batch_a["microbatches"]) == 1
    out_ch = 6 * NCLASSES + NCLASSES + 1
    kw = dict(in_channels=3, out_channels=out_ch, block="basic",
              layers=(1,) * 8, planes=(8, 16, 32, 32, 32, 32, 16, 16),
              init_dim=8, compute_dtype="float32")
    model_w = DenseMinkUNet(**kw)
    model_a = DenseMinkUNet(**kw, remat=True)
    optimizer = make_optimizer(0.0)
    state = create_train_state_dense(model_w, optimizer, batch_w)

    step_w = make_joint_train_step(model_w, optimizer, cfg, backbone="dense")
    step_a = make_joint_train_step(model_a, optimizer, cfg, backbone="dense")
    lr, mom = jnp.float32(1e-3), jnp.float32(0.5)
    sw, lw = step_w(state, batch_w, lr, mom)
    sa, la = step_a(state, batch_a, lr, mom)
    np.testing.assert_allclose(float(lw["loss"]), float(la["loss"]),
                               rtol=1e-5)
    fw = jtu.tree_flatten_with_path(sw.params)[0]
    fa = dict(jtu.tree_flatten_with_path(sa.params)[0])
    for k, vw in fw:
        np.testing.assert_allclose(
            np.asarray(vw), np.asarray(fa[k]), atol=1e-5, rtol=1e-4,
            err_msg=jtu.keystr(k))


def test_dense_accum_two_scenes_runs(rng):
    """2-scene batch, microbatch=1: two grad passes, one optimizer update,
    finite decreasing loss."""
    from canonicalvoting_tpu.data.collate import collate_joint_dense
    from canonicalvoting_tpu.models.dense_unet import DenseMinkUNet
    from canonicalvoting_tpu.train.steps import create_train_state_dense

    cfg = Config()
    items = _tiny_joint_items(rng, n_scenes=2)
    batch = collate_joint_dense(items, cap_multiple=512, microbatch=1)
    assert len(batch["microbatches"]) == 2
    mb_shapes = {tuple(mb["feats"].shape) for mb in batch["microbatches"]}
    assert len(mb_shapes) == 1  # pinned caps: one compile serves both
    out_ch = 6 * NCLASSES + NCLASSES + 1
    model = DenseMinkUNet(
        in_channels=3, out_channels=out_ch, block="basic", layers=(1,) * 8,
        planes=(8, 16, 32, 32, 32, 32, 16, 16), init_dim=8,
        compute_dtype="float32", remat=True)
    optimizer = make_optimizer(0.0)
    state = create_train_state_dense(model, optimizer, batch)
    step = make_joint_train_step(model, optimizer, cfg, backbone="dense")
    state, l0 = step(state, batch, jnp.float32(1e-3), jnp.float32(0.5))
    state, l1 = step(state, batch, jnp.float32(1e-3), jnp.float32(0.5))
    assert int(state.step) == 2
    assert np.isfinite(float(l0["loss"]))
    assert float(l1["loss"]) < float(l0["loss"])


def test_separate_dense_accum_runs(rng):
    """Separate trainer's gradient-accumulation path (dense backbone,
    microbatch=1, remat): two grad passes, one optimizer update, finite
    loss — the TPU memory configuration (RESULTS_r5.md)."""
    from canonicalvoting_tpu.models.dense_unet import DenseMinkUNet
    from canonicalvoting_tpu.train.steps import create_train_state_dense

    cfg = Config()
    items = _sep_items(rng, n_scenes=2)
    batch = collate_separate(items, cap_multiple=512, max_objects=16,
                             dense=True, microbatch=1)
    assert len(batch["microbatches"]) == 2
    assert len({tuple(mb["feats"].shape)
                for mb in batch["microbatches"]}) == 1
    model = DenseMinkUNet(
        in_channels=3, out_channels=8, block="basic", layers=(1,) * 8,
        planes=(8, 16, 16, 16, 16, 16, 8, 8), init_dim=8,
        compute_dtype="float32", remat=True)
    optimizer = make_optimizer(0.0)
    state = create_train_state_dense(model, optimizer, batch)
    step = make_separate_train_step(model, optimizer, cfg, max_objects=16,
                                    backbone="dense")
    state, losses = step(state, batch, jnp.float32(1e-3), jnp.float32(0.5))
    assert int(state.step) == 1
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
