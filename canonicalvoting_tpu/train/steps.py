"""Jitted train / eval steps.

The optimizer is Adam with an injected learning rate so the reference's
step-decay schedule (train_joint.py:128-138) can be driven from the host
without recompiling; the BN momentum schedule rides along as a step input
(train_joint.py:224-225).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict

import flax
import jax
import jax.numpy as jnp
import optax

from canonicalvoting_tpu.train.losses import joint_losses, separate_losses


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(weight_decay: float = 0.0):
    """Adam (+ optional decoupled weight decay) with injectable lr
    (reference train_joint.py:219-223)."""
    if weight_decay:
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=1e-3, weight_decay=weight_decay
        )
    return optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)


def init_variables(model, feats, pyramid, train: bool = True, seed: int = 0):
    """Initialize model variables UNDER JIT.

    Eager init dispatches hundreds of single ops; on remote-compile backends
    each op pays a full round trip (observed: 25+ min for MinkUNet34C).
    One jitted trace compiles once.
    """
    init_fn = jax.jit(
        lambda rng, f, p: model.init(rng, f, p, train),
    )
    return init_fn(jax.random.PRNGKey(seed), feats, pyramid)


def create_train_state(model, optimizer, feats, pyramid) -> TrainState:
    variables = init_variables(model, feats, pyramid, train=True)
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def create_train_state_dense(model, optimizer, batch) -> TrainState:
    """Init from a collate_joint_dense batch (DenseMinkUNet backbone);
    accepts a gradient-accumulation batch (uses its first microbatch)."""
    if "microbatches" in batch:
        meta = batch["meta"]
        batch = dict(batch["microbatches"][0])
        batch["meta"] = {"grid_dims": meta["grid_dims"],
                         "n_scenes": meta["n_scenes"]}
    meta = batch["meta"]
    init_fn = jax.jit(
        lambda rng, f, i, v: model.init(
            rng, f, i, v, tuple(meta["grid_dims"]), True,
            n_scenes=meta["n_scenes"],
        ),
    )
    variables = init_fn(jax.random.PRNGKey(0), batch["feats"],
                        batch["flat_idx"], batch["valid"])
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def set_lr(opt_state, lr):
    """Update the injected learning rate in-place on the host."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def _strip_meta(batch: Dict) -> Dict:
    return {k: v for k, v in batch.items() if k != "meta"}


def parse_dense_sites(spec: str, n_levels: int = 5) -> frozenset:
    """tpu.train_dense_levels -> the conv sites routed through the
    scatter-dense engine (ops/scatter_conv.py). "" = none; "all"; or a
    comma list of "stem", level ints (block convs) and "downI"/"upI"."""
    if not spec:
        return frozenset()
    if spec == "all":
        return frozenset(
            {"stem"}
            | {("conv", lv) for lv in range(n_levels)}
            | {("down", i) for i in range(n_levels - 1)}
            | {("up", i) for i in range(n_levels - 1)}
        )
    out = set()
    for tok in spec.split(","):
        tok = tok.strip()
        if not tok:
            continue
        if tok == "stem":
            out.add("stem")
        elif tok.startswith("down"):
            out.add(("down", int(tok[4:])))
        elif tok.startswith("up"):
            out.add(("up", int(tok[2:])))
        else:
            out.add(("conv", int(tok)))
    return frozenset(out)


def build_dense_plans(flat_levels, grid_dims, n_scenes: int, sites,
                      stem_kernel: int = 5) -> Dict:
    """DensePlans for the requested sites from the batch's per-level flat
    ids (collate with_flat_levels=True) + static L0 dims."""
    from canonicalvoting_tpu.ops.scatter_conv import DensePlan

    B = n_scenes
    nlev = len(flat_levels)
    gs = [
        (B,) + tuple(int(d) >> lv for d in grid_dims) for lv in range(nlev)
    ]
    plans = {}
    if "stem" in sites:
        # stem_fold, not "sub": a channels-last cin=3 grid physically
        # lane-pads 3 -> 128 and measured SLOWER than the row gathers
        # (0.268 vs 0.416 steps/s); the scalar-grid fold forms the 25
        # (dy, dz) taps in lanes instead (RESULTS_r5.md)
        plans["stem"] = DensePlan(flat_levels[0], flat_levels[0],
                                  kind="stem_fold", k=stem_kernel,
                                  grid_shape=gs[0])
    for lv in range(nlev):
        if ("conv", lv) in sites:
            plans[("conv", lv)] = DensePlan(
                flat_levels[lv], flat_levels[lv], kind="sub", k=3,
                grid_shape=gs[lv])
    for i in range(nlev - 1):
        if ("down", i) in sites:
            plans[("down", i)] = DensePlan(
                flat_levels[i], flat_levels[i + 1], kind="down", k=2,
                grid_shape=gs[i])
        if ("up", i) in sites:
            plans[("up", i)] = DensePlan(
                flat_levels[i + 1], flat_levels[i], kind="up", k=2,
                grid_shape=gs[i + 1])
    return plans


def make_joint_train_step(model, optimizer, cfg,
                          backbone: str = "gather") -> Callable:
    """backbone="gather": ``model`` is a MinkUNetBase fed the coordinate
    pyramid (collate_joint batches). backbone="dense": ``model`` is a
    DenseMinkUNet fed flat cell ids (collate_joint_dense batches) — the
    masked-dense path trains on the MXU with the identical parameter tree,
    so checkpoints interchange between the two.

    On the gather backbone, batches carrying per-level flat ids
    (collate_joint with_flat_levels=True) route the tpu.train_dense_levels
    conv sites through the scatter-dense MXU engine (ops/scatter_conv.py)
    — identical outputs, ~none of the K-tap row-gather cost."""
    xyz_weights = tuple(cfg.xyz_weights)
    dense_sites = parse_dense_sites(
        getattr(cfg.tpu, "train_dense_levels", ""))

    def _apply_and_losses(params, batch_stats, batch, bn_momentum,
                          grid_dims=None, n_scenes=1):
        variables = {"params": params, "batch_stats": batch_stats}
        if backbone == "dense":
            out, updates = model.apply(
                variables, batch["feats"], batch["flat_idx"], batch["valid"],
                grid_dims, True, bn_momentum, n_scenes=n_scenes,
                mutable=["batch_stats"],
            )
            nvalid = batch["nvalid"]
        else:
            plans = None
            if (dense_sites and grid_dims is not None
                    and "flat_levels" in batch):
                plans = build_dense_plans(
                    batch["flat_levels"], grid_dims, n_scenes, dense_sites,
                    stem_kernel=model.stem_kernel)
            out, updates = model.apply(
                variables, batch["feats"], batch["pyramid"], True,
                bn_momentum, dense_plans=plans, mutable=["batch_stats"],
            )
            nvalid = batch["pyramid"]["nvalid"][0]
        losses = joint_losses(
            out, batch["xyz_labels"], batch["scale_labels"],
            batch["class_labels"], nvalid,
            xyz_weights, cfg.log_scale, cfg.xyz_factor, cfg.scale_factor,
        )
        return losses, updates["batch_stats"]

    def _update(state, losses, new_stats, grads, lr):
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        upd, new_opt = optimizer.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, upd)
        return TrainState(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.step + 1,
        ), losses

    @functools.partial(jax.jit, static_argnames=("grid_dims", "n_scenes"))
    def _step(state: TrainState, batch: Dict, lr, bn_momentum,
              grid_dims=None, n_scenes=1):
        def loss_fn(params):
            losses, new_stats = _apply_and_losses(
                params, state.batch_stats, batch, bn_momentum,
                grid_dims, n_scenes)
            return losses["loss"], (losses, new_stats)

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return _update(state, losses, new_stats, grads, lr)

    @functools.partial(jax.jit, static_argnames=("grid_dims", "n_scenes"))
    def _step_dense(state: TrainState, batch: Dict, lr, bn_momentum,
                    grid_dims, n_scenes):
        def loss_fn(params):
            losses, new_stats = _apply_and_losses(
                params, state.batch_stats, batch, bn_momentum,
                grid_dims, n_scenes)
            return losses["loss"], (losses, new_stats)

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return _update(state, losses, new_stats, grads, lr)

    @functools.partial(jax.jit, static_argnames=("grid_dims", "n_scenes"))
    def _grads(params, batch_stats, batch, bn_momentum, grid_dims=None,
               n_scenes=1):
        def loss_fn(params):
            losses, new_stats = _apply_and_losses(
                params, batch_stats, batch, bn_momentum,
                grid_dims, n_scenes)
            return losses["loss"], (losses, new_stats)

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return losses, new_stats, grads

    @jax.jit
    def _accum_apply(state: TrainState, grads_list, losses_list, new_stats,
                     lr):
        k = float(len(grads_list))
        grads = jax.tree_util.tree_map(
            lambda *gs: sum(gs) / k, *grads_list)
        losses = jax.tree_util.tree_map(
            lambda *ls: sum(ls) / k, *losses_list)
        return _update(state, losses, new_stats, grads, lr)

    def step(state, batch, lr, bn_momentum):
        meta = batch.get("meta", {})
        static = {}
        if backbone == "dense" or (dense_sites and "grid_dims" in meta):
            static = dict(grid_dims=tuple(meta["grid_dims"]),
                          n_scenes=meta["n_scenes"])
        if "microbatches" in batch:
            # gradient accumulation (dense OR gather backbone): one grad
            # pass per microbatch (BN stats thread sequentially —
            # per-microbatch statistics, a documented deviation from
            # whole-batch BN), grads averaged, ONE optimizer update per
            # global batch
            stats = state.batch_stats
            grads_list, losses_list = [], []
            for mb in batch["microbatches"]:
                losses, stats, grads = _grads(
                    state.params, stats, _strip_meta(mb), bn_momentum,
                    **static)
                grads_list.append(grads)
                losses_list.append(losses)
            return _accum_apply(state, grads_list, losses_list, stats, lr)
        if backbone == "dense":
            return _step_dense(state, _strip_meta(batch), lr, bn_momentum,
                               static["grid_dims"], static["n_scenes"])
        return _step(state, _strip_meta(batch), lr, bn_momentum, **static)

    return step


def make_separate_train_step(model, optimizer, cfg, max_objects: int,
                             backbone: str = "gather") -> Callable:
    """backbone="gather": ``model`` is a MinkUNetBase fed the coordinate
    pyramid. backbone="dense": ``model`` is a DenseMinkUNet fed flat cell
    ids (collate_separate(dense=True) batches) — as with the joint step,
    the dense twin trains on the MXU with the identical parameter tree
    (reference trainer: /root/reference/train_separate.py:184-298).
    Gather batches with flat_levels route tpu.train_dense_levels sites
    through the scatter-dense engine, as the joint step does."""
    xyz_weights = tuple(cfg.xyz_weights)
    dense_sites = parse_dense_sites(
        getattr(cfg.tpu, "train_dense_levels", ""))

    def _losses(batch, out, nvalid):
        return separate_losses(
            out, batch["base_xyz"], batch["scale_labels"],
            batch["obj_labels"], batch["obj_id"], batch["sym_code"],
            batch["num_objects"], nvalid,
            xyz_weights, max_objects, cfg.log_scale,
            cfg.xyz_factor, cfg.scale_factor,
        )

    def _update(state, losses, new_stats, grads, lr):
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        upd, new_opt = optimizer.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, upd)
        return TrainState(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.step + 1,
        ), losses

    def _apply_gather(params, batch_stats, batch, bn_momentum,
                      grid_dims=None, n_scenes=1):
        plans = None
        if dense_sites and grid_dims is not None \
                and "flat_levels" in batch:
            plans = build_dense_plans(
                batch["flat_levels"], grid_dims, n_scenes, dense_sites,
                stem_kernel=model.stem_kernel)
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["feats"], batch["pyramid"], True, bn_momentum,
            dense_plans=plans, mutable=["batch_stats"],
        )

    @functools.partial(jax.jit, static_argnames=("grid_dims", "n_scenes"))
    def _step(state: TrainState, batch: Dict, lr, bn_momentum,
              grid_dims=None, n_scenes=1):
        def loss_fn(params):
            out, updates = _apply_gather(params, state.batch_stats, batch,
                                         bn_momentum, grid_dims, n_scenes)
            losses = _losses(batch, out, batch["pyramid"]["nvalid"][0])
            return losses["loss"], (losses, updates["batch_stats"])

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return _update(state, losses, new_stats, grads, lr)

    @functools.partial(jax.jit, static_argnames=("grid_dims", "n_scenes"))
    def _grads_gather(params, batch_stats, batch, bn_momentum,
                      grid_dims=None, n_scenes=1):
        def loss_fn(params):
            out, updates = _apply_gather(params, batch_stats, batch,
                                         bn_momentum, grid_dims, n_scenes)
            losses = _losses(batch, out, batch["pyramid"]["nvalid"][0])
            return losses["loss"], (losses, updates["batch_stats"])

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return losses, new_stats, grads

    @functools.partial(jax.jit, static_argnames=("grid_dims", "n_scenes"))
    def _step_dense(state: TrainState, batch: Dict, lr, bn_momentum,
                    grid_dims, n_scenes):
        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["feats"], batch["flat_idx"], batch["valid"],
                grid_dims, True, bn_momentum, n_scenes=n_scenes,
                mutable=["batch_stats"],
            )
            losses = _losses(batch, out, batch["nvalid"])
            return losses["loss"], (losses, updates["batch_stats"])

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return _update(state, losses, new_stats, grads, lr)

    @functools.partial(jax.jit, static_argnames=("grid_dims", "n_scenes"))
    def _grads_dense(params, batch_stats, batch, bn_momentum, grid_dims,
                     n_scenes):
        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["feats"], batch["flat_idx"], batch["valid"],
                grid_dims, True, bn_momentum, n_scenes=n_scenes,
                mutable=["batch_stats"],
            )
            losses = _losses(batch, out, batch["nvalid"])
            return losses["loss"], (losses, updates["batch_stats"])

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return losses, new_stats, grads

    @jax.jit
    def _accum_apply(state: TrainState, grads_list, losses_list, new_stats,
                     lr):
        k = float(len(grads_list))
        grads = jax.tree_util.tree_map(
            lambda *gs: sum(gs) / k, *grads_list)
        losses = jax.tree_util.tree_map(
            lambda *ls: sum(ls) / k, *losses_list)
        return _update(state, losses, new_stats, grads, lr)

    def step(state, batch, lr, bn_momentum):
        meta = batch.get("meta", {})
        static = {}
        if backbone == "dense" or (dense_sites and "grid_dims" in meta):
            static = dict(grid_dims=tuple(meta["grid_dims"]),
                          n_scenes=meta["n_scenes"])
        if "microbatches" in batch:
            # gradient accumulation, as in the joint step
            grads_fn = _grads_dense if backbone == "dense" else _grads_gather
            stats = state.batch_stats
            grads_list, losses_list = [], []
            for mb in batch["microbatches"]:
                losses, stats, grads = grads_fn(
                    state.params, stats, _strip_meta(mb), bn_momentum,
                    **static)
                grads_list.append(grads)
                losses_list.append(losses)
            return _accum_apply(state, grads_list, losses_list, stats, lr)
        if backbone == "dense":
            return _step_dense(state, _strip_meta(batch), lr, bn_momentum,
                               static["grid_dims"], static["n_scenes"])
        return _step(state, _strip_meta(batch), lr, bn_momentum, **static)

    return step
