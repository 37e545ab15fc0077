"""Sharded training: scene-level data parallelism + tensor parallelism.

Design (see SURVEY section 2 "Parallelism — explicit absence": all of this is
new capability, not ported):

  * scenes are collated PER SHARD into identical static shapes and stacked on
    a leading axis sharded over mesh axis 'data';
  * the loss is vmapped over that axis with axis_name "batch", so
    MaskedBatchNorm's psum gives SYNC-BN — statistics identical to the
    reference's whole-batch BN even though the batch lives on many chips;
  * conv kernels are sharded over mesh axis 'model' on their output-channel
    dim (Megatron-style column parallelism). XLA/GSPMD propagates the
    sharding through the gather -> GEMM -> BN -> ReLU chain and inserts the
    all-gathers/reduces over ICI — no hand-written collectives;
  * gradient averaging over 'data' falls out of the mean-over-scenes loss
    under GSPMD.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from canonicalvoting_tpu.train.losses import joint_losses
from canonicalvoting_tpu.train.steps import TrainState


def stack_scene_batches(shard_batches) -> Dict:
    """Stack per-shard collated batches (identical shapes) on a new leading
    device axis. Host metadata is dropped."""
    device_keys = [k for k in shard_batches[0] if k != "meta"]
    return {
        k: jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, axis=0), *[b[k] for b in shard_batches]
        )
        for k in device_keys
    }


def param_shardings(params, mesh: Mesh):
    """NamedShardings: conv kernels column-parallel over 'model' when the
    output-channel dim divides; everything else replicated."""
    tp = mesh.shape["model"]

    def spec_for(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel" and leaf.ndim == 3 and leaf.shape[2] % tp == 0 and tp > 1:
            return NamedSharding(mesh, P(None, None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def make_dp_train_step(model, optimizer, cfg, mesh: Mesh) -> Callable:
    """Build the sharded train step. Batches come from
    ``stack_scene_batches`` with leading dim == mesh.shape['data']."""
    xyz_weights = tuple(cfg.xyz_weights)

    def per_scene(params, batch_stats, shard, bn_momentum):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            shard["feats"], shard["pyramid"], True, bn_momentum,
            mutable=["batch_stats"],
        )
        losses = joint_losses(
            out, shard["xyz_labels"], shard["scale_labels"],
            shard["class_labels"], shard["pyramid"]["nvalid"][0],
            xyz_weights, cfg.log_scale, cfg.xyz_factor, cfg.scale_factor,
        )
        return losses, updates["batch_stats"]

    def step_fn(state: TrainState, batch: Dict, lr, bn_momentum):
        def loss_fn(params):
            losses, new_stats = jax.vmap(
                per_scene, in_axes=(None, None, 0, None), axis_name="batch",
            )(params, state.batch_stats, batch, bn_momentum)
            # sync-BN makes stats identical across the axis; take shard 0
            stats0 = jax.tree_util.tree_map(lambda x: x[0], new_stats)
            mean_losses = jax.tree_util.tree_map(jnp.mean, losses)
            return mean_losses["loss"], (mean_losses, stats0)

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        upd, new_opt = optimizer.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, upd)
        return TrainState(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.step + 1,
        ), losses

    data_sharding = NamedSharding(mesh, P("data"))

    def place(batch):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data_sharding),
            {k: v for k, v in batch.items() if k != "meta"},
        )

    jitted = jax.jit(step_fn)

    def step(state, batch, lr, bn_momentum):
        return jitted(state, place(batch), lr, bn_momentum)

    step.place_batch = place
    return step


def make_dp_train_step_separate(model, optimizer, cfg, mesh: Mesh,
                                max_objects: int) -> Callable:
    """Sharded SEPARATE-trainer step: per-shard separate_losses (binary
    objectness + scale MSE + min-over-symmetry-hypotheses xyz) vmapped over
    'data' with sync-BN, exactly as make_dp_train_step does for the joint
    loss. Batches come from collate_separate_sharded. New capability over
    the single-GPU reference trainer (train_separate.py:184-298)."""
    from canonicalvoting_tpu.train.losses import separate_losses

    xyz_weights = tuple(cfg.xyz_weights)

    def per_scene(params, batch_stats, shard, bn_momentum):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            shard["feats"], shard["pyramid"], True, bn_momentum,
            mutable=["batch_stats"],
        )
        losses = separate_losses(
            out, shard["base_xyz"], shard["scale_labels"],
            shard["obj_labels"], shard["obj_id"], shard["sym_code"],
            shard["num_objects"], shard["pyramid"]["nvalid"][0],
            xyz_weights, max_objects, cfg.log_scale,
            cfg.xyz_factor, cfg.scale_factor,
        )
        return losses, updates["batch_stats"]

    def step_fn(state: TrainState, batch: Dict, lr, bn_momentum):
        def loss_fn(params):
            losses, new_stats = jax.vmap(
                per_scene, in_axes=(None, None, 0, None), axis_name="batch",
            )(params, state.batch_stats, batch, bn_momentum)
            stats0 = jax.tree_util.tree_map(lambda x: x[0], new_stats)
            mean_losses = jax.tree_util.tree_map(jnp.mean, losses)
            return mean_losses["loss"], (mean_losses, stats0)

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        upd, new_opt = optimizer.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, upd)
        return TrainState(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.step + 1,
        ), losses

    data_sharding = NamedSharding(mesh, P("data"))

    def place(batch):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data_sharding),
            {k: v for k, v in batch.items() if k != "meta"},
        )

    jitted = jax.jit(step_fn)

    def step(state, batch, lr, bn_momentum):
        return jitted(state, place(batch), lr, bn_momentum)

    step.place_batch = place
    return step


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place params (TP-sharded) + replicated everything-else on the mesh."""
    pshard = param_shardings(state.params, mesh)
    params = jax.tree_util.tree_map(jax.device_put, state.params, pshard)
    repl = NamedSharding(mesh, P())
    others = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl),
        (state.batch_stats, state.opt_state, state.step),
    )
    return TrainState(params=params, batch_stats=others[0],
                      opt_state=others[1], step=others[2])
