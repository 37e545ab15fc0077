"""Per-category (separate) model evaluation.

The reference runs 9 independent U-Net forwards + 9 Hough-voting passes per
scene sequentially (reference eval_separate.py:165-186). Here the 9 models'
parameters are STACKED and the whole backbone + vote + peel chain runs as
ONE device program per scene:

  * backbone="dense" (default on TPU): scene prep (dense grid + occupied
    tiles) is shared across the 9 categories, and a ``lax.scan`` over the
    stacked parameters drives the Pallas occupied-tile backbone + obj-only
    vote splat + lazy rot/scale decode once per category — the fast path
    the joint pipeline uses, amortized 9 ways.
  * backbone="sparse": the gather-form path, vmapped over categories.
"""

from __future__ import annotations

import dataclasses
import functools
import warnings
from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.decode.peeling import PeelConfig, peel_boxes
from canonicalvoting_tpu.eval.pipeline import (
    assemble_runs,
    prepare_scene_args,
    slice_separate_heads,
)
from canonicalvoting_tpu.metrics.ap import nms as nms_host
from canonicalvoting_tpu.ops.hough_voting import (
    compute_corners,
    grid_dims_from_corners,
    hough_voting,
    hough_voting_obj,
    vote_stats_at_cell,
)
from canonicalvoting_tpu.ops.sparse_conv import valid_row_mask

#: category order used by the separate evaluator
#: (reference eval_separate.py:92 all_categories)
ALL_CATEGORIES = [
    "others", "display", "table", "bathtub", "trashbin", "sofa", "chair",
    "cabinet", "bookshelf",
]


@dataclass
class SeparateDetectionPipeline:
    model: object                     # flax MinkUNetBase (out_channels=8)
    stacked_variables: Dict           # leaves stacked on axis 0 (9, ...)
    categories: List[str] = None
    # lane-pack ``group_size`` categories per backbone pass (eval/grouped
    # .py): the dense path then scans ceil(9/N) block-diagonal grouped nets
    # instead of 9 single nets. Measured on TPU v5e (RESULTS_r4.md):
    # N=2 is a net LOSS e2e (0.99 vs 1.31 scenes/s) — the <=64-channel
    # levels pack for free (lane padding absorbs them), but the 96/256-
    # channel levels that dominate the profile pay ~2x bytes + 4x
    # block-diagonal FLOPs per call. Kept as an opt-in for narrow-plane
    # model families where every level packs free; "auto" = 1.
    # Requires variables via set_variables_list().
    group_size: object = "auto"
    res: float = 0.03
    num_rots: int = 120
    log_scale: bool = True
    peel: PeelConfig = None
    nms_iou: float = 0.3
    hv_method: str = "auto"
    # same bucketing as DetectionPipeline (eval/pipeline.py): Gx must be a
    # multiple of 64 so the splat matmul width is a multiple of 128 —
    # x=32 bucketing made the plane splat ~10% SLOWER (42.7 vs 38.4 ms,
    # bench_vote2: fractional 128-lane x blocks cost more than the extra
    # tent width saves), and this pipeline runs that kernel 9x per scene
    grid_multiple: tuple = (64, 32, 128)
    cap_multiple: int = 4096
    # backbone/conv_impl/lazy_rot_scale mirror DetectionPipeline: "auto" =
    # dense + tiled + lazy on TPU, sparse elsewhere
    backbone: str = "auto"
    conv_impl: str = "auto"
    # stem differs from the joint pipeline: "prefold" folds the k=5 stem's
    # 25 (dy, dz) taps ONCE per scene (shared_scene_grids hoists the
    # weight-independent fold out of the category scan) and each
    # category's stem runs pointwise — measured 1.41 vs 1.33 scenes/s
    # against the in-kernel "tiled" fold repeated 9x (RESULTS_r5.md)
    stem_impl: str = "prefold"
    lazy_rot_scale: object = "auto"
    # budget-exit retry, as in DetectionPipeline: re-run with 4x max_iters
    # when any category's peel reports a budget (not threshold) exit
    retry_on_truncation: bool = True
    max_retries: int = 2

    def __post_init__(self):
        if self.categories is None:
            self.categories = list(ALL_CATEGORIES)
        if self.peel is None:
            # eval_separate.py:209 uses the exclusive elimination slice
            self.peel = PeelConfig(res=self.res, elimination_inclusive=False)
        on_tpu = jax.default_backend() == "tpu"
        if self.backbone == "auto":
            self.backbone = "dense" if on_tpu else "sparse"
        if self.conv_impl == "auto":
            self.conv_impl = "tiled" if on_tpu else "xla"
        if self.lazy_rot_scale == "auto":
            self.lazy_rot_scale = True
        if self.group_size == "auto":
            self.group_size = 1
        if self.backbone != "dense":
            # lane packing is a dense-path optimization; the sparse vmap
            # path keeps per-category variables
            self.group_size = 1

    # ------------------------------------------------------------------
    @functools.cached_property
    def _dense_model(self):
        from canonicalvoting_tpu.models.dense_unet import DenseMinkUNet

        m = self.model
        return DenseMinkUNet(
            in_channels=m.in_channels, out_channels=m.out_channels,
            block=m.block, layers=m.layers, planes=m.planes,
            init_dim=m.init_dim, stem_kernel=m.stem_kernel,
            compute_dtype=m.compute_dtype, bn_axis=m.bn_axis,
            conv_impl=self.conv_impl, stem_impl=self.stem_impl,
        )

    @functools.cached_property
    def _grouped_dense_model(self):
        from canonicalvoting_tpu.eval.grouped import grouped_model_config
        from canonicalvoting_tpu.models.dense_unet import DenseMinkUNet

        return DenseMinkUNet(
            conv_impl=self.conv_impl, stem_impl=self.stem_impl,
            **grouped_model_config(self.model, self.group_size))

    def set_variables_list(self, variables_list: List[Dict]):
        """Install per-category variables (list of ``len(categories)``
        pytrees).  With ``group_size`` N > 1, categories are packed into
        ceil(C/N) block-diagonal grouped nets (eval/grouped.py), padding
        the tail group by repeating the last category (its outputs are
        dropped in postprocess)."""
        from canonicalvoting_tpu.eval.grouped import build_grouped_variables

        n = self.group_size
        C = len(self.categories)
        assert len(variables_list) == C
        if n == 1:
            self.stacked_variables = stack_variables(variables_list)
            return
        pad = (-C) % n
        vs = list(variables_list) + [variables_list[-1]] * pad
        groups = [
            build_grouped_variables(vs[i:i + n], self.model)
            for i in range(0, len(vs), n)
        ]
        self.stacked_variables = stack_variables(groups)

    def _vote_and_peel(self, xyz, scale, prob, coords_w, valid, grid_shape,
                       peel: PeelConfig = None):
        peel = peel if peel is not None else self.peel
        corners = compute_corners(coords_w, valid)
        corner = corners[0]
        if self.lazy_rot_scale:
            go = hough_voting_obj(
                coords_w, xyz, scale, prob, res=self.res,
                num_rots=self.num_rots, grid_shape=grid_shape,
                corners=corners, valid=valid, method=self.hv_method,
            )
            dims = jnp.minimum(
                grid_dims_from_corners(corners, self.res),
                jnp.asarray(grid_shape, jnp.int32),
            )

            def rot_scale_fn(cand):
                return vote_stats_at_cell(
                    coords_w, xyz, scale, prob, corner, dims, self.res,
                    self.num_rots, cand, valid=valid,
                )

            return peel_boxes(
                go, None, None, coords_w, xyz, prob, None, corner,
                peel, valid=valid, rot_scale_fn=rot_scale_fn,
            )
        go, gr, gs = hough_voting(
            coords_w, xyz, scale, prob, res=self.res, num_rots=self.num_rots,
            grid_shape=grid_shape, corners=corners, valid=valid,
            method=self.hv_method,
        )
        return peel_boxes(
            go, gr, gs, coords_w, xyz, prob, None, corner, peel,
            valid=valid,
        )

    @functools.cached_property
    def _scene_fn_cache(self):
        return {}

    @property
    def _scene_fn_sparse(self):
        return self._scene_fn_sparse_for(self.peel)

    def _scene_fn_sparse_for(self, peel: PeelConfig):
        if ("sparse", peel) in self._scene_fn_cache:
            return self._scene_fn_cache[("sparse", peel)]
        model = self.model
        log_scale = self.log_scale

        @functools.partial(jax.jit, static_argnames=("grid_shape",))
        def scene_fn(stacked_vars, feats, pyramid, coords_w, grid_shape):
            valid = valid_row_mask(feats.shape[0], pyramid["nvalid"][0])[:, 0]

            def per_category(variables):
                out = model.apply(variables, feats, pyramid, False)
                xyz, scale, prob = slice_separate_heads(out)
                if log_scale:
                    scale = jnp.exp(scale)
                return self._vote_and_peel(xyz, scale, prob, coords_w,
                                           valid, grid_shape, peel=peel)

            return jax.vmap(per_category)(stacked_vars)

        self._scene_fn_cache[("sparse", peel)] = scene_fn
        return scene_fn

    @property
    def _scene_fn_dense(self):
        return self._scene_fn_dense_for(self.peel)

    def _scene_fn_dense_for(self, peel: PeelConfig):
        if ("dense", peel) in self._scene_fn_cache:
            return self._scene_fn_cache[("dense", peel)]
        n = self.group_size
        dense_model = self._dense_model if n == 1 \
            else self._grouped_dense_model
        out_ch = self.model.out_channels
        log_scale = self.log_scale
        # n == 1 + lazy: peel moved OUT of the category scan and vmapped —
        # the peel/refit iterations are small-op latency-bound, so the 9
        # sequential while_loops (sum of iteration counts) become ONE
        # batched loop (max of iteration counts) over the stacked obj
        # grids (9 x ~33 MB, cheap); results are bit-identical (same ops).
        vmap_peel = (n == 1 and bool(self.lazy_rot_scale))

        @functools.partial(jax.jit,
                           static_argnames=("dense_dims", "grid_shape",
                                            "run_spec"))
        def scene_fn(stacked_vars, feats, flat, valid, coords_w, dense_dims,
                     grid_shape, tiles, run_spec=(), run_tiles=None,
                     occ_packs=None, planted=None):
            from canonicalvoting_tpu.models.dense_unet import (
                fresh_l0_donors, shared_scene_grids)

            # scene-shared device prep, ONCE for all 9 categories: input
            # scatter grid + occupancy pyramid (weight-independent), plus
            # two zeroed L0 scratch grids threaded through the scan carry
            # so each category's stem/up-into-L0 writes into the previous
            # category's dead grids instead of freshly zero-filled ones
            # (the reference re-enters the full per-model pipeline 9x,
            # eval_separate.py:165-186)
            m = dense_model
            use_fast = bool(tiles) and m.conv_impl != "xla" \
                and m.stem_impl in ("tiled", "prefold")
            shared = donors = None
            if use_fast:
                shared = shared_scene_grids(
                    feats, flat, valid, dense_dims,
                    in_channels=m.in_channels, stem_kernel=m.stem_kernel,
                    compute_dtype=m.compute_dtype, stem_impl=m.stem_impl)
                donors = fresh_l0_donors(dense_dims, m.compute_dtype)

            def backbone_heads(carry, variables):
                out = dense_model.apply(
                    variables, feats, flat, valid, dense_dims, False,
                    tiles=tiles,
                    tile_runs=assemble_runs(run_spec, run_tiles),
                    occ_packs=occ_packs, shared=shared, donors=carry,
                )
                if carry is not None:
                    out, new_carry = out
                else:
                    new_carry = carry
                return out, new_carry

            if vmap_peel:
                corners = compute_corners(coords_w, valid)
                corner = corners[0]
                dims = jnp.minimum(
                    grid_dims_from_corners(corners, self.res),
                    jnp.asarray(grid_shape, jnp.int32),
                )

                def per_cat(carry, xs):
                    # planted (C, cap, 8) rows: the backbone still runs
                    # (same program) but the tail decodes the planted
                    # detection-bearing heads — the honest-bench hook
                    # (bench.py --separate), mirroring the joint bench
                    variables = xs[0] if planted is not None else xs
                    out, new_carry = backbone_heads(carry, variables)
                    if planted is not None:
                        # runtime-opaque select: a constant-False predicate
                        # would let XLA dead-code-eliminate the entire
                        # backbone out of the program (measured: 5.2 vs
                        # 1.4 scenes/s — a fake number); jnp.where keeps
                        # both operands live and does not propagate NaNs
                        # from the unselected branch
                        never = jnp.sum(valid) < -1.0
                        out = jnp.where(never, out[:, :8], xs[1])
                    xyz, scale, prob = slice_separate_heads(out)
                    if log_scale:
                        scale = jnp.exp(scale)
                    go = hough_voting_obj(
                        coords_w, xyz, scale, prob, res=self.res,
                        num_rots=self.num_rots, grid_shape=grid_shape,
                        corners=corners, valid=valid, method=self.hv_method,
                    )
                    return new_carry, (go, xyz, scale, prob)

                xs = stacked_vars if planted is None \
                    else (stacked_vars, planted)
                _, (gos, xyzs, scales, probs) = jax.lax.scan(
                    per_cat, donors, xs)

                def peel_one(go, xyz, scale, prob):
                    def rot_scale_fn(cand):
                        return vote_stats_at_cell(
                            coords_w, xyz, scale, prob, corner, dims,
                            self.res, self.num_rots, cand, valid=valid,
                        )

                    return peel_boxes(
                        go, None, None, coords_w, xyz, prob, None, corner,
                        peel, valid=valid, rot_scale_fn=rot_scale_fn,
                    )

                return jax.vmap(peel_one)(gos, xyzs, scales, probs)

            def per_group(carry, variables):
                out, new_carry = backbone_heads(carry, variables)
                # lane-packed group (eval/grouped.py): the head rows carry
                # n categories' 8-channel heads category-major; vote + peel
                # run per category on its slice
                results = []
                for c in range(n):
                    xyz, scale, prob = slice_separate_heads(
                        out[:, c * out_ch:(c + 1) * out_ch])
                    if log_scale:
                        scale = jnp.exp(scale)
                    results.append(self._vote_and_peel(
                        xyz, scale, prob, coords_w, valid, grid_shape,
                        peel=peel))
                if n == 1:
                    return new_carry, results[0]
                return new_carry, jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs, 0), *results)

            # scan (not vmap): each backbone pass saturates the chip, so the
            # groups run back-to-back inside one dispatch; scanning also
            # keeps the Pallas tiled kernels on their single-scene layout
            _, outs = jax.lax.scan(per_group, donors, stacked_vars)
            if n > 1:
                # (n_groups, n, ...) -> (n_groups * n, ...); padded tail
                # categories are trimmed by postprocess
                outs = jax.tree_util.tree_map(
                    lambda x: x.reshape((-1,) + x.shape[2:]), outs)
            return outs

        self._scene_fn_cache[("dense", peel)] = scene_fn
        return scene_fn

    # ------------------------------------------------------------------
    def prepare_quantized(self, coords: np.ndarray, feats_raw: np.ndarray):
        """Shared (across all 9 categories) host prep for one scene."""
        return prepare_scene_args(
            coords, feats_raw, res=self.res, cap_multiple=self.cap_multiple,
            grid_multiple=self.grid_multiple, backbone=self.backbone,
            conv_impl=self.conv_impl,
        )

    def run_scene(self, args, peel: PeelConfig = None, planted=None):
        """One device program covering all categories for one scene.

        ``planted``: optional (C, cap, 8) head rows decoded in place of
        the backbone output (which still runs) — the detection-bearing
        bench hook; dense fast path only.
        """
        if args[0] == "dense":
            assert planted is None or (
                self.group_size == 1 and bool(self.lazy_rot_scale)), \
                "planted rows need the vmap-peel path (group_size=1, lazy)"
            (_, feats, flat, valid, coords_w, grid_shape, dense_dims,
             tiles, run_spec, run_tiles, occ_packs) = args
            return self._scene_fn_dense_for(peel or self.peel)(
                self.stacked_variables, feats, flat, valid, coords_w,
                tuple(dense_dims), grid_shape, tiles,
                run_spec=run_spec, run_tiles=run_tiles,
                occ_packs=occ_packs, planted=planted,
            )
        assert planted is None, "planted rows need the dense fast path"
        _, feats, pyramid, coords_w, grid_shape = args
        return self._scene_fn_sparse_for(peel or self.peel)(
            self.stacked_variables, feats, pyramid, coords_w, grid_shape
        )

    def run_scene_with_retry(self, args):
        """run_scene, escalating the peel budget while any category's loop
        reports a budget (not threshold) exit (see DetectionPipeline)."""
        out = self.run_scene(args)
        if not self.retry_on_truncation:
            return out
        peel = self.peel
        for _ in range(self.max_retries):
            if not bool(np.asarray(jax.device_get(out["truncated"])).any()):
                return out
            peel = dataclasses.replace(
                peel, max_iters=peel.max_iters * 4,
                max_boxes=peel.max_boxes * 2)
            out = self.run_scene(args, peel=peel)
        return out

    def postprocess(self, out) -> list:
        """Host NMS per category -> [(category, corners (8,3), prob)]."""
        out = jax.device_get(out)
        if bool(np.asarray(out.get("truncated", False)).any()):
            warnings.warn(
                "peel_boxes stopped on an iteration/box budget, not the "
                "vote threshold — detections may be incomplete (use "
                "run_scene_with_retry or raise PeelConfig.max_iters/"
                "max_boxes)", RuntimeWarning, stacklevel=2)
        map_scene = []
        n_boxes = np.asarray(out["n_boxes"])
        boxes = np.asarray(out["boxes"])
        scores = np.asarray(out["scores"])
        for ci, category in enumerate(self.categories):
            n = int(n_boxes[ci])
            if n == 0:
                continue
            b, s = boxes[ci, :n], scores[ci, :n]
            for j in nms_host(b, s, self.nms_iou):
                map_scene.append((category, b[j], float(s[j])))
        return map_scene

    def detect(self, coords: np.ndarray, feats_raw: np.ndarray) -> list:
        """Full quantized scene -> detections across all categories."""
        return self.postprocess(self.run_scene_with_retry(
            self.prepare_quantized(coords, feats_raw)))


def stack_variables(variables_list: List[Dict]) -> Dict:
    """Stack per-category variable pytrees on a new leading axis (jitted —
    eager per-leaf stacking pays a dispatch round trip per op on
    remote-compile backends)."""
    stack = jax.jit(
        lambda vs: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *vs)
    )
    return stack(variables_list)
