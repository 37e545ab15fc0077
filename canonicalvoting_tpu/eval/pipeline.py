"""End-to-end detection pipeline: voxelize -> backbone -> vote -> peel -> NMS.

Rebuilds the reference inference pass (reference: /root/reference/
eval_joint.py:163-303) as one jit-compiled scene function with host-side NMS:

  host:   sparse_quantize + pyramid build (ops/coords.py)
  device: MinkUNet fwd -> per-class head gather (argmax class,
          eval_joint.py:177-180) -> exp(scale) when log_scale (:186-188)
          -> canonical Hough voting (:192-193) -> box peeling while_loop
  host:   per-class NMS at IoU 0.3 (:270-280) on the (few) decoded boxes

Unlike the reference, nothing syncs per box; the device returns fixed-size
arrays once per scene.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import warnings
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.data.geometry import IDX2NAME, NAME2CATNAME, NCLASSES
from canonicalvoting_tpu.decode.peeling import PeelConfig, peel_boxes
from canonicalvoting_tpu.metrics.ap import nms as nms_host
from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid
from canonicalvoting_tpu.ops.hough_voting import (
    compute_corners,
    grid_dims_from_corners,
    hough_voting,
    hough_voting_obj,
    round_grid_shape,
    vote_stats_at_cell,
)
from canonicalvoting_tpu.ops.sparse_conv import valid_row_mask
from canonicalvoting_tpu.ops.voxelize import batched_coordinates, sparse_quantize


def slice_joint_heads(out, nclasses: int = NCLASSES):
    """Joint-model head decoding at eval time (eval_joint.py:173-190).

    out: (N, 6*nclasses + nclasses + 1). Returns (xyz, scale, class_pred,
    prob_pred) with per-point heads gathered by the argmax class.
    """
    out_xyz = out[:, : 3 * nclasses].reshape(-1, nclasses, 3)
    out_scale = out[:, 3 * nclasses: 6 * nclasses].reshape(-1, nclasses, 3)
    out_class = out[:, 6 * nclasses:]

    idx = jnp.argmax(out_class, axis=-1)
    idx = jnp.where(idx == nclasses, 0, idx)  # background -> class 0 (:178)
    xyz = jnp.take_along_axis(out_xyz, idx[:, None, None], axis=1)[:, 0]
    scale = jnp.take_along_axis(out_scale, idx[:, None, None], axis=1)[:, 0]

    class_pred = jnp.argmax(out_class[..., :-1], axis=-1).astype(jnp.int32)
    prob_pred = jnp.max(
        jax.nn.softmax(out_class, axis=-1)[..., :-1], axis=-1
    )  # (:190)
    return xyz, scale, class_pred, prob_pred


def slice_separate_heads(out):
    """Per-category model heads (eval_separate.py / train_separate.py:247-249,
    361-366): xyz (3) + scale (3) + binary objectness (2)."""
    xyz = out[:, :3]
    scale = out[:, 3:6]
    prob = jax.nn.softmax(out[:, 6:8], axis=-1)[:, 1]
    return xyz, scale, prob


def prepare_scene_args(coords: np.ndarray, feats_raw: np.ndarray, *,
                       res: float, cap_multiple: int, grid_multiple,
                       backbone: str, conv_impl: str):
    """Host-side scene prep shared by the joint and separate pipelines.

    Returns an opaque args tuple tagged "dense" or "sparse"; all device
    arrays are pre-staged with an async device_put so uploads overlap the
    next scene's host prep.
    """
    n = len(coords)
    dims_w = (coords.max(0) - coords.min(0)).astype(np.int32) + 1
    grid_shape = round_grid_shape(dims_w, grid_multiple)
    cap = int(np.ceil(max(n, 1) / cap_multiple) * cap_multiple)
    feats = np.zeros((cap, feats_raw.shape[1]), np.float32)
    feats[:n] = feats_raw
    feats[:, -3:] = feats[:, -3:] * 2.0 - 1.0  # (:167-168)
    valid = np.zeros((cap,), np.float32)
    valid[:n] = 1.0
    coords_p = np.zeros((cap, 3), np.int32)
    coords_p[:n] = coords[:, -3:]
    coords_w = coords_p.astype(np.float32) * res

    if backbone == "dense":
        from canonicalvoting_tpu.data.dense_prep import (
            dense_flat_ids,
            dense_grid_geometry,
            host_occ_packs,
            level_tiles,
        )

        base, dense_dims = dense_grid_geometry(coords)
        flat = np.full((cap,), -1, np.int32)
        flat[:n] = dense_flat_ids(coords, base, dense_dims)
        tiles = None
        run_spec = ()
        run_tiles = None
        occ_packs = None
        if conv_impl != "xla":
            # level_tiles now carries dedicated fine conv lists
            # (CONV_TILE_PLAN keys) — the z-run decomposition measured a
            # wash against them (round-3 sweep, RESULTS_r3.md) and is no
            # longer generated here; assemble_runs stays for callers that
            # thread explicit runs
            tiles = level_tiles(coords, base, dense_dims)
            # CV_XLA_LEVELS="3,4": drop these levels' tile lists so the
            # model falls back to the masked-dense XLA conv there — at the
            # deepest levels the tiled kernels' per-call launch cost
            # exceeds the tiny grids' full-dense compute (bench A/B knob)
            drop = os.environ.get("CV_XLA_LEVELS", "")
            if drop:
                from canonicalvoting_tpu.data.dense_prep import (
                    CONV_KEY_OFF, TRANS_KEYS)

                lvls = {int(s) for s in drop.split(",") if s}
                down_keys = {TRANS_KEYS.get(("down", lv), lv)
                             for lv in lvls}
                up_keys = {TRANS_KEYS.get(("up", lv), lv) for lv in lvls}
                dead = lvls | {CONV_KEY_OFF + lv for lv in lvls} \
                    | down_keys | up_keys
                tiles = {k: v for k, v in tiles.items() if k not in dead}
            # occupancy packs on the HOST: the in-graph pack transposes
            # cost ~7 ms/scene on TPU; here they overlap device work
            occ_packs = host_occ_packs(coords, base, dense_dims, tiles)
        # pre-stage on device: per-call numpy->device uploads through
        # the transfer path cost ~40-100 ms each (async here, so they
        # overlap host prep of the next scene)
        feats, flat, valid, coords_w, tiles, run_tiles, occ_packs = \
            jax.device_put(
                (feats, flat, valid, coords_w, tiles, run_tiles, occ_packs)
            )
        return ("dense", feats, flat, valid, coords_w, grid_shape,
                dense_dims, tiles, run_spec, run_tiles, occ_packs)

    bcoords = batched_coordinates([coords])
    pyr = build_pyramid(
        bcoords, PyramidSpec(capacities=None, cap_multiple=cap_multiple)
    )
    n0 = pyr.coords[0].shape[0]
    feats_s = np.zeros((n0, feats_raw.shape[1]), np.float32)
    feats_s[:n] = feats_raw
    feats_s[:, -3:] = feats_s[:, -3:] * 2.0 - 1.0
    coords_w_s = pyr.coords[0][:, 1:].astype(np.float32) * res
    feats_s, pyr_j, coords_w_s = jax.device_put(
        (feats_s, pyr.as_jax_inputs(), coords_w_s)
    )
    return ("sparse", feats_s, pyr_j, coords_w_s, grid_shape)


def assemble_runs(run_spec, run_tiles):
    """Rebuild {level: [(R, G, chunks), ...]} from the static spec + the
    operand chunk arrays (see prepare_scene_args)."""
    if not run_spec or run_tiles is None:
        return None
    return {
        k: [(R, G, t) for (R, G, _n), t in zip(spec, run_tiles[k])]
        for k, spec in run_spec
    }


@dataclass
class DetectionPipeline:
    """Joint-model scene detector with the reference's constants."""

    model: object  # flax MinkUNetBase
    variables: Dict
    res: float = 0.03
    num_rots: int = 120
    log_scale: bool = True
    use_xyz: bool = False
    peel: PeelConfig = None
    # Gx must be a multiple of 64 so the splat matmul width 6*Gx is a
    # multiple of 128 (fractional MXU tiles measured 16% slower); the y
    # bucket is free (plane count doesn't matter); Gz is the splat lane dim.
    # x bucket back at 64: the windowed-splat experiment bucketed x at 32
    # to track vote reach, but on TPU the x=224 grid runs the plane splat
    # ~10% SLOWER than x=256 (42.7 vs 38.4 ms, bench_vote2) — fractional
    # 128-lane x blocks cost more than the extra tent width saves.
    grid_multiple: tuple = (64, 32, 128)
    cap_multiple: int = 4096
    nms_iou: float = 0.3
    hv_method: str = "auto"
    # "dense" executes the backbone as masked dense convs (MXU-bound, no
    # kernel maps, ~1.5x faster + ~30x cheaper host prep); "sparse" is the
    # gather-form gather-GEMM path; "auto" = dense on TPU, sparse elsewhere
    # (dense Conv3D compiles/runs poorly on CPU). Same parameters either way.
    backbone: str = "auto"
    # "tiled" routes the dense path's stride-1 k=3/5 convs through the Pallas
    # occupied-tile kernel (ops/pallas/tiled_conv.py); "xla" keeps
    # lax.conv_general_dilated; "auto" = tiled on TPU.
    conv_impl: str = "auto"
    stem_impl: str = "tiled"  # or "prefold" (see models.dense_unet)
    # splat only the obj vote channel and sample rot/scale lazily at the
    # peeled argmax cells (vote_stats_at_cell) — same math, ~6x less vote
    # MXU work. True/False, or "auto" (on, except interpret-mode tests).
    lazy_rot_scale: object = "auto"
    # The reference peels until the peak drops below thresh_high with no
    # iteration bound (eval_joint.py:204); the on-device loop is budgeted
    # (PeelConfig.max_iters/max_boxes) and reports `truncated` when a budget
    # (not the threshold) ended it. detect()/run_scene_with_retry() then
    # re-run the tail with 4x the iteration budget (one extra compile,
    # engages only on pathological scenes).
    retry_on_truncation: bool = True
    max_retries: int = 2

    def __post_init__(self):
        if self.peel is None:
            self.peel = PeelConfig(res=self.res)
        on_tpu = jax.default_backend() == "tpu"
        if self.backbone == "auto":
            self.backbone = "dense" if on_tpu else "sparse"
        if self.conv_impl == "auto":
            self.conv_impl = "tiled" if on_tpu else "xla"
        if self.lazy_rot_scale == "auto":
            self.lazy_rot_scale = True

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
    def _tail_cache(self):
        return {}

    @property
    def _tail_fn(self):
        return self._tail_for(self.peel)

    def _tail_for(self, peel_cfg: PeelConfig):
        """Head slice -> vote -> peel, jitted separately from the backbone.

        Two dispatches instead of one: when the plane-splat Pallas call sits
        in the same XLA program as the ~60-conv backbone, the TPU scheduler
        serializes poorly and the program runs ~1.6x slower than the two
        halves do back to back (measured on v5e; see benchmarks/
        profile_bisect.py). The extra dispatch costs ~8 ms.

        Cached per PeelConfig so the truncation-retry path (escalated
        iteration budgets) reuses its compiles.
        """
        if peel_cfg in self._tail_cache:
            return self._tail_cache[peel_cfg]
        res = self.res
        num_rots = self.num_rots
        log_scale = self.log_scale
        hv_method = self.hv_method
        lazy = self.lazy_rot_scale

        @functools.partial(jax.jit, static_argnames=("grid_shape",))
        def tail(out, coords_w, valid, grid_shape):
            xyz, scale, class_pred, prob = slice_joint_heads(out)
            if log_scale:
                scale = jnp.exp(scale)  # (:186-188)
            corners = compute_corners(coords_w, valid)
            corner = corners[0]
            if lazy:
                # obj-only dense splat (1/6 the matmul width); rot/scale are
                # sampled lazily at the <= max_boxes cells the peeler visits
                go = hough_voting_obj(
                    coords_w, xyz, scale, prob, res=res, num_rots=num_rots,
                    grid_shape=grid_shape, corners=corners, valid=valid,
                    method=hv_method,
                )
                dims = jnp.minimum(
                    grid_dims_from_corners(corners, res),
                    jnp.asarray(grid_shape, jnp.int32),
                )

                def rot_scale_fn(cand):
                    return vote_stats_at_cell(
                        coords_w, xyz, scale, prob, corner, dims, res,
                        num_rots, cand, valid=valid,
                    )

                return peel_boxes(
                    go, None, None, coords_w, xyz, prob, class_pred, corner,
                    peel_cfg, valid=valid, rot_scale_fn=rot_scale_fn,
                )
            go, gr, gs = hough_voting(
                coords_w, xyz, scale, prob, res=res, num_rots=num_rots,
                grid_shape=grid_shape, corners=corners, valid=valid,
                method=hv_method,
            )
            return peel_boxes(
                go, gr, gs, coords_w, xyz, prob, class_pred, corner, peel_cfg,
                valid=valid,
            )

        self._tail_cache[peel_cfg] = tail
        return tail

    @functools.cached_property
    def _backbone_fn(self):
        model = self.model
        backbone = self.backbone
        dense_model = self._dense_model if backbone == "dense" else None

        if backbone == "dense":

            @functools.partial(jax.jit,
                               static_argnames=("dense_dims", "run_spec"))
            def backbone_fn(variables, feats, flat_idx, valid, dense_dims,
                            tiles=None, run_spec=(), run_tiles=None,
                            occ_packs=None):
                return dense_model.apply(
                    variables, feats, flat_idx, valid, dense_dims, False,
                    tiles=tiles,
                    tile_runs=assemble_runs(run_spec, run_tiles),
                    occ_packs=occ_packs,
                )

            return backbone_fn

        @jax.jit
        def backbone_fn(variables, feats, pyramid):
            return model.apply(variables, feats, pyramid, False)

        return backbone_fn

    # ------------------------------------------------------------------
    def prepare_scene(self, points: np.ndarray, rgb: np.ndarray):
        """Host-side prep. Returns an opaque args tuple for run_scene."""
        coords, idx = sparse_quantize(points, self.res)
        feats_raw = (
            np.concatenate([points[idx], rgb[idx]], -1)
            if self.use_xyz else rgb[idx]
        )
        return self.prepare_quantized(coords, feats_raw)

    def prepare_quantized(self, coords: np.ndarray, feats_raw: np.ndarray):
        """Prep from already-quantized voxels (dataset items)."""
        return prepare_scene_args(
            coords, feats_raw, res=self.res, cap_multiple=self.cap_multiple,
            grid_multiple=self.grid_multiple, backbone=self.backbone,
            conv_impl=self.conv_impl,
        )

    def detect(self, points: np.ndarray, rgb: np.ndarray):
        """Full scene -> list of (classname, corners (8,3), prob)."""
        args = self.prepare_scene(points, rgb)
        return self.postprocess(self.run_scene_with_retry(args))

    def run_scene(self, args, peel: Optional[PeelConfig] = None):
        """Device pass on prepare_scene/prepare_quantized output."""
        kind = args[0]
        tail = self._tail_fn if peel is None else self._tail_for(peel)
        if kind == "dense":
            (_, feats, flat, valid, coords_w, grid_shape, dense_dims,
             tiles, run_spec, run_tiles, occ_packs) = args
            out = self._backbone_fn(
                self.variables, feats, flat, valid, tuple(dense_dims),
                tiles=tiles, run_spec=run_spec, run_tiles=run_tiles,
                occ_packs=occ_packs,
            )
            return tail(out, coords_w, valid, grid_shape)
        _, feats, pyramid, coords_w, grid_shape = args
        nvalid = pyramid["nvalid"][0]
        valid = valid_row_mask(feats.shape[0], nvalid)[:, 0]
        out = self._backbone_fn(self.variables, feats, pyramid)
        return tail(out, coords_w, valid, grid_shape)

    def run_scene_with_retry(self, args):
        """run_scene, escalating the peel iteration budget while the loop
        reports a budget (not threshold) exit. Matches the reference's
        unbounded ``while True`` (eval_joint.py:204) up to max_retries
        budget doublings; each escalation is one extra tail compile,
        cached for subsequent scenes."""
        out = self.run_scene(args)
        if not self.retry_on_truncation:
            return out
        peel = self.peel
        for _ in range(self.max_retries):
            if not bool(jax.device_get(out["truncated"])):
                return out
            peel = dataclasses.replace(
                peel, max_iters=peel.max_iters * 4,
                max_boxes=peel.max_boxes * 2)
            out = self.run_scene(args, peel=peel)
        return out

    def postprocess(self, out) -> list:
        """Host NMS + class naming (eval_joint.py:270-280)."""
        # one batched fetch: per-leaf np.asarray pays a transfer round trip
        # each, which adds up on high-latency links
        out = jax.device_get(out)
        if bool(np.asarray(out.get("truncated", False)).any()):
            warnings.warn(
                "peel_boxes stopped on an iteration/box budget, not the "
                "vote threshold — detections may be incomplete (use "
                "run_scene_with_retry or raise PeelConfig.max_iters/"
                "max_boxes)", RuntimeWarning, stacklevel=2)
        n = int(out["n_boxes"])
        boxes = np.asarray(out["boxes"])[:n]
        scores = np.asarray(out["scores"])[:n]
        classes = np.asarray(out["classes"])[:n]
        map_scene = []
        for i in range(NCLASSES):
            sel = classes == i
            if sel.sum() == 0:
                continue
            boxes_cls = boxes[sel]
            scores_cls = scores[sel]
            pick = nms_host(boxes_cls, scores_cls, self.nms_iou)
            for j in pick:
                map_scene.append(
                    (NAME2CATNAME[IDX2NAME[i]], boxes_cls[j], float(scores_cls[j]))
                )
        return map_scene


def detections_to_map_entries(detections):
    """Adapter to metrics.eval_det_multiprocessing's pred format."""
    return [(name, box, score) for name, box, score in detections]
