"""Category-grouped evaluation: run N per-category MinkUNets as ONE net.

The separate evaluator runs 9 per-category MinkUNet34C(3, 8) models on the
same scene (reference eval_separate.py:165-186).  The per-call cost of the
occupied-tile Pallas kernels is dominated by per-tile DMA *issue* cost, not
FLOPs, and every level's channel count is lane-padded to a 128 multiple —
e.g. a 32-channel conv moves and multiplies 128 lanes anyway.

This module packs N categories into the LANE dimension instead: a "grouped"
model is just another ``DenseMinkUNet`` whose channel plan is N x the
per-category plan and whose conv kernels are BLOCK-DIAGONAL embeddings of
the N categories' kernels (BN affines/stats concatenate).  Levels with
per-category channels <= 128/N ride the SAME lane count as a single
category — N categories for one call's cost — and wider levels still
amortize the per-tile DMA issue cost N ways.  No kernel changes: the math
is exactly block-diagonal through conv/BN/mask/ReLU/concat, so the grouped
net's outputs equal the per-category nets' outputs (tests/test_grouped.py).

Reference behavior replaced: 9 sequential independent model passes
(/root/reference/eval_separate.py:165-186).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _concat(leaves: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return jnp.concatenate(list(leaves), axis=0)


def _embed_kernel(ws: Sequence[jnp.ndarray],
                  in_segs: Sequence[int]) -> jnp.ndarray:
    """Block-diagonal embed of per-category conv kernels.

    ws: N kernels (K, cin, cout); ``in_segs``: per-category sizes of the
    input-channel SEGMENTS (concat order), summing to cin.  The grouped
    input layout is [seg1 cat0..catN-1 | seg2 cat0..catN-1 | ...] (each
    segment packed category-major), matching what the grouped net produces
    at every concat site.  Output channels are category-major packed.
    """
    n = len(ws)
    K, cin, cout = ws[0].shape
    assert sum(in_segs) == cin, (in_segs, cin)
    out = np.zeros((K, n * cin, n * cout), np.float32)
    out = jnp.asarray(out)
    for c, w in enumerate(ws):
        r0 = 0   # row offset within the per-category kernel
        g0 = 0   # offset of the segment block in the grouped layout
        for s in in_segs:
            out = out.at[:, g0 + c * s: g0 + (c + 1) * s,
                         c * cout:(c + 1) * cout].set(
                w[:, r0:r0 + s, :].astype(jnp.float32))
            r0 += s
            g0 += n * s
    return out


def _embed_stem(ws: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Stem kernels (K, in_ch, init_dim): the INPUT is shared (the scene's
    features), so the grouped stem just concatenates output channels."""
    return jnp.concatenate([w.astype(jnp.float32) for w in ws], axis=2)


def grouped_model_config(model, n: int) -> Dict:
    """Constructor kwargs for the grouped ``DenseMinkUNet``/``MinkUNetBase``
    twin of ``model`` (a per-category model) covering ``n`` categories.

    Only the basic-block family is supported: bottleneck blocks' conv3
    input-segment layout is not handled by ``build_grouped_variables``.
    """
    if model.block != "basic":
        raise NotImplementedError(
            "grouped evaluation supports block='basic' only "
            f"(got block={model.block!r})")
    return dict(
        in_channels=model.in_channels,
        out_channels=n * model.out_channels,
        block=model.block,
        layers=tuple(model.layers),
        planes=tuple(n * p for p in model.planes),
        init_dim=n * model.init_dim,
        stem_kernel=model.stem_kernel,
        compute_dtype=model.compute_dtype,
        bn_axis=model.bn_axis,
    )


def build_grouped_variables(variables_list: List[Dict], model) -> Dict:
    """Merge N per-category variable trees (MinkUNet34C-family layout,
    params + batch_stats) into the grouped model's tree.

    Knows the MinkUNetBase wiring (models/minkunet.py == models/dense_unet
    .py, mirroring reference utils/minkunet.py:122-180): encoder blocks see
    a single input segment; decoder blocks' first block sees the
    [transposed-conv out | skip] concat (two segments).
    """
    if model.block != "basic":
        raise NotImplementedError(
            "grouped evaluation supports block='basic' only "
            f"(got block={model.block!r})")
    n = len(variables_list)
    planes = tuple(model.planes)
    init_dim = model.init_dim
    exp = 1 if model.block == "basic" else 4
    # encoder entry channels per stage and skip widths (MinkUNetBase)
    enc_in = [init_dim]
    for i in range(3):
        enc_in.append(planes[i] * exp)
    skip_chs = [init_dim] + [planes[i] * exp for i in range(3)]

    def seg_spec(mod: str) -> Sequence[int]:
        """Input-segment sizes (per category) for a conv module name."""
        if mod == "conv0p1s1":
            return "stem"
        if mod == "final":
            return [planes[7] * exp]
        if mod.startswith("convtr"):
            d = int(mod[6]) - 4          # convtr4..convtr7 -> d = 0..3
            # input: block4 out (d=0) or the previous decoder stack's out
            cin = planes[3] * exp if d == 0 else planes[4 + d - 1] * exp
            return [cin]
        if mod.startswith("conv") and "s2" in mod:
            i = int(mod[4]) - 1          # conv1..conv4 -> stage 0..3
            return [enc_in[i]]
        if mod.startswith("block"):
            b = int(mod[5:].split("_")[0])
            j = int(mod.split("_")[1])
            if b <= 4:                   # encoder
                cin = enc_in[b - 1] if j == 0 else planes[b - 1] * exp
                return [cin]
            d = b - 5                    # decoder
            lvl = 3 - d
            if j == 0:
                return [planes[4 + d], skip_chs[lvl]]
            return [planes[4 + d] * exp]
        raise KeyError(mod)

    def merge(path: Tuple[str, ...], leaves: Sequence[jnp.ndarray]):
        mod = path[1]
        leaf = path[-1]
        if leaf == "bias" and mod == "final":
            return _concat(leaves)
        if leaf in ("scale", "bias", "mean", "var"):
            return _concat(leaves)
        assert leaf == "kernel", path
        if mod == "conv0p1s1":
            return _embed_stem(leaves)
        if mod.startswith("block") and len(path) > 3:
            sub = path[2]
            if sub == "conv2":
                # conv2's input is conv1's output: one segment of the
                # block's plane width
                b = int(mod[5:].split("_")[0])
                p = planes[b - 1] if b <= 4 else planes[4 + (b - 5)]
                return _embed_kernel(leaves, [p])
            # conv1 / downsample_conv see the block's input segments
            return _embed_kernel(leaves, seg_spec(mod))
        return _embed_kernel(leaves, seg_spec(mod))

    flat = [jax.tree_util.tree_flatten_with_path(v) for v in variables_list]
    treedef = flat[0][1]
    paths = [tuple(str(getattr(k, "key", k)) for k in kp)
             for kp, _ in flat[0][0]]
    merged_leaves = []
    for i, path in enumerate(paths):
        leaves = [f[0][i][1] for f in flat]
        merged_leaves.append(merge(path, leaves))
    return jax.tree_util.tree_unflatten(treedef, merged_leaves)


def slice_group_head(rows: jnp.ndarray, n: int, cat: int,
                     out_channels: int) -> jnp.ndarray:
    """Per-category head rows from the grouped net's (N*out_channels) rows
    (category-major packing)."""
    return rows[:, cat * out_channels:(cat + 1) * out_channels]
