"""Host-side sparse-voxel coordinate manager (NumPy).

TPU-native replacement for MinkowskiEngine's CoordinateManager / kernel maps
(used throughout reference utils/minkunet.py). The design splits the work the
way TPU pipelines should:

  * the HOST builds, per batch, the full coordinate pyramid (stride 1, 2, 4,
    8, 16) and every neighbor table the U-Net needs, padded to static
    capacities — this is data-dependent, shape-dynamic integer work that
    belongs with the data loader (exactly like attention-mask construction);
  * the DEVICE then runs pure static-shape gather + MXU GEMM
    (see sparse_conv.py) with no dynamic shapes anywhere under jit.

Neighbor tables are in "gather form": for output row m and kernel offset k,
``nbr[m, k]`` is the input row index whose coordinate equals
``out_coord[m] + offset[k]`` (or -1 when that voxel is empty). A sparse
convolution is then ``out[m] = sum_k W_k @ feats[nbr[m, k]]`` — one big
implicit-GEMM per layer, output-stationary, no scatter in the forward pass.

Kernel offsets are enumerated x-fastest (first coordinate varies quickest),
matching MinkowskiEngine's hypercube kernel-region order so converted
checkpoints index weights identically.

Stride semantics mirror MinkowskiEngine:
  * odd kernel (3, 5): offsets ``{-(k//2)..k//2} * stride`` centered;
  * kernel 2 / stride 2 downsample: offsets ``{0, s}`` on the input lattice,
    output coords = unique(floor(c / 2s) * 2s);
  * transposed kernel 2 / stride 2: outputs snap to the already-existing
    finer coordinate set (as ME's coordinate manager reuses the map built on
    the way down), so the up table is the down table reversed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

# Bit layout for packed coordinate keys (host int64): batch | x | y | z.
_AXIS_BITS = 18
_AXIS_OFF = 1 << (_AXIS_BITS - 1)  # shift so negatives pack fine
_AXIS_MASK = (1 << _AXIS_BITS) - 1


def pack_coords(coords: np.ndarray) -> np.ndarray:
    """Pack (N, 4) int [b, x, y, z] into int64 keys."""
    c = coords.astype(np.int64)
    x = c[:, 1] + _AXIS_OFF
    y = c[:, 2] + _AXIS_OFF
    z = c[:, 3] + _AXIS_OFF
    if np.any((x | y | z) >> _AXIS_BITS):
        raise ValueError("coordinate exceeds 18-bit packing range")
    return (((c[:, 0] << _AXIS_BITS | x) << _AXIS_BITS | y) << _AXIS_BITS) | z


def kernel_offsets(kernel_size: int, stride_lattice: int, ndim: int = 3) -> np.ndarray:
    """(K, ndim) int offsets, x-fastest enumeration.

    ``stride_lattice`` is the tensor stride of the INPUT level (offsets live
    on that lattice). Odd kernels are centered; even kernels cover
    ``{0..k-1} * s``.
    """
    if kernel_size % 2 == 1:
        r = kernel_size // 2
        axis = np.arange(-r, r + 1) * stride_lattice
    else:
        axis = np.arange(kernel_size) * stride_lattice
    grids = np.meshgrid(*([axis] * ndim), indexing="ij")
    # x-fastest: stack with the FIRST axis varying quickest
    offs = np.stack([g.reshape(-1) for g in grids], axis=-1)
    # meshgrid 'ij' makes the LAST axis vary fastest in the flattened order;
    # reverse the axis roles so x varies fastest.
    offs = offs[:, ::-1]
    return offs.astype(np.int64)


def build_nbr_table(
    in_coords: np.ndarray,
    out_coords: np.ndarray,
    offsets: np.ndarray,
    in_valid: Optional[int] = None,
    out_valid: Optional[int] = None,
) -> np.ndarray:
    """Gather-form neighbor table (N_out, K) int32; -1 = missing neighbor.

    Rows >= out_valid (padding) get all -1. Input rows >= in_valid are never
    matched.
    """
    n_in = len(in_coords) if in_valid is None else in_valid
    n_out = len(out_coords) if out_valid is None else out_valid
    from canonicalvoting_tpu import native

    got = native.build_nbr_table(in_coords, n_in, out_coords, n_out, offsets)
    if got is not None:
        return got
    keys_in = pack_coords(in_coords[:n_in])
    order = np.argsort(keys_in, kind="stable")
    sorted_keys = keys_in[order]

    K = len(offsets)
    nbr = np.full((len(out_coords), K), -1, np.int32)
    oc = out_coords[:n_out].astype(np.int64)
    for k in range(K):
        q = oc.copy()
        q[:, 1:] += offsets[k]
        qk = pack_coords(q)
        pos = np.searchsorted(sorted_keys, qk)
        pos_c = np.minimum(pos, max(len(sorted_keys) - 1, 0))
        if len(sorted_keys):
            hit = sorted_keys[pos_c] == qk
            nbr[:n_out, k] = np.where(hit, order[pos_c].astype(np.int32), -1)
    return nbr


def downsample_coords(coords: np.ndarray, out_stride: int,
                      n_valid: Optional[int] = None) -> np.ndarray:
    """Coarse coordinate set: unique(floor(c / out_stride) * out_stride),
    sorted by packed key. Batch column preserved."""
    n = len(coords) if n_valid is None else n_valid
    from canonicalvoting_tpu import native

    got = native.downsample_coords(coords, n, out_stride)
    if got is not None:
        keys = pack_coords(got)
        return got[np.argsort(keys, kind="stable")].astype(np.int32)
    c = coords[:n].astype(np.int64)
    down = c.copy()
    down[:, 1:] = (c[:, 1:] // out_stride) * out_stride
    keys = pack_coords(down)
    _, idx = np.unique(keys, return_index=True)
    return down[np.sort(idx)].astype(np.int32)


def pad_rows(arr: np.ndarray, capacity: int, fill) -> np.ndarray:
    if len(arr) > capacity:
        raise ValueError(f"{len(arr)} rows exceed capacity {capacity}")
    if len(arr) == capacity:
        return arr
    pad = np.full((capacity - len(arr),) + arr.shape[1:], fill, arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def _pad_coords(coords: np.ndarray, capacity: int) -> np.ndarray:
    """Pad coordinates with unique far-away voxels that match no query."""
    n = len(coords)
    if n > capacity:
        raise ValueError(f"{n} coords exceed capacity {capacity}")
    if n == capacity:
        return coords
    pad = np.zeros((capacity - n, coords.shape[1]), coords.dtype)
    pad[:, 0] = coords[:, 0].max() + 1 if n else 0
    # spread in x so padded rows don't collide with each other either
    pad[:, 1] = (_AXIS_OFF - 8) - np.arange(capacity - n) * 8
    pad[:, 2] = _AXIS_OFF - 16
    pad[:, 3] = _AXIS_OFF - 16
    return np.concatenate([coords, pad], axis=0)


@dataclass
class PyramidSpec:
    """Static configuration of a UNet coordinate pyramid."""

    num_levels: int = 5
    stem_kernel: int = 5
    conv_kernel: int = 3
    down_kernel: int = 2
    # capacity per level; None = derive from the data
    capacities: Optional[Sequence[int]] = None
    # with capacities=None: round each level's row count up to a multiple of
    # this (1 = exact shapes; larger values bound XLA recompiles)
    cap_multiple: int = 1


@dataclass
class PyramidArrays:
    """Host-side pyramid: everything the jitted UNet forward needs.

    All arrays are NumPy, padded to static shapes. Feed to the device as a
    pytree (jax converts on transfer).
    """

    coords: List[np.ndarray]          # per level (cap_i, 4) int32
    nvalid: List[int]                 # per level true row counts
    nbr_stem: np.ndarray              # (cap_0, stem_kernel**3)
    nbr_conv: List[np.ndarray]        # per level (cap_i, conv_kernel**3)
    nbr_down: List[np.ndarray]        # L_i -> L_{i+1} (cap_{i+1}, 8)
    nbr_up: List[np.ndarray]          # L_{i+1} -> L_i (cap_i, 8)

    def as_jax_inputs(self) -> Dict:
        """Dict-of-arrays pytree consumed by models.minkunet.MinkUNet."""
        return {
            "nbr_stem": self.nbr_stem,
            "nbr_conv": tuple(self.nbr_conv),
            "nbr_down": tuple(self.nbr_down),
            "nbr_up": tuple(self.nbr_up),
            "nvalid": tuple(
                np.asarray(v, np.int32) for v in self.nvalid
            ),
        }


def build_pyramid(
    coords0: np.ndarray,
    spec: PyramidSpec = PyramidSpec(),
) -> PyramidArrays:
    """Build the full coordinate pyramid + neighbor tables for one batch.

    Args:
      coords0: (N, 4) int32 batched voxel coords [b, x, y, z] at stride 1
        (from ``batched_coordinates``).
      spec: static pyramid configuration.
    """
    L = spec.num_levels
    caps = spec.capacities
    coords: List[np.ndarray] = []
    nvalid: List[int] = []

    cur = coords0.astype(np.int32)
    for lvl in range(L):
        n = len(cur)
        if caps is not None:
            cap = caps[lvl]
        else:
            m = max(spec.cap_multiple, 1)
            cap = int(np.ceil(max(n, 1) / m) * m)
        coords.append(_pad_coords(cur, cap))
        nvalid.append(n)
        if lvl + 1 < L:
            cur = downsample_coords(cur, 1 << (lvl + 1))

    nbr_conv = []
    for lvl in range(L):
        offs = kernel_offsets(spec.conv_kernel, 1 << lvl)
        nbr_conv.append(
            build_nbr_table(coords[lvl], coords[lvl], offs,
                            in_valid=nvalid[lvl], out_valid=nvalid[lvl])
        )
    nbr_stem = build_nbr_table(
        coords[0], coords[0], kernel_offsets(spec.stem_kernel, 1),
        in_valid=nvalid[0], out_valid=nvalid[0],
    )

    nbr_down = []
    nbr_up = []
    for lvl in range(L - 1):
        offs = kernel_offsets(spec.down_kernel, 1 << lvl)
        down = build_nbr_table(
            coords[lvl], coords[lvl + 1], offs,
            in_valid=nvalid[lvl], out_valid=nvalid[lvl + 1],
        )
        nbr_down.append(down)
        # Transposed conv: fine output m receives from coarse input at the
        # unique (parent, offset) pair — the reversed down map, re-expressed
        # in gather form over fine rows with the same offset ids.
        up = build_nbr_table(
            coords[lvl + 1], coords[lvl],
            -offs,  # fine = coarse + off  =>  coarse = fine + (-off)
            in_valid=nvalid[lvl + 1], out_valid=nvalid[lvl],
        )
        # Only the offset with coarse on the 2s lattice is a real pair; the
        # lookup already guarantees that (other offsets miss or point at a
        # non-lattice coord, which doesn't exist at the coarse level).
        nbr_up.append(up)

    return PyramidArrays(
        coords=coords,
        nvalid=nvalid,
        nbr_stem=nbr_stem,
        nbr_conv=nbr_conv,
        nbr_down=nbr_down,
        nbr_up=nbr_up,
    )
