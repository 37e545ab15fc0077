"""Scatter -> dense Conv3D -> gather: the row-format MXU conv engine.

The gather-form sparse conv (ops/sparse_conv.py) pays K row-gathers per
output row (the k=5 stem alone gathers 125 x N rows — measured ~320 ms of
a ~750 ms ScanNet-scale train microbatch, RESULTS_r5.md). This engine
keeps activations as point ROWS between layers (tiny — the train memory
winner) but executes each conv densely on the MXU:

    grid = scatter(rows, level flat ids)      # zeros elsewhere
    grid = lax.conv_general_dilated(grid, W)  # sub / strided / transposed
    rows_out = grid[output level flat ids]    # submanifold mask for free

Exactness: identical to the gather-form conv (missing neighbors read the
grid's zeros; outputs exist only at the gathered output coordinates) and
to MinkowskiEngine's kernel-map semantics — see the masked-dense proof in
models/dense_unet.py. The scatter is wrapped in ``jax.checkpoint`` so the
conv backward (which needs its input) recomputes the cheap scatter from
the stored rows instead of saving the multi-GB grid.

Replaces: reference MinkowskiConvolution{,Transpose} execution
(/root/reference/utils/minkunet.py:57-118) for training, where the Pallas
occupied-tile inference kernels (no VJP) don't apply.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class DensePlan:
    """Static+traced description of one scatter-dense conv site.

    kind: "sub" (stride 1, odd k — block convs and the stem), "down"
    (k=2 stride 2) or "up" (k=2 transposed). ``grid_shape`` is the INPUT
    level's (B, X, Y, Z); flat ids index the stacked (B * cells) space,
    -1 for padding/out-of-grid rows.
    """

    flat_in: jnp.ndarray
    flat_out: jnp.ndarray
    kind: str = flax.struct.field(pytree_node=False, default="sub")
    k: int = flax.struct.field(pytree_node=False, default=3)
    grid_shape: Tuple[int, int, int, int] = flax.struct.field(
        pytree_node=False, default=())

    @property
    def shape(self):
        # SparseConv sizes its kernel param from nbr.shape[1]
        return (0, self.k ** 3)


def _to_dense_kernel(w: jnp.ndarray, k: int) -> jnp.ndarray:
    """(K, Cin, Cout) x-fastest offsets -> (kx, ky, kz, Cin, Cout)."""
    cin, cout = w.shape[1], w.shape[2]
    w = w.reshape(k, k, k, cin, cout)  # (iz, iy, ix, ...)
    return jnp.transpose(w, (2, 1, 0, 3, 4))


def scatter_to_grid(rows: jnp.ndarray, flat: jnp.ndarray,
                    grid_shape) -> jnp.ndarray:
    """(N, C) rows -> (B, X, Y, Z, C) dense grid, zeros elsewhere.
    flat: (N,) stacked-space cell ids, -1 dropped."""
    B, X, Y, Z = grid_shape
    n_cells = B * X * Y * Z
    n = rows.shape[0]
    # distinct out-of-range sentinels keep the unique_indices hint honest
    safe = jnp.where(flat >= 0, flat,
                     n_cells + jnp.arange(n, dtype=flat.dtype))
    g = jnp.zeros((n_cells, rows.shape[1]), rows.dtype)
    g = g.at[safe].set(rows, mode="drop", unique_indices=True)
    return g.reshape(B, X, Y, Z, rows.shape[1])


def gather_rows(grid: jnp.ndarray, flat: jnp.ndarray) -> jnp.ndarray:
    """(B, X, Y, Z, C) grid -> (N, C) rows at flat ids (0 where -1)."""
    B, X, Y, Z, C = grid.shape
    n_cells = B * X * Y * Z
    flatg = grid.reshape(n_cells, C)
    rows = flatg[jnp.clip(flat, 0, n_cells - 1)]
    return jnp.where((flat >= 0)[:, None], rows, 0)


def _stem_fold_conv(rows, w, bias, plan, dt):
    """k=5 cin=3 stem without the channels-last lane trap.

    A (B, X, Y, Z, 3) grid physically lane-pads 3 -> 128 (42x bytes), and
    the 125-tap row-gather form pays 125 x N row gathers (~320 ms/scene).
    Instead (the eval path's prefold, models/dense_unet.py, adapted to
    rows): scatter each channel as a SCALAR (Z-minor) grid, fold the 25
    (dy, dz) taps x 3 channels into 75 lanes via shifted slices (x stays
    padded), then the conv is 5 dx-shifted row gathers + one matmul. The
    fold is checkpointed — the backward recomputes it from the rows.
    """
    cin = w.shape[1]
    k = plan.k
    h = k // 2
    B, X, Y, Z = plan.grid_shape
    cout = w.shape[2]
    lanes = -(-(k * k * cin) // 128) * 128

    def fold(r):
        blocks = []
        for c in range(cin):
            g = scatter_to_grid(r[:, c:c + 1].astype(dt), plan.flat_in,
                                plan.grid_shape)[..., 0]
            g = jnp.pad(g, ((0, 0), (h, h), (h, h), (h, h)))
            for dz in range(k):
                for dy in range(k):
                    blocks.append(g[:, :, dy:dy + Y, dz:dz + Z])
        stacked = jnp.stack(blocks, 0)  # (cin*k*k, B, X+2h, Y, Z)
        # layout break (see models.dense_unet.fold_dydz): stops XLA from
        # propagating the transpose's lane-major layout back into the
        # per-block slices (each would lane-pad 128x physically)
        stacked = jax.lax.optimization_barrier(stacked)
        xf = jnp.transpose(stacked, (1, 2, 3, 4, 0))
        return jnp.pad(
            xf, ((0, 0),) * 4 + ((0, lanes - k * k * cin),))

    xf = jax.checkpoint(fold)(rows)
    n_cells = X * Y * Z  # per-scene block size of the stacked id space
    xf_flat = xf.reshape(-1, lanes)  # (B * (X+2h) * Y * Z, lanes)

    flat = plan.flat_out
    ok = flat >= 0
    safe = jnp.where(ok, flat, 0)
    b = safe // n_cells
    r = safe % n_cells
    x_ = r // (Y * Z)
    yz = r % (Y * Z)

    # weight rows per dx in the fold's (c, dz, dy) lane order
    w5 = w.reshape(k, k, k, cin, cout)            # (iz, iy, ix, c, co)
    wdx = jnp.transpose(w5, (2, 3, 0, 1, 4)).reshape(k, k * k * cin, cout)
    wdx = jnp.pad(wdx, ((0, 0), (0, lanes - k * k * cin), (0, 0))).astype(dt)

    out = None
    for dx in range(k):
        ids = (b * ((X + 2 * h) * Y * Z)
               + (x_ + dx) * (Y * Z) + yz)
        g = xf_flat[ids]                           # (N, lanes)
        part = jax.lax.dot_general(
            g, wdx[dx], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = part if out is None else out + part
    out = jnp.where(ok[:, None], out, 0.0)
    if bias is not None:
        out = out + bias
    return out


def scatter_dense_conv(
    rows: jnp.ndarray,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    plan: DensePlan,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """One conv through the dense grid; returns (N_out, Cout) f32 rows."""
    k = plan.k
    dt = compute_dtype
    if plan.kind == "stem_fold":
        return _stem_fold_conv(rows, w, bias, plan, dt)
    wk = _to_dense_kernel(w, k).astype(dt)
    dn = ("NDHWC", "DHWIO", "NDHWC")
    pe = dt

    # remat ONLY the scatter: the conv's VJP needs its input grid; with
    # the scatter checkpointed, the backward recomputes it from the saved
    # rows instead of keeping the grid alive across the whole step
    scat = jax.checkpoint(
        lambda r: scatter_to_grid(r.astype(dt), plan.flat_in,
                                  plan.grid_shape))
    x = scat(rows)

    if plan.kind == "sub":
        h = k // 2
        out = jax.lax.conv_general_dilated(
            x, wk, (1, 1, 1), [(h, h)] * 3, dimension_numbers=dn,
            preferred_element_type=pe,
        )
    elif plan.kind == "down":
        assert k == 2
        out = jax.lax.conv_general_dilated(
            x, wk, (2, 2, 2), [(0, 0)] * 3, dimension_numbers=dn,
            preferred_element_type=pe,
        )
    elif plan.kind == "up":
        # out[2p + d] += W[d] @ in[p] (reference
        # MinkowskiConvolutionTranspose): dilated conv with the flipped
        # kernel, borders trimmed to the 2x extent (models/dense_unet.py's
        # margined variant with margin 0)
        assert k == 2
        out = jax.lax.conv_general_dilated(
            x, wk[::-1, ::-1, ::-1], (1, 1, 1), [(1, 1)] * 3,
            lhs_dilation=(2, 2, 2), dimension_numbers=dn,
            preferred_element_type=pe,
        )
    else:  # pragma: no cover
        raise ValueError(plan.kind)

    rows_out = gather_rows(out, plan.flat_out).astype(jnp.float32)
    if bias is not None:
        rows_out = rows_out + bias
    return rows_out
