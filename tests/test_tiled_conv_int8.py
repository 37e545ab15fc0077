"""int8 inference mode of the occupied-tile conv kernel (interpret mode).

The int8 path quantizes weights per-output-channel with the input grid's
per-channel scales folded in, runs (int8, int8) -> int32 matmuls, and
requantizes in the affine epilogue (ops/pallas/tiled_conv.py). These tests
replicate that integer arithmetic in NumPy exactly: int32 accumulations at
K <= 1152 are below 2^24, so the f32 comparison is exact up to the one
multiply-order difference in the folded scales (atol), and requantized int8
outputs may differ by at most 1 quantum at round-to-even boundaries.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from canonicalvoting_tpu.models.dense_unet import _DN, _to_dense_kernel
from canonicalvoting_tpu.ops.pallas.tiled_conv import (
    MX,
    MY,
    MZ,
    occupied_tiles,
    pack_occ,
    tiled_conv3d,
)

from tests.test_tiled_conv import _dense_ref, _interior, _margined, _tile_slices


def _quant_weights(w, sx):
    # the wrapper's quantization chain, run through jnp so the oracle's
    # division rounding matches XLA's (an np f32 division can land on the
    # other side of a round-half boundary and flip a weight by 1)
    w_t = jnp.asarray(w).astype(jnp.float32) * jnp.asarray(sx)[None, :, None]
    sw = jnp.maximum(jnp.max(jnp.abs(w_t), axis=(0, 1)), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w_t / sw[None, None, :]), -127, 127)
    return np.asarray(wq, np.float32), np.asarray(sw, np.float32)


def _setup(rng, cin=8, cout=8):
    X, Y, Z = 16, 8, 32
    q = np.zeros((X, Y, Z, cin), np.float32)
    occ_cells = rng.randint(0, [X, Y, Z], (150, 3))
    q[occ_cells[:, 0], occ_cells[:, 1], occ_cells[:, 2]] = rng.randint(
        -100, 100, (150, cin)).astype(np.float32)
    sx = (rng.rand(cin).astype(np.float32) + 0.5) * 0.01
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.2
    ts, group = (4, 4, 8), 4
    tiles = jnp.asarray(occupied_tiles(occ_cells, (X, Y, Z), ts,
                                       pad_multiple=group))
    occ_grid = np.zeros((X, Y, Z), np.float32)
    occ_grid[occ_cells[:, 0], occ_cells[:, 1], occ_cells[:, 2]] = 1.0
    occ_m = jnp.pad(jnp.asarray(occ_grid), ((MX, MX), (MY, MY), (MZ, MZ)))
    occp = pack_occ(occ_m, tiles, ts)
    return q, sx, w, ts, group, tiles, occ_grid, occp


def _margined_i8(q):
    return _margined(q).astype(jnp.int8)


def test_int8_in_float_out(rng):
    q, sx, w, ts, group, tiles, occ_grid, occp = _setup(rng)
    cout = w.shape[-1]
    scale = rng.rand(cout).astype(np.float32) + 0.5
    bias = rng.randn(cout).astype(np.float32)

    got = _interior(tiled_conv3d(
        _margined_i8(q), jnp.asarray(w), tiles,
        x_scale=jnp.asarray(sx), scale=jnp.asarray(scale),
        bias=jnp.asarray(bias), occ=occp, relu_out=True,
        tile_shape=ts, group=group, out_dtype=jnp.float32, interpret=True,
    ), cout).astype(np.float32)

    wq, sw = _quant_weights(w, sx)
    acc = _dense_ref(q, wq, 3)  # integer-exact in f32
    want = np.maximum(
        (acc * (sw * scale) + bias) * occ_grid[..., None], 0.0)
    for t in np.asarray(tiles):
        sl = _tile_slices(t, ts)
        np.testing.assert_allclose(got[sl], want[sl], rtol=2e-5, atol=1e-4)


def test_int8_in_int8_out_with_residual(rng):
    """int8 -> int8 requant with an int8 plain-add residual — the steady
    state of an int8 block stack."""
    q, sx, w, ts, group, tiles, occ_grid, occp = _setup(rng)
    cout = w.shape[-1]
    scale = rng.rand(cout).astype(np.float32) + 0.5
    bias = rng.randn(cout).astype(np.float32) * 0.1
    so = (rng.rand(cout).astype(np.float32) + 0.5) * 0.05
    qres = rng.randint(-100, 100, q.shape[:3] + (cout,)).astype(np.float32)
    sres = (rng.rand(cout).astype(np.float32) + 0.5) * 0.01

    got = _interior(tiled_conv3d(
        _margined_i8(q), jnp.asarray(w), tiles,
        x_scale=jnp.asarray(sx), scale=jnp.asarray(scale),
        bias=jnp.asarray(bias), occ=occp,
        residual=_margined_i8(qres), res_x_scale=jnp.asarray(sres),
        out_scale=jnp.asarray(so), relu_out=True,
        tile_shape=ts, group=group, interpret=True,
    ), cout).astype(np.float32)

    wq, sw = _quant_weights(w, sx)
    acc = _dense_ref(q, wq, 3)
    y = (acc * (sw * scale / so) + bias / so) * occ_grid[..., None] \
        + qres * (sres / so)
    want = np.clip(np.round(y), 0, 127)
    for t in np.asarray(tiles):
        sl = _tile_slices(t, ts)
        diff = np.abs(got[sl] - want[sl])
        assert diff.max() <= 1, diff.max()  # round-to-even boundary slack
        assert (diff > 0).mean() < 0.02


def test_bf16_in_int8_out_boundary(rng):
    """The segment-entry conv: bf16 input grid, int8 requantized output,
    with a bf16 residual (the /out_scale fold rides the res_deq vector)."""
    q, _sx, w, ts, group, tiles, occ_grid, occp = _setup(rng)
    x = q * 0.01  # treat as real values
    cout = w.shape[-1]
    scale = rng.rand(cout).astype(np.float32) + 0.5
    bias = rng.randn(cout).astype(np.float32) * 0.1
    so = (rng.rand(cout).astype(np.float32) + 0.5) * 0.05
    res = rng.randn(*x.shape[:3], cout).astype(np.float32) * 0.5

    got = _interior(tiled_conv3d(
        _margined(x).astype(jnp.float32), jnp.asarray(w), tiles,
        scale=jnp.asarray(scale), bias=jnp.asarray(bias), occ=occp,
        residual=_margined(res).astype(jnp.float32),
        out_scale=jnp.asarray(so), relu_out=True,
        tile_shape=ts, group=group, interpret=True,
    ), cout).astype(np.float32)

    acc = _dense_ref(x, w, 3)
    y = (acc * (scale / so) + bias / so) * occ_grid[..., None] + res / so
    want = np.clip(np.round(y), 0, 127)
    for t in np.asarray(tiles):
        sl = _tile_slices(t, ts)
        diff = np.abs(got[sl] - want[sl])
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 0.02


def test_int8_fused_downsample_residual(rng):
    """int8 residual through the fused quantized 1x1 downsample branch."""
    q, sx, w, ts, group, tiles, occ_grid, occp = _setup(rng)
    cin, cout = w.shape[1], w.shape[-1]
    scale = rng.rand(cout).astype(np.float32) + 0.5
    bias = rng.randn(cout).astype(np.float32) * 0.1
    rw = rng.randn(cin, cout).astype(np.float32) * 0.3
    rs = rng.rand(cout).astype(np.float32) + 0.5
    rb = rng.randn(cout).astype(np.float32) * 0.1

    got = _interior(tiled_conv3d(
        _margined_i8(q), jnp.asarray(w), tiles,
        x_scale=jnp.asarray(sx), scale=jnp.asarray(scale),
        bias=jnp.asarray(bias), occ=occp,
        residual=_margined_i8(q), res_w=jnp.asarray(rw),
        res_x_scale=jnp.asarray(sx),
        res_scale=jnp.asarray(rs), res_bias=jnp.asarray(rb),
        relu_out=True, tile_shape=ts, group=group,
        out_dtype=jnp.float32, interpret=True,
    ), cout).astype(np.float32)

    wq, sw = _quant_weights(w, sx)
    acc = _dense_ref(q, wq, 3)
    rw_t = jnp.asarray(rw).astype(jnp.float32) * jnp.asarray(sx)[:, None]
    srw_j = jnp.maximum(jnp.max(jnp.abs(rw_t), axis=0), 1e-12) / 127.0
    rwq = np.asarray(
        jnp.clip(jnp.round(rw_t / srw_j[None, :]), -127, 127), np.float32)
    srw = np.asarray(srw_j, np.float32)
    ds = ((q @ rwq.astype(np.float32)) * (srw * rs).astype(np.float32)
          + rb) * occ_grid[..., None]
    want = np.maximum(
        (acc * (sw * scale) + bias) * occ_grid[..., None] + ds, 0.0)
    for t in np.asarray(tiles):
        sl = _tile_slices(t, ts)
        np.testing.assert_allclose(got[sl], want[sl], rtol=2e-5, atol=2e-4)
