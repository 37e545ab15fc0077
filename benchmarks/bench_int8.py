"""TPU diagnostic 12: int8 MXU matmul primitive inside Pallas.

Gates any int8 conv-path work: measures (int8, int8) -> int32 dot_general
vs bf16 at the tiled-conv kernel's matmul shape. Usage:
python benchmarks/bench_int8.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(x_ref, w_ref, o_ref, *, n_iter, out_dt):
    def body(i, acc):
        return acc + jax.lax.dot_general(
            x_ref[...], w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=out_dt,
        )
    o_ref[...] = jax.lax.fori_loop(
        0, n_iter, body, jnp.zeros(o_ref.shape, out_dt))


def run(dt_in, out_dt, M, K, N, n_iter=64):
    x = jnp.ones((M, K), dt_in)
    w = jnp.ones((K, N), dt_in)
    f = pl.pallas_call(
        functools.partial(_mm_kernel, n_iter=n_iter, out_dt=out_dt),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dt),
    )
    g = jax.jit(lambda a, b: f(a, b))
    r = jax.block_until_ready(g(x, w))
    t0 = time.perf_counter()
    for _ in range(10):
        r = g(x, w)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 10
    flops = 2 * M * K * N * n_iter
    print(f"{dt_in.__name__:9s} {M}x{K}x{N}: {dt * 1e3:7.3f} ms  "
          f"{flops / dt / 1e12:7.1f} TOP/s", flush=True)


def main():
    # the L0 conv kernel's matmul shape: rows=2048 (G=64 x 32 cells),
    # K=1152 (9 taps x 128 lanes), N=128
    for dt_in, out_dt in [(jnp.bfloat16, jnp.float32),
                          (jnp.int8, jnp.int32)]:
        try:
            run(dt_in, out_dt, 2048, 1152, 128)
        except Exception as e:
            print(f"{dt_in.__name__}: FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
