"""TPU diagnostic 12c: int8 vs bf16 at the EXACT tiled-conv matmul shape,
hoist-proof (output feeds back into the operand's first lanes each
iteration, so no matmul can leave the loop).

Per iteration: y = x @ w  with x (2048, 1152), w (1152, 128) — the L0 conv
kernel's per-dx shape — then x[:, :128] <- f(y). Reports ms per matmul and
effective TOP/s; the bf16/int8 ratio is the go/no-go for an int8 conv mode.

Usage: python benchmarks/bench_int8c.py
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


M, K, N = 2048, 1152, 128
N_ITER = 100


def _kernel(x_ref, w_ref, o_ref, *, in_dt, acc_dt):
    # hoist-proof: x_ref is (M + 8, K) and each iteration reads a dynamic
    # 8-aligned sublane-offset (M, K) window ((i % 2) * 8), so no matmul is
    # loop-invariant. (Earlier revisions: an (M, K) concat feedback measured
    # the 4.7 MB VPU copy instead of the MXU; scalar weight perturbation and
    # a dynamic (2, K, N) weight slice both crashed the remote compile
    # helper.)
    w = w_ref[...]

    def body(i, acc):
        xi = x_ref[pl.ds((i % 2) * 8, M), :]
        return acc + jax.lax.dot_general(
            xi, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dt,
        )

    o_ref[...] = jax.lax.fori_loop(
        0, N_ITER, body, jnp.zeros((M, N), acc_dt))


def run(in_dt, acc_dt):
    if in_dt == jnp.int8:
        x = jnp.array(np.random.randint(-4, 4, (M + 8, K)), in_dt)
        w = jnp.array(np.random.randint(-4, 4, (K, N)), in_dt)
    else:
        x = jnp.array(np.random.randn(M + 8, K), in_dt)
        w = jnp.array(np.random.randn(K, N), in_dt)
    f = pl.pallas_call(
        functools.partial(_kernel, in_dt=in_dt, acc_dt=acc_dt),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_dt),
    )
    g = jax.jit(lambda a, b: f(a, b))
    np.asarray(g(x, w))[0, 0]  # real sync through the relay
    t0 = time.perf_counter()
    for _ in range(5):
        r = g(x, w)
    np.asarray(r)[0, 0]
    dt = (time.perf_counter() - t0) / 5 / N_ITER
    flops = 2 * M * K * N
    print(f"{in_dt.__name__:9s} {M}x{K}x{N}: {dt*1e6:8.2f} us/matmul  "
          f"{flops/dt/1e12:6.1f} TOP/s", flush=True)
    return dt


def main():
    t_bf16 = run(jnp.bfloat16, jnp.float32)
    t_int8 = run(jnp.int8, jnp.int32)
    print(f"int8 speedup over bf16: {t_bf16 / t_int8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
