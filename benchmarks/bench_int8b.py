"""TPU diagnostic 12b: int8 vs bf16 MXU throughput, hoist-proof.

bench_int8.py's fori_loop body was loop-invariant (same x, w every
iteration) and Mosaic hoisted the dot out of the loop — it reported
~1100 TOP/s, 5x the v5e's 197 TFLOP/s bf16 peak, i.e. it measured one
matmul amortized over 64 "iterations". This version chains the matmuls
(z = cast(dot(z, w))) so every iteration's MXU work is on the critical
path, and cross-checks with a plain XLA jnp.dot at large square shapes.

Usage: python benchmarks/bench_int8b.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _chain_kernel(x_ref, w_ref, o_ref, *, n_iter, in_dt, acc_dt):
    def body(i, z):
        y = jax.lax.dot_general(
            z, w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dt,
        )
        # renormalize to keep int8 in range / bf16 finite; cheap VPU pass
        if in_dt == jnp.int8:
            return (y & 1).astype(in_dt)
        return (y * 1e-3).astype(in_dt)

    z = jax.lax.fori_loop(0, n_iter, body, x_ref[...])
    o_ref[...] = z.astype(acc_dt)


def run_pallas(in_dt, acc_dt, M, K, n_iter=32):
    x = jnp.ones((M, K), in_dt)
    w = jnp.ones((K, K), in_dt)
    f = pl.pallas_call(
        functools.partial(_chain_kernel, n_iter=n_iter, in_dt=in_dt,
                          acc_dt=acc_dt),
        out_shape=jax.ShapeDtypeStruct((M, K), acc_dt),
    )
    import numpy as np

    g = jax.jit(lambda a, b: f(a, b))
    np.asarray(g(x, w))[0, 0]  # real sync barrier through the relay
    t0 = time.perf_counter()
    for _ in range(10):
        r = g(x, w)
    np.asarray(r)[0, 0]
    dt = (time.perf_counter() - t0) / 10
    flops = 2 * M * K * K * n_iter
    print(f"pallas chain {in_dt.__name__:9s} {M}x{K}x{K}: {dt*1e3:8.3f} ms "
          f"{flops/dt/1e12:7.1f} TOP/s", flush=True)


def run_xla(in_dt, acc_dt, n=4096, reps=8):
    ks = [jnp.array(jax.random.randint(jax.random.PRNGKey(i), (n, n), -4, 4),
                    in_dt) if in_dt == jnp.int8 else
          jnp.array(jax.random.normal(jax.random.PRNGKey(i), (n, n)), in_dt)
          for i in range(2)]

    @jax.jit
    def g(a, b):
        z = a
        for _ in range(reps):
            y = jax.lax.dot_general(
                z, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_dt)
            z = (y & 3).astype(in_dt) if in_dt == jnp.int8 \
                else (y * 1e-3).astype(in_dt)
        return z

    import numpy as np

    # block_until_ready does not block through the axon relay — a true
    # value fetch is the only sync barrier (see bench.py docstring)
    np.asarray(g(*ks)[0, 0])
    t0 = time.perf_counter()
    for _ in range(5):
        r = g(*ks)
    np.asarray(r[0, 0])
    dt = (time.perf_counter() - t0) / 5
    flops = 2 * n * n * n * reps
    print(f"xla chain    {in_dt.__name__:9s} {n}^3 x{reps}: {dt*1e3:8.3f} ms "
          f"{flops/dt/1e12:7.1f} TOP/s", flush=True)


def main():
    for in_dt, acc_dt in [(jnp.bfloat16, jnp.float32), (jnp.int8, jnp.int32)]:
        try:
            # (1024, 512, 512): x 1 MB + w 0.5 MB + acc 2 MB fits the 16 MB
            # scoped-vmem limit (2048x1152 OOMed it)
            run_pallas(in_dt, acc_dt, 1024, 512, n_iter=64)
        except Exception as e:
            print(f"pallas {in_dt.__name__}: FAILED: {type(e).__name__}: {e}",
                  flush=True)
    for in_dt, acc_dt in [(jnp.bfloat16, jnp.float32), (jnp.int8, jnp.int32)]:
        try:
            run_xla(in_dt, acc_dt)
        except Exception as e:
            print(f"xla {in_dt.__name__}: FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
