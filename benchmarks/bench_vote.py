"""A/B the plane-splat across vote-grid bucket shapes."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from canonicalvoting_tpu.data.synthetic import make_scene
from canonicalvoting_tpu.ops.hough_voting import hough_voting
from canonicalvoting_tpu.ops.voxelize import sparse_quantize

@jax.jit
def _red(t):
    return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(t))

def timeit(fn, *a, iters=5):
    np.asarray(_red(fn(*a)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    np.asarray(_red(out))
    return (time.perf_counter() - t0) / iters * 1000

rng = np.random.RandomState(0)
scene = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                   n_boxes=6, pts_per_box=3000)
coords, idx = sparse_quantize(scene.points, 0.03)
n = len(coords)
cap = 65536
cw = np.zeros((cap, 3), np.float32); cw[:n] = coords * 0.03
valid = np.zeros((cap,), np.float32); valid[:n] = 1
xyz = rng.randn(cap, 3).astype(np.float32) * 0.3
scl = (np.abs(rng.randn(cap, 3)) * 0.3 + 0.2).astype(np.float32)
prob = rng.rand(cap).astype(np.float32)
cw, valid, xyz, scl, prob = jax.device_put((cw, valid, xyz, scl, prob))

for gs in [(224, 96, 256), (256, 96, 256), (256, 128, 256), (224, 128, 256)]:
    def vote(cw, xyz, scl, prob, valid, gs=gs):
        return hough_voting(cw, xyz, scl, prob, res=0.03, num_rots=120,
                            grid_shape=gs, valid=valid)
    t = timeit(jax.jit(vote), cw, xyz, scl, prob, valid)
    print(f"grid {gs}: {t:7.1f} ms")
