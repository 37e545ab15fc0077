"""Bisect the fused-graph overhead: time partial fusions."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from canonicalvoting_tpu.data.geometry import NCLASSES
from canonicalvoting_tpu.data.synthetic import make_scene
from canonicalvoting_tpu.decode.peeling import PeelConfig, peel_boxes
from canonicalvoting_tpu.eval.pipeline import DetectionPipeline, slice_joint_heads
from canonicalvoting_tpu.models import MinkUNet34C
from canonicalvoting_tpu.ops.hough_voting import hough_voting

@jax.jit
def _reduce(tree):
    return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(tree))

def fetch(x):
    np.asarray(jax.device_get(_reduce(x)))

def timeit(fn, *args, iters=5, **kw):
    fetch(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    fetch(out)
    return (time.perf_counter() - t0) / iters * 1000.0

rng = np.random.RandomState(0)
scene = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                   n_boxes=6, pts_per_box=3000)
model = MinkUNet34C(3, 6 * NCLASSES + NCLASSES + 1)
pipe = DetectionPipeline(model=model, variables=None, res=0.03, num_rots=120,
                         peel=PeelConfig(res=0.03, max_boxes=64, max_iters=96),
                         cap_multiple=8192, backbone="dense")
args = pipe.prepare_scene(scene.points, scene.rgb)
_, feats, flat, valid, coords_w, grid_shape, dense_dims, _tiles = args
dm = pipe._dense_model
variables = jax.jit(lambda r, f, fi, v: dm.init(r, f, fi, v, tuple(dense_dims), False))(
    jax.random.PRNGKey(0), feats, flat, valid)
cfg = pipe.peel
pipe.variables = variables

def heads_vote(out, coords_w, valid):
    xyz, scale, class_pred, prob = slice_joint_heads(out)
    scale = jnp.exp(scale)
    return hough_voting(coords_w, xyz, scale, prob, res=0.03, num_rots=120,
                        grid_shape=grid_shape, valid=valid)

@jax.jit
def bb_vote(vs, f, fi, v, cw):
    out = dm.apply(vs, f, fi, v, tuple(dense_dims), False)
    return heads_vote(out, cw, v)

@jax.jit
def vote_peel(out, cw, v):
    go, gr, gs = heads_vote(out, cw, v)
    xyz, scale, class_pred, prob = slice_joint_heads(out)
    corner = jnp.min(jnp.where(v[:, None] > 0, cw, jnp.float32(3e38)), axis=0)
    return peel_boxes(go, gr, gs, cw, xyz, prob, class_pred, corner, cfg, valid=v)

fwd = jax.jit(lambda vs, f, fi, v: dm.apply(vs, f, fi, v, tuple(dense_dims), False))
out = fwd(variables, feats, flat, valid)
out = jax.device_put(out)

print("backbone alone :", round(timeit(fwd, variables, feats, flat, valid), 1))
print("backbone+vote  :", round(timeit(bb_vote, variables, feats, flat, valid, coords_w), 1))
print("vote+peel      :", round(timeit(vote_peel, out, coords_w, valid), 1))
print("fused total    :", round(timeit(lambda: pipe.run_scene(args), iters=3), 1))

# variant A: vote consumes independent inputs inside the same program
@jax.jit
def bb_vote_indep(vs, f, fi, v, cw, xyz2, scale2, prob2):
    out = dm.apply(vs, f, fi, v, tuple(dense_dims), False)
    go, gr, gs = hough_voting(cw, xyz2, scale2, prob2, res=0.03, num_rots=120,
                              grid_shape=grid_shape, valid=v)
    return jnp.sum(out), go, gr, gs

n = feats.shape[0]
xyz2 = jax.device_put(np.random.randn(n, 3).astype(np.float32) * 0.2)
scale2 = jax.device_put(np.abs(np.random.randn(n, 3)).astype(np.float32) * 0.3 + 0.2)
prob2 = jax.device_put(np.random.rand(n).astype(np.float32))
print("bb+vote indep  :", round(timeit(bb_vote_indep, variables, feats, flat,
                                       valid, coords_w, xyz2, scale2, prob2), 1))

# variant B: two separate jit calls, dependency through device array
def two_calls(vs, f, fi, v, cw):
    out = fwd(vs, f, fi, v)
    return heads_vote_j(out, cw, v)
heads_vote_j = jax.jit(heads_vote)
print("two-call chain :", round(timeit(two_calls, variables, feats, flat, valid, coords_w), 1))

# variant C: optimization barrier between backbone and vote
@jax.jit
def bb_vote_barrier(vs, f, fi, v, cw):
    out = dm.apply(vs, f, fi, v, tuple(dense_dims), False)
    out = jax.lax.optimization_barrier(out)
    return heads_vote(out, cw, v)
print("bb+vote barrier:", round(timeit(bb_vote_barrier, variables, feats, flat, valid, coords_w), 1))

from canonicalvoting_tpu.ops.hough_voting import compute_corners, grid_dims_from_corners

@jax.jit
def bb_heads(vs, f, fi, v):
    out = dm.apply(vs, f, fi, v, tuple(dense_dims), False)
    xyz, scale, class_pred, prob = slice_joint_heads(out)
    return jnp.sum(xyz), jnp.sum(scale), jnp.sum(prob)
print("bb+heads       :", round(timeit(bb_heads, variables, feats, flat, valid), 1))

@jax.jit
def bb_heads_sort(vs, f, fi, v, cw):
    out = dm.apply(vs, f, fi, v, tuple(dense_dims), False)
    xyz, scale, class_pred, prob = slice_joint_heads(out)
    scale = jnp.exp(scale)
    corr = xyz * scale
    cy = (cw[:, 1] - corr[:, 1]) / jnp.float32(0.03)
    key = jnp.floor(cy).astype(jnp.int32)
    order = jnp.argsort(key)
    data = jnp.concatenate([cw, corr, scale, prob[:, None]], axis=1)
    data = data[order]
    return jnp.sum(data)
print("bb+heads+sort  :", round(timeit(bb_heads_sort, variables, feats, flat, valid, coords_w), 1))
