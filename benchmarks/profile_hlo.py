import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from canonicalvoting_tpu.data.geometry import NCLASSES
from canonicalvoting_tpu.data.synthetic import make_scene
from canonicalvoting_tpu.eval.pipeline import DetectionPipeline, slice_joint_heads
from canonicalvoting_tpu.models import MinkUNet34C
from canonicalvoting_tpu.ops.hough_voting import hough_voting
from canonicalvoting_tpu.decode.peeling import PeelConfig

rng = np.random.RandomState(0)
scene = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                   n_boxes=6, pts_per_box=3000)
model = MinkUNet34C(3, 6 * NCLASSES + NCLASSES + 1)
pipe = DetectionPipeline(model=model, variables=None, res=0.03, num_rots=120,
                         peel=PeelConfig(res=0.03), cap_multiple=8192, backbone="dense")
args = pipe.prepare_scene(scene.points, scene.rgb)
(_, feats, flat, valid, coords_w, grid_shape, dense_dims,
     _tiles, _rs, _rt) = args
dm = pipe._dense_model
variables = jax.jit(lambda r, f, fi, v: dm.init(r, f, fi, v, tuple(dense_dims), False))(
    jax.random.PRNGKey(0), feats, flat, valid)

def heads_vote(out, cw, v):
    xyz, scale, class_pred, prob = slice_joint_heads(out)
    scale = jnp.exp(scale)
    return hough_voting(cw, xyz, scale, prob, res=0.03, num_rots=120,
                        grid_shape=grid_shape, valid=v)

def bb_vote(vs, f, fi, v, cw):
    out = dm.apply(vs, f, fi, v, tuple(dense_dims), False)
    return heads_vote(out, cw, v)

def bb_vote_indep(vs, f, fi, v, cw, xyz2, scale2, prob2):
    out = dm.apply(vs, f, fi, v, tuple(dense_dims), False)
    go, gr, gs = hough_voting(cw, xyz2, scale2, prob2, res=0.03, num_rots=120,
                              grid_shape=grid_shape, valid=v)
    return jnp.sum(out), go, gr, gs

n = feats.shape[0]
xyz2, scale2, prob2 = (np.random.randn(n,3).astype(np.float32),
                       np.abs(np.random.randn(n,3).astype(np.float32)),
                       np.random.rand(n).astype(np.float32))

for name, fn, a in [("dep", bb_vote, (variables, feats, flat, valid, coords_w)),
                    ("indep", bb_vote_indep, (variables, feats, flat, valid, coords_w, xyz2, scale2, prob2))]:
    c = jax.jit(fn).lower(*a).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list): ca = ca[0]
    print(name, "flops=%.3g" % ca.get("flops", -1),
          "bytes=%.3g" % ca.get("bytes accessed", -1))
    txt = c.as_text()
    import re
    convs = len(re.findall(r"custom-call.*convolution|convolution\(", txt))
    sorts = len(re.findall(r"sort\(", txt))
    gathers = len(re.findall(r"gather\(", txt))
    print(f"  convs={convs} sorts={sorts} gathers={gathers} hlo_len={len(txt)}")
    open(f"/tmp/hlo_{name}.txt", "w").write(txt)
