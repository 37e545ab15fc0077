"""DataLoader ingest-rate benchmark: thread vs process workers.

Real training needs >= 10 scenes/s of host-side ingest (PLY-scale point
generation + label math + quantization + pyramid building) to keep the
device fed (BASELINE.md throughput target). The reference uses 10 process
workers (train_joint.py:211); this measures our loader's scenes/s in both
modes on a ScanNet-scale synthetic __getitem__.

Usage: python benchmarks/bench_loader.py [n_scenes] [workers]
"""

import sys
import time

import numpy as np

from canonicalvoting_tpu.data.collate import collate_joint
from canonicalvoting_tpu.data.loader import DataLoader


class SyntheticScanNetCost:
    """__getitem__ does work comparable to ScanNetXYZProbMultiDataset:
    generate ~120k raw points, label math, quantize to ~50-60k voxels."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        from canonicalvoting_tpu.data.synthetic import make_scene
        from canonicalvoting_tpu.ops.voxelize import sparse_quantize

        rng = np.random.RandomState(i)
        scene = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                           n_boxes=6, pts_per_box=3000)
        coords, idx = sparse_quantize(scene.points, 0.03)
        return (
            f"s{i}", coords, scene.rgb[idx], scene.xyz_labels[idx],
            scene.scale_labels[idx], scene.class_labels[idx],
        )


def run(mode, n_scenes, workers, collate="joint"):
    from canonicalvoting_tpu.data.collate import collate_joint_dense

    ds = SyntheticScanNetCost(n_scenes)
    cfn = collate_joint if collate == "joint" else collate_joint_dense
    loader = DataLoader(
        ds, batch_size=3,
        collate_fn=lambda it: cfn(it, cap_multiple=8192),
        shuffle=False, num_workers=workers, drop_last=False,
        workers_mode=mode,
    )
    # warm the pool (first batch pays process spawn)
    it = iter(loader)
    next(it)
    t0 = time.time()
    n = 3  # first batch consumed above
    for batch in it:
        n += len(batch["meta"]["ids"])
    dt = time.time() - t0
    loader.close()
    rate = (n - 3) / dt
    print(f"{mode:8s}/{collate:5s} workers={workers}: {rate:6.2f} scenes/s "
          f"({n - 3} scenes, {dt:.2f}s)")
    return rate


if __name__ == "__main__":
    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 36
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    run("thread", n_scenes, workers)
    run("process", n_scenes, workers)
    run("process", n_scenes, workers, collate="dense")
