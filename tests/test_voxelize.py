import numpy as np

from canonicalvoting_tpu.ops.voxelize import (
    batched_coordinates,
    pad_to_bucket,
    sparse_quantize,
)


def test_sparse_quantize_unique_and_first(rng):
    pts = rng.uniform(-2, 2, (500, 3)).astype(np.float32)
    pts[100:200] = pts[:100]  # exact duplicates
    coords, idx = sparse_quantize(pts, quantization_size=0.1)
    # unique voxels
    assert len(np.unique(coords.view([("", coords.dtype)] * 3))) == len(coords)
    # coords are floors of the selected points
    np.testing.assert_array_equal(
        coords, np.floor(pts[idx] / 0.1).astype(np.int32)
    )
    # each selected index is the first point of its voxel
    vox = np.floor(pts / 0.1).astype(np.int64)
    for c, i in zip(coords[:20], idx[:20]):
        matches = np.where(np.all(vox == c, axis=1))[0]
        assert i == matches.min()


def test_sparse_quantize_negative_coords():
    pts = np.array([[-0.05, -0.05, -0.05], [0.05, 0.05, 0.05]], np.float32)
    coords, idx = sparse_quantize(pts, quantization_size=0.1)
    assert set(map(tuple, coords.tolist())) == {(-1, -1, -1), (0, 0, 0)}


def test_batched_coordinates():
    a = np.zeros((3, 3), np.int32)
    b = np.ones((2, 3), np.int32)
    out = batched_coordinates([a, b])
    assert out.shape == (5, 4)
    assert list(out[:, 0]) == [0, 0, 0, 1, 1]


def test_pad_to_bucket():
    assert pad_to_bucket(100, (128, 256)) == 128
    assert pad_to_bucket(129, (128, 256)) == 256
    assert pad_to_bucket(300, (128, 256)) == 512
