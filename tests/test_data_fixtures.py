"""Real-format data fixtures: binary-LE PLY + Scan2CAD-style JSON/pickle.

The dataset tests elsewhere drive synthetic cfg paths; these write genuine
on-disk artifacts in the reference's file formats and run the readers and
both ScanNet datasets end-to-end on them:

  * a binary_little_endian PLY in the ``_vh_clean_2.ply`` layout — vertex
    element (x/y/z float + red/green/blue/alpha uchar) followed by a face
    element with a ``property list uchar int vertex_indices``
    (reference: utils/dataloader.py:123-135 reads it via plyfile);
  * ``full_annotations.json`` (Scan2CAD) with 2 aligned models, a split
    txt, and a per-scan segments pickle (reference: utils/dataloader.py:
    92-97, train_joint.py:208).
"""

import json
import pickle

import numpy as np
import pytest

from canonicalvoting_tpu.data.ply import read_ply_vertices


def _write_binary_ply(path, pts, rgb, faces, face_first=False):
    """A genuine binary-little-endian PLY with a list-typed face element."""
    n, m = len(pts), len(faces)
    vertex_hdr = (
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "property uchar alpha\n"
    )
    face_hdr = (
        f"element face {m}\n"
        "property list uchar int vertex_indices\n"
    )
    order = face_hdr + vertex_hdr if face_first else vertex_hdr + face_hdr
    header = "ply\nformat binary_little_endian 1.0\n" + order + "end_header\n"

    vdt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                    ("red", "u1"), ("green", "u1"), ("blue", "u1"),
                    ("alpha", "u1")])
    varr = np.zeros(n, vdt)
    varr["x"], varr["y"], varr["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
    varr["red"], varr["green"], varr["blue"] = rgb.T
    varr["alpha"] = 255

    fbytes = b"".join(
        np.uint8(len(f)).tobytes() + np.asarray(f, "<i4").tobytes()
        for f in faces
    )
    with open(path, "wb") as fh:
        fh.write(header.encode("ascii"))
        if face_first:
            fh.write(fbytes)
            fh.write(varr.tobytes())
        else:
            fh.write(varr.tobytes())
            fh.write(fbytes)


@pytest.fixture
def ply_scene(rng):
    pts = rng.uniform(0, 2, (500, 3)).astype(np.float32)
    rgb = rng.randint(0, 256, (500, 3)).astype(np.uint8)
    faces = [[i, i + 1, i + 2] for i in range(0, 60, 3)]
    return pts, rgb, faces


def test_read_binary_ply_vertex_then_face(tmp_path, ply_scene):
    pts, rgb, faces = ply_scene
    path = str(tmp_path / "scene0000_00_vh_clean_2.ply")
    _write_binary_ply(path, pts, rgb, faces)
    v = read_ply_vertices(path)
    np.testing.assert_allclose(
        np.stack([v["x"], v["y"], v["z"]], -1), pts, atol=0)
    np.testing.assert_array_equal(
        np.stack([v["red"], v["green"], v["blue"]], -1), rgb)
    assert v["alpha"].dtype == np.uint8 and np.all(v["alpha"] == 255)


def test_read_binary_ply_face_element_first(tmp_path, ply_scene):
    """The reader must skip a variable-length list element that precedes
    the vertex element (exercises the row-walk skip path)."""
    pts, rgb, faces = ply_scene
    path = str(tmp_path / "weird_order.ply")
    _write_binary_ply(path, pts, rgb, faces, face_first=True)
    v = read_ply_vertices(path)
    np.testing.assert_allclose(
        np.stack([v["x"], v["y"], v["z"]], -1), pts, atol=0)


def _quat_about_y(angle):
    return [np.cos(angle / 2), 0.0, np.sin(angle / 2), 0.0]  # (w, x, y, z)


@pytest.fixture
def scan2cad_tree(tmp_path, rng, ply_scene):
    """A miniature ScanNet+Scan2CAD data tree: scans/<id>/<id>_vh_clean_2.ply,
    full_annotations.json (2 aligned models), split txts, segments pickle."""
    pts, rgb, faces = ply_scene
    id_scan = "scene0000_00"
    scandir = tmp_path / "scans" / id_scan
    scandir.mkdir(parents=True)
    _write_binary_ply(str(scandir / f"{id_scan}_vh_clean_2.ply"),
                      pts, rgb, faces)

    # two boxes' worth of points: rows 0..99 model A (chair, top8), rows
    # 100..179 model B (wnid not in top8 -> class 'others' = 0)
    seg_a = list(range(0, 100))
    seg_b = list(range(100, 180))
    annotation = {
        "id_scan": id_scan,
        "trs": {
            "translation": [0.1, -0.2, 0.05],
            "rotation": _quat_about_y(0.3),
            "scale": [1.0, 1.0, 1.0],
        },
        "aligned_models": [
            {
                "catid_cad": "03001627",  # chair (top-8)
                "id_cad": "0000",
                "sym": "__SYM_NONE",
                "trs": {
                    "translation": [0.5, 0.4, 0.6],
                    "rotation": _quat_about_y(-0.7),
                    "scale": [0.8, 1.1, 0.9],
                },
                "center": [0.05, -0.02, 0.0],
                "bbox": [0.4, 0.5, 0.45],
            },
            {
                "catid_cad": "99999999",  # not in top8 -> idx 0 (others)
                "id_cad": "0001",
                "sym": "__SYM_ROTATE_UP_4",
                "trs": {
                    "translation": [1.4, 0.3, 1.2],
                    "rotation": _quat_about_y(1.1),
                    "scale": [1.2, 0.9, 1.0],
                },
                "center": [0.0, 0.01, -0.03],
                "bbox": [0.3, 0.6, 0.35],
            },
        ],
    }
    with open(tmp_path / "full_annotations.json", "w") as f:
        json.dump([annotation], f)
    for split in ("train.txt", "val.txt"):
        with open(tmp_path / split, "w") as f:
            f.write(id_scan + "\n")
    with open(tmp_path / "segments.pkl", "wb") as f:
        pickle.dump({id_scan: [seg_a, seg_b]}, f)

    from canonicalvoting_tpu.config import Config

    cfg = Config()
    cfg.data.scan2cad = str(tmp_path / "full_annotations.json")
    cfg.data.scannet = str(tmp_path)
    cfg.data.train_split = str(tmp_path / "train.txt")
    cfg.data.val_split = str(tmp_path / "val.txt")
    cfg.data.train_segments = str(tmp_path / "segments.pkl")
    cfg.data.val_segments = str(tmp_path / "segments.pkl")
    return cfg, pts, (seg_a, seg_b), annotation


def test_joint_dataset_on_real_format_files(scan2cad_tree):
    from canonicalvoting_tpu.data.geometry import (
        NCLASSES,
        apply_trans,
        calc_Mbbox,
        get_top8_classes_mapping,
        make_M_from_tqs,
    )
    from canonicalvoting_tpu.data.scannet import ScanNetXYZProbMultiDataset

    cfg, pts, (seg_a, seg_b), ann = scan2cad_tree
    ds = ScanNetXYZProbMultiDataset(cfg, training=False, augment=False)
    assert len(ds) == 1
    id_scan, coords, feats, xyz, scale, cls = ds[0]
    assert id_scan == ann["id_scan"]
    n = len(coords)
    assert feats.shape == (n, 3) and xyz.shape == (n, 3)
    assert scale.shape == (n, 3) and cls.shape == (n,)

    # label math oracle: recompute one model-A point's LCC by hand
    Mscan = make_M_from_tqs(ann["trs"]["translation"],
                            ann["trs"]["rotation"], ann["trs"]["scale"])
    world = apply_trans(pts.astype(np.float64), Mscan).astype(np.float32)
    catmap = get_top8_classes_mapping()

    from canonicalvoting_tpu.ops.voxelize import sparse_quantize

    _, idx = sparse_quantize(world, cfg.scannet_res)
    back = {int(j): i for i, j in enumerate(idx)}
    model_a = ann["aligned_models"][0]
    Mbbox = calc_Mbbox(model_a)
    hit = False
    for src in seg_a:
        if src in back:
            row = back[src]
            want = apply_trans(world[src:src + 1].astype(np.float64),
                               np.linalg.inv(Mbbox))[0]
            np.testing.assert_allclose(xyz[row], want, atol=1e-4)
            assert cls[row] == catmap[model_a["catid_cad"]]
            hit = True
            break
    assert hit, "no model-A point survived quantization"
    # model-B rows carry class 0 (others); background rows NCLASSES
    b_rows = [back[s] for s in seg_b if s in back]
    assert b_rows and all(cls[r] == 0 for r in b_rows)
    bg = [back[int(j)] for j in idx
          if int(j) not in set(seg_a) | set(seg_b) and int(j) in back]
    assert bg and all(cls[r] == NCLASSES for r in bg)


def test_sym_dataset_on_real_format_files(scan2cad_tree):
    from canonicalvoting_tpu.data.scannet import ScanNetXYZProbSymDataset
    from canonicalvoting_tpu.train.losses import SYM_CODES

    cfg, _, _, ann = scan2cad_tree
    cfg.category = "all"
    ds = ScanNetXYZProbSymDataset(cfg, training=False, augment=False)
    (id_scan, coords, feats, base_xyz, scale, obj, cls, obj_id,
     sym_codes) = ds[0]
    assert id_scan == ann["id_scan"]
    assert len(sym_codes) == 2
    assert sym_codes[1] == SYM_CODES["__SYM_ROTATE_UP_4"]
    assert obj.max() == 1 and obj_id.max() == 1
    # objectness rows match assigned object ids
    np.testing.assert_array_equal(obj > 0, obj_id >= 0)
