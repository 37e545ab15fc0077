import numpy as np

from canonicalvoting_tpu.data.geometry import (
    apply_trans,
    calc_Mbbox,
    make_M_from_tqs,
    num_symmetry_hypotheses,
    quat_to_rotmat,
    roty,
    symmetry_matrices,
    unit_box_corners,
)


def test_quat_identity():
    np.testing.assert_allclose(quat_to_rotmat([1, 0, 0, 0]), np.eye(3), atol=1e-12)


def test_quat_90deg_z():
    # 90 deg about z: (w, x, y, z) = (cos45, 0, 0, sin45)
    q = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
    R = quat_to_rotmat(q)
    np.testing.assert_allclose(R @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-12)


def test_make_M_from_tqs_composition():
    t = [1.0, 2.0, 3.0]
    q = [1.0, 0, 0, 0]
    s = [2.0, 2.0, 2.0]
    M = make_M_from_tqs(t, q, s)
    p = np.array([[1.0, 0.0, 0.0]])
    np.testing.assert_allclose(apply_trans(p, M), [[3.0, 2.0, 3.0]], atol=1e-12)


def test_calc_Mbbox_golden():
    """Golden check: a unit box at center c scaled by s translated by t."""
    model = {
        "trs": {
            "translation": [1.0, 0.0, 0.0],
            "rotation": [1.0, 0.0, 0.0, 0.0],
            "scale": [2.0, 2.0, 2.0],
        },
        "bbox": [0.5, 0.5, 0.5],
        "center": [0.0, 1.0, 0.0],
    }
    M = calc_Mbbox(model)
    # canonical corner (1,1,1) -> scale bbox (0.5) -> +center -> *2 -> +t
    p = np.array([[1.0, 1.0, 1.0]])
    np.testing.assert_allclose(apply_trans(p, M), [[2.0, 3.0, 1.0]], atol=1e-12)
    # LCC round trip
    world = apply_trans(p, M)
    back = apply_trans(world, np.linalg.inv(M))
    np.testing.assert_allclose(back, p, atol=1e-10)


def test_symmetry_counts():
    assert num_symmetry_hypotheses("__SYM_NONE") == 1
    assert num_symmetry_hypotheses("__SYM_ROTATE_UP_2") == 2
    assert num_symmetry_hypotheses("__SYM_ROTATE_UP_4") == 4
    assert num_symmetry_hypotheses("__SYM_ROTATE_UP_INF") == 36
    assert num_symmetry_hypotheses("whatever") == 1


def test_symmetry_matrices_rotate_in_place():
    M = np.eye(4)
    mats = symmetry_matrices(M, "__SYM_ROTATE_UP_2")
    assert len(mats) == 2
    np.testing.assert_allclose(mats[1], roty(np.pi), atol=1e-12)


def test_unit_box_corners_layout():
    c = unit_box_corners()
    assert c.shape == (8, 3)
    # first 4 corners are the +y (top) face, last 4 the -y face
    assert np.all(c[:4, 1] == 1.0) and np.all(c[4:, 1] == -1.0)
