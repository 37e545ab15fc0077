"""Pure-NumPy oracles transcribing the reference semantics for testing.

These are deliberately slow, loop-based transliterations of
/root/reference/houghvoting/src/hv_cuda_kernel.cu used ONLY as test oracles.
"""

import numpy as np

TWO_PI = 2.0 * 3.141592654


def hv_forward_numpy(points, xyz, scale, obj, res, num_rots, corners=None):
    """Loop transliteration of hv_cuda_forward (hv_cuda_kernel.cu:12-165)."""
    points = np.asarray(points, np.float64)
    xyz = np.asarray(xyz, np.float64)
    scale = np.asarray(scale, np.float64)
    obj = np.asarray(obj, np.float64)
    if corners is None:
        corners = np.stack([points.min(0), points.max(0)])
    corner = corners[0]
    diff = (corners[1] - corners[0]) / res
    dims = diff.astype(np.int32) + 1
    gx, gy, gz = int(dims[0]), int(dims[1]), int(dims[2])
    grid_obj = np.zeros((gx, gy, gz))
    grid_rot = np.zeros((gx, gy, gz, 2))
    grid_scale = np.zeros((gx, gy, gz, 3))
    rot_interval = TWO_PI / num_rots
    for c in range(points.shape[0]):
        objness = obj[c]
        corr = xyz[c] * scale[c]
        p = points[c]
        for i in range(num_rots):
            th = i * rot_interval
            off = np.array(
                [
                    -np.cos(th) * corr[0] + np.sin(th) * corr[2],
                    -corr[1],
                    -np.sin(th) * corr[0] - np.cos(th) * corr[2],
                ]
            )
            center = (p + off - corner) / res
            if np.any(center < 0) or center[0] >= gx - 1 or center[1] >= gy - 1 or center[2] >= gz - 1:
                continue
            fl = np.floor(center).astype(int)
            resid = center - fl
            w0 = 1.0 - resid
            w1 = resid
            for bx in (0, 1):
                for by in (0, 1):
                    for bz in (0, 1):
                        w = (
                            (w1[0] if bx else w0[0])
                            * (w1[1] if by else w0[1])
                            * (w1[2] if bz else w0[2])
                            * objness
                        )
                        ix, iy, iz = fl[0] + bx, fl[1] + by, fl[2] + bz
                        grid_obj[ix, iy, iz] += w
                        grid_rot[ix, iy, iz, 0] += w * np.cos(th)
                        grid_rot[ix, iy, iz, 1] += w * np.sin(th)
                        grid_scale[ix, iy, iz] += w * scale[c]
    grid_rot = grid_rot / (grid_obj[..., None] + 1e-7)
    grid_scale = grid_scale / (grid_obj[..., None] + 1e-7)
    return grid_obj, grid_rot, grid_scale


def hv_backward_numpy(grad_grid, points, xyz, scale, obj, res, num_rots,
                      corners=None):
    """Loop transliteration of hv_cuda_backward (hv_cuda_kernel.cu:168-302)."""
    points = np.asarray(points, np.float64)
    xyz = np.asarray(xyz, np.float64)
    scale = np.asarray(scale, np.float64)
    obj = np.asarray(obj, np.float64)
    grad_grid = np.asarray(grad_grid, np.float64)
    if corners is None:
        corners = np.stack([points.min(0), points.max(0)])
    corner = corners[0]
    gx, gy, gz = grad_grid.shape
    d_xyz = np.zeros_like(xyz)
    d_scale = np.zeros_like(scale)
    d_obj = np.zeros_like(obj)
    rot_interval = TWO_PI / num_rots
    for c in range(points.shape[0]):
        objness = obj[c]
        corr = xyz[c] * scale[c]
        p = points[c]
        for i in range(num_rots):
            th = i * rot_interval
            off = np.array(
                [
                    -np.cos(th) * corr[0] + np.sin(th) * corr[2],
                    -corr[1],
                    -np.sin(th) * corr[0] - np.cos(th) * corr[2],
                ]
            )
            center = (p + off - corner) / res
            if np.any(center < 0) or center[0] >= gx - 1 or center[1] >= gy - 1 or center[2] >= gz - 1:
                continue
            fl = np.floor(center).astype(int)
            resid = center - fl
            w0 = 1.0 - resid
            w1 = resid
            dgc = np.zeros(3)
            for bx in (0, 1):
                for by in (0, 1):
                    for bz in (0, 1):
                        wx = w1[0] if bx else w0[0]
                        wy = w1[1] if by else w0[1]
                        wz = w1[2] if bz else w0[2]
                        g = grad_grid[fl[0] + bx, fl[1] + by, fl[2] + bz]
                        d_obj[c] += g * wx * wy * wz
                        dgc[0] += g * (1 if bx else -1) * wy * wz
                        dgc[1] += g * (1 if by else -1) * wx * wz
                        dgc[2] += g * (1 if bz else -1) * wx * wy
            dgc *= objness
            d_corr = np.array(
                [
                    -np.cos(th) * dgc[0] - np.sin(th) * dgc[2],
                    -dgc[1],
                    np.sin(th) * dgc[0] - np.cos(th) * dgc[2],
                ]
            )
            d_xyz[c] += d_corr * scale[c]
            d_scale[c] += d_corr * xyz[c]
    return d_xyz, d_scale, d_obj


def hv_forward_numpy_vec(points, xyz, scale, obj, res, num_rots,
                         corners=None):
    """Vectorized-over-points float64 oracle for hv_cuda_forward
    (hv_cuda_kernel.cu:12-165): identical per-vote math to
    ``hv_forward_numpy`` (same rotation sweep, bounds test, trilinear
    weights, and +1e-7 normalization), accumulated with ``np.add.at``.
    Summation order differs from the point-loop transliteration; in float64
    the discrepancy is ~1e-12 relative, far below every test tolerance.
    Usable at ScanNet scale (the point-loop oracle is minutes per scene).
    """
    points = np.asarray(points, np.float64)
    xyz = np.asarray(xyz, np.float64)
    scale = np.asarray(scale, np.float64)
    obj = np.asarray(obj, np.float64)
    if corners is None:
        corners = np.stack([points.min(0), points.max(0)])
    corner = np.asarray(corners[0], np.float64)
    diff = (np.asarray(corners[1], np.float64) - corner) / res
    dims = diff.astype(np.int32) + 1
    gx, gy, gz = int(dims[0]), int(dims[1]), int(dims[2])
    grid_obj = np.zeros((gx, gy, gz))
    grid_rot = np.zeros((gx, gy, gz, 2))
    grid_scale = np.zeros((gx, gy, gz, 3))
    rot_interval = TWO_PI / num_rots
    corr = xyz * scale  # (N, 3)
    for i in range(num_rots):
        th = i * rot_interval
        c, s = np.cos(th), np.sin(th)
        off = np.stack(
            [-c * corr[:, 0] + s * corr[:, 2],
             -corr[:, 1],
             -s * corr[:, 0] - c * corr[:, 2]], axis=-1)
        center = (points + off - corner) / res  # (N, 3)
        ok = (
            np.all(center >= 0, axis=-1)
            & (center[:, 0] < gx - 1) & (center[:, 1] < gy - 1)
            & (center[:, 2] < gz - 1)
        )
        ctr = center[ok]
        ob = obj[ok]
        sc = scale[ok]
        fl = np.floor(ctr).astype(int)
        resid = ctr - fl
        for bx in (0, 1):
            wx = resid[:, 0] if bx else 1.0 - resid[:, 0]
            for by in (0, 1):
                wy = resid[:, 1] if by else 1.0 - resid[:, 1]
                for bz in (0, 1):
                    wz = resid[:, 2] if bz else 1.0 - resid[:, 2]
                    w = wx * wy * wz * ob
                    ix, iy, iz = fl[:, 0] + bx, fl[:, 1] + by, fl[:, 2] + bz
                    np.add.at(grid_obj, (ix, iy, iz), w)
                    np.add.at(grid_rot, (ix, iy, iz, 0), w * c)
                    np.add.at(grid_rot, (ix, iy, iz, 1), w * s)
                    for k in range(3):
                        np.add.at(grid_scale, (ix, iy, iz, k), w * sc[:, k])
    grid_rot = grid_rot / (grid_obj[..., None] + 1e-7)
    grid_scale = grid_scale / (grid_obj[..., None] + 1e-7)
    return grid_obj, grid_rot, grid_scale


def slice_joint_heads_numpy(out_rows, nclasses=9, log_scale=True):
    """Float64 transliteration of the reference's head decoding
    (eval_joint.py:173-190): argmax class (background -> slot 0) gathers the
    per-class xyz/scale heads; prob = max foreground softmax."""
    out = np.asarray(out_rows, np.float64)
    n = nclasses
    xyz_all = out[:, : 3 * n].reshape(-1, n, 3)
    scale_all = out[:, 3 * n: 6 * n].reshape(-1, n, 3)
    logits = out[:, 6 * n:]
    idx = np.argmax(logits, axis=-1)
    idx = np.where(idx == n, 0, idx)
    rows = np.arange(len(out))
    xyz = xyz_all[rows, idx]
    scale = scale_all[rows, idx]
    if log_scale:
        scale = np.exp(scale)
    class_pred = np.argmax(logits[:, :-1], axis=-1).astype(np.int32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    softmax = e / e.sum(-1, keepdims=True)
    prob = softmax[:, :-1].max(-1)
    return xyz, scale, class_pred, prob


def reference_eval_joint_tail(out_rows, points_w, res, num_rots, peel_cfg,
                              log_scale=True, nclasses=9, nms_fn=None,
                              name_fn=None):
    """Float64 oracle of the FULL reference inference tail
    (eval_joint.py:163-280): head slicing -> Hough voting -> box peeling ->
    per-class NMS. Returns (map_scene, boxes, scores, classes) where
    map_scene is the [(classname, corners (8, 3), prob)] list the reference
    feeds compute_map."""
    xyz, scale, class_pred, prob = slice_joint_heads_numpy(
        out_rows, nclasses, log_scale)
    points_w = np.asarray(points_w, np.float64)
    corners = np.stack([points_w.min(0), points_w.max(0)])
    go, gr, gs = hv_forward_numpy_vec(
        points_w, xyz, scale, prob, res, num_rots, corners=corners)
    from canonicalvoting_tpu.decode.peeling import peel_boxes_numpy_reference

    boxes, scores, classes = peel_boxes_numpy_reference(
        go, gr, gs, points_w, xyz, prob, class_pred, corners[0], peel_cfg)
    if nms_fn is None:
        from canonicalvoting_tpu.metrics.ap import nms as nms_fn
    if name_fn is None:
        from canonicalvoting_tpu.data.geometry import IDX2NAME, NAME2CATNAME

        def name_fn(i):
            return NAME2CATNAME[IDX2NAME[i]]

    boxes = np.asarray(boxes, np.float64).reshape(-1, 8, 3)
    scores = np.asarray(scores, np.float64)
    classes = np.asarray(classes, np.int32)
    map_scene = []
    for i in range(nclasses):
        sel = classes == i
        if sel.sum() == 0:
            continue
        boxes_cls, scores_cls = boxes[sel], scores[sel]
        for j in nms_fn(boxes_cls, scores_cls, 0.3):
            map_scene.append((name_fn(i), boxes_cls[j], float(scores_cls[j])))
    return map_scene, boxes, scores, classes
