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
