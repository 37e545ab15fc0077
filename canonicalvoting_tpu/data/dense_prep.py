"""Host-side prep for the dense-execution backbone.

Computes, per scene, the L0 dense-grid geometry and each point's flat cell
id. The base voxel coordinate is aligned DOWN to the coarsest stride (16) so
dense stride-2 downsampling reproduces the raw-coordinate floor-division
semantics of the sparse pyramid (ops/coords.downsample_coords) exactly, and
grid dims are rounded up to multiples of 16 (bucketed to limit recompiles).

All dense grids are MARGINED: stored with (MX, MY, MZ) = (2, 2, 16) zero
borders around the interior (the single source of truth is
ops/pallas/tiled_conv.py's MX/MY/MZ, imported below) so Pallas conv windows
never go out of bounds, z DMA starts stay 8-sublane aligned, and the z-PAIR
view used by the stride-2 transition kernels keeps 8-aligned pair offsets.
Flat cell ids index the margined storage.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from canonicalvoting_tpu.ops.pallas.tiled_conv import MX, MY, MZ

STRIDE_ALIGN = 16

# per-level (tile_shape, group) for the Pallas occupied-tile conv, chosen by
# TPU sweep (benchmarks/bench_tile_shapes.py): fine tiles at L0 where the
# scene is sparsest, coarser at L1+ where per-tile DMA issue cost dominates
TILE_PLAN: Dict[int, Tuple[Tuple[int, int, int], int]] = {
    0: ((4, 4, 8), 16),
    # L1-L3 tile z is 16 so the SAME tile lists serve the transposed-up
    # kernel (its coarse-input z window offset tz/2 must stay 8-aligned);
    # the up kernel into L0 reuses the stem's (8, 8, 32) list
    1: ((8, 8, 16), 4),
    2: ((8, 8, 16), 2),
    3: ((4, 4, 16), 4),
    4: ((2, 8, 8), 4),
}

# the k=5 stem uses coarser L0 tiles: its per-cell compute is tiny (3 real
# input channels), so per-tile DMA issue cost dominates and fewer, larger
# tiles win. Keyed by STEM_KEY (an int: the tiles dict crosses jax pytree
# boundaries, whose dict-key sort rejects mixed int/str keys).
STEM_KEY = -1
# (8,8,32)x2 -> (4,2,8)x32: 34 -> 18 ms (benchmarks/bench_stem.py,
# RESULTS_r3.md) — the k=5 stem is fold-bound, so fewer covered cells
# beat fewer DMAs; sub-128-cell tiles ride the group-major occ pack
STEM_TILE_PLAN: Tuple[Tuple[int, int, int], int] = ((4, 2, 8), 32)

# dedicated lists for the expensive level-transition kernels
# (bench_up2v2.py + round-3 sweeps, RESULTS_r3.md). The up-into-L0 kernel
# (tiled_up2_into) pays 8 lane-sliced DMAs per tile, so it wants the
# COARSEST list; the down-into-L1 kernel wants a fine list (fewer covered
# cells). Keyed by negative ints (the tiles dict crosses jax pytree
# boundaries, whose dict-key sort rejects mixed int/str keys).
TRANS_KEYS: Dict[Tuple[str, int], int] = {
    ("up", 0): -2,    # transposed-up into L0 (the 21.6 ms hot spot)
    ("down", 1): -3,  # stride-2 down into L1
}
# level: which stride level each transition key's tiles live on
TRANS_LEVEL: Dict[int, int] = {-2: 0, -3: 1}
TRANS_TILE_PLAN: Dict[int, Tuple[Tuple[int, int, int], int]] = {
    -2: ((8, 8, 32), 2),
    -3: ((4, 4, 8), 16),
}

# finer tile plans for the k=3 block convs, keyed CONV_KEY_OFF + level in
# the tile dict. The down/up level-transition kernels keep TILE_PLAN's
# coarser lists (the up kernel needs tile z % 16); the conv kernels track
# the occupied surface tighter — sub-128-cell tiles are legal through the
# group-major occupancy pack (pack_occ_group). Sweep:
# round-3 sweeps (benchmarks/RESULTS_r3.md).
CONV_KEY_OFF = 10
CONV_TILE_PLAN: Dict[int, Tuple[Tuple[int, int, int], int]] = {
    0: ((2, 2, 8), 64),
    1: ((4, 4, 8), 16),
}

# tiles-per-step for the fused residual-block kernel (tiled_block3d): its
# VMEM footprint is ~2.5x a single conv's (two zbufs + the expanded mid
# scratch), so groups are smaller than TILE_PLAN's
BLOCK_GROUP: Dict[int, int] = {0: 4, 1: 1, 2: 1, 3: 1, 4: 1}

# z-run decomposition plan for the k=3 convs: occupied tiles that are
# z-adjacent (floors/walls give mean run length ~3.3) are chopped greedily
# into these run lengths, largest first — each chunk moves with ONE DMA of
# ONE (TX, TY, R*TZ) window, cutting the per-tile DMA issue+segment cost
# that binds the conv kernels. (R, group) per level; groups shrink as R
# grows to keep VMEM and per-step rows roughly constant.
RUN_PLAN: Dict[int, Tuple[Tuple[int, int], ...]] = {
    0: ((8, 2), (4, 4), (2, 8), (1, 16)),
    1: ((4, 1), (2, 2), (1, 4)),
    2: ((4, 1), (2, 1), (1, 2)),
    3: ((2, 2), (1, 4)),
    4: ((1, 4),),
}


def level_tile_runs(coords: np.ndarray, base: np.ndarray,
                    dims: Tuple[int, int, int], run_plan=None,
                    tile_plan=None, pad_multiple: int = 8):
    """{level: [(R, group, chunks (T, 3) int32), ...]} z-run decomposition.

    Occupied tiles (TILE_PLAN shapes) are grouped into maximal z-adjacent
    runs, then greedily chopped into the plan's R sizes (binary-style, no
    coverage padding). Chunk coords are run STARTS in base-tile units.
    Each per-R list is padded to lcm(pad_multiple, group) by repeating its
    last chunk (duplicate chunks rewrite identical bytes — benign) and
    bucketed geometrically like level_tiles to bound recompiles.
    """
    if run_plan is None:
        run_plan = RUN_PLAN
    if tile_plan is None:
        tile_plan = TILE_PLAN
    c0 = coords[:, -3:].astype(np.int64) - base.astype(np.int64)
    c0 = c0[np.all((c0 >= 0) & (c0 < np.asarray(dims)), axis=1)]
    out = {}
    for lvl, plan in run_plan.items():
        if lvl not in tile_plan:
            continue
        ts = np.asarray(tile_plan[lvl][0])
        d = tuple(x >> lvl for x in dims)
        if any(dd % tt for dd, tt in zip(d, ts)):
            continue
        tc = (c0 >> lvl) // ts
        nty, ntz = d[1] // int(ts[1]), d[2] // int(ts[2])
        fl = np.unique((tc[:, 0] * nty + tc[:, 1]) * ntz + tc[:, 2])
        # maximal z-runs: consecutive flat ids within one (x, y) row
        brk = np.ones(len(fl), bool)
        if len(fl) > 1:
            brk[1:] = (fl[1:] != fl[:-1] + 1) | (fl[1:] % ntz == 0)
        run_start = np.flatnonzero(brk)
        run_len = np.diff(np.append(run_start, len(fl)))
        sizes = sorted((r for r, _ in plan), reverse=True)
        per_r = {r: [] for r in sizes}
        for s0, L in zip(run_start, run_len):
            off = 0
            rem = int(L)
            for r in sizes:
                while rem >= r:
                    per_r[r].append(fl[s0 + off])
                    off += r
                    rem -= r
        entries = []
        for r, group in plan:
            ids = np.asarray(per_r[r], dtype=np.int64)
            if len(ids) == 0:
                continue
            t = np.stack([ids // (nty * ntz), (ids // ntz) % nty,
                          ids % ntz], axis=1).astype(np.int32)
            m = int(np.lcm(pad_multiple, group))
            m = int(np.lcm(m, 1 << max(int(len(t)).bit_length() - 4, 0)))
            pad = int(np.ceil(len(t) / m) * m) - len(t)
            if pad:
                t = np.concatenate([t, np.repeat(t[-1:], pad, axis=0)],
                                   axis=0)
            entries.append((r, group, t))
        if entries:
            out[lvl] = entries
    return out


def dense_grid_geometry(coords: np.ndarray, dim_multiple: int = 32,
                        ) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """(base (3,) int32, INTERIOR dims (X, Y, Z)) for raw L0 voxel coords."""
    c = coords[:, -3:].astype(np.int64)
    lo = c.min(0)
    hi = c.max(0)
    base = (lo // STRIDE_ALIGN) * STRIDE_ALIGN  # floor-align (negatives ok)
    m = int(np.lcm(STRIDE_ALIGN, dim_multiple))
    dims = tuple(
        int(np.ceil((h - b + 1) / m) * m) for h, b in zip(hi, base)
    )
    return base.astype(np.int32), dims


def dense_flat_ids(coords: np.ndarray, base: np.ndarray,
                   dims: Tuple[int, int, int]) -> np.ndarray:
    """Flat MARGINED cell index per point; -1 when outside the interior.

    dims are the interior dims; the returned ids index the
    (X + 2*MX, Y + 2*MY, Z + 2*MZ) margined grid storage.
    """
    c = coords[:, -3:].astype(np.int64) - base.astype(np.int64)
    ok = np.all((c >= 0) & (c < np.asarray(dims)), axis=1)
    ym, zm = dims[1] + 2 * MY, dims[2] + 2 * MZ
    flat = ((c[:, 0] + MX) * ym + (c[:, 1] + MY)) * zm + (c[:, 2] + MZ)
    return np.where(ok, flat, -1).astype(np.int32)


def dense_flat_ids_batched(coords_list, dims=None):
    """Batched flat ids for a list of scenes sharing one (max) grid size.

    Per scene computes its own base; the common INTERIOR dims are the
    elementwise max over scenes (already 16/32-aligned), so every scene's
    points fit — or ``dims`` when given (pinned across the microbatches of
    a gradient-accumulation batch so one compile serves them all). Scene
    ``s``'s ids are offset by ``s * n_cells_margined`` into the stacked id
    space DenseMinkUNet(n_scenes=B) scatters into.

    Returns (flat_concat (sum Ni,), dims (X, Y, Z), bases [B x (3,)]).
    """
    geo = [dense_grid_geometry(c) for c in coords_list]
    if dims is None:
        dims = tuple(int(max(g[1][a] for g in geo)) for a in range(3))
    else:
        dims = tuple(int(d) for d in dims)
    n_cells = (dims[0] + 2 * MX) * (dims[1] + 2 * MY) * (dims[2] + 2 * MZ)
    flats = []
    for s, (c, (base, _)) in enumerate(zip(coords_list, geo)):
        f = dense_flat_ids(c, base, dims)
        flats.append(np.where(f >= 0, f + s * n_cells, -1).astype(np.int32))
    return np.concatenate(flats), dims, [g[0] for g in geo]


def level_tiles(coords: np.ndarray, base: np.ndarray,
                dims: Tuple[int, int, int], tile_plan=None,
                pad_multiple: int = 32):
    """Occupied-tile coordinates per stride level for the Pallas tiled conv.

    tile_plan: {level: (tile_shape, group)} (default TILE_PLAN). Returns
    {level: (T, 3) int32} with T padded up to lcm(pad_multiple, group)
    (bucketed to limit recompiles) by repeating the last tile — duplicate
    tiles recompute/rewrite identical values, which is benign. Levels whose
    interior dims don't divide by the tile shape are skipped. Tile coords
    index the INTERIOR (margins are applied inside the kernel).
    """
    if tile_plan is None:
        tile_plan = TILE_PLAN
    c0 = coords[:, -3:].astype(np.int64) - base.astype(np.int64)
    c0 = c0[np.all((c0 >= 0) & (c0 < np.asarray(dims)), axis=1)]
    out = {}
    entries = [(lvl, lvl, ts_g) for lvl, ts_g in tile_plan.items()]
    if 0 in tile_plan:
        entries.append((STEM_KEY, 0, STEM_TILE_PLAN))
    if tile_plan is TILE_PLAN:
        entries.extend(
            (CONV_KEY_OFF + lvl, lvl, ts_g)
            for lvl, ts_g in CONV_TILE_PLAN.items() if lvl in tile_plan
        )
        entries.extend(
            (key, TRANS_LEVEL[key], ts_g)
            for key, ts_g in TRANS_TILE_PLAN.items()
            if TRANS_LEVEL[key] in tile_plan or TRANS_LEVEL[key] == 0
        )
    for key, lvl, (tile_shape, group) in entries:
        ts = np.asarray(tile_shape)
        d = tuple(x >> lvl for x in dims)
        if any(dd % tt for dd, tt in zip(d, ts)):
            continue
        # 1D flat unique: np.unique(axis=0) on row vectors is ~50x slower
        # (structured sort); this is the bulk of host prep otherwise
        tc = (c0 >> lvl) // ts
        nty, ntz = d[1] // int(ts[1]), d[2] // int(ts[2])
        fl = np.unique((tc[:, 0] * nty + tc[:, 1]) * ntz + tc[:, 2])
        t = np.stack([fl // (nty * ntz), (fl // ntz) % nty, fl % ntz],
                     axis=1).astype(np.int32)
        # geometric bucketing (~1/16 granularity): same-size scenes land on
        # the same padded tile count, so the jitted backbone compiles once
        # per size class instead of once per scene (remote TPU compiles of
        # the full backbone take minutes)
        m = int(np.lcm(pad_multiple, group))
        m = int(np.lcm(m, 1 << max(int(len(t)).bit_length() - 4, 0)))
        pad = int(np.ceil(len(t) / m) * m) - len(t)
        if pad:
            t = np.concatenate([t, np.repeat(t[-1:], pad, axis=0)], axis=0)
        out[key] = t
    return out


def tile_plan_for_key(key: int):
    """(tile_shape, group) plan for any tiles-dict key (level, stem,
    transition, or dedicated-conv key)."""
    if key == STEM_KEY:
        return STEM_TILE_PLAN
    if key in TRANS_TILE_PLAN:
        return TRANS_TILE_PLAN[key]
    if key >= CONV_KEY_OFF:
        return CONV_TILE_PLAN[key - CONV_KEY_OFF]
    return TILE_PLAN[key]


def host_occ_levels(coords: np.ndarray, base: np.ndarray,
                    dims: Tuple[int, int, int], levels: int = 5):
    """Margined {0,1} float32 numpy occupancy grid per stride level.

    Matches the model's device-side occupancy pyramid (scatter + strided
    max-pool) exactly: level-l occupancy at cell c is 1 iff some input
    voxel maps to c via floor-division by 2**l.
    """
    from canonicalvoting_tpu.ops.pallas.tiled_conv import MX, MY, MZ

    c0 = coords[:, -3:].astype(np.int64) - base.astype(np.int64)
    c0 = c0[np.all((c0 >= 0) & (c0 < np.asarray(dims)), axis=1)]
    out = []
    for lvl in range(levels):
        d = tuple(int(x) >> lvl for x in dims)
        g = np.zeros((d[0] + 2 * MX, d[1] + 2 * MY, d[2] + 2 * MZ),
                     np.float32)
        cl = c0 >> lvl
        g[cl[:, 0] + MX, cl[:, 1] + MY, cl[:, 2] + MZ] = 1.0
        out.append(g)
    return out


def host_occ_packs(coords: np.ndarray, base: np.ndarray,
                   dims: Tuple[int, int, int], tiles, tile_runs=None,
                   block: str = "basic"):
    """Host (numpy) occupancy packs for the tiled backbone — the same
    pytree DenseMinkUNet builds in-graph when occ_packs is None, moved to
    scene prep where it overlaps device work (the in-graph pack transposes
    cost ~7 ms/scene on TPU)."""
    from canonicalvoting_tpu.models.dense_unet import build_occ_packs

    occ_levels = host_occ_levels(coords, base, dims)
    tsg = {k: tile_plan_for_key(k) for k in tiles}
    return build_occ_packs(occ_levels, tiles, tsg, tile_runs=tile_runs,
                           block=block, xp=np)


def pyramid_level_flat_ids(coords_levels, scene_bases, dims0):
    """Per-level stacked flat cell ids for the scatter-dense conv engine
    (ops/scatter_conv.py).

    coords_levels: the pyramid's per-level (cap_l, 4) batched coords
    [b, x, y, z] at RAW scale (level-l coords are multiples of 2^l);
    scene_bases: (B, 3) per-scene bases aligned to STRIDE_ALIGN
    (dense_grid_geometry); dims0: shared L0 interior dims (multiples of
    16). Level-l grids are UNMARGINED (B, dims0 >> l); ids index the
    stacked B * cells space; padding / out-of-grid rows get -1.

    Returns (flat_levels: list[(cap_l,) int32], dims_levels: list[tuple]).
    """
    bases = np.asarray(scene_bases, np.int64)
    B = len(bases)
    flat_levels, dims_levels = [], []
    for lvl, c in enumerate(coords_levels):
        d = tuple(int(x) >> lvl for x in dims0)
        b = c[:, 0].astype(np.int64)
        ok_b = (b >= 0) & (b < B)
        safe_b = np.clip(b, 0, B - 1)
        base_l = bases[safe_b] >> lvl
        cell = (c[:, 1:].astype(np.int64) >> lvl) - base_l
        ok = ok_b & np.all((cell >= 0) & (cell < np.asarray(d)), axis=1)
        n_cells = d[0] * d[1] * d[2]
        flat = ((cell[:, 0] * d[1] + cell[:, 1]) * d[2] + cell[:, 2]
                + b * n_cells)
        flat_levels.append(np.where(ok, flat, -1).astype(np.int32))
        dims_levels.append(d)
    return flat_levels, dims_levels
