"""Mesh extraction + OBJ export — the reference's marching-cubes path
(`ITMMeshingEngine_CUDA::MeshScene` + `ITMMesh::WriteOBJ`, used by
`DynSlam::SaveStaticMap` (DynSlam.cpp:189) and
`InstanceReconstructor::SaveObjectToMesh` (InstanceReconstructor.cpp:736)).

Implementation: **marching tetrahedra** over the allocated voxel blocks
(each cube split into 6 tets around the main diagonal). Tets need no
256-case tables, vectorize cleanly in numpy, and produce a correct
(slightly denser) triangulation — an offline export path, so clarity
beats triangle count. Cross-block cubes are handled by stitching each
block with one voxel layer from its +x/+y/+z neighbors.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from dynslam_tpu.ops import tsdf as tsdf_ops

# 6 tetrahedra around the 0-6 main diagonal; cube corner bit order (x,y,z)
_TETS = [
    (0, 1, 3, 7),
    (0, 1, 5, 7),
    (0, 4, 5, 7),
    (0, 4, 6, 7),
    (0, 2, 6, 7),
    (0, 2, 3, 7),
]
#: corner id -> (dx, dy, dz)
_CORNERS = np.array(
    [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], np.float32
)


def _stitch_neighbors(
    sdf: np.ndarray,  # (B, 8, 8, 8)
    weight: np.ndarray,
    coords: np.ndarray,  # (B, 3)
) -> Tuple[np.ndarray, np.ndarray]:
    """(B, 9, 9, 9) sdf/weight with one voxel layer from +axis neighbors.
    Voxels with no neighbor data keep weight 0 (masked out of meshing)."""
    B = len(coords)
    slot_of = {tuple(c): i for i, c in enumerate(map(tuple, coords))}
    s9 = np.ones((B, 9, 9, 9), np.float32)
    w9 = np.zeros((B, 9, 9, 9), np.float32)
    s9[:, :8, :8, :8] = sdf
    w9[:, :8, :8, :8] = weight

    # neighbor offsets and the (target region, source region) they fill
    specs = [
        ((1, 0, 0), (np.s_[8:9, 0:8, 0:8], np.s_[0:1, 0:8, 0:8])),
        ((0, 1, 0), (np.s_[0:8, 8:9, 0:8], np.s_[0:8, 0:1, 0:8])),
        ((0, 0, 1), (np.s_[0:8, 0:8, 8:9], np.s_[0:8, 0:8, 0:1])),
        ((1, 1, 0), (np.s_[8:9, 8:9, 0:8], np.s_[0:1, 0:1, 0:8])),
        ((1, 0, 1), (np.s_[8:9, 0:8, 8:9], np.s_[0:1, 0:8, 0:1])),
        ((0, 1, 1), (np.s_[0:8, 8:9, 8:9], np.s_[0:8, 0:1, 0:1])),
        ((1, 1, 1), (np.s_[8:9, 8:9, 8:9], np.s_[0:1, 0:1, 0:1])),
    ]
    for off, (dst, src) in specs:
        nb = np.array(
            [slot_of.get((c[0] + off[0], c[1] + off[1], c[2] + off[2]), -1)
             for c in coords],
            np.int64,
        )
        has = nb >= 0
        if has.any():
            s9[np.nonzero(has)[0], dst[0], dst[1], dst[2]] = (
                sdf[nb[has]][:, src[0], src[1], src[2]]
            )
            w9[np.nonzero(has)[0], dst[0], dst[1], dst[2]] = (
                weight[nb[has]][:, src[0], src[1], src[2]]
            )
    return s9, w9


def extract_mesh(
    state,  # TsdfState (host-fetched or device)
    voxel_size: float,
    min_weight: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Marching tetrahedra over the allocated blocks.
    Returns (vertices (V, 3) float32 in meters, triangles (T, 3) int32)."""
    valid = np.asarray(state.valid).copy()
    # exclude the reserved scratch row (far-away coords, empty voxels)
    coords_all = np.asarray(state.block_coords)
    valid &= (np.abs(coords_all) < (1 << 20)).all(axis=1)
    if valid.sum() == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    packed = np.asarray(state.tsdf_w)[valid]
    coords = np.asarray(state.block_coords)[valid]
    sdf = (packed >> 16).astype(np.float32) / tsdf_ops.SDF_SCALE
    weight = (packed & 0xFFFF).astype(np.float32) / tsdf_ops.WEIGHT_SCALE
    B = len(coords)
    sdf = sdf.reshape(B, 8, 8, 8)
    weight = weight.reshape(B, 8, 8, 8)

    s9, w9 = _stitch_neighbors(sdf, weight, coords)

    # cube corner grids: (B, 8, 8, 8, 8corners)
    cs = np.empty((B, 8, 8, 8, 8), np.float32)
    cw = np.empty((B, 8, 8, 8, 8), np.float32)
    for ci, (dx, dy, dz) in enumerate(_CORNERS.astype(int)):
        cs[..., ci] = s9[:, dx:dx + 8, dy:dy + 8, dz:dz + 8]
        cw[..., ci] = w9[:, dx:dx + 8, dy:dy + 8, dz:dz + 8]

    # exact-zero samples (surface through a voxel center) count as inside
    cs = np.where(cs == 0.0, -1e-6, cs)
    observed = (cw > min_weight).all(axis=-1)
    sign_change = (cs < 0).any(-1) & (cs > 0).any(-1)
    active = observed & sign_change  # (B, 8, 8, 8)
    b_idx, xi, yi, zi = np.nonzero(active)
    if len(b_idx) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    vals = cs[b_idx, xi, yi, zi]  # (M, 8)
    base = (
        coords[b_idx].astype(np.float32) * 8.0
        + np.stack([xi, yi, zi], -1).astype(np.float32)
        + 0.5
    )  # voxel-center coords of corner 0, in voxels
    corner_pos = base[:, None, :] + _CORNERS[None]  # (M, 8, 3)

    tris = []
    for tet in _TETS:
        tv = vals[:, list(tet)]  # (M, 4)
        tp = corner_pos[:, list(tet)]  # (M, 4, 3)
        inside = tv < 0.0
        n_in = inside.sum(-1)
        sel = (n_in > 0) & (n_in < 4)
        if not sel.any():
            continue
        tv, tp, inside, n_in = tv[sel], tp[sel], inside[sel], n_in[sel]

        # stable permutation: inside vertices first
        order = np.argsort(~inside, axis=1, kind="stable")
        tv = np.take_along_axis(tv, order, axis=1)
        tp = np.take_along_axis(tp, order[..., None], axis=1)

        def interp(a, b):
            va, vb = tv[:, a], tv[:, b]
            pa, pb = tp[:, a], tp[:, b]
            t = va / np.where(np.abs(va - vb) < 1e-9, 1e-9, va - vb)
            t = np.clip(t, 0.0, 1.0)[:, None]
            return pa + t * (pb - pa)

        # n==1: vertex 0 inside -> edges 0-1, 0-2, 0-3
        m1 = n_in == 1
        if m1.any():
            e01, e02, e03 = interp(0, 1)[m1], interp(0, 2)[m1], interp(0, 3)[m1]
            tris.append(np.stack([e01, e02, e03], axis=1))
        # n==3: vertices 0,1,2 inside, 3 outside -> edges 0-3, 1-3, 2-3
        m3 = n_in == 3
        if m3.any():
            e03, e13, e23 = interp(0, 3)[m3], interp(1, 3)[m3], interp(2, 3)[m3]
            tris.append(np.stack([e03, e23, e13], axis=1))
        # n==2: 0,1 inside; 2,3 outside -> quad e02, e03, e13, e12
        m2 = n_in == 2
        if m2.any():
            e02, e03 = interp(0, 2)[m2], interp(0, 3)[m2]
            e13, e12 = interp(1, 3)[m2], interp(1, 2)[m2]
            tris.append(np.stack([e02, e03, e13], axis=1))
            tris.append(np.stack([e02, e13, e12], axis=1))

    if not tris:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    tri_pts = np.concatenate(tris, axis=0)  # (T, 3, 3) in voxel units

    # deduplicate vertices on a fine lattice
    verts = tri_pts.reshape(-1, 3)
    keys = np.round(verts * 16.0).astype(np.int64)
    _, uniq_idx, inv = np.unique(
        keys, axis=0, return_index=True, return_inverse=True
    )
    vertices = (verts[uniq_idx] * voxel_size).astype(np.float32)
    triangles = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate triangles
    ok = (
        (triangles[:, 0] != triangles[:, 1])
        & (triangles[:, 1] != triangles[:, 2])
        & (triangles[:, 0] != triangles[:, 2])
    )
    return vertices, triangles[ok]


def write_obj(path: str, vertices: np.ndarray, triangles: np.ndarray) -> None:
    """Minimal OBJ writer (ITMMesh::WriteOBJ equivalent)."""
    with open(path, "w") as f:
        f.write(f"# dynslam_tpu mesh: {len(vertices)} verts, "
                f"{len(triangles)} tris\n")
        for v in vertices:
            f.write(f"v {v[0]:.5f} {v[1]:.5f} {v[2]:.5f}\n")
        for t in triangles:
            f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")


def save_engine_mesh(engine, path: str, min_weight: float = 0.5) -> int:
    """Extract + write an engine's volume; returns triangle count."""
    verts, tris = extract_mesh(
        engine.state, engine.cfg.voxel_size, min_weight
    )
    write_obj(path, verts, tris)
    return len(tris)
