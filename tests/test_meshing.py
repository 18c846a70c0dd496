"""Meshing tests: extracted surface must lie on the fused geometry."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from dynslam_tpu.config import Intrinsics
from dynslam_tpu.io.synthetic import SyntheticScene, Box, render_frame
from dynslam_tpu.ops import tsdf
from dynslam_tpu.viz.meshing import extract_mesh, save_engine_mesh, write_obj

W, H = 128, 96
INTR = Intrinsics(110.0, 110.0, W / 2, H / 2)
CFG = tsdf.TsdfConfig(
    pool_capacity=4096, local_dims=(48, 32, 48), max_new_blocks=2048,
    max_visible_blocks=3072, voxel_size=0.08, mu=0.32,
    width=W, height=H, fx=INTR.fx, fy=INTR.fy, cx=INTR.cx, cy=INTR.cy,
)


def _fuse_plane_scene():
    """Fuse a single fronto-parallel wall at z=5 m."""
    pose = np.eye(4)
    pose[:3, 3] = [0, 0, 7.03]
    scene = SyntheticScene(ground_y=1e9, boxes=[Box(np.array([4.0, 3.0, 2.0]), pose)])
    state = tsdf.create_state(CFG)
    fr = render_frame(scene, np.eye(4), INTR, W, H, supersample=1)
    depth = np.where((fr["depth_m"] >= 0.5) & (fr["depth_m"] <= 19), fr["depth_m"], 0)
    rgb = np.zeros((H, W, 3), np.uint8)
    c2w = jnp.eye(4)
    w2c = jnp.eye(4)
    origin = tsdf.compute_origin(CFG, c2w)
    grid = tsdf.build_local_grid(CFG, state, origin)
    state, grid, _ = tsdf.allocate(CFG, state, grid, origin,
                                   jnp.asarray(depth, jnp.float32), c2w,
                                   jnp.int32(0))
    slots, mask = tsdf.visible_blocks(CFG, state, grid, origin, w2c)
    state = tsdf.integrate(CFG, state, slots, mask, jnp.asarray(rgb),
                           jnp.asarray(depth, jnp.float32), w2c, jnp.int32(0))
    return state


class TestMeshing:
    def test_wall_mesh_on_surface(self):
        state = _fuse_plane_scene()
        verts, tris = extract_mesh(state, CFG.voxel_size)
        assert len(tris) > 100
        assert len(verts) > 50
        # the wall front face is at z = 5.0; most vertices must be within
        # a voxel of it
        z = verts[:, 2]
        frac_on_wall = (np.abs(z - 5.03) < 2 * CFG.voxel_size).mean()
        assert frac_on_wall > 0.8, f"only {frac_on_wall:.2f} near wall"
        # triangle indices are in range
        assert tris.max() < len(verts) and tris.min() >= 0

    def test_empty_state(self):
        state = tsdf.create_state(CFG)
        verts, tris = extract_mesh(state, CFG.voxel_size)
        assert len(verts) == 0 and len(tris) == 0

    def test_obj_roundtrip(self, tmp_path):
        state = _fuse_plane_scene()
        verts, tris = extract_mesh(state, CFG.voxel_size)
        path = str(tmp_path / "wall.obj")
        write_obj(path, verts, tris)
        lines = open(path).read().strip().split("\n")
        n_v = sum(1 for l in lines if l.startswith("v "))
        n_f = sum(1 for l in lines if l.startswith("f "))
        assert n_v == len(verts) and n_f == len(tris)
        # face indices are 1-based and valid
        for line in lines[-3:]:
            if line.startswith("f "):
                idx = [int(x) for x in line.split()[1:]]
                assert all(1 <= i <= n_v for i in idx)

    def test_pipeline_mesh_export(self, tmp_path):
        from dynslam_tpu.io.synthetic import write_kitti_sequence
        from dynslam_tpu.pipeline.builder import build_dynslam
        from tests.test_pipeline import small_config

        root = str(tmp_path / "seq")
        write_kitti_sequence(root, num_frames=3, width=160, height=120)
        dyn, inp = build_dynslam(root, small_config(), with_instances=False)
        while dyn.process_frame(inp):
            pass
        out = str(tmp_path / "map.obj")
        n_tris = dyn.save_static_map(out)
        assert n_tris > 500
        assert os.path.getsize(out) > 10000
