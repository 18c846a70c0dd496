"""CLI smoke test: the full app surface end-to-end on a tiny synthetic
sequence (in-process main(), CPU backend via conftest)."""

import os

import numpy as np

from dynslam_tpu.io.synthetic import write_kitti_sequence
from dynslam_tpu.main import main


def test_cli_end_to_end(tmp_path, capsys):
    root = str(tmp_path / "seq")
    write_kitti_sequence(root, num_frames=4, width=160, height=120)
    out = str(tmp_path / "out")
    rc = main([
        "--dataset_root", root, "--out", out, "--tiny",
        "--enable_evaluation", "--save_mesh", "--dump_previews_every", "2",
        "--frame_limit", "3",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "[Finished frame 0" in text and "FPS]" in text
    assert os.path.exists(os.path.join(out, "trajectory.txt"))
    assert os.path.getsize(os.path.join(out, "static_map.obj")) > 1000
    csvs = os.listdir(os.path.join(out, "csv"))
    assert any("unified-depth-result" in f for f in csvs)
    traj = np.loadtxt(os.path.join(out, "trajectory.txt"))
    assert traj.shape == (3, 12)
