"""CLI smoke test: the full app surface end-to-end on a tiny synthetic
sequence (in-process main(), CPU backend via conftest)."""

import os

import numpy as np
import pytest

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


@pytest.mark.slow
def test_cli_fused_dynamic(tmp_path, capsys):
    """--fused runs the single-dispatch DYNAMIC pipeline from the app:
    car tracked + reconstructed, trajectory + mesh + previews written."""
    # 240x160: below this the car mask has < 18 flow vectors (the
    # reference's min) and never leaves Uncertain (verify-skill trap)
    root = str(tmp_path / "seq")
    write_kitti_sequence(root, num_frames=7, width=240, height=160,
                         with_dynamic=True)
    out = str(tmp_path / "out")
    rc = main([
        "--dataset_root", root, "--out", out, "--tiny", "--fused",
        "--min_detection_size", "8", "--save_mesh",
        "--dump_previews_every", "2", "--save_object_meshes",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "[Dispatched frame 0" in text
    assert "steady-state:" in text
    assert "car Dynamic" in text and "blocks]" in text
    traj = np.loadtxt(os.path.join(out, "trajectory.txt"))
    assert traj.shape == (7, 12)
    assert os.path.getsize(os.path.join(out, "static_map.obj")) > 1000
    assert os.path.exists(os.path.join(out, "frame000002_color.png"))
    # --save_object_meshes: per-object OBJ export (SaveDynamicObject role)
    objs = [f for f in os.listdir(out)
            if f.startswith("object_") and f.endswith(".obj")]
    assert objs, "no per-object mesh written"
    assert os.path.getsize(os.path.join(out, objs[0])) > 100


def test_cli_fused_static(tmp_path, capsys):
    root = str(tmp_path / "seq")
    write_kitti_sequence(root, num_frames=4, width=160, height=120)
    out = str(tmp_path / "out")
    rc = main([
        "--dataset_root", root, "--out", out, "--tiny", "--fused",
        "--no-dynamic_mode", "--max_depth", "8",
    ])
    assert rc == 0
    assert "map:" in capsys.readouterr().out
    assert np.loadtxt(os.path.join(out, "trajectory.txt")).shape == (4, 12)


@pytest.mark.slow
def test_cli_staged_direct_refinement(tmp_path, capsys):
    """--direct_refinement on the staged path runs the wired
    ops/direct_align refinement on fused object motions (the reference's
    disabled Direct/ call sites, InstanceReconstructor.cpp:460-566) and
    reports how many ran."""
    root = str(tmp_path / "seq")
    write_kitti_sequence(root, num_frames=7, width=240, height=160,
                         with_dynamic=True)
    out = str(tmp_path / "out")
    rc = main([
        "--dataset_root", root, "--out", out, "--tiny",
        "--use_live_stereo", "--min_detection_size", "8",
        "--direct_refinement",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    m = [ln for ln in text.splitlines() if "direct refinement:" in ln]
    assert m, "refinement count line missing"
    n_refined = int(m[0].split(":")[1].split()[0])
    assert n_refined >= 1, "direct refinement never ran"
    traj = np.loadtxt(os.path.join(out, "trajectory.txt"))
    assert np.all(np.isfinite(traj))


def test_cli_fused_rejects_direct_refinement(tmp_path):
    """--fused still refuses the (shipped-disabled) direct refinement;
    evaluation is supported since round 4 (tests/test_fused_eval.py)."""
    root = str(tmp_path / "seq")
    write_kitti_sequence(root, num_frames=2, width=160, height=120)
    import pytest

    with pytest.raises(SystemExit):
        main(["--dataset_root", root, "--out", str(tmp_path / "o"),
              "--tiny", "--fused", "--direct_refinement"])
