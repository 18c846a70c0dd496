"""scripts/scale_sequence.py tooling + lowres-preset selection in the
builder (the reference's scale_sequence.py/preprocess-sequence.sh
equivalent, Input.h:128-139)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from dynslam_tpu.io.synthetic import write_kitti_sequence
from dynslam_tpu.pipeline.builder import build_dynslam


@pytest.fixture(scope="module")
def scaled_seq(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("seq_scale"))
    write_kitti_sequence(root, num_frames=3, width=192, height=96,
                         with_dynamic=True)
    r = subprocess.run(
        [sys.executable, "scripts/scale_sequence.py", "--dataset_root", root,
         "--scale", "0.5", "--cpu"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return root


def test_scale_outputs_exist(scaled_seq):
    root = scaled_seq
    for d in ("image_0_0.50", "image_1_0.50", "image_2_0.50", "image_3_0.50",
              "precomputed-depth-elas-0.50/Frames", "seg_image_2-0.50/mnc"):
        assert os.path.isdir(os.path.join(root, d)), d
    import cv2

    img = cv2.imread(os.path.join(root, "image_2_0.50", "000000.png"))
    assert img.shape[:2] == (48, 96)
    fs = cv2.FileStorage(
        os.path.join(root, "precomputed-depth-elas-0.50/Frames/0000.xml"),
        cv2.FILE_STORAGE_READ,
    )
    depth = fs.getNode("depth").mat()
    fs.release()
    assert depth.shape == (48, 96) and depth.dtype == np.int16
    assert (depth > 0).mean() > 0.3  # census stereo found real depth


def test_builder_selects_prescaled_lowres(scaled_seq):
    import dataclasses

    from tests.test_pipeline import small_config

    cfg = dataclasses.replace(small_config(), scale=2.0)  # divisor: half res
    dyn, inp = build_dynslam(scaled_seq, cfg, with_instances=False)
    # pre-scaled folders selected: no live resize, lowres depth folder
    assert inp.input_scale == 1.0
    assert "elas-0.50" in inp.depth_provider.folder
    assert (inp.frame_width, inp.frame_height) == (96, 48)
    assert dyn.process_frame(inp)
    assert dyn.process_frame(inp)
    assert dyn.static_scene.get_used_block_count() > 20
