"""Offline preprocess tool round-trip: raw stereo PNGs -> reference-format
depth/seg dumps -> consumed back by the precomputed providers and the full
pipeline (the `preprocess-sequence.sh` role,
ref: scripts/preprocess-sequence.sh:161-215)."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # tool/multichip coverage: full lane + driver dryrun

from dynslam_tpu.io.synthetic import write_kitti_sequence

W, H = 96, 64
N_FRAMES = 3
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def preprocessed(tmp_path_factory):
    """A raw sequence (no precomputed dumps) run through the tool once."""
    root = str(tmp_path_factory.mktemp("seq_raw"))
    write_kitti_sequence(root, num_frames=N_FRAMES, width=W, height=H,
                         with_dynamic=True,
                         write_elas_xml=False, write_dispnet=False)
    # strip the synthetic seg dumps: the tool must regenerate everything
    shutil.rmtree(os.path.join(root, "seg_image_2"))

    # random-init SegNet params: the dump-format round-trip needs
    # detections, not accuracy — a low threshold yields a big component
    import jax

    from dynslam_tpu.models import segnet

    model = segnet.create_model()
    params = segnet.init_params(model, jax.random.PRNGKey(0), H, W)
    params_path = os.path.join(root, "segnet.msgpack")
    segnet.save_params(params_path, params)

    r = subprocess.run(
        [sys.executable, "scripts/preprocess_sequence.py",
         "--dataset_root", root, "--max_disparity", "64",
         "--seg_params", params_path, "--seg_threshold", "0.35",
         "--min_detection_size", "8", "--cpu"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return root


def test_depth_xml_dump(preprocessed):
    import cv2

    for f in range(N_FRAMES):
        fs = cv2.FileStorage(
            os.path.join(preprocessed, "precomputed-depth/Frames",
                         f"{f:04d}.xml"),
            cv2.FILE_STORAGE_READ,
        )
        depth = fs.getNode("depth").mat()
        fs.release()
        assert depth.shape == (H, W) and depth.dtype == np.int16
        assert (depth > 0).mean() > 0.3  # census stereo found real depth


def test_dispnet_pfm_dump(preprocessed):
    from dynslam_tpu.utils.pfm import read_pfm

    disp = read_pfm(
        os.path.join(preprocessed, "precomputed-depth-dispnet", "000000.pfm")
    )
    assert disp.shape == (H, W)
    assert np.isfinite(disp).all()
    assert (disp > 0).mean() > 0.3


def test_seg_dump_readable_by_precomputed_provider(preprocessed):
    from dynslam_tpu.io.segmentation import PrecomputedSegmentationProvider

    prov = PrecomputedSegmentationProvider(
        os.path.join(preprocessed, "seg_image_2/mnc"),
        min_detection_size_px=8,
    )
    result = prov.segment_frame(np.zeros((H, W, 3), np.uint8))
    assert len(result.instance_detections) >= 1
    det = result.instance_detections[0]
    assert det.class_id == 7  # car
    assert 0.0 < det.class_probability <= 1.0
    assert prov.get_seg_preview() is not None


def test_pipeline_consumes_preprocessed_depth(preprocessed):
    from dynslam_tpu.pipeline.builder import build_dynslam
    from tests.test_pipeline import small_config

    dyn, inp = build_dynslam(preprocessed, small_config(),
                             with_instances=False)
    assert dyn.process_frame(inp)
    assert dyn.process_frame(inp)
    assert dyn.static_scene.get_used_block_count() > 10


def test_rerun_skips_existing_dumps(preprocessed):
    """The reference script skips sequences whose dumps already exist
    (preprocess-sequence.sh:186-193); ours does the same sans --overwrite."""
    xml0 = os.path.join(preprocessed, "precomputed-depth/Frames/0000.xml")
    mtime = os.path.getmtime(xml0)
    r = subprocess.run(
        [sys.executable, "scripts/preprocess_sequence.py",
         "--dataset_root", preprocessed, "--max_disparity", "64", "--cpu"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "already present" in r.stdout
    assert os.path.getmtime(xml0) == mtime
