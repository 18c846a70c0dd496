"""SegNet-lite: training converges on synthetic car masks; the learned
provider emits reference-compatible detections the tracker can consume."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from dynslam_tpu.config import Intrinsics, StereoCalibration
from dynslam_tpu.io.synthetic import (
    SyntheticScene, render_stereo_frame, straight_trajectory,
)
from dynslam_tpu.models import segnet

W, H = 96, 64
INTR = Intrinsics(0.8 * W, 0.8 * W, W / 2, H / 2)
CALIB = StereoCalibration(0.5, INTR.fx)


def _batch(scene, poses, frames):
    rgbs, masks = [], []
    for f in frames:
        fr = render_stereo_frame(scene, poses[f], INTR, CALIB, W, H, frame=f)
        g = np.clip(fr["left_gray"] * 255, 0, 255).astype(np.float32)
        rgbs.append(np.stack([g] * 3, -1))
        dyn_ids = [i + 1 for i, b in enumerate(scene.boxes) if b.is_dynamic]
        masks.append(np.isin(fr["object_id"], dyn_ids))
    return {"rgb": jnp.asarray(np.stack(rgbs)),
            "mask": jnp.asarray(np.stack(masks))}


@pytest.fixture(scope="module")
def trained():
    scene = SyntheticScene.default_scene(seed=4, with_dynamic=True)
    poses = straight_trajectory(8, speed=0.2)
    model = segnet.create_model()
    params = segnet.init_params(model, jax.random.PRNGKey(0), H, W)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    step = jax.jit(segnet.make_train_step(model, opt))
    losses = []
    for it in range(60):
        batch = _batch(scene, poses, [it % 8, (it + 3) % 8])
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    return model, params, scene, poses, losses


class TestSegNet:
    @pytest.mark.slow
    def test_training_converges(self, trained):
        *_, losses = trained
        first = np.mean(losses[:10])
        last = np.mean(losses[-10:])
        assert last < first * 0.6, (first, last)

    def test_learned_provider_detects_car(self, trained):
        model, params, scene, poses, _ = trained
        prov = segnet.LearnedSegmentationProvider(
            model, params, min_detection_size_px=6
        )
        fr = render_stereo_frame(scene, poses[2], INTR, CALIB, W, H, frame=2)
        g = np.clip(fr["left_gray"] * 255, 0, 255).astype(np.uint8)
        rgb = np.stack([g] * 3, -1)
        result = prov.segment_frame(rgb)
        assert len(result.instance_detections) >= 1
        det = max(result.instance_detections,
                  key=lambda d: d.copy_mask.bbox.area)
        assert det.class_name == "car"
        # detection overlaps the true car mask
        dyn_ids = [i + 1 for i, b in enumerate(scene.boxes) if b.is_dynamic]
        gt = np.isin(fr["object_id"], dyn_ids)
        pred = det.copy_mask.to_full_frame(H, W)
        inter = (gt & pred).sum()
        assert inter / max(gt.sum(), 1) > 0.5
        assert prov.get_seg_preview() is not None
