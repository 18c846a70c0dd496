"""SegNet-lite: a learned instance-mask model — the in-framework
replacement for the reference's offline Caffe-MNC preprocessing
(`preprocessing/MNC`, consumed as mask dumps). The precomputed-dump
reader (io/segmentation.py) stays the primary path, exactly as in the
reference; this model provides the "live" alternative the reference
never had (SURVEY.md §2.2: "optionally a JAX segmentation net later").

Architecture: a small UNet predicting a per-pixel car-probability map;
`LearnedSegmentationProvider` thresholds it, splits connected components
on the host (tiny N, branchy — like the reference's detection loop), and
emits the same `InstanceDetection` objects (copy/delete/conservative
masks with the reference's rescale rules) the tracker consumes.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dynslam_tpu.io.segmentation import (
    BoundingBox,
    InstanceDetection,
    InstanceSegmentationResult,
    SegmentationProvider,
    build_masks,
)


class SegNetLite(nn.Module):
    features: Sequence[int] = (24, 48, 96)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb: jnp.ndarray) -> jnp.ndarray:
        """rgb (B, H, W, 3) in [0, 255] -> car logits (B, H, W)."""
        x = rgb.astype(self.dtype) / 255.0
        skips = []
        for f in self.features:
            x = nn.Conv(f, (3, 3), strides=(2, 2), dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Conv(f, (3, 3), dtype=self.dtype)(x)
            x = nn.relu(x)
            skips.append(x)
        for f, skip in zip(reversed(self.features[:-1]), reversed(skips[:-1])):
            b, h, w, _ = skip.shape
            x = jax.image.resize(x, (b, h, w, x.shape[-1]), "bilinear")
            x = jnp.concatenate([x, skip], axis=-1)
            x = nn.Conv(f, (3, 3), dtype=self.dtype)(x)
            x = nn.relu(x)
        b = rgb.shape[0]
        h, w = rgb.shape[1], rgb.shape[2]
        x = jax.image.resize(x, (b, h, w, x.shape[-1]), "bilinear")
        x = nn.Conv(8, (3, 3), dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Conv(1, (3, 3), dtype=self.dtype)(x)[..., 0].astype(
            jnp.float32
        )


def create_model() -> SegNetLite:
    return SegNetLite()


def save_params(path: str, params) -> None:
    """Serialize trained params (flax msgpack) for the offline tools."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, model: SegNetLite, height: int, width: int):
    """Load params serialized by `save_params` (shape template from a
    fresh init at the working resolution)."""
    import jax

    from flax import serialization

    template = init_params(model, jax.random.PRNGKey(0), height, width)
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def init_params(model: SegNetLite, rng, height: int, width: int):
    return model.init(rng, jnp.zeros((1, height, width, 3), jnp.float32))


def seg_loss(model, params, rgb, gt_mask) -> jnp.ndarray:
    """Balanced sigmoid cross-entropy (car pixels are rare)."""
    logits = model.apply(params, rgb)
    gt = gt_mask.astype(jnp.float32)
    ce = jnp.maximum(logits, 0) - logits * gt + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    pos = jnp.sum(gt) + 1.0
    neg = jnp.sum(1.0 - gt) + 1.0
    w = jnp.where(gt > 0, neg / (pos + neg), pos / (pos + neg))
    return jnp.sum(ce * w) / jnp.sum(w)


def make_train_step(model, optimizer):
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: seg_loss(model, p, batch["rgb"], batch["mask"])
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step


class LearnedSegmentationProvider(SegmentationProvider):
    """Live segmentation via SegNet-lite, emitting reference-compatible
    InstanceDetections (car class, VOC id 7)."""

    def __init__(self, model: SegNetLite, params, threshold: float = 0.5,
                 min_detection_size_px: int = 45):
        self.model = model
        self.params = params
        self.threshold = threshold
        self.min_area = min_detection_size_px ** 2
        self._apply = jax.jit(lambda p, x: jax.nn.sigmoid(model.apply(p, x)))
        self._last_prob = None

    def raw_detections(self, rgb: np.ndarray):
        """Connected-component instances as raw (bbox, prob, class_id,
        bbox-sized binary mask) tuples — the MNC dump payload (what the
        reference's MNC stage writes per detection,
        preprocess-sequence.sh:230-257)."""
        import cv2

        prob = np.asarray(self._apply(self.params, rgb[None].astype(np.float32)))[0]
        self._last_prob = prob
        binary = (prob > self.threshold).astype(np.uint8)

        n, labels, stats, _ = cv2.connectedComponentsWithStats(binary)
        out = []
        for i in range(1, n):
            x, y, w, h, area = stats[i]
            if w * h <= self.min_area:
                continue
            bbox = BoundingBox(int(x), int(y), int(x + w - 1), int(y + h - 1))
            mask = (labels[y : y + h, x : x + w] == i).astype(np.uint8)
            score = float(prob[y : y + h, x : x + w][mask > 0].mean())
            out.append((bbox, score, 7, mask))
        return out

    def segment_frame(self, rgb: np.ndarray) -> InstanceSegmentationResult:
        import time

        t0 = time.perf_counter_ns()
        detections: List[InstanceDetection] = []
        for bbox, score, class_id, mask in self.raw_detections(rgb):
            cm, dm, km = build_masks(bbox, mask, self.min_area)
            detections.append(InstanceDetection(score, class_id, cm, dm, km))
        return InstanceSegmentationResult(
            instance_detections=detections,
            inference_time_ns=time.perf_counter_ns() - t0,
        )

    def get_seg_preview(self):
        if self._last_prob is None:
            return None
        g = (self._last_prob * 255).astype(np.uint8)
        return np.stack([g, g, g], -1)
