"""Instance-segmentation data model + precomputed MNC dump reader.

Mirrors the reference's InstRecLib segmentation layer:
- `BoundingBox` with inclusive coords + IoU (Utils/BoundingBox.{h,cpp})
- `Mask` tied to a bbox, with rescale-about-center (Utils/Mask.{h,cpp})
- `InstanceDetection` = {class_probability, class_id, copy/delete/
  conservative masks} (InstanceSegmentationResult.h:21-71)
- Pascal VOC 2012 label set (SegmentationDataset.h:27-33)
- `PrecomputedSegmentationProvider` reading the MNC dump format:
  `cls_%06d.png` preview + `%06d.png.%04d.{result,mask}.txt`
  (PrecomputedSegmentationProvider.cpp:74-159), with the reference's
  3-mask rescale rules and 45x45 min-detection filter.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

PASCAL_VOC_2012_CLASSES = [
    "INVALID",  # VOC 2012 class IDs are 1-based
    "airplane", "bicycle", "bird", "boat", "bottle", "bus", "car",
    "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]
VOC_LABEL_TO_ID = {name: i for i, name in enumerate(PASCAL_VOC_2012_CLASSES)}

#: classes reconstructed in their own TSDF volumes
#: (InstanceReconstructor.cpp:25)
CLASSES_TO_RECONSTRUCT = ("car", "bus")
#: classes cut out of the static map even when not reconstructed
#: (InstanceReconstructor.cpp:27-42)
POSSIBLY_DYNAMIC_CLASSES = (
    "airplane", "bicycle", "bird", "boat", "bus", "car", "cat", "cow",
    "dog", "horse", "motorbike", "person", "sheep", "train",
)


@dataclass
class BoundingBox:
    """Inclusive-coordinate bbox (x0, y0)..(x1, y1). Ref: BoundingBox.h."""

    x0: int
    y0: int
    x1: int
    y1: int

    @property
    def width(self) -> int:
        return self.x1 - self.x0 + 1

    @property
    def height(self) -> int:
        return self.y1 - self.y0 + 1

    @property
    def area(self) -> int:
        return max(self.width, 0) * max(self.height, 0)

    def contains(self, x: int, y: int) -> bool:
        return self.x0 <= x <= self.x1 and self.y0 <= y <= self.y1

    def intersect(self, other: "BoundingBox") -> Optional["BoundingBox"]:
        """Ref: BoundingBox::IntersectWith (BoundingBox.cpp:15-29)."""
        x0 = max(self.x0, other.x0)
        y0 = max(self.y0, other.y0)
        x1 = min(self.x1, other.x1)
        y1 = min(self.y1, other.y1)
        if x0 > x1 or y0 > y1:
            return None
        return BoundingBox(x0, y0, x1, y1)

    def iou(self, other: "BoundingBox") -> float:
        inter = self.intersect(other)
        if inter is None:
            return 0.0
        ia = inter.area
        return ia / float(self.area + other.area - ia)


class Mask:
    """Binary mask over a bbox region. Ref: Utils/Mask.{h,cpp}."""

    def __init__(self, bbox: BoundingBox, data: np.ndarray):
        assert data.shape == (bbox.height, bbox.width), (
            f"mask shape {data.shape} != bbox {bbox.height}x{bbox.width}"
        )
        self.bbox = bbox
        self.data = np.asarray(data, dtype=np.uint8)

    def copy(self) -> "Mask":
        return Mask(BoundingBox(*vars(self.bbox).values()), self.data.copy())

    def rescale(self, amount: float) -> None:
        """Resize about the bbox center. Ref: Mask::Rescale (Mask.cpp:19-44)."""
        import cv2

        old_w, old_h = self.bbox.width, self.bbox.height
        new_w = int(old_w * amount)
        new_h = int(old_h * amount)
        dw, dh = new_w - old_w, new_h - old_h
        new_x0 = self.bbox.x0 - int(math.floor(dw / 2.0))
        new_y0 = self.bbox.y0 - int(math.floor(dh / 2.0))
        new_x1 = self.bbox.x1 + int(math.ceil(dw / 2.0))
        new_y1 = self.bbox.y1 + int(math.ceil(dh / 2.0))
        self.data = cv2.resize(
            self.data, (new_w, new_h), interpolation=cv2.INTER_LINEAR
        )
        self.bbox = BoundingBox(new_x0, new_y0, new_x1, new_y1)
        assert self.bbox.width == new_w and self.bbox.height == new_h

    def contains_point(self, x: int, y: int) -> bool:
        """Ref: Mask.h:49-59."""
        if not self.bbox.contains(x, y):
            return False
        return bool(self.data[y - self.bbox.y0, x - self.bbox.x0])

    def to_full_frame(self, height: int, width: int) -> np.ndarray:
        """Rasterize into a full-frame bool array (device-friendly form)."""
        out = np.zeros((height, width), dtype=bool)
        bx0, by0 = max(self.bbox.x0, 0), max(self.bbox.y0, 0)
        bx1, by1 = min(self.bbox.x1, width - 1), min(self.bbox.y1, height - 1)
        if bx0 > bx1 or by0 > by1:
            return out
        sub = self.data[
            by0 - self.bbox.y0 : by1 - self.bbox.y0 + 1,
            bx0 - self.bbox.x0 : bx1 - self.bbox.x0 + 1,
        ]
        out[by0 : by1 + 1, bx0 : bx1 + 1] = sub > 0
        return out


@dataclass
class InstanceDetection:
    """One detection. Ref: InstanceSegmentationResult.h:21-71."""

    class_probability: float
    class_id: int
    copy_mask: Mask
    delete_mask: Mask
    conservative_mask: Mask

    @property
    def class_name(self) -> str:
        return PASCAL_VOC_2012_CLASSES[self.class_id]

    def is_reconstructable(self) -> bool:
        return self.class_name in CLASSES_TO_RECONSTRUCT

    def is_possibly_dynamic(self) -> bool:
        return self.class_name in POSSIBLY_DYNAMIC_CLASSES

    def __repr__(self):
        b = self.copy_mask.bbox
        return (
            f"InstanceDetection({self.class_name}, p={self.class_probability:.2f}, "
            f"bbox=({b.x0},{b.y0})-({b.x1},{b.y1}))"
        )


@dataclass
class InstanceSegmentationResult:
    """One frame's detections. Ref: InstanceSegmentationResult.h:74-101."""

    instance_detections: List[InstanceDetection] = field(default_factory=list)
    inference_time_ns: int = 0


class SegmentationProvider:
    """ABC. Ref: SegmentationProvider.h:21."""

    def segment_frame(self, rgb: np.ndarray) -> InstanceSegmentationResult:
        raise NotImplementedError

    def get_seg_preview(self) -> Optional[np.ndarray]:
        return None


def build_masks(
    bbox: BoundingBox,
    mask_data: np.ndarray,
    min_area: int,
    copy_scale: float = 1.0,
    delete_scale: float = 1.2,
    conservative_scale: float = 0.97,
) -> tuple:
    """The reference's 3-mask construction incl. the extra x1.2 delete-mask
    growth for small bboxes (PrecomputedSegmentationProvider.cpp:133-150)."""
    copy_mask = Mask(bbox, mask_data)
    delete_mask = copy_mask.copy()
    conservative_mask = copy_mask.copy()
    copy_mask.rescale(copy_scale)
    del_scale = delete_scale
    if bbox.area < min_area * 1.375:
        del_scale *= 1.2
    delete_mask.rescale(del_scale)
    conservative_mask.rescale(conservative_scale)
    return copy_mask, delete_mask, conservative_mask


def detections_from_instance_ids(
    objid: np.ndarray,
    min_size_px: int = 45,
    score: float = 0.95,
    class_id: int = 7,
) -> List["InstanceDetection"]:
    """Ground-truth instance-id image -> InstanceDetection list (the
    MNC-dump role for synthetic data; same 3-mask construction as the
    dump reader). ids <= 0 are background; each positive id becomes one
    detection with the given VOC class (default 7 = car)."""
    dets = []
    for oid in np.unique(objid):
        if oid <= 0:
            continue
        mask = objid == oid
        if mask.sum() < 16:
            continue
        ys, xs = np.nonzero(mask)
        bbox = BoundingBox(int(xs.min()), int(ys.min()),
                           int(xs.max()), int(ys.max()))
        sub = mask[bbox.y0: bbox.y1 + 1, bbox.x0: bbox.x1 + 1]
        cm, dm, km = build_masks(bbox, sub.astype(np.uint8),
                                 min_size_px ** 2)
        dets.append(InstanceDetection(score, class_id, cm, dm, km))
    return dets


class PrecomputedSegmentationProvider(SegmentationProvider):
    """Reads MNC dumps from disk.
    Ref: PrecomputedSegmentationProvider.{h,cpp}."""

    def __init__(
        self,
        seg_folder: str,
        frame_offset: int = 0,
        input_scale: float = 1.0,
        min_detection_size_px: int = 45,
    ):
        self.seg_folder = seg_folder
        self.frame_idx = frame_offset
        self.input_scale = input_scale
        self.min_detection_size_px = min_detection_size_px
        self._last_preview: Optional[np.ndarray] = None

    def _read_mask(self, path: str, width: int, height: int) -> np.ndarray:
        """Numpy-text binary mask, exactly bbox-sized
        (PrecomputedSegmentationProvider.cpp:37-72). Uses the fast C parser
        when the native extension is built; falls back to numpy."""
        try:
            from dynslam_tpu.native import fastio

            data = fastio.read_text_mask(path, height, width)
        except ImportError:
            data = np.loadtxt(path, dtype=np.float64, ndmin=2).astype(np.uint8)
        if data.shape != (height, width):
            raise ValueError(
                f"mask {path!r} has shape {data.shape}, expected {(height, width)}"
            )
        return data

    def read_instance_info(self, base_img_fpath: str) -> List[InstanceDetection]:
        """Ref: ReadInstanceInfo (PrecomputedSegmentationProvider.cpp:74-159)."""
        min_area = int(
            round(self.min_detection_size_px ** 2 * self.input_scale)
        )
        detections: List[InstanceDetection] = []
        instance_idx = 0
        while True:
            result_path = f"{base_img_fpath}.{instance_idx:04d}.result.txt"
            mask_path = f"{base_img_fpath}.{instance_idx:04d}.mask.txt"
            if not (os.path.exists(result_path) and os.path.exists(mask_path)):
                break
            with open(result_path) as f:
                line = f.readline().strip()
            # format: "[x1 y1 x2 y2 junk], probability, class"
            bracket, rest = line.split("]", 1)
            nums = bracket.strip("[").split()
            x0, y0, x1, y1 = (int(float(v)) for v in nums[:4])
            prob_str, class_str = (p.strip() for p in rest.strip(", ").split(",")[:2])
            class_probability = float(prob_str)
            class_id = int(class_str)

            bbox = BoundingBox(x0, y0, x1, y1)
            if bbox.area > min_area:
                mask_data = self._read_mask(mask_path, bbox.width, bbox.height)
                # rescale bbox to the working resolution
                s = self.input_scale
                bbox = BoundingBox(
                    int(round(x0 / s)), int(round(y0 / s)),
                    int(round(x1 / s)), int(round(y1 / s)),
                )
                if bbox.width != mask_data.shape[1] or bbox.height != mask_data.shape[0]:
                    import cv2

                    mask_data = cv2.resize(
                        mask_data, (bbox.width, bbox.height),
                        interpolation=cv2.INTER_NEAREST,
                    )
                cm, dm, km = build_masks(bbox, mask_data, min_area)
                detections.append(
                    InstanceDetection(class_probability, class_id, cm, dm, km)
                )
            instance_idx += 1
        return detections

    def segment_frame(self, rgb: np.ndarray) -> InstanceSegmentationResult:
        import time

        t0 = time.perf_counter_ns()
        base = os.path.join(self.seg_folder, f"{self.frame_idx:06d}.png")
        detections = self.read_instance_info(base)

        preview_path = os.path.join(self.seg_folder, f"cls_{self.frame_idx:06d}.png")
        if os.path.exists(preview_path):
            import cv2

            self._last_preview = cv2.imread(preview_path)[..., ::-1]

        self.frame_idx += 1
        return InstanceSegmentationResult(
            instance_detections=detections,
            inference_time_ns=time.perf_counter_ns() - t0,
        )

    def get_seg_preview(self) -> Optional[np.ndarray]:
        return self._last_preview


def write_mnc_dump(
    seg_folder: str,
    frame_idx: int,
    detections: List[tuple],
    preview: Optional[np.ndarray] = None,
) -> None:
    """Write detections in the MNC dump format (synthetic data generator /
    tests). Each detection is (bbox: BoundingBox, prob, class_id, mask_data).
    """
    os.makedirs(seg_folder, exist_ok=True)
    base = os.path.join(seg_folder, f"{frame_idx:06d}.png")
    for i, (bbox, prob, class_id, mask_data) in enumerate(detections):
        with open(f"{base}.{i:04d}.result.txt", "w") as f:
            f.write(f"[{bbox.x0} {bbox.y0} {bbox.x1} {bbox.y1} 0], {prob:.6f}, {class_id}\n")
        np.savetxt(f"{base}.{i:04d}.mask.txt", np.asarray(mask_data, dtype=np.uint8), fmt="%d")
    if preview is not None:
        import cv2

        cv2.imwrite(
            os.path.join(seg_folder, f"cls_{frame_idx:06d}.png"), preview[..., ::-1]
        )
