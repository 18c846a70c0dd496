"""dynslam_tpu — a TPU-native dense dynamic-SLAM framework.

A from-scratch rebuild of the capabilities of DynSLAM (Barsan et al., ICRA
2018; reference at /root/reference) designed TPU-first:

- Stereo disparity: cost-volume matching (census + box aggregation) as
  jitted XLA / Pallas kernels instead of libelas/DispNet (CPU/CUDA).
- Sparse scene flow + visual odometry: convolutional feature detection,
  MXU-backed descriptor matching, vmapped RANSAC + Gauss-Newton — the
  libviso2 equivalent.
- Dense mapping: a struct-of-arrays voxel *block pool* with a
  frustum-local dense index cache instead of InfiniTAM's GPU voxel hash;
  fusion / raycast / voxel-decay GC are batched jitted kernels.
- Dynamic objects: host-side track data association (tiny N, branchy),
  device-side silhouette masking and a *batched* per-object TSDF pool.
- Evaluation: the reference's LIDAR-vs-depth protocol as one vectorized
  pass, emitting the same CSV schema.

Layer map mirrors SURVEY.md: io/ (Input, calib, velodyne, masks),
ops/ (depth, stereo, features, ransac, tsdf, raycast, meshing),
instances/ (tracker, tracks, reconstructor), pipeline/ (orchestrator),
eval/ (harness + records), models/ (learned disparity), parallel/
(mesh sharding for batch evaluation / training).
"""

__version__ = "0.1.0"

from dynslam_tpu.config import (  # noqa: F401
    DynSlamConfig,
    SceneParams,
    StereoCalibration,
    VoxelDecayParams,
)
