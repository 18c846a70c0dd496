from dynslam_tpu.io.calib import (  # noqa: F401
    KittiCalibration,
    read_kitti_calibration,
    read_kitti_poses,
    write_kitti_calibration,
    write_kitti_poses,
)
from dynslam_tpu.io.depth_providers import (  # noqa: F401
    DepthProvider,
    PrecomputedDepthProvider,
    StereoMatcherDepthProvider,
)
from dynslam_tpu.io.input import (  # noqa: F401
    Input,
    InputConfig,
    kitti_odometry_config,
    kitti_odometry_dispnet_config,
    kitti_odometry_lowres_config,
    kitti_tracking_config,
    kitti_tracking_dispnet_config,
)
from dynslam_tpu.io.velodyne import VelodyneIO  # noqa: F401
