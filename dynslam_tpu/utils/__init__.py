from dynslam_tpu.utils.timers import Timers, tic, toc, toc_micro  # noqa: F401
from dynslam_tpu.utils import se3  # noqa: F401
