from dynslam_tpu.instances.track import Track, TrackFrame, TrackState  # noqa: F401
from dynslam_tpu.instances.tracker import InstanceTracker  # noqa: F401
from dynslam_tpu.instances.reconstructor import InstanceReconstructor  # noqa: F401
