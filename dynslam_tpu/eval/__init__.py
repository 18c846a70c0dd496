from dynslam_tpu.eval.records import (  # noqa: F401
    DepthResult,
    DepthEvaluation,
    DepthFrameEvaluation,
    TrackletEvaluation,
    MemoryUsageEntry,
)
from dynslam_tpu.eval.csv_writer import CsvWriter  # noqa: F401
