from stereoanywhere_tpu.eval.metrics import (  # noqa: F401
    guided_metrics,
    depth_metrics,
    kitti_metrics,
    middlebury_metrics,
    booster_metrics,
)
