from stereoanywhere_tpu.serve.camera import (  # noqa: F401
    CaptureLoop,
    DirectorySource,
    OakDSource,
)
from stereoanywhere_tpu.serve.pipeline import StereoAnywherePipeline  # noqa: F401
