from stereoanywhere_tpu.serve.pipeline import StereoAnywherePipeline  # noqa: F401
