from stereoanywhere_tpu.models.stereoanywhere import StereoAnywhere  # noqa: F401
