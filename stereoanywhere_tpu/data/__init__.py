from stereoanywhere_tpu.data.datasets import fetch_dataset  # noqa: F401
