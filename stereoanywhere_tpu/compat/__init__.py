from stereoanywhere_tpu.compat.torch_convert import (  # noqa: F401
    convert_stereo_checkpoint,
    convert_dav2_checkpoint,
    load_torch_state_dict,
)
