"""Pure-JAX numerics: geometry, cost-volume ops, interpolation, LSQ, fuzzy logic.

NumPy/torch-oracle unit tests live in tests/test_ops_*.py.
"""

from stereoanywhere_tpu.ops.interp import (  # noqa: F401
    resize_bilinear_align_corners,
    resize_trilinear_align_corners,
    avg_pool2d,
    pool2x,
    pool4x,
    interp_like,
)
from stereoanywhere_tpu.ops.geometry import (  # noqa: F401
    joint_minmax_normalize,
    estimate_normals,
    disp_warping,
    softlrc,
)
from stereoanywhere_tpu.ops.volume import (  # noqa: F401
    all_pairs_correlation,
    generate_masks,
    estimate_left_disparity,
    estimate_right_disparity,
    estimate_left_confidence,
    estimate_right_confidence,
    truncate_corr_volume,
    gauss_corr_volume,
    handcrafted_mirror_detector,
)
from stereoanywhere_tpu.ops.fuzzy import fuzzy_and, fuzzy_or, fuzzy_not  # noqa: F401
from stereoanywhere_tpu.ops.lsq import weighted_lsq, normalized_scale_and_shift  # noqa: F401
from stereoanywhere_tpu.ops.upsample import convex_upsample, upflow  # noqa: F401
from stereoanywhere_tpu.ops.corr_lookup import CorrPyramid, build_corr_pyramid, lookup_corr_pyramid  # noqa: F401
