from s2v_tpu.pipeline.utils import (  # noqa: F401
    find_crop_norm_ratio,
    laplacian_pyramid_blend,
    mask_postprocess,
    split_coeff,
    transform_semantic,
)
