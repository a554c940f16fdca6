from s2v_tpu.ops.image import (  # noqa: F401
    avg_pool_2x2,
    resize_bilinear,
    resize_nearest,
    reflect_pad_2d,
)
from s2v_tpu.ops.norms import (  # noqa: F401
    batch_norm_inference,
    instance_norm_2d,
    layer_norm_chw,
)
from s2v_tpu.ops.warp import (  # noqa: F401
    convert_flow_to_deformation,
    grid_sample_bilinear,
    warp_image,
)
