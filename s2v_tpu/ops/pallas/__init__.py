from s2v_tpu.ops.pallas.fused_act import fused_bias_leaky_relu  # noqa: F401
from s2v_tpu.ops.pallas.upfirdn2d import upfirdn2d  # noqa: F401
