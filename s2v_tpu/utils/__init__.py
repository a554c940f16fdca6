from s2v_tpu.utils.config import (  # noqa: F401
    AudioConfig,
    InferenceConfig,
    PipelineConfig,
    TrainConfig,
)
