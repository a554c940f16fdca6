"""s2v_tpu — TPU-native speech-to-video lip-sync framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
Ryukhaan/speech-to-video-mpp (a VideoReTalking fork): audio-driven talking-head
video editing. Where the reference is a host-orchestrated chain of PyTorch
model suites with per-frame CPU<->GPU ping-pong, this framework treats all
frames of a clip as one sharded array program:

- ``s2v_tpu.audio``    — mel-spectrogram frontend (reference: futils/audio.py)
- ``s2v_tpu.ops``      — image/warp/norm primitives with exact PyTorch
                         semantics, plus Pallas TPU kernels for the hot ops
- ``s2v_tpu.models``   — DNet / LNet / ENet and the restoration stack as
                         flax.linen modules in NHWC layout
- ``s2v_tpu.parallel`` — mesh construction, sharding rules, collectives
                         (reference: torch.distributed / DeepSpeed / PartialFC)
- ``s2v_tpu.pipeline`` — the six-stage inference pipeline (reference:
                         inference.py / preprocessing/facing.py)
- ``s2v_tpu.train``    — optax fine-tuning loops (reference: training.py)
- ``s2v_tpu.io``       — audio/video IO with pluggable codecs
- ``s2v_tpu.utils``    — config tree, artifact cache, checkpoint conversion
"""

__version__ = "0.1.0"
