from s2v_tpu.models.dnet import DNet  # noqa: F401
from s2v_tpu.models.enet import ENet  # noqa: F401
from s2v_tpu.models.lnet import LNet  # noqa: F401

__all__ = [
    # core generator stack
    "DNet", "LNet", "ENet",
    # detection / landmarks / 3DMM (import from submodules)
    # s2v_tpu.models.s3fd.S3FD, s2v_tpu.models.fan.FAN,
    # s2v_tpu.models.resnet.ReconNet, s2v_tpu.models.bfm.ParametricFaceModel
    # restoration: s2v_tpu.models.{gpen,gfpgan,parsenet,retinaface,rrdbnet}
    # identity: s2v_tpu.models.iresnet.IResNet
    # expression: s2v_tpu.models.ganimation.SplitGenerator
    # audio codec: s2v_tpu.models.encodec.EncodecModel
    # perceptual: s2v_tpu.models.vgg.VGG16Features
]
