from s2v_tpu.models.dnet import DNet  # noqa: F401
from s2v_tpu.models.enet import ENet  # noqa: F401
from s2v_tpu.models.lnet import LNet  # noqa: F401
