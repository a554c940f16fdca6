from s2v_tpu.train.finetune import TrainState, make_train_step  # noqa: F401
from s2v_tpu.train.losses import l1_loss, perceptual_stub  # noqa: F401
