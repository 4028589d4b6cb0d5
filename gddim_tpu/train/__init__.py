from gddim_tpu.train.state import TrainState, create_train_state
from gddim_tpu.train.losses import make_cld_loss_fn, make_blur_loss_fn
from gddim_tpu.train.step import make_train_step, make_eval_step
