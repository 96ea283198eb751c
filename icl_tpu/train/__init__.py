from icl_tpu.train.optim import make_sgd, poly_lr_schedule
from icl_tpu.train.state import TrainState

__all__ = ["make_sgd", "poly_lr_schedule", "TrainState"]
