from tpu_asr.train.optim import noam_schedule, make_optimizer
from tpu_asr.train.loop import TrainState, make_train_step, make_eval_step, Solver

__all__ = ["noam_schedule", "make_optimizer", "TrainState",
           "make_train_step", "make_eval_step", "Solver"]
