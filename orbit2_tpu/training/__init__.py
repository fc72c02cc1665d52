from orbit2_tpu.training.optim import (
    linear_warmup_cosine_annealing,
    make_lr_scheduler,
    make_optimizer,
    set_learning_rate,
)
from orbit2_tpu.training.train import (
    clip_replace_constant,
    evaluate_batch,
    make_eval_step,
    make_train_step,
)
from orbit2_tpu.training.trainer import Trainer
from orbit2_tpu.training import checkpoint
