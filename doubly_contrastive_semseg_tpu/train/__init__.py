from .state import TrainState, create_train_state
from .optimizer import build_optimizer, cosine_annealing_schedule
from .steps import make_train_step, make_eval_step
from .trainer import Trainer
