from .logging import setup_logger, seed_all_rng
from .saver import Saver
from .summaries import SummaryWriter
from .params import count_parameters, label_params_for_optimizer
