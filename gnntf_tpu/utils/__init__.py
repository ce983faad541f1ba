from .checkpoint import (all_steps, latest_step, restore_checkpoint,
                         save_checkpoint)
from .logging import TrainLogger
from .profiling import StepTimer, fetch_barrier, named_scope, roofline, trace
