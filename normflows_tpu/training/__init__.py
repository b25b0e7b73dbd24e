from .checkpoint import save_checkpoint, restore_checkpoint, CheckpointManager
from .loop import TrainState, make_train_step, make_chunked_train_step
