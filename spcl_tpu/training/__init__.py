from .state import TrainState, create_train_state
from .optim import build_optimizer
from .trainer import (
    Trainer, SemiTrainer, FineTuneTrainer, MixUpTrainer, AdversarialTrainer,
    PretrainEncoderTrainer, PretrainDecoderTrainer, trainer_zoo,
)
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "TrainState", "create_train_state", "build_optimizer",
    "Trainer", "SemiTrainer", "FineTuneTrainer", "MixUpTrainer", "AdversarialTrainer",
    "PretrainEncoderTrainer", "PretrainDecoderTrainer", "trainer_zoo",
    "save_checkpoint", "load_checkpoint",
]
