from .gamma import PScheduler, LinearScheduler, ExpScheduler, InverseExpScheduler, RampScheduler
from .lr import warmup_cosine_epoch_schedule

__all__ = ["PScheduler", "LinearScheduler", "ExpScheduler", "InverseExpScheduler",
           "RampScheduler", "warmup_cosine_epoch_schedule"]
