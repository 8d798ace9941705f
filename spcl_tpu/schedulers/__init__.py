from .gamma import (PScheduler, LinearScheduler, ExpScheduler, InverseExpScheduler,
                    RampScheduler, _EpochScheduler)

# deepclustering2 parity alias: WeightScheduler is the base every gamma/weight
# schedule derives from (reference semi_seg/hooks/infonce.py:34)
WeightScheduler = _EpochScheduler
from .lr import warmup_cosine_epoch_schedule

__all__ = ["PScheduler", "LinearScheduler", "ExpScheduler", "InverseExpScheduler",
           "RampScheduler", "WeightScheduler", "warmup_cosine_epoch_schedule"]
