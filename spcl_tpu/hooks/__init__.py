from .base import TrainerHook, CombineTrainerHook, get_individual_hooks, label_from_contrast_on
from .infonce import INFONCEHook, SelfPacedINFONCEHook
from .consistency import ConsistencyTrainerHook
from .mt import MeanTeacherTrainerHook
from .ucmt import UCMeanTeacherTrainerHook
from .entmin import EntropyMinTrainerHook
from .mixup import MixUpHook
from .discretemi import DiscreteMITrainHook
from .mine import MineTrainHook
from .midl import MIDLPaperTrainerHook
from .creator import (
    create_hook_from_config, create_infonce_hooks, create_sp_infonce_hooks,
    create_discrete_mi_consistency_hook, create_consistency_hook, create_mt_hook,
    create_ent_min_hook, create_mixup_hook, create_mine_hooks, create_uc_mt_hook,
    create_midl_hook, feature_until_from_hooks, LEGACY_TRAINER_PRESETS,
)

__all__ = [
    "TrainerHook", "CombineTrainerHook", "get_individual_hooks", "label_from_contrast_on",
    "INFONCEHook", "SelfPacedINFONCEHook", "ConsistencyTrainerHook",
    "MeanTeacherTrainerHook", "UCMeanTeacherTrainerHook", "EntropyMinTrainerHook",
    "MixUpHook", "DiscreteMITrainHook", "MineTrainHook", "MIDLPaperTrainerHook",
    "create_hook_from_config", "create_infonce_hooks", "create_sp_infonce_hooks",
    "create_discrete_mi_consistency_hook", "create_consistency_hook", "create_mt_hook",
    "create_ent_min_hook", "create_mixup_hook", "create_mine_hooks", "create_uc_mt_hook",
    "create_midl_hook", "feature_until_from_hooks", "LEGACY_TRAINER_PRESETS",
]
