from .utils import (
    fix_all_seed, fix_all_seed_within_context, ntuple, nlist, config_logger,
    flatten_dict, path2Path, yaml_load, yaml_write, class_name, ExceptionIgnorer,
    gethash, to_numpy, to_float, to_device, item2str,
)
from .rng import KeyChain, key_from_seed

__all__ = [
    "fix_all_seed", "fix_all_seed_within_context", "ntuple", "nlist",
    "gethash", "to_numpy", "to_float", "to_device", "item2str",
    "config_logger", "flatten_dict", "path2Path", "yaml_load", "yaml_write",
    "class_name", "ExceptionIgnorer", "KeyChain", "key_from_seed",
]
