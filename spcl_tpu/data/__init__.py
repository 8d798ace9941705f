from .dataset import SliceDataset, extract_sub_dataset_based_on_scan_names, scan_name_from_stem, compute_partition
from .samplers import (InfiniteRandomSampler, ScanBatchSampler, ContrastBatchSampler,
                       LimitedIterationSampler, SequentialBatchSampler)
from .loader import HostLoader, device_prefetch
from .packing import (corrupt_meta_labels, pack_png_folder, synthetic_dataset,
                      synthetic_dataset_hard)
from .creator import get_data, split_dataset, split_dataset_with_predefined_filenames, create_contrastive_loader

__all__ = [
    "SliceDataset", "extract_sub_dataset_based_on_scan_names", "scan_name_from_stem", "compute_partition",
    "InfiniteRandomSampler", "ScanBatchSampler", "ContrastBatchSampler",
    "LimitedIterationSampler", "SequentialBatchSampler",
    "HostLoader", "device_prefetch", "pack_png_folder", "synthetic_dataset",
    "get_data", "split_dataset", "split_dataset_with_predefined_filenames", "create_contrastive_loader",
]
