from .unet import UNet, arch_order, sort_arch, get_channel_dim, ENCODER_NAMES, DECODER_NAMES, ARCH_ELEMENTS
from .heads import ProjectionHead, DenseProjectionHead, ClusterHead, DenseClusterHead
from .discriminator import Discriminator
from .ema import ema_update
from .masking import stage_trainable_mask, zero_grads_by_mask, stages_from_range

__all__ = [
    "UNet", "arch_order", "sort_arch", "get_channel_dim",
    "ENCODER_NAMES", "DECODER_NAMES", "ARCH_ELEMENTS",
    "ProjectionHead", "DenseProjectionHead", "ClusterHead", "DenseClusterHead",
    "Discriminator", "ema_update",
    "stage_trainable_mask", "zero_grads_by_mask", "stages_from_range",
]
