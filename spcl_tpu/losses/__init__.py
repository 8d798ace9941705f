from .functional import class2one_hot, simplex, probs2one_hot, one_hot_check
from .kl import kl_div, entropy_loss, cross_entropy_onehot
from .supcon import (
    supcon_loss, self_paced_supcon_loss, pairwise_mask_from_labels, SupConAux,
    supcon_loss_in_mode, soft_supcon_loss, block_soft_supcon_loss, assemble_block_weights,
)
from .iic import (iid_loss, iid_segmentation_loss, iid_segmentation_small_patch_loss,
                  compute_joint)
from .pica import pui_loss, pui_seg_loss

__all__ = [
    "class2one_hot", "simplex", "probs2one_hot", "one_hot_check",
    "kl_div", "entropy_loss", "cross_entropy_onehot",
    "supcon_loss", "self_paced_supcon_loss", "pairwise_mask_from_labels", "SupConAux",
    "supcon_loss_in_mode", "soft_supcon_loss", "block_soft_supcon_loss",
    "assemble_block_weights",
    "iid_loss", "iid_segmentation_loss", "iid_segmentation_small_patch_loss",
    "compute_joint",
    "pui_loss", "pui_seg_loss",
]
