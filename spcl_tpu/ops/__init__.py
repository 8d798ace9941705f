from .supcon_pallas import fused_self_paced_supcon, fused_supcon

__all__ = ["fused_self_paced_supcon", "fused_supcon"]
