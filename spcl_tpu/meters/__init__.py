from .metric import Metric
from .averagemeter import AverageValueMeter, MultipleAverageValueMeter, AverageValueListMeter
from .dice import UniversalDice, dice_stats_from_labels
from .surface import SurfaceMeter, hausdorff_distance, average_surface_distance
from .meter_interface import MeterInterface
from .storage import Storage

__all__ = [
    "Metric", "AverageValueMeter", "MultipleAverageValueMeter", "AverageValueListMeter",
    "UniversalDice", "dice_stats_from_labels", "SurfaceMeter",
    "hausdorff_distance", "average_surface_distance", "MeterInterface", "Storage",
]
