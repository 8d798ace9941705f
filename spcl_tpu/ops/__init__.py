from .supcon_pallas import (fused_self_paced_supcon, fused_supcon,
                            sharded_fused_self_paced_supcon)

# Single source of truth for the fused-kernel dispatch threshold (total rows
# 2N of the similarity matrix). Measured crossover on the v5e DEVICE PLANE
# (scripts/measure_crossover2.py; round-3 table in RESULTS.md /
# benchmarks/crossover2_r3.json): the fused kernel wins at EVERY measured
# size — 1.46x @2N=128, ~1.2x @256-2048, 2.36x @4096. 128 is the floor simply
# because smaller batches were not measured and the loss cost there is
# negligible either way (<6us). Both dispatch sites (hooks/infonce.py and
# parallel/contrastive.py) must import this constant, not hardcode it
# (tests/test_parallel_fused.py pins that).
FUSED_MIN_ROWS = 128

__all__ = ["fused_self_paced_supcon", "fused_supcon",
           "sharded_fused_self_paced_supcon", "FUSED_MIN_ROWS"]
