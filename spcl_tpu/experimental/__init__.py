"""Quarantined experiments: measured-negative designs kept for the record.

Contents are real, oracle-tested implementations whose measured performance
LOSES to the default path; they are not wired into production and exist as
documentation of refuted hypotheses (RESULTS.md, round-3 section):

- ``packed_stage`` / ``packed_block_pallas``: lane-packed stage-1/2 UNet
  layouts (jnp 28.5ms, fused Pallas 78.7ms vs 17.28ms default at 2N=60
  bf16, device plane). Root cause pinned by profile: the pool path's
  interleaved/strided views (even/odd row selects, r-interleaved expand
  conv bwd) force a VREG retile per view, ~25x off bandwidth; strip-size
  and flat-window-tap variations measured perf-neutral, so the cost is
  per-element and structural to this layout. A future attempt must
  deinterleave storage so EVERY op is contiguous, or keep planes in HBM
  with DMA pipelines. Meanwhile the production-shape answer ships instead:
  at 2N=128 the lane padding that motivated these kernels vanishes
  (config/specific/production_pretrain.yaml, ~2x per-slice throughput).

- ``maxpool``: equality-mask custom-VJP and pairwise-strided maxpool
  backwards (18.27 / 28.10 ms bf16 step vs 17.28 with XLA's native
  select-and-scatter, round-4 device plane). Eliminating select-and-scatter
  restructures the BN/ReLU backward fusions at a net loss; the default
  ``nn.max_pool`` stays (models/unet.py pool comment).

Reachable via ``UNet.small_c_layout="packed"|"pallas"`` (guarded off the
mesh path, training/trainer.py) purely for measurement reproduction.
"""
