"""spcl_tpu — TPU-native self-paced contrastive learning framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
jizongFox/Self-paced-Contrastive-Learning (the `contrastyou` package):
semi-supervised medical image segmentation with meta-label supervised
contrastive pretraining and self-paced pair weighting
(reference: /root/reference, NeurIPS 2021, arXiv 2107.13741).

Design principles (TPU-first, not a port):
- all compute under `jax.jit`: the model forward, the augmentation, the
  contrastive loss, and the optimizer update are one fused XLA program;
- the NxN contrastive loss is a blockwise Pallas kernel that never
  materializes pair masks in HBM (spcl_tpu/ops/);
- multi-chip scaling via a `jax.sharding.Mesh` over a `data` axis with
  an `all_gather` of projector embeddings so the similarity matrix
  spans the global batch (spcl_tpu/parallel/);
- the host side (config, sampling, meters, checkpoint policy) mirrors
  the reference's public surface.
"""
import os
from pathlib import Path

__version__ = "0.2.0"

# Persistent XLA compilation cache: first compiles in this environment go
# through a remote-compile relay (minutes for big programs); cache them.
try:
    import jax as _jax

    _cache_dir = os.environ.get("SPCL_JAX_CACHE", os.path.expanduser("~/.cache/spcl_jax"))
    Path(_cache_dir).mkdir(parents=True, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

PROJECT_PATH = str(Path(__file__).parents[1])
DATA_PATH = os.environ.get("SPCL_DATA_PATH", str(Path(PROJECT_PATH) / ".data"))
OUTPUT_PATH = os.environ.get("SPCL_OUTPUT_PATH", str(Path(PROJECT_PATH) / "runs"))
CONFIG_PATH = str(Path(PROJECT_PATH) / "config")


def success(save_dir: str) -> None:
    """Touch a `.success` marker in the run dir on completion.

    Mirrors reference contrastyou/__init__.py:46-49 (consumed by cluster
    scripts that clean up failed runs).
    """
    Path(save_dir).mkdir(parents=True, exist_ok=True)
    (Path(save_dir) / ".success").touch()
