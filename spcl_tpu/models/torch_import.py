"""torch UNet checkpoint <-> flax UNet variable conversion.

The reference publishes pretrained weights as torch ``.pth`` files whose
``"_model"`` key is a ``UNet.state_dict()``
(/root/reference/contrastyou/utils/utils.py:100-103 extract_model_state_dict;
model defined at /root/reference/semi_seg/arch/unet.py:100-297). This module
maps that state_dict onto the flax ``models/unet.py::UNet`` variable tree so
published weights can seed a finetune here, and back again so our weights can
be inspected with torch tooling.

Layout mapping (torch module path -> flax module name):

    _Conv{k}.conv.0 / .3   -> Conv{k}/conv0, Conv{k}/conv1      (3x3 conv, no bias)
    _Conv{k}.conv.1 / .4   -> Conv{k}/bn0,  Conv{k}/bn1         (BatchNorm)
    _Up_conv{k}.conv.*     -> Up_conv{k}/conv*, Up_conv{k}/bn*
    _Up{k}.up.1 / .up.2    -> Up{k}/conv, Up{k}/bn
    _Deconv_1x1            -> Deconv_1x1                         (1x1 conv + bias)

Tensor transforms: conv weights OIHW -> HWIO; BN weight/bias ->
scale/bias params, running_mean/var -> batch_stats mean/var
(``num_batches_tracked`` is dropped — the flax side has no use for it and
recreates it as step count on export).

Pure numpy <-> dict; torch is only needed by the CLI wrapper
(scripts/import_torch_checkpoint.py), not here.
"""
from __future__ import annotations

import pickle
from typing import Dict, Tuple

import numpy as np

_CONV_BLOCKS = ("Conv1", "Conv2", "Conv3", "Conv4", "Conv5",
                "Up_conv5", "Up_conv4", "Up_conv3", "Up_conv2")
_UP_BLOCKS = ("Up5", "Up4", "Up3", "Up2")


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _hwio_to_oihw(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


def flax_from_torch_state_dict(sd: Dict[str, np.ndarray]
                               ) -> Tuple[Dict, Dict]:
    """torch ``UNet.state_dict()`` (values as numpy arrays) ->
    ``(params, batch_stats)`` for ``models/unet.py::UNet``."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    def bn(prefix: str) -> Tuple[Dict, Dict]:
        p = {"scale": sd[f"{prefix}.weight"].astype(np.float32),
             "bias": sd[f"{prefix}.bias"].astype(np.float32)}
        s = {"mean": sd[f"{prefix}.running_mean"].astype(np.float32),
             "var": sd[f"{prefix}.running_var"].astype(np.float32)}
        return p, s

    for name in _CONV_BLOCKS:
        t = f"_{name}.conv"
        bn0p, bn0s = bn(f"{t}.1")
        bn1p, bn1s = bn(f"{t}.4")
        params[name] = {
            "conv0": {"kernel": _oihw_to_hwio(sd[f"{t}.0.weight"]).astype(np.float32)},
            "bn0": bn0p,
            "conv1": {"kernel": _oihw_to_hwio(sd[f"{t}.3.weight"]).astype(np.float32)},
            "bn1": bn1p,
        }
        stats[name] = {"bn0": bn0s, "bn1": bn1s}
    for name in _UP_BLOCKS:
        t = f"_{name}.up"
        bnp, bns = bn(f"{t}.2")
        params[name] = {
            "conv": {"kernel": _oihw_to_hwio(sd[f"{t}.1.weight"]).astype(np.float32)},
            "bn": bnp,
        }
        stats[name] = {"bn": bns}
    params["Deconv_1x1"] = {
        "kernel": _oihw_to_hwio(sd["_Deconv_1x1.weight"]).astype(np.float32),
        "bias": sd["_Deconv_1x1.bias"].astype(np.float32),
    }
    return params, stats


def torch_state_dict_from_flax(params: Dict, batch_stats: Dict,
                               allow_partial: bool = False
                               ) -> Dict[str, np.ndarray]:
    """Inverse of :func:`flax_from_torch_state_dict` (numpy values, cast to
    f32 so bf16-trained params load into torch's default-dtype modules;
    ``num_batches_tracked`` emitted as 0 — torch only consumes it when
    ``momentum=None``, which the reference never uses).

    ``allow_partial=True`` skips blocks absent from ``params`` (an
    encoder-only pretrain checkpoint stops at ``forward_until``); the torch
    side must then use ``load_state_dict(sd, strict=False)`` — the same
    tolerance the reference's own warm start applies
    (/root/reference/contrastyou/trainer/base.py ``load_state_dict`` on the
    extracted ``"_model"`` dict with the decoder freshly initialized)."""
    import jax

    def f32(x):
        return np.asarray(x, dtype=np.float32)

    params = jax.tree_util.tree_map(f32, params)
    batch_stats = jax.tree_util.tree_map(f32, batch_stats)
    sd: Dict[str, np.ndarray] = {}

    def put_bn(prefix: str, p: Dict, s: Dict) -> None:
        sd[f"{prefix}.weight"] = p["scale"]
        sd[f"{prefix}.bias"] = p["bias"]
        sd[f"{prefix}.running_mean"] = s["mean"]
        sd[f"{prefix}.running_var"] = s["var"]
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)

    def have(name: str) -> bool:
        if name in params:
            return True
        if not allow_partial:
            raise KeyError(
                f"block {name!r} missing from params; encoder-only trees "
                f"need allow_partial=True (torch side: strict=False)")
        return False

    for name in _CONV_BLOCKS:
        if not have(name):
            continue
        t = f"_{name}.conv"
        sd[f"{t}.0.weight"] = _hwio_to_oihw(params[name]["conv0"]["kernel"])
        put_bn(f"{t}.1", params[name]["bn0"], batch_stats[name]["bn0"])
        sd[f"{t}.3.weight"] = _hwio_to_oihw(params[name]["conv1"]["kernel"])
        put_bn(f"{t}.4", params[name]["bn1"], batch_stats[name]["bn1"])
    for name in _UP_BLOCKS:
        if not have(name):
            continue
        t = f"_{name}.up"
        sd[f"{t}.1.weight"] = _hwio_to_oihw(params[name]["conv"]["kernel"])
        put_bn(f"{t}.2", params[name]["bn"], batch_stats[name]["bn"])
    if have("Deconv_1x1"):
        sd["_Deconv_1x1.weight"] = _hwio_to_oihw(params["Deconv_1x1"]["kernel"])
        sd["_Deconv_1x1.bias"] = params["Deconv_1x1"]["bias"]
    return sd


def read_model_tree(checkpoint_path: str) -> Tuple[Dict, Dict]:
    """Raw ``(params['model'], batch_stats)`` out of any spcl_tpu checkpoint
    (full trainer ckpt or warm start) WITHOUT a shape template — the
    template-free counterpart of ``training/checkpoint.py::load_model_params``
    for tooling that only re-serializes the tree (e.g. the torch exporter)."""
    from flax import serialization

    with open(checkpoint_path, "rb") as f:
        blob = pickle.load(f)
    full = serialization.msgpack_restore(blob["state_bytes"])
    return full["params"]["model"], full.get("batch_stats", {})


def write_warm_start(path: str, params: Dict, batch_stats: Dict) -> None:
    """Write a file consumable by ``training/checkpoint.py::load_model_params``
    (the Trainer's model-only warm start): pickled blob whose ``state_bytes``
    msgpack carries ``params.model`` + ``batch_stats``."""
    from flax import serialization

    from ..training.checkpoint import safe_save

    blob = pickle.dumps({
        "state_bytes": serialization.msgpack_serialize(
            {"params": {"model": params}, "batch_stats": batch_stats}),
        "host_meta": {"source": "torch_import"},
    })
    safe_save(blob, path)
