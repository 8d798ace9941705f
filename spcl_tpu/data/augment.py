"""On-device fused augmentation.

Replaces the reference's PIL transform zoo + synchronized wrappers
(contrastyou/augment/pil_augment.py, synchronize.py:75-164) with pure JAX
functions that run *inside* the jitted train step: one affine warp per view
(rotation + flips + random crop composed into a single 2x2+offset map,
bilinear for images / nearest for labels under the SAME PRNG key — the
key-threading equivalent of the reference's seed-synchronized transforms),
plus grayscale intensity jitter (brightness/contrast; torch's saturation is
an identity on single-channel inputs).

Two-view semantics (reference synchronize.py:127-164):
- total_freedom=True  -> independent geometry + intensity per view;
- total_freedom=False -> SHARED geometry key, independent intensity keys.

Also provides the replayable batch flip used by the semi-supervised step
(deepclustering2 TensorRandomFlip parity, reference new_epocher.py:112,158-170):
`flip_params(key, n)` draws per-sample H/V flip decisions once, and
`apply_flip` replays them on images, logits, or feature maps of any spatial
resolution.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------- policies
@dataclass(frozen=True)
class AugmentPolicy:
    crop: int = 224
    rot_degrees: float = 45.0
    hflip: bool = True
    vflip: bool = True
    crop_padding: int = 0
    brightness: Tuple[float, float] = (0.5, 1.5)
    contrast: Tuple[float, float] = (0.5, 1.5)
    jitter: bool = True


# reference semi_seg/augment.py policies
ACDC_PRETRAIN = AugmentPolicy(crop=224, rot_degrees=45.0, hflip=True, vflip=True,
                              brightness=(0.5, 1.5), contrast=(0.5, 1.5), jitter=True)
ACDC_LABEL = AugmentPolicy(crop=224, rot_degrees=30.0, hflip=False, vflip=False, jitter=False)
PROSTATE_PRETRAIN = AugmentPolicy(crop=224, rot_degrees=10.0, hflip=True, vflip=True,
                                  crop_padding=20, brightness=(0.9, 1.1),
                                  contrast=(0.9, 1.1), jitter=True)
PROSTATE_LABEL = AugmentPolicy(crop=224, rot_degrees=0.0, hflip=False, vflip=False, jitter=False)

POLICY_ZOO = {
    "acdc": {"pretrain": ACDC_PRETRAIN, "label": ACDC_LABEL},
    "prostate": {"pretrain": PROSTATE_PRETRAIN, "label": PROSTATE_LABEL},
    "prostate_md": {"pretrain": PROSTATE_PRETRAIN, "label": PROSTATE_LABEL},
    "mmwhsct": {"pretrain": ACDC_PRETRAIN, "label": ACDC_LABEL},
    "mmwhsmr": {"pretrain": ACDC_PRETRAIN, "label": ACDC_LABEL},
    "spleen": {"pretrain": ACDC_PRETRAIN, "label": ACDC_LABEL},
}


# --------------------------------------------------------------------------- geometry
def sample_geometric(key: jax.Array, batch: int, policy: AugmentPolicy,
                     in_size: int) -> Dict[str, jnp.ndarray]:
    k_rot, k_h, k_v, k_cy, k_cx = jax.random.split(key, 5)
    theta = jax.random.uniform(k_rot, (batch,), minval=-policy.rot_degrees,
                               maxval=policy.rot_degrees) * (jnp.pi / 180.0)
    fh = (jax.random.uniform(k_h, (batch,)) < 0.5) & policy.hflip
    fv = (jax.random.uniform(k_v, (batch,)) < 0.5) & policy.vflip
    span = in_size + 2 * policy.crop_padding - policy.crop
    span = max(span, 0)
    cy = jax.random.randint(k_cy, (batch,), 0, span + 1) - policy.crop_padding
    cx = jax.random.randint(k_cx, (batch,), 0, span + 1) - policy.crop_padding
    return {"theta": theta, "fh": fh, "fv": fv, "cy": cy, "cx": cx}


def center_geometric(batch: int, policy: AugmentPolicy, in_size: int) -> Dict[str, jnp.ndarray]:
    """Deterministic center-crop params (val transform parity)."""
    off = (in_size - policy.crop) // 2
    z = jnp.zeros((batch,))
    return {"theta": z, "fh": jnp.zeros((batch,), bool), "fv": jnp.zeros((batch,), bool),
            "cy": jnp.full((batch,), off, jnp.int32), "cx": jnp.full((batch,), off, jnp.int32)}


def _source_coords(params: Dict[str, jnp.ndarray], crop: int, in_size: int):
    """Output-pixel -> input-pixel coordinates, composing crop ∘ flip ∘ rotate
    (inverse of the torch op order rotate -> flip -> crop)."""
    ys = jnp.arange(crop, dtype=jnp.float32)
    xs = jnp.arange(crop, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # [crop, crop]

    def per_sample(theta, fh, fv, cy, cx):
        # undo crop: coords in the (rotated+flipped) full frame
        y = gy + cy.astype(jnp.float32)
        x = gx + cx.astype(jnp.float32)
        # undo flips (about the full-frame center)
        c = (in_size - 1) / 2.0
        y = jnp.where(fv, (in_size - 1) - y, y)
        x = jnp.where(fh, (in_size - 1) - x, x)
        # undo rotation about center: source = R(-theta) . (p - c) + c
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        dy, dx = y - c, x - c
        sy = cos * dy + sin * dx + c
        sx = -sin * dy + cos * dx + c
        return sy, sx

    return jax.vmap(per_sample)(params["theta"], params["fh"], params["fv"],
                                params["cy"], params["cx"])  # [B, crop, crop] x2


def _gather_bilinear(img: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray) -> jnp.ndarray:
    """img [H, W, C]; sy/sx [h, w] float source coords; zero fill outside."""
    h, w = img.shape[:2]
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return v * inside[..., None]

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    wy_ = wy[..., None]
    wx_ = wx[..., None]
    return (v00 * (1 - wy_) * (1 - wx_) + v01 * (1 - wy_) * wx_
            + v10 * wy_ * (1 - wx_) + v11 * wy_ * wx_)


def _gather_nearest(lab: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray) -> jnp.ndarray:
    """lab [H, W] int; nearest-neighbor with zero fill outside."""
    h, w = lab.shape
    yi = jnp.round(sy).astype(jnp.int32)
    xi = jnp.round(sx).astype(jnp.int32)
    inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    v = lab[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
    return jnp.where(inside, v, 0)


def apply_geometric(image: jnp.ndarray, label: Optional[jnp.ndarray],
                    params: Dict[str, jnp.ndarray], crop: int):
    """image [B,H,W,C] bilinear; label [B,H,W] nearest — same params."""
    in_size = image.shape[1]
    sy, sx = _source_coords(params, crop, in_size)
    out_img = jax.vmap(_gather_bilinear)(image, sy, sx)
    out_lab = None if label is None else jax.vmap(_gather_nearest)(label, sy, sx)
    return out_img, out_lab


# --------------------------------------------------------------------------- intensity
def apply_jitter(key: jax.Array, image: jnp.ndarray, policy: AugmentPolicy) -> jnp.ndarray:
    """Grayscale ColorJitter parity: brightness then contrast, clamped [0,1]."""
    if not policy.jitter:
        return image
    b = image.shape[0]
    kb, kc = jax.random.split(key)
    br = jax.random.uniform(kb, (b, 1, 1, 1), minval=policy.brightness[0],
                            maxval=policy.brightness[1])
    ct = jax.random.uniform(kc, (b, 1, 1, 1), minval=policy.contrast[0],
                            maxval=policy.contrast[1])
    x = jnp.clip(image * br, 0.0, 1.0)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    return jnp.clip((x - mean) * ct + mean, 0.0, 1.0)


# --------------------------------------------------------------------------- composed views
def augment_once(key: jax.Array, image: jnp.ndarray, label: Optional[jnp.ndarray],
                 policy: AugmentPolicy):
    kg, kj = jax.random.split(key)
    params = sample_geometric(kg, image.shape[0], policy, image.shape[1])
    img, lab = apply_geometric(image, label, params, policy.crop)
    img = apply_jitter(kj, img, policy)
    return img, lab


def augment_twice(key: jax.Array, image: jnp.ndarray, label: Optional[jnp.ndarray],
                  policy: AugmentPolicy, total_freedom: bool = True):
    """Two augmented views (reference SequentialWrapperTwice semantics)."""
    kg1, kg2, kj1, kj2 = jax.random.split(key, 4)
    b, s = image.shape[0], image.shape[1]
    p1 = sample_geometric(kg1, b, policy, s)
    p2 = sample_geometric(kg2, b, policy, s) if total_freedom else p1
    img1, lab1 = apply_geometric(image, label, p1, policy.crop)
    img2, lab2 = apply_geometric(image, label, p2, policy.crop)
    img1 = apply_jitter(kj1, img1, policy)
    img2 = apply_jitter(kj2, img2, policy)
    return (img1, lab1), (img2, lab2)


def center_crop(image: jnp.ndarray, label: Optional[jnp.ndarray], crop: int):
    """Val transform: deterministic center crop (pads if input is smaller)."""
    params = center_geometric(image.shape[0], AugmentPolicy(crop=crop), image.shape[1])
    return apply_geometric(image, label, params, crop)


# --------------------------------------------------------------------------- replayable flips
def flip_params(key: jax.Array, n: int, threshold: float = 0.8) -> Dict[str, jnp.ndarray]:
    """Per-sample H/V flip decisions (TensorRandomFlip(axis=[1,2], threshold) parity:
    each axis flips independently with probability `threshold`)."""
    kh, kv = jax.random.split(key)
    return {"fh": jax.random.uniform(kh, (n,)) < threshold,
            "fv": jax.random.uniform(kv, (n,)) < threshold}


def apply_flip(x: jnp.ndarray, params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Replay flips on [B, H, W, C] (works at any H, W — logits or features)."""
    fv = params["fv"][:, None, None, None]
    fh = params["fh"][:, None, None, None]
    x = jnp.where(fv, jnp.flip(x, axis=1), x)
    x = jnp.where(fh, jnp.flip(x, axis=2), x)
    return x
