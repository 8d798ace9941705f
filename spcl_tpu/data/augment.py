"""On-device fused augmentation.

Replaces the reference's PIL transform zoo + synchronized wrappers
(contrastyou/augment/pil_augment.py, synchronize.py:75-164) with pure JAX
functions that run *inside* the jitted train step: resize + rotation + flips
+ random crop composed into a single source-coordinate map (one gather per
view — bilinear for images / nearest for labels under the SAME PRNG key, the
key-threading equivalent of the reference's seed-synchronized transforms),
plus grayscale intensity jitter (brightness/contrast; torch's saturation is
an identity on single-channel inputs).

Resize (reference semi_seg/augment.py:57,74,86 Resize(224) shortest-side;
:106,124,136 Resize((256,256)) exact) is a per-sample scale term in the
source map: packed datasets carry the original slice extents (SliceDataset
.sizes), the resized frame is computed from them, and the rest of the
pipeline (rotation/flip/crop) operates in that frame. The (dst+0.5)*scale-0.5
convention matches PIL/torch bilinear (align_corners=False) and torch
nearest-exact for labels.

Op order parity: the reference's pretrain policies rotate BEFORE the random
crop (Resize -> Rotation -> Flips -> Crop) while its finetune ("label")
policies crop FIRST and rotate the crop (ACDC/mmWHS label: Crop -> Rot30,
Spleen label: Resize -> Crop -> Rot10 — semi_seg/augment.py:23-34,122-134,
158-168). `AugmentPolicy.rotate_after_crop` selects the composition.

Two-view semantics (reference synchronize.py:127-164):
- total_freedom=True  -> independent geometry + intensity per view;
- total_freedom=False -> SHARED geometry key, independent intensity keys.

Also provides the replayable batch flip used by the semi-supervised step
(deepclustering2 TensorRandomFlip parity, reference new_epocher.py:112,
158-170), `apply_cutout` (reference PILCutout, pil_augment.py:38-68) and
`sobel_process` (reference SobelProcess, pil_augment.py:375-425).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------- policies
@dataclass(frozen=True)
class AugmentPolicy:
    crop: int = 224
    # None: no resize. int r: torchvision Resize(r) — shortest side -> r,
    # aspect kept. (h, w): exact resize (Resize((h, w))).
    resize: Union[None, int, Tuple[int, int]] = None
    rot_degrees: float = 45.0
    # False: rotate -> flip -> crop (pretrain policies); True: crop -> rotate
    # (the reference's finetune policies rotate the cropped patch).
    rotate_after_crop: bool = False
    hflip: bool = True
    vflip: bool = True
    crop_padding: int = 0
    brightness: Tuple[float, float] = (0.5, 1.5)
    contrast: Tuple[float, float] = (0.5, 1.5)
    jitter: bool = True


# reference semi_seg/augment.py policies, op-for-op:
# ACDC (:6-51): pretrain Rot45+VFlip+HFlip+Crop224 / jitter 0.5-1.5;
#               label Crop224 -> Rot30; val CenterCrop224.
ACDC_PRETRAIN = AugmentPolicy(crop=224, rot_degrees=45.0, hflip=True, vflip=True,
                              brightness=(0.5, 1.5), contrast=(0.5, 1.5), jitter=True)
ACDC_LABEL = AugmentPolicy(crop=224, rot_degrees=30.0, rotate_after_crop=True,
                           hflip=False, vflip=False, jitter=False)
ACDC_VAL = AugmentPolicy(crop=224, rot_degrees=0.0, hflip=False, vflip=False, jitter=False)
# Prostate/ProstateMD (:54-100): pretrain Resize(224)+Rot10+Flips+Crop(224,pad=20)
# / jitter 0.9-1.1; label Resize(224)+Crop224; val Resize(224).
PROSTATE_PRETRAIN = AugmentPolicy(crop=224, resize=224, rot_degrees=10.0,
                                  hflip=True, vflip=True, crop_padding=20,
                                  brightness=(0.9, 1.1), contrast=(0.9, 1.1), jitter=True)
PROSTATE_LABEL = AugmentPolicy(crop=224, resize=224, rot_degrees=0.0,
                               hflip=False, vflip=False, jitter=False)
# faithful shortest-side Resize(224) (reference semi_seg/augment.py:84-87):
# non-square slices resize to (224, L) / (L, 224); the eval step pads the
# frame into a static canvas sized from the dataset's extents and masks
# loss/dice to frame pixels (augment.frame_pixel_mask).
PROSTATE_VAL = AugmentPolicy(crop=224, resize=224, rot_degrees=0.0,
                             hflip=False, vflip=False, jitter=False)
# Spleen (:103-137): pretrain Resize((256,256))+Rot10+Flips+Crop(256,pad=20)
# / jitter 0.9-1.1; label Resize((256,256))+Crop(256,pad=20) -> Rot10;
# val Resize((256,256)).
SPLEEN_PRETRAIN = AugmentPolicy(crop=256, resize=(256, 256), rot_degrees=10.0,
                                hflip=True, vflip=True, crop_padding=20,
                                brightness=(0.9, 1.1), contrast=(0.9, 1.1), jitter=True)
SPLEEN_LABEL = AugmentPolicy(crop=256, resize=(256, 256), rot_degrees=10.0,
                             rotate_after_crop=True, crop_padding=20,
                             hflip=False, vflip=False, jitter=False)
SPLEEN_VAL = AugmentPolicy(crop=256, resize=(256, 256), rot_degrees=0.0,
                           hflip=False, vflip=False, jitter=False)

# dataset -> transform-class mapping per reference semi_seg/data/creator.py:17-19
# (mmWHS uses the ACDC transforms; prostate_md uses the Prostate ones).
POLICY_ZOO = {
    "acdc": {"pretrain": ACDC_PRETRAIN, "label": ACDC_LABEL, "val": ACDC_VAL},
    "prostate": {"pretrain": PROSTATE_PRETRAIN, "label": PROSTATE_LABEL, "val": PROSTATE_VAL},
    "prostate_md": {"pretrain": PROSTATE_PRETRAIN, "label": PROSTATE_LABEL, "val": PROSTATE_VAL},
    "mmwhsct": {"pretrain": ACDC_PRETRAIN, "label": ACDC_LABEL, "val": ACDC_VAL},
    "mmwhsmr": {"pretrain": ACDC_PRETRAIN, "label": ACDC_LABEL, "val": ACDC_VAL},
    "spleen": {"pretrain": SPLEEN_PRETRAIN, "label": SPLEEN_LABEL, "val": SPLEEN_VAL},
}


# --------------------------------------------------------------------------- geometry
def _orig_dims(batch: int, in_size: int, sizes: Optional[jnp.ndarray]):
    """Per-sample original slice extents (float). sizes [B,2] = stored (h,w)
    of each slice inside its square canvas; None means full canvas."""
    if sizes is None:
        full = jnp.full((batch,), float(in_size), jnp.float32)
        return full, full
    s = sizes.astype(jnp.float32)
    return s[:, 0], s[:, 1]


def _frame_dims(policy: AugmentPolicy, oh: jnp.ndarray, ow: jnp.ndarray):
    """Resized-frame extents. PIL/torchvision Resize(int) scales the shortest
    side to exactly `size` and TRUNCATES the long side:
    new_long = int(size * long / short) (torchvision F.resize) — so the
    non-shortest side uses floor, and the shortest side is pinned exactly."""
    if policy.resize is None:
        return oh, ow
    if isinstance(policy.resize, int):
        r = float(policy.resize)
        short = jnp.minimum(oh, ow)
        rh = jnp.where(oh <= ow, r, jnp.floor(oh * r / short))
        rw = jnp.where(ow <= oh, r, jnp.floor(ow * r / short))
        return rh, rw
    rh, rw = policy.resize
    return jnp.full_like(oh, float(rh)), jnp.full_like(ow, float(rw))


def sample_geometric(key: jax.Array, batch: int, policy: AugmentPolicy,
                     in_size: int, sizes: Optional[jnp.ndarray] = None
                     ) -> Dict[str, jnp.ndarray]:
    k_rot, k_h, k_v, k_cy, k_cx = jax.random.split(key, 5)
    theta = jax.random.uniform(k_rot, (batch,), minval=-policy.rot_degrees,
                               maxval=policy.rot_degrees) * (jnp.pi / 180.0)
    fh = (jax.random.uniform(k_h, (batch,)) < 0.5) & policy.hflip
    fv = (jax.random.uniform(k_v, (batch,)) < 0.5) & policy.vflip
    oh, ow = _orig_dims(batch, in_size, sizes)
    rh, rw = _frame_dims(policy, oh, ow)
    # RandomCrop(crop, padding=p): pad every side by p, offset ~ U[0, dim+2p-crop]
    # (coordinate in the unpadded frame = offset - p). Frames smaller than the
    # crop (a span the reference would reject) center-pad instead.
    pad = float(policy.crop_padding)

    def _offset(k, dim):
        span = dim + 2.0 * pad - policy.crop
        u = jax.random.uniform(k, (batch,))
        rand = jnp.floor(u * (span + 1.0)) - pad
        return jnp.where(span >= 0, rand, jnp.floor((dim - policy.crop) / 2.0))

    return {"theta": theta, "fh": fh, "fv": fv,
            "cy": _offset(k_cy, rh), "cx": _offset(k_cx, rw),
            "rh": rh, "rw": rw, "oh": oh, "ow": ow}


def center_geometric(batch: int, policy: AugmentPolicy, in_size: int,
                     sizes: Optional[jnp.ndarray] = None,
                     out_size: Optional[int] = None) -> Dict[str, jnp.ndarray]:
    """Deterministic params (val transform parity): plain resize for resize
    policies, center crop of the original extent otherwise. `out_size`
    overrides the output extent (> crop pads around the centered frame —
    the shortest-side val-resize path)."""
    out = policy.crop if out_size is None else out_size
    oh, ow = _orig_dims(batch, in_size, sizes)
    rh, rw = _frame_dims(policy, oh, ow)
    z = jnp.zeros((batch,))
    f = jnp.zeros((batch,), bool)
    return {"theta": z, "fh": f, "fv": f,
            "cy": jnp.floor((rh - out) / 2.0),
            "cx": jnp.floor((rw - out) / 2.0),
            "rh": rh, "rw": rw, "oh": oh, "ow": ow}


def _source_coords(params: Dict[str, jnp.ndarray], crop: int, in_size: int,
                   rotate_after_crop: bool = False):
    """Output-pixel -> canvas-pixel coordinates, composing the inverse of
    resize -> rotate -> flip -> crop (or resize -> flip -> crop -> rotate
    when rotate_after_crop)."""
    ys = jnp.arange(crop, dtype=jnp.float32)
    xs = jnp.arange(crop, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # [crop, crop]

    def per_sample(theta, fh, fv, cy, cx, rh, rw, oh, ow):
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        if rotate_after_crop:
            # undo rotation about the CROP center, then undo crop + flips.
            # The rotation operates on the MATERIALIZED crop (reference
            # Compose([RandomCrop, RandomRotation])): coords falling outside
            # the crop patch are fill=0, not image data — mask them.
            c2 = (crop - 1) / 2.0
            dy, dx = gy - c2, gx - c2
            yc = cos * dy + sin * dx + c2
            xc = -sin * dy + cos * dx + c2
            eps = 1e-3  # tolerate float noise at exact-multiple-of-90 angles
            outside = ((yc < -eps) | (yc > crop - 1 + eps)
                       | (xc < -eps) | (xc > crop - 1 + eps))
            y = yc + cy
            x = xc + cx
            y = jnp.where(fv, (rh - 1.0) - y, y)
            x = jnp.where(fh, (rw - 1.0) - x, x)
            # send outside-crop samples far out of range -> zero fill
            y = jnp.where(outside, -1e6, y)
            x = jnp.where(outside, -1e6, x)
        else:
            # undo crop, flips (about the frame center), then rotation
            y = gy + cy
            x = gx + cx
            y = jnp.where(fv, (rh - 1.0) - y, y)
            x = jnp.where(fh, (rw - 1.0) - x, x)
            ccy, ccx = (rh - 1.0) / 2.0, (rw - 1.0) / 2.0
            dy, dx = y - ccy, x - ccx
            y = cos * dy + sin * dx + ccy
            x = -sin * dy + cos * dx + ccx
        # undo resize: frame [rh, rw] -> original extent [oh, ow]
        # ((dst+0.5)*scale-0.5: PIL / torch align_corners=False convention)
        sy = (y + 0.5) * (oh / rh) - 0.5
        sx = (x + 0.5) * (ow / rw) - 0.5
        # original extent sits centered in the canvas (packing._fit_canvas)
        return (sy + jnp.floor((in_size - oh) / 2.0),
                sx + jnp.floor((in_size - ow) / 2.0))

    return jax.vmap(per_sample)(params["theta"], params["fh"], params["fv"],
                                params["cy"], params["cx"], params["rh"],
                                params["rw"], params["oh"], params["ow"])


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
    """lab [H, W] int; nearest-neighbor with zero fill outside.

    floor(s + 0.5) == floor((dst+0.5)*scale) under the resize convention
    above — exactly PIL NEAREST / torch nearest-exact index selection."""
    h, w = lab.shape
    yi = jnp.floor(sy + 0.5).astype(jnp.int32)
    xi = jnp.floor(sx + 0.5).astype(jnp.int32)
    inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    v = lab[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
    return jnp.where(inside, v, 0)


def _warp_backend(backend: str) -> str:
    """'gather': per-pixel bilinear lookup — exact single-pass interpolation,
    but XLA lowers it to SparseCore gathers on TPU (~80M elem/s: measured 85%
    of the train step, RESULTS.md). 'mxu': gather-free separable-matmul +
    3-shear pipeline (data/warp_mxu.py) — the TPU default. 'auto' picks by
    backend; the SPCL_WARP_BACKEND env var overrides auto (debug escape
    hatch)."""
    if backend != "auto":
        return backend
    import os
    forced = os.environ.get("SPCL_WARP_BACKEND")
    if forced in ("gather", "mxu"):
        return forced
    return "mxu" if jax.default_backend() == "tpu" else "gather"


def _warp_block() -> int:
    """Max views per MXU-warp dispatch (<=0 disables blocking). Default 128 —
    the measured lane-alignment knee; SPCL_WARP_BLOCK overrides (debug)."""
    import os
    try:
        return int(os.environ.get("SPCL_WARP_BLOCK", "128"))
    except ValueError:
        return 128


def mesh_warp_block(mesh) -> Optional[int]:
    """Warp-block default for step builders: under a mesh, blocking is off
    (per-chip batches are small, and reshaping a batch-sharded axis into
    blocks only adds GSPMD regrouping) — unless SPCL_WARP_BLOCK is set
    explicitly, which always wins."""
    import os
    if mesh is None or "SPCL_WARP_BLOCK" in os.environ:
        return None
    return 0


def apply_geometric(image: jnp.ndarray, label: Optional[jnp.ndarray],
                    params: Dict[str, jnp.ndarray], crop: int,
                    rotate_after_crop: bool = False,
                    max_degrees: Optional[float] = None,
                    backend: str = "auto", block: Optional[int] = None):
    """image [B,H,W,C] bilinear; label [B,H,W] nearest — same params.

    max_degrees: static |rotation| bound (policy.rot_degrees); required by
    the mxu backend to size the shear shift range. None -> inferred as 45.
    block: max views per MXU-warp dispatch; None -> the measured 128 default
    (SPCL_WARP_BLOCK env override), 0 -> never block. Mesh step builders pass
    0: per-chip batches are already small, and reshaping a batch-sharded axis
    into blocks would only add GSPMD regrouping."""
    if _warp_backend(backend) == "mxu":
        from .warp_mxu import warp_mxu
        md = 45.0 if max_degrees is None else float(max_degrees)
        blk = _warp_block() if block is None else int(block)
        b = image.shape[0]
        if blk > 0 and b > blk and b % blk:
            # Indivisible batch: fall back to the largest divisor of b that
            # still fits the lane budget, rather than silently running the
            # slow unblocked shape (ADVICE r4). Tiny blocks (<8) would turn
            # lax.map into a long scalar-ish loop — skip blocking there.
            blk = max((d for d in range(1, blk + 1) if b % d == 0))
            if blk < 8:
                blk = 0
        if blk > 0 and b > blk and b % blk == 0:
            # Batch-blocked warp: the shear/canvas ops are lane-efficient only
            # while the batch fits the 128-wide lane dimension — measured
            # per-view warp cost grows ~6x from 128 to 1024 views as XLA
            # switches the canvas layout (RESULTS.md round-4 gradcache
            # section). lax.map keeps every block at the fast <=128 shape
            # (measured -16% to -25% on the whole big-batch step); identical
            # results (pure per-sample math, tests/test_warp_mxu.py). A
            # statically UNROLLED block loop was measured equal (151.8 vs
            # 150.8 ms @512 slices) — the residual penalty is the layout the
            # surrounding graph pins on the block boundaries, not the while
            # body — so the map form wins on program size.
            k = b // blk

            def _blk(a):
                return a.reshape((k, blk) + a.shape[1:])

            params_b = jax.tree_util.tree_map(_blk, params)
            if label is None:
                out_img = jax.lax.map(
                    lambda xs: warp_mxu(xs[0], None, xs[1], crop,
                                        rotate_after_crop, md)[0],
                    (_blk(image), params_b))
                out_lab = None
            else:
                out_img, out_lab = jax.lax.map(
                    lambda xs: warp_mxu(xs[0], xs[1], xs[2], crop,
                                        rotate_after_crop, md),
                    (_blk(image), _blk(label), params_b))
                out_lab = out_lab.reshape((b,) + out_lab.shape[2:])
            return out_img.reshape((b,) + out_img.shape[2:]), out_lab
        return warp_mxu(image, label, params, crop, rotate_after_crop, md)
    in_size = image.shape[1]
    sy, sx = _source_coords(params, crop, in_size, rotate_after_crop)
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
                 policy: AugmentPolicy, sizes: Optional[jnp.ndarray] = None,
                 block: Optional[int] = None):
    kg, kj = jax.random.split(key)
    params = sample_geometric(kg, image.shape[0], policy, image.shape[1], sizes)
    img, lab = apply_geometric(image, label, params, policy.crop,
                               policy.rotate_after_crop, policy.rot_degrees,
                               block=block)
    img = apply_jitter(kj, img, policy)
    return img, lab


def augment_twice(key: jax.Array, image: jnp.ndarray, label: Optional[jnp.ndarray],
                  policy: AugmentPolicy, total_freedom: bool = True,
                  sizes: Optional[jnp.ndarray] = None,
                  block: Optional[int] = None):
    """Two augmented views (reference SequentialWrapperTwice semantics)."""
    kg1, kg2, kj1, kj2 = jax.random.split(key, 4)
    b, s = image.shape[0], image.shape[1]
    p1 = sample_geometric(kg1, b, policy, s, sizes)
    p2 = sample_geometric(kg2, b, policy, s, sizes) if total_freedom else p1
    rac = policy.rotate_after_crop
    img1, lab1 = apply_geometric(image, label, p1, policy.crop, rac,
                                 policy.rot_degrees, block=block)
    img2, lab2 = apply_geometric(image, label, p2, policy.crop, rac,
                                 policy.rot_degrees, block=block)
    img1 = apply_jitter(kj1, img1, policy)
    img2 = apply_jitter(kj2, img2, policy)
    return (img1, lab1), (img2, lab2)


def center_crop(image: jnp.ndarray, label: Optional[jnp.ndarray], crop: int,
                sizes: Optional[jnp.ndarray] = None,
                policy: Optional[AugmentPolicy] = None,
                out_size: Optional[int] = None):
    """Val transform: deterministic center crop, or plain resize for resize
    policies (reference val transforms, semi_seg/augment.py:35-37,84-87,135-137).
    Pads if the frame is smaller than the crop.

    `out_size` > crop: produce a larger static canvas with the resized frame
    centered — used by the shortest-side val resize (Resize(224), prostate)
    whose frame can exceed 224 on the long side of non-square slices."""
    if policy is None:
        policy = AugmentPolicy(crop=crop)
    out = policy.crop if out_size is None else out_size
    params = center_geometric(image.shape[0], policy, image.shape[1], sizes, out)
    return apply_geometric(image, label, params, out, max_degrees=0.0)


def frame_pixel_mask(params: Dict[str, jnp.ndarray], out_size: int) -> jnp.ndarray:
    """[B, out, out] 1/0 mask of output pixels that lie INSIDE the resized
    frame [rh, rw] under the centered placement of `center_geometric` — the
    reference's shortest-side val Resize never produces the padding pixels,
    so eval loss/dice must exclude them (frame pixels only)."""
    ys = jnp.arange(out_size, dtype=jnp.float32)[None, :]
    y = ys + params["cy"][:, None]
    x = ys + params["cx"][:, None]
    my = (y >= -0.1) & (y <= params["rh"][:, None] - 0.9)
    mx = (x >= -0.1) & (x <= params["rw"][:, None] - 0.9)
    return (my[:, :, None] & mx[:, None, :]).astype(jnp.float32)


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


# --------------------------------------------------------------------------- cutout / sobel
def apply_cutout(key: jax.Array, image: jnp.ndarray, min_box: int, max_box: int,
                 pad_value: float = 0.0) -> jnp.ndarray:
    """PILCutout parity (reference pil_augment.py:38-68): per sample, erase one
    square box of size ~ U[min_box, max_box] centered uniformly inside the
    image. image [B, H, W, C]."""
    b, h, w = image.shape[:3]
    kb, ky, kx = jax.random.split(key, 3)
    box = jax.random.randint(kb, (b,), min_box, max_box + 1)
    half = jnp.floor(box / 2.0).astype(jnp.int32)
    # np.random.randint(half, dim - half) semantics
    yc = half + jnp.floor(jax.random.uniform(ky, (b,)) * (h - 2 * half)).astype(jnp.int32)
    xc = half + jnp.floor(jax.random.uniform(kx, (b,)) * (w - 2 * half)).astype(jnp.int32)
    gy = jnp.arange(h)[None, :, None]
    gx = jnp.arange(w)[None, None, :]
    in_y = (gy >= (yc - half)[:, None, None]) & (gy < (yc + half)[:, None, None])
    in_x = (gx >= (xc - half)[:, None, None]) & (gx < (xc + half)[:, None, None])
    hole = (in_y & in_x)[..., None]
    return jnp.where(hole, jnp.asarray(pad_value, image.dtype), image)


_SOBEL_X = jnp.asarray([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]])
_SOBEL_Y = jnp.asarray([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]])


def sobel_process(image: jnp.ndarray, include_origin: bool = False) -> jnp.ndarray:
    """SobelProcess parity (reference pil_augment.py:375-425): x/y gradient
    maps via the fixed 3x3 Sobel kernels (same-padding conv), stacked on the
    channel axis; optionally keep the input channels too.
    image [B, H, W, C] -> [B, H, W, 2] (or [B, H, W, 2+C])."""
    gray = jnp.mean(image, axis=-1, keepdims=True)  # multi-channel -> average
    kern = jnp.stack([_SOBEL_X, _SOBEL_Y], axis=-1)[:, :, None, :]  # [3,3,1,2]
    grads = jax.lax.conv_general_dilated(
        gray, kern, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if include_origin:
        return jnp.concatenate([grads, image], axis=-1)
    return grads
