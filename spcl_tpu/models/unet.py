"""2D segmentation UNet, TPU-first.

Capability parity with reference semi_seg/arch/unet.py:100-297, redesigned
for XLA rather than translated:

- **NHWC layout** (TPU-native; torch reference is NCHW).
- The forward returns a ``{stage_name: activation}`` dict instead of using
  torch forward hooks (reference semi_seg/arch/hook.py:13-143 has no JAX
  analog); XLA dead-code-eliminates stages nobody consumes under jit.
- ``until=`` early exit (reference unet.py:156-230) is a *static* argument:
  the traced program genuinely ends at that stage.
- ``set_grad`` stage ranges (reference unet.py:242-259) become parameter
  masks applied to gradients (spcl_tpu/models/masking.py) — a functional
  equivalent that composes with optax.
- BatchNorm is torch-convention (``models/norm.py::TorchBatchNorm``:
  unbiased running-var updates, so reference checkpoints stay eval-exact)
  on flax mutable batch_stats with optional ``axis_name`` so
  running statistics are correct under data parallelism (a capability the
  reference never had); ``set_bn_track`` (reference unet.py:261-287)
  corresponds to calling with ``update_bn_stats=False``.

Stage channel dims: max_channel/16 * {1,2,4,8,16} over the encoder, mirrored
by the decoder (reference unet.py:101-102, 232-239).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norm import TorchBatchNorm

ENCODER_NAMES: Tuple[str, ...] = ("Conv1", "Conv2", "Conv3", "Conv4", "Conv5")
DECODER_NAMES: Tuple[str, ...] = ("Up5", "Up_conv5", "Up4", "Up_conv4", "Up3", "Up_conv3",
                                  "Up2", "Up_conv2", "Deconv_1x1")
ARCH_ELEMENTS: Tuple[str, ...] = ENCODER_NAMES + DECODER_NAMES

# stages that produce returnable feature maps (reference `layer_dimension`)
LAYER_DIMENSION = {"Conv1": 1, "Conv2": 2, "Conv3": 4, "Conv4": 8, "Conv5": 16,
                   "Up_conv5": 8, "Up_conv4": 4, "Up_conv3": 2, "Up_conv2": 1,
                   "Deconv_1x1": None}


@lru_cache()
def arch_order(name: str) -> int:
    return ARCH_ELEMENTS.index(name)


def sort_arch(names: Sequence[str], reverse: bool = False) -> List[str]:
    return sorted(names, key=arch_order, reverse=reverse)


def get_channel_dim(layer_name: str, *, max_channel: int = 256, num_classes: int = None) -> int:
    if layer_name == "Deconv_1x1":
        if num_classes is None:
            raise ValueError("num_classes required for Deconv_1x1")
        return num_classes
    return int(LAYER_DIMENSION[layer_name] / 16 * max_channel)


def stages_up_to(until: Optional[str]) -> Tuple[str, ...]:
    """All computable stages up to and including `until` (None = all)."""
    if until is None:
        return tuple(LAYER_DIMENSION.keys())
    if until not in LAYER_DIMENSION:
        raise KeyError(f"`until` should be one of {list(LAYER_DIMENSION)}, got {until}")
    keys = list(LAYER_DIMENSION.keys())
    return tuple(keys[: keys.index(until) + 1])


class _ConvNCHW(nn.Module):
    """3x3 bias-free conv on NCHW operands with the SAME param tree as
    nn.Conv (param "kernel", HWIO shape). Small-C stages run channels-second
    so the minor (lane) dim is W (224 -> one 256 tile, ~14% pad) instead of
    the batch axis XLA picks for C<128 NHWC convs (2N=60 -> 128 lanes =
    2.13x padded HBM traffic on every stage-1/2 tensor; profiled round 3)."""
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[1], self.out_ch), jnp.float32)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NCHW", "HWIO", "NCHW"))


class ConvBlock(nn.Module):
    """(conv3x3 -> BN -> ReLU) x 2, bias-free convs (reference unet.py:67-82).

    data_format "NCHW" runs the block channels-second (see _ConvNCHW) with an
    IDENTICAL parameter tree — checkpoints are interchangeable."""
    out_ch: int
    momentum: float = 0.1  # torch convention: running = (1-m)*running + m*batch
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    data_format: str = "NHWC"

    @nn.compact
    def __call__(self, x, *, train: bool):
        # `disable_bn` (reference new_epocher.py:216-226) is realized at the
        # apply() level: run with mutable batch_stats and discard the update.
        nchw = self.data_format == "NCHW"
        for i in range(2):
            if nchw:
                x = _ConvNCHW(self.out_ch, dtype=self.dtype, name=f"conv{i}")(x)
            else:
                x = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False,
                            dtype=self.dtype, name=f"conv{i}")(x)
            x = TorchBatchNorm(use_running_average=not train,
                               momentum=1.0 - self.momentum, dtype=self.dtype,
                               axis_name=self.axis_name if train else None,
                               axis=1 if nchw else -1,
                               name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class UpConv(nn.Module):
    """nearest-upsample x2 -> conv3x3 -> BN -> ReLU (reference unet.py:85-97)."""
    out_ch: int
    momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        x = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=1.0 - self.momentum,
                           dtype=self.dtype,
                           axis_name=self.axis_name if train else None, name="bn")(x)
        return nn.relu(x)


class UNet(nn.Module):
    """5-stage encoder / 4-stage decoder UNet with named-stage outputs."""
    input_dim: int = 1
    num_classes: int = 4
    max_channel: int = 256
    momentum: float = 0.1
    # Compute dtype. Params and BN running buffers stay f32, and BN
    # STATISTICS are still reduced in f32 (flax upcasts for _compute_stats);
    # under bf16 the normalize/affine apply runs in bf16 so activations stay
    # bf16 end to end instead of bouncing bf16->f32->bf16 at every BN —
    # measured 17.28 -> 13.45 ms/step bf16 (round 4, device plane).
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None  # mesh axis for cross-replica BN stats
    # "nchw": encoder stages 1-2 (C = max_channel/16, /8 < 128) run
    # channels-second so W (not the lane-padded batch) is the minor dim —
    # cuts stage-1/2 HBM traffic ~2x at the reference 2N=60 batch (profiled
    # round 3). Param tree identical; activations in `acts` stay NHWC.
    small_c_layout: str = "nhwc"

    def channel_dim(self, name: str) -> int:
        return get_channel_dim(name, max_channel=self.max_channel, num_classes=self.num_classes)

    @nn.compact
    def __call__(self, x, *, train: bool = False, until: Optional[str] = None,
                 ) -> Dict[str, jnp.ndarray]:
        """Run the net, returning `{stage: activation}` for every computed stage.

        `until` is static: tracing stops at that stage (reference
        unet.py:156-230's partial forward). The final logits live under
        both "Deconv_1x1" and "logits".
        """
        assert self.max_channel % 16 == 0 and self.max_channel >= 128, self.max_channel
        stages_up_to(until)  # validates `until`
        kw = dict(momentum=self.momentum, dtype=self.dtype, axis_name=self.axis_name)
        x = x.astype(self.dtype)
        acts: Dict[str, jnp.ndarray] = {}

        def pool(v):
            # nn.max_pool (reduce_window + select-and-scatter bwd) is the
            # MEASURED winner. Three replacement attempts lost on the device
            # plane: reshape-pool w/ first-index VJP 27.6 vs 23.4 f32 (round
            # 2); equality-mask custom VJP 18.27 vs 17.28 bf16 and pairwise
            # strided-quadrant max 28.1 (round 4 — breaking the
            # select-and-scatter boundary restructures the BN/ReLU backward
            # fusions at a net loss; see experimental/maxpool.py).
            return nn.max_pool(v, (2, 2), strides=(2, 2))

        from ..experimental.packed_stage import packable as _packable
        shapes_ok = (x.shape[1] % 4 == 0
                     and _packable(x.shape[2], self.channel_dim("Conv1"),
                                   self.channel_dim("Conv2")))
        use_packed = self.small_c_layout == "packed" and shapes_ok
        # "pallas": the fused train-mode stage kernels; eval mode (running
        # stats, tiny fraction of a run) takes the plain path below
        use_pallas = self.small_c_layout == "pallas" and shapes_ok and train
        if use_pallas:
            from ..experimental.packed_stage import PallasConvStage, packed_pool, unpack
            c1, c2 = self.channel_dim("Conv1"), self.channel_dim("Conv2")
            p1, e1p = PallasConvStage(self.input_dim, c1, momentum=self.momentum,
                                      dtype=self.dtype, first_conv_nhwc=True,
                                      name="Conv1")(x)
            e1 = unpack(e1p, c1)
            acts["Conv1"] = e1
            if until == "Conv1":
                return acts
            p2p, e2p = PallasConvStage(c1, c2, momentum=self.momentum,
                                       dtype=self.dtype, name="Conv2")(p1)
            e2 = unpack(e2p, c2)
            acts["Conv2"] = e2
            if until == "Conv2":
                return acts
            p2 = unpack(p2p, c2)
        elif use_packed:
            # lane-packed stages 1-2 (experimental/packed_stage.py): activations as
            # [B, H, W*C/128, 128] — full 128-lane tiles whatever layout XLA
            # assigns — with the 3x3 convs as dense banded 128x128 matmuls.
            # `acts` keeps NHWC views (reshapes; DCE'd when unconsumed).
            # NOTE: cross-replica BN axis_name is not needed here — under
            # GSPMD jit the BN sums are already global reductions.
            from ..experimental.packed_stage import PackedConvStage, packed_pool, unpack
            c1, c2 = self.channel_dim("Conv1"), self.channel_dim("Conv2")
            e1p = PackedConvStage(self.input_dim, c1, momentum=self.momentum,
                                  dtype=self.dtype, first_conv_nhwc=True,
                                  name="Conv1")(x, train=train)
            e1 = unpack(e1p, c1)
            acts["Conv1"] = e1
            if until == "Conv1":
                return acts
            e2p = PackedConvStage(c1, c2, momentum=self.momentum,
                                  dtype=self.dtype,
                                  name="Conv2")(packed_pool(e1p, c1), train=train)
            e2 = unpack(e2p, c2)
            acts["Conv2"] = e2
            if until == "Conv2":
                return acts
            p2 = unpack(packed_pool(e2p, c2), c2)
        elif self.small_c_layout == "nchw":
            # stages 1-2 channels-second (see class docstring); `acts` keeps
            # the NHWC view — XLA dead-code-eliminates it when unconsumed
            xc = jnp.transpose(x, (0, 3, 1, 2))
            e1c = ConvBlock(self.channel_dim("Conv1"), name="Conv1",
                            data_format="NCHW", **kw)(xc, train=train)
            e1 = jnp.transpose(e1c, (0, 2, 3, 1))
            acts["Conv1"] = e1
            if until == "Conv1":
                return acts
            p1 = jax.lax.reduce_window(e1c, -jnp.inf, jax.lax.max,
                                       (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
            e2c = ConvBlock(self.channel_dim("Conv2"), name="Conv2",
                            data_format="NCHW", **kw)(p1, train=train)
            e2 = jnp.transpose(e2c, (0, 2, 3, 1))
            acts["Conv2"] = e2
            if until == "Conv2":
                return acts
            p2 = jnp.transpose(
                jax.lax.reduce_window(e2c, -jnp.inf, jax.lax.max,
                                      (1, 1, 2, 2), (1, 1, 2, 2), "VALID"),
                (0, 2, 3, 1))
        else:
            e1 = ConvBlock(self.channel_dim("Conv1"), name="Conv1", **kw)(x, train=train)
            acts["Conv1"] = e1
            if until == "Conv1":
                return acts
            e2 = ConvBlock(self.channel_dim("Conv2"), name="Conv2", **kw)(pool(e1), train=train)
            acts["Conv2"] = e2
            if until == "Conv2":
                return acts
            p2 = pool(e2)
        e3 = ConvBlock(self.channel_dim("Conv3"), name="Conv3", **kw)(p2, train=train)
        acts["Conv3"] = e3
        if until == "Conv3":
            return acts
        e4 = ConvBlock(self.channel_dim("Conv4"), name="Conv4", **kw)(pool(e3), train=train)
        acts["Conv4"] = e4
        if until == "Conv4":
            return acts
        e5 = ConvBlock(self.channel_dim("Conv5"), name="Conv5", **kw)(pool(e4), train=train)
        acts["Conv5"] = e5
        if until == "Conv5":
            return acts

        d5 = UpConv(self.channel_dim("Up_conv5"), name="Up5", **kw)(e5, train=train)
        d5 = ConvBlock(self.channel_dim("Up_conv5"), name="Up_conv5", **kw)(
            jnp.concatenate([e4, d5], axis=-1), train=train)
        acts["Up_conv5"] = d5
        if until == "Up_conv5":
            return acts

        d4 = UpConv(self.channel_dim("Up_conv4"), name="Up4", **kw)(d5, train=train)
        d4 = ConvBlock(self.channel_dim("Up_conv4"), name="Up_conv4", **kw)(
            jnp.concatenate([e3, d4], axis=-1), train=train)
        acts["Up_conv4"] = d4
        if until == "Up_conv4":
            return acts

        d3 = UpConv(self.channel_dim("Up_conv3"), name="Up3", **kw)(d4, train=train)
        d3 = ConvBlock(self.channel_dim("Up_conv3"), name="Up_conv3", **kw)(
            jnp.concatenate([e2, d3], axis=-1), train=train)
        acts["Up_conv3"] = d3
        if until == "Up_conv3":
            return acts

        d2 = UpConv(self.channel_dim("Up_conv2"), name="Up2", **kw)(d3, train=train)
        d2 = ConvBlock(self.channel_dim("Up_conv2"), name="Up_conv2", **kw)(
            jnp.concatenate([e1, d2], axis=-1), train=train)
        acts["Up_conv2"] = d2
        if until == "Up_conv2":
            return acts

        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="Deconv_1x1")(d2)
        logits = logits.astype(jnp.float32)
        acts["Deconv_1x1"] = logits
        acts["logits"] = logits
        return acts
