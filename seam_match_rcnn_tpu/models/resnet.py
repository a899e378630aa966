"""ResNet-50 + FPN backbone, NHWC, frozen BatchNorm.

TPU-native equivalent of torchvision's ``resnet_fpn_backbone('resnet50')``
used by the reference model factories
(/root/reference/models/matchrcnn.py:486, video_matchrcnn.py:337).  Detection
training keeps BatchNorm frozen (torchvision ``FrozenBatchNorm2d``), so BN
collapses to a per-channel affine whose scale/shift are precomputed from the
running stats by the checkpoint converter — at runtime it is a fused
multiply-add, which XLA folds into the adjacent convolution.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBN(nn.Module):
    """Per-channel affine: y = x * scale + shift.

    scale = gamma / sqrt(running_var + eps), shift = beta - mean * scale,
    both baked in at conversion time.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        shift = self.param("shift", nn.initializers.zeros, (self.features,))
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (stride on the 3x3, ResNet-B)."""

    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, name=name,
        )
        out = conv(self.features, 1, 1, "conv1")(x)
        out = nn.relu(FrozenBN(self.features, self.dtype, name="bn1")(out))
        out = conv(self.features, 3, self.stride, "conv2")(out)
        out = nn.relu(FrozenBN(self.features, self.dtype, name="bn2")(out))
        out = conv(self.features * 4, 1, 1, "conv3")(out)
        out = FrozenBN(self.features * 4, self.dtype, name="bn3")(out)
        if self.downsample:
            x = conv(self.features * 4, 1, self.stride, "downsample_conv")(x)
            x = FrozenBN(self.features * 4, self.dtype, name="downsample_bn")(x)
        return nn.relu(out + x)


class _StemConvParams(nn.Module):
    """Parameter shell matching ``nn.Conv(name="conv1")``'s tree
    (params['conv1']['kernel'], lecun-normal init) so the fused Pallas
    stem shares checkpoints with the XLA stem bit-for-bit."""

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, 3, 64))


class _StemBNParams(nn.Module):
    """Parameter shell matching ``FrozenBN(name="bn1")``'s tree."""

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (64,)),
                self.param("shift", nn.initializers.zeros, (64,)))


class ResNet50(nn.Module):
    """Returns the C2..C5 feature maps (strides 4/8/16/32).

    ``remat=True`` rematerializes each bottleneck in the backward pass
    (jax.checkpoint) — trades ~30% backbone FLOPs for not storing block
    activations, the standard memory lever for large-canvas training.

    ``stem_backend``: "xla" (conv + FrozenBN + relu + maxpool as separate
    XLA ops) or "pallas" (ops/pallas_stem.fused_stem — the conv
    activation never round-trips HBM; same param tree, so checkpoints
    interchange freely).  The fused kernel has no vjp: use it only where
    no gradient reaches the stem (inference, or training with
    config.freeze_backbone_stages — the production default, whose
    stop_gradient sits ABOVE the stem).
    """

    dtype: Any = jnp.float32
    block_counts: Sequence[int] = (3, 4, 6, 3)
    remat: bool = False
    stem_backend: str = "xla"
    # stop_gradient at the layer1/layer2 boundary: the reference freezes
    # stem+layer1 (torchvision trainable_layers=3); with their updates
    # masked anyway (train/optim.backbone_frozen_mask), cutting the grad
    # flow here lets XLA drop the whole stem/layer1 backward — exact, since
    # no trainable parameter's gradient passes through this edge.
    freeze_stages: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        if self.stem_backend == "pallas":
            from ..ops.pallas_stem import fused_stem

            w = _StemConvParams(name="conv1")()
            scale, shift = _StemBNParams(name="bn1")()
            x = fused_stem(x.astype(jnp.float32), w, scale, shift)
            x = x.astype(self.dtype)
        else:
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                use_bias=False, dtype=self.dtype, name="conv1",
            )(x)
            x = nn.relu(FrozenBN(64, self.dtype, name="bn1")(x))
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])

        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        outs = []
        features = 64
        for stage, n_blocks in enumerate(self.block_counts):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = block_cls(
                    features,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            if stage == 0 and self.freeze_stages:
                x = jax.lax.stop_gradient(x)
            outs.append(x)
            features *= 2
        return tuple(outs)


class FPN(nn.Module):
    """torchvision FeaturePyramidNetwork + LastLevelMaxPool.

    Input C2..C5 -> outputs (P2, P3, P4, P5, P6); P6 only feeds the RPN.
    """

    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"inner{i}")(f)
            for i, f in enumerate(feats)
        ]
        # Top-down pathway, nearest-neighbour upsampling.
        for i in range(len(laterals) - 2, -1, -1):
            up = laterals[i + 1]
            h, w = laterals[i].shape[-3], laterals[i].shape[-2]
            up = jnp.repeat(jnp.repeat(up, 2, axis=-3), 2, axis=-2)[..., :h, :w, :]
            laterals[i] = laterals[i] + up
        outs = [
            nn.Conv(
                self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                dtype=self.dtype, name=f"layer{i}",
            )(l)
            for i, l in enumerate(laterals)
        ]
        p6 = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        return tuple(outs) + (p6,)


class BackboneWithFPN(nn.Module):
    dtype: Any = jnp.float32
    remat: bool = False
    freeze_stages: bool = False
    stem_backend: str = "xla"

    @nn.compact
    def __call__(self, x):
        c2, c3, c4, c5 = ResNet50(dtype=self.dtype, remat=self.remat,
                                  freeze_stages=self.freeze_stages,
                                  stem_backend=self.stem_backend,
                                  name="body")(x)
        return FPN(dtype=self.dtype, name="fpn")([c2, c3, c4, c5])
