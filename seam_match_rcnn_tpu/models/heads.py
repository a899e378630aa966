"""Detection heads: RPN head, box head/predictor, mask head/predictor.

Equivalents of the torchvision sub-modules the reference's ``NewRoIHeads``
holds (/root/reference/models/matchrcnn.py:43-49): ``RPNHead``,
``TwoMLPHead``, ``FastRCNNPredictor``, ``MaskRCNNHeads`` + ``MaskRCNNPredictor``.
All operate on NHWC; RoI tensors are [N, S, S, C].
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class RPNHead(nn.Module):
    """Shared 3x3 conv + 1x1 objectness/box towers, applied per FPN level.

    torchvision init: every conv kernel ~ N(0, 0.01), zero bias."""

    num_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        init = nn.initializers.normal(stddev=0.01)
        conv = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                       kernel_init=init, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      kernel_init=init, name="cls_logits")
        bbox = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                       kernel_init=init, name="bbox_pred")
        logits, regs = [], []
        for f in feats:
            t = nn.relu(conv(f))
            logits.append(cls(t))
            regs.append(bbox(t))
        return logits, regs


class TwoMLPHead(nn.Module):
    """Box head: flatten 7x7x256 -> fc6 -> fc7 (1024 each).

    Note: the flatten order is HWC here; the torch checkpoint converter
    permutes fc6's weight from torch's CHW flatten order.
    """

    representation_size: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype, name="fc7")(x))
        return x


class FastRCNNPredictor(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(self.num_classes, dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="bbox_pred")(x)
        return scores, deltas


_HE_FAN_OUT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class MaskHead(nn.Module):
    """4 x (conv3x3 256 + relu) on 14x14 RoI features.

    torchvision init: kaiming_normal(fan_out, relu), zero bias."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(4):
            x = nn.Conv(
                256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                kernel_init=_HE_FAN_OUT, name=f"mask_fcn{i + 1}",
            )(x)
            x = nn.relu(x)
        return x


class MaskPredictor(nn.Module):
    """ConvTranspose 2x2/2 + relu + 1x1 per-class logits (28x28)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            256, (2, 2), strides=(2, 2), dtype=self.dtype,
            kernel_init=_HE_FAN_OUT, name="conv5_mask"
        )(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       kernel_init=_HE_FAN_OUT, name="mask_fcn_logits")(x)
