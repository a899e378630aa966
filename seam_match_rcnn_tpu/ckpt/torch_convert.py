"""Torch checkpoint → JAX parameter conversion.

Loads the reference's released checkpoints (torchvision MaskRCNN state_dict
layout plus the match head / temporal aggregator keys added at
/root/reference/models/matchrcnn.py:51 and video_matchrcnn.py:34-37) into
this framework's flax variable tree.  Handles:

* ``module.`` DistributedDataParallel prefix stripping
  (/root/reference/train_movingfashion.py:87);
* the ``{epoch, model_state_dict, optimizer_state_dict, ...}`` wrapper the
  reference CLIs save (/root/reference/train_matchrcnn.py:90-105);
* layout changes: conv OIHW→HWIO, linear [out,in]→[in,out], conv-transpose
  [in,out,kh,kw]→[kh,kw,in,out], 1-d convs → dense;
* fc6's input permutation (torch flattens RoI features CHW, we flatten HWC);
* FrozenBatchNorm folding: (weight, bias, running_mean, running_var) →
  (scale, shift);
* MatchTrunk BatchNorm1d → flax BatchNorm params + batch_stats;
* ``load_saved_matchrcnn`` semantics: optionally clone the match predictor
  weights into the temporal aggregator
  (/root/reference/models/video_matchrcnn.py:325-328).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def unwrap_state_dict(ckpt: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    sd = ckpt.get("model_state_dict", ckpt)
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.endswith("num_batches_tracked"):
            continue
        out[k] = _np(v)
    return out


def _conv(sd, key):
    return {"kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0),
            **({"bias": sd[f"{key}.bias"]} if f"{key}.bias" in sd else {})}


def _dense(sd, key):
    return {"kernel": sd[f"{key}.weight"].T, "bias": sd[f"{key}.bias"]}


def _conv1d_as_dense(sd, key):
    # torch Conv1d k=1 weight [out, in, 1] -> dense kernel [in, out]
    w = sd[f"{key}.weight"][:, :, 0].T
    return {"kernel": w, "bias": sd[f"{key}.bias"]}


def _frozen_bn(sd, key, eps=1e-5):
    w, b = sd[f"{key}.weight"], sd[f"{key}.bias"]
    mean, var = sd[f"{key}.running_mean"], sd[f"{key}.running_var"]
    scale = w / np.sqrt(var + eps)
    return {"scale": scale, "shift": b - mean * scale}


def _fc6(sd, key, spatial=7, channels=256):
    """fc6 weight [1024, C*H*W] with torch CHW flatten -> HWC flatten."""
    w = sd[f"{key}.weight"]  # [1024, C*S*S]
    w = w.reshape(-1, channels, spatial, spatial).transpose(0, 2, 3, 1)
    return {"kernel": w.reshape(w.shape[0], -1).T, "bias": sd[f"{key}.bias"]}


def _conv_transpose(sd, key):
    # torch [in, out, kh, kw] -> flax [kh, kw, in, out].  torch's
    # conv_transpose is the conv gradient (kernel indexed directly); flax's
    # default conv_transpose correlates, so the spatial dims must be flipped
    # (verified exact against torch in tests/test_torch_convert.py).
    w = sd[f"{key}.weight"][:, :, ::-1, ::-1]
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1)),
            "bias": sd[f"{key}.bias"]}


def _resnet_body(sd):
    body = {"conv1": _conv(sd, "backbone.body.conv1"),
            "bn1": _frozen_bn(sd, "backbone.body.bn1")}
    blocks = (3, 4, 6, 3)
    for stage, n in enumerate(blocks):
        for b in range(n):
            pre = f"backbone.body.layer{stage + 1}.{b}"
            entry = {}
            for i in (1, 2, 3):
                entry[f"conv{i}"] = _conv(sd, f"{pre}.conv{i}")
                entry[f"bn{i}"] = _frozen_bn(sd, f"{pre}.bn{i}")
            if f"{pre}.downsample.0.weight" in sd:
                entry["downsample_conv"] = _conv(sd, f"{pre}.downsample.0")
                entry["downsample_bn"] = _frozen_bn(sd, f"{pre}.downsample.1")
            body[f"layer{stage + 1}_{b}"] = entry
    return body


def _fpn(sd):
    fpn = {}
    for i in range(4):
        # torchvision <=0.10: inner_blocks.N.weight; >=0.11: .N.0.weight
        for tk in (f"backbone.fpn.inner_blocks.{i}", f"backbone.fpn.inner_blocks.{i}.0"):
            if f"{tk}.weight" in sd:
                fpn[f"inner{i}"] = _conv(sd, tk)
        for tk in (f"backbone.fpn.layer_blocks.{i}", f"backbone.fpn.layer_blocks.{i}.0"):
            if f"{tk}.weight" in sd:
                fpn[f"layer{i}"] = _conv(sd, tk)
    return fpn


def _rpn(sd):
    conv_key = "rpn.head.conv" if "rpn.head.conv.weight" in sd else "rpn.head.conv.0.0"
    return {"conv": _conv(sd, conv_key),
            "cls_logits": _conv(sd, "rpn.head.cls_logits"),
            "bbox_pred": _conv(sd, "rpn.head.bbox_pred")}


def _match_trunk(sd, prefix):
    """MatchPredictor/TemporalAggregation trunk
    (/root/reference/models/match_head.py:50-62)."""
    params = {}
    for i, torch_i in enumerate((0, 2, 4, 6)):
        params[f"conv{i}"] = _conv(sd, f"{prefix}.conv_seq.{torch_i}")
    params["linear"] = _dense(sd, f"{prefix}.linear.0")
    bn_w = sd[f"{prefix}.linear.1.weight"]
    bn_b = sd[f"{prefix}.linear.1.bias"]
    params["bn"] = {"scale": bn_w, "bias": bn_b}
    stats = {"bn": {"mean": sd[f"{prefix}.linear.1.running_mean"],
                    "var": sd[f"{prefix}.linear.1.running_var"]}}
    return params, stats


def _match_predictor(sd, prefix="roi_heads.match_predictor"):
    trunk, stats = _match_trunk(sd, prefix)
    params = {"trunk": trunk,
              "last": {"kernel": sd[f"{prefix}.last.weight"].T,
                       "bias": sd[f"{prefix}.last.bias"]}}
    return params, {"trunk": stats}


def _temporal_aggregator(sd, prefix="roi_heads.temporal_aggregator"):
    trunk, stats = _match_trunk(sd, prefix)
    params = {
        "trunk": trunk,
        "last": {"kernel": sd[f"{prefix}.last.weight"].T,
                 "bias": sd[f"{prefix}.last.bias"]},
        "attention_scorer": _dense(sd, f"{prefix}.attention_scorer"),
        "nlb": {
            "theta": _conv1d_as_dense(sd, f"{prefix}.newnlb.theta"),
            "phi": _conv1d_as_dense(sd, f"{prefix}.newnlb.phi"),
            "g": _conv1d_as_dense(sd, f"{prefix}.newnlb.g"),
            "w_z": _conv1d_as_dense(sd, f"{prefix}.newnlb.W"),
            # concat_project Conv2d(2C', 1, 1, bias=False): [1, 2C', 1, 1]
            "concat_w": sd[f"{prefix}.newnlb.concat_project.0.weight"][:, :, 0, 0].T,
        },
    }
    return params, {"trunk": stats}


def convert_state_dict(
    state_dict: Mapping[str, Any],
    video: bool = False,
    clone_match_to_aggregator: bool = False,
) -> Dict[str, Any]:
    """Torch state_dict -> flax variables {'params': ..., 'batch_stats': ...}."""
    sd = unwrap_state_dict(state_dict)
    params: Dict[str, Any] = {
        "backbone": {"body": _resnet_body(sd), "fpn": _fpn(sd)},
        "rpn_head": _rpn(sd),
        "box_head": {"fc6": _fc6(sd, "roi_heads.box_head.fc6"),
                     "fc7": _dense(sd, "roi_heads.box_head.fc7")},
        "box_predictor": {"cls_score": _dense(sd, "roi_heads.box_predictor.cls_score"),
                          "bbox_pred": _dense(sd, "roi_heads.box_predictor.bbox_pred")},
        "mask_head": {f"mask_fcn{i}": _conv(sd, f"roi_heads.mask_head.mask_fcn{i}")
                      for i in (1, 2, 3, 4)},
        "mask_predictor": {
            "conv5_mask": _conv_transpose(sd, "roi_heads.mask_predictor.conv5_mask"),
            "mask_fcn_logits": _conv(sd, "roi_heads.mask_predictor.mask_fcn_logits"),
        },
    }
    stats: Dict[str, Any] = {}
    mp, mp_stats = _match_predictor(sd)
    params["match_predictor"] = mp
    stats["match_predictor"] = mp_stats

    if video:
        if "roi_heads.temporal_aggregator.linear.0.weight" in sd:
            ta, ta_stats = _temporal_aggregator(sd)
        else:
            ta, ta_stats = None, None
        if ta is None or clone_match_to_aggregator:
            # load_saved_matchrcnn: aggregator warm-started from the match
            # predictor (trunk + last); NLB/attention keep their init.
            base = ta if ta is not None else _fresh_aggregator_extras()
            base["trunk"] = copy.deepcopy(mp["trunk"])
            base["last"] = copy.deepcopy(mp["last"])
            ta = base
            ta_stats = copy.deepcopy(mp_stats)
        params["temporal_aggregator"] = ta
        stats["temporal_aggregator"] = ta_stats
    return {"params": params, "batch_stats": stats}


def _fresh_aggregator_extras(d_model: int = 256) -> Dict[str, Any]:
    """Freshly-initialized NLB/attention params (zero-init W ⇒ identity
    residual, matching /root/reference/models/nlb.py:46-49)."""
    rng = np.random.RandomState(0)
    inter = d_model // 2

    def dense(i, o):
        lim = 1.0 / np.sqrt(i)
        return {"kernel": rng.uniform(-lim, lim, (i, o)).astype(np.float32),
                "bias": rng.uniform(-lim, lim, (o,)).astype(np.float32)}

    return {
        "attention_scorer": dense(d_model, 1),
        "nlb": {
            "theta": dense(d_model, inter),
            "phi": dense(d_model, inter),
            "g": dense(d_model, inter),
            "w_z": {"kernel": np.zeros((inter, d_model), np.float32),
                    "bias": np.zeros((d_model,), np.float32)},
            "concat_w": rng.uniform(
                -1 / np.sqrt(2 * inter), 1 / np.sqrt(2 * inter), (2 * inter, 1)
            ).astype(np.float32),
        },
    }


def load_torch_checkpoint(path: str, video: bool = False,
                          clone_match_to_aggregator: bool = False):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return convert_state_dict(ckpt, video=video,
                              clone_match_to_aggregator=clone_match_to_aggregator)


def load_pretrained_detector(path: str, base_variables,
                             clone_match_to_aggregator: bool = True):
    """Warm-start a (video) model from a phase-1 checkpoint of EITHER kind:

    * a torch file (the reference's released ``df2matchrcnn``) — routed
      through ``convert_state_dict``;
    * an Orbax directory produced by our own ``cli.train_matchrcnn``
      (payload {'state': {params, batch_stats, ...}, 'epoch'}) — the
      reference flow phase-1 → phase-2 (train_movingfashion.py:85-89) with
      native checkpoints.

    ``base_variables`` supplies the video model's fresh extras (NLB /
    attention_scorer init); with ``clone_match_to_aggregator`` the
    aggregator trunk+last are cloned from the match predictor, mirroring
    ``load_saved_matchrcnn`` (/root/reference/models/video_matchrcnn.py:325-328).
    """
    import os

    if not os.path.isdir(path):
        return load_torch_checkpoint(
            path, video=True,
            clone_match_to_aggregator=clone_match_to_aggregator)

    from .io import restore_checkpoint

    payload = restore_checkpoint(path)
    state = payload.get("state", payload)
    p1_params = state["params"]
    p1_stats = state.get("batch_stats", {})

    params = dict(base_variables["params"])
    stats = dict(base_variables.get("batch_stats", {}))
    for k, v in p1_params.items():
        params[k] = v
    for k, v in p1_stats.items():
        stats[k] = v
    if clone_match_to_aggregator and "match_predictor" in p1_params:
        ta = dict(params.get("temporal_aggregator", _fresh_aggregator_extras()))
        ta["trunk"] = copy.deepcopy(p1_params["match_predictor"]["trunk"])
        ta["last"] = copy.deepcopy(p1_params["match_predictor"]["last"])
        params["temporal_aggregator"] = ta
        if "match_predictor" in p1_stats:
            stats["temporal_aggregator"] = copy.deepcopy(
                p1_stats["match_predictor"])
    return {"params": params, "batch_stats": stats}


def import_imagenet_backbone(variables, resnet_state_dict) -> dict:
    """Warm-start the backbone body from a plain torchvision ``resnet50``
    ImageNet state_dict (keys ``conv1.weight``, ``layer1.0.conv1.weight``, …)
    — the reference's ``pretrained_backbone=True``
    (/root/reference/models/matchrcnn.py:486).  FPN and heads keep their
    init.  Returns a new variables tree."""
    sd = {f"backbone.body.{k}": _np(v) for k, v in resnet_state_dict.items()
          if not k.startswith("fc.") and not k.endswith("num_batches_tracked")}
    import jax
    import jax.numpy as jnp

    params = jax.tree.map(lambda x: x, variables["params"])
    params = dict(params)
    backbone = dict(params["backbone"])
    backbone["body"] = jax.tree.map(jnp.asarray, _resnet_body(sd))
    params["backbone"] = backbone
    return dict(variables, params=params)
