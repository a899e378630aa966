import numpy as np
import pytest

torch = pytest.importorskip("torch")

import chex
import flax.linen as fnn
import jax
import jax.numpy as jnp

from seam_match_rcnn_tpu.ckpt import torch_convert as tc
from seam_match_rcnn_tpu.config import ModelConfig, RPNConfig, RoIHeadsConfig
from seam_match_rcnn_tpu.models.matchrcnn import MatchRCNN, init_model


def synthetic_state_dict(num_classes=14, video=True, seed=0):
    """Synthetic torch state_dict with torchvision-era key names/shapes."""
    rng = np.random.RandomState(seed)
    sd = {}

    def add(name, *shape):
        sd[name] = torch.from_numpy(rng.randn(*shape).astype(np.float32) * 0.05)

    def add_bn(name, c):
        add(f"{name}.weight", c)
        add(f"{name}.bias", c)
        sd[f"{name}.running_mean"] = torch.from_numpy(rng.randn(c).astype(np.float32) * 0.05)
        sd[f"{name}.running_var"] = torch.from_numpy(
            rng.uniform(0.5, 1.5, c).astype(np.float32)
        )
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0)

    add("backbone.body.conv1.weight", 64, 3, 7, 7)
    add_bn("backbone.body.bn1", 64)
    blocks = (3, 4, 6, 3)
    in_c = 64
    f = 64
    for s, n in enumerate(blocks):
        for b in range(n):
            pre = f"backbone.body.layer{s + 1}.{b}"
            add(f"{pre}.conv1.weight", f, in_c if b == 0 else f * 4, 1, 1)
            add_bn(f"{pre}.bn1", f)
            add(f"{pre}.conv2.weight", f, f, 3, 3)
            add_bn(f"{pre}.bn2", f)
            add(f"{pre}.conv3.weight", f * 4, f, 1, 1)
            add_bn(f"{pre}.bn3", f * 4)
            if b == 0:
                add(f"{pre}.downsample.0.weight", f * 4, in_c, 1, 1)
                add_bn(f"{pre}.downsample.1", f * 4)
        in_c = f * 4
        f *= 2
    for i, c in enumerate((256, 512, 1024, 2048)):
        add(f"backbone.fpn.inner_blocks.{i}.weight", 256, c, 1, 1)
        add(f"backbone.fpn.inner_blocks.{i}.bias", 256)
        add(f"backbone.fpn.layer_blocks.{i}.weight", 256, 256, 3, 3)
        add(f"backbone.fpn.layer_blocks.{i}.bias", 256)
    add("rpn.head.conv.weight", 256, 256, 3, 3)
    add("rpn.head.conv.bias", 256)
    add("rpn.head.cls_logits.weight", 3, 256, 1, 1)
    add("rpn.head.cls_logits.bias", 3)
    add("rpn.head.bbox_pred.weight", 12, 256, 1, 1)
    add("rpn.head.bbox_pred.bias", 12)
    add("roi_heads.box_head.fc6.weight", 1024, 256 * 7 * 7)
    add("roi_heads.box_head.fc6.bias", 1024)
    add("roi_heads.box_head.fc7.weight", 1024, 1024)
    add("roi_heads.box_head.fc7.bias", 1024)
    add("roi_heads.box_predictor.cls_score.weight", num_classes, 1024)
    add("roi_heads.box_predictor.cls_score.bias", num_classes)
    add("roi_heads.box_predictor.bbox_pred.weight", num_classes * 4, 1024)
    add("roi_heads.box_predictor.bbox_pred.bias", num_classes * 4)
    for i in range(1, 5):
        add(f"roi_heads.mask_head.mask_fcn{i}.weight", 256, 256, 3, 3)
        add(f"roi_heads.mask_head.mask_fcn{i}.bias", 256)
    add("roi_heads.mask_predictor.conv5_mask.weight", 256, 256, 2, 2)
    add("roi_heads.mask_predictor.conv5_mask.bias", 256)
    add("roi_heads.mask_predictor.mask_fcn_logits.weight", num_classes, 256, 1, 1)
    add("roi_heads.mask_predictor.mask_fcn_logits.bias", num_classes)

    def add_match(prefix):
        for torch_i, (ci, co) in zip(
            (0, 2, 4, 6), [(256, 256), (256, 256), (256, 256), (256, 1024)]
        ):
            add(f"{prefix}.conv_seq.{torch_i}.weight", co, ci, 3, 3)
            add(f"{prefix}.conv_seq.{torch_i}.bias", co)
        add(f"{prefix}.linear.0.weight", 256, 1024)
        add(f"{prefix}.linear.0.bias", 256)
        add_bn(f"{prefix}.linear.1", 256)
        add(f"{prefix}.last.weight", 2, 256)
        add(f"{prefix}.last.bias", 2)

    add_match("roi_heads.match_predictor")
    if video:
        add_match("roi_heads.temporal_aggregator")
        add("roi_heads.temporal_aggregator.attention_scorer.weight", 1, 256)
        add("roi_heads.temporal_aggregator.attention_scorer.bias", 1)
        for nm in ("theta", "phi", "g"):
            add(f"roi_heads.temporal_aggregator.newnlb.{nm}.weight", 128, 256, 1)
            add(f"roi_heads.temporal_aggregator.newnlb.{nm}.bias", 128)
        add("roi_heads.temporal_aggregator.newnlb.W.weight", 256, 128, 1)
        add("roi_heads.temporal_aggregator.newnlb.W.bias", 256)
        add("roi_heads.temporal_aggregator.newnlb.concat_project.0.weight", 1, 256, 1, 1)
    return sd


def test_convert_tree_matches_model(tmp_path):
    sd = synthetic_state_dict()
    variables = tc.convert_state_dict(sd, video=True)
    cfg = ModelConfig(
        rpn=RPNConfig(pre_nms_top_n_test=50, post_nms_top_n_test=80),
        roi_heads=RoIHeadsConfig(detections_per_img=5),
        compute_dtype="float32",
    )
    _, init_vars = init_model(cfg, video=True, canvas=(64, 64))
    chex.assert_trees_all_equal_shapes(
        jax.tree.map(jnp.asarray, variables["params"]), init_vars["params"]
    )
    chex.assert_trees_all_equal_shapes(
        jax.tree.map(jnp.asarray, variables["batch_stats"]), init_vars["batch_stats"]
    )


def test_convert_runs_inference():
    sd = synthetic_state_dict()
    # also exercise ckpt wrapper + module. prefix stripping
    wrapped = {"epoch": 3, "model_state_dict": {f"module.{k}": v for k, v in sd.items()}}
    variables = jax.tree.map(jnp.asarray, tc.convert_state_dict(wrapped, video=True))
    cfg = ModelConfig(
        rpn=RPNConfig(pre_nms_top_n_test=50, post_nms_top_n_test=80),
        roi_heads=RoIHeadsConfig(detections_per_img=5),
        compute_dtype="float32",
    )
    model = MatchRCNN(cfg=cfg, video=True)
    out = model.apply(
        variables,
        jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32),
        jnp.asarray([[64, 64]], jnp.int32),
        method=MatchRCNN.inference,
    )
    assert np.isfinite(np.asarray(out["match_features"])).all()


def test_clone_match_to_aggregator():
    sd = synthetic_state_dict(video=False)
    variables = tc.convert_state_dict(sd, video=True, clone_match_to_aggregator=True)
    p = variables["params"]
    np.testing.assert_array_equal(
        p["temporal_aggregator"]["trunk"]["linear"]["kernel"],
        p["match_predictor"]["trunk"]["linear"]["kernel"],
    )
    # NLB W zero-init => identity residual
    assert (p["temporal_aggregator"]["nlb"]["w_z"]["kernel"] == 0).all()


def test_import_imagenet_backbone():
    # plain torchvision resnet50 state_dict naming (no backbone.body prefix)
    full = synthetic_state_dict(video=False)
    resnet_sd = {
        k[len("backbone.body."):]: v for k, v in full.items()
        if k.startswith("backbone.body.")
    }
    resnet_sd["fc.weight"] = torch.zeros(1000, 2048)
    resnet_sd["fc.bias"] = torch.zeros(1000)

    from seam_match_rcnn_tpu.config import ModelConfig, RPNConfig, RoIHeadsConfig
    from seam_match_rcnn_tpu.models.matchrcnn import init_model

    cfg = ModelConfig(
        rpn=RPNConfig(pre_nms_top_n_test=20, post_nms_top_n_test=30),
        roi_heads=RoIHeadsConfig(detections_per_img=4),
        compute_dtype="float32",
    )
    _, variables = init_model(cfg, video=False, canvas=(64, 64))
    new_vars = tc.import_imagenet_backbone(variables, resnet_sd)
    got = np.asarray(new_vars["params"]["backbone"]["body"]["conv1"]["kernel"])
    want = resnet_sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want)
    # FPN untouched
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["backbone"]["fpn"]["inner0"]["kernel"]),
        np.asarray(variables["params"]["backbone"]["fpn"]["inner0"]["kernel"]),
    )


def test_conv_layout_parity():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 9, 9, 4).astype(np.float32)
    w = rng.randn(6, 4, 3, 3).astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    tout = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    conv = fnn.Conv(6, (3, 3), padding=[(1, 1), (1, 1)])
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}}
    jout = np.asarray(conv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(jout, tout, rtol=1e-4, atol=1e-5)


def test_fc6_permutation_parity():
    rng = np.random.RandomState(2)
    roi = rng.randn(3, 256, 7, 7).astype(np.float32)  # torch CHW layout
    w = rng.randn(16, 256 * 49).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    tout = (torch.from_numpy(roi).flatten(1) @ torch.from_numpy(w).T + torch.from_numpy(b)).numpy()
    conv = tc._fc6({"fc6.weight": w, "fc6.bias": b}, "fc6")
    hwc = roi.transpose(0, 2, 3, 1).reshape(3, -1)
    jout = hwc @ np.asarray(conv["kernel"]) + np.asarray(conv["bias"])
    np.testing.assert_allclose(jout, tout, rtol=1e-4, atol=1e-4)


def test_conv_transpose_parity():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 5, 5, 4).astype(np.float32)
    w = rng.randn(4, 6, 2, 2).astype(np.float32)  # torch [in, out, kh, kw]
    b = rng.randn(6).astype(np.float32)
    tout = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), stride=2,
    ).numpy().transpose(0, 2, 3, 1)
    mod = fnn.ConvTranspose(6, (2, 2), strides=(2, 2))
    conv = tc._conv_transpose({"k.weight": w, "k.bias": b}, "k")
    assert conv["kernel"].shape == (2, 2, 4, 6)
    jout = np.asarray(
        mod.apply({"params": {"kernel": jnp.asarray(conv["kernel"]),
                              "bias": jnp.asarray(conv["bias"])}}, jnp.asarray(x))
    )
    np.testing.assert_allclose(jout, tout, rtol=1e-4, atol=1e-5)


def test_frozen_bn_parity():
    rng = np.random.RandomState(4)
    c = 8
    x = rng.randn(2, 3, 3, c).astype(np.float32)
    w, b = rng.rand(c).astype(np.float32), rng.randn(c).astype(np.float32)
    mean, var = rng.randn(c).astype(np.float32), rng.uniform(0.5, 2, c).astype(np.float32)
    bn = torch.nn.BatchNorm2d(c, eps=1e-5).eval()
    bn.weight.data = torch.from_numpy(w)
    bn.bias.data = torch.from_numpy(b)
    bn.running_mean.data = torch.from_numpy(mean)
    bn.running_var.data = torch.from_numpy(var)
    tout = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    f = tc._frozen_bn(
        {"bn.weight": w, "bn.bias": b, "bn.running_mean": mean, "bn.running_var": var}, "bn"
    )
    jout = x * f["scale"] + f["shift"]
    np.testing.assert_allclose(jout, tout, rtol=1e-4, atol=1e-5)


def test_nlb_conv1d_as_dense_parity():
    rng = np.random.RandomState(5)
    x = rng.randn(1, 16, 10).astype(np.float32)  # torch [B, C, T]
    w = rng.randn(8, 16, 1).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    tout = torch.nn.functional.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)
    ).numpy()  # [1, 8, 10]
    d = tc._conv1d_as_dense({"g.weight": w, "g.bias": b}, "g")
    jout = x[0].T @ np.asarray(d["kernel"]) + np.asarray(d["bias"])  # [10, 8]
    np.testing.assert_allclose(jout, tout[0].T, rtol=1e-4, atol=1e-5)


def test_load_pretrained_detector_orbax_phase1(tmp_path):
    """Phase-1 -> phase-2 warm-start with OUR OWN orbax checkpoint (the
    reference flow train_movingfashion.py:85-89 with native ckpts; round-2
    gap fix — load_torch_checkpoint crashed on orbax dirs)."""
    import jax.numpy as jnp

    from seam_match_rcnn_tpu.ckpt.io import save_checkpoint
    from seam_match_rcnn_tpu.ckpt.torch_convert import load_pretrained_detector
    from seam_match_rcnn_tpu.config import ModelConfig, RPNConfig, RoIHeadsConfig
    from seam_match_rcnn_tpu.models.matchrcnn import init_model

    cfg = ModelConfig(
        rpn=RPNConfig(pre_nms_top_n_test=20, post_nms_top_n_test=30),
        roi_heads=RoIHeadsConfig(detections_per_img=4),
        compute_dtype="float32",
    )
    _, p1_vars = init_model(cfg, video=False, canvas=(32, 32))
    # make the phase-1 match trunk recognizable
    p1 = jax.tree.map(lambda x: x, p1_vars["params"])
    p1["match_predictor"]["trunk"]["linear"]["bias"] = jnp.full((256,), 7.0)
    path = str(tmp_path / "p1")
    save_checkpoint(path, {"state": {"params": p1,
                                     "batch_stats": p1_vars["batch_stats"],
                                     "step": 3},
                           "epoch": 0})

    _, base = init_model(cfg, video=True, canvas=(32, 32))
    out = load_pretrained_detector(path, base, clone_match_to_aggregator=True)
    # detector weights come from phase-1
    np.testing.assert_array_equal(
        np.asarray(out["params"]["match_predictor"]["trunk"]["linear"]["bias"]),
        np.full((256,), 7.0))
    # aggregator trunk cloned from the match predictor (load_saved_matchrcnn)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["temporal_aggregator"]["trunk"]["linear"]["bias"]),
        np.full((256,), 7.0))
    # aggregator extras (nlb / attention) present from the base init
    assert "nlb" in out["params"]["temporal_aggregator"]
    assert "attention_scorer" in out["params"]["temporal_aggregator"]
    # batch_stats carried over for the cloned trunk
    assert "temporal_aggregator" in out["batch_stats"]
