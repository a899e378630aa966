import numpy as np
import pytest

from seam_match_rcnn_tpu.config import EvalConfig, ModelConfig, RPNConfig, RoIHeadsConfig, TransformConfig
from seam_match_rcnn_tpu.data.movingfashion import MovingFashionDataset
from seam_match_rcnn_tpu.data.synthetic import make_synthetic_movingfashion
from seam_match_rcnn_tpu.models.matchrcnn import init_model
from seam_match_rcnn_tpu.serving import SeamRetrieval


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    path = make_synthetic_movingfashion(str(root), n_products=3, n_frames=8)
    ds = MovingFashionDataset(path, root=str(root), noise=False)
    cfg = ModelConfig(
        rpn=RPNConfig(pre_nms_top_n_test=60, post_nms_top_n_test=80),
        roi_heads=RoIHeadsConfig(detections_per_img=6),
        transform=TransformConfig(min_size=96, max_size=128),
        compute_dtype="float32",
    )
    model, variables = init_model(cfg, video=True, canvas=(64, 64))
    retr = SeamRetrieval(model, variables, cfg=EvalConfig(score_threshold=0.0),
                         chunk=4)
    return ds, retr


def test_serving_end_to_end(setup):
    ds, retr = setup
    shop_imgs = [ds.shop_image(i)["image"] for i in range(len(ds))]
    gallery = retr.build_gallery(shop_imgs, keys=list(ds.product_ids))
    assert len(gallery.keys) >= 1
    assert gallery.match_feats.shape[1] == 256

    frames = [ds.video_frame(0, f, video_i=0)["image"] for f in (0.1, 0.5, 0.9)]
    emb = retr.embed_video(frames)
    assert emb["aggr"].shape == (256,)
    assert emb["track_rows"].size >= 1

    result = retr.retrieve(frames, gallery, k=2)
    assert len(result.indices) == min(2, len(gallery.keys))
    assert np.all(np.diff(result.scores) <= 1e-6)  # descending
    assert result.track_length >= 1


def test_from_checkpoint_phase1_payload(tmp_path):
    """SeamRetrieval.from_checkpoint on a PHASE-1 training checkpoint
    ({'state': {params, batch_stats, ...}}, cli.train_matchrcnn schema):
    warm-starts the video model with the match->aggregator clone
    (/root/reference/models/video_matchrcnn.py:325-328) and accepts the
    cfg_eval kwarg exactly as cli.serve passes it."""
    import jax
    import jax.numpy as jnp

    from seam_match_rcnn_tpu.ckpt.io import save_checkpoint

    cfg = ModelConfig(
        rpn=RPNConfig(pre_nms_top_n_test=40, post_nms_top_n_test=48),
        roi_heads=RoIHeadsConfig(detections_per_img=4),
        transform=TransformConfig(min_size=64, max_size=96),
        compute_dtype="float32",
    )
    _, p1_vars = init_model(cfg, video=False, canvas=(64, 64))
    # make the match trunk recognizably non-fresh
    p1 = jax.tree_util.tree_map(lambda x: x, p1_vars["params"])
    mark = jnp.full_like(p1["match_predictor"]["last"]["bias"], 7.0)
    p1["match_predictor"]["last"]["bias"] = mark
    ckpt = tmp_path / "epoch000"
    save_checkpoint(str(ckpt), {
        "state": {"params": p1, "batch_stats": p1_vars["batch_stats"]},
        "epoch": 0,
    })

    retr = SeamRetrieval.from_checkpoint(
        str(ckpt), cfg=cfg, cfg_eval=EvalConfig(score_threshold=0.25),
        chunk=2)
    assert retr.cfg.score_threshold == 0.25
    np.testing.assert_array_equal(np.asarray(retr._b), np.asarray(mark))
    # aggregator warm-started from the match predictor
    np.testing.assert_array_equal(np.asarray(retr._ab), np.asarray(mark))


def test_build_gallery_no_detections_message(setup):
    ds, retr = setup
    import dataclasses

    strict = SeamRetrieval(retr.model, retr.variables,
                           cfg=dataclasses.replace(retr.cfg, score_threshold=2.0),
                           chunk=4)
    with pytest.raises(ValueError, match="no shop image produced"):
        strict.build_gallery([ds.shop_image(0)["image"]], keys=["p0"])
