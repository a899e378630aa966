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
