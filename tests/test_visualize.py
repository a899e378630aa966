"""Debug visualizers (reference stuffs/utils.py:15-212 equivalents) render
to files without a display."""

import numpy as np
import pytest


def test_visualizers_render(tmp_path):
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    from seam_match_rcnn_tpu.utils.visualize import (visualize_matches,
                                                     visualize_tracking)

    rng = np.random.RandomState(0)
    street = rng.rand(60, 80, 3)
    shop = rng.rand(60, 80, 3)
    out1 = visualize_matches(
        street, shop,
        street_boxes=np.asarray([[5.0, 5, 40, 50]]),
        shop_boxes=np.asarray([[10.0, 8, 45, 55]]),
        scores=np.asarray([0.9]), out_path=str(tmp_path / "m.png"))
    frames = [rng.rand(60, 80, 3) for _ in range(3)]
    boxes_per_frame = [np.asarray([[5.0 + i, 5, 40, 50]]) for i in range(3)]
    visualize_tracking(frames, boxes_per_frame,
                       tracklet_ids=[np.zeros(1, int)] * 3,
                       out_path=str(tmp_path / "t.png"))
    import os
    assert os.path.getsize(out1) > 0
    assert os.path.getsize(str(tmp_path / "t.png")) > 0


def test_visualize_tracking_eval_renders(tmp_path):
    from seam_match_rcnn_tpu.utils.visualize import visualize_tracking_eval

    rng = np.random.RandomState(0)
    imgs = [rng.rand(32, 40, 3) for _ in range(3)]
    boxes = [np.asarray([[2, 2, 20, 20], [5, 5, 30, 25]], np.float32)
             for _ in range(3)]
    cls = [np.asarray([0, 1]) for _ in range(3)]
    out = visualize_tracking_eval(imgs, boxes, cls,
                                  out_path=str(tmp_path / "te.png"), rows=2)
    assert (tmp_path / "te.png").stat().st_size > 0 and out.endswith("te.png")


def test_visualize_matches_pairwise_matrix_labels(tmp_path):
    """A [N_street, N_shop] score matrix labels each street box with its
    best shop score; a wrong-length vector raises."""
    import pytest

    from seam_match_rcnn_tpu.utils.visualize import visualize_matches

    rng = np.random.RandomState(1)
    img = rng.rand(32, 40, 3)
    sb = np.asarray([[1, 1, 10, 10], [12, 12, 30, 28]], np.float32)
    pb = np.asarray([[2, 2, 20, 20]], np.float32)
    out = visualize_matches(img, img, sb, pb,
                            scores=rng.rand(2, 3),
                            out_path=str(tmp_path / "m.png"))
    assert (tmp_path / "m.png").stat().st_size > 0
    with pytest.raises(ValueError):
        visualize_matches(img, img, sb, pb, scores=np.asarray([0.5]),
                          out_path=str(tmp_path / "m2.png"))
