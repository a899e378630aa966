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
