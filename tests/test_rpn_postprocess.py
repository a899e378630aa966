import numpy as np
import jax
import jax.numpy as jnp

from seam_match_rcnn_tpu.config import RPNConfig, RoIHeadsConfig
from seam_match_rcnn_tpu.models.detection import postprocess_detections
from seam_match_rcnn_tpu.models.rpn import select_proposals
from seam_match_rcnn_tpu.ops.boxes import encode_boxes


def test_select_proposals_prefers_high_objectness():
    # one level, anchors on an 8x8 grid, one clearly-best anchor
    h = w = 8
    anchors = []
    for y in range(h):
        for x in range(w):
            anchors.append([x * 8 - 8, y * 8 - 8, x * 8 + 8, y * 8 + 8])
    anchors = jnp.asarray(anchors, jnp.float32)
    obj = np.full((1, h, w, 1), -5.0, np.float32)
    obj[0, 3, 4, 0] = 5.0
    regs = np.zeros((1, h, w, 4), np.float32)
    cfg = RPNConfig(pre_nms_top_n_test=16, post_nms_top_n_test=8)
    props, scores, valid = select_proposals(
        [jnp.asarray(obj)], [jnp.asarray(regs)], [anchors],
        jnp.asarray([[64, 64]], jnp.int32), cfg, training=False,
    )
    assert props.shape == (1, 8, 4)
    assert bool(valid[0, 0])
    # top proposal is the high-objectness anchor, clipped to the image
    np.testing.assert_allclose(np.asarray(props[0, 0]), [24, 16, 40, 32])


def test_select_proposals_decodes_deltas():
    anchors = jnp.asarray([[10.0, 10.0, 30.0, 30.0]])
    target = jnp.asarray([[12.0, 14.0, 28.0, 26.0]])
    deltas = encode_boxes(target, anchors, (1.0, 1.0, 1.0, 1.0))
    obj = jnp.full((1, 1, 1, 1), 3.0)
    cfg = RPNConfig(pre_nms_top_n_test=1, post_nms_top_n_test=1, min_size=1e-3)
    props, _, valid = select_proposals(
        [obj], [deltas.reshape(1, 1, 1, 4)], [anchors],
        jnp.asarray([[64, 64]], jnp.int32), cfg, training=False,
    )
    assert bool(valid[0, 0])
    np.testing.assert_allclose(np.asarray(props[0, 0]), np.asarray(target[0]), rtol=1e-5)


def test_select_proposals_keeps_negative_logits():
    # torchvision's score_thresh=0.0 keeps proposals with sigmoid<0.5
    # (negative logits); a raw-logit comparison would wrongly drop them.
    anchors = jnp.asarray([[4.0, 4.0, 24.0, 24.0], [40.0, 40.0, 60.0, 60.0]])
    obj = jnp.asarray([[[[-3.0]], [[-1.0]]]]).reshape(1, 2, 1, 1)
    regs = jnp.zeros((1, 2, 1, 4))
    cfg = RPNConfig(pre_nms_top_n_test=2, post_nms_top_n_test=2)
    _, _, valid = select_proposals(
        [obj], [regs], [anchors], jnp.asarray([[64, 64]], jnp.int32), cfg,
        training=False,
    )
    assert np.asarray(valid[0]).all()


def _logits_for(scores_bg_fg):
    # build 2-class-ish logits over C classes from desired softmax scores
    return jnp.log(jnp.asarray(scores_bg_fg))


def test_postprocess_class_nms_and_topk():
    cfg = RoIHeadsConfig(detections_per_img=4, score_thresh=0.05, nms_thresh=0.5)
    c = 3  # bg + 2 classes
    r = 3
    props = jnp.asarray([[[0, 0, 20, 20], [1, 1, 21, 21], [50, 50, 70, 70]]],
                        jnp.float32)
    # proposal 0: class1 0.8; proposal 1: class1 0.7 (overlaps 0 -> suppressed);
    # proposal 2: class2 0.9
    probs = np.asarray([
        [[0.2, 0.8, 0.0], [0.3, 0.7, 0.0], [0.1, 0.0, 0.9]]
    ], np.float32) + 1e-6
    logits = jnp.log(jnp.asarray(probs))
    deltas = jnp.zeros((1, r, 4 * c))
    det = postprocess_detections(
        logits, deltas, props, jnp.ones((1, r), bool),
        jnp.asarray([[100, 100]], jnp.int32), cfg,
    )
    v = np.asarray(det.valid[0])
    labels = np.asarray(det.labels[0])[v]
    scores = np.asarray(det.scores[0])[v]
    assert len(scores) == 2
    # score order: class2 box first (0.9), then class1 (0.8)
    assert labels.tolist() == [2, 1]
    np.testing.assert_allclose(scores, [0.9, 0.8], rtol=1e-4)


def test_postprocess_score_threshold():
    cfg = RoIHeadsConfig(detections_per_img=4, score_thresh=0.5)
    probs = np.asarray([[[0.9, 0.1, 0.0]]], np.float32) + 1e-6
    det = postprocess_detections(
        jnp.log(jnp.asarray(probs)), jnp.zeros((1, 1, 12)),
        jnp.asarray([[[0, 0, 10, 10]]], jnp.float32), jnp.ones((1, 1), bool),
        jnp.asarray([[50, 50]], jnp.int32), cfg, fallback_score=0.1,
    )
    # nothing passes -> whole-image fallback with score 0.1
    assert bool(det.valid[0, 0])
    assert float(det.scores[0, 0]) == np.float32(0.1)
    np.testing.assert_allclose(np.asarray(det.boxes[0, 0]), [0, 0, 50, 50])
