"""AOT export roundtrip: serialize the serving forward to StableHLO and
replay it (the deployment path, tools/export_serving.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seam_match_rcnn_tpu.config import ModelConfig, RPNConfig, RoIHeadsConfig
from seam_match_rcnn_tpu.models.matchrcnn import MatchRCNN, init_model


@pytest.mark.filterwarnings("ignore")
def test_export_serialize_roundtrip():
    cfg = ModelConfig(
        rpn=RPNConfig(pre_nms_top_n_test=30, post_nms_top_n_test=40),
        roi_heads=RoIHeadsConfig(detections_per_img=4),
        compute_dtype="float32",
    )
    model, variables = init_model(cfg, video=True, canvas=(64, 64))

    def fn(variables, images, sizes):
        return model.apply(
            variables, images, sizes, method=MatchRCNN.inference,
            with_masks=False, with_match=True, with_roi_features=False,
        )

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    sizes = jnp.asarray([[64, 64]], jnp.int32)

    exported = jax.export.export(jax.jit(fn))(variables, images, sizes)
    back = jax.export.deserialize(bytearray(exported.serialize()))
    got = back.call(variables, images, sizes)
    want = fn(variables, images, sizes)
    np.testing.assert_allclose(
        np.asarray(got["match_features"]), np.asarray(want["match_features"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(got["valid"]), np.asarray(want["valid"]))
