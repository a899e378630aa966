import numpy as np

from seam_match_rcnn_tpu.eval.gallery import score_matrix, score_matrix_sharded
from seam_match_rcnn_tpu.parallel.mesh import make_mesh


def test_sharded_scores_match_single_device():
    rng = np.random.RandomState(0)
    q, g = 53, 17  # deliberately not divisible by 8
    street = rng.randn(q, 256).astype(np.float32)
    shop = rng.randn(g, 256).astype(np.float32)
    w = rng.randn(2, 256).astype(np.float32)
    b = rng.randn(2).astype(np.float32)
    mesh = make_mesh(data=1, model=8)
    got = score_matrix_sharded(street, shop, w, b, mesh, axis="model")
    want = score_matrix(street, shop, w, b)
    assert got.shape == (q, g)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
