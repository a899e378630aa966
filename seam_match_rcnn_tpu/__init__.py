"""SEAM Match R-CNN, TPU-native.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
HumaticsLAB/SEAM-Match-RCNN (MovingFashion video-to-shop retrieval):

* Match R-CNN  — Mask R-CNN (ResNet-50-FPN) + a siamese match head scoring
  street<->shop garment pairs (reference: models/matchrcnn.py).
* SEAM Match R-CNN — the same detector plus a temporal aggregation module
  (non-local block + attention pooling) fusing per-frame RoI descriptors into
  a single video-level embedding (reference: models/video_matchrcnn.py,
  models/match_head.py:79-169).

Everything is designed TPU-first: static shapes with pad-and-mask discipline,
`jit`-compiled whole-detector forwards, `jax.sharding.Mesh` data parallelism
with in-graph gradient psum, and Pallas kernels for the hot ops.
"""

__version__ = "0.2.0"


def __getattr__(name):
    """Lazy top-level API (keeps bare-import cost low for CLIs)."""
    if name in ("ModelConfig", "TrainConfig", "SEAMTrainConfig", "EvalConfig",
                "fast_eval_model_config", "serving_model_config"):
        from . import config

        return getattr(config, name)
    if name in ("MatchRCNN", "init_model", "make_model"):
        from .models import matchrcnn

        return getattr(matchrcnn, name)
    if name in ("SeamRetrieval", "Gallery", "RetrievalResult"):
        from . import serving

        return getattr(serving, name)
    if name == "evaluate_movingfashion":
        from .eval.movingfashion import evaluate

        return evaluate
    if name == "evaluate_multidf2":
        from .eval.multidf2 import evaluate

        return evaluate
    raise AttributeError(name)
