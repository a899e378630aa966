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

__version__ = "0.1.0"
