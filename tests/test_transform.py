import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from seam_match_rcnn_tpu.config import TransformConfig
from seam_match_rcnn_tpu.models.transform import (
    batch_images,
    normalize,
    resize_boxes_back,
    resize_image,
    resize_scale,
)


def test_resize_scale_rule():
    cfg = TransformConfig()
    # min side -> 800 when max side stays under 1333
    assert resize_scale(600, 800, cfg) == pytest.approx(800 / 600)
    # capped by max side
    assert resize_scale(400, 1400, cfg) == pytest.approx(1333 / 1400)


def test_resize_matches_torch_bilinear():
    rng = np.random.RandomState(0)
    img = rng.rand(40, 60, 3).astype(np.float32)
    cfg = TransformConfig(min_size=96, max_size=160)
    got = resize_image(img, cfg)
    scale = resize_scale(40, 60, cfg)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(img.transpose(2, 0, 1))[None],
        scale_factor=scale, mode="bilinear", align_corners=False,
        recompute_scale_factor=True,
    )[0].numpy().transpose(1, 2, 0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_batch_images_buckets_by_orientation():
    cfg = TransformConfig(min_size=64, max_size=96)
    imgs = [
        np.random.rand(40, 80, 3).astype(np.float32),   # landscape
        np.random.rand(80, 40, 3).astype(np.float32),   # portrait
        np.random.rand(50, 70, 3).astype(np.float32),   # landscape
    ]
    buckets = batch_images(imgs, cfg)
    assert len(buckets) == 2
    sizes = {tuple(b.pixels.shape[1:3]) for b in buckets}
    assert sizes == {cfg.landscape_canvas, cfg.portrait_canvas}
    land = next(b for b in buckets if b.pixels.shape[1:3] == cfg.landscape_canvas)
    assert sorted(land.indices) == [0, 2]
    # valid sizes recorded; padding filled with image_mean (== 0 after
    # normalize, matching torchvision's normalize-then-zero-pad order)
    from seam_match_rcnn_tpu.config import TransformConfig as _TC

    mean = np.asarray(_TC().image_mean, np.float32)
    for b in buckets:
        for j in range(len(b.indices)):
            h, w = b.sizes[j]
            np.testing.assert_allclose(b.pixels[j, h:, :],
                                       np.broadcast_to(mean, b.pixels[j, h:, :].shape))
            np.testing.assert_allclose(b.pixels[j, :, w:],
                                       np.broadcast_to(mean, b.pixels[j, :, w:].shape))


def test_normalize_imagenet():
    cfg = TransformConfig()
    x = jnp.ones((1, 2, 2, 3)) * 0.5
    out = np.asarray(normalize(x, cfg))
    want = (0.5 - np.asarray(cfg.image_mean)) / np.asarray(cfg.image_std)
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-6)


def test_resize_boxes_back_ratio():
    boxes = np.asarray([[10.0, 20.0, 30.0, 40.0]], np.float32)
    out = resize_boxes_back(boxes, (100, 200), (50, 400))
    np.testing.assert_allclose(out, [[20.0, 10.0, 60.0, 20.0]])


def test_device_ingest_matches_host_resize():
    """device_batch_images (jax.image bilinear resize on device) matches the
    cv2 host path pixel-for-pixel (both half-pixel bilinear, antialias off),
    and preserves the ImageBatch contract per image."""
    import numpy as np
    from seam_match_rcnn_tpu.config import TransformConfig
    from seam_match_rcnn_tpu.models.transform import (
        batch_images, device_batch_images,
    )

    cfg = TransformConfig(min_size=64, max_size=96)
    rng = np.random.RandomState(0)
    imgs = [rng.rand(120, 90, 3).astype(np.float32) for _ in range(3)] + \
           [rng.rand(60, 100, 3).astype(np.float32) for _ in range(2)] + \
           [(rng.rand(80, 120, 3) * 255).astype(np.uint8)]

    def per_image(batches, as_float):
        o = {}
        for b in batches:
            for j, i in enumerate(b.indices):
                o[i] = (np.asarray(b.pixels[j]), tuple(b.sizes[j]),
                        tuple(b.orig_sizes[j]))
        return o

    host = per_image(batch_images(
        [i.astype(np.float32) / 255.0 if i.dtype == np.uint8 else i
         for i in imgs], cfg), True)
    dev = per_image(device_batch_images(imgs, cfg), True)
    for i in range(len(imgs)):
        ph, sh, oh = host[i]
        pd, sd, od = dev[i]
        assert sh == sd and oh == od
        assert ph.shape == pd.shape
        np.testing.assert_allclose(pd, ph, atol=3e-3 if imgs[i].dtype == np.uint8 else 1e-5)


def test_flip_keypoints_mirror_visible_only():
    """Keypoint flip: visible slots mirror in x, invisible stay zero, no
    slot swapping (the reference's COCO-person 17-slot swap is inapplicable
    to DF2's 294 garment slots and dead in practice — README parity notes)."""
    import numpy as np

    from seam_match_rcnn_tpu.data.transforms import RandomHorizontalFlip

    img = np.zeros((10, 20, 3), np.float32)
    kp = np.zeros((1, 294, 3), np.float32)
    kp[0, 5] = [4.0, 7.0, 2.0]
    kp[0, 60] = [15.0, 2.0, 1.0]
    target = {"keypoints": kp.copy()}
    flip = RandomHorizontalFlip(prob=1.1)  # always flips
    _, out = flip(img, target)
    k = out["keypoints"]
    np.testing.assert_allclose(k[0, 5], [20.0 - 4.0, 7.0, 2.0])
    np.testing.assert_allclose(k[0, 60], [20.0 - 15.0, 2.0, 1.0])
    assert (k[0, 0] == 0).all()  # invisible slot untouched


def test_canvas_padding_normalizes_to_zero():
    """torchvision normalizes first and zero-pads after, so reference
    padding is 0 in NORMALIZED space; the mean-filled raw canvas reproduces
    that exactly (zero-filled raw padding would normalize to ~-2 and shift
    features at every right/bottom border)."""
    from seam_match_rcnn_tpu.config import TransformConfig
    from seam_match_rcnn_tpu.models.transform import (
        batch_images, device_batch_images, normalize)

    cfg = TransformConfig(min_size=64, max_size=96)
    img = np.random.RandomState(0).rand(50, 64, 3).astype(np.float32)

    for batcher in (batch_images, device_batch_images):
        (b,) = batcher([img], cfg)
        h, w = b.sizes[0]
        normed = np.asarray(normalize(jnp.asarray(b.pixels), cfg))
        np.testing.assert_allclose(normed[0, h:, :, :], 0.0, atol=1e-5)
        np.testing.assert_allclose(normed[0, :, w:, :], 0.0, atol=1e-5)
        assert np.abs(normed[0, :h, :w]).mean() > 0.1  # content not zeroed
