import json
import os

import numpy as np
import pytest

from seam_match_rcnn_tpu.data import convert as conv
from seam_match_rcnn_tpu.data.df2 import DF2PairBatchSampler, DeepFashion2Dataset
from seam_match_rcnn_tpu.data.movingfashion import MovingFashionDataset, product_batches
from seam_match_rcnn_tpu.data.multidf2 import (
    MultiDeepFashion2Dataset,
    product_batches as mdf2_batches,
)
from seam_match_rcnn_tpu.data.synthetic import (
    make_synthetic_df2,
    make_synthetic_movingfashion,
)
from seam_match_rcnn_tpu.ops import rle


@pytest.fixture(scope="module")
def df2_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("df2")
    img_dir, ann_dir = make_synthetic_df2(str(root), n_products=3, views_per_side=2)
    out = str(root / "annots.json")
    conv.convert(img_dir, ann_dir, out)
    return img_dir, out


@pytest.fixture(scope="module")
def mf_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("mf")
    path = make_synthetic_movingfashion(str(root), n_products=3, n_frames=12)
    return str(root), path


def test_convert_coco_structure(df2_fixture):
    _, ann = df2_fixture
    with open(ann) as f:
        coco = json.load(f)
    assert len(coco["categories"]) == 13
    assert len(coco["images"]) == 12
    img0 = coco["images"][0]
    assert "match_desc" in img0 and "source" in img0
    a0 = coco["annotations"][0]
    assert {"pair_id", "style", "source", "segmentation"} <= set(a0)
    assert len(a0["keypoints"]) == 294 and len(a0["keypoints"][0]) == 3


def test_df2_dataset_and_match_maps(df2_fixture):
    img_dir, ann = df2_fixture
    ds = DeepFashion2Dataset(ann, img_dir)
    assert len(ds.street_inds) == 6 and len(ds.shop_inds) == 6
    assert len(ds.accepted_entries) == 12  # every image has a partner
    img, target, img_id = ds[0]
    assert img.ndim == 3 and img.dtype == np.float32
    assert target["boxes"].shape[1] == 4
    assert target["mask_crops"].shape[1:] == (56, 56)
    assert target["mask_crops"].max() == 1  # rectangle fills the crop


def test_df2_pair_sampler_alternates(df2_fixture):
    img_dir, ann = df2_fixture
    ds = DeepFashion2Dataset(ann, img_dir)
    sampler = DF2PairBatchSampler(ds, batch_size=4, seed=1)
    batches = list(sampler)
    assert batches
    for b in batches:
        assert len(b) == 4
        for street_pos in range(0, 4, 2):
            sid = ds.ids[b[street_pos]]
            pid = ds.ids[b[street_pos + 1]]
            assert ds.coco.imgs[sid]["source"] == "user"
            assert ds.coco.imgs[pid]["source"] == "shop"
            # partners share a match key
            assert set(ds.coco.imgs[sid]["match_desc"].items()) & set(
                ds.coco.imgs[pid]["match_desc"].items()
            )


def test_mf_dataset_video_decode(mf_fixture):
    root, path = mf_fixture
    ds = MovingFashionDataset(path, root=root, noise=False)
    assert len(ds) == 3
    shop = ds.shop_image(0)
    assert shop["tag"] == 1 and shop["image"].ndim == 3
    fr = ds.video_frame(0, 0.5, video_i=0)
    assert fr["tag"] == 0
    assert fr["frame_index"] == 6
    assert (fr["tracklet"] >= 0).all()  # annotated
    # noise mode halves resolution
    ds_noise = MovingFashionDataset(path, root=root, noise=True)
    fr2 = ds_noise.video_frame(0, 0.5, video_i=0)
    assert fr2["image"].shape[0] == fr["image"].shape[0] // 2


def test_mf_product_batches_layout(mf_fixture):
    root, path = mf_fixture
    ds = MovingFashionDataset(path, root=root, noise=False)
    batches = list(product_batches(ds, n_products=1, frames_per_product=3,
                                   shuffle=False))
    assert len(batches) == 3
    b = batches[0]
    assert len(b) == 4
    assert b[0]["tag"] == 1 and all(x["tag"] == 0 for x in b[1:])
    assert len({x["i"] for x in b}) == 1
    fracs_sorted = [x["frame_index"] for x in b[1:]]
    assert fracs_sorted == sorted(fracs_sorted)


def test_multidf2_products(df2_fixture):
    img_dir, ann = df2_fixture
    ds = MultiDeepFashion2Dataset(ann, img_dir, filter_onestreet=True)
    assert len(ds) == 3  # each product has 2 street views
    batches = list(mdf2_batches(ds, n_products=1, frames_per_product=2, shuffle=False))
    b = batches[0]
    assert b[0]["tag"] == 1 and b[1]["tag"] == 0
    assert all(x["key"] == b[0]["key"] for x in b)


def test_rle_roundtrip_and_iou():
    rng = np.random.RandomState(0)
    m = (rng.rand(23, 17) > 0.6).astype(np.uint8)
    enc = rle.encode(m)
    np.testing.assert_array_equal(rle.decode(enc), m)
    assert rle.area(enc) == int(m.sum())
    x, y, w, h = rle.to_bbox(enc)
    ys, xs = np.nonzero(m)
    assert (x, y) == (xs.min(), ys.min())
    # mask iou sanity
    full = np.ones((8, 8), np.uint8)
    half = np.zeros((8, 8), np.uint8)
    half[:4] = 1
    iou = rle.mask_iou([rle.encode(full)], [rle.encode(half)])
    assert iou[0, 0] == pytest.approx(0.5)


def test_polygons_to_crop_alignment():
    # triangle occupying the left half of its box
    box = [10.0, 10.0, 50.0, 50.0]
    poly = [[10, 10, 30, 10, 30, 50, 10, 50]]
    crop = rle.polygons_to_crop(poly, box, 28)
    assert crop[:, :12].mean() > 0.9
    assert crop[:, 16:].mean() < 0.1


def test_prefetcher_exhaustion_and_error_repoll():
    """__next__ after the end keeps raising (StopIteration, or the stored
    worker error) instead of blocking on the dead worker's queue."""
    from seam_match_rcnn_tpu.data.prefetch import prefetch

    it = prefetch(range(5), depth=2)
    assert list(it) == [0, 1, 2, 3, 4]
    import pytest as _pytest
    with _pytest.raises(StopIteration):
        next(it)
    with _pytest.raises(StopIteration):  # and again
        next(it)

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        next(it)
    with _pytest.raises(RuntimeError):  # error persists on re-poll
        next(it)


def test_prefetcher_close_unblocks_worker():
    """close() retires a worker blocked on a full queue (abandoned-iterator
    path) instead of leaking the thread and its buffered batches."""
    import itertools
    import time

    from seam_match_rcnn_tpu.data.prefetch import prefetch

    with prefetch(itertools.count(), depth=2) as it:
        assert next(it) == 0
        worker = it._thread
    # context exit called close(): the infinite producer must be gone
    deadline = time.time() + 5
    while worker.is_alive() and time.time() < deadline:
        time.sleep(0.05)
    assert not worker.is_alive()
    with pytest.raises(StopIteration):
        next(it)


def test_rle_encode_binarizes_255_masks():
    """encode() must treat any nonzero as foreground (native parity): a
    0/255 uint8 mask previously inverted the numpy-path RLE."""
    from seam_match_rcnn_tpu.ops import rle

    mask = np.zeros((4, 4), np.uint8)
    mask[0:2, 0:2] = 255
    r = rle.encode(mask)
    assert rle.area(r) == 4
    np.testing.assert_array_equal(rle.decode(r), (mask != 0).astype(np.uint8))


def test_rle_decode_rejects_corrupt_counts():
    from seam_match_rcnn_tpu.ops import rle

    with pytest.raises(ValueError):
        rle.decode({"size": [2, 2], "counts": [1, 10]})


def test_mask_to_crop_border_box_alignment():
    """A box extending past the image border keeps its out-of-image region
    as zeros at the correct box-relative position."""
    from seam_match_rcnn_tpu.ops.rle import mask_to_crop

    mask = np.zeros((20, 20), np.uint8)
    mask[:, :10] = 1  # left half of the IMAGE is foreground
    # box [-10, 0, 10, 20]: its left half lies outside the image (zeros),
    # its right half covers the image's foreground left half
    crop = mask_to_crop(mask, (-10, 0, 10, 20), size=4)
    np.testing.assert_array_equal(crop[:, :2], 0)
    np.testing.assert_array_equal(crop[:, 2:], 1)


def test_multidf2_skip_batches_replays_dataset_rng_bitexact(df2_fixture):
    """The MultiDF2 fast-forward consumes the DATASET rng (shop choice,
    noise sigma + field seed) too, so surviving batches' pixels replay
    bit-identically — same contract as the MovingFashion sampler."""
    import random

    img_dir, ann = df2_fixture
    kw = dict(n_products=1, frames_per_product=2, seed=4, epoch=0,
              drop_last=True)

    def run(skip):
        ds = MultiDeepFashion2Dataset(ann, img_dir, noise=True,
                                      filter_onestreet=True,
                                      rng=random.Random(9))
        return list(mdf2_batches(ds, skip_batches=skip, **kw))

    full = run(0)
    resumed = run(1)
    assert len(resumed) == len(full) - 1
    for b_full, b_res in zip(full[1:], resumed):
        for it_full, it_res in zip(b_full, b_res):
            np.testing.assert_array_equal(it_full["image"], it_res["image"])


def test_multidf2_noise_reference_distribution(df2_fixture):
    """Reference MultiDF2 noise (MultiDF2Dataset.py:157-167): sigma 0.1
    with probability 0.25 else CLEAN (modulo the uint8 round-trip), and it
    applies to SHOP views too — not MovingFashion's always-on street-only
    0.25/0.05 scheme."""
    import random

    img_dir, ann = df2_fixture
    ds = MultiDeepFashion2Dataset(ann, img_dir, noise=True,
                                  filter_onestreet=True)
    clean = MultiDeepFashion2Dataset(ann, img_dir, noise=False,
                                     filter_onestreet=True)
    key = ds.product_keys[0]
    img_id = ds.base.match_map_shop[key][0]
    ref = clean._load(img_id, key, tag=1)["image"]

    class FixedRng(random.Random):
        def __init__(self, sigma_draw):
            super().__init__(0)
            self._sigma_draw = sigma_draw

        def random(self):
            return self._sigma_draw

    ds.rng = FixedRng(0.9)   # > 0.75 -> sigma 0.1 fires, SHOP view noisy
    noisy = ds._load(img_id, key, tag=1)["image"]
    assert not np.array_equal(noisy, ref)
    assert np.abs(noisy - ref).max() < 0.5  # sigma 0.1, not 0.25

    ds.rng = FixedRng(0.1)   # <= 0.75 -> clean (uint8 round-trip identity)
    clean_again = ds._load(img_id, key, tag=1)["image"]
    np.testing.assert_array_equal(clean_again, ref)
