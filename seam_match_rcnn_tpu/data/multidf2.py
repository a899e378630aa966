"""MultiDeepFashion2: DF2 products as pseudo-videos.

Re-design of /root/reference/datasets/MultiDF2Dataset.py: each
``style_pairid`` product key groups multiple street photos ("frames") and
shop photos; ``filter_onestreet`` drops products with fewer than two street
views (MultiDF2Dataset.py:117-134).  Batches are product-grouped like
MovingFashion: 1 random shop view + frac-indexed street views
(MultiDF2BatchSampler, :248-315), with optional gaussian noise (:157-167).
"""

from __future__ import annotations

import os
import random
from typing import Dict, Iterator, List, Optional

import numpy as np
from .df2 import DeepFashion2Dataset


class MultiDeepFashion2Dataset:
    def __init__(
        self,
        ann_file: str,
        root: str,
        noise: bool = False,
        filter_onestreet: bool = True,
        mask_crop_size: int = 56,
        rng: Optional[random.Random] = None,
    ):
        self.base = DeepFashion2Dataset(ann_file, root, transforms=None,
                                        mask_crop_size=mask_crop_size)
        self.noise = noise
        self.rng = rng or random.Random()

        keys = sorted(
            k for k in self.base.match_map_street
            if k in self.base.match_map_shop
        )
        if filter_onestreet:
            keys = [k for k in keys if len(self.base.match_map_street[k]) >= 2]
        self.product_keys = keys

    def __len__(self):
        return len(self.product_keys)

    def _load(self, img_id: int, key: str, tag: int) -> Dict:
        idx = self.base.idx_of_id[img_id]
        img, target, _ = self.base[idx]
        if self.noise and tag == 0:
            sigma = 0.25 if self.rng.random() > 0.75 else 0.05
            img = np.clip(img + np.random.randn(*img.shape) * sigma, 0.0, 1.0).astype(np.float32)
        target = dict(target, i=key, tag=tag, key=key)
        target["image"] = img
        return target

    def shop_view(self, p: int) -> Dict:
        key = self.product_keys[p]
        img_id = self.rng.choice(self.base.match_map_shop[key])
        return self._load(img_id, key, tag=1)

    def street_view(self, p: int, frac: float) -> Dict:
        key = self.product_keys[p]
        streets = self.base.match_map_street[key]
        img_id = streets[min(int(len(streets) * frac), len(streets) - 1)]
        return self._load(img_id, key, tag=0)


def product_batches(
    dataset: MultiDeepFashion2Dataset,
    n_products: int,
    frames_per_product: int,
    shuffle: bool = True,
    seed: int = 0,
    epoch: int = 0,
    num_shards: int = 1,
    shard: int = 0,
    limit: Optional[int] = None,
    drop_last: bool = False,
    skip_batches: int = 0,
) -> Iterator[List[Dict]]:
    rng = random.Random(seed + epoch)
    order = list(range(len(dataset)))
    if shuffle:
        rng.shuffle(order)
    order = order[shard::num_shards]
    if limit is not None:
        order = order[:limit]
    batch: List[Dict] = []
    count = 0
    skipped = 0
    for p in order:
        fracs = sorted(rng.random() for _ in range(frames_per_product))
        if skipped < skip_batches:
            # mid-epoch resume fast-forward: consume the rng draws so the
            # remaining batches replay identically, but never load images
            count += 1
            if count == n_products:
                skipped += 1
                count = 0
            continue
        batch.append(dataset.shop_view(p))
        batch += [dataset.street_view(p, f) for f in fracs]
        count += 1
        if count == n_products:
            yield batch
            batch, count = [], 0
    if batch and not drop_last:
        yield batch
