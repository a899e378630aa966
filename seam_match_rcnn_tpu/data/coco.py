"""Minimal COCO annotation index.

Stand-in for ``pycocotools.coco.COCO`` / torchvision ``CocoDetection`` which
the DF2 datasets subclass (/root/reference/datasets/DF2Dataset.py:63,
MultiDF2Dataset.py:64).  Only the surface those datasets use is provided:
``imgs``, ``getCatIds``, ``cats``, per-image annotation lookup.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List


class CocoIndex:
    def __init__(self, ann_file: str):
        with open(ann_file, "r") as f:
            data = json.load(f)
        self.dataset = data
        self.imgs: Dict[int, Dict[str, Any]] = {im["id"]: im for im in data.get("images", [])}
        self.cats: Dict[int, Dict[str, Any]] = {c["id"]: c for c in data.get("categories", [])}
        self.img_to_anns: Dict[int, List[Dict[str, Any]]] = {i: [] for i in self.imgs}
        for ann in data.get("annotations", []):
            self.img_to_anns.setdefault(ann["image_id"], []).append(ann)

    def getCatIds(self) -> List[int]:
        return sorted(self.cats.keys())

    def getImgIds(self) -> List[int]:
        return sorted(self.imgs.keys())

    def loadAnns(self, img_id: int) -> List[Dict[str, Any]]:
        return self.img_to_anns.get(img_id, [])
