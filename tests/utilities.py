"""Test fixtures (mirrors reference tests/utilities.py): a fake COCO dataset
replaying synthetic annotations over random images — removes any dataset
download from the tests."""

import json
import os

import numpy as np

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "coco_annotation.json")


class CocoFakeDataset:
    """Random HWC images + the fixture annotations for every index."""

    def __init__(self, transforms=None, annotation_path=FIXTURE, length=1000,
                 size=512, seed=0):
        self.transforms = transforms
        with open(annotation_path) as f:
            self.coco_annotation = json.load(f)
        self.length = length
        self.size = size
        self.rng = np.random.RandomState(seed)

    def __getitem__(self, index):
        img = (
            255 * np.random.RandomState(index).rand(self.size, self.size, 3)
        ).astype(np.uint8)
        annotation = [dict(a) for a in self.coco_annotation]
        if self.transforms:
            img, annotation = self.transforms(img, annotation)
        return img, annotation

    def __len__(self):
        return self.length
