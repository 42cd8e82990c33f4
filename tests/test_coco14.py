"""COCO14 instances dataset with a synthetic fixture (no pycocotools)."""

import json

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def coco_root(tmp_path):
    rng = np.random.RandomState(0)
    (tmp_path / "train2014").mkdir()
    (tmp_path / "annotations").mkdir()
    images, annotations = [], []
    for i in range(3):
        name = f"COCO_train2014_{i:012d}.jpg"
        Image.fromarray(
            rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)
        ).save(tmp_path / "train2014" / name)
        images.append({"id": i, "file_name": name, "width": 128, "height": 96})
        annotations.append({
            "id": i * 10, "image_id": i, "category_id": 18,  # dog
            "iscrowd": 0, "area": 900.0,
            "segmentation": [[20, 20, 80, 20, 80, 60, 20, 60]],
        })
    categories = [{"id": cid, "name": f"c{cid}"} for cid in (1, 18, 90)]
    json.dump(
        {"images": images, "annotations": annotations, "categories": categories},
        open(tmp_path / "annotations" / "instances_train2014.json", "w"),
    )
    return tmp_path


def test_coco14_sample(coco_root):
    from sgdm_tpu.data.coco14 import Coco14Dataset

    ds = Coco14Dataset(
        root=str(coco_root), split="train", image_size=32, base_size=64,
        condition_method="layout",
        condition={"layout": {"how": "oracle", "layout_dim": 81}},
    )
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["segmask"].shape == (32, 32, 81)
    # category 18 is the 2nd sorted category → contiguous id 2
    assert s["attr"][2] == 1.0
    assert s["attr"].sum() >= 1
