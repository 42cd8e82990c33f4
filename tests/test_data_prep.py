"""Dataset prep CLI (`sgdm_tpu.data.prep`): the three reference ds_utils
prep scripts as parameterized functions — curated-coco copy, FFHQ
flattening, Cityscapes split resize (bilinear imgs / nearest labels)."""

import numpy as np
import pytest
from PIL import Image

from sgdm_tpu.data.prep import (
    extract_cocostuff_from_coco17,
    ffhq_onelevel,
    main,
    resize_cityscapes,
)


def _png(path, size=(8, 8), value=None):
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = (np.full((*size, 3), value, np.uint8) if value is not None
           else np.random.default_rng(0).integers(0, 255, (*size, 3),
                                                  dtype=np.uint8))
    Image.fromarray(arr).save(path)


class TestCocostuffExtract:
    def _tree(self, tmp_path, ids=("000001", "000002")):
        for split in ("train", "val"):
            for i in ids:
                _png(tmp_path / "images" / f"{split}2017" / f"{i}.jpg")
            cur = tmp_path / "curated" / f"{split}2017" / "Coco164kFull_Stuff_Coarse_7.txt"
            cur.parent.mkdir(parents=True, exist_ok=True)
            cur.write_text("\n".join(ids) + "\n")
        return tmp_path

    def test_copies_curated_subset(self, tmp_path):
        root = self._tree(tmp_path)
        # an uncurated extra image must NOT be copied
        _png(root / "images" / "train2017" / "999999.jpg")
        counts = extract_cocostuff_from_coco17(
            root / "images", root / "curated", root / "dest")
        assert counts == {"train": 2, "val": 2}
        got = sorted(p.name for p in (root / "dest" / "train").iterdir())
        assert got == ["000001.jpg", "000002.jpg"]

    def test_missing_image_is_loud(self, tmp_path):
        root = self._tree(tmp_path)
        (root / "images" / "val2017" / "000002.jpg").unlink()
        with pytest.raises(FileNotFoundError):
            extract_cocostuff_from_coco17(
                root / "images", root / "curated", root / "dest")

    def test_limit(self, tmp_path):
        root = self._tree(tmp_path, ids=("a", "b", "c"))
        counts = extract_cocostuff_from_coco17(
            root / "images", root / "curated", root / "dest", limit=1)
        assert counts == {"train": 1, "val": 1}


class TestFFHQOnelevel:
    def test_flattens_shards(self, tmp_path):
        for shard, name in (("00000", "00001.png"), ("01000", "01001.png")):
            _png(tmp_path / "src" / shard / name)
        n = ffhq_onelevel(tmp_path / "src", tmp_path / "flat")
        assert n == 2
        assert sorted(p.name for p in (tmp_path / "flat").iterdir()) == [
            "00001.png", "01001.png"]

    def test_duplicate_basename_is_loud(self, tmp_path):
        _png(tmp_path / "src" / "a" / "x.png")
        _png(tmp_path / "src" / "b" / "x.png")
        with pytest.raises(ValueError, match="duplicate"):
            ffhq_onelevel(tmp_path / "src", tmp_path / "flat")


class TestCityscapesResize:
    def test_resizes_with_split_interp(self, tmp_path):
        # mode-L class-id map: nearest keeps the id set, output stays 2-D
        lbl = np.zeros((16, 16), np.uint8)
        lbl[:, 8:] = 26
        for split in ("train_extra", "val"):
            _png(tmp_path / "cs" / "leftImg8bit" / split / "city"
                 / "f_leftImg8bit.png", size=(16, 16))
            gt = tmp_path / "cs" / "gtCoarse" / split / "city"
            gt.mkdir(parents=True, exist_ok=True)
            Image.fromarray(lbl, mode="L").save(gt / "f_gtCoarse_labelIds.png")
            # the sibling instanceIds (mode I, >8-bit ids) and color PNGs
            # must NOT be swept into the labels output
            Image.fromarray(np.full((16, 16), 26001, np.int32),
                            mode="I").save(gt / "f_gtCoarse_instanceIds.png")
            _png(gt / "f_gtCoarse_color.png", size=(16, 16))
        counts = resize_cityscapes(tmp_path / "cs", tmp_path / "out", size=8)
        assert counts == {"train_extra": (1, 1), "val": (1, 1)}
        out_files = sorted(p.name for p in
                           (tmp_path / "out" / "val_labels").iterdir())
        assert out_files == ["f_gtCoarse_labelIds.png"]
        out_lbl = np.asarray(Image.open(
            tmp_path / "out" / "val_labels" / "f_gtCoarse_labelIds.png"))
        assert out_lbl.shape == (8, 8)             # native mode: stays 2-D
        assert set(np.unique(out_lbl)) <= {0, 26}  # nearest: ids intact
        out_img = np.asarray(Image.open(
            tmp_path / "out" / "val_images" / "f_leftImg8bit.png"))
        assert out_img.shape == (8, 8, 3)

    def test_image_label_count_mismatch_is_loud(self, tmp_path):
        _png(tmp_path / "cs" / "leftImg8bit" / "val" / "c" / "a.png")
        _png(tmp_path / "cs" / "leftImg8bit" / "val" / "c" / "b.png")
        lbl = tmp_path / "cs" / "gtCoarse" / "val" / "c"
        lbl.mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.zeros((8, 8), np.uint8),
                        mode="L").save(lbl / "a_gtCoarse_labelIds.png")
        with pytest.raises(ValueError, match="mis-pair"):
            resize_cityscapes(tmp_path / "cs", tmp_path / "out", size=8,
                              splits=("val",))

    def test_cli_entry(self, tmp_path, capsys):
        _png(tmp_path / "src" / "s" / "f.png")
        main(["ffhq-onelevel", "--src", str(tmp_path / "src"),
              "--dest", str(tmp_path / "flat")])
        assert "{'copied': 1}" in capsys.readouterr().out
