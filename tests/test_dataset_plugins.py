"""Every dataset plugin loads from a synthetic on-disk layout.

Builds miniature directory trees matching docs/DATASETS.md (split_zhou json
files, annotation text files, classnames.txt + folder trees) and runs each
plugin through build_dataset, checking split sizes, label sets, and the
few-shot pipeline.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from fsvlm_tpu.config import get_cfg_default
from fsvlm_tpu.data import DATASET_REGISTRY, build_dataset
import fsvlm_tpu.data  # noqa: F401

RNG = np.random.RandomState(0)


def make_jpg(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(RNG.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(path)


def write_split_json(root, name, image_dir, classes, per_split=(4, 2, 2)):
    """Create images + split_zhou_<name>.json under root/<image_dir>."""
    split = {"train": [], "val": [], "test": []}
    for label, cname in enumerate(classes):
        for split_name, count in zip(["train", "val", "test"], per_split):
            for j in range(count):
                rel = f"{cname}/{split_name}_{j}.jpg"
                make_jpg(os.path.join(root, image_dir, rel))
                split[split_name].append([rel, label, cname])
    with open(os.path.join(root, f"split_zhou_{name}.json"), "w") as f:
        json.dump(split, f)


CLASSES = ["alpha", "beta", "gamma", "delta"]

JSON_PLUGINS = [
    ("OxfordPets", "oxford_pets", "images", "OxfordPets"),
    ("OxfordFlowers", "oxford_flowers", "jpg", "OxfordFlowers"),
    ("DescribableTextures", "dtd", "images", "DescribableTextures"),
    ("EuroSAT", "eurosat", "2750", "EuroSAT"),
    ("Food101", "food-101", "images", "Food101"),
    ("SUN397", "sun397", "SUN397", "SUN397"),
    ("Caltech101", "caltech-101", "101_ObjectCategories", "Caltech101"),
    ("UCF101", "ucf101", "UCF-101-midframes", "UCF101"),
]


@pytest.mark.parametrize("plugin,folder,image_dir,split_name", JSON_PLUGINS)
def test_json_split_plugins(tmp_path, plugin, folder, image_dir, split_name):
    root = tmp_path
    ds_dir = os.path.join(root, folder)
    write_split_json(ds_dir, split_name, image_dir, CLASSES)

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.NAME = plugin
    cfg.DATASET.NUM_SHOTS = 2
    cfg.SEED = 1
    ds = build_dataset(cfg)
    assert ds.num_classes == 4
    assert len(ds.train_x) == 8  # 2-shot x 4 classes
    assert len(ds.test) == 8
    assert sorted(ds.classnames) == sorted(CLASSES)

    # base/new subsampling
    cfg2 = get_cfg_default()
    cfg2.DATASET.ROOT = str(root)
    cfg2.DATASET.NAME = plugin
    cfg2.DATASET.NUM_SHOTS = 0
    cfg2.DATASET.SUBSAMPLE_CLASSES = "base"
    ds2 = build_dataset(cfg2)
    assert ds2.num_classes == 2


def test_stanford_cars_json(tmp_path):
    root = tmp_path
    ds_dir = os.path.join(root, "stanford_cars")
    # StanfordCars stores paths relative to the dataset dir itself
    write_split_json(ds_dir, "StanfordCars", "", CLASSES)
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.NAME = "StanfordCars"
    cfg.DATASET.NUM_SHOTS = 1
    cfg.SEED = 0
    ds = build_dataset(cfg)
    assert ds.num_classes == 4 and len(ds.train_x) == 4


def test_fgvc_aircraft(tmp_path):
    ds_dir = tmp_path / "fgvc_aircraft"
    (ds_dir / "images").mkdir(parents=True)
    variants = ["707-320", "A340-300", "DR-400"]
    (ds_dir / "variants.txt").write_text("\n".join(variants) + "\n")
    for split, count in [("train", 3), ("val", 2), ("test", 2)]:
        lines = []
        for label, v in enumerate(variants):
            for j in range(count):
                imid = f"{split}{label}{j}"
                make_jpg(str(ds_dir / "images" / f"{imid}.jpg"))
                lines.append(f"{imid} {v}")
        (ds_dir / f"images_variant_{split}.txt").write_text("\n".join(lines) + "\n")

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.NAME = "FGVCAircraft"
    cfg.DATASET.NUM_SHOTS = 2
    cfg.SEED = 0
    ds = build_dataset(cfg)
    assert ds.num_classes == 3
    assert len(ds.train_x) == 6
    assert ds.lab2cname_full == dict(enumerate(variants))


def _imagenet_tree(root, wnids, classnames, n_train=3, n_val=2):
    d = os.path.join(root, "imagenet")
    with open(os.path.join(d, "classnames.txt"), "w") as f:
        pass
    with open(os.path.join(d, "classnames.txt"), "w") as f:
        for w, c in zip(wnids, classnames):
            f.write(f"{w} {c}\n")
    for split, n in [("train", n_train), ("val", n_val)]:
        for w in wnids:
            for j in range(n):
                make_jpg(os.path.join(d, "images", split, w, f"{j}.jpg"))


def test_imagenet_and_variants(tmp_path):
    wnids = ["n01440764", "n01443537", "n01484850"]
    classnames = ["tench", "goldfish", "great white shark"]
    os.makedirs(tmp_path / "imagenet")
    _imagenet_tree(str(tmp_path), wnids, classnames)

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.NAME = "ImageNet"
    cfg.DATASET.NUM_SHOTS = 2
    cfg.SEED = 0
    ds = build_dataset(cfg)
    assert ds.num_classes == 3
    assert len(ds.train_x) == 6
    assert ds.classnames == classnames

    # shift variants: folder-per-wnid eval-only layouts
    for plugin, folder, subdir in [
        ("ImageNetSketch", "imagenet-sketch", "images"),
        ("ImageNetA", "imagenet-adversarial", "imagenet-a"),
        ("ImageNetR", "imagenet-rendition", "imagenet-r"),
    ]:
        d = tmp_path / folder
        (d / subdir).mkdir(parents=True)
        with open(d / "classnames.txt", "w") as f:
            for w, c in zip(wnids, classnames):
                f.write(f"{w} {c}\n")
        for w in wnids:
            make_jpg(str(d / subdir / w / "img.jpg"))
        cfg = get_cfg_default()
        cfg.DATASET.ROOT = str(tmp_path)
        cfg.DATASET.NAME = plugin
        ds = build_dataset(cfg)
        assert ds.num_classes == 3 and len(ds.test) == 3, plugin

    # ImageNetV2: numeric label folders
    d = tmp_path / "imagenetv2" / "imagenetv2-matched-frequency-format-val"
    d.mkdir(parents=True)
    with open(tmp_path / "imagenetv2" / "classnames.txt", "w") as f:
        for w, c in zip(wnids, classnames):
            f.write(f"{w} {c}\n")
    # plugin expects 1000 numeric class dirs; build a 3-class classnames file
    # and matching 0..2 dirs — patch the range via the folder count
    for label in range(3):
        make_jpg(str(d / str(label) / "img.jpg"))
    import fsvlm_tpu.data.datasets.recognition as rec

    orig = rec.ImageNetV2.read_data

    def read3(self, classnames):
        from fsvlm_tpu.data.base_dataset import Datum
        from fsvlm_tpu.utils import listdir_nohidden

        folders = list(classnames.keys())
        items = []
        for label in range(3):
            class_dir = os.path.join(self.image_dir, str(label))
            for imname in listdir_nohidden(class_dir):
                items.append(
                    Datum(
                        impath=os.path.join(class_dir, imname),
                        label=label,
                        classname=classnames[folders[label]],
                    )
                )
        return items

    rec.ImageNetV2.read_data = read3
    try:
        cfg = get_cfg_default()
        cfg.DATASET.ROOT = str(tmp_path)
        cfg.DATASET.NAME = "ImageNetV2"
        ds = build_dataset(cfg)
        assert ds.num_classes == 3
    finally:
        rec.ImageNetV2.read_data = orig


def test_sun397_partition_fallback(tmp_path):
    """SUN397 builds its split from the Partitions.zip layout: ClassName.txt
    + Training_01/Testing_01.txt live under sun397/ (NOT under SUN397/),
    images under sun397/SUN397/<letter>/<class>/ (sun397.py:30,90)."""
    ds_dir = tmp_path / "sun397"
    classes = ["/a/abbey", "/b/bar", "/b/bedroom", "/c/castle", "/c/church/outdoor"]
    (ds_dir / "SUN397").mkdir(parents=True)
    (ds_dir / "ClassName.txt").write_text("\n".join(classes) + "\n")
    train_lines, test_lines = [], []
    for cname in classes:
        for j in range(10):
            rel = f"{cname}/sun_{j:06d}.jpg"
            make_jpg(str(ds_dir / "SUN397" / rel[1:]))
            (train_lines if j < 5 else test_lines).append(rel)
    (ds_dir / "Training_01.txt").write_text("\n".join(train_lines) + "\n")
    (ds_dir / "Testing_01.txt").write_text("\n".join(test_lines) + "\n")

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.NAME = "SUN397"
    cfg.SEED = 0
    cfg.DATASET.NUM_SHOTS = 0
    ds = build_dataset(cfg)
    assert ds.num_classes == 5
    assert len(ds.train_x) + len(ds.val) == 25 and len(ds.test) == 25
    # multi-level class names reverse the path segments
    assert "outdoor church" in ds.classnames
    assert os.path.exists(ds_dir / "split_zhou_SUN397.json")


def test_folder_split_fallback(tmp_path):
    """DTD-style plugins build + persist the split json from a bare class-
    per-folder tree when no split file exists."""
    image_dir = tmp_path / "dtd" / "images"
    for cname in CLASSES:
        for j in range(10):
            make_jpg(str(image_dir / cname / f"{j}.jpg"))
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.NAME = "DescribableTextures"
    cfg.SEED = 0
    cfg.DATASET.NUM_SHOTS = 0
    ds = build_dataset(cfg)
    assert ds.num_classes == 4
    assert os.path.exists(tmp_path / "dtd" / "split_zhou_DescribableTextures.json")
    # 50/20/30 split of 10 images per class
    assert len(ds.train_x) == 20 and len(ds.val) == 8 and len(ds.test) == 12
