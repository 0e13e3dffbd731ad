"""Legacy DA/DG/SSL dataset plugins against tiny on-disk fixtures that
mimic each reference layout (Dassl dassl/data/datasets/{da,dg,ssl})."""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from fsvlm_tpu.config import get_cfg_default
from fsvlm_tpu.data.data_manager import DATASET_REGISTRY
import fsvlm_tpu.data.datasets  # noqa: F401


def _img(path):
    os.makedirs(osp.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(path)


def base_cfg(root, **kw):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(root)
    for k, v in kw.items():
        node = cfg
        keys = k.split(".")
        for sub in keys[:-1]:
            node = node[sub]
        node[keys[-1]] = v
    return cfg


def test_office31_layout(tmp_path):
    for dom in ("amazon", "webcam"):
        for cls in ("bike", "mug"):
            for i in range(3):
                _img(str(tmp_path / "office31" / dom / cls / f"{i}.jpg"))
    cfg = base_cfg(tmp_path, **{"DATASET.NAME": "Office31",
                                "DATASET.SOURCE_DOMAINS": ["amazon"],
                                "DATASET.TARGET_DOMAINS": ["webcam"]})
    ds = DATASET_REGISTRY.get("Office31")(cfg)
    assert len(ds.train_x) == 6 and len(ds.train_u) == 6 and len(ds.test) == 6
    assert ds.num_classes == 2
    assert {d.classname for d in ds.train_x} == {"bike", "mug"}
    assert all(d.domain == 0 for d in ds.train_x)


def test_office_home_lowercases(tmp_path):
    for dom in ("art", "product"):
        for cls in ("Chair", "Desk"):
            _img(str(tmp_path / "office_home" / dom / cls / "0.jpg"))
    cfg = base_cfg(tmp_path, **{"DATASET.NAME": "OfficeHome",
                                "DATASET.SOURCE_DOMAINS": ["art"],
                                "DATASET.TARGET_DOMAINS": ["product"]})
    ds = DATASET_REGISTRY.get("OfficeHome")(cfg)
    assert {d.classname for d in ds.train_x} == {"chair", "desk"}


def test_digit5_usps_repeat_and_labels(tmp_path):
    for dom in ("mnist", "usps"):
        for split in ("train_images", "test_images"):
            for i in range(4):
                _img(str(tmp_path / "digit5" / dom / split / f"img{i}_{i % 2}.png"))
    cfg = base_cfg(tmp_path, **{"DATASET.SOURCE_DOMAINS": ["usps"],
                                "DATASET.TARGET_DOMAINS": ["mnist"]})
    ds = DATASET_REGISTRY.get("Digit5")(cfg)
    # usps train is repeated 3x (da/digit5.py:58-61)
    assert len(ds.train_x) == 12
    assert {d.label for d in ds.train_x} == {0, 1}
    assert len(ds.test) == 4


def test_visda17_image_list(tmp_path):
    for filedir, n in (("train", 3), ("validation", 2)):
        lines = []
        for i in range(n):
            rel = f"cls{i % 2}/im{i}.jpg"
            _img(str(tmp_path / "visda17" / filedir / rel))
            lines.append(f"{rel} {i % 2}")
        with open(tmp_path / "visda17" / filedir / "image_list.txt", "w") as f:
            f.write("\n".join(lines))
    cfg = base_cfg(tmp_path, **{"DATASET.SOURCE_DOMAINS": ["synthetic"],
                                "DATASET.TARGET_DOMAINS": ["real"]})
    ds = DATASET_REGISTRY.get("VisDA17")(cfg)
    assert len(ds.train_x) == 3 and len(ds.test) == 2
    assert ds.train_x[0].classname == "cls0"


def test_domainnet_and_mini_split_files(tmp_path):
    d = tmp_path / "domainnet"
    for split_dir, doms in (("splits", ["clipart", "real"]),
                            ("splits_mini", ["clipart", "real"])):
        os.makedirs(d / split_dir, exist_ok=True)
        for dom in doms:
            for split in ("train", "test"):
                lines = []
                for i in range(2):
                    rel = f"{dom}/dog/{split}{i}.jpg"
                    _img(str(d / rel))
                    lines.append(f"{rel} {i}")
                with open(d / split_dir / f"{dom}_{split}.txt", "w") as f:
                    f.write("\n".join(lines))
    cfg = base_cfg(tmp_path, **{"DATASET.SOURCE_DOMAINS": ["clipart"],
                                "DATASET.TARGET_DOMAINS": ["real"]})
    ds = DATASET_REGISTRY.get("DomainNet")(cfg)
    assert len(ds.train_x) == 2 and len(ds.val) == 2 and len(ds.test) == 2
    assert ds.train_x[0].classname == "dog"
    mini = DATASET_REGISTRY.get("miniDomainNet")(cfg)
    assert len(mini.train_x) == 2 and mini.val is None


def test_cifarstl_label_from_folder(tmp_path):
    for dom in ("cifar", "stl"):
        for split in ("train", "test"):
            for cls in ("0_airplane", "1_bird"):
                _img(str(tmp_path / "cifar_stl" / dom / split / cls / "a.png"))
    cfg = base_cfg(tmp_path, **{"DATASET.SOURCE_DOMAINS": ["cifar"],
                                "DATASET.TARGET_DOMAINS": ["stl"]})
    ds = DATASET_REGISTRY.get("CIFARSTL")(cfg)
    assert {d.label for d in ds.train_x} == {0, 1}


def test_pacs_kfold_and_error_path(tmp_path):
    d = tmp_path / "pacs"
    err_rel = "sketch/dog/n02103406_4068-1.png"
    for dom in ("photo", "sketch"):
        for split in ("train", "crossval"):
            lines = []
            for i in range(2):
                rel = f"{dom}/dog/im{split}{i}.png"
                _img(str(d / "images" / rel))
                lines.append(f"{rel} 1")  # 1-based labels
            if dom == "sketch" and split == "train":
                _img(str(d / "images" / err_rel))
                lines.append(f"{err_rel} 1")
            os.makedirs(d / "splits", exist_ok=True)
            with open(d / "splits" / f"{dom}_{split}_kfold.txt", "w") as f:
                f.write("\n".join(lines))
    cfg = base_cfg(tmp_path, **{"DATASET.SOURCE_DOMAINS": ["photo"],
                                "DATASET.TARGET_DOMAINS": ["sketch"]})
    ds = DATASET_REGISTRY.get("PACS")(cfg)
    assert len(ds.train_x) == 2 and len(ds.val) == 2
    # "all" split = train + crossval, with the known-bad image skipped
    assert len(ds.test) == 4
    assert all(d_.label == 0 for d_ in ds.train_x)  # 1-based -> 0-based


def test_vlcs_uppercase_dirs(tmp_path):
    for dom in ("CALTECH", "SUN"):
        for split in ("train", "crossval", "test"):
            for cls in ("bird", "car"):
                _img(str(tmp_path / "VLCS" / dom / split / cls / "x.jpg"))
    cfg = base_cfg(tmp_path, **{"DATASET.SOURCE_DOMAINS": ["caltech"],
                                "DATASET.TARGET_DOMAINS": ["sun"]})
    ds = DATASET_REGISTRY.get("VLCS")(cfg)
    assert len(ds.train_x) == 2 and len(ds.val) == 2 and len(ds.test) == 2


def test_digits_dg_all_split(tmp_path):
    for dom in ("mnist", "syn"):
        for split in ("train", "val"):
            for cls in ("0", "1"):
                _img(str(tmp_path / "digits_dg" / dom / split / cls / "x.png"))
    cfg = base_cfg(tmp_path, **{"DATASET.SOURCE_DOMAINS": ["mnist"],
                                "DATASET.TARGET_DOMAINS": ["syn"]})
    ds = DATASET_REGISTRY.get("DigitsDG")(cfg)
    assert len(ds.train_x) == 2 and len(ds.val) == 2 and len(ds.test) == 4


def test_digit_single_deterministic_cap(tmp_path):
    for dom in ("mnist", "svhn"):
        for split in ("train_images", "test_images"):
            for i in range(5):
                _img(str(tmp_path / "digit5" / dom / split / f"im{i}_{i % 2}.png"))
    cfg = base_cfg(tmp_path, **{"DATASET.SOURCE_DOMAINS": ["mnist"],
                                "DATASET.TARGET_DOMAINS": ["svhn"]})
    ds = DATASET_REGISTRY.get("DigitSingle")(cfg)
    assert len(ds.train_x) == 5 and len(ds.val) == 5 and len(ds.test) == 5


def test_cifar10c_requires_type(tmp_path):
    for cls in ("cat", "dog"):
        _img(str(tmp_path / "cifar10" / "train" / cls / "x.png"))
        _img(str(tmp_path / "cifar10_c" / "fog" / "3" / cls / "x.png"))
    cfg = base_cfg(tmp_path, **{"DATASET.SOURCE_DOMAINS": ["cifar10"],
                                "DATASET.TARGET_DOMAINS": ["cifar10_c"]})
    with pytest.raises(ValueError, match="CIFAR_C_TYPE"):
        DATASET_REGISTRY.get("CIFAR10C")(cfg)
    cfg2 = base_cfg(tmp_path, **{"DATASET.SOURCE_DOMAINS": ["cifar10"],
                                 "DATASET.TARGET_DOMAINS": ["cifar10_c"],
                                 "DATASET.CIFAR_C_TYPE": "fog",
                                 "DATASET.CIFAR_C_LEVEL": 3})
    ds = DATASET_REGISTRY.get("CIFAR10C")(cfg2)
    assert len(ds.train_x) == 2 and len(ds.test) == 2


def test_ssl_cifar10_partition(tmp_path):
    for cls in ("cat", "dog"):
        for i in range(10):
            _img(str(tmp_path / "cifar10" / "train" / cls / f"{i:02d}.png"))
        for i in range(4):
            _img(str(tmp_path / "cifar10" / "test" / cls / f"{i}.png"))
    cfg = base_cfg(tmp_path, **{"DATASET.NUM_LABELED": 4, "SEED": 1,
                                "DATASET.VAL_PERCENT": 0.2})
    ds = DATASET_REGISTRY.get("CIFAR10")(cfg)
    # per class: 10 imgs -> 2 val, 8 train -> 2 labeled + 6 unlabeled
    assert len(ds.val) == 4
    assert len(ds.train_x) == 4
    assert len(ds.train_u) == 12
    assert len(ds.test) == 8
    cfg.DATASET.ALL_AS_UNLABELED = True
    ds2 = DATASET_REGISTRY.get("CIFAR10")(cfg)
    assert len(ds2.train_u) == 16


def test_stl10_folds_and_unlabeled(tmp_path):
    d = tmp_path / "stl10"
    for i in range(6):
        _img(str(d / "train" / f"im{i:02d}_{i % 2}.png"))
        _img(str(d / "test" / f"im{i}_{i % 2}.png"))
    for i in range(4):
        _img(str(d / "unlabeled" / f"u{i}_none.png"))
    os.makedirs(d / "stl10_binary", exist_ok=True)
    with open(d / "stl10_binary" / "fold_indices.txt", "w") as f:
        f.write("0 2 4\n1 3 5\n")
    cfg = base_cfg(tmp_path, **{"DATASET.STL10_FOLD": 1})
    ds = DATASET_REGISTRY.get("STL10")(cfg)
    assert len(ds.train_x) == 3
    assert all(item.label == 1 for item in ds.train_x)  # fold 1 = odd indices
    assert len(ds.train_u) == 4
    assert all(item.label == -1 for item in ds.train_u)
    assert len(ds.test) == 6


def test_wilds_gated():
    cfg = get_cfg_default()
    with pytest.raises(RuntimeError, match="wilds"):
        DATASET_REGISTRY.get("Camelyon17")(cfg)
