"""DataManager: dataset + loaders wiring (parity: dassl data_manager.py:55-199).

Builds the dataset plugin from DATASET_REGISTRY, the train/test transforms,
and the four loaders (train_x, train_u, val, test), and prints the dataset
summary table.  The fork's lab2cname_all passthrough (data_manager.py:67-71)
is exposed for FGVCAircraft's full-class-name list.
"""

from ..utils.registry import Registry
from .base_dataset import DatasetBase
from .loader import BatchLoader, DatasetWrapper
from .samplers import build_sampler
from .transforms import build_transform

DATASET_REGISTRY = Registry("DATASET")


def build_dataset(cfg):
    return DATASET_REGISTRY.get(cfg.DATASET.NAME)(cfg)


class DataManager:
    def __init__(self, cfg, custom_tfm_train=None, custom_tfm_test=None,
                 dataset_wrapper=None):
        self.cfg = cfg
        dataset = build_dataset(cfg)
        self.dataset = dataset

        tfm_train = custom_tfm_train or build_transform(cfg, is_train=True)
        tfm_test = custom_tfm_test or build_transform(cfg, is_train=False)
        if cfg.SEED >= 0 and hasattr(tfm_train, "rng"):
            # deterministic augmentation stream under a fixed seed (the
            # reference reaches the same property via the global RNG seeded
            # in set_random_seed, dassl tools.py:72-76)
            import random as _random

            tfm_train.rng = _random.Random(cfg.SEED)
        self.tfm_train, self.tfm_test = tfm_train, tfm_test
        wrapper_cls = dataset_wrapper or DatasetWrapper

        def make_loader(data_source, sampler_type, batch_size, n_ins, is_train, tfm,
                        n_domain=0):
            if not data_source:
                return None
            sampler = build_sampler(
                sampler_type, data_source, batch_size=batch_size,
                n_domain=n_domain, n_ins=n_ins,
                seed=cfg.SEED if cfg.SEED >= 0 else None,
            )
            if is_train and cfg.DATALOADER.DEVICE_AUG:
                # uint8 raw pipeline; augmentation fuses into the train step
                from .loader import RawDatasetWrapper

                wrapper = RawDatasetWrapper(data_source, pre_size=cfg.DATALOADER.PRE_SIZE)
                return BatchLoader(
                    wrapper,
                    sampler,
                    batch_size=batch_size,
                    drop_last=len(data_source) >= batch_size,
                    num_threads=max(1, cfg.DATALOADER.NUM_WORKERS),
                )
            wrapper = wrapper_cls(
                data_source,
                tfm,
                # eval: cache the transformed tensor only — keeping the
                # decoded PIL copy too would double host RAM for images
                # that __getitem__ never re-reads
                cache_decoded=is_train,
                cache_transformed=not is_train,
                k_transforms=cfg.DATALOADER.K_TRANSFORMS if is_train else 1,
                return_img0=cfg.DATALOADER.RETURN_IMG0 and is_train,
                img0_transform=tfm_test,
                seed=cfg.SEED if cfg.SEED >= 0 else None,
            )
            return BatchLoader(
                wrapper,
                sampler,
                batch_size=batch_size,
                drop_last=is_train and len(data_source) >= batch_size,
                num_threads=max(1, cfg.DATALOADER.NUM_WORKERS),
            )

        self.train_loader_x = make_loader(
            dataset.train_x,
            cfg.DATALOADER.TRAIN_X.SAMPLER,
            cfg.DATALOADER.TRAIN_X.BATCH_SIZE,
            cfg.DATALOADER.TRAIN_X.N_INS,
            True,
            tfm_train,
            n_domain=cfg.DATALOADER.TRAIN_X.N_DOMAIN,
        )
        train_u_cfg = cfg.DATALOADER.TRAIN_U
        sampler_u = train_u_cfg.SAMPLER
        bs_u, nins_u = train_u_cfg.BATCH_SIZE, train_u_cfg.N_INS
        if train_u_cfg.SAME_AS_X:
            sampler_u = cfg.DATALOADER.TRAIN_X.SAMPLER
            bs_u = cfg.DATALOADER.TRAIN_X.BATCH_SIZE
            nins_u = cfg.DATALOADER.TRAIN_X.N_INS
        self.train_loader_u = make_loader(
            dataset.train_u, sampler_u, bs_u, nins_u, True, tfm_train,
            n_domain=cfg.DATALOADER.TRAIN_U.N_DOMAIN,
        )
        self.val_loader = make_loader(
            dataset.val,
            cfg.DATALOADER.TEST.SAMPLER,
            cfg.DATALOADER.TEST.BATCH_SIZE,
            0,
            False,
            tfm_test,
        )
        self.test_loader = make_loader(
            dataset.test,
            cfg.DATALOADER.TEST.SAMPLER,
            cfg.DATALOADER.TEST.BATCH_SIZE,
            0,
            False,
            tfm_test,
        )

        self._num_classes = dataset.num_classes
        # reference parity (Dassl data_manager.py:73-79): source-domain count
        # for the DA/DG trainers that build per-domain experts
        self._num_source_domains = len(cfg.DATASET.SOURCE_DOMAINS) or (
            max((d.domain for d in dataset.train_x), default=0) + 1
        )
        self._lab2cname = dataset.lab2cname
        # fork extension: full (unsubsampled) class-name map when the plugin
        # provides one (FGVCAircraft.lab2cname_full)
        self._lab2cname_all = getattr(dataset, "lab2cname_full", None)

        if cfg.VERBOSE:
            self.show_dataset_summary(cfg)

    num_classes = property(lambda self: self._num_classes)
    num_source_domains = property(lambda self: self._num_source_domains)
    lab2cname = property(lambda self: self._lab2cname)
    lab2cname_all = property(lambda self: self._lab2cname_all)

    def show_dataset_summary(self, cfg):
        rows = [
            ("Dataset", cfg.DATASET.NAME),
            ("# classes", f"{self.num_classes:,}"),
            ("# train_x", f"{len(self.dataset.train_x):,}"),
        ]
        if self.dataset.train_u:
            rows.append(("# train_u", f"{len(self.dataset.train_u):,}"))
        if self.dataset.val:
            rows.append(("# val", f"{len(self.dataset.val):,}"))
        rows.append(("# test", f"{len(self.dataset.test):,}"))
        width = max(len(k) for k, _ in rows) + 2
        print("***** Dataset statistics *****")
        for k, v in rows:
            print(f"  {k:<{width}} {v}")
