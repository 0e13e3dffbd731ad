"""Host-side batch pipeline.

Replaces torch DataLoader + worker processes (dassl/data/data_manager.py:
13-52, 202-275) with a thread-pool decode + prefetch design suited to JAX:

- Decoded images are cached in host RAM after first touch (few-shot train
  sets are tiny; eval sets cache their *transformed* tensors since the eval
  transform is deterministic) — after epoch 1 the pipeline is pure memory
  traffic, no JPEG decode on the hot path.
- Batches are fixed-shape: the trailing partial batch is padded and carries
  a ``valid`` mask, keeping every jitted step shape-stable (one compile).
- A background thread prefetches the next batch while the device computes.

Batch dict: {"img": (B,H,W,3) float32, "label": (B,) int32, "domain": (B,)
int32, "index": (B,) int32, "valid": (B,) bool} — the dict-batch contract of
the reference's DatasetWrapper (data_manager.py:237-263).
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..utils import read_image

# in-memory image store for synthetic datasets (impath = "synthetic://<key>")
_SYNTHETIC_STORE = {}


def register_synthetic_image(key, array):
    _SYNTHETIC_STORE[f"synthetic://{key}"] = array


def _decode(impath):
    if impath.startswith("synthetic://"):
        return _SYNTHETIC_STORE[impath]
    img = read_image(impath)  # PIL RGB
    return img


class DatasetWrapper:
    """Applies a transform to Datum items, with RAM caching."""

    def __init__(self, data_source, transform, cache_decoded=True,
                 cache_transformed=False, k_transforms=1, return_img0=False,
                 img0_transform=None, max_cache_items=60000, seed=None):
        self.data_source = data_source
        self.transform = transform
        self.k_transforms = k_transforms
        self.return_img0 = return_img0
        self.img0_transform = img0_transform
        self.seed = seed
        self._serve_counts = {}
        self._serve_lock = threading.Lock()
        self.max_cache_items = max_cache_items
        self._decoded_cache = {} if (cache_decoded and len(data_source) <= max_cache_items) else None
        self._transformed_cache = (
            {} if (cache_transformed and len(data_source) <= max_cache_items) else None
        )
        # the transformed cache is also byte-budgeted: a 50k-image test set
        # at 224^2 float32 is ~28 GB, far past any win from caching a
        # deterministic eval transform (FSVLM_EVAL_CACHE_MB overrides)
        import os

        self._transformed_bytes = 0
        self._transformed_budget = (
            int(os.environ.get("FSVLM_EVAL_CACHE_MB", "4096")) << 20
        )

    def _item_rng(self, idx):
        """Deterministic per-(item, visit) rng: immune to loader-thread
        interleaving, reproducible under cfg.SEED.  The visit-counter
        read-modify-write is locked so a duplicate index inside one batch
        (WeightedClassSampler draws with replacement) yields two DISTINCT
        augmentation draws instead of byte-identical views."""
        if self.seed is None:
            return None
        import random as _random

        with self._serve_lock:
            count = self._serve_counts.get(idx, 0)
            self._serve_counts[idx] = count + 1
        return _random.Random((self.seed * 1_000_003 + idx) * 7919 + count)

    def __len__(self):
        return len(self.data_source)

    def _get_image(self, idx):
        item = self.data_source[idx]
        if self._decoded_cache is not None and idx in self._decoded_cache:
            return self._decoded_cache[idx]
        img = _decode(item.impath)
        if self._decoded_cache is not None:
            self._decoded_cache[idx] = img
        return img

    def __getitem__(self, idx):
        item = self.data_source[idx]
        if self._transformed_cache is not None and idx in self._transformed_cache:
            x = self._transformed_cache[idx]
        else:
            img = self._get_image(idx)
            tfm_kwargs = {}
            rng = self._item_rng(idx)
            if rng is not None and getattr(self.transform, "rng", None) is not None:
                tfm_kwargs["rng"] = rng
            if self.k_transforms > 1:
                x = np.stack(
                    [self.transform(img, **tfm_kwargs) for _ in range(self.k_transforms)]
                )
            else:
                x = self.transform(img, **tfm_kwargs)
            if self._transformed_cache is not None:
                self._transformed_bytes += getattr(x, "nbytes", 0)
                if self._transformed_bytes > self._transformed_budget:
                    print(
                        "* transformed-tensor cache disabled: exceeds "
                        f"{self._transformed_budget >> 20} MB "
                        "(FSVLM_EVAL_CACHE_MB)"
                    )
                    self._transformed_cache = None
                else:
                    self._transformed_cache[idx] = x
        out = {
            "img": x,
            "label": item.label,
            "domain": item.domain,
            "index": idx,
            "impath": item.impath,
        }
        if self.return_img0:
            img = self._get_image(idx)
            out["img0"] = (
                self.img0_transform(img) if self.img0_transform is not None else np.asarray(img, np.float32) / 255.0
            )
        return out


class RawDatasetWrapper(DatasetWrapper):
    """Emits fixed-size uint8 images for the device-side fused augmentation
    pipeline (fsvlm_tpu.ops.preprocess): decode once, resize shorter edge to
    ``pre_size``, center crop, cache the uint8 array."""

    raw_uint8 = True

    def __init__(self, data_source, pre_size=256, **kw):
        kw.pop("cache_transformed", None)
        super().__init__(data_source, transform=None, cache_transformed=False, **kw)
        self.pre_size = pre_size
        # same item-count cap as the base class caches: a full-data run
        # (e.g. ImageNet, 1.28M x pre_size^2 x 3) must not accrete the
        # whole set in host RAM when the device-resident path already
        # declined it for budget
        self._raw_cache = {} if len(data_source) <= self.max_cache_items else None

    def __getitem__(self, idx):
        item = self.data_source[idx]
        x = self._raw_cache.get(idx) if self._raw_cache is not None else None
        if x is None and item.impath.lower().endswith((".jpg", ".jpeg")):
            # native C++ decode path (GIL released; see fsvlm_tpu.native)
            from ..native import decode_file

            x = decode_file(item.impath, self.pre_size)
            if x is not None and self._raw_cache is not None:
                self._raw_cache[idx] = x
        if x is None:
            from PIL import Image

            img = _decode(item.impath)
            if not isinstance(img, Image.Image):
                img = Image.fromarray(np.asarray(img))
            P = self.pre_size
            s = P / min(img.width, img.height)
            img = img.resize((round(img.width * s), round(img.height * s)), Image.BILINEAR)
            left = (img.width - P) // 2
            top = (img.height - P) // 2
            img = img.crop((left, top, left + P, top + P))
            x = np.asarray(img, np.uint8)
            if self._raw_cache is not None:
                self._raw_cache[idx] = x
        return {
            "img": x,
            "label": item.label,
            "domain": item.domain,
            "index": idx,
            "impath": item.impath,
        }

    def materialize(self, num_threads=8):
        """Decode/resize the WHOLE dataset into one (N, P, P, 3) uint8 array
        (dataset order, so row i serves index i) for the device-resident
        train path."""
        with ThreadPoolExecutor(max_workers=num_threads) as pool:
            items = list(pool.map(self.__getitem__, range(len(self))))
        return np.stack([it["img"] for it in items]).astype(np.uint8)


class BatchLoader:
    """Iterable over fixed-shape numpy batches with background prefetch."""

    def __init__(self, wrapper, sampler, batch_size, drop_last=False,
                 num_threads=8, prefetch=2, extra_keys=()):
        assert len(wrapper) > 0
        self.wrapper = wrapper
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.extra_keys = extra_keys
        self._pool = ThreadPoolExecutor(max_workers=num_threads)

    def __len__(self):
        n = len(self.sampler)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _collate(self, idxs):
        items = list(self._pool.map(self.wrapper.__getitem__, idxs))
        n_valid = len(items)
        B = self.batch_size
        if n_valid < B:
            items = items + [items[-1]] * (B - n_valid)
        img_dtype = (
            np.uint8 if getattr(self.wrapper, "raw_uint8", False) else np.float32
        )
        batch = {
            # copy=False: np.stack already yields the right dtype on both
            # pipelines (float32 transforms / uint8 raw) — no extra memcpy
            "img": np.stack([it["img"] for it in items]).astype(
                img_dtype, copy=False),
            "label": np.asarray([it["label"] for it in items], np.int32),
            "domain": np.asarray([it["domain"] for it in items], np.int32),
            "index": np.asarray([it["index"] for it in items], np.int32),
            "valid": np.arange(B) < n_valid,
        }
        if "img0" in items[0]:
            batch["img0"] = np.stack([it["img0"] for it in items]).astype(np.float32)
        for k in self.extra_keys:
            batch[k] = np.stack([it[k] for it in items])
        return batch

    def iter_index_batches(self):
        """Index-only epoch iteration for the device-resident path: same
        sampler order, padding and valid-mask semantics as __iter__, but
        batches carry no pixels — the jitted step gathers images from the
        HBM-resident cache by ``index``."""
        for chunk in self._index_batches():
            n_valid = len(chunk)
            idxs = list(chunk) + [chunk[-1]] * (self.batch_size - n_valid)
            items = [self.wrapper.data_source[i] for i in idxs]
            yield {
                "label": np.asarray([it.label for it in items], np.int32),
                "domain": np.asarray([it.domain for it in items], np.int32),
                "index": np.asarray(idxs, np.int32),
                "valid": np.arange(self.batch_size) < n_valid,
            }

    def _index_batches(self):
        idxs = list(iter(self.sampler))
        for start in range(0, len(idxs), self.batch_size):
            chunk = idxs[start : start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def __iter__(self):
        q = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()
        stop = threading.Event()
        failure = []

        def producer():
            try:
                for chunk in self._index_batches():
                    if stop.is_set():
                        return
                    batch = self._collate(chunk)
                    # bounded put that can observe abandonment: a consumer
                    # that drops the iterator mid-epoch (e.g. NetTrainerXU's
                    # cyclic zip) must not leave this thread blocked forever
                    # on q.put with prefetched batches pinned
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            pass
            except BaseException as e:  # surface in the consumer, never drop data silently
                failure.append(e)
            finally:
                # bounded blocking put: the consumer may still be draining a
                # full queue (normal exhaustion), so wait for space — but
                # give up once the consumer signalled abandonment
                while not stop.is_set():
                    try:
                        q.put(SENTINEL, timeout=0.1)
                        break
                    except queue.Full:
                        pass

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is SENTINEL:
                    if failure:
                        raise RuntimeError("data loader producer failed") from failure[0]
                    break
                yield batch
        finally:
            # runs on exhaustion AND on generator close/GC (GeneratorExit):
            # unblock + terminate the producer deterministically
            stop.set()
