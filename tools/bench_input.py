#!/usr/bin/env python
"""Host input-pipeline microbenchmark: decode->resize->crop throughput.

Generates a directory of JPEGs, then measures images/sec through the
RawDatasetWrapper (native C++ path when built, PIL fallback otherwise) and
through the host TrainTransform path, single- and multi-threaded.
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-images", type=int, default=200)
    p.add_argument("--src-size", type=int, default=500)
    p.add_argument("--pre-size", type=int, default=256)
    p.add_argument("--threads", type=int, default=8)
    args = p.parse_args()

    from fsvlm_tpu.data.base_dataset import Datum
    from fsvlm_tpu.data.loader import BatchLoader, RawDatasetWrapper
    from fsvlm_tpu.data.samplers import SequentialSampler
    from fsvlm_tpu.native import native_available

    tmp = tempfile.mkdtemp()
    rng = np.random.RandomState(0)
    items = []
    for i in range(args.n_images):
        arr = rng.randint(0, 255, (args.src_size, args.src_size, 3), dtype=np.uint8)
        path = os.path.join(tmp, f"{i}.jpg")
        Image.fromarray(arr).save(path, quality=90)
        items.append(Datum(impath=path, label=0))

    print(f"native decoder available: {native_available()}")

    wrapper = RawDatasetWrapper(items, pre_size=args.pre_size)
    loader = BatchLoader(
        wrapper, SequentialSampler(items), batch_size=32, num_threads=args.threads
    )
    # cold epoch (decode)
    t0 = time.time()
    n = sum(b["img"].shape[0] for b in loader)
    cold = time.time() - t0
    # warm epoch (RAM cache)
    t0 = time.time()
    n = sum(b["img"].shape[0] for b in loader)
    warm = time.time() - t0
    print(
        f"raw uint8 pipeline ({args.threads} threads): "
        f"cold {args.n_images/cold:.0f} img/s, warm {args.n_images/warm:.0f} img/s"
    )


if __name__ == "__main__":
    main()
