"""Native C++ JPEG decoder: correctness vs PIL + loader integration."""

import numpy as np
import pytest
from PIL import Image

from fsvlm_tpu.native import decode_file, native_available


@pytest.fixture(scope="module")
def jpeg_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("imgs") / "t.jpg"
    rng = np.random.RandomState(0)
    grad = (np.mgrid[0:300, 0:400][0] % 256).astype(np.uint8)
    img = np.stack([grad, grad[::-1], np.full_like(grad, 128)], -1)
    Image.fromarray(img).save(path, quality=95)
    return str(path)


def test_native_matches_pil(jpeg_path):
    if not native_available():
        pytest.skip("native library not built (run make -C native)")
    out = decode_file(jpeg_path, 224)
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8

    pim = Image.open(jpeg_path).convert("RGB")
    s = 224 / min(pim.size)
    pim = pim.resize((round(pim.width * s), round(pim.height * s)), Image.BILINEAR)
    left = (pim.width - 224) // 2
    top = (pim.height - 224) // 2
    ref = np.asarray(pim.crop((left, top, left + 224, top + 224)))
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.mean() < 1.0 and diff.max() <= 40  # JPEG + rounding wiggle


def test_native_handles_bad_input(tmp_path):
    if not native_available():
        pytest.skip("native library not built")
    bad = tmp_path / "junk.jpg"
    bad.write_bytes(b"definitely not a jpeg")
    assert decode_file(str(bad), 224) is None
    assert decode_file(str(tmp_path / "missing.jpg"), 224) is None


def test_raw_wrapper_uses_native(jpeg_path):
    from fsvlm_tpu.data.base_dataset import Datum
    from fsvlm_tpu.data.loader import RawDatasetWrapper

    wrapper = RawDatasetWrapper([Datum(impath=jpeg_path, label=0)], pre_size=64)
    item = wrapper[0]
    assert item["img"].shape == (64, 64, 3)
    assert item["img"].dtype == np.uint8
