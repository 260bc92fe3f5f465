"""image/resize.py — the first stage of every image corpus build
(parity meerqat/image/resize.py: torchvision Resize(512) smaller-edge
semantics, skip-existing resumability, error-tolerant batch)."""
import time

import numpy as np
import pytest
from PIL import Image

from viquae_tpu.image.resize import (
    dataset_resize,
    resize_image,
    smaller_edge_size,
)


# ---------------------------------------------------------------------------
# smaller-edge size arithmetic (torchvision F.resize int-size semantics)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("w,h,size,expected", [
    (1024, 768, 512, (682, 512)),   # landscape shrink: int(512*1024/768)
    (768, 1024, 512, (512, 682)),   # portrait shrink
    (400, 600, 512, (512, 768)),    # UPSCALE: torchvision does, thumbnail
                                    # would not — the reference upscales
    (512, 800, 512, (512, 800)),    # smaller edge already == size: no-op
    (800, 512, 512, (800, 512)),
    (512, 512, 512, (512, 512)),
    (3, 10_000, 512, (512, 1706666)),  # extreme aspect keeps truncation
])
def test_smaller_edge_size(w, h, size, expected):
    assert smaller_edge_size(w, h, size) == expected


def _save(path, w, h, mode="RGB"):
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = np.random.default_rng(0).integers(
        0, 255, (h, w, len(mode)), dtype=np.uint8)
    Image.fromarray(arr, mode).save(path)


def test_resize_image_smaller_edge_and_rgb(tmp_path):
    src_root, dst_root = tmp_path / "src", tmp_path / "dst"
    _save(src_root / "a.png", 100, 60, mode="RGBA")
    assert resize_image("a.png", src_root, dst_root, size=512) is True
    out = Image.open(dst_root / "a.png")
    assert out.size == smaller_edge_size(100, 60, 512) == (853, 512)
    assert out.mode == "RGB"  # reference load_image converts to RGB


def test_resize_image_noop_size_is_preserved_exactly(tmp_path):
    src_root, dst_root = tmp_path / "src", tmp_path / "dst"
    _save(src_root / "a.png", 512, 777)
    assert resize_image("a.png", src_root, dst_root, size=512) is True
    ref = np.asarray(Image.open(src_root / "a.png"))
    out = np.asarray(Image.open(dst_root / "a.png"))
    # no interpolation pass on a no-op resize: bytes identical
    np.testing.assert_array_equal(ref, out)


def test_resize_image_skips_existing_output(tmp_path):
    """Reference :26-27 — rerunning a corpus build only pays for the
    missing outputs."""
    src_root, dst_root = tmp_path / "src", tmp_path / "dst"
    _save(src_root / "a.png", 800, 600)
    assert resize_image("a.png", src_root, dst_root) is True
    stamp = (dst_root / "a.png").stat().st_mtime_ns
    time.sleep(0.01)
    assert resize_image("a.png", src_root, dst_root) is None
    assert (dst_root / "a.png").stat().st_mtime_ns == stamp  # untouched


def test_resize_image_undecodable_warns_and_returns_false(tmp_path):
    src_root, dst_root = tmp_path / "src", tmp_path / "dst"
    src_root.mkdir()
    (src_root / "junk.jpg").write_bytes(b"not an image at all")
    with pytest.warns(UserWarning, match="Could not resize"):
        assert resize_image("junk.jpg", src_root, dst_root) is False
    assert not (dst_root / "junk.jpg").exists()


def test_dataset_resize_end_to_end(tmp_path):
    """Nested file names, one broken file, one pre-existing output —
    the return value counts only the images actually resized."""
    import datasets

    src_root, dst_root = tmp_path / "src", tmp_path / "dst"
    names = ["x/one.png", "x/y/two.png", "three.png", "broken.png"]
    _save(src_root / names[0], 640, 480)
    _save(src_root / names[1], 200, 300)
    _save(src_root / names[2], 512, 512)
    (src_root / names[3]).write_bytes(b"junk")
    # pre-existing output for three.png -> skipped
    _save(dst_root / names[2], 10, 10)

    ds = datasets.Dataset.from_dict({"image": names})
    ds_path = tmp_path / "ds"
    ds.save_to_disk(str(ds_path))

    with pytest.warns(UserWarning, match="Could not resize"):
        n = dataset_resize(ds_path, src_root, dst_root, size=512)
    assert n == 2  # one.png + two.png; three skipped, broken failed
    assert Image.open(dst_root / names[0]).size == (682, 512)
    assert Image.open(dst_root / names[1]).size == (512, 768)  # upscaled
    assert Image.open(dst_root / names[2]).size == (10, 10)  # untouched
