"""Offline thumbnailing of the image corpus (parity meerqat/image/resize.py).

The reference shrinks every image to width 512 with PIL.thumbnail in a
multiprocessing pool (:18-40). Decode/encode is inherently host work; the
transform matches PIL thumbnail semantics (only shrinks, keeps aspect).
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional


def resize_image(file_name, root, save_root, size: int = 512):
    from PIL import Image

    src = Path(root) / file_name
    dst = Path(save_root) / file_name
    try:
        image = Image.open(src)
        image.thumbnail((size, size * 10))  # cap width at `size`
        dst.parent.mkdir(parents=True, exist_ok=True)
        image.save(dst)
        return True
    except Exception as e:  # noqa: BLE001 parity: skip undecodable
        import warnings

        warnings.warn(f"Could not resize {src}: {e}")
        return False


def dataset_resize(dataset_path, root, save_root, size: int = 512,
                   image_key: str = "image", processes: Optional[int] = None):
    """Resize every image referenced by the dataset's `image_key` column."""
    from datasets import load_from_disk

    dataset = load_from_disk(str(dataset_path))
    file_names = dataset[image_key]
    if processes:
        from multiprocessing import Pool

        with Pool(processes) as pool:
            results = pool.starmap(
                resize_image,
                [(f, root, save_root, size) for f in file_names],
            )
    else:
        results = [resize_image(f, root, save_root, size) for f in file_names]
    return sum(results)
