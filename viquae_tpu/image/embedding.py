"""Global image embedding stage (parity meerqat/image/embedding.py).

The reference's `ImageEncoder` wraps torchvision ResNet50 cut at -2 + pool
(:68-75), OpenAI CLIP RN50 `model.visual` (:107-110) or HF CLIP-ViT
`get_image_features`, with DataParallel on multi-GPU and None-tolerant
batching (:125-166). Here the encoder is one jitted function over a fixed
(batch, size, size, 3) tensor; preprocessing (resize+normalize) is fused on
device (viquae_tpu.ops.image.preprocess); None images are masked on host and
their embedding rows are NaN (the reference stores None — NaN marks the same
"no result" contract through Arrow float columns, and ir.search treats
all-NaN query vectors as None).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from viquae_tpu.core import mesh as meshlib
from viquae_tpu.data.loading import load_image_batch
from viquae_tpu.ops import image as image_ops


def _resize_center_crop(img, target: int, resample=None) -> np.ndarray:
    """Aspect-preserving shorter-side resize + center crop to a square
    (the CLIP/torchvision transform; squashing to a square distorts
    embeddings for every non-square corpus image)."""
    if getattr(img, "mode", "RGB") != "RGB":
        # dataset columns / serving queries can hold 'L'/'P'/'RGBA' PIL
        # images directly — without this the canvas assignment below gets
        # a (H, W) or (H, W, 4) array and crashes the whole batch
        img = img.convert("RGB")
    w, h = img.size
    if (w, h) != (target, target):
        scale = target / min(w, h)
        nw, nh = max(target, round(w * scale)), max(target, round(h * scale))
        img = img.resize((nw, nh), resample=resample)
        left = (nw - target) // 2
        top = (nh - target) // 2
        img = img.crop((left, top, left + target, top + target))
    return np.asarray(img)


def decode_image_batch(pil_images, raw_size: int, batch_size: int):
    """Host decode/resize of a serving batch of PIL images (None allowed).

    Returns (canvas uint8 (batch_size, raw, raw, 3), valid bool
    (batch_size,)) — rows past len(pil_images) and None images are zeroed
    with valid=False. The serving pipelines upload the canvas and run
    ops.image.preprocess + the encoder INSIDE the retrieval program."""
    canvas = np.zeros((batch_size, raw_size, raw_size, 3), np.uint8)
    valid = np.zeros((batch_size,), bool)
    for i, img in enumerate(pil_images):
        if img is None:
            continue
        canvas[i] = _resize_center_crop(img, raw_size)
        valid[i] = True
    return canvas, valid


class ImageEmbedder:
    """dataset.map(batched=True) callable writing an embedding column."""

    def __init__(
        self,
        apply_fn: Callable,          # (params, images_nhwc) -> (B, D)
        params,
        save_as: str,
        image_key: str = "image",
        image_size: int = 224,
        preprocessing: str = "clip",  # ops.image.preprocess kind
        batch_size: int = 64,
        mesh_ctx: Optional[meshlib.MeshContext] = None,
        compute_dtype=jnp.float32,
    ):
        self.params = params
        self.save_as = save_as
        self.image_key = image_key
        self.image_size = image_size
        self.preprocessing = preprocessing
        self.batch_size = batch_size
        self.mesh_ctx = mesh_ctx or meshlib.current()
        # host-side decode target == model input: the reference transform
        # is shorter-side Resize(size)+CenterCrop(size) for BOTH imagenet
        # and clip (meerqat/image/embedding.py:86-94) — no 256-resize
        # intermediate
        self.raw_size = image_size

        raw = self.raw_size

        @jax.jit
        def forward(params, raw_images):
            raw_images = jax.lax.with_sharding_constraint(
                raw_images, self.mesh_ctx.batch_sharded
            )
            pixels = image_ops.preprocess(
                raw_images, size=image_size, kind=preprocessing
            ).astype(compute_dtype)
            return apply_fn(params, pixels)

        self._forward = forward

    def embed_images(self, pil_images) -> np.ndarray:
        """List of PIL images (or None) -> (N, D) float32 with NaN rows.

        Host decode/resize runs in a prefetch thread so chunk i+1's CPU work
        overlaps chunk i's device forward (the reference serializes these;
        torch DataLoader workers play this role in image/embedding.py:125+).
        """
        from viquae_tpu.train.prefetch import PrefetchIterable

        from PIL import Image as pil_image

        # torchvision Resize interpolates BILINEAR; CLIP's transform (and
        # PIL's default) is BICUBIC
        resample = (
            pil_image.Resampling.BILINEAR
            if self.preprocessing == "imagenet" else None
        )

        def decoded_chunks():
            for start in range(0, len(pil_images), self.batch_size):
                chunk = pil_images[start: start + self.batch_size]
                present = [
                    (i, _resize_center_crop(img, self.raw_size, resample))
                    for i, img in enumerate(chunk) if img is not None
                ]
                if present:
                    idx, arrays = zip(*present)
                    batch = np.zeros(
                        (self.batch_size, self.raw_size, self.raw_size, 3),
                        np.uint8,
                    )
                    for j, arr in enumerate(arrays):
                        batch[j] = arr
                else:
                    idx, batch = (), None
                yield len(chunk), idx, batch

        out_chunks = []
        for n_chunk, idx, batch in PrefetchIterable(
            decoded_chunks(), buffer_size=2
        ):
            if batch is not None:
                emb = np.asarray(
                    self._forward(self.params, jnp.asarray(batch))
                )[: len(idx)]
                rows = np.full((n_chunk, emb.shape[1]), np.nan, np.float32)
                for j, i in enumerate(idx):
                    rows[i] = emb[j]
            else:
                rows = None  # resolved once dim is known
            out_chunks.append((rows, n_chunk))
        dim = next(
            (c.shape[1] for c, _ in out_chunks if c is not None), None
        )
        if dim is None:
            # every image in this call was None: probe the encoder's output
            # width so the NaN block matches other batches' column width
            # (a (N, 1) guess would make the Arrow column ragged)
            zero = np.zeros(
                (self.batch_size, self.raw_size, self.raw_size, 3), np.uint8
            )
            dim = int(self._forward(self.params, jnp.asarray(zero)).shape[1])
        resolved = [
            c if c is not None else np.full((n, dim), np.nan, np.float32)
            for c, n in out_chunks
        ]
        return np.concatenate(resolved, axis=0)[: len(pil_images)]

    def __call__(self, batch: dict) -> dict:
        images = load_image_batch(batch[self.image_key])
        batch[self.save_as] = self.embed_images(images)
        return batch


def dataset_embed_images(dataset_path, embedder: ImageEmbedder,
                         map_kwargs: Optional[dict] = None):
    from datasets import load_from_disk

    from viquae_tpu.ir.embedding import save_in_place

    dataset = load_from_disk(str(dataset_path))
    dataset = dataset.map(
        embedder, batched=True, batch_size=embedder.batch_size,
        **(map_kwargs or {}),
    )
    save_in_place(dataset, dataset_path)
    return dataset
