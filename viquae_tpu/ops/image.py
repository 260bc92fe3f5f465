"""Image preprocessing as jittable device ops.

The reference preprocesses on host: PIL thumbnail to width 512
(meerqat/image/resize.py:18-40), torchvision transforms for ImageNet
normalize (image/embedding.py:86-94), CLIP's own transform, and cv2/skimage
similarity-transform warps for face alignment (image/face_recognition.py:
44-52). Here decode stays on host (PIL) but everything after raw RGB is a
fused jitted pipeline: resize (XLA gather/matmul), crop, normalize, affine
warp — all batched, static shapes, ready to fuse into the encoder's first
conv.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# normalization constants (reference: image/embedding.py:86-94 and CLIP)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
FACE_MEAN = (0.5, 0.5, 0.5)   # ArcFace (face_recognition.py:64-69)
FACE_STD = (0.5, 0.5, 0.5)


def resize_bilinear(images: jnp.ndarray, size: Tuple[int, int],
                    antialias: bool = True,
                    method: str = "bilinear") -> jnp.ndarray:
    """(B, H, W, C) -> (B, h, w, C), align_corners=False semantics."""
    b, _, _, c = images.shape
    return jax.image.resize(
        images, (b, size[0], size[1], c), method=method,
        antialias=antialias,
    )


def center_crop(images: jnp.ndarray, size: int) -> jnp.ndarray:
    _, h, w, _ = images.shape
    top = (h - size) // 2
    left = (w - size) // 2
    return images[:, top: top + size, left: left + size, :]


def normalize(images: jnp.ndarray, mean: Sequence[float],
              std: Sequence[float]) -> jnp.ndarray:
    mean = jnp.asarray(mean, images.dtype)
    std = jnp.asarray(std, images.dtype)
    return (images - mean) / std


@functools.partial(jax.jit, static_argnames=("size", "kind"))
def preprocess(images: jnp.ndarray, size: int = 224, kind: str = "clip"
               ) -> jnp.ndarray:
    """uint8/float (B, H, W, 3) in [0, 255] -> normalized float32 (B, s, s, 3).

    kind: "clip" (bicubic shorter-side resize + center crop + CLIP stats),
    "imagenet" (bilinear shorter-side resize + center crop + ImageNet
    stats — the reference's get_transform default is Resize(224)+
    CenterCrop(224), meerqat/image/embedding.py:86-94, NOT the 256-resize
    torchvision-eval recipe), "face" (112 resize + 0.5/0.5 stats).
    """
    x = images.astype(jnp.float32) / 255.0
    if kind in ("imagenet", "clip"):
        # resize the SHORTER side to `size`, center crop — never squash
        # the aspect ratio. CLIP's official transform interpolates
        # BICUBIC; torchvision Resize defaults to bilinear.
        h, w = x.shape[1], x.shape[2]
        scale = size / min(h, w)
        x = resize_bilinear(
            x, (max(size, int(round(h * scale))),
                max(size, int(round(w * scale)))),
            method="cubic" if kind == "clip" else "bilinear",
        )
        x = center_crop(x, size)
        if kind == "imagenet":
            return normalize(x, IMAGENET_MEAN, IMAGENET_STD)
        return normalize(x, CLIP_MEAN, CLIP_STD)
    if kind == "face":
        x = resize_bilinear(x, (size, size))
        return normalize(x, FACE_MEAN, FACE_STD)
    raise ValueError(f"Unknown preprocessing kind {kind!r}")


# --------------------------------------------------------------------------
# affine warp (face alignment)
# --------------------------------------------------------------------------
def affine_warp(image: jnp.ndarray, matrix: jnp.ndarray,
                out_size: Tuple[int, int]) -> jnp.ndarray:
    """Inverse-map affine warp of one (H, W, C) image with a 2x3 matrix
    mapping OUTPUT pixel coords -> INPUT coords (cv2.warpAffine with
    WARP_INVERSE_MAP semantics), bilinear sampling, zero padding."""
    hh, ww = out_size
    ys = jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 1)
    src_x = matrix[0, 0] * xs + matrix[0, 1] * ys + matrix[0, 2]
    src_y = matrix[1, 0] * xs + matrix[1, 1] * ys + matrix[1, 2]
    coords = jnp.stack([src_y.ravel(), src_x.ravel()])  # (2, hh*ww)

    def sample_channel(channel):
        return jax.scipy.ndimage.map_coordinates(
            channel, coords, order=1, mode="constant", cval=0.0
        ).reshape(hh, ww)

    return jnp.stack(
        [sample_channel(image[..., c]) for c in range(image.shape[-1])],
        axis=-1,
    )


def umeyama_similarity(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Least-squares similarity transform (rotation+scale+translation)
    mapping src (N, 2) -> dst (N, 2); returns a 2x3 matrix.

    This is skimage's SimilarityTransform.estimate (Umeyama 1991), used by
    the reference for 5-landmark face alignment
    (image/face_recognition.py:44-52).
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    src_mean = src.mean(axis=0)
    dst_mean = dst.mean(axis=0)
    src_c = src - src_mean
    dst_c = dst - dst_mean
    cov = dst_c.T @ src_c / src.shape[0]
    u, s, vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    diag = jnp.diag(jnp.array([1.0, d]))
    rotation = u @ diag @ vt
    var_src = (src_c ** 2).sum() / src.shape[0]
    scale = (s * jnp.array([1.0, d])).sum() / var_src
    translation = dst_mean - scale * rotation @ src_mean
    return jnp.concatenate([scale * rotation, translation[:, None]], axis=1)


def invert_affine(matrix: jnp.ndarray) -> jnp.ndarray:
    """Invert a 2x3 affine matrix."""
    a = matrix[:, :2]
    t = matrix[:, 2]
    a_inv = jnp.linalg.inv(a)
    return jnp.concatenate([a_inv, (-a_inv @ t)[:, None]], axis=1)


def scale_box(boxes: jnp.ndarray, width, height) -> jnp.ndarray:
    """UNITER-style 7-d box features scaled to [0,1]:
    (x1, y1, x2, y2, w, h, area) — parity image/face_box.py:16-43."""
    x1 = boxes[..., 0] / width
    y1 = boxes[..., 1] / height
    x2 = boxes[..., 2] / width
    y2 = boxes[..., 3] / height
    w = x2 - x1
    h = y2 - y1
    return jnp.stack([x1, y1, x2, y2, w, h, w * h], axis=-1)
