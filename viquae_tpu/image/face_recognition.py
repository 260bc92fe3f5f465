"""Face alignment + ArcFace embedding stage
(parity meerqat/image/face_recognition.py).

Per detected face: estimate the similarity transform from the 5 landmarks to
the canonical ArcFace template (insightface constants, :35-41), warp to
112x112, normalize with mean/std 0.5, embed with iresnet50 — all on device
(Umeyama + affine warp + encoder in one jitted function; the reference round-
trips through cv2/skimage on host per face). `max_n_faces` caps faces per
image (default 1; 4 for multimodal ICT). Output column `face_embedding`:
(n_faces, 512) per image or None.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from viquae_tpu.data.loading import load_image
from viquae_tpu.models import arcface
from viquae_tpu.ops import image as image_ops

# canonical 5-point template for 112x112 ArcFace crops (insightface)
SRC = np.array([
    [30.2946, 51.6963],
    [65.5318, 51.5014],
    [48.0252, 71.7366],
    [33.5493, 92.3655],
    [62.7299, 92.2041],
], dtype=np.float32)
SRC[:, 0] += 8.0


@functools.partial(jax.jit, static_argnames=("image_size",))
def align_face(image: jnp.ndarray, landmarks: jnp.ndarray,
               image_size: int = 112) -> jnp.ndarray:
    """(H, W, 3) float [0,255] + (5, 2) landmarks -> (112, 112, 3) crop."""
    forward = image_ops.umeyama_similarity(landmarks, jnp.asarray(SRC))
    inverse = image_ops.invert_affine(forward)  # output px -> input px
    return image_ops.affine_warp(image, inverse, (image_size, image_size))


class FaceEmbedder:
    def __init__(self, params, cfg: Optional[arcface.ArcFaceConfig] = None,
                 max_n_faces: int = 1, image_key: str = "image",
                 batch_size: int = 32, canvas: int = 512):
        self.params = params
        self.cfg = cfg or arcface.ArcFaceConfig()
        self.max_n_faces = max_n_faces
        self.image_key = image_key
        self.batch_size = batch_size
        self.canvas = canvas

        @jax.jit
        def embed_aligned(params, crops):
            # crops (B, 112, 112, 3) in [0, 255]
            x = crops / 255.0
            x = image_ops.normalize(x, image_ops.FACE_MEAN, image_ops.FACE_STD)
            return arcface.apply(params, self.cfg, x)

        self._embed = embed_aligned

        # partial of the module-level jitted align_face: its trace cache is
        # shared across embedder instances (a per-instance jit wrapper
        # would re-trace alignment for the same shapes on every instance)
        self._align = functools.partial(
            align_face, image_size=self.cfg.image_size
        )

    @staticmethod
    def _to_rgb_array(image) -> np.ndarray:
        """PIL image or array of any mode -> (H, W, 3) float32. load_image
        converts str-path inputs to RGB, but a dataset column can hold PIL
        images directly (mode 'L', 'P', 'RGBA', ...) — without this, a
        grayscale image becomes (H, W) and affine_warp treats columns as
        channels, an RGBA one breaks the (3,)-stat normalize broadcast."""
        if hasattr(image, "convert"):
            image = image.convert("RGB")
        arr = np.asarray(image, dtype=np.float32)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        elif arr.shape[-1] == 4:
            arr = arr[..., :3]
        return arr

    def _aligned_crop(self, arr: np.ndarray, lm: np.ndarray) -> np.ndarray:
        """Align ONE face from a full-resolution image, zero-padding the
        image up to a power-of-two shape bucket first. affine_warp samples
        with mode='constant' cval=0, so zero padding is numerically EXACT
        (bilinear taps past the true edge read 0 either way) — while the
        jitted align program compiles per BUCKET instead of per distinct
        (H, W), bounding compile count over a many-resolution corpus
        (first-call compiles are minutes over the tunnel, CLAUDE.md)."""
        h, w = arr.shape[:2]
        hb = 1 << max(7, (h - 1).bit_length())
        wb = 1 << max(7, (w - 1).bit_length())
        if (hb, wb) != (h, w):
            arr = np.pad(arr, ((0, hb - h), (0, wb - w), (0, 0)))
        return np.asarray(self._align(jnp.asarray(arr), jnp.asarray(lm)))

    def __call__(self, batch: dict) -> dict:
        output = [None] * len(batch[self.image_key])
        crops, owners = [], []
        for i, (file_name, landmarks) in enumerate(
            zip(batch[self.image_key], batch["face_landmarks"])
        ):
            if landmarks is None:
                continue
            image = (
                load_image(file_name)
                if isinstance(file_name, str) else file_name
            )
            if image is None:
                continue
            arr = self._to_rgb_array(image)
            lms = np.asarray(landmarks, np.float32)[: self.max_n_faces]
            for lm in lms:
                crops.append(self._aligned_crop(arr, lm))
                owners.append(i)
        if not crops:
            batch["face_embedding"] = output
            return batch
        embeddings = []
        arr = np.stack(crops)
        for start in range(0, len(arr), self.batch_size):
            chunk = arr[start: start + self.batch_size]
            pad = self.batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)]
                )
            out = np.asarray(self._embed(self.params, jnp.asarray(chunk)))
            embeddings.append(out[: self.batch_size - pad])
        embeddings = np.concatenate(embeddings)
        for i in set(owners):
            rows = [embeddings[j] for j, o in enumerate(owners) if o == i]
            output[i] = np.stack(rows).tolist()
        batch["face_embedding"] = output
        return batch


def dataset_compute_face_embedding(dataset_path, embedder: FaceEmbedder,
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


class FaceQueryEncoder:
    """ONLINE face leg for serving: raw query image -> MTCNN detect ->
    most-probable face -> align -> ArcFace 512-d feature.

    Completes the one-device-program story the reference never finished:
    its online path precomputes face features offline
    (meerqat/interact/system.py:24-42 embeds only text+image online).
    Output rows are NaN for queries without an image or a detected face —
    the serving pipelines' 'absent from this run' contract
    (ir/serving.MultiIndexRetrievalPipeline NaN masking)."""

    def __init__(self, mtcnn_params, arcface_params,
                 mtcnn_cfg=None, arcface_cfg: Optional[
                     arcface.ArcFaceConfig] = None,
                 batch_size: int = 64):
        from viquae_tpu.models import mtcnn as mtcnn_lib

        self.mtcnn_params = mtcnn_params
        self.mtcnn_cfg = mtcnn_cfg or mtcnn_lib.MTCNNConfig()
        self.embedder = FaceEmbedder(
            arcface_params, cfg=arcface_cfg, max_n_faces=1,
            batch_size=batch_size)
        self.batch_size = batch_size
        self.dim = self.embedder.cfg.embedding_size
        m_cfg = self.mtcnn_cfg
        a_cfg = self.embedder.cfg
        size = a_cfg.image_size

        # The whole face leg is ONE device program per sub-batch over ONE
        # uint8 canvas upload: detect -> pick the most-probable valid face
        # -> align (canvas coords) -> ArcFace. Round-3 decompositions
        # (scripts/exp_pixels_answer.py): per-face align dispatches cost
        # ~80 ms EACH over the tunneled link, and float32 canvases put
        # ~400 MB/batch on a ~13 MB/s wire — uint8 + one dispatch is 4x
        # fewer bytes and ~100x fewer round trips.
        @jax.jit
        def face_program(m_params, a_params, canvases_u8, hws):
            imgs = canvases_u8.astype(jnp.float32)
            det = mtcnn_lib.detect_faces_batch(m_params, imgs, hws, m_cfg)
            probs = jnp.where(det["valid"], det["probs"], -jnp.inf)
            best = jnp.argmax(probs, axis=1)
            has = jnp.take_along_axis(det["valid"], best[:, None], 1)[:, 0]
            lms = jnp.take_along_axis(
                det["landmarks"], best[:, None, None, None], 1)[:, 0]
            crops = jax.vmap(
                lambda im, lm: align_face(im, lm, size))(imgs, lms)
            x = image_ops.normalize(
                crops / 255.0, image_ops.FACE_MEAN, image_ops.FACE_STD)
            return arcface.apply(a_params, a_cfg, x), has, lms

        self._face_program = face_program

    def __call__(self, pil_images) -> np.ndarray:
        side = self.mtcnn_cfg.canvas
        out = np.full((len(pil_images), self.dim), np.nan, np.float32)
        canvases, hws, owners, scales, originals = [], [], [], [], []
        for i, img in enumerate(pil_images):
            if img is None:
                continue
            rgb = img.convert("RGB")
            w, h = rgb.size
            if min(w, h) < self.mtcnn_cfg.min_face_size:
                continue  # parity: too-small images keep None
            scale = min(1.0, side / max(w, h))
            original = rgb
            if scale < 1.0:
                rgb = rgb.resize((max(1, int(w * scale)),
                                  max(1, int(h * scale))))
            arr = np.asarray(rgb, dtype=np.uint8)
            canvas = np.zeros((side, side, 3), np.uint8)
            canvas[: arr.shape[0], : arr.shape[1]] = arr
            canvases.append(canvas)
            hws.append((arr.shape[0], arr.shape[1]))
            owners.append(i)
            scales.append(scale)
            originals.append(original if scale < 1.0 else None)
        if not canvases:
            return out
        bs = self.batch_size
        embs, present, lms_all = [], [], []
        for start in range(0, len(canvases), bs):
            imgs = canvases[start: start + bs]
            hw = hws[start: start + bs]
            n_real = len(imgs)
            pad = bs - n_real
            if pad:
                imgs = imgs + [np.zeros((side, side, 3), np.uint8)] * pad
                hw = hw + [(side, side)] * pad
            emb, has, lms = self._face_program(
                self.mtcnn_params, self.embedder.params,
                jnp.asarray(np.stack(imgs)),
                jnp.asarray(np.asarray(hw, np.float32)))
            embs.append(np.asarray(emb)[:n_real])
            present.append(np.asarray(has)[:n_real])
            lms_all.append(np.asarray(lms)[:n_real])
        embs = np.concatenate(embs)
        present = np.concatenate(present)
        lms_all = np.concatenate(lms_all)
        # Images LARGER than the canvas were detected downscaled; align +
        # embed those at FULL resolution like the dataset stages do
        # (FaceDetector rescales landmarks to original coords,
        # FaceEmbedder warps the original image) — the fused canvas crop
        # would sample the face at reduced resolution and change the
        # embedding. Typically few per batch (corpus thumbnails fit the
        # canvas), so the per-image aligns are the rare path.
        redo = [j for j in range(len(owners))
                if present[j] and scales[j] < 1.0]
        if redo:
            crops = []
            for j in redo:
                arr = FaceEmbedder._to_rgb_array(originals[j])
                lm = np.asarray(lms_all[j] / scales[j])
                crops.append(self.embedder._aligned_crop(arr, lm))
            arr = np.stack(crops)
            fixed = []
            for start in range(0, len(arr), bs):
                chunk = arr[start: start + bs]
                pad = bs - len(chunk)
                if pad:
                    chunk = np.concatenate(
                        [chunk,
                         np.zeros((pad,) + chunk.shape[1:], np.float32)])
                fixed.append(np.asarray(self.embedder._embed(
                    self.embedder.params, jnp.asarray(chunk))
                )[: bs - pad])
            embs[np.asarray(redo)] = np.concatenate(fixed)
        owners = np.asarray(owners)
        out[owners[present]] = embs[present]
        return out
