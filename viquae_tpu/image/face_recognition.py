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

from viquae_tpu.data.loading import load_image, load_image_batch
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

        @functools.partial(jax.jit, static_argnames=())
        def align_one(image, landmarks):
            return align_face(image, landmarks, self.cfg.image_size)

        self._align = align_one

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
            arr = jnp.asarray(np.asarray(image, dtype=np.float32))
            lms = np.asarray(landmarks, np.float32)[: self.max_n_faces]
            for lm in lms:
                crops.append(np.asarray(
                    self._align(arr, jnp.asarray(lm))
                ))
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
                 batch_size: int = 16):
        from viquae_tpu.image.face_detection import FaceDetector

        self.detector = FaceDetector(
            mtcnn_params, cfg=mtcnn_cfg, batch_size=batch_size)
        self.embedder = FaceEmbedder(
            arcface_params, cfg=arcface_cfg, max_n_faces=1,
            batch_size=batch_size)
        self.dim = self.embedder.cfg.embedding_size
        size = self.embedder.cfg.image_size
        # batched align: ONE dispatch per serving batch. Per-image _align
        # calls cost ~80 ms EACH over a tunneled link (a 256-query batch
        # spent 21.5 s/batch on them — scripts/exp_pixels_answer.py round-3
        # decomposition); images share the detector's canvas shape so the
        # whole batch vmaps.
        self._align_batch = jax.jit(jax.vmap(
            lambda im, lm: align_face(im, lm, size)))

    def __call__(self, pil_images) -> np.ndarray:
        probs, boxes, landmarks = self.detector.detect_batch(pil_images)
        out = np.full((len(pil_images), self.dim), np.nan, np.float32)
        side = self.detector.cfg.canvas
        canvases, lms, owners = [], [], []
        for i, img in enumerate(pil_images):
            if img is None or landmarks[i] is None:
                continue
            best = int(np.argmax(probs[i]))  # reference: most probable
            rgb = img.convert("RGB")
            w, h = rgb.size
            # same geometry as the detector: scale onto the fixed canvas
            # (landmarks come back in ORIGINAL coords; rescale to match)
            scale = min(1.0, side / max(w, h))
            if scale < 1.0:
                rgb = rgb.resize((int(w * scale), int(h * scale)))
            arr = np.asarray(rgb, dtype=np.float32)
            canvas = np.zeros((side, side, 3), np.float32)
            canvas[: arr.shape[0], : arr.shape[1]] = arr
            canvases.append(canvas)
            lms.append(np.asarray(landmarks[i][best], np.float32) * scale)
            owners.append(i)
        if not canvases:
            return out
        bs = self.embedder.batch_size
        embs = []
        for start in range(0, len(canvases), bs):
            imgs = canvases[start: start + bs]
            marks = lms[start: start + bs]
            pad = bs - len(imgs)
            if pad:
                imgs = imgs + [np.zeros((side, side, 3), np.float32)] * pad
                marks = marks + [np.full((5, 2), 10.0, np.float32)] * pad
            crops = self._align_batch(
                jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(marks)))
            embs.append(np.asarray(
                self.embedder._embed(self.embedder.params, crops)
            )[: bs - pad])
        out[np.asarray(owners)] = np.concatenate(embs)
        return out
