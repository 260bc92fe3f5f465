"""MTCNN face detection cascade, static-shape TPU redesign.

The reference delegates detection to facenet_pytorch's MTCNN (CUDA, fully
dynamic shapes: per-image pyramids, thresholded proposal lists, variable-M
NMS — meerqat/image/face_detection.py:19,26-84). XLA needs static shapes, so
this implementation re-architects the cascade (SURVEY.md §7 "hard parts"):

- images are padded onto a fixed canvas (default 512, the corpus thumbnail
  width) so ONE compiled pyramid serves every image; real extent is masked.
- each pyramid scale yields a fixed top-K proposal set (score-masked) instead
  of a dynamic `prob > t` list.
- NMS is fixed-size greedy: K iterations of argmax + IoU suppression over an
  O(K^2) matrix under `lax.fori_loop`, validity carried as a mask.
- stage crops use vmapped bilinear sampling (fixed 24x24 / 48x48 outputs).

Network weights follow facenet_pytorch's PNet/RNet/ONet layout
(:func:`params_from_facenet`). Algorithmic constants (pyramid factor 0.709,
cell size 12, stride 2, thresholds (0.6, 0.7, 0.7), box calibration and
square-rectification) follow the published MTCNN algorithm [Zhang et al.
2016], so ported weights reproduce facenet_pytorch detections up to
interpolation details and the static top-K caps.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.float32(-1e30)


@dataclasses.dataclass(frozen=True)
class MTCNNConfig:
    canvas: int = 512
    min_face_size: int = 20
    thresholds: Tuple[float, float, float] = (0.6, 0.7, 0.7)
    factor: float = 0.709
    k_per_scale: int = 64      # proposals kept per pyramid scale
    k_stage1: int = 128        # proposals after stage-1 NMS
    k_stage2: int = 64         # candidates after RNet
    max_faces: int = 16        # final detections
    bn_eps: float = 1e-5  # (no BN in MTCNN; kept for interface uniformity)

    @property
    def scales(self) -> Tuple[float, ...]:
        m = 12.0 / self.min_face_size
        scales = []
        s = m
        while self.canvas * s >= 12.0:
            scales.append(s)
            s *= self.factor
        return tuple(scales)


# --------------------------------------------------------------------------
# networks (facenet_pytorch layer layout)
# --------------------------------------------------------------------------
def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    k1, k2 = jax.random.split(key)
    return {
        "kernel": np.sqrt(2.0 / fan_in) * jax.random.normal(k1, (kh, kw, cin, cout)),
        "bias": jnp.zeros((cout,)),
    }


def _conv(p, x, stride=1):
    # precision=HIGHEST: TPU otherwise runs f32 convs one-pass bf16 and
    # borderline threshold decisions (probs ~0.699-0.701) flip vs the CPU
    # torch oracle (same rule as crop_resize's einsums below)
    out = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out + p["bias"]


def _prelu(p, x):
    return jnp.where(x >= 0, x, p["alpha"] * x)


def _maxpool(x, window, stride):
    """ceil_mode=True maxpool (facenet_pytorch uses ceil_mode)."""
    h, w = x.shape[1], x.shape[2]
    pad_h = (-(h - window) % stride) if h > window else 0
    pad_w = (-(w - window) % stride) if w > window else 0
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (0, pad_h), (0, pad_w), (0, 0)],
    )


def pnet_init(key):
    ks = jax.random.split(key, 5)
    return {
        "conv1": _conv_init(ks[0], 3, 3, 3, 10),
        "prelu1": {"alpha": 0.25 * jnp.ones(10)},
        "conv2": _conv_init(ks[1], 3, 3, 10, 16),
        "prelu2": {"alpha": 0.25 * jnp.ones(16)},
        "conv3": _conv_init(ks[2], 3, 3, 16, 32),
        "prelu3": {"alpha": 0.25 * jnp.ones(32)},
        "conv4_1": _conv_init(ks[3], 1, 1, 32, 2),
        "conv4_2": _conv_init(ks[4], 1, 1, 32, 4),
    }


def pnet_apply(p, x):
    """(B, H, W, 3) -> probs (B, h, w), reg (B, h, w, 4)."""
    x = _prelu(p["prelu1"], _conv(p["conv1"], x))
    x = _maxpool(x, 2, 2)
    x = _prelu(p["prelu2"], _conv(p["conv2"], x))
    x = _prelu(p["prelu3"], _conv(p["conv3"], x))
    probs = jax.nn.softmax(_conv(p["conv4_1"], x), axis=-1)[..., 1]
    reg = _conv(p["conv4_2"], x)
    return probs, reg


def rnet_init(key):
    ks = jax.random.split(key, 6)
    return {
        "conv1": _conv_init(ks[0], 3, 3, 3, 28),
        "prelu1": {"alpha": 0.25 * jnp.ones(28)},
        "conv2": _conv_init(ks[1], 3, 3, 28, 48),
        "prelu2": {"alpha": 0.25 * jnp.ones(48)},
        "conv3": _conv_init(ks[2], 2, 2, 48, 64),
        "prelu3": {"alpha": 0.25 * jnp.ones(64)},
        "dense4": {"kernel": 0.02 * jax.random.normal(ks[3], (576, 128)),
                   "bias": jnp.zeros(128)},
        "prelu4": {"alpha": 0.25 * jnp.ones(128)},
        "dense5_1": {"kernel": 0.02 * jax.random.normal(ks[4], (128, 2)),
                     "bias": jnp.zeros(2)},
        "dense5_2": {"kernel": 0.02 * jax.random.normal(ks[5], (128, 4)),
                     "bias": jnp.zeros(4)},
    }


def _flatten_torch(x):
    """NHWC -> torch NCHW flatten order, transposed HW (facenet permutes
    to (B, C, W, H) before flattening dense inputs)."""
    return jnp.transpose(x, (0, 3, 2, 1)).reshape(x.shape[0], -1)


def rnet_apply(p, x):
    x = _prelu(p["prelu1"], _conv(p["conv1"], x))
    x = _maxpool(x, 3, 2)
    x = _prelu(p["prelu2"], _conv(p["conv2"], x))
    x = _maxpool(x, 3, 2)
    x = _prelu(p["prelu3"], _conv(p["conv3"], x))
    x = _flatten_torch(x)
    x = _prelu(p["prelu4"], x @ p["dense4"]["kernel"] + p["dense4"]["bias"])
    probs = jax.nn.softmax(
        x @ p["dense5_1"]["kernel"] + p["dense5_1"]["bias"], axis=-1
    )[:, 1]
    reg = x @ p["dense5_2"]["kernel"] + p["dense5_2"]["bias"]
    return probs, reg


def onet_init(key):
    ks = jax.random.split(key, 8)
    return {
        "conv1": _conv_init(ks[0], 3, 3, 3, 32),
        "prelu1": {"alpha": 0.25 * jnp.ones(32)},
        "conv2": _conv_init(ks[1], 3, 3, 32, 64),
        "prelu2": {"alpha": 0.25 * jnp.ones(64)},
        "conv3": _conv_init(ks[2], 3, 3, 64, 64),
        "prelu3": {"alpha": 0.25 * jnp.ones(64)},
        "conv4": _conv_init(ks[3], 2, 2, 64, 128),
        "prelu4": {"alpha": 0.25 * jnp.ones(128)},
        "dense5": {"kernel": 0.02 * jax.random.normal(ks[4], (1152, 256)),
                   "bias": jnp.zeros(256)},
        "prelu5": {"alpha": 0.25 * jnp.ones(256)},
        "dense6_1": {"kernel": 0.02 * jax.random.normal(ks[5], (256, 2)),
                     "bias": jnp.zeros(2)},
        "dense6_2": {"kernel": 0.02 * jax.random.normal(ks[6], (256, 4)),
                     "bias": jnp.zeros(4)},
        "dense6_3": {"kernel": 0.02 * jax.random.normal(ks[7], (256, 10)),
                     "bias": jnp.zeros(10)},
    }


def onet_apply(p, x):
    x = _prelu(p["prelu1"], _conv(p["conv1"], x))
    x = _maxpool(x, 3, 2)
    x = _prelu(p["prelu2"], _conv(p["conv2"], x))
    x = _maxpool(x, 3, 2)
    x = _prelu(p["prelu3"], _conv(p["conv3"], x))
    x = _maxpool(x, 2, 2)
    x = _prelu(p["prelu4"], _conv(p["conv4"], x))
    x = _flatten_torch(x)
    x = _prelu(p["prelu5"], x @ p["dense5"]["kernel"] + p["dense5"]["bias"])
    probs = jax.nn.softmax(
        x @ p["dense6_1"]["kernel"] + p["dense6_1"]["bias"], axis=-1
    )[:, 1]
    reg = x @ p["dense6_2"]["kernel"] + p["dense6_2"]["bias"]
    landmarks = x @ p["dense6_3"]["kernel"] + p["dense6_3"]["bias"]
    return probs, reg, landmarks


def init(key) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    return {"pnet": pnet_init(k1), "rnet": rnet_init(k2), "onet": onet_init(k3)}


# --------------------------------------------------------------------------
# fixed-shape geometry helpers
# --------------------------------------------------------------------------
def iou_matrix(boxes: jnp.ndarray, mode: str = "union") -> jnp.ndarray:
    """(K, 4) xyxy -> (K, K) IoU ('union') or min-overlap ('min')."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    if mode == "min":
        denom = jnp.minimum(area[:, None], area[None, :])
    else:
        denom = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(denom, 1e-9)


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
              iou_threshold: float, mode: str = "union",
              max_keep: Optional[int] = None) -> jnp.ndarray:
    """Greedy NMS with static shapes: returns a keep mask (K,).

    Early-exits when no live candidate remains — each iteration keeps
    exactly one box, so on real images (few faces survive the score
    threshold) the loop runs ~#keeps times instead of a fixed K (the
    sequential K-iteration loops were most of the cascade's stage-1 time).
    `max_keep` bounds the keeps EXACTLY when the caller only consumes the
    top-N survivors afterward: greedy NMS keeps boxes in descending score
    order, so the first N keeps ARE the top-N survivors."""
    k = boxes.shape[0]
    cap = k if max_keep is None else min(int(max_keep), k)
    ious = iou_matrix(boxes, mode)
    masked_scores = jnp.where(valid, scores, NEG_INF)

    def cond(state):
        _, _, s, n = state
        return (n < cap) & jnp.any(s > NEG_INF)

    def body(state):
        keep, alive, s, n = state
        best = jnp.argmax(s)
        keep = keep.at[best].set(True)
        suppress = ious[best] > iou_threshold
        alive = alive & ~suppress
        alive = alive.at[best].set(False)
        s = jnp.where(alive, jnp.where(valid, scores, NEG_INF), NEG_INF)
        return keep, alive, s, n + 1

    keep, _, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.zeros(k, bool), valid, masked_scores, jnp.int32(0)),
    )
    return keep & valid


def rerec(boxes: jnp.ndarray) -> jnp.ndarray:
    """Make boxes square around their center (MTCNN 'rerec')."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = jnp.maximum(w, h)
    cx = boxes[:, 0] + w * 0.5
    cy = boxes[:, 1] + h * 0.5
    return jnp.stack([
        cx - side * 0.5, cy - side * 0.5, cx + side * 0.5, cy + side * 0.5,
    ], axis=1)


def calibrate(boxes: jnp.ndarray, reg: jnp.ndarray) -> jnp.ndarray:
    """Apply bbox regression offsets (MTCNN 'bbreg')."""
    w = (boxes[:, 2] - boxes[:, 0])[:, None]
    h = (boxes[:, 3] - boxes[:, 1])[:, None]
    scale = jnp.concatenate([w, h, w, h], axis=1)
    return boxes + reg * scale


def crop_resize(image: jnp.ndarray, boxes: jnp.ndarray, out: int
                ) -> jnp.ndarray:
    """Bilinear crop of (K, 4) xyxy boxes from (H, W, 3) -> (K, out, out, 3).

    Implemented as two batched matmuls with per-box interpolation-weight
    matrices (out[k] = Wy[k] @ image @ Wx[k]^T per channel) instead of
    map_coordinates gathers: sample-point gathers are the slowest op class
    on TPU and dominated the whole cascade (223/440 ms for the RNet/ONet
    stages at batch 16 — scripts/exp_mtcnn_profile.py), while the dense
    einsum rides the MXU. The weight matrix w[i, p] = max(0, 1 - |c_i - p|)
    reproduces order-1 map_coordinates with mode='constant' cval=0 exactly
    (out-of-range centers lose weight mass toward 0, including the partial
    boundary cells)."""
    h, w = image.shape[:2]

    def weight_mat(lo, hi, n_px):
        # sample centers along one axis for every box: (K, out)
        c = (lo[:, None]
             + (jnp.arange(out)[None, :] + 0.5) * ((hi - lo) / out)[:, None]
             - 0.5)
        px = jnp.arange(n_px, dtype=jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(c[..., None] - px))  # (K,out,P)

    wy = weight_mat(boxes[:, 1], boxes[:, 3], h)
    wx = weight_mat(boxes[:, 0], boxes[:, 2], w)
    # precision=HIGHEST: TPU f32 matmuls otherwise truncate inputs to one
    # bf16 pass (CLAUDE.md) — 0-255 pixels would drift ~0.5/px and flip
    # borderline RNet/ONet threshold decisions vs the CPU test platform
    tmp = jnp.einsum("kih,hwc->kiwc", wy, image,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("kiwc,kjw->kijc", tmp, wx,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def _normalize(x):
    return (x - 127.5) * 0.0078125


def _bilinear_resize(image: jnp.ndarray, size: int) -> jnp.ndarray:
    """(H, W, 3) -> (size, size, 3) half-pixel bilinear via gathers.

    Matches facenet_pytorch's non-antialiased F.interpolate semantics and,
    unlike jax.image.resize, lowers WITHOUT per-shape constant weight
    matrices — the full pyramid's HLO stays ~O(scales) small (the inline
    resize constants made the cascade program exceed remote-compiler
    payload caps on tunneled deployments)."""
    h, w = image.shape[:2]
    ys = (jnp.arange(size) + 0.5) * (h / size) - 0.5
    xs = (jnp.arange(size) + 0.5) * (w / size) - 0.5
    grid_y = jnp.broadcast_to(ys[:, None], (size, size))
    grid_x = jnp.broadcast_to(xs[None, :], (size, size))
    coords = jnp.stack([grid_y.ravel(), grid_x.ravel()])

    def chan(c):
        return jax.scipy.ndimage.map_coordinates(
            image[..., c], coords, order=1, mode="nearest"
        ).reshape(size, size)

    return jnp.stack([chan(c) for c in range(3)], axis=-1)


# --------------------------------------------------------------------------
# the cascade
# --------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_faces(
    params,
    image: jnp.ndarray,        # (canvas, canvas, 3) float32 in [0, 255]
    true_hw: jnp.ndarray,      # (2,) real height/width before padding
    cfg: MTCNNConfig = MTCNNConfig(),
) -> Dict[str, jnp.ndarray]:
    """Single-image detection; batch via jax.vmap over (image, true_hw).

    Returns fixed-size arrays: boxes (max_faces, 4) xyxy in ORIGINAL pixel
    coords, probs (max_faces,), landmarks (max_faces, 5, 2), valid mask.
    """
    # ---- stage 1: PNet over a fixed pyramid --------------------------
    all_boxes, all_scores, all_reg, all_valid = [], [], [], []
    for scale in cfg.scales:
        size = max(12, int(round(cfg.canvas * scale)))
        scaled = _bilinear_resize(image, size)
        probs, reg = pnet_apply(params["pnet"], _normalize(scaled)[None])
        probs, reg = probs[0], reg[0]
        h, w = probs.shape
        flat = probs.reshape(-1)
        k = min(cfg.k_per_scale, flat.shape[0])
        top_p, top_i = jax.lax.top_k(flat, k)
        row = (top_i // w).astype(jnp.float32)
        col = (top_i % w).astype(jnp.float32)
        # cell -> original coords (stride 2, cell 12)
        q1x = (col * 2 + 1) / scale
        q1y = (row * 2 + 1) / scale
        q2x = (col * 2 + 12) / scale
        q2y = (row * 2 + 12) / scale
        boxes = jnp.stack([q1x, q1y, q2x, q2y], axis=1)
        regs = reg.reshape(-1, 4)[top_i]
        valid = top_p >= cfg.thresholds[0]
        # inside the real (unpadded) extent
        valid &= (q1x < true_hw[1]) & (q1y < true_hw[0])
        if k < cfg.k_per_scale:
            pad = cfg.k_per_scale - k
            boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4))])
            regs = jnp.concatenate([regs, jnp.zeros((pad, 4))])
            top_p = jnp.concatenate([top_p, jnp.zeros(pad)])
            valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
        # per-scale NMS 0.5
        keep = nms_fixed(boxes, top_p, valid, 0.5)
        all_boxes.append(boxes)
        all_scores.append(top_p)
        all_reg.append(regs)
        all_valid.append(keep)

    boxes = jnp.concatenate(all_boxes)
    scores = jnp.concatenate(all_scores)
    regs = jnp.concatenate(all_reg)
    valid = jnp.concatenate(all_valid)
    # cross-scale NMS 0.7, keep top k_stage1
    keep = nms_fixed(boxes, scores, valid, 0.7, max_keep=cfg.k_stage1)
    sel_scores, sel = jax.lax.top_k(jnp.where(keep, scores, NEG_INF), cfg.k_stage1)
    boxes, regs = boxes[sel], regs[sel]
    valid = sel_scores > NEG_INF
    boxes = rerec(calibrate(boxes, regs))

    # ---- stage 2: RNet ----------------------------------------------
    crops = crop_resize(image, boxes, 24)
    probs, reg = rnet_apply(params["rnet"], _normalize(crops))
    valid &= probs >= cfg.thresholds[1]
    keep = nms_fixed(boxes, probs, valid, 0.7, max_keep=cfg.k_stage2)
    sel_scores, sel = jax.lax.top_k(jnp.where(keep, probs, NEG_INF), cfg.k_stage2)
    boxes, reg = boxes[sel], reg[sel]
    valid = sel_scores > NEG_INF
    boxes = rerec(calibrate(boxes, reg))

    # ---- stage 3: ONet ----------------------------------------------
    crops = crop_resize(image, boxes, 48)
    probs3, reg3, lm = onet_apply(params["onet"], _normalize(crops))
    valid &= probs3 >= cfg.thresholds[2]
    w = (boxes[:, 2] - boxes[:, 0])[:, None]
    h = (boxes[:, 3] - boxes[:, 1])[:, None]
    # landmarks: first 5 x-coords then 5 y-coords, relative to the box
    lm_x = boxes[:, 0:1] + lm[:, 0:5] * w
    lm_y = boxes[:, 1:2] + lm[:, 5:10] * h
    landmarks = jnp.stack([lm_x, lm_y], axis=-1)  # (K, 5, 2)
    boxes = calibrate(boxes, reg3)
    keep = nms_fixed(boxes, probs3, valid, 0.7, mode="min",
                     max_keep=cfg.max_faces)
    sel_scores, sel = jax.lax.top_k(
        jnp.where(keep, probs3, NEG_INF), cfg.max_faces
    )
    return {
        "boxes": boxes[sel],
        "probs": jnp.where(sel_scores > NEG_INF, sel_scores, 0.0),
        "landmarks": landmarks[sel],
        "valid": sel_scores > NEG_INF,
    }


def detect_faces_batch(params, images: jnp.ndarray, true_hws: jnp.ndarray,
                       cfg: MTCNNConfig = MTCNNConfig()):
    return jax.vmap(lambda im, hw: detect_faces(params, im, hw, cfg))(
        images, true_hws
    )


# --------------------------------------------------------------------------
# weight port (facenet_pytorch MTCNN state_dict)
# --------------------------------------------------------------------------
def params_from_facenet(state_dict) -> Dict[str, Any]:
    def get(name):
        t = state_dict[name]
        return jnp.asarray(
            np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        )

    def conv_p(name):
        return {
            "kernel": jnp.transpose(get(f"{name}.weight"), (2, 3, 1, 0)),
            "bias": get(f"{name}.bias"),
        }

    def dense_p(name):
        return {"kernel": get(f"{name}.weight").T, "bias": get(f"{name}.bias")}

    def prelu_p(name):
        return {"alpha": get(f"{name}.weight")}

    return {
        "pnet": {
            "conv1": conv_p("pnet.conv1"), "prelu1": prelu_p("pnet.prelu1"),
            "conv2": conv_p("pnet.conv2"), "prelu2": prelu_p("pnet.prelu2"),
            "conv3": conv_p("pnet.conv3"), "prelu3": prelu_p("pnet.prelu3"),
            "conv4_1": conv_p("pnet.conv4_1"),
            "conv4_2": conv_p("pnet.conv4_2"),
        },
        "rnet": {
            "conv1": conv_p("rnet.conv1"), "prelu1": prelu_p("rnet.prelu1"),
            "conv2": conv_p("rnet.conv2"), "prelu2": prelu_p("rnet.prelu2"),
            "conv3": conv_p("rnet.conv3"), "prelu3": prelu_p("rnet.prelu3"),
            "dense4": dense_p("rnet.dense4"),
            "prelu4": prelu_p("rnet.prelu4"),
            "dense5_1": dense_p("rnet.dense5_1"),
            "dense5_2": dense_p("rnet.dense5_2"),
        },
        "onet": {
            "conv1": conv_p("onet.conv1"), "prelu1": prelu_p("onet.prelu1"),
            "conv2": conv_p("onet.conv2"), "prelu2": prelu_p("onet.prelu2"),
            "conv3": conv_p("onet.conv3"), "prelu3": prelu_p("onet.prelu3"),
            "conv4": conv_p("onet.conv4"), "prelu4": prelu_p("onet.prelu4"),
            "dense5": dense_p("onet.dense5"),
            "prelu5": prelu_p("onet.prelu5"),
            "dense6_1": dense_p("onet.dense6_1"),
            "dense6_2": dense_p("onet.dense6_2"),
            "dense6_3": dense_p("onet.dense6_3"),
        },
    }
