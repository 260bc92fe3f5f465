"""Image ops + ResNet + CLIP numerical parity tests (torch-cpu oracles)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viquae_tpu.models import clip as clip_lib
from viquae_tpu.models import resnet as resnet_lib
from viquae_tpu.ops import image as image_ops


# --------------------------------------------------------------------------
# image ops
# --------------------------------------------------------------------------
def test_preprocess_shapes_and_stats():
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (2, 64, 48, 3)), jnp.uint8
    )
    out = image_ops.preprocess(imgs, size=32, kind="clip")
    assert out.shape == (2, 32, 32, 3)
    out = image_ops.preprocess(imgs, size=32, kind="imagenet")
    assert out.shape == (2, 32, 32, 3)
    out = image_ops.preprocess(imgs, size=16, kind="face")
    assert out.shape == (2, 16, 16, 3)
    # face normalization maps [0,1] -> [-1,1]
    assert float(out.min()) >= -1.001 and float(out.max()) <= 1.001


def test_umeyama_recovers_known_similarity():
    # exact similarity transform (scale+rotation+translation) must be
    # recovered from noiseless correspondences
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 100, (5, 2)).astype(np.float32)
    scale, theta = 1.3, 0.4
    rot = scale * np.array([
        [np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]
    ])
    trans = np.array([10.0, -5.0])
    truth = np.concatenate([rot, trans[:, None]], axis=1).astype(np.float32)
    dst = src @ rot.T + trans
    ours = np.asarray(image_ops.umeyama_similarity(
        jnp.asarray(src), jnp.asarray(dst.astype(np.float32))))
    np.testing.assert_allclose(ours, truth, atol=1e-3)
    # and agrees with cv2's least-squares similarity estimator
    import cv2

    ref, _ = cv2.estimateAffinePartial2D(
        src.reshape(-1, 1, 2), dst.astype(np.float32).reshape(-1, 1, 2),
        method=cv2.LMEDS,
    )
    np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_affine_warp_matches_cv2():
    import cv2

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (40, 50, 3)).astype(np.float32)
    matrix = np.array([[0.9, 0.1, 3.0], [-0.1, 0.9, 2.0]], np.float32)
    ref = cv2.warpAffine(
        img, matrix, (30, 25),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP, borderValue=0.0,
    )
    ours = np.asarray(image_ops.affine_warp(
        jnp.asarray(img), jnp.asarray(matrix), (25, 30)))
    # interiors match; borders differ by sampling convention
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=2e-2)


def test_scale_box():
    boxes = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])
    out = np.asarray(image_ops.scale_box(boxes, 100, 200))
    np.testing.assert_allclose(
        out[0], [0.1, 0.1, 0.3, 0.3, 0.2, 0.2, 0.04], atol=1e-6
    )


# --------------------------------------------------------------------------
# ResNet-50 vs a faithful torchvision-style torch oracle
# --------------------------------------------------------------------------
def _torch_resnet(cfg):
    """Compact torchvision-equivalent bottleneck ResNet (the oracle)."""
    import torch
    import torch.nn as nn

    class Bottleneck(nn.Module):
        def __init__(self, cin, planes, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.downsample = None
            if stride != 1 or cin != planes * 4:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                    nn.BatchNorm2d(planes * 4),
                )
            self.relu = nn.ReLU()

        def forward(self, x):
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            identity = x if self.downsample is None else self.downsample(x)
            return self.relu(out + identity)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            w = cfg.width
            self.conv1 = nn.Conv2d(3, w, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(w)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            cin = w
            for stage, n in enumerate(cfg.stage_sizes):
                planes = w * 2 ** stage
                blocks = []
                for b in range(n):
                    stride = 2 if (stage > 0 and b == 0) else 1
                    blocks.append(Bottleneck(cin, planes, stride))
                    cin = planes * 4
                setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for stage in range(len(cfg.stage_sizes)):
                x = getattr(self, f"layer{stage + 1}")(x)
            return x.mean(dim=(2, 3))

    return Net()


def test_resnet_matches_torch_oracle():
    import torch

    cfg = resnet_lib.ResNetConfig(stage_sizes=(2, 2), width=8)
    torch.manual_seed(0)
    oracle = _torch_resnet(cfg).eval()
    # randomize BN stats so the test catches mean/var mix-ups
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)
    params = resnet_lib.params_from_torchvision(oracle.state_dict(), cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(resnet_lib.apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


# --------------------------------------------------------------------------
# CLIP ViT + text vs HF CLIPModel
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def hf_clip():
    import torch
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    torch.manual_seed(0)
    cfg = CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(
            vocab_size=99, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=32, eos_token_id=98,
            bos_token_id=0, pad_token_id=1,
        ),
        CLIPVisionConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=32, patch_size=8,
        ),
        projection_dim=16,
    )
    model = CLIPModel(cfg).eval()
    return cfg, model


def test_clip_vit_matches_hf(hf_clip):
    import torch

    hf_cfg, model = hf_clip
    params = clip_lib.params_from_hf(model.state_dict())
    vcfg = clip_lib.CLIPVisionConfig(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        image_size=32, patch_size=8, projection_dim=16,
    )
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    out = clip_lib.vit_apply(params["vision"], vcfg, jnp.asarray(pixels))
    np.testing.assert_allclose(
        np.asarray(out["image_embeds"]), ref, atol=3e-5, rtol=1e-3
    )


def test_clip_text_matches_hf(hf_clip):
    import torch

    hf_cfg, model = hf_clip
    params = clip_lib.params_from_hf(model.state_dict())
    tcfg = clip_lib.CLIPTextConfig(
        vocab_size=99, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_positions=32, projection_dim=16,
        eos_token_id=98,
    )
    ids = np.array([
        [0, 5, 7, 98, 1, 1],
        [0, 9, 11, 13, 17, 98],
    ])
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]])
    with torch.no_grad():
        ref = model.get_text_features(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).numpy()
    out = clip_lib.text_apply(
        params["text"], tcfg, jnp.asarray(ids), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(out["text_embeds"]), ref, atol=3e-5, rtol=1e-3
    )


def test_modified_resnet_shapes():
    cfg = clip_lib.ModifiedResNetConfig(
        stage_sizes=(1, 1, 1, 1), width=8, output_dim=16, heads=4,
        image_size=32,
    )
    # build params by porting from a synthetic state_dict-shaped dict
    import torch

    sd = {}
    w = cfg.width
    chans = [(3, w // 2), (w // 2, w // 2), (w // 2, w)]
    for i, (cin, cout) in enumerate(chans, start=1):
        sd[f"visual.conv{i}.weight"] = torch.randn(cout, cin, 3, 3) * 0.05
        for stat, val in [("weight", 1.0), ("bias", 0.0)]:
            sd[f"visual.bn{i}.{stat}"] = torch.full((cout,), val)
        sd[f"visual.bn{i}.running_mean"] = torch.zeros(cout)
        sd[f"visual.bn{i}.running_var"] = torch.ones(cout)
    cin = w
    for stage in range(4):
        planes = w * 2 ** stage
        base = f"visual.layer{stage + 1}.0"
        sd[f"{base}.conv1.weight"] = torch.randn(planes, cin, 1, 1) * 0.05
        sd[f"{base}.conv2.weight"] = torch.randn(planes, planes, 3, 3) * 0.05
        sd[f"{base}.conv3.weight"] = torch.randn(planes * 4, planes, 1, 1) * 0.05
        for j in (1, 2, 3):
            c = planes if j < 3 else planes * 4
            sd[f"{base}.bn{j}.weight"] = torch.ones(c)
            sd[f"{base}.bn{j}.bias"] = torch.zeros(c)
            sd[f"{base}.bn{j}.running_mean"] = torch.zeros(c)
            sd[f"{base}.bn{j}.running_var"] = torch.ones(c)
        sd[f"{base}.downsample.1.weight"] = torch.randn(planes * 4, cin, 1, 1) * 0.05
        sd[f"{base}.downsample.2.weight"] = torch.ones(planes * 4)
        sd[f"{base}.downsample.2.bias"] = torch.zeros(planes * 4)
        sd[f"{base}.downsample.2.running_mean"] = torch.zeros(planes * 4)
        sd[f"{base}.downsample.2.running_var"] = torch.ones(planes * 4)
        cin = planes * 4
    embed_dim = w * 8 * 4
    spacial = (cfg.image_size // 32) ** 2 + 1
    sd["visual.attnpool.positional_embedding"] = torch.randn(spacial, embed_dim) * 0.05
    for proj, dout in [("q_proj", embed_dim), ("k_proj", embed_dim),
                       ("v_proj", embed_dim), ("c_proj", cfg.output_dim)]:
        sd[f"visual.attnpool.{proj}.weight"] = torch.randn(dout, embed_dim) * 0.05
        sd[f"visual.attnpool.{proj}.bias"] = torch.zeros(dout)

    params = clip_lib.visual_params_from_openai(sd, cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 32, 32, 3)).astype(np.float32))
    out = clip_lib.modified_resnet_apply(params, cfg, x)
    assert out.shape == (2, cfg.output_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_image_embedder_none_masking(devices):
    from PIL import Image

    from viquae_tpu.image.embedding import ImageEmbedder

    def apply_fn(params, pixels):
        return pixels.mean(axis=(1, 2))  # (B, 3) trivial embedding

    emb = ImageEmbedder(apply_fn, {}, save_as="e", image_size=16,
                        preprocessing="face", batch_size=4)
    images = [
        Image.fromarray(np.full((20, 20, 3), 128, np.uint8)),
        None,
        Image.fromarray(np.full((16, 16, 3), 255, np.uint8)),
    ]
    out = emb.embed_images(images)
    assert out.shape == (3, 3)
    assert np.isnan(out[1]).all()
    assert np.isfinite(out[0]).all() and np.isfinite(out[2]).all()
    assert out[2, 0] == pytest.approx(1.0, abs=1e-3)  # white -> normalized 1


def _torch_modified_resnet(cfg):
    """Compact torch oracle of OpenAI CLIP's ModifiedResNet (public arch)."""
    import torch
    import torch.nn as nn

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU()
            self.downsample = None
            self.stride = stride
            if stride > 1 or inplanes != planes * 4:
                self.downsample = nn.Sequential(
                    nn.AvgPool2d(stride) if stride > 1 else nn.Identity(),
                    nn.Conv2d(inplanes, planes * 4, 1, stride=1, bias=False),
                    nn.BatchNorm2d(planes * 4),
                )

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.avgpool(out)
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class AttentionPool2d(nn.Module):
        def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
            super().__init__()
            self.positional_embedding = nn.Parameter(
                torch.randn(spacial_dim ** 2 + 1, embed_dim) / embed_dim ** 0.5
            )
            self.k_proj = nn.Linear(embed_dim, embed_dim)
            self.q_proj = nn.Linear(embed_dim, embed_dim)
            self.v_proj = nn.Linear(embed_dim, embed_dim)
            self.c_proj = nn.Linear(embed_dim, output_dim)
            self.num_heads = num_heads

        def forward(self, x):
            import torch.nn.functional as F

            x = x.flatten(start_dim=2).permute(2, 0, 1)  # (HW, N, C)
            x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
            x = x + self.positional_embedding[:, None, :]
            x, _ = F.multi_head_attention_forward(
                query=x[:1], key=x, value=x,
                embed_dim_to_check=x.shape[-1], num_heads=self.num_heads,
                q_proj_weight=self.q_proj.weight,
                k_proj_weight=self.k_proj.weight,
                v_proj_weight=self.v_proj.weight,
                in_proj_weight=None,
                in_proj_bias=torch.cat(
                    [self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]
                ),
                bias_k=None, bias_v=None, add_zero_attn=False,
                dropout_p=0, out_proj_weight=self.c_proj.weight,
                out_proj_bias=self.c_proj.bias, use_separate_proj_weight=True,
                training=False, need_weights=False,
            )
            return x.squeeze(0)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            w = cfg.width
            self.conv1 = nn.Conv2d(3, w // 2, 3, 2, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(w // 2)
            self.conv2 = nn.Conv2d(w // 2, w // 2, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(w // 2)
            self.conv3 = nn.Conv2d(w // 2, w, 3, padding=1, bias=False)
            self.bn3 = nn.BatchNorm2d(w)
            self.avgpool = nn.AvgPool2d(2)
            self.relu = nn.ReLU()
            self._inplanes = w
            self.layer1 = self._make_layer(w, cfg.stage_sizes[0])
            self.layer2 = self._make_layer(w * 2, cfg.stage_sizes[1], 2)
            self.layer3 = self._make_layer(w * 4, cfg.stage_sizes[2], 2)
            self.layer4 = self._make_layer(w * 8, cfg.stage_sizes[3], 2)
            embed_dim = w * 32
            self.attnpool = AttentionPool2d(
                cfg.image_size // 32, embed_dim, cfg.heads, cfg.output_dim
            )

        def _make_layer(self, planes, blocks, stride=1):
            import torch.nn as nn

            layers = [Bottleneck(self._inplanes, planes, stride)]
            self._inplanes = planes * Bottleneck.expansion
            for _ in range(1, blocks):
                layers.append(Bottleneck(self._inplanes, planes))
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.relu(self.bn1(self.conv1(x)))
            x = self.relu(self.bn2(self.conv2(x)))
            x = self.relu(self.bn3(self.conv3(x)))
            x = self.avgpool(x)
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.attnpool(x)

    return Net()


def test_modified_resnet_matches_torch_oracle():
    import torch

    cfg = clip_lib.ModifiedResNetConfig(
        stage_sizes=(1, 1, 1, 1), width=16, output_dim=24, heads=4,
        image_size=64,
    )
    torch.manual_seed(0)
    oracle = _torch_modified_resnet(cfg).eval()
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    sd = {f"visual.{k}": v for k, v in oracle.state_dict().items()}
    params = clip_lib.visual_params_from_openai(sd, cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(clip_lib.modified_resnet_apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-2)


def test_clip_preprocess_preserves_aspect():
    """A wide image must be shorter-side-resized + center-cropped, not
    squashed: a vertical stripe at the horizontal center survives."""
    img = np.zeros((1, 64, 128, 3), np.float32)
    img[0, :, 62:66, :] = 255.0  # center stripe
    out = np.asarray(image_ops.preprocess(jnp.asarray(img), size=32, kind="clip"))
    assert out.shape == (1, 32, 32, 3)
    # the stripe stays ~2px wide at the center (squashing would make it ~1px
    # and shift content); compare de-normalized brightness profile
    denorm = out[0, 16, :, 0] * image_ops.CLIP_STD[0] + image_ops.CLIP_MEAN[0]
    # shorter-side resize halves width 128->64 then center-crops: the 4px
    # stripe becomes ~2 bright pixels dead center (squashing 128->32 would
    # leave ~1 dim pixel)
    assert denorm[14:18].max() > 0.8
    assert denorm[14:18].mean() >= 0.45
    edges = np.concatenate([denorm[:8], denorm[-8:]]).mean()
    assert edges < 0.1


def test_image_towers_bf16_parity():
    """compute_dtype=bfloat16 (MXU fast path) must stay within bf16
    rounding of the f32 tower: cosine > 0.999, no dtype leak (output f32)."""
    rng = np.random.default_rng(9)

    def cos(a, b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        return float(((a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
        )).min())

    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)

    cfg = resnet_lib.ResNetConfig(stage_sizes=(2, 2), width=8)
    p = resnet_lib.init(jax.random.key(0), cfg)
    f32 = resnet_lib.apply(p, cfg, x)
    bf16 = resnet_lib.apply(p, cfg, x, compute_dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.float32
    assert cos(bf16, f32) > 0.999

    from viquae_tpu.models import arcface

    acfg = arcface.ArcFaceConfig(stage_sizes=(1, 1, 1, 1), width=8,
                                 embedding_size=16)
    ap = arcface.init(jax.random.key(1), acfg)
    xa = jnp.asarray(rng.standard_normal((2, 112, 112, 3)), jnp.float32)
    f32 = arcface.apply(ap, acfg, xa)
    bf16 = arcface.apply(ap, acfg, xa, compute_dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.float32
    assert cos(bf16, f32) > 0.999

    mcfg = clip_lib.ModifiedResNetConfig(stage_sizes=(1, 1), width=8,
                                         output_dim=16, heads=4,
                                         image_size=64)
    mp = _synth_modified_resnet_params(mcfg)
    f32 = clip_lib.modified_resnet_apply(mp, mcfg, x)
    bf16 = clip_lib.modified_resnet_apply(mp, mcfg, x,
                                          compute_dtype=jnp.bfloat16)
    assert cos(bf16, f32) > 0.999


def _synth_modified_resnet_params(mcfg):
    return clip_lib.visual_params_from_openai(
        clip_lib.random_openai_rn50_state_dict(mcfg), mcfg)


def test_image_embedder_non_rgb_and_all_none(devices):
    """Round-3 review: (a) 'L'/'P'/'RGBA' PIL images must be RGB-converted
    before the canvas assignment (grayscale crashed the whole batch);
    (b) an ALL-None call must probe the encoder for the embedding width
    instead of guessing 1 (ragged Arrow column otherwise)."""
    from PIL import Image

    from viquae_tpu.image.embedding import ImageEmbedder, decode_image_batch

    def apply_fn(params, pixels):
        return pixels.mean(axis=(1, 2))  # (B, 3)

    emb = ImageEmbedder(apply_fn, {}, save_as="e", image_size=16,
                        preprocessing="face", batch_size=4)
    base = np.full((20, 20, 3), 128, np.uint8)
    out = emb.embed_images([
        Image.fromarray(base).convert("L"),
        Image.fromarray(base).convert("RGBA"),
        Image.fromarray(base).convert("P"),
    ])
    assert out.shape == (3, 3) and np.isfinite(out).all()

    # serving-side decode too
    canvas, valid = decode_image_batch(
        [Image.fromarray(base).convert("L")], raw_size=16, batch_size=2)
    assert canvas.shape == (2, 16, 16, 3) and valid.tolist() == [True, False]

    # all-None batch keeps the true embedding width
    out = emb.embed_images([None, None])
    assert out.shape == (2, 3)
    assert np.isnan(out).all()


def test_face_detector_pads_final_chunk(devices, monkeypatch):
    """detect_batch must pad the trailing chunk to batch_size — every
    distinct batch dim recompiles the vmapped cascade (minutes over the
    tunneled TPU)."""
    from PIL import Image

    from viquae_tpu.image import face_detection
    from viquae_tpu.models import mtcnn

    seen = []
    real = mtcnn.detect_faces_batch

    def spy(params, images, hws, cfg):
        seen.append(images.shape[0])
        return real(params, images, hws, cfg)

    monkeypatch.setattr(face_detection.mtcnn, "detect_faces_batch", spy)
    cfg = mtcnn.MTCNNConfig(canvas=64, min_face_size=20)
    params = mtcnn.init(jax.random.key(0))
    det = face_detection.FaceDetector(params, cfg=cfg, batch_size=4)
    imgs = [Image.fromarray(
        np.random.default_rng(i).integers(0, 255, (40, 40, 3), np.uint8))
        for i in range(6)]
    probs, boxes, lms = det.detect_batch(imgs + [None])
    assert seen == [4, 4]  # 6 images -> chunks of 4 and 2->padded 4
    assert len(probs) == 7 and probs[6] is None


def test_scale_boxes_item_schema_on_missing_image():
    """The image-None branch must still emit scaled_face_landmarks (Arrow
    needs identical keys across items)."""
    from viquae_tpu.image.face_box import scale_boxes_item

    item = {"image": "/nonexistent/path.jpg",
            "face_box": [[1.0, 2.0, 3.0, 4.0]],
            "face_landmarks": [[[1.0, 1.0]] * 5]}
    out = scale_boxes_item(dict(item))
    assert out["scaled_face_box"] is None
    assert out["scaled_face_landmarks"] is None


def test_imagenet_preprocess_no_256_intermediate(devices):
    """Round-3 review: the reference transform is Resize(224)+CenterCrop(224)
    (meerqat get_transform defaults) — NOT the torchvision-eval 256-resize.
    A target-size input must pass through with ONLY normalization."""
    from viquae_tpu.ops import image as image_ops

    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    out = np.asarray(image_ops.preprocess(jnp.asarray(x), size=64,
                                          kind="imagenet"))
    expected = (x.astype(np.float32) / 255.0
                - np.asarray(image_ops.IMAGENET_MEAN, np.float32)) \
        / np.asarray(image_ops.IMAGENET_STD, np.float32)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)
    # aspect is preserved for non-square inputs (shorter-side resize)
    y = rng.integers(0, 255, (1, 64, 128, 3), np.uint8)
    out = np.asarray(image_ops.preprocess(jnp.asarray(y), size=32,
                                          kind="imagenet"))
    assert out.shape == (1, 32, 32, 3)


def test_gelu_is_exact_erf():
    """HF/torch 'gelu' (BertModel/DPR/nn.GELU) is the exact erf GELU; the
    tanh approximation drifts ~4e-4 at |x|~2 and is exposed as gelu_new."""
    import torch

    from viquae_tpu.models.layers import ACT

    x = np.linspace(-4, 4, 101).astype(np.float32)
    ours = np.asarray(ACT["gelu"](jnp.asarray(x)))
    oracle = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-6)  # f32 erf impls differ in the last bits
    tanh = np.asarray(ACT["gelu_new"](jnp.asarray(x)))
    oracle_tanh = torch.nn.functional.gelu(
        torch.from_numpy(x), approximate="tanh").numpy()
    np.testing.assert_allclose(tanh, oracle_tanh, atol=1e-6)
    assert np.abs(ours - tanh).max() > 1e-4  # they are genuinely different
