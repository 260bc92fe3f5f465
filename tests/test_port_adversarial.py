"""Adversarial weight-port tests (VERDICT r2 item 7).

`scripts/validate_ports.py` (real-checkpoint validation) cannot run without
network egress, so the offline suite must prove more than layout: for every
`params_from_*` port family, corrupt the source state_dict the ways a
silent mapping regression would (transpose a kernel, swap q<->k, shift a
LayerNorm/BN vector) and assert the port either FAILS LOUDLY or produces a
forward output the activation-parity check would catch. This pins the
mapping logic: a port that "absorbs" one of these corruptions without
changing its output is itself wrong. Reference contract the ports mirror:
/root/reference/meerqat/data/loading.py:167-183 (get_pretrained).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _clone_sd(sd):
    return {k: (v.clone() if hasattr(v, "clone") else np.copy(v))
            for k, v in sd.items()}


def _assert_corruptions_detected(forward_from_sd, sd, corruptions,
                                 threshold=1e-5):
    """Each corruption must either raise during port/forward or move the
    output materially.

    The forward is a deterministic fp32 recompute of the same program, so
    re-running on an identical state_dict reproduces `clean` to ~1e-7; any
    diff orders of magnitude above that proves the port TRANSMITS the
    corrupted tensor rather than absorbing it (reading the wrong tensor,
    double-transposing, or ignoring it would null the diff). Magnitudes are
    small here only because the weights are random tiny-scale inits — with
    real trained checkpoints the same propagation produces O(1) activation
    drift, which is what scripts/validate_ports.py's parity check keys on."""
    clean = np.asarray(forward_from_sd(sd))
    floor = threshold * max(1.0, float(np.max(np.abs(clean))))
    for name, corrupt in corruptions:
        sd2 = _clone_sd(sd)
        corrupt(sd2)
        try:
            out = np.asarray(forward_from_sd(sd2))
        except Exception:
            continue  # failed loudly: the port rejected the bad layout
        diff = float(np.max(np.abs(out - clean)))
        assert diff > floor, (
            f"corruption {name!r} was silently absorbed "
            f"(max diff {diff} <= noise floor {floor})"
        )


def _roll(t):
    import torch

    return torch.roll(t, 1, dims=0)


def _derandomize_degenerate_inits(model, seed=11):
    """LayerNorm weights init to all-ones, biases to zeros, PReLU alphas to
    a constant — rolling/swapping those is a literal no-op. Give every such
    vector distinct values so the corruptions below have teeth."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.LayerNorm):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.uniform_(-0.2, 0.2, generator=g)
            elif isinstance(m, torch.nn.PReLU):
                m.weight.uniform_(0.1, 0.4, generator=g)
            elif isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.uniform_(-0.2, 0.2, generator=g)
                m.running_mean.uniform_(-0.2, 0.2, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


def test_bert_port_rejects_corruptions():
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel

    from viquae_tpu.models import bert

    torch.manual_seed(0)
    hf_cfg = HFBertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40,
    )
    model = BertModel(hf_cfg).eval()
    _derandomize_degenerate_inits(model)
    cfg = bert.BertConfig.from_hf(hf_cfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 100, (2, 10)), jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32)

    def forward(sd):
        params = bert.params_from_hf(sd, cfg)
        return bert.apply(params, cfg, ids, mask,
                          deterministic=True)["last_hidden_state"]

    L = "encoder.layer.0.attention"
    _assert_corruptions_detected(forward, model.state_dict(), [
        ("transpose query kernel",
         lambda sd: sd.update({f"{L}.self.query.weight":
                               sd[f"{L}.self.query.weight"].t()})),
        ("swap q/k kernels",
         lambda sd: sd.update({
             f"{L}.self.query.weight": sd[f"{L}.self.key.weight"],
             f"{L}.self.key.weight": sd[f"{L}.self.query.weight"]})),
        ("roll attention-output LayerNorm weight",
         lambda sd: sd.update({f"{L}.output.LayerNorm.weight":
                               _roll(sd[f"{L}.output.LayerNorm.weight"])})),
        ("drop a layer key",
         lambda sd: sd.pop(f"{L}.self.value.weight")),
    ])


def test_dpr_port_rejects_corruptions():
    import torch
    from transformers import DPRConfig as HFDPRConfig, DPRQuestionEncoder

    from viquae_tpu.models import bert, dpr

    torch.manual_seed(1)
    hf_cfg = HFDPRConfig(
        projection_dim=0, vocab_size=100, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40,
    )
    model = DPRQuestionEncoder(hf_cfg).eval()
    _derandomize_degenerate_inits(model)
    cfg = dpr.DPRConfig(bert=bert.BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, add_pooler=False,
    ))
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, 100, (2, 10)), jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32)

    def forward(sd):
        params = dpr.params_from_hf_dpr(sd, cfg)
        return dpr.apply(params, cfg, ids, mask,
                         deterministic=True)["pooler_output"]

    B = "question_encoder.bert_model"
    _assert_corruptions_detected(forward, model.state_dict(), [
        ("transpose intermediate dense (non-square: must raise or move)",
         lambda sd: sd.update({
             f"{B}.encoder.layer.1.attention.self.query.weight":
             sd[f"{B}.encoder.layer.1.attention.self.query.weight"].t()})),
        ("roll word-embedding row order",
         lambda sd: sd.update({f"{B}.embeddings.word_embeddings.weight":
                               _roll(sd[f"{B}.embeddings.word_embeddings.weight"])})),
        ("swap LN weight/bias",
         lambda sd: sd.update({
             f"{B}.embeddings.LayerNorm.weight":
             sd[f"{B}.embeddings.LayerNorm.bias"],
             f"{B}.embeddings.LayerNorm.bias":
             sd[f"{B}.embeddings.LayerNorm.weight"]})),
    ])


def test_clip_port_rejects_corruptions():
    import torch
    from transformers import (CLIPConfig, CLIPModel, CLIPTextConfig,
                              CLIPVisionConfig)

    from viquae_tpu.models import clip as clip_lib

    torch.manual_seed(2)
    hf_cfg = CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(vocab_size=70, hidden_size=16, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=32,
                       max_position_embeddings=12, eos_token_id=69,
                       bos_token_id=68, pad_token_id=69),
        CLIPVisionConfig(hidden_size=16, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=32,
                         image_size=32, patch_size=16),
        projection_dim=16,
    )
    model = CLIPModel(hf_cfg).eval()
    _derandomize_degenerate_inits(model)
    vcfg = clip_lib.CLIPVisionConfig(
        hidden_size=16, num_layers=2, num_heads=2, intermediate_size=32,
        image_size=32, patch_size=16, projection_dim=16,
    )
    pixels = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 32, 32, 3)),
        jnp.float32)

    def forward(sd):
        params = clip_lib.params_from_hf(sd)
        return clip_lib.vit_apply(params["vision"], vcfg,
                                  pixels)["image_embeds"]

    V = "vision_model.encoder.layers.0.self_attn"
    _assert_corruptions_detected(forward, model.state_dict(), [
        ("transpose visual projection",
         lambda sd: sd.update({"visual_projection.weight":
                               sd["visual_projection.weight"].t()})),
        ("swap vision q/k kernels",
         lambda sd: sd.update({
             f"{V}.q_proj.weight": sd[f"{V}.k_proj.weight"],
             f"{V}.k_proj.weight": sd[f"{V}.q_proj.weight"]})),
        ("roll post-layernorm weight",
         lambda sd: sd.update({"vision_model.post_layernorm.weight":
                               _roll(sd["vision_model.post_layernorm.weight"])})),
        ("permute patch-embed kernel spatial dims",
         lambda sd: sd.update({
             "vision_model.embeddings.patch_embedding.weight":
             sd["vision_model.embeddings.patch_embedding.weight"]
             .permute(0, 1, 3, 2)})),
    ])


def test_vilt_port_rejects_corruptions():
    import torch
    from transformers import ViltConfig as HFViltConfig, ViltModel

    from viquae_tpu.models import vilt

    torch.manual_seed(3)
    tiny = vilt.ViltConfig(
        vocab_size=60, hidden_size=24, num_layers=2, num_heads=2,
        intermediate_size=48, max_positions=32, image_size=48,
        patch_size=16,
    )
    hf_cfg = HFViltConfig(
        vocab_size=60, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48,
        max_position_embeddings=32, image_size=48, patch_size=16,
        modality_type_vocab_size=2, hidden_act="gelu",
    )
    model = ViltModel(hf_cfg).eval()
    _derandomize_degenerate_inits(model)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 60, (1, 6)), jnp.int32)
    pix = jnp.asarray(rng.standard_normal((1, 48, 48, 3)), jnp.float32)

    def forward(sd):
        params = vilt.params_from_hf(sd, tiny)
        out = vilt.apply(params, tiny, ids, pix)
        return jnp.concatenate([out["last_hidden_state"].reshape(-1),
                                out["pooler_output"].reshape(-1)])

    A = "encoder.layer.0.attention.attention"
    _assert_corruptions_detected(forward, model.state_dict(), [
        ("transpose query kernel",
         lambda sd: sd.update({f"{A}.query.weight":
                               sd[f"{A}.query.weight"].t()})),
        ("swap q/v kernels",
         lambda sd: sd.update({
             f"{A}.query.weight": sd[f"{A}.value.weight"],
             f"{A}.value.weight": sd[f"{A}.query.weight"]})),
        ("roll modality-type embedding",
         lambda sd: sd.update({
             "embeddings.token_type_embeddings.weight":
             _roll(sd["embeddings.token_type_embeddings.weight"])})),
    ])


def test_arcface_port_rejects_corruptions():
    import torch

    from tests.test_face import _torch_iresnet
    from viquae_tpu.models import arcface

    torch.manual_seed(4)
    cfg = arcface.ArcFaceConfig(stage_sizes=(1, 1, 1, 1), width=8,
                                embedding_size=16)
    oracle = _torch_iresnet(cfg).eval()
    _derandomize_degenerate_inits(oracle)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 112, 112, 3)),
        jnp.float32)

    def forward(sd):
        params = arcface.params_from_insightface(sd, cfg)
        return arcface.apply(params, cfg, x)

    _assert_corruptions_detected(forward, oracle.state_dict(), [
        ("transpose conv kernel spatial dims",
         lambda sd: sd.update({"layer1.0.conv1.weight":
                               sd["layer1.0.conv1.weight"]
                               .permute(0, 1, 3, 2)})),
        ("swap BN running mean/var",
         lambda sd: sd.update({
             "bn1.running_mean": sd["bn1.running_var"],
             "bn1.running_var": sd["bn1.running_mean"].abs() + 0.5})),
        ("transpose fc kernel",
         lambda sd: sd.update({"fc.weight": sd["fc.weight"].t()})),
        ("roll features-BN scale",
         lambda sd: sd.update({"features.weight":
                               _roll(sd["features.weight"])})),
    ])


def test_resnet_port_rejects_corruptions():
    import torch

    from tests.test_image_models import _torch_resnet
    from viquae_tpu.models import resnet as resnet_lib

    torch.manual_seed(5)
    cfg = resnet_lib.ResNetConfig(stage_sizes=(2, 2), width=8)
    oracle = _torch_resnet(cfg).eval()
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 32, 32, 3)),
        jnp.float32)

    def forward(sd):
        params = resnet_lib.params_from_torchvision(sd, cfg)
        return resnet_lib.apply(params, cfg, x)

    _assert_corruptions_detected(forward, oracle.state_dict(), [
        ("transpose 3x3 conv spatial dims",
         lambda sd: sd.update({"layer1.0.conv2.weight":
                               sd["layer1.0.conv2.weight"]
                               .permute(0, 1, 3, 2)})),
        ("swap conv1/conv3 (1x1) kernels",
         lambda sd: sd.update({
             "layer2.1.conv1.weight": sd["layer2.1.conv3.weight"],
             "layer2.1.conv3.weight": sd["layer2.1.conv1.weight"]})),
        ("roll stem BN running mean",
         lambda sd: sd.update({"bn1.running_mean":
                               _roll(sd["bn1.running_mean"])})),
        ("drop downsample conv",
         lambda sd: sd.pop("layer1.0.downsample.0.weight")),
    ])


def test_mtcnn_port_rejects_corruptions():
    import torch

    from tests.test_face import _full_facenet_sd
    from viquae_tpu.models import mtcnn

    sd = _full_facenet_sd()
    g = torch.Generator().manual_seed(12)
    for k in list(sd):
        if ".prelu" in k:  # constant 0.25 init: rolling would be a no-op
            sd[k] = sd[k].clone().uniform_(0.1, 0.4, generator=g)
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((1, 12, 12, 3)),
        jnp.float32)

    def forward(s):
        params = mtcnn.params_from_facenet(s)
        probs, reg = mtcnn.pnet_apply(params["pnet"], x)
        return jnp.concatenate(
            [probs.reshape(-1), reg.reshape(-1)])

    _assert_corruptions_detected(forward, sd, [
        ("transpose pnet conv1 spatial dims",
         lambda s: s.update({"pnet.conv1.weight":
                             s["pnet.conv1.weight"].permute(0, 1, 3, 2)})),
        ("swap cls/reg heads (both 1x1 from 32ch — silent shape-wise only "
         "if dims collide; must raise or move)",
         lambda s: s.update({
             "pnet.conv4_1.bias": _roll(s["pnet.conv4_1.bias"])})),
        ("roll prelu alpha",
         lambda s: s.update({"pnet.prelu2.weight":
                             _roll(s["pnet.prelu2.weight"])})),
    ])


@pytest.fixture()
def bert_tokenizer(tmp_path):
    from transformers import BertTokenizerFast

    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + [f"w{i}" for i in range(50)])
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    return BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"))


def test_bem_port_rejects_corruptions(bert_tokenizer):
    import torch

    from viquae_tpu.models import bem as bem_lib
    from viquae_tpu.models import bert as bert_lib

    cfg = bem_lib.BEMConfig(
        bert=bert_lib.BertConfig(
            vocab_size=bert_tokenizer.vocab_size + 10, hidden_size=16,
            num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=32, type_vocab_size=3, add_pooler=True,
        ),
        max_length=32,
    )
    scorer = bem_lib.BEMScorer(cfg=cfg, tokenizer=bert_tokenizer,
                               max_length=32)
    sd = bert_lib.params_to_hf_state_dict(
        scorer.params["bert"], cfg.bert, prefix="bert.")
    sd["bert.pooler.dense.weight"] = torch.from_numpy(
        np.asarray(scorer.params["bert"]["pooler"]["kernel"]).T.copy())
    sd["bert.pooler.dense.bias"] = torch.from_numpy(
        np.asarray(scorer.params["bert"]["pooler"]["bias"]).copy())
    sd["classifier.weight"] = torch.from_numpy(
        np.asarray(scorer.params["head"]["kernel"]).T.copy())
    sd["classifier.bias"] = torch.from_numpy(
        np.asarray(scorer.params["head"]["bias"]).copy())

    ids = jnp.asarray(
        np.random.default_rng(7).integers(5, 20, (1, 12)), jnp.int32)
    segs = jnp.asarray(np.array([[0] * 4 + [1] * 4 + [2] * 4]), jnp.int32)
    mask = jnp.ones((1, 12), jnp.int32)

    def forward(s):
        params = bem_lib.params_from_state_dict(s, cfg)
        return bem_lib.apply(params, cfg, ids, segs, mask)

    _assert_corruptions_detected(forward, sd, [
        ("transpose classifier head",
         lambda s: s.update({"classifier.weight":
                             s["classifier.weight"].t()})),
        ("swap head weight with pooler weight",
         lambda s: s.update({
             "classifier.weight": s["bert.pooler.dense.weight"][:2]})),
        ("roll type embeddings (BEM uses 3 segment types)",
         lambda s: s.update({
             "bert.embeddings.token_type_embeddings.weight":
             _roll(s["bert.embeddings.token_type_embeddings.weight"])})),
    ])
