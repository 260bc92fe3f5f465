"""Multimodal encoders, reader and rerankers."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viquae_tpu.models import bert, mm, qa, rr

TINY_BERT = bert.BertConfig(
    vocab_size=60, hidden_size=24, num_hidden_layers=2,
    num_attention_heads=2, intermediate_size=48,
    max_position_embeddings=40, add_pooler=False,
)
MM_CFG = mm.MMConfig(
    bert=TINY_BERT, n_faces=2, face_dim=8, bbox_dim=7,
    image_dims=(("clip", 10), ("imagenet", 12)),
)


def make_inputs(b=3, l=6, n_images=1, n_faces=2, seed=0):
    rng = np.random.default_rng(seed)
    text = {
        "input_ids": jnp.asarray(rng.integers(0, 60, (b, l))),
        "attention_mask": jnp.ones((b, l), jnp.int32),
    }
    face = {
        "face": jnp.asarray(
            rng.standard_normal((b, n_images, n_faces, 8)).astype(np.float32)
        ),
        "bbox": jnp.asarray(
            rng.standard_normal((b, n_images, n_faces, 7)).astype(np.float32)
        ),
        "attention_mask": jnp.asarray(
            np.array([[[1, 1]], [[1, 0]], [[0, 0]]], np.int32)[:b]
        ),
    }
    image = {
        "clip": {
            "input": jnp.asarray(
                rng.standard_normal((b, n_images, 10)).astype(np.float32)
            ),
            "attention_mask": jnp.ones((b, n_images), jnp.int32),
        },
        "imagenet": {
            "input": jnp.asarray(
                rng.standard_normal((b, n_images, 12)).astype(np.float32)
            ),
            "attention_mask": jnp.ones((b, n_images), jnp.int32),
        },
    }
    return text, face, image


def test_eca_shapes_and_mask_effect():
    params = mm.eca_init(jax.random.key(0), MM_CFG)
    text, face, image = make_inputs()
    out = mm.eca_apply(params, MM_CFG, text, face, image)
    assert out.pooler_output.shape == (3, 24)
    # L_total = text 6 + faces 2 + images 2
    assert out.last_hidden_state.shape == (3, 10, 24)
    # masked face content must not change output (row 2 has no valid face)
    face2 = dict(face)
    face2["face"] = face["face"].at[2].add(100.0)
    out2 = mm.eca_apply(params, MM_CFG, text, face2, image)
    np.testing.assert_allclose(
        np.asarray(out.pooler_output[2]), np.asarray(out2.pooler_output[2]),
        atol=1e-5,
    )
    # but unmasked face content does change it (row 0)
    face3 = dict(face)
    face3["face"] = face["face"].at[0].add(100.0)
    out3 = mm.eca_apply(params, MM_CFG, text, face3, image)
    assert not np.allclose(
        np.asarray(out.pooler_output[0]), np.asarray(out3.pooler_output[0])
    )


def test_eca_gating_starts_at_zero():
    cfg = mm.MMConfig(
        bert=TINY_BERT, n_faces=2, face_dim=8,
        image_dims=(("clip", 10),), gating=True,
    )
    params = mm.eca_init(jax.random.key(0), cfg)
    text, face, image = make_inputs()
    image = {"clip": image["clip"]}
    out = mm.eca_apply(params, cfg, text, face, image)
    # gates init at 0 -> visual tokens are zero vectors; changing the face
    # values must not change anything
    face2 = dict(face)
    face2["face"] = face["face"] + 5.0
    out2 = mm.eca_apply(params, cfg, text, face2, image)
    np.testing.assert_allclose(
        np.asarray(out.pooler_output), np.asarray(out2.pooler_output),
        atol=1e-5,
    )


def test_eca_no_text():
    cfg = mm.MMConfig(bert=TINY_BERT, n_faces=2, face_dim=8,
                      image_dims=(("clip", 10),), no_text=True)
    params = mm.eca_init(jax.random.key(0), cfg)
    text, face, image = make_inputs()
    out = mm.eca_apply(params, cfg, text, face, {"clip": image["clip"]})
    # sequence = CLS + 2 faces + 1 image
    assert out.last_hidden_state.shape == (3, 4, 24)


def test_eca_exclusive_masks_images_when_faces_present():
    cfg = mm.MMConfig(bert=TINY_BERT, n_faces=2, face_dim=8,
                      image_dims=(("clip", 10),),
                      face_and_image_are_exclusive=True)
    params = mm.eca_init(jax.random.key(0), cfg)
    text, face, image = make_inputs()
    image = {"clip": image["clip"]}
    out = mm.eca_apply(params, cfg, text, face, image)
    # row 0 has faces -> image must be masked: changing it is a no-op
    image2 = {"clip": dict(image["clip"])}
    image2["clip"]["input"] = image["clip"]["input"].at[0].add(50.0)
    out2 = mm.eca_apply(params, cfg, text, face, image2)
    np.testing.assert_allclose(
        np.asarray(out.pooler_output[0]), np.asarray(out2.pooler_output[0]),
        atol=1e-5,
    )
    # row 2 has NO faces -> image visible: changing it changes the output
    image3 = {"clip": dict(image["clip"])}
    image3["clip"]["input"] = image["clip"]["input"].at[2].add(50.0)
    out3 = mm.eca_apply(params, cfg, text, face, image3)
    assert not np.allclose(
        np.asarray(out.pooler_output[2]), np.asarray(out3.pooler_output[2])
    )


def test_ilf_shapes_and_face_sum():
    params = mm.ilf_init(jax.random.key(0), MM_CFG)
    text, face, image = make_inputs()
    out = mm.ilf_apply(params, MM_CFG, text, face, image)
    assert out.pooler_output.shape == (3, 24)
    # masked faces contribute nothing: row 2's output must be independent
    face2 = dict(face)
    face2["face"] = face["face"].at[2].add(9.0)
    out2 = mm.ilf_apply(params, MM_CFG, text, face2, image)
    np.testing.assert_allclose(
        np.asarray(out.pooler_output[2]), np.asarray(out2.pooler_output[2]),
        atol=1e-5,
    )


def test_flamant_runs_and_gating_zero_init():
    cfg = mm.FlamantConfig(
        bert=TINY_BERT, n_faces=2, face_dim=8, image_dims=(("clip", 10),),
        gating=True, multimodal_attention_every=1,
        image_num_attention_heads=2, image_intermediate_size=48,
    )
    params = mm.flamant_init(jax.random.key(0), cfg)
    text, face, image = make_inputs()
    out = mm.flamant_apply(params, cfg, text, face, {"clip": image["clip"]})
    assert out.pooler_output.shape == (3, 24)
    # zero-init gates: visual features must not affect the output at init
    face2 = dict(face)
    face2["face"] = face["face"] + 3.0
    out2 = mm.flamant_apply(params, cfg, text, face2, {"clip": image["clip"]})
    np.testing.assert_allclose(
        np.asarray(out.pooler_output), np.asarray(out2.pooler_output),
        atol=1e-4,
    )


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------
def test_get_best_spans_matches_torch_reference():
    import torch

    n, m, L = 2, 3, 8
    rng = np.random.default_rng(0)
    start = rng.uniform(0, 1, (n, m, L)).astype(np.float32)
    end = rng.uniform(0, 1, (n, m, L)).astype(np.float32)
    weights = rng.uniform(1.1, 3.0, (n, m)).astype(np.float32)

    # torch oracle implementing the reference formula (models/qa.py:18-77)
    t_start, t_end = torch.tensor(start), torch.tensor(end)
    pairwise = t_start.reshape(n, m, L, 1) @ t_end.reshape(n, m, 1, L)
    pairwise = torch.triu(pairwise)
    pairwise[:, :, 0, :] = 0
    pairwise *= torch.tensor(weights).reshape(n, m, 1, 1)
    flat = pairwise.reshape(n, m, L * L)
    ref_passage = flat.max(axis=2).values.argmax(axis=1)
    best = flat[torch.arange(n), ref_passage]
    arg = best.argmax(axis=-1)
    ref_start, ref_end = arg // L, arg % L + 1

    p, s, e = qa.get_best_spans(
        jnp.asarray(start), jnp.asarray(end), jnp.asarray(weights)
    )
    np.testing.assert_array_equal(np.asarray(p), ref_passage.numpy())
    np.testing.assert_array_equal(np.asarray(s), ref_start.numpy())
    np.testing.assert_array_equal(np.asarray(e), ref_end.numpy())


def test_reader_param_spec_tree_matches_init():
    """qa.param_spec must mirror init() exactly (both fuse_ir_score
    variants) — the multichip dryrun shards the reader trainer with it."""
    for fuse in (False, True):
        cfg = qa.ReaderConfig(bert=TINY_BERT, fuse_ir_score=fuse)
        params = qa.init(jax.random.key(0), cfg)
        spec = qa.param_spec(cfg)
        pt = jax.tree_util.tree_structure(params)
        st = jax.tree_util.tree_structure(
            spec,
            is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
        assert pt == st


def test_reader_forward_and_loss():
    cfg = qa.ReaderConfig(bert=TINY_BERT, fuse_ir_score=True)
    params = qa.init(jax.random.key(0), cfg)
    n, m, L, A = 2, 3, 10, 2
    rng = np.random.default_rng(0)
    out = qa.reader_apply(
        params, cfg,
        jnp.asarray(rng.integers(0, 60, (n * m, L))),
        attention_mask=jnp.ones((n * m, L), jnp.int32),
        passage_scores=jnp.asarray(rng.uniform(1, 5, (n * m,)).astype(np.float32)),
        start_positions=jnp.asarray(rng.integers(0, L, (n, m, A))),
        end_positions=jnp.asarray(rng.integers(0, L, (n, m, A))),
        answer_mask=jnp.asarray(rng.integers(0, 2, (n, m, A))),
        m_passages=m,
    )
    assert out.start_logits.shape == (n * m, L)
    assert np.isfinite(float(out.loss))
    assert out.start_log_probs.shape == (n * m, L)


def test_reader_gradients_flow():
    cfg = qa.ReaderConfig(bert=TINY_BERT)
    params = qa.init(jax.random.key(0), cfg)
    n, m, L, A = 1, 2, 8, 1
    rng = np.random.default_rng(0)
    batch = dict(
        ids=jnp.asarray(rng.integers(0, 60, (n * m, L))),
        sp=jnp.asarray(rng.integers(1, L - 1, (n, m, A))),
        ep=jnp.asarray(rng.integers(1, L - 1, (n, m, A))),
        am=jnp.ones((n, m, A), jnp.int32),
    )

    def loss_fn(p):
        return qa.reader_apply(
            p, cfg, batch["ids"], start_positions=batch["sp"],
            end_positions=batch["ep"], answer_mask=batch["am"], m_passages=m,
        ).loss

    grads = jax.grad(loss_fn)(params)
    gnorm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)
    )
    assert gnorm > 0


def test_rerankers():
    cfg = rr.BertReRankerConfig(bert=TINY_BERT)
    params = rr.bert_reranker_init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    out = rr.bert_reranker_apply(
        params, cfg, jnp.asarray(rng.integers(0, 60, (6, 8)))
    )
    assert out.logits.shape == (6,)

    eca_params = rr.eca_reranker_init(jax.random.key(1), MM_CFG)
    text, face, image = make_inputs()
    out = rr.eca_reranker_apply(eca_params, MM_CFG, text, face, image)
    assert out.logits.shape == (3,)


def test_clip_for_ir():
    from viquae_tpu.models import clip as clip_lib

    tcfg = clip_lib.CLIPTextConfig(
        vocab_size=50, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, max_positions=16, projection_dim=8,
        eos_token_id=49,
    )
    vcfg = clip_lib.CLIPVisionConfig(
        hidden_size=16, num_layers=1, num_heads=2, intermediate_size=32,
        image_size=16, patch_size=8, projection_dim=8,
    )
    key = jax.random.key(0)
    params = {
        "text": clip_lib.text_init(key, tcfg),
        "vision": clip_lib.vit_init(jax.random.fold_in(key, 1), vcfg),
    }
    rng = np.random.default_rng(0)
    out = mm.clip_for_ir_apply(
        params, tcfg, vcfg,
        jnp.asarray([[0, 5, 49, 1]]),
        jnp.asarray([[1, 1, 1, 0]]),
        jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32)),
    )
    assert out.pooler_output.shape == (1, 8)


def test_multi_passage_eca_reader():
    cfg = mm.MMConfig(
        bert=TINY_BERT, n_faces=2, face_dim=8, bbox_dim=7,
        image_dims=(("clip", 10),),
    )
    params = qa.eca_reader_init(jax.random.key(0), cfg)
    n, m, L, A = 2, 2, 6, 2
    text, face, image = make_inputs(b=n * m, l=L)
    # make_inputs only defines 3 face-mask rows; rebuild for b = n*m
    face["attention_mask"] = jnp.ones((n * m, 1, 2), jnp.int32)
    image = {"clip": image["clip"]}
    rng = np.random.default_rng(0)
    out = qa.eca_reader_apply(
        params, cfg, text, face, image,
        start_positions=jnp.asarray(rng.integers(1, L - 1, (n, m, A))),
        end_positions=jnp.asarray(rng.integers(1, L - 1, (n, m, A))),
        answer_mask=jnp.ones((n, m, A), jnp.int32),
        m_passages=m,
    )
    # span logits cover only the TEXT tokens despite the longer mm sequence
    assert out.start_logits.shape == (n * m, L)
    assert np.isfinite(float(out.loss))


def test_joint_mono_cross_modal_trainee():
    from viquae_tpu.models import clip as clip_lib
    from viquae_tpu.train import trainee as trainee_lib

    tcfg = clip_lib.CLIPTextConfig(
        vocab_size=50, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, max_positions=16, projection_dim=8,
        eos_token_id=49,
    )
    vcfg = clip_lib.CLIPVisionConfig(
        hidden_size=16, num_layers=1, num_heads=2, intermediate_size=32,
        image_size=16, patch_size=8, projection_dim=8,
    )

    class TextModel:
        params = clip_lib.text_init(jax.random.key(0), tcfg)

        def apply_fn(self, p, input_ids, attention_mask=None, **kw):
            return clip_lib.text_apply(p, tcfg, input_ids, attention_mask)

    class VisionModel:
        params = clip_lib.vit_init(jax.random.key(1), vcfg)

        def apply_fn(self, p, pixels):
            return clip_lib.vit_apply(p, vcfg, pixels)

    trainee = trainee_lib.JointMonoAndCrossModalTrainee(
        TextModel(), VisionModel(), learn_weights=False
    )
    rng = np.random.default_rng(0)
    n = 3
    batch = {
        "pixel_values": jnp.asarray(
            rng.standard_normal((n, 16, 16, 3)).astype(np.float32)
        ),
        "paired_pixel_values": jnp.asarray(
            rng.standard_normal((n, 16, 16, 3)).astype(np.float32)
        ),
        "text_inputs": {
            "input_ids": jnp.asarray([[0, 5, 49, 1]] * n),
            "attention_mask": jnp.ones((n, 4), jnp.int32),
        },
        "labels": jnp.arange(n),
    }
    loss, aux = trainee.loss_fn(trainee.params, batch, jax.random.key(0))
    assert np.isfinite(float(loss))
    metrics = trainee.eval_fn([aux])
    assert "image_MRR@N*M" in metrics and "cm_MRR@N*M" in metrics
    assert trainee.freeze_weights_regex() is not None


def test_registry_wrappers_roundtrip(tmp_path):
    """ECAEncoder/IntermediateLinearFusion are instantiable by class_name via
    the config registry (get_pretrained contract) and reload exported params
    (regression: models/__init__ must import mm for registration to run)."""
    from viquae_tpu.core.config import get_class_from_name
    from viquae_tpu.train.checkpoint import export_params

    cfg_kwargs = dict(
        bert={"vocab_size": 60, "hidden_size": 24, "num_hidden_layers": 1,
              "num_attention_heads": 2, "intermediate_size": 48,
              "max_position_embeddings": 40, "add_pooler": False},
        n_faces=2, face_dim=8, image_dims={"clip": 10, "imagenet": 12},
    )
    text, face, image = make_inputs()
    for name in ["ECAEncoder", "IntermediateLinearFusion"]:
        cls = get_class_from_name(name)
        bundle = cls(seed=0, **cfg_kwargs)
        pooled = np.asarray(
            bundle.apply_fn(bundle.params, text, face, image).pooler_output
        )
        assert pooled.shape == (3, 24)
        path = tmp_path / name
        export_params(path, bundle.params)
        again = cls.from_pretrained(path, **cfg_kwargs)
        pooled2 = np.asarray(
            again.apply_fn(again.params, text, face, image).pooler_output
        )
        np.testing.assert_allclose(pooled, pooled2, atol=1e-5)


def test_ilf_packed_matches_padded(devices):
    """ilf_apply_packed == ilf_apply (the ILF visual side is a sum, so the
    packed canvas carries text only)."""
    from viquae_tpu.train import data as tdata

    cfg = mm.MMConfig(
        bert=bert.BertConfig(
            vocab_size=100, hidden_size=24, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=48,
            max_position_embeddings=40, add_pooler=False,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        ),
        n_faces=2, face_dim=6, bbox_dim=7, image_dims=(("clip", 8),),
        n_images=1,
    )
    params = mm.ilf_init(jax.random.key(5), cfg)
    rng = np.random.default_rng(4)
    b = 7
    lens = rng.integers(3, 14, b)
    ids = np.zeros((b, 16), np.int32)
    mask = np.zeros((b, 16), np.int32)
    for i, l in enumerate(lens):
        ids[i, :l] = rng.integers(1, 90, l)
        mask[i, :l] = 1
    text = {"input_ids": ids, "attention_mask": mask}
    face = {
        "face": rng.standard_normal((b, 1, 2, 6)).astype(np.float32),
        "bbox": rng.standard_normal((b, 1, 2, 7)).astype(np.float32),
        "attention_mask": (rng.random((b, 1, 2)) < 0.6).astype(np.int32),
    }
    image = {"clip": {
        "input": rng.standard_normal((b, 1, 8)).astype(np.float32),
        "attention_mask": np.ones((b, 1), np.int32),
    }}
    ref = mm.ilf_apply(params, cfg, text, face, image,
                       deterministic=True).pooler_output
    canvas = tdata.pack_mm_text_inputs(
        {"text_inputs": text, "face_inputs": face, "image_inputs": image},
        16, needs_vis=False)
    assert "canvas_vis_rows" not in canvas
    out = mm.ilf_apply_packed(
        params, cfg,
        jnp.asarray(canvas["canvas_input_ids"]),
        jnp.asarray(canvas["canvas_segment_ids"]),
        jnp.asarray(canvas["canvas_position_ids"]),
        jnp.asarray(canvas["canvas_cls_rows"]),
        jnp.asarray(canvas["canvas_cls_cols"]),
        face, image, deterministic=True,
    )[:b]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ilf_remat_through_trainee(devices):
    """BiEncoderTrainee(remat_layers=True) passes remat_layers to the
    UNPACKED mm path too — ilf_apply previously had no such kwarg and
    crashed (round-3 review)."""
    from viquae_tpu.core import mesh as meshlib
    from viquae_tpu.train import objectives, trainee as trainee_lib

    cfg_kw = dict(
        bert=dict(vocab_size=60, hidden_size=16, num_hidden_layers=1,
                  num_attention_heads=2, intermediate_size=32,
                  max_position_embeddings=16, add_pooler=False),
        n_faces=1, face_dim=6, bbox_dim=7, image_dims={"clip": 8,
                                                       "imagenet": 9},
    )
    from viquae_tpu.models.mm import IntermediateLinearFusion

    be = trainee_lib.BiEncoderTrainee(
        IntermediateLinearFusion(**cfg_kw),
        IntermediateLinearFusion(**cfg_kw),
        remat_layers=True,
    )
    rng = np.random.default_rng(0)
    n = 4

    def side():
        return {
            "text_inputs": {
                "input_ids": jnp.asarray(
                    rng.integers(0, 60, (n, 8)), jnp.int32),
                "attention_mask": jnp.ones((n, 8), jnp.int32),
            },
            "face_inputs": {
                "face": jnp.asarray(
                    rng.standard_normal((n, 1, 1, 6)), jnp.float32),
                "bbox": jnp.asarray(
                    rng.standard_normal((n, 1, 1, 7)), jnp.float32),
                "attention_mask": jnp.ones((n, 1, 1), jnp.int32),
            },
            "image_inputs": {
                "clip": {"input": jnp.asarray(
                    rng.standard_normal((n, 1, 8)), jnp.float32),
                    "attention_mask": jnp.ones((n, 1), jnp.int32)},
                "imagenet": {"input": jnp.asarray(
                    rng.standard_normal((n, 1, 9)), jnp.float32),
                    "attention_mask": jnp.ones((n, 1), jnp.int32)},
            },
        }

    batch = {"question_inputs": side(), "context_inputs": side(),
             "labels": jnp.arange(n, dtype=jnp.int32)}
    # TRAINING mode (dropout active): exercises the per-site rng folding
    loss, _ = be.loss_fn(be.params, batch, jax.random.key(0),
                         deterministic=False)
    assert np.isfinite(float(loss))
