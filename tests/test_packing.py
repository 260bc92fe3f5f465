"""Sequence packing: packer invariants + packed-vs-unpacked forward parity.

The packed query path (ops/packing.py + models/dpr.apply_packed) must give
the SAME embedding for every question as the plain padded forward — the
block-diagonal segment attention and per-segment position ids make packing
invisible to the model.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from viquae_tpu.models import bert, dpr
from viquae_tpu.ops import packing


def make_seqs(rng, n, lo=4, hi=30):
    return [
        rng.integers(100, 900, size=rng.integers(lo, hi)).astype(np.int32)
        for _ in range(n)
    ]


class TestPacker:
    def test_shapes_and_roundtrip(self):
        rng = np.random.default_rng(0)
        seqs = make_seqs(rng, 17)
        p = packing.pack_token_sequences(seqs, row_len=32)
        assert p.input_ids.shape == p.segment_ids.shape == p.position_ids.shape
        assert p.input_ids.shape[1] == 32
        assert p.input_ids.shape[0] % 8 == 0
        assert p.n_seqs == 17
        # every sequence is recoverable at its cls position, in order
        for i, s in enumerate(seqs):
            r, c = p.cls_rows[i], p.cls_cols[i]
            np.testing.assert_array_equal(p.input_ids[r, c: c + len(s)], s)
            seg = p.segment_ids[r, c]
            assert seg > 0
            # contiguous segment of the right length
            assert (p.segment_ids[r] == seg).sum() == len(s)
            np.testing.assert_array_equal(
                p.position_ids[r, c: c + len(s)], np.arange(len(s))
            )

    def test_padding_zero_segment(self):
        rng = np.random.default_rng(1)
        p = packing.pack_token_sequences(make_seqs(rng, 9), row_len=24)
        total = sum(min(len(s), 24) for s in make_seqs(np.random.default_rng(1), 9))
        assert (p.segment_ids > 0).sum() == total
        assert packing.packing_efficiency(p) == pytest.approx(
            total / p.input_ids.size
        )

    def test_truncation(self):
        seqs = [np.arange(100, dtype=np.int32)]
        p = packing.pack_token_sequences(seqs, row_len=16)
        assert (p.segment_ids[0] > 0).sum() == 16

    def test_fixed_shapes(self):
        rng = np.random.default_rng(2)
        p = packing.pack_token_sequences(
            make_seqs(rng, 5), row_len=32, n_rows=16, n_cls=8
        )
        assert p.input_ids.shape == (16, 32)
        assert p.cls_rows.shape == (8,)
        with pytest.raises(ValueError):
            packing.pack_token_sequences(
                make_seqs(rng, 50), row_len=32, n_rows=2
            )
        with pytest.raises(ValueError):
            packing.pack_token_sequences(make_seqs(rng, 5), row_len=32, n_cls=3)

    def test_deterministic(self):
        rng = np.random.default_rng(3)
        seqs = make_seqs(rng, 20)
        a = packing.pack_token_sequences(seqs, row_len=48)
        b = packing.pack_token_sequences(seqs, row_len=48)
        np.testing.assert_array_equal(a.input_ids, b.input_ids)
        np.testing.assert_array_equal(a.cls_rows, b.cls_rows)

    def test_efficiency_beats_padding(self):
        rng = np.random.default_rng(4)
        seqs = make_seqs(rng, 64, lo=8, hi=28)
        p = packing.pack_token_sequences(seqs, row_len=64, pad_rows_to=1)
        # padded-to-64 density for these lengths is < 0.45
        assert packing.packing_efficiency(p) > 0.80


class TestPackedForwardParity:
    def test_packed_equals_padded_cls(self):
        cfg = dpr.DPRConfig(
            bert=bert.BertConfig(
                vocab_size=1000, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64,
                add_pooler=False,
            )
        )
        params = dpr.init(jax.random.key(0), cfg)
        rng = np.random.default_rng(5)
        seqs = make_seqs(rng, 13, lo=3, hi=20)
        row_len = 24

        # reference: each sequence alone, padded, plain attention mask
        ids = np.zeros((len(seqs), row_len), np.int32)
        mask = np.zeros((len(seqs), row_len), np.int32)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        ref = dpr.apply(
            params, cfg, jnp.asarray(ids), jnp.asarray(mask),
            deterministic=True,
        )["pooler_output"]

        p = packing.pack_token_sequences(seqs, row_len=row_len, n_cls=16)
        got = dpr.apply_packed(
            params, cfg,
            jnp.asarray(p.input_ids), jnp.asarray(p.segment_ids),
            jnp.asarray(p.position_ids),
            jnp.asarray(p.cls_rows), jnp.asarray(p.cls_cols),
            deterministic=True,
        )[: p.n_seqs]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


class TestPackedReader:
    def test_packed_reader_matches_padded(self):
        from viquae_tpu.models import qa

        cfg = qa.ReaderConfig(bert=bert.BertConfig(
            vocab_size=500, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, add_pooler=False,
        ))
        params = qa.init(jax.random.key(0), cfg)
        rng = np.random.default_rng(0)
        n, m, L = 2, 2, 40
        # (question, passage) pairs of varying total lengths with BERT A/B
        # token types
        seqs, types = [], []
        for _ in range(n * m):
            ql = rng.integers(4, 9)
            pl = rng.integers(10, 24)
            seqs.append(rng.integers(5, 500, ql + pl).astype(np.int32))
            types.append(np.concatenate([
                np.zeros(ql, np.int32), np.ones(pl, np.int32)
            ]))

        # padded reference
        ids = np.zeros((n * m, L), np.int32)
        mask = np.zeros((n * m, L), np.int32)
        tts = np.zeros((n * m, L), np.int32)
        for i, (s, t) in enumerate(zip(seqs, types)):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
            tts[i, : len(s)] = t
        ref = qa.reader_apply(
            params, cfg, jnp.asarray(ids), jnp.asarray(mask),
            token_type_ids=jnp.asarray(tts), m_passages=m,
            deterministic=True,
        )

        p = packing.pack_token_sequences(seqs, row_len=48)
        tt_canvas = packing.pack_parallel(p, types)
        g_idx, g_mask = packing.gather_indices(p, L)
        out = qa.reader_apply_packed(
            params, cfg,
            jnp.asarray(p.input_ids), jnp.asarray(p.segment_ids),
            jnp.asarray(p.position_ids), jnp.asarray(tt_canvas),
            jnp.asarray(g_idx), jnp.asarray(g_mask),
            m_passages=m, deterministic=True,
        )
        got_start = np.asarray(out.start_logits)
        ref_start = np.asarray(ref.start_logits)
        got_end = np.asarray(out.end_logits)
        ref_end = np.asarray(ref.end_logits)
        real = mask.astype(bool)
        np.testing.assert_allclose(got_start[real], ref_start[real],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got_end[real], ref_end[real],
                                   rtol=1e-4, atol=1e-4)
        # masked slots are large-negative (excluded from global softmax)
        assert np.all(got_start[~real] < -1e29)

    def test_packed_reader_loss_and_spans(self):
        from viquae_tpu.models import qa
        from viquae_tpu.train import optim

        cfg = qa.ReaderConfig(bert=bert.BertConfig(
            vocab_size=100, hidden_size=16, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=32, add_pooler=False,
        ))
        params = qa.init(jax.random.key(1), cfg)
        rng = np.random.default_rng(1)
        n, m, L = 2, 2, 16
        seqs = [rng.integers(5, 100, rng.integers(8, 14)).astype(np.int32)
                for _ in range(n * m)]
        p = packing.pack_token_sequences(seqs, row_len=32)
        tts = packing.pack_parallel(p, [np.zeros_like(s) for s in seqs])
        g_idx, g_mask = packing.gather_indices(p, L)
        sp = rng.integers(1, 6, (n * m, 2)).astype(np.int32)
        ep = sp + 1
        am = np.ones((n * m, 2), np.int32)
        out = qa.reader_apply_packed(
            params, cfg,
            jnp.asarray(p.input_ids), jnp.asarray(p.segment_ids),
            jnp.asarray(p.position_ids), jnp.asarray(tts),
            jnp.asarray(g_idx), jnp.asarray(g_mask),
            start_positions=jnp.asarray(sp), end_positions=jnp.asarray(ep),
            answer_mask=jnp.asarray(am), m_passages=m, deterministic=True,
        )
        assert np.isfinite(float(out.loss))
        start_p = np.exp(np.asarray(out.start_log_probs)).reshape(n, m, L)
        end_p = np.exp(np.asarray(out.end_log_probs)).reshape(n, m, L)
        spans = qa.get_best_spans(jnp.asarray(start_p), jnp.asarray(end_p))
        assert np.asarray(spans[0]).shape == (n,)


def test_native_packer_matches_python():
    """C++ FFD packer output is bit-identical to the pure-Python path."""
    import os
    from viquae_tpu.native.build import load_packer
    from viquae_tpu.ops.packing import _native_pack

    if load_packer() is None:
        pytest.skip("native packer unavailable")
    rng = np.random.default_rng(7)
    for case in range(5):
        seqs = make_seqs(rng, int(rng.integers(3, 60)), lo=2, hi=40)
        for kwargs in ({}, {"n_rows": 64, "n_cls": 80},
                       {"pad_rows_to": 1}, {"pad_token_id": 9}):
            native = packing.pack_token_sequences(seqs, row_len=32, **kwargs)
            os.environ["VIQUAE_NO_NATIVE"] = "1"
            try:
                pure = packing.pack_token_sequences(seqs, row_len=32, **kwargs)
            finally:
                del os.environ["VIQUAE_NO_NATIVE"]
            for field in ("input_ids", "segment_ids", "position_ids",
                          "cls_rows", "cls_cols"):
                np.testing.assert_array_equal(
                    getattr(native, field), getattr(pure, field), err_msg=field
                )
            assert native.n_seqs == pure.n_seqs


# --------------------------------------------------------------------------
# packed multimodal (ECA) forward
# --------------------------------------------------------------------------
def _mm_batch(seed, b, exclusive=False, n_faces=2):
    import numpy as np
    rng = np.random.default_rng(seed)
    lens = rng.integers(3, 14, b)
    ids = np.zeros((b, 16), np.int32)
    mask = np.zeros((b, 16), np.int32)
    for i, l in enumerate(lens):
        ids[i, :l] = rng.integers(1, 90, l)
        mask[i, :l] = 1
    face = rng.standard_normal((b, 1, n_faces, 6)).astype(np.float32)
    bbox = rng.standard_normal((b, 1, n_faces, 7)).astype(np.float32)
    face_mask = (rng.random((b, 1, n_faces)) < 0.6).astype(np.int32)
    img = rng.standard_normal((b, 1, 8)).astype(np.float32)
    img_mask = (rng.random((b, 1)) < 0.7).astype(np.int32)
    return {
        "text_inputs": {"input_ids": ids, "attention_mask": mask},
        "face_inputs": {"face": face, "bbox": bbox,
                        "attention_mask": face_mask},
        "image_inputs": {"clip": {"input": img, "attention_mask": img_mask}},
    }


@pytest.mark.parametrize("exclusive", [False, True])
def test_eca_packed_matches_padded(exclusive):
    from viquae_tpu.models import bert as bert_lib
    from viquae_tpu.models import mm
    from viquae_tpu.train import data as tdata

    cfg = mm.MMConfig(
        bert=bert_lib.BertConfig(
            vocab_size=100, hidden_size=24, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=48,
            max_position_embeddings=40, add_pooler=False,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        ),
        n_faces=2, face_dim=6, bbox_dim=7, image_dims=(("clip", 8),),
        face_and_image_are_exclusive=exclusive,
    )
    params = mm.eca_init(jax.random.key(3), cfg)
    batch = _mm_batch(11, b=9, exclusive=exclusive)

    ref = mm.eca_apply(
        params, cfg, batch["text_inputs"], batch["face_inputs"],
        batch["image_inputs"], deterministic=True,
    ).pooler_output

    t_vis = tdata.mm_visual_mask(
        batch["face_inputs"], batch["image_inputs"]).shape[1]
    canvas = tdata.pack_mm_text_inputs(
        batch, 16 + t_vis, face_and_image_are_exclusive=exclusive)
    out = mm.eca_apply_packed(
        params, cfg,
        jnp.asarray(canvas["canvas_input_ids"]),
        jnp.asarray(canvas["canvas_segment_ids"]),
        jnp.asarray(canvas["canvas_position_ids"]),
        jnp.asarray(canvas["canvas_cls_rows"]),
        jnp.asarray(canvas["canvas_cls_cols"]),
        jnp.asarray(canvas["canvas_vis_rows"]),
        jnp.asarray(canvas["canvas_vis_cols"]),
        batch["face_inputs"], batch["image_inputs"],
        deterministic=True,
    )[:9]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_packing_invariants_fuzz(seed):
    """Structural invariants of the packer across random workloads:
    every sequence lands contiguously in one row, CLS pointers address its
    first token, segments are disjoint, reserved slots share the segment,
    and gather_indices reconstructs each sequence."""
    from viquae_tpu.ops import packing

    rng = np.random.default_rng(seed)
    row_len = int(rng.integers(16, 65))
    n_res = int(rng.integers(0, 5))
    n = int(rng.integers(1, 40))
    seqs = [
        rng.integers(1, 1000, rng.integers(1, row_len + 10)).astype(np.int32)
        for _ in range(n)
    ]
    if n_res:
        p, rr, rc = packing.pack_with_reserved(
            seqs, n_res, row_len=row_len)
        trimmed = [s[: row_len - n_res] for s in seqs]
    else:
        p = packing.pack_token_sequences(seqs, row_len=row_len)
        trimmed = [s[:row_len] for s in seqs]

    assert p.n_seqs == n
    seg_seen = set()
    for i, s in enumerate(trimmed):
        r, c = int(p.cls_rows[i]), int(p.cls_cols[i])
        np.testing.assert_array_equal(p.input_ids[r, c: c + len(s)], s)
        seg = p.segment_ids[r, c]
        assert seg > 0
        total = len(s) + n_res
        assert (p.segment_ids[r, c: c + total] == seg).all()
        # positions restart per segment
        np.testing.assert_array_equal(
            p.position_ids[r, c: c + total], np.arange(total))
        assert (r, seg) not in seg_seen
        seg_seen.add((r, seg))
        if n_res:
            assert (rr[i] == r).all()
            np.testing.assert_array_equal(
                rc[i], np.arange(c + len(s), c + total))
    # padding slots carry segment 0
    covered = np.zeros_like(p.segment_ids, dtype=bool)
    for i, s in enumerate(trimmed):
        r, c = int(p.cls_rows[i]), int(p.cls_cols[i])
        covered[r, c: c + len(s) + n_res] = True
    assert (p.segment_ids[~covered] == 0).all()

    if not n_res:
        out_len = row_len
        g_idx, g_mask = packing.gather_indices(p, out_len)
        flat = p.input_ids.reshape(-1)
        for i, s in enumerate(trimmed):
            got = flat[g_idx[i]] * g_mask[i]
            np.testing.assert_array_equal(got[: len(s)], s)
            assert (g_mask[i][len(s):] == 0).all()


def test_pack_rejects_empty_sequences():
    """A zero-length sequence would silently corrupt the CLS pointers and
    pack_parallel bookkeeping; the packer rejects it loudly."""
    import pytest

    from viquae_tpu.ops import packing

    with pytest.raises(ValueError, match="empty sequence at position 1"):
        packing.pack_token_sequences(
            [np.array([1, 2], np.int32), np.array([], np.int32)],
            row_len=8)
