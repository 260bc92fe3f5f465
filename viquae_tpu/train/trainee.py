"""Trainees: model + objective + eval bundles (parity meerqat/train/trainee.py).

Each trainee exposes the interface the :class:`viquae_tpu.train.trainer.Trainer`
consumes — ``params``, ``loss_fn(params, batch, rng)``, ``eval_fn(outputs)``
— plus ``export(dir)`` implementing the save_ptm inter-stage contract
(split question/context encoder export, train/trainee.py:470-487 +
save_ptm.py:22-31).

- :class:`BiEncoderTrainee`    <- BiEncoder (:376-487)
- :class:`CrossModalTrainee`   <- CrossModal CLIP contrastive (:199-231)
- :class:`JointBiEncoderAndClipTrainee` <- (:490-626)
- :class:`ReRankerTrainee`     <- ReRanker (:631-694)
- :class:`ReaderTrainee`       <- Reader (:707-852) incl. span decoding,
  squad-per-question eval, weighted-by-IR-score predictions, M_tuning, and
  metrics.json/predictions.json emission.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from viquae_tpu.models import bert, dpr
from viquae_tpu.train import checkpoint as ckpt_lib
from viquae_tpu.train import metrics as tmetrics
from viquae_tpu.train import objectives


def _text_kwargs(inputs: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    text = inputs.get("text_inputs", inputs)
    out = {
        "input_ids": text["input_ids"],
        "attention_mask": text.get("attention_mask"),
    }
    if "token_type_ids" in text:
        out["token_type_ids"] = text["token_type_ids"]
    return out


def _moe_experts(model) -> int:
    """BertConfig.moe_experts of a trainee encoder adapter (0 = dense)."""
    cfg = getattr(model, "cfg", None)
    bcfg = getattr(cfg, "bert", None)
    return getattr(bcfg, "moe_experts", 0) or 0


class BiEncoderTrainee:
    """DPR-style dual tower with global in-batch negatives."""

    def __init__(self, question_model, context_model=None,
                 shared_encoders: bool = False,
                 remat_layers: bool = False,
                 moe_aux_weight: float = 0.01):
        """question_model/context_model: objects with .cfg, .params and an
        apply(params, **text_kwargs) -> {"pooler_output"} callable — e.g.
        models.dpr.DPREncoder, or any multimodal encoder adapter.

        remat_layers=True checkpoints each transformer layer (the
        reference's `gradient_checkpointing: true` recipes —
        experiments/ict/eca/config.yaml).

        moe_aux_weight scales the MoE load-balance aux added to the task
        loss when an encoder has BertConfig.moe_experts > 0 (Switch
        Transformer's default 1e-2) — dropping it collapses experts, so
        the encoders surface it through every apply path (ops/moe.py)."""
        self.question_model = question_model
        self.shared_encoders = shared_encoders or context_model is None
        self.context_model = question_model if self.shared_encoders else context_model
        self.remat_layers = remat_layers
        self.moe_aux_weight = moe_aux_weight

    @property
    def params(self):
        if self.shared_encoders:
            return {"question": self.question_model.params}
        return {
            "question": self.question_model.params,
            "context": self.context_model.params,
        }

    def _encode(self, params, model, inputs, rng, deterministic):
        """Returns (embeddings, moe_aux) — moe_aux is None for dense
        encoders and the summed load-balance term for MoE configs."""
        packed_apply = getattr(model, "packed_apply_fn", None)
        remat_kw = {"remat_layers": True} if self.remat_layers else {}
        # packed applies return raw embedding arrays; the aux channel is
        # opt-in (return_aux) so dense paths keep their array contract
        moe = _moe_experts(model) > 0
        packed_kw = dict(remat_kw, return_aux=True) if moe else remat_kw

        def packed_out(res):
            return res if moe else (res, None)

        if "face_inputs" in inputs:
            # multimodal encoder inputs ({"text_inputs", "face_inputs",
            # "image_inputs"}) — e.g. an mm.ECAEncoder bundle
            text = inputs["text_inputs"]
            if "canvas_input_ids" in text and packed_apply is not None:
                # packed mm canvas from ICTCollator/BiEncoderCollator
                # (packed=True): eca_apply_packed takes the visual-slot
                # pointers; ilf_apply_packed has no reserved slots
                canvas = (
                    text["canvas_input_ids"], text["canvas_segment_ids"],
                    text["canvas_position_ids"],
                    text["canvas_cls_rows"], text["canvas_cls_cols"],
                )
                if "canvas_vis_rows" in text:
                    canvas = canvas + (
                        text["canvas_vis_rows"], text["canvas_vis_cols"],
                    )
                return packed_out(packed_apply(
                    params, *canvas,
                    inputs["face_inputs"], inputs.get("image_inputs"),
                    deterministic=deterministic, rng=rng, **packed_kw,
                ))
            out = model.apply_fn(
                params, _text_kwargs(inputs), inputs["face_inputs"],
                inputs.get("image_inputs"),
                deterministic=deterministic, rng=rng, **remat_kw,
            )
            return out.pooler_output, getattr(out, "moe_aux", None)
        if "canvas_input_ids" in inputs and packed_apply is not None:
            # packed canvas from BiEncoderCollator(packed=True)
            return packed_out(packed_apply(
                params,
                inputs["canvas_input_ids"], inputs["canvas_segment_ids"],
                inputs["canvas_position_ids"],
                inputs["canvas_cls_rows"], inputs["canvas_cls_cols"],
                deterministic=deterministic, rng=rng, **packed_kw,
            ))
        out = model.apply_fn(
            params, **_text_kwargs(inputs),
            deterministic=deterministic, rng=rng, **remat_kw,
        )
        return out["pooler_output"], out.get("moe_aux")

    def _moe_aux_total(self, *aux_terms):
        """Sum the non-None load-balance terms, scaled; None if all dense."""
        live = [a for a in aux_terms if a is not None]
        if not live:
            return None
        return self.moe_aux_weight * sum(live)

    def loss_fn(self, params, batch, rng, deterministic: bool = False):
        rq, rc = jax.random.split(rng)
        ctx_params = params.get("context", params["question"])
        q, aux_q = self._encode(
            params["question"], self.question_model,
            batch["question_inputs"], rq, deterministic,
        )
        c, aux_c = self._encode(
            ctx_params, self.context_model,
            batch["context_inputs"], rc, deterministic,
        )
        loss, outputs = objectives.biencoder_loss(q, c, batch["labels"])
        aux = self._moe_aux_total(aux_q, aux_c)
        if aux is not None:
            loss = loss + aux
            outputs["moe_aux"] = aux
        return loss, outputs

    def eval_fn(self, outputs: List[dict]) -> Dict[str, float]:
        batch_metrics = [
            tmetrics.batch_retrieval(
                np.asarray(o["log_probs"]), np.asarray(o["labels"])
            )
            for o in outputs
        ]
        return tmetrics.accumulate_batch_metrics(batch_metrics)

    def export(self, path, params=None, hf: bool = False):
        """Split-export question/context towers (save_ptm contract).

        With hf=True also writes HF-loadable BertModel dirs (the reference's
        save_ptm --bert behavior of exporting bare BERT weights)."""
        params = params or self.params
        path = Path(path)
        ckpt_lib.export_params(path / "question_model", params["question"])
        if not self.shared_encoders:
            ckpt_lib.export_params(path / "context_model", params["context"])
        if hf:
            q_cfg = self.question_model.cfg.bert
            bert.save_pretrained_hf(
                params["question"], q_cfg, path / "question_model_hf"
            )
            if not self.shared_encoders:
                bert.save_pretrained_hf(
                    params["context"], self.context_model.cfg.bert,
                    path / "context_model_hf",
                )


class CrossModalTrainee:
    """CLIP-style symmetric contrastive training (text <-> image)."""

    def __init__(self, text_model, vision_model, logit_scale_init: float = 2.6592):
        self.text_model = text_model
        self.vision_model = vision_model
        self.logit_scale_init = logit_scale_init

    @property
    def params(self):
        return {
            "text": self.text_model.params,
            "vision": self.vision_model.params,
            "logit_scale": jnp.asarray(self.logit_scale_init),
        }

    def loss_fn(self, params, batch, rng, deterministic: bool = False):
        from viquae_tpu.models.clip import l2norm

        text = self.text_model.apply_fn(
            params["text"], **_text_kwargs(batch["text_inputs"])
        )["text_embeds"]
        image = self.vision_model.apply_fn(
            params["vision"], batch["pixel_values"]
        )["image_embeds"]
        return objectives.clip_contrastive_loss(
            l2norm(text), l2norm(image), jnp.exp(params["logit_scale"])
        )

    def eval_fn(self, outputs):
        batch_metrics = []
        for o in outputs:
            logits = np.asarray(o["logits"])
            labels = np.arange(len(logits))
            batch_metrics.append(tmetrics.batch_retrieval(logits, labels))
        return tmetrics.accumulate_batch_metrics(batch_metrics)


class JointMonoAndCrossModalTrainee:
    """CLIP trained with weighted image-image + image-title similarities
    (trainee.py:234-338): asymmetric NLL over
    image_weight * (q_img @ c_img.T) + cm_weight * (q_img @ c_title.T)."""

    def __init__(self, clip_text_model, clip_vision_model,
                 image_weight: float = 0.5, cm_weight: float = 0.5,
                 learn_weights: bool = False, logit_scale_init: float = 2.6592):
        self.text_model = clip_text_model
        self.vision_model = clip_vision_model
        self._weights_init = (image_weight, cm_weight)
        self.learn_weights = learn_weights
        self.logit_scale_init = logit_scale_init

    @property
    def params(self):
        iw, cw = self._weights_init
        return {
            "text": self.text_model.params,
            "vision": self.vision_model.params,
            "image_weight": jnp.asarray([iw]),
            "cm_weight": jnp.asarray([cw]),
            "logit_scale": jnp.asarray(self.logit_scale_init),
        }

    def freeze_weights_regex(self):
        if self.learn_weights:
            return None
        return r"(image_weight|cm_weight)"

    def loss_fn(self, params, batch, rng, deterministic: bool = False):
        from viquae_tpu.models.clip import l2norm

        q_img = l2norm(self.vision_model.apply_fn(
            params["vision"], batch["pixel_values"]
        )["image_embeds"])
        c_img = l2norm(self.vision_model.apply_fn(
            params["vision"], batch["paired_pixel_values"]
        )["image_embeds"])
        titles = l2norm(self.text_model.apply_fn(
            params["text"], **_text_kwargs(batch["text_inputs"])
        )["text_embeds"])
        scale = jnp.exp(params["logit_scale"])
        image_sim = scale * (q_img @ c_img.T)
        cm_sim = scale * (q_img @ titles.T)
        similarities = (
            params["image_weight"] * image_sim + params["cm_weight"] * cm_sim
        )
        loss, log_probs = objectives._nll_from_similarities(
            similarities, batch["labels"]
        )
        return loss, {
            "log_probs": log_probs,
            "labels": batch["labels"],
            "image_similarities": image_sim,
            "cm_similarities": cm_sim,
        }

    def eval_fn(self, outputs):
        metrics = tmetrics.accumulate_batch_metrics([
            tmetrics.batch_retrieval(
                np.asarray(o["log_probs"]), np.asarray(o["labels"])
            )
            for o in outputs
        ])
        for model in ("image", "cm"):
            sub = tmetrics.accumulate_batch_metrics([
                tmetrics.batch_retrieval(
                    np.asarray(o[f"{model}_similarities"]),
                    np.asarray(o["labels"]),
                )
                for o in outputs
            ])
            metrics.update({f"{model}_{k}": v for k, v in sub.items()})
        return metrics

    def export(self, path, params=None):
        import json as _json

        params = params or self.params
        ckpt_lib.export_params(Path(path), {
            "text": params["text"], "vision": params["vision"],
        })
        scale = float(np.exp(np.asarray(params["logit_scale"])))
        (Path(path) / "mm_weights.json").write_text(_json.dumps({
            "image_weight": float(np.asarray(params["image_weight"])[0]) * scale,
            "cm_weight": float(np.asarray(params["cm_weight"])[0]) * scale,
        }))


class JointBiEncoderAndClipTrainee(BiEncoderTrainee):
    """3-way similarity: text-text + image-image + image-title
    (trainee.py:490-626), with learnable weights/temperature."""

    def __init__(self, question_model, context_model, clip_text_model,
                 clip_vision_model, question_weight=1 / 3, image_weight=1 / 3,
                 cm_weight=1 / 3, learn_weights: bool = False):
        super().__init__(question_model, context_model)
        self.clip_text_model = clip_text_model
        self.clip_vision_model = clip_vision_model
        self._weights_init = (question_weight, image_weight, cm_weight)
        self.learn_weights = learn_weights

    @property
    def params(self):
        qw, iw, cw = self._weights_init
        return {
            **super().params,
            "clip_text": self.clip_text_model.params,
            "clip_vision": self.clip_vision_model.params,
            "question_weight": jnp.asarray([qw]),
            "image_weight": jnp.asarray([iw]),
            "cm_weight": jnp.asarray([cw]),
            "temperature": jnp.asarray([1.0]),
        }

    def loss_fn(self, params, batch, rng, deterministic: bool = False):
        rq, rc = jax.random.split(rng)
        q, aux_q = self._encode(
            params["question"], self.question_model,
            batch["question_inputs"], rq, deterministic,
        )
        c, aux_c = self._encode(
            params.get("context", params["question"]),
            self.context_model,
            batch["context_inputs"], rc, deterministic,
        )
        q_img = self.clip_vision_model.apply_fn(
            params["clip_vision"], batch["question_pixel_values"]
        )["image_embeds"]
        c_img = self.clip_vision_model.apply_fn(
            params["clip_vision"], batch["context_pixel_values"]
        )["image_embeds"]
        titles = self.clip_text_model.apply_fn(
            params["clip_text"], **_text_kwargs(
                batch["context_inputs"]["titles"]
            )
        )["text_embeds"]
        loss, outputs = objectives.joint_mono_cross_modal_loss(
            q, c, q_img, c_img, titles, batch["labels"],
            params["question_weight"], params["image_weight"],
            params["cm_weight"], params["temperature"],
        )
        aux = self._moe_aux_total(aux_q, aux_c)
        if aux is not None:
            loss = loss + aux
            outputs["moe_aux"] = aux
        return loss, outputs

    def freeze_weights_regex(self) -> Optional[str]:
        """Regex freezing the fusion weights unless learn_weights."""
        if self.learn_weights:
            return None
        return r"(question_weight|image_weight|cm_weight|temperature)"


class ReRankerTrainee:
    def __init__(self, model, m_passages: int = 24,
                 moe_aux_weight: float = 0.01):
        self.model = model
        self.M = m_passages
        self.moe_aux_weight = moe_aux_weight

    @property
    def params(self):
        return self.model.params

    def loss_fn(self, params, batch, rng, deterministic: bool = False):
        packed_apply = getattr(self.model, "packed_apply_fn", None)
        if "canvas_input_ids" in batch and packed_apply is not None:
            # packed canvas from ReRankerCollator(packed=True)
            out = packed_apply(
                params,
                batch["canvas_input_ids"], batch["canvas_segment_ids"],
                batch["canvas_position_ids"],
                batch["canvas_token_type_ids"],
                batch["canvas_cls_rows"], batch["canvas_cls_cols"],
                deterministic=deterministic, rng=rng,
            )
        else:
            out = self.model.apply_fn(
                params, **_text_kwargs(batch), deterministic=deterministic,
                rng=rng,
            )
        logits = out.logits.reshape(-1, self.M)
        loss, log_probs = objectives.reranker_loss(logits, batch["labels"])
        outputs = {"log_probs": log_probs, "labels": batch["labels"],
                   "logits": logits}
        if out.moe_aux is not None:
            aux = self.moe_aux_weight * out.moe_aux
            loss = loss + aux
            outputs["moe_aux"] = aux
        return loss, outputs

    def eval_fn(self, outputs):
        batch_metrics = [
            tmetrics.batch_retrieval(
                np.asarray(o["log_probs"]), np.asarray(o["labels"])
            )
            for o in outputs
        ]
        return tmetrics.accumulate_batch_metrics(batch_metrics)


def power_range(maximum: int):
    """1, 2, 4, ... up to maximum (inclusive cap) — trainee.py:694-704."""
    i = 0
    while True:
        p = min(2 ** i, maximum)
        yield p
        if p >= maximum:
            break
        i += 1


class ReaderTrainee:
    """Multi-passage extractive reader training + eval."""

    def __init__(self, cfg, params, tokenizer, m_passages: int = 24,
                 tune_M: bool = False, moe_aux_weight: float = 0.01):
        from viquae_tpu.models import qa

        self.qa = qa
        self.cfg = cfg
        self._params = params
        self.tokenizer = tokenizer
        self.M = m_passages
        self.tune_M = tune_M
        self.moe_aux_weight = moe_aux_weight

    @property
    def params(self):
        return self._params

    def loss_fn(self, params, batch, rng, deterministic: bool = False):
        common = dict(
            passage_scores=batch.get("passage_scores")
            if self.cfg.fuse_ir_score else None,
            start_positions=batch["start_positions"],
            end_positions=batch["end_positions"],
            answer_mask=batch["answer_mask"],
            m_passages=self.M,
            deterministic=deterministic,
            rng=rng,
        )
        if "canvas_input_ids" in batch:
            # packed canvas from ReaderCollator(packed=True): ~2x fewer
            # encoder FLOPs at the reference's real pair lengths
            out = self.qa.reader_apply_packed(
                params, self.cfg,
                batch["canvas_input_ids"], batch["canvas_segment_ids"],
                batch["canvas_position_ids"], batch["canvas_token_type_ids"],
                batch["gather_idx"], batch["gather_mask"],
                **common,
            )
        else:
            out = self.qa.reader_apply(
                params, self.cfg,
                batch["input_ids"],
                attention_mask=batch.get("attention_mask"),
                token_type_ids=batch.get("token_type_ids"),
                **common,
            )
        loss = out.loss
        outputs = {
            "start_log_probs": out.start_log_probs,
            "end_log_probs": out.end_log_probs,
        }
        if out.moe_aux is not None:
            aux = self.moe_aux_weight * out.moe_aux
            loss = loss + aux
            outputs["moe_aux"] = aux
        return loss, outputs

    # ---- evaluation ---------------------------------------------------
    def eval_fn(self, outputs: List[dict], batches: List[dict]
                ) -> Dict[str, float]:
        """Fit-time eval hook (Trainer.evaluate 2-arg contract): span log
        probs from the jitted loss aux + host batches -> mean EM/F1, so
        the rc recipes' `monitor: f1` actually has a metric to watch."""
        em: List[float] = []
        f1: List[float] = []
        for aux, batch in zip(outputs, batches):
            m = self.M
            ids = np.asarray(batch["input_ids"])
            n, length = ids.shape[0] // m, ids.shape[1]
            start_lp = np.asarray(aux["start_log_probs"]).reshape(
                n * m, length)
            end_lp = np.asarray(aux["end_log_probs"]).reshape(n * m, length)
            predictions = self.qa.log_probs_to_answers(
                start_lp, end_lp, ids.reshape(n, m, length),
                self.tokenizer, m,
            )
            answer_strings = [
                batch["answer_strings"][i] for i in range(0, n * m, m)
            ]
            per_q = tmetrics.squad_per_question(predictions, answer_strings)
            em.extend(per_q["exact_match"])
            f1.extend(per_q["f1"])
        return {
            "exact_match": float(np.mean(em)) if em else 0.0,
            "f1": float(np.mean(f1)) if f1 else 0.0,
        }

    def eval_batch(self, params, batch) -> dict:
        loss, aux = self.loss_fn(params, batch, jax.random.key(0),
                                 deterministic=True)
        m, length = self.M, batch["input_ids"].shape[1]
        n = batch["input_ids"].shape[0] // m
        input_ids = np.asarray(batch["input_ids"]).reshape(n, m, length)
        answer_strings = [
            batch["answer_strings"][i] for i in range(0, n * m, m)
        ]
        start_lp = np.asarray(aux["start_log_probs"]).reshape(n, m, length)
        end_lp = np.asarray(aux["end_log_probs"]).reshape(n, m, length)
        predictions = self.qa.log_probs_to_answers(
            start_lp.reshape(n * m, length), end_lp.reshape(n * m, length),
            input_ids, self.tokenizer, m,
        )
        metrics = tmetrics.squad_per_question(predictions, answer_strings)
        out = {
            "loss": float(loss),
            "metrics": metrics,
            "predictions": predictions,
            "weighted_metrics": None,
            "weighted_predictions": None,
            "answer_strings": answer_strings,
            "input_ids": input_ids,
            "start_log_probs": start_lp,
            "end_log_probs": end_lp,
            "passage_scores": None,
        }
        passage_scores = batch.get("passage_scores")
        if passage_scores is not None and not self.cfg.fuse_ir_score:
            out["passage_scores"] = np.asarray(passage_scores).reshape(n, m)
            weights = jnp.asarray(out["passage_scores"])
            weighted = self.qa.log_probs_to_answers(
                start_lp.reshape(n * m, length),
                end_lp.reshape(n * m, length),
                input_ids, self.tokenizer, m, weights=weights,
            )
            out["weighted_predictions"] = weighted
            out["weighted_metrics"] = tmetrics.squad_per_question(
                weighted, answer_strings
            )
        return out

    def eval_epoch_end(self, eval_outputs: List[dict]) -> dict:
        metrics = {"exact_match": [], "f1": [],
                   "weighted_exact_match": [], "weighted_f1": []}
        predictions, weighted = [], []
        for o in eval_outputs:
            for k, v in o["metrics"].items():
                metrics[k].extend(v)
            predictions.extend(o["predictions"])
            if o["weighted_metrics"] is not None:
                for k, v in o["weighted_metrics"].items():
                    metrics["weighted_" + k].extend(v)
                weighted.extend(o["weighted_predictions"])
        agg = {
            k: (sum(v) / len(v) if v else None) for k, v in metrics.items()
        }
        return {"metrics": agg, "predictions": predictions,
                "weighted_predictions": weighted}

    def test(self, params, eval_batches, log_dir) -> dict:
        """Full test pass emitting metrics.json / predictions.json
        (trainee.py:810-824)."""
        outputs = [self.eval_batch(params, b) for b in eval_batches]
        result = self.eval_epoch_end(outputs)
        log_dir = Path(log_dir)
        log_dir.mkdir(parents=True, exist_ok=True)
        (log_dir / "metrics.json").write_text(json.dumps(result["metrics"]))
        (log_dir / "predictions.json").write_text(
            json.dumps(result["predictions"])
        )
        if result["weighted_predictions"]:
            (log_dir / "weighted_predictions.json").write_text(
                json.dumps(result["weighted_predictions"])
            )
        if self.tune_M:
            result["metrics_wrt_m"] = self.m_tuning(outputs, log_dir)
        return result

    def m_tuning(self, eval_outputs: List[dict], log_dir=None) -> List[dict]:
        """Sweep M in powers of two and re-extract answers from the cached
        log-probs (trainee.py:826-847); returns metrics per M, best-F1 first
        written to metrics_wrt_m.json."""
        input_ids = np.concatenate([o["input_ids"] for o in eval_outputs])
        start_lp = np.concatenate([o["start_log_probs"] for o in eval_outputs])
        end_lp = np.concatenate([o["end_log_probs"] for o in eval_outputs])
        answers = sum((o["answer_strings"] for o in eval_outputs), [])
        scores = (
            np.concatenate([o["passage_scores"] for o in eval_outputs])
            if eval_outputs[0]["passage_scores"] is not None else None
        )
        n, M, length = input_ids.shape
        metrics_wrt_m = []
        for m in power_range(M):
            ids_m = input_ids[:, :m]
            preds = self.qa.log_probs_to_answers(
                start_lp[:, :m].reshape(n * m, length),
                end_lp[:, :m].reshape(n * m, length),
                ids_m, self.tokenizer, m,
            )
            metrics = tmetrics.squad(preds, answers)
            metrics["@M"] = m
            if scores is not None:
                weighted = self.qa.log_probs_to_answers(
                    start_lp[:, :m].reshape(n * m, length),
                    end_lp[:, :m].reshape(n * m, length),
                    ids_m, self.tokenizer, m,
                    weights=jnp.asarray(scores[:, :m]),
                )
                for k, v in tmetrics.squad(weighted, answers).items():
                    metrics["weighted_" + k] = v
            metrics_wrt_m.append(metrics)
        if log_dir is not None:
            (Path(log_dir) / "metrics_wrt_m.json").write_text(
                json.dumps(metrics_wrt_m)
            )
        return metrics_wrt_m

    def export(self, path, params=None):
        ckpt_lib.export_params(path, params or self._params)
