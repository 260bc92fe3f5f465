"""Config-driven training entry (the LightningCLI replacement).

One YAML/JSON config wires trainee + collator + optimizer + trainer,
mirroring `python -m meerqat.train.trainer fit --config=...`
(meerqat/train/trainer.py:30-38) on the framework's explicit SPMD loop:

.. code-block:: yaml

    seed: 42
    trainee:
      kind: biencoder           # biencoder | reader | reranker
      question_model: {class_name: DPREncoder, seed: 0}
      context_model:  {class_name: DPREncoder, seed: 1}
    data:
      tokenizer: /path/to/tokenizer-or-vocab-dir
      dataset: /path/to/questions     # needs *_provenance_indices columns
      kb: /path/to/passages
      M: 24
      batch_size: 8
    optimizer: {lr: 2.0e-5, warmup_steps: 100, total_steps: 1000}
    trainer:   {max_steps: 1000, ckpt_dir: ckpts, eval_every: 100,
                monitor: "MRR@N*M"}
    export: ckpts/export        # save_ptm output after fit
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Iterable, Optional

from viquae_tpu.core import mesh as meshlib
from viquae_tpu.core.config import instantiate_tree, load_config


def _build_tokenizer(spec):
    from transformers import AutoTokenizer, BertTokenizerFast

    path = Path(str(spec))
    if path.is_dir() and (path / "vocab.txt").exists():
        return BertTokenizerFast(vocab_file=str(path / "vocab.txt"))
    if path.suffix == ".txt":
        return BertTokenizerFast(vocab_file=str(path))
    return AutoTokenizer.from_pretrained(str(spec))


def _batches(dataset, collate_fn, batch_size: int, shuffle_seed=None):
    from viquae_tpu.train.prefetch import CollatorLoader

    return CollatorLoader(
        dataset, collate_fn, batch_size,
        shuffle=shuffle_seed is not None, seed=shuffle_seed or 0,
    )


def build_trainee(config: dict, tokenizer=None):
    from viquae_tpu.train import trainee as trainee_lib

    kind = config.pop("kind")
    if kind == "biencoder":
        question_model = instantiate_tree(config.pop("question_model"))
        context_model = (
            instantiate_tree(config.pop("context_model"))
            if "context_model" in config else None
        )
        return trainee_lib.BiEncoderTrainee(
            question_model, context_model, **config
        )
    if kind == "reader":
        from viquae_tpu.models import bert, qa
        import jax

        pretrained = config.pop("pretrained", None)
        fuse_ir_score = config.pop("fuse_ir_score", False)
        if pretrained is not None:
            # HF save_pretrained dir of a MultiPassageBERT /
            # BertForQuestionAnswering checkpoint (the reference inits the
            # ViQuAE reader from the released TriviaQA reader —
            # EXPERIMENTS.rst fine-tuning step; docs/RUNBOOK_EGRESS.md).
            # bert_config overrides still apply on top of the dir's config.
            from transformers import AutoConfig

            hf_cfg = AutoConfig.from_pretrained(str(pretrained))
            base = dataclasses.asdict(
                bert.BertConfig.from_hf(hf_cfg, add_pooler=False))
            base.update(config.pop("bert_config", {}))
            cfg = qa.ReaderConfig(bert=bert.BertConfig(**base),
                                  fuse_ir_score=fuse_ir_score)
            params, cfg = qa.params_from_pretrained_dir(pretrained, cfg)
            if fuse_ir_score and "score_proj_w" not in params:
                # fine-tuning the fused variant FROM a non-fused checkpoint
                import jax.numpy as jnp

                params["score_proj_w"] = jnp.ones((1, 1))
                params["score_proj_b"] = jnp.zeros((1,))
            config.pop("seed", None)
        else:
            bert_cfg = bert.BertConfig(
                **config.pop("bert_config", {}), add_pooler=False
            )
            cfg = qa.ReaderConfig(bert=bert_cfg, fuse_ir_score=fuse_ir_score)
            params = qa.init(jax.random.key(config.pop("seed", 0)), cfg)
        return trainee_lib.ReaderTrainee(
            cfg, params, tokenizer, **config
        )
    if kind == "crossmodal":
        text_model = instantiate_tree(config.pop("text_model"))
        vision_model = instantiate_tree(config.pop("vision_model"))
        return trainee_lib.CrossModalTrainee(text_model, vision_model,
                                             **config)
    if kind == "jcm":
        # JointMonoAndCrossModal (reference experiments/jcm/config.yaml):
        # weighted image-image + image-title similarities over CLIP towers
        text_model = instantiate_tree(config.pop("text_model"))
        vision_model = instantiate_tree(config.pop("vision_model"))
        return trainee_lib.JointMonoAndCrossModalTrainee(
            text_model, vision_model, **config
        )
    if kind == "reranker":
        from viquae_tpu.models import bert, rr
        import jax

        bert_cfg = bert.BertConfig(
            **config.pop("bert_config", {}), add_pooler=False
        )
        rr_cfg = rr.BertReRankerConfig(bert=bert_cfg)
        params = rr.bert_reranker_init(
            jax.random.key(config.pop("seed", 0)), rr_cfg
        )

        class _Model:
            def __init__(self):
                self.params = params

            def apply_fn(self, p, **kw):
                return rr.bert_reranker_apply(p, rr_cfg, **kw)

            def packed_apply_fn(self, p, *args, **kw):
                return rr.bert_reranker_apply_packed(p, rr_cfg, *args, **kw)

        return trainee_lib.ReRankerTrainee(_Model(), **config)
    raise ValueError(f"Unknown trainee kind {kind!r}")


def build_collator(config: dict, tokenizer, trainee_kind: str):
    from datasets import load_from_disk

    from viquae_tpu.train import data as tdata

    dataset = load_from_disk(str(config.pop("dataset")))
    eval_dataset = (
        load_from_disk(str(config.pop("eval_dataset")))
        if "eval_dataset" in config else None
    )
    kb = load_from_disk(str(config.pop("kb"))) if "kb" in config else None
    image_kb = (
        load_from_disk(str(config.pop("image_kb")))
        if "image_kb" in config else None
    )
    batch_size = config.pop("batch_size", 8)
    kind = config.pop(
        "collator", {"jcm": "crossmodal"}.get(trainee_kind, trainee_kind)
    )
    collator_cls = {
        "biencoder": tdata.BiEncoderCollator,
        "reader": tdata.ReaderCollator,
        "reranker": tdata.ReRankerCollator,
        "ict": tdata.ICTCollator,
        "crossmodal": tdata.CrossModalCollator,
    }[kind]
    collator = collator_cls(
        tokenizer, dataset=dataset, kb=kb, image_kb=image_kb, **config
    )
    return collator, dataset, eval_dataset, batch_size


def run_from_config(config_path, subcommand: str = "fit",
                    ckpt_path=None) -> dict:
    import jax

    from viquae_tpu.train import optim
    from viquae_tpu.train.trainer import Trainer, TrainerConfig

    config = load_config(config_path)
    if ckpt_path is not None:
        config["ckpt_path"] = ckpt_path
    seed = config.get("seed", 42)

    tokenizer = _build_tokenizer(config["data"].pop("tokenizer"))
    trainee_cfg = dict(config["trainee"])
    trainee_kind = trainee_cfg["kind"]
    trainee_cfg_had_pretrained = "pretrained" in trainee_cfg
    trainee = build_trainee(trainee_cfg, tokenizer=tokenizer)
    collator, dataset, eval_dataset, batch_size = build_collator(
        dict(config["data"]), tokenizer, trainee_kind
    )

    ctx = meshlib.make_mesh()
    params = trainee.params
    opt_cfg = dict(config.get("optimizer", {}))
    auto_freeze = getattr(trainee, "freeze_weights_regex", None)
    if auto_freeze is not None:
        # jcm/crossmodal trainees with learn_weights=False must freeze
        # their fusion weights even when the config sets no freeze_regex
        fr = auto_freeze()
        if fr:
            existing = opt_cfg.get("freeze_regex")
            opt_cfg["freeze_regex"] = (
                f"(?:{existing})|(?:{fr})" if existing else fr
            )
    tx = optim.make_optimizer(params, **opt_cfg)
    trainer_cfg = TrainerConfig(seed=seed, **config.get("trainer", {}))
    fit_resume = False
    if subcommand == "fit" and config.get("ckpt_path"):
        # reference parity: Lightning's `trainer fit --ckpt_path=...`
        # RESUMES training. Map onto the trainer's tested resume path:
        # restore the latest step under that dir and keep checkpointing
        # there (meerqat train docs; train/trainer.py fit(resume=True)).
        import dataclasses as _dc

        from viquae_tpu.train import checkpoint as ckpt_lib

        fit_dir = config["ckpt_path"]
        if trainer_cfg.ckpt_dir and trainer_cfg.ckpt_dir != fit_dir:
            raise ValueError(
                f"--ckpt-path {fit_dir!r} conflicts with "
                f"trainer.ckpt_dir {trainer_cfg.ckpt_dir!r}; resume uses "
                "one checkpoint dir")
        if not ckpt_lib.all_steps(fit_dir):
            raise ValueError(
                f"--ckpt-path {fit_dir!r} holds no checkpoint steps to "
                "resume from")
        trainer_cfg = _dc.replace(trainer_cfg, ckpt_dir=fit_dir)
        fit_resume = True
    collate_fn = collator.collate_fn
    if trainer_cfg.grad_accum > 1:
        # ALWAYS collate per-microbatch (data.microbatch_collate), packed
        # or not: packed canvases cannot be sliced (pointers go global),
        # and contrastive collators emit in-batch `labels` that index the
        # FULL batch's context rows — reshape-slicing those in the trainer
        # would silently train microbatches j>=1 against the wrong
        # positives. Per-microbatch collation keeps labels local.
        import dataclasses as _dc

        from viquae_tpu.train.data import microbatch_collate

        collate_fn = microbatch_collate(collate_fn, trainer_cfg.grad_accum)
        trainer_cfg = _dc.replace(trainer_cfg, microbatched=True)
    with meshlib.use(ctx):
        trainer = Trainer(
            trainee.loss_fn, params, tx, trainer_cfg, mesh_ctx=ctx,
            eval_fn=getattr(trainee, "eval_fn", None),
        )
        if subcommand == "fit":
            # eval_batches drives eval_every / monitor / early stopping /
            # best-checkpoint keeping — all shipped recipes set these, so
            # a dev split must actually be wired when configured
            eval_batches = None
            if eval_dataset is not None:
                eval_batches = lambda: _batches(  # noqa: E731
                    eval_dataset, collator.collate_fn, batch_size
                )
            elif trainer_cfg.eval_every:
                import warnings

                warnings.warn(
                    "trainer.eval_every is set but data.eval_dataset is "
                    "not: no eval/early-stop/best-checkpoint will run"
                )
            result = trainer.fit(
                _batches(dataset, collate_fn, batch_size,
                         shuffle_seed=seed),
                eval_batches=eval_batches,
                resume=fit_resume,
            )
            export = config.get("export")
            if export and hasattr(trainee, "export"):
                trainee.export(export, params=trainer.state["params"])
        elif subcommand == "test" and hasattr(trainee, "test"):
            # full test protocol (reader: metrics.json/predictions.json,
            # parity with the reference's `trainer test --ckpt_path=...`).
            # Restore order: explicit `ckpt_path` > ckpt_dir/best (the
            # monitor-kept checkpoint) > latest ckpt_dir step; a missing
            # checkpoint is an error — silently testing random-init params
            # would report garbage metrics as if they were the run's.
            from viquae_tpu.train import checkpoint as ckpt_lib

            ckpt_path = config.get("ckpt_path")
            if not ckpt_path and trainer_cfg.ckpt_dir:
                best = Path(trainer_cfg.ckpt_dir) / "best"
                if ckpt_lib.all_steps(best):
                    ckpt_path = best
                elif ckpt_lib.all_steps(trainer_cfg.ckpt_dir):
                    ckpt_path = trainer_cfg.ckpt_dir
            if ckpt_path:
                trainer.state, _ = ckpt_lib.restore_state(
                    ckpt_path, trainer.state)
            elif not trainee_cfg_had_pretrained:
                raise FileNotFoundError(
                    "train test: no checkpoint found (set `ckpt_path`, "
                    "populate trainer.ckpt_dir, or init the trainee from "
                    "`pretrained:`)"
                )
            log_dir = (config.get("export") or trainer_cfg.ckpt_dir
                       or ".")
            result = trainee.test(
                trainer.state["params"],
                _batches(dataset, collator.collate_fn, batch_size),
                log_dir,
            )
        else:
            result = trainer.evaluate(
                _batches(dataset, collator.collate_fn, batch_size)
            )
    print(result if isinstance(result, dict) else result)
    return result
