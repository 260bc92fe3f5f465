"""Command-line surface: ``python -m viquae_tpu <command> ...``.

Mirrors the reference's script layer (docopt scripts under `python -m
meerqat.*`) with one argparse dispatcher over the same JSON/YAML
kwargs-tree configs:

  passages   <- meerqat.data.loading passages (passage splitting)
  mapping    <- meerqat.data.loading map (title2index / article2passage)
  relevant   <- meerqat.ir.metrics relevant (provenance qrels)
  embed      <- meerqat.ir.embedding (text embedding stage)
  embed-image<- meerqat.image.embedding
  resize     <- meerqat.image.resize
  faces      <- meerqat.image.face_detection
  face-embed <- meerqat.image.face_recognition
  search     <- meerqat.ir.search
  fuse       <- meerqat.ir.fuse (fit/test)
  hp         <- meerqat.ir.hp (bm25 grid search)
  train      <- meerqat.train.trainer (fit/test via config)
  stats      <- meerqat.viz.stats

plus the data-construction / viz / export / interactive surfaces registered
from `viquae_tpu.cli_aux` (kilt2vqa, wikidump, wit, labelstudio, mscelebs,
evqa, infoseek, html, plot, wtl-filter, save-ptm, interact).
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

from viquae_tpu.core.config import load_config


def _add_config_arg(p):
    p.add_argument("--config", type=str, help="JSON/YAML kwargs-tree")


def _add_config_positional(p):
    """Positional config that can also be given as --config (both styles
    appear in the reference's docopt scripts; accepting both avoids the
    per-subcommand guessing game)."""
    p.add_argument("config", nargs="?", default=None,
                   help="JSON/YAML kwargs-tree (also accepted as --config)")
    p.add_argument("--config", dest="config_opt", default=None,
                   help=argparse.SUPPRESS)


def cmd_passages(args):
    from viquae_tpu.data.loading import make_passage_dataset

    kwargs = load_config(args.config) if args.config else {}
    if kwargs.get("method") == "uniform":
        from transformers import AutoTokenizer

        kwargs["tokenizer"] = AutoTokenizer.from_pretrained(
            kwargs.pop("tokenizer_name", "bert-base-uncased")
        )
    out = make_passage_dataset(args.input, args.output, **kwargs)
    print(out)


def cmd_mapping(args):
    from viquae_tpu.data.loading import make_mapping_dataset

    make_mapping_dataset(
        args.dataset, args.key, args.save_name,
        inverse=args.inverse, one2many=args.one2many,
    )


def cmd_relevant(args):
    from viquae_tpu.data.loading import json_integer_keys
    from viquae_tpu.ir.metrics import find_relevant_dataset

    from datasets import load_from_disk

    title2index = json.loads(Path(args.title2index).read_text())
    article2passage = None
    if args.article2passage:
        article2passage = json.loads(
            Path(args.article2passage).read_text(),
            object_hook=json_integer_keys,
        )
    find_relevant_dataset(
        args.dataset,
        passages=load_from_disk(args.passages),
        title2index=title2index,
        article2passage=article2passage,
        save_as=args.save,
    )


def cmd_embed(args):
    from transformers import AutoTokenizer

    from viquae_tpu.core.config import get_pretrained
    from viquae_tpu.ir.embedding import MMEmbedder, TextEmbedder, dataset_embed

    config = load_config(args.config)
    model_kwargs = config.pop("model")
    model = get_pretrained(**model_kwargs)
    tokenizer = AutoTokenizer.from_pretrained(config.pop("tokenizer"))
    # an "image_features" block selects the multimodal path (ECAEncoder /
    # IntermediateLinearFusion over precomputed face+image feature columns,
    # parity with the reference's image_kwargs in ir/embedding.py configs)
    image_features = config.pop("image_features", None)
    packed_embed = config.pop("packed", False)
    if image_features is not None:
        from viquae_tpu.train.data import PreComputedImageFeatures

        if packed_embed and not hasattr(model, "packed_apply_fn"):
            raise ValueError(
                f"{model_kwargs.get('class_name')} has no packed path; "
                "drop 'packed'")
        embedder = MMEmbedder(
            model.apply_fn, model.params, tokenizer,
            PreComputedImageFeatures(**image_features),
            packed_bundle=model if packed_embed else None, **config
        )
    else:
        from viquae_tpu.models.mm import _MMEncoderBundle

        if isinstance(model, _MMEncoderBundle):
            raise ValueError(
                f"{model_kwargs.get('class_name')} is multimodal: the embed "
                "config needs an 'image_features' block (n_faces/face_dim/"
                "image_dims) naming the precomputed feature columns"
            )
        if packed_embed:
            # packed corpus embedding: the reference pads all passages to
            # max_length (2.5x the tokens at uniform_passages' ~100); pack
            # them at real lengths instead. CLS pooling only.
            from viquae_tpu.ir.embedding import PackedColumnEmbedder
            from viquae_tpu.models import dpr as dpr_lib

            if config.get("layers"):
                raise ValueError("packed embedding extracts CLS only; "
                                 "drop 'packed' to use 'layers'")
            row_len = config.pop("max_length", 256)
            embedder = PackedColumnEmbedder(
                dpr_lib.make_packed_apply(model.cfg), model.params,
                tokenizer, row_len=row_len, **config,
            )
        else:
            embedder = TextEmbedder(
                model.apply_fn, model.params, tokenizer, **config
            )
    dataset_embed(args.dataset, embedder, output_path=args.output)


def cmd_search(args):
    from datasets import load_from_disk

    from viquae_tpu.ir.search import dataset_search

    config = load_config(args.config)
    dataset = load_from_disk(args.dataset)
    metric_save_path = Path(args.metrics) if args.metrics else None
    dataset_search(
        dataset, k=args.k, metric_save_path=metric_save_path, **config
    )


def _build_dense_index(index_cfg, default_mode="global"):
    """Shared index construction for serve/answer (mode defaults differ:
    serve historically 'global', answer 'fused')."""
    import numpy as np

    from viquae_tpu.ops import mips

    if "load" in index_cfg:
        return mips.DenseIndex.load(
            index_cfg["load"], mode=index_cfg.get("mode", default_mode))
    from datasets import load_from_disk

    kb = load_from_disk(index_cfg["dataset"])
    return mips.DenseIndex(
        np.asarray(kb[index_cfg["column"]], np.float32),
        do_l2norm=index_cfg.get("do_l2norm", False),
        mode=index_cfg.get("mode", default_mode),
    )



def _build_hybrid_pipeline(config, embedder, batch_size, k,
                           default_mode="fused"):
    """Shared `serve`/`answer` hybrid construction: a "bm25" block names a
    saved index dir or a dataset column; dense index + weights + norm as in
    the serve schema (consumes the relevant keys from `config`)."""
    from datasets import load_from_disk

    from viquae_tpu.ir.serving import HybridRetrievalPipeline
    from viquae_tpu.ops import bm25 as bm25_lib

    bcfg = dict(config.pop("bm25"))
    hyper = {key: bcfg[key] for key in ("k1", "b") if key in bcfg}
    if "path" in bcfg:
        bm = bm25_lib.BM25Index.load(bcfg["path"], **hyper)
    else:
        ds = load_from_disk(str(bcfg["kb"]))
        bm = bm25_lib.BM25Index.build(
            ds[bcfg.get("column", "passage")], **hyper)
    if bcfg.get("device"):
        # score BM25 on the TPU (ops/bm25_device.py); the host index
        # stays inside as the exact overflow fallback
        from viquae_tpu.ops.bm25_device import DeviceBM25

        dev_kwargs = {key: bcfg[key]
                      for key in ("n_head", "l_small", "l_mid", "pool_mid",
                                  "pool_small", "q_block") if key in bcfg}
        bm = DeviceBM25(bm, **dev_kwargs)
    index = _build_dense_index(config.pop("index"),
                               default_mode=default_mode)
    stats = config.pop("stats", None)
    return HybridRetrievalPipeline(
        embedder, index, bm,
        weights=tuple(config.pop("weights", (0.7, 0.3))),
        batch_size=batch_size, k=k,
        norm=config.pop("norm", "gzmuv"),
        stats=(tuple(tuple(pair) for pair in stats)
               if stats is not None else None),
    )


def cmd_serve(args):
    """Streaming retrieval over a query file (one query per line) with the
    fused packed pipeline; writes a ranx-format run JSON."""
    import json

    import numpy as np
    from transformers import AutoTokenizer

    from viquae_tpu.core.config import get_pretrained
    from viquae_tpu.ir.embedding import PackedTextEmbedder
    from viquae_tpu.ir.serving import FusedRetrievalPipeline
    from viquae_tpu.ops import mips

    config = load_config(args.config)
    model = get_pretrained(**config.pop("model"))
    tokenizer = AutoTokenizer.from_pretrained(config.pop("tokenizer"))
    from viquae_tpu.models import dpr as dpr_lib

    embedder = PackedTextEmbedder(
        dpr_lib.make_packed_apply(model.cfg), model.params, tokenizer,
        row_len=config.pop("row_len", 64),
        batch_size=args.batch,
    )
    def build_index(index_cfg):
        return _build_dense_index(index_cfg, default_mode="global")

    with open(args.queries) as f:
        queries = [line.rstrip("\n") for line in f if line.strip()]
    ids = [str(i) for i in range(len(queries))]

    if "bm25" in config:
        # hybrid sparse+dense serving (the reference's BM25-as-index mode,
        # meerqat/ir/search.py:268-293): {"index": dense_cfg, "bm25":
        # {"path": saved_index | "kb": dataset, "column": ..., "b", "k1"},
        # "weights": [dense, bm25], "norm": "gzmuv" | "raw" (+ "stats")}
        pipeline = _build_hybrid_pipeline(config, embedder, args.batch,
                                          args.k, default_mode="global")
        run = pipeline.run(ids, queries)
    elif "indexes" in config:
        # late-fusion serving (the reference's dpr+arcface+clip+imagenet
        # configs online): {"indexes": {name: index_cfg}, "weights":
        # {name: w}, "text_index": name, "norm": "gzmuv",
        # "query_features": {name: path.npy}}
        from viquae_tpu.ir.serving import MultiIndexRetrievalPipeline

        fusion_cfg = config
        indexes = {n: build_index(c)
                   for n, c in fusion_cfg.pop("indexes").items()}
        feats = {
            n: np.load(p)
            for n, p in fusion_cfg.pop("query_features", {}).items()
        }
        pipeline = MultiIndexRetrievalPipeline(
            embedder, indexes, fusion_cfg.pop("weights"),
            text_index=fusion_cfg.pop("text_index"),
            batch_size=args.batch, k=args.k,
            norm=fusion_cfg.pop("norm", "gzmuv"),
        )
        run = pipeline.run(ids, queries, feats)
    else:
        index = build_index(config.pop("index"))
        pipeline = FusedRetrievalPipeline(embedder, index,
                                          batch_size=args.batch, k=args.k)
        run = pipeline.run(ids, queries)
    run.save(args.output)
    print(json.dumps({"queries": len(queries),
                      "stages": pipeline.report()}))


def cmd_answer(args):
    """Batch end-to-end QA over a query file: retrieve -> read -> answer
    strings (ir/qa_serving.AnswerPipeline); writes a JSON list of
    {question, answer, passage_ids, scores}."""
    import json

    import numpy as np
    from transformers import AutoTokenizer

    from datasets import load_from_disk

    from viquae_tpu.core.config import get_pretrained
    from viquae_tpu.ir.embedding import PackedTextEmbedder
    from viquae_tpu.ir.qa_serving import AnswerPipeline
    from viquae_tpu.ir.serving import FusedRetrievalPipeline
    from viquae_tpu.models import dpr as dpr_lib
    from viquae_tpu.ops import mips

    config = load_config(args.config)
    model = get_pretrained(**config.pop("model"))
    tokenizer = AutoTokenizer.from_pretrained(config.pop("tokenizer"))
    embedder = PackedTextEmbedder(
        dpr_lib.make_packed_apply(model.cfg), model.params, tokenizer,
        row_len=config.pop("row_len", 64), batch_size=args.batch,
    )
    run_kwargs = {}
    if "bm25" in config:
        # hybrid sparse+dense retrieval feeding the reader (same "bm25"
        # schema as `serve`)
        retrieval = _build_hybrid_pipeline(config, embedder, args.batch,
                                           args.m_passages)
    elif "indexes" in config:
        # late-fusion retrieval feeding the reader (the reference's best
        # config end to end): same schema as the `serve` fusion config
        from viquae_tpu.ir.serving import MultiIndexRetrievalPipeline

        indexes = {n: _build_dense_index(c, default_mode="fused")
                   for n, c in config.pop("indexes").items()}
        feats = {n: np.load(p)
                 for n, p in config.pop("query_features", {}).items()}
        retrieval = MultiIndexRetrievalPipeline(
            embedder, indexes, config.pop("weights"),
            text_index=config.pop("text_index"),
            batch_size=args.batch, k=args.m_passages,
            norm=config.pop("norm", "gzmuv"),
        )
        run_kwargs["query_features"] = feats
    else:
        index = _build_dense_index(config.pop("index"),
                                   default_mode="fused")
        retrieval = FusedRetrievalPipeline(
            embedder, index, batch_size=args.batch, k=args.m_passages)

    reader_cfg_kwargs = config.pop("reader")
    reader = get_pretrained(**reader_cfg_kwargs)
    kb = load_from_disk(config.pop("passages"))
    pipeline = AnswerPipeline(
        retrieval, kb, reader.cfg, reader.params, tokenizer,
        m_passages=args.m_passages, **config,
    )
    with open(args.queries) as f:
        queries = [line.rstrip("\n") for line in f if line.strip()]
    results = pipeline.run(queries, **run_kwargs)
    for r, q in zip(results, queries):
        r["question"] = q
    with open(args.output, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"queries": len(queries),
                      "stages": pipeline.report()}))



def cmd_fuse(args):
    from viquae_tpu.ir.fuse import Fusion

    config = load_config(args.config) if args.config else {}
    subcommand_kwargs = config.pop("subcommand_kwargs", {})
    fusion = Fusion(**config)
    if args.subcommand == "fit":
        fusion.fit(**subcommand_kwargs)
    else:
        if not args.best_params:
            raise SystemExit(
                "fuse test requires --best_params (a JSON file from "
                "`fuse fit`)"
            )
        best_params = json.loads(Path(args.best_params).read_text())
        fusion.test(best_params, **subcommand_kwargs)


def cmd_hp(args):
    from datasets import load_from_disk

    from viquae_tpu.ir import hp
    from viquae_tpu.ops import bm25
    from viquae_tpu.rankeval import Qrels

    config = load_config(args.config)
    kb = load_from_disk(config["kb"])
    index = bm25.BM25Index.build(list(kb[config.get("column", "passage")]))
    dataset = load_from_disk(config["dataset"])
    queries = dict(zip(dataset["id"], dataset[config.get("key", "input")]))
    qrels = Qrels.from_file(config["qrels"])
    objective = hp.BM25Objective(
        index, queries, qrels, k=config.get("k", 100),
        metric=config.get("metric", "mrr@100"),
    )
    result = hp.hyperparameter_search(
        objective, config.get("grid", hp.DEFAULT_BM25_GRID),
        storage=config.get("storage"),
    )
    print(json.dumps(
        {k: result[k] for k in ("best_params", "best_value")}, indent=2
    ))


def cmd_faces(args):
    import torch

    from viquae_tpu.image.face_detection import FaceDetector, dataset_detect_faces
    from viquae_tpu.models import mtcnn

    config = load_config(args.config) if args.config else {}
    weights = config.pop("weights", None)
    if weights:
        params = mtcnn.params_from_facenet(
            torch.load(weights, map_location="cpu")
        )
    else:
        import jax

        params = mtcnn.init(jax.random.key(0))
    mtcnn_kwargs = config.pop("mtcnn", {})
    if "thresholds" in mtcnn_kwargs:  # JSON lists are unhashable for jit
        mtcnn_kwargs["thresholds"] = tuple(mtcnn_kwargs["thresholds"])
    cfg = mtcnn.MTCNNConfig(**mtcnn_kwargs)
    detector = FaceDetector(params, cfg=cfg, **config)
    dataset_detect_faces(args.dataset, detector)


def cmd_face_embed(args):
    import torch

    from viquae_tpu.image.face_recognition import (
        FaceEmbedder,
        dataset_compute_face_embedding,
    )
    from viquae_tpu.models import arcface

    config = load_config(args.config) if args.config else {}
    cfg = arcface.ArcFaceConfig(**config.pop("arcface", {}))
    weights = config.pop("weights", None)
    if weights:
        params = arcface.params_from_insightface(
            torch.load(weights, map_location="cpu"), cfg
        )
    else:
        import jax

        params = arcface.init(jax.random.key(0), cfg)
    embedder = FaceEmbedder(params, cfg=cfg, **config)
    dataset_compute_face_embedding(args.dataset, embedder)


def build_image_tower(config):
    """(apply_fn, params, preprocessing) from an embed-image model config
    ({"model": clip-vit|clip|clip-RN50|imagenet-RN50, "weights": path?,
    "model_config": {...}}). Shared by the embed-image stage and the
    serving-side online image towers (cli_aux server configs). Mutates
    `config` (pops the model keys), leaving stage kwargs behind."""
    model_kind = config.pop("model", "clip-vit")
    weights = config.pop("weights", None)
    import jax

    if model_kind in ("clip-vit", "clip"):
        from viquae_tpu.models import clip as clip_lib

        mc = config.pop("model_config", {})
        # accept HF CLIPVisionConfig field names
        for hf_name, ours in [("num_hidden_layers", "num_layers"),
                              ("num_attention_heads", "num_heads")]:
            if hf_name in mc:
                val = mc.pop(hf_name)
                if mc.setdefault(ours, val) != val:
                    raise ValueError(
                        f"model_config sets both {hf_name!r}={val} and "
                        f"{ours!r}={mc[ours]} — remove one"
                    )
        vcfg = clip_lib.CLIPVisionConfig(**mc)
        if weights:
            import torch

            params = clip_lib.params_from_hf(
                torch.load(weights, map_location="cpu")
            )["vision"]
        else:
            params = clip_lib.vit_init(jax.random.key(0), vcfg)
        apply_fn = lambda p, x: clip_lib.vit_apply(p, vcfg, x)["image_embeds"]
        preprocessing = "clip"
    elif model_kind == "clip-RN50":
        from viquae_tpu.models import clip as clip_lib

        mcfg = clip_lib.ModifiedResNetConfig(**config.pop("model_config", {}))
        if weights:
            import torch

            params = clip_lib.visual_params_from_openai(
                torch.load(weights, map_location="cpu"), mcfg
            )
        else:
            # torch.load(None) crashed deep inside torch otherwise
            raise ValueError(
                "clip-RN50 requires 'weights' (an OpenAI CLIP visual "
                "state_dict); ModifiedResNet has no random init"
            )
        apply_fn = lambda p, x: clip_lib.modified_resnet_apply(p, mcfg, x)
        preprocessing = "clip"
    elif model_kind == "imagenet-RN50":
        from viquae_tpu.models import resnet

        rcfg = resnet.ResNetConfig(**config.pop("model_config", {}))
        if weights:
            import torch

            params = resnet.params_from_torchvision(
                torch.load(weights, map_location="cpu"), rcfg
            )
        else:
            params = resnet.init(jax.random.key(0), rcfg)
        apply_fn = lambda p, x: resnet.apply(p, rcfg, x)
        preprocessing = "imagenet"
    else:
        raise ValueError(f"Unknown image model {model_kind!r}")
    return apply_fn, params, preprocessing


def cmd_embed_image(args):
    from viquae_tpu.image.embedding import ImageEmbedder, dataset_embed_images

    config = load_config(args.config)
    apply_fn, params, preprocessing = build_image_tower(config)
    embedder = ImageEmbedder(
        apply_fn, params, preprocessing=preprocessing, **config
    )
    dataset_embed_images(args.dataset, embedder)


def cmd_resize(args):
    from viquae_tpu.image.resize import dataset_resize

    n = dataset_resize(
        args.dataset, args.root, args.save_root, size=args.size
    )
    print(f"resized {n} images")


def cmd_stats(args):
    from datasets import load_from_disk

    from viquae_tpu.viz.stats import dataset_stats

    print(json.dumps(dataset_stats(load_from_disk(args.dataset)), indent=2,
                     default=str))


def cmd_train(args):
    from viquae_tpu.train.run import run_from_config

    run_from_config(args.config, subcommand=args.subcommand,
                    ckpt_path=args.ckpt_path)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="viquae_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("passages", help="split articles into passages")
    p.add_argument("input"), p.add_argument("output"), _add_config_arg(p)
    p.set_defaults(fn=cmd_passages)

    p = sub.add_parser("mapping", help="build title2index/article2passage")
    p.add_argument("dataset"), p.add_argument("key"), p.add_argument("save_name")
    p.add_argument("--inverse", action="store_true")
    p.add_argument("--one2many", action="store_true")
    p.set_defaults(fn=cmd_mapping)

    p = sub.add_parser("relevant", help="provenance relevance judgment")
    p.add_argument("dataset"), p.add_argument("passages")
    p.add_argument("title2index")
    p.add_argument("--article2passage"), p.add_argument("--save", default="provenance_indices")
    p.set_defaults(fn=cmd_relevant)

    p = sub.add_parser("embed", help="embed a text column")
    p.add_argument("dataset"), _add_config_positional(p)
    p.add_argument("--output")
    p.set_defaults(fn=cmd_embed)

    p = sub.add_parser("search", help="multi-index search + eval")
    p.add_argument("dataset"), _add_config_positional(p)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--metrics")
    p.set_defaults(fn=cmd_search)

    p = sub.add_parser("serve", help="streaming packed retrieval over a "
                                     "query file -> run JSON")
    p.add_argument("queries"), _add_config_positional(p)
    p.add_argument("output")
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--batch", type=int, default=1280)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("answer", help="batch QA: retrieve -> read -> "
                                      "answers JSON")
    p.add_argument("queries"), _add_config_positional(p)
    p.add_argument("output")
    p.add_argument("--m-passages", type=int, default=24)
    p.add_argument("--batch", type=int, default=1280)
    p.set_defaults(fn=cmd_answer)

    p = sub.add_parser("fuse", help="late fusion fit/test")
    p.add_argument("subcommand", choices=["fit", "test"])
    p.add_argument("--best_params"), _add_config_arg(p)
    p.set_defaults(fn=cmd_fuse)

    p = sub.add_parser("hp", help="BM25 hyperparameter grid search")
    _add_config_positional(p)
    p.set_defaults(fn=cmd_hp)

    p = sub.add_parser("faces", help="MTCNN face detection stage")
    p.add_argument("dataset"), _add_config_arg(p)
    p.set_defaults(fn=cmd_faces)

    p = sub.add_parser("face-embed", help="align + ArcFace embedding stage")
    p.add_argument("dataset"), _add_config_arg(p)
    p.set_defaults(fn=cmd_face_embed)

    p = sub.add_parser("embed-image", help="global image embedding stage")
    p.add_argument("dataset"), _add_config_positional(p)
    p.set_defaults(fn=cmd_embed_image)

    p = sub.add_parser("resize", help="thumbnail the image corpus")
    p.add_argument("dataset"), p.add_argument("root"), p.add_argument("save_root")
    p.add_argument("--size", type=int, default=512)
    p.set_defaults(fn=cmd_resize)

    p = sub.add_parser("stats", help="dataset statistics")
    p.add_argument("dataset")
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser("train", help="config-driven training")
    p.add_argument("subcommand", choices=["fit", "test"])
    _add_config_positional(p)
    p.add_argument("--ckpt-path", dest="ckpt_path", default=None,
                   help="checkpoint dir: `test` restores it for eval "
                        "(default: trainer.ckpt_dir best/ then latest); "
                        "`fit` RESUMES training from its latest step "
                        "(the reference's trainer {fit,test} "
                        "--ckpt_path)")
    p.set_defaults(fn=cmd_train)

    from viquae_tpu.cli_aux import register_aux

    register_aux(sub, _add_config_arg, _add_config_positional)

    args = parser.parse_args(argv)
    if getattr(args, "config_opt", None) is not None:
        if args.config is not None:
            parser.error("config given both positionally and via --config")
        args.config = args.config_opt
    if hasattr(args, "config_opt") and args.config is None:
        parser.error("a config is required (positional or --config)")
    args.fn(args)


if __name__ == "__main__":
    main()
