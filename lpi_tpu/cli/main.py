"""CLI: continual retrieval training / evaluation / result post-processing.

Equivalent of the reference's `retrieval/main.py` + `retrieval/trainer.py`:

    python -m lpi_tpu.cli.main train --config cfg.json \
        --ann-train train.json --ann-val val.json --image-root images/
    python -m lpi_tpu.cli.main train --synthetic        # no data needed
    python -m lpi_tpu.cli.main report res/<ts>.json --metric i2t

The trainer seeds everything deterministically (`trainer.py:85-94`), builds
the device mesh, loads pretrained CLIP weights when provided, runs the
continual session loop, and writes `res/<timestamp>.json` + per-session
checkpoints.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("lpi_tpu")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a jax platform (e.g. cpu for local smoke runs)")
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="run the continual retrieval loop")
    t.add_argument("--config", default=None, help="nested-json config overrides")
    t.add_argument("--ann-train", default=None)
    t.add_argument("--ann-val", default=None)
    t.add_argument("--image-root", default=None)
    t.add_argument("--clip-ckpt", default=None, help="OpenAI CLIP .pt to convert")
    t.add_argument("--task-sim", default=None, help="task_sim_matrix.txt path")
    t.add_argument("--synthetic", action="store_true", help="synthetic data smoke run")
    t.add_argument("--sessions", type=int, default=None)
    t.add_argument("--epochs", type=int, default=None)
    t.add_argument("--output-dir", default="res")
    t.add_argument("--checkpoint-dir", default="checkpoints")
    t.add_argument("--tensorboard-dir", default=None,
                   help="also export per-session metrics as TB event files "
                        "(reference utils/metric_logger.py:94)")

    g = sub.add_parser("train-grounding", help="run the continual grounding loop")
    g.add_argument("--config", default=None)
    g.add_argument("--ann", default=None, help="mdetr refexp annotation json")
    g.add_argument("--image-root", default=None)
    g.add_argument("--dataset", default=None,
                   help="catalog name (e.g. refexp_train); resolves "
                        "ann/image paths via $DATASET search like the "
                        "reference's paths_catalog")
    g.add_argument("--glip-ckpt", default=None, help="GLIP-T .pth to convert")
    g.add_argument("--bert-vocab", default=None)
    g.add_argument("--task-sim", default=None)
    g.add_argument("--synthetic", action="store_true")
    g.add_argument("--tasks", type=int, default=None)
    g.add_argument("--epochs", type=int, default=None)
    g.add_argument("--output-dir", default="FINAL_RES")
    g.add_argument("--checkpoint-dir", default="checkpoints_grounding")
    g.add_argument("--tensorboard-dir", default=None,
                   help="also export per-task metrics as TB event files")

    d = sub.add_parser("predict", help="grounding demo on one image (GLIPDemo)")
    d.add_argument("image")
    d.add_argument("caption", nargs="?", default=None,
                   help="grounding caption; omit when using --classes")
    d.add_argument("--config", default=None)
    d.add_argument("--checkpoint-dir", default=None)
    d.add_argument("--bert-vocab", default=None)
    d.add_argument("--output", default="prediction.png")
    d.add_argument("--thresh", type=float, default=0.5)
    d.add_argument("--classes", default=None,
                   help="comma-separated class names: detection mode via the "
                   "GLIP-KNOW parallel-language path instead of a caption")
    d.add_argument("--knowledge-file", default=None,
                   help="GLIPKNOW knowledge json expanding --classes into "
                   "knowledge-augmented captions (cfg.grounding.knowledge "
                   "sets type/gpt3_num/wiki_and_gpt3)")

    s = sub.add_parser("serve", help="launch the gradio grounding webui")
    s.add_argument("--config", default=None)
    s.add_argument("--checkpoint-dir", default=None)
    s.add_argument("--bert-vocab", default=None)
    s.add_argument("--port", type=int, default=7860)

    e = sub.add_parser("eval", help="standalone retrieval eval from a checkpoint")
    e.add_argument("--config", default=None)
    e.add_argument("--checkpoint-dir", required=True)
    e.add_argument("--session", type=int, default=None)
    e.add_argument("--ann-val", default=None)
    e.add_argument("--image-root", default=None)
    e.add_argument("--synthetic", action="store_true")

    ea = sub.add_parser(
        "eval-all",
        help="sweep every saved session checkpoint and eval each "
             "(grounding/tools/eval_all.py equivalent)")
    ea.add_argument("--config", default=None)
    ea.add_argument("--checkpoint-dir", required=True)
    ea.add_argument("--ann-val", default=None)
    ea.add_argument("--image-root", default=None)
    ea.add_argument("--synthetic", action="store_true")
    ea.add_argument("--grounding", action="store_true",
                    help="sweep GROUNDING task checkpoints (GroundingLearner "
                         "restore + eval over seen tasks) instead of retrieval")
    ea.add_argument("--bert-vocab", default=None)
    ea.add_argument("--output", default=None,
                    help="write the per-session summary json here")

    r = sub.add_parser("report", help="aggregate a result json (reshandle)")
    r.add_argument("result_json")
    r.add_argument("--metric", default="i2t", choices=["i2t", "t2i"])
    r.add_argument("--dataset", default="mscoco")
    r.add_argument("--sessions", type=int, default=12)

    ed = sub.add_parser(
        "eval-detection",
        help="score a predictions json against GT (coco / lvis / flickr / voc protocols)")
    ed.add_argument("predictions", help="json: list of per-image records "
                    "{image_id, boxes, scores, labels} (per-phrase for flickr)")
    ed.add_argument("--gt", required=True,
                    help="COCO/LVIS-format annotation json (flickr: per-phrase "
                    "gt boxes live inside the predictions records)")
    ed.add_argument("--protocol", default="coco",
                    choices=["coco", "lvis", "flickr", "voc"])
    ed.add_argument("--max-dets", type=int, default=None)
    ed.add_argument("--merge-boxes", action="store_true",
                    help="flickr: merge multi-box phrases (GLIP protocol)")

    fw = sub.add_parser(
        "fetch-weights",
        help="download + sha256-verify + convert pretrained weights "
             "(OpenAI CLIP / GLIP zoo; reference clip.py:39-67 policy)")
    fw.add_argument("name", nargs="?", default=None,
                    help="registry entry (see --list); omit with --list")
    fw.add_argument("--root", default=None,
                    help="cache directory (default ~/.cache/lpi_tpu)")
    fw.add_argument("--no-convert", action="store_true",
                    help="keep only the raw torch checkpoint")
    fw.add_argument("--list", action="store_true", dest="list_entries",
                    help="print the available registry entries and exit")
    return p


def cmd_train(args) -> str:
    from lpi_tpu.core.config import load_config
    from lpi_tpu.core import mesh as mesh_lib
    from lpi_tpu.core.checkpoint import SessionCheckpointer
    from lpi_tpu.core.logging import save_results_json, setup_logging
    from lpi_tpu.continual.learner import RetrievalLearner, _split_params
    from lpi_tpu.continual.mid import fallback_sim_matrix, load_task_sim_matrix

    if not args.synthetic and not (args.ann_train and args.ann_val and args.image_root):
        raise SystemExit("need --ann-train/--ann-val/--image-root (or --synthetic)")

    log = setup_logging(args.output_dir)
    cfg = load_config(args.config)
    rcfg = cfg.retrieval
    sessions = args.sessions or rcfg.total_sessions

    mesh = None
    try:
        import jax

        if len(jax.devices()) > 1:
            mesh = mesh_lib.make_mesh(cfg.mesh)
    except Exception as e:  # pragma: no cover - device discovery is environmental
        log.warning("mesh setup failed (%s); running single-device", e)

    if args.task_sim:
        sim = load_task_sim_matrix(args.task_sim, rcfg.total_sessions)
    else:
        sim = fallback_sim_matrix(rcfg.total_sessions)

    init_params = None
    if args.clip_ckpt:
        from lpi_tpu.models.clip.convert import load_torch_clip

        init_params = {"clip": load_torch_clip(args.clip_ckpt)}
        log.info("loaded CLIP weights from %s", args.clip_ckpt)

    learner = RetrievalLearner(rcfg, mesh=mesh, task_sim_matrix=sim,
                               init_params=init_params)

    from lpi_tpu.data.tokenizer import ClipTokenizer

    tok = ClipTokenizer()
    if args.synthetic:
        from lpi_tpu.data.retrieval import synthetic_eval, synthetic_session

        size = rcfg.clip.image_resolution
        train_sets = [
            synthetic_session(t, max(rcfg.batch_size * 2, 16), size, tok, rcfg.clip.n_ctx)
            for t in range(sessions)
        ]
        eval_sets = {
            i: synthetic_eval(i + 1, 8, image_size=size, tokenizer=tok, n_ctx=rcfg.clip.n_ctx)
            for i in range(sessions)
        }
    else:
        from lpi_tpu.data.coco import CocoCaptionTrain, load_coco_eval

        train_sets = [
            CocoCaptionTrain(args.ann_train, args.image_root, [t], tok, rcfg.clip.n_ctx)
            for t in range(sessions)
        ]
        eval_sets = {
            i: load_coco_eval(args.ann_val, args.image_root, list(range(i + 1)),
                              tok, rcfg.clip.n_ctx)
            for i in range(sessions)
        }

    ckpt = SessionCheckpointer(args.checkpoint_dir)
    from lpi_tpu.core.logging import MetricLogger

    ml = MetricLogger(
        jsonl_path=os.path.join(args.output_dir, "metrics.jsonl"),
        tensorboard_dir=getattr(args, "tensorboard_dir", None))
    results = {}
    for i in range(sessions):
        log.info("=== session %d/%d (task %d) ===", i + 1, sessions,
                 train_sets[i].task_index)
        metrics = learner.train_session(train_sets[i], epochs=args.epochs)
        log.info("train metrics: %s", metrics)
        res = learner.evaluate(eval_sets[i], num_tasks=i + 1)
        log.info("eval r_mean=%.2f task_acc=%s", res["summary"]["r_mean"],
                 res["task_id_accuracy"])
        ml.update(session=i, **{k: v for k, v in metrics.items()},
                  r_mean=res["summary"]["r_mean"],
                  task_id_acc_visual=res["task_id_accuracy"]["visual"])
        results[i] = {"mscoco": {"i2t": res["i2t"], "t2i": res["t2i"]},
                      "summary": res["summary"],
                      "task_id_accuracy": res["task_id_accuracy"]}
        pools, frozen = _split_params(learner.params)
        if i == 0:
            ckpt.save_base(frozen)
        ckpt.save_session(i, pools, learner.visual_keys, learner.textual_keys,
                          results[i])
    path = save_results_json(results, args.output_dir)
    log.info("results written to %s", path)
    return path


def cmd_train_grounding(args) -> str:
    """Continual grounding loop (reference `tools/finetune.py:58-340`)."""
    if not args.synthetic and not getattr(args, "dataset", None) \
            and not (args.ann and args.image_root):
        raise SystemExit("need --dataset, --ann/--image-root, or --synthetic")
    if getattr(args, "dataset", None):
        from lpi_tpu.data.catalog import CATALOG, try_to_find

        spec = CATALOG.get(args.dataset)
        if spec.kind != "mdetr":
            raise SystemExit(f"--dataset {args.dataset} is {spec.kind}-kind; "
                             "train-grounding takes an mdetr-format name")
        args.ann = try_to_find(spec.ann_file)
        args.image_root = try_to_find(spec.img_dir)

    from lpi_tpu.core.config import load_config
    from lpi_tpu.core.checkpoint import SessionCheckpointer
    from lpi_tpu.core.logging import save_results_json, setup_logging
    from lpi_tpu.continual.grounding_learner import GroundingLearner, _split_params
    from lpi_tpu.continual.mid import fallback_sim_matrix, load_task_sim_matrix
    from lpi_tpu.data.bert_tokenizer import BertTokenizer
    from lpi_tpu.data.grounding import load_mdetr_refexp, synthetic_grounding_task

    log = setup_logging(args.output_dir)
    cfg = load_config(args.config)
    gcfg = cfg.grounding
    tasks = args.tasks or gcfg.total_tasks

    tok = BertTokenizer(vocab_path=args.bert_vocab,
                        max_len=gcfg.bert.max_query_len,
                        vocab_size=gcfg.bert.vocab_size)
    if args.synthetic:
        task_sets = {
            t: synthetic_grounding_task(t, max(gcfg.batch_size * 2, 8),
                                        gcfg.image_size, tok, gcfg.max_boxes)
            for t in range(tasks)
        }
    else:
        task_sets = {
            t: load_mdetr_refexp(args.ann, args.image_root, t, tok,
                                 gcfg.image_size, gcfg.max_boxes)
            for t in range(tasks)
        }

    sim = (load_task_sim_matrix(args.task_sim, gcfg.total_tasks)
           if args.task_sim else fallback_sim_matrix(gcfg.total_tasks))
    sample = next(task_sets[0].batches(gcfg.batch_size, drop_remainder=False))

    init_params = None
    if args.glip_ckpt:
        import torch

        from lpi_tpu.models.glip.convert import convert_glip

        sd = torch.load(args.glip_ckpt, map_location="cpu")
        sd = sd.get("model", sd)
        flat, unmapped = convert_glip({k: v.numpy() for k, v in sd.items()})
        log.info("GLIP ckpt: %d leaves converted, %d unmapped", len(flat), len(unmapped))
        init_params = flat

    learner = GroundingLearner(gcfg, task_sim_matrix=sim, sample_batch=sample)
    if init_params is not None:
        from lpi_tpu.models.glip.convert import merge_into_params

        learner.params = merge_into_params(learner.params, init_params,
                                           strict_shapes=False)

    ckpt = SessionCheckpointer(args.checkpoint_dir)
    from lpi_tpu.core.logging import MetricLogger

    ml = MetricLogger(
        jsonl_path=os.path.join(args.output_dir, "metrics.jsonl"),
        tensorboard_dir=getattr(args, "tensorboard_dir", None))
    results = {}
    for tid in range(tasks):
        log.info("=== grounding task %d/%d ===", tid + 1, tasks)
        metrics = learner.train_task(task_sets[tid], epochs=args.epochs)
        log.info("train metrics: %s", metrics)
        res = learner.evaluate({t: task_sets[t] for t in range(tid + 1)})
        log.info("eval: %s", res)
        results[tid] = res
        ml.update(task=tid, **{k: v for k, v in metrics.items()},
                  p1_overall=res["overall"][0],
                  task_id_acc=res["task_id_accuracy"])
        pools, frozen = _split_params(learner.params)
        if tid == 0:
            ckpt.save_base(frozen)
        ckpt.save_session(tid, pools, visual_keys=learner.keys, results=res)
    path = save_results_json(results, args.output_dir, stem="res_grounding")
    log.info("results written to %s", path)
    return path


def cmd_predict(args) -> dict:
    """One-image grounding demo (webui/index.py `retrieval` flow)."""
    import numpy as np
    from PIL import Image

    from lpi_tpu.core.config import load_config
    from lpi_tpu.continual.grounding_learner import GroundingLearner
    from lpi_tpu.core.checkpoint import SessionCheckpointer
    from lpi_tpu.data.bert_tokenizer import BertTokenizer
    from lpi_tpu.data.grounding import synthetic_grounding_task
    from lpi_tpu.serve.predictor import GroundingPredictor, draw_predictions

    cfg = load_config(args.config)
    gcfg = cfg.grounding
    tok = BertTokenizer(vocab_path=args.bert_vocab,
                        max_len=gcfg.bert.max_query_len,
                        vocab_size=gcfg.bert.vocab_size)
    sample = next(synthetic_grounding_task(
        0, 2, gcfg.image_size, tok, gcfg.max_boxes).batches(1, drop_remainder=False))
    learner = GroundingLearner(gcfg, sample_batch=sample)
    if args.checkpoint_dir:
        learner.restore(SessionCheckpointer(args.checkpoint_dir))
    predictor = GroundingPredictor(learner.model, learner.params, learner.keys,
                                   tok, image_size=gcfg.image_size,
                                   score_thresh=args.thresh, atss_cfg=gcfg.atss)
    image = np.asarray(Image.open(args.image).convert("RGB"))
    if args.classes:
        from lpi_tpu.data.knowledge import load_knowledge_file

        know = (load_knowledge_file(args.knowledge_file)
                if args.knowledge_file else None)
        kc = gcfg.knowledge
        result = predictor.predict_classes(
            image, [c.strip() for c in args.classes.split(",") if c.strip()],
            knowledge=know, knowledge_type=kc.knowledge_type,
            gpt3_num=kc.gpt3_num, wiki_and_gpt3=kc.wiki_and_gpt3,
            agg_type=kc.lan_feature_agg_type)
    elif args.caption:
        result = predictor.predict(image, args.caption)
    else:
        raise SystemExit("predict needs a caption or --classes")
    draw_predictions(image, result).save(args.output)
    print(json.dumps({
        "entities": result["entities"],
        "scores": [float(s) for s in result["scores"]],
        "boxes": [[float(v) for v in b] for b in result["boxes"]],
        "task_id": result.get("task_id", 0),
        "output": args.output,
    }, indent=2))
    return result


def cmd_serve(args):
    """Gradio webui (reference `webui/index.py`); needs gradio installed."""
    from lpi_tpu.core.config import load_config
    from lpi_tpu.continual.grounding_learner import GroundingLearner
    from lpi_tpu.core.checkpoint import SessionCheckpointer
    from lpi_tpu.data.bert_tokenizer import BertTokenizer
    from lpi_tpu.data.grounding import synthetic_grounding_task
    from lpi_tpu.serve.predictor import GroundingPredictor, launch_webui

    cfg = load_config(args.config)
    gcfg = cfg.grounding
    tok = BertTokenizer(vocab_path=args.bert_vocab,
                        max_len=gcfg.bert.max_query_len,
                        vocab_size=gcfg.bert.vocab_size)
    sample = next(synthetic_grounding_task(
        0, 2, gcfg.image_size, tok, gcfg.max_boxes).batches(1, drop_remainder=False))
    learner = GroundingLearner(gcfg, sample_batch=sample)
    if args.checkpoint_dir:
        learner.restore(SessionCheckpointer(args.checkpoint_dir))
    predictor = GroundingPredictor(learner.model, learner.params, learner.keys,
                                   tok, image_size=gcfg.image_size,
                                   atss_cfg=gcfg.atss)
    launch_webui(predictor, port=args.port)


def cmd_eval(args) -> dict:
    """Standalone retrieval evaluation from a saved session
    (`tools/test_net.py` role for the retrieval half)."""
    if not args.synthetic and not (args.ann_val and args.image_root):
        raise SystemExit("need --ann-val/--image-root (or --synthetic)")

    from lpi_tpu.core.config import load_config
    from lpi_tpu.core.checkpoint import SessionCheckpointer
    from lpi_tpu.core.logging import setup_logging
    from lpi_tpu.continual.learner import RetrievalLearner
    from lpi_tpu.data.tokenizer import ClipTokenizer

    log = setup_logging(None)
    cfg = load_config(args.config)
    rcfg = cfg.retrieval
    learner = RetrievalLearner(rcfg)
    session = learner.restore(SessionCheckpointer(args.checkpoint_dir),
                              args.session)
    log.info("restored session %d from %s", session, args.checkpoint_dir)

    tok = ClipTokenizer()
    if args.synthetic:
        from lpi_tpu.data.retrieval import synthetic_eval

        ev = synthetic_eval(session + 1, 8, image_size=rcfg.clip.image_resolution,
                            tokenizer=tok, n_ctx=rcfg.clip.n_ctx)
    else:
        from lpi_tpu.data.coco import load_coco_eval

        ev = load_coco_eval(args.ann_val, args.image_root,
                            list(range(session + 1)), tok, rcfg.clip.n_ctx)
    res = learner.evaluate(ev, num_tasks=session + 1)
    print(json.dumps({"session": session, "summary": res["summary"],
                      "task_id_accuracy": res["task_id_accuracy"]},
                     indent=2, default=float))
    return res


def cmd_eval_all(args) -> dict:
    """Evaluate EVERY saved session checkpoint in a directory — the
    reference's checkpoint sweep (`grounding/tools/eval_all.py`), which
    globs `model_*.pth` and runs inference per checkpoint. Here: restore
    each saved session (frozen base + that session's pools/keys) and run
    the cumulative eval; print and optionally save the per-session summary
    table. `--grounding` sweeps grounding task checkpoints (the reference's
    eval_all is a grounding tool); default sweeps retrieval sessions."""
    if not args.synthetic and not (args.ann_val and args.image_root):
        raise SystemExit("need --ann-val/--image-root (or --synthetic)")
    if args.grounding:
        return _eval_all_grounding(args)

    from lpi_tpu.core.config import load_config
    from lpi_tpu.core.checkpoint import SessionCheckpointer
    from lpi_tpu.core.logging import setup_logging
    from lpi_tpu.continual.learner import RetrievalLearner
    from lpi_tpu.data.tokenizer import ClipTokenizer

    log = setup_logging(None)
    cfg = load_config(args.config)
    rcfg = cfg.retrieval
    ckpt = SessionCheckpointer(args.checkpoint_dir)
    latest = ckpt.latest_session()
    if latest is None:
        raise SystemExit(f"no sessions found in {args.checkpoint_dir}")
    sessions = [s for s in range(latest + 1)
                if os.path.isdir(os.path.join(args.checkpoint_dir,
                                              f"session_{s}"))]

    tok = ClipTokenizer()
    learner = RetrievalLearner(rcfg)
    out = {}
    for s in sessions:
        learner.restore(ckpt, s)
        if args.synthetic:
            from lpi_tpu.data.retrieval import synthetic_eval

            ev = synthetic_eval(s + 1, 8, image_size=rcfg.clip.image_resolution,
                                tokenizer=tok, n_ctx=rcfg.clip.n_ctx)
        else:
            from lpi_tpu.data.coco import load_coco_eval

            ev = load_coco_eval(args.ann_val, args.image_root,
                                list(range(s + 1)), tok, rcfg.clip.n_ctx)
        res = learner.evaluate(ev, num_tasks=s + 1)
        out[s] = {"summary": res["summary"],
                  "task_id_accuracy": res["task_id_accuracy"]}
        log.info("session %02d: %s", s, out[s]["summary"])
    print(json.dumps(out, indent=2, default=float))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, default=float)
    return out


def _eval_all_grounding(args) -> dict:
    """Grounding checkpoint sweep (`grounding/tools/eval_all.py:1-60`):
    restore every saved task's pools + keys via GroundingLearner and run
    `evaluate` over that task's seen set 0..t."""
    from lpi_tpu.core.config import load_config
    from lpi_tpu.core.checkpoint import SessionCheckpointer
    from lpi_tpu.core.logging import setup_logging
    from lpi_tpu.continual.grounding_learner import GroundingLearner
    from lpi_tpu.data.bert_tokenizer import BertTokenizer
    from lpi_tpu.data.grounding import load_mdetr_refexp, synthetic_grounding_task

    log = setup_logging(None)
    cfg = load_config(args.config)
    gcfg = cfg.grounding
    ckpt = SessionCheckpointer(args.checkpoint_dir)
    latest = ckpt.latest_session()
    if latest is None:
        raise SystemExit(f"no sessions found in {args.checkpoint_dir}")
    sessions = [s for s in range(latest + 1)
                if os.path.isdir(os.path.join(args.checkpoint_dir,
                                              f"session_{s}"))]

    tok = BertTokenizer(vocab_path=args.bert_vocab,
                        max_len=gcfg.bert.max_query_len,
                        vocab_size=gcfg.bert.vocab_size)
    if args.synthetic:
        task_sets = {
            t: synthetic_grounding_task(t, max(gcfg.batch_size * 2, 8),
                                        gcfg.image_size, tok, gcfg.max_boxes)
            for t in range(latest + 1)
        }
    else:
        task_sets = {
            t: load_mdetr_refexp(args.ann_val, args.image_root, t, tok,
                                 gcfg.image_size, gcfg.max_boxes)
            for t in range(latest + 1)
        }
    sample = next(task_sets[0].batches(gcfg.batch_size, drop_remainder=False))
    learner = GroundingLearner(gcfg, sample_batch=sample)
    out = {}
    for s in sessions:
        learner.restore(ckpt, s)
        res = learner.evaluate({t: task_sets[t] for t in range(s + 1)})
        out[s] = {"overall": res["overall"],
                  "per_task": {str(k): v for k, v in res["per_task"].items()},
                  "task_id_accuracy": res["task_id_accuracy"]}
        log.info("task %02d: P@1/5/10=%s task_id_acc=%.3f", s,
                 res["overall"], res["task_id_accuracy"])
    print(json.dumps(out, indent=2, default=float))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, default=float)
    return out


def cmd_report(args) -> dict:
    from lpi_tpu.eval.reshandle import get_res

    res = get_res(args.result_json, dataset=args.dataset, metric=args.metric,
                  num_sessions=args.sessions)
    print(json.dumps(res, indent=2))
    return res


def cmd_eval_detection(args) -> dict:
    """Score detection/grounding predictions with the reference protocols.

    Covers the roles of `evaluation/coco_eval.py` (detection mAP),
    `evaluation/lvis/lvis_eval.py` (federated LVIS AP + r/c/f bins), and
    `evaluation/flickr/flickr_eval.py` (phrase Recall@k) from the eval CLI.
    """
    with open(args.predictions) as f:
        preds = json.load(f)

    if args.protocol == "flickr":
        from lpi_tpu.eval.flickr import FlickrEvaluator

        ev = FlickrEvaluator(merge_gt_boxes=args.merge_boxes)
        for rec in preds:
            ev.update(rec["boxes"], rec["scores"], rec["gt_boxes"],
                      phrase_types=rec.get("phrase_types"))
        res = ev.summarize()
        print(json.dumps(res, indent=2))
        return res

    with open(args.gt) as f:
        gt = json.load(f)
    anns_by_img = {}
    for a in gt.get("annotations", []):
        anns_by_img.setdefault(a["image_id"], []).append(a)

    def gt_record(image_id):
        anns = anns_by_img.get(image_id, [])
        boxes = [[a["bbox"][0], a["bbox"][1],
                  a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]]
                 for a in anns]
        labels = [a["category_id"] for a in anns]
        return boxes, labels

    if args.protocol == "lvis":
        from lpi_tpu.eval.lvis import LvisEvaluator

        counts = {c["id"]: c.get("image_count", 100)
                  for c in gt.get("categories", [])}
        ev = LvisEvaluator(category_image_counts=counts,
                           max_dets=args.max_dets or 300)
        img_meta = {im["id"]: im for im in gt.get("images", [])}
        for rec in preds:
            boxes, labels = gt_record(rec["image_id"])
            meta = img_meta.get(rec["image_id"], {})
            pos = meta.get("not_exhaustive_category_ids")
            neg = meta.get("neg_category_ids")
            federated = pos is not None or neg is not None
            ev.update(rec["boxes"], rec["scores"], rec["labels"],
                      boxes, labels,
                      pos_cats=(pos or []) if federated else None,
                      neg_cats=(neg or []) if federated else None)
        res = ev.summarize()
    elif args.protocol == "voc":
        from lpi_tpu.eval.voc import eval_detection_voc

        dets, gts_l = [], []
        for rec in preds:
            boxes, labels = gt_record(rec["image_id"])
            diff = [a.get("difficult", 0)
                    for a in anns_by_img.get(rec["image_id"], [])]
            dets.append({"boxes": rec["boxes"], "scores": rec["scores"],
                         "labels": rec["labels"]})
            gts_l.append({"boxes": boxes, "labels": labels,
                          "difficult": diff})
        out = eval_detection_voc(gts_l, dets)
        res = {"map": out["map"],
               "ap": {i: float(v) for i, v in enumerate(out["ap"])
                      if v == v}}
    else:
        from lpi_tpu.eval.coco_ap import evaluate_detections

        dets, gts = [], []
        for rec in preds:
            boxes, labels = gt_record(rec["image_id"])
            dets.append({"boxes": rec["boxes"], "scores": rec["scores"],
                         "labels": rec["labels"]})
            gts.append({"boxes": boxes, "labels": labels})
        res = evaluate_detections(dets, gts, max_dets=args.max_dets or 100)
    res.pop("per_class", None)
    print(json.dumps(res, indent=2))
    return res


def cmd_fetch_weights(args) -> dict:
    from lpi_tpu.core import fetch

    if args.list_entries or args.name is None:
        for name, spec in sorted(fetch.WEIGHTS.items()):
            verified = "sha256" if spec["sha256"] else "unverified"
            print(f"{name:16s} {verified:10s} {spec['url']}")
        if args.name is None:
            return {"available": sorted(fetch.WEIGHTS)}
    root = args.root or fetch.DEFAULT_ROOT
    out = fetch.fetch_weights(args.name, root=root,
                              convert=not args.no_convert)
    print(f"checkpoint: {out['checkpoint']}")
    print(f"sha256:     {out['sha256']}")
    if out["converted"]:
        print(f"converted:  {out['converted']}")
    return out


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.command == "train":
        return cmd_train(args)
    if args.command == "train-grounding":
        return cmd_train_grounding(args)
    if args.command == "predict":
        return cmd_predict(args)
    if args.command == "serve":
        return cmd_serve(args)
    if args.command == "eval":
        return cmd_eval(args)
    if args.command == "eval-all":
        return cmd_eval_all(args)
    if args.command == "report":
        return cmd_report(args)
    if args.command == "eval-detection":
        return cmd_eval_detection(args)
    if args.command == "fetch-weights":
        return cmd_fetch_weights(args)
    raise SystemExit(f"unknown command {args.command}")


if __name__ == "__main__":
    main()
