#!/usr/bin/env python3
"""leccr_tpu launcher.

Capability parity with the reference CLI (run.py:148-199 +
image_Retrieval_caption.py:519-542 / video_…py argparse), redesigned for the
TPU runtime: no torch.distributed.launch process fan-out — JAX is
single-controller, multi-host initialization is one `jax.distributed`
call — so the launcher and trainer collapse into one entry point.

    python run.py --task itr_caption --config configs/multi30k_fr.yaml \
        --output_dir out/m30k_fr [--bs 128] [--epoch 50] [--evaluate]
        [--resume] [--checkpoint /path/ckpt]

Tasks: itr_caption (image-text, reference image_Retrieval_caption.py),
vtr_caption (video-text double-sim eval,
reference video_Retrieval_caption_double_sim.py), serve (beyond-reference:
load a checkpoint + saved index and run the dynamic-batching HTTP
retrieval frontend, leccr_tpu/serve_frontend.py), export (trained
checkpoint -> reference-format .pth, so migration works both ways):

    python run.py --task serve --config out/m30k_fr/config.json \
        --output_dir out/m30k_fr --index out/m30k_fr/index --port 8080
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", default="itr_caption",
                   choices=["itr_caption", "vtr_caption", "serve",
                            "build_index", "update_index", "export"])
    p.add_argument("--config", default="",
                   help="config yaml/json; optional for the training "
                        "tasks, which fall back to a per-task default "
                        "(the analog of the reference's --model default-"
                        "config resolution, run.py:125)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint", default="",
                   help="initial params checkpoint (orbax dir or torch file)")
    p.add_argument("--seed", default=None, type=int,
                   help="override the config's train.seed (default: honor "
                        "the YAML; 42 if neither is given)")
    p.add_argument("--epoch", default=-1, type=int,
                   help="override config epochs")
    p.add_argument("--bs", default=-1, type=int,
                   help="override GLOBAL train batch size")
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (TPU pods)")
    p.add_argument("--devices", default=0, type=int,
                   help="use only the first N local devices (0 = all; "
                        "reference --dist f1..f8/gpuN device subsets)")
    g = p.add_argument_group("serve", "--task serve only")
    g.add_argument("--index", default="",
                   help="saved index dir (serve.save_index; hdfs:// ok)")
    g.add_argument("--host", default="127.0.0.1")
    g.add_argument("--port", default=8080, type=int)
    g.add_argument("--serve_bs", default=64, type=int,
                   help="embed/search batch size = max coalesced batch")
    g.add_argument("--max_delay_ms", default=5.0, type=float,
                   help="how long the first queued query waits for "
                        "followers before dispatching")
    g.add_argument("--max_pending", default=1024, type=int,
                   help="admission bound in queries; beyond it /search "
                        "returns 503 so load balancers shed/retry "
                        "(0 = unbounded)")
    e = p.add_argument_group("export", "--task export only")
    e.add_argument("--export_path", default="",
                   help="destination .pth for the reference-format "
                        "state_dict (torch.save)")
    b = p.add_argument_group("build_index", "--task build_index only")
    b.add_argument("--split", default="test", choices=["test", "val"],
                   help="which dataset split's corpus to index")
    b.add_argument("--int8", action="store_true",
                   help="quantize the index rows to int8 (4x smaller, "
                        "int8 MXU dot; ordering preserved to ~1e-3)")
    b.add_argument("--ivf", action="store_true",
                   help="cluster into an IVF approximate-NN index "
                        "(serve_ann; probe cost independent of corpus "
                        "size — for large corpora)")
    b.add_argument("--ivf_clusters", default=0, type=int,
                   help="IVF cluster count (0 = auto, ~4*sqrt(N))")
    b.add_argument("--ivf_recall", default=0.0, type=float,
                   help="calibrate the smallest nprobe hitting this "
                        "recall@10 (self-query sample vs the exact "
                        "probe) and save it as the index's default "
                        "operating point (0 = skip)")
    u = p.add_argument_group("update_index", "--task update_index only")
    u.add_argument("--remove_ids", default="",
                   help="comma-separated item ids to drop from the index")
    u.add_argument("--add_new", action="store_true",
                   help="embed and add the split's items not yet in the "
                        "index (incremental corpus sync; existing rows "
                        "are never re-embedded)")
    return p.parse_args()


def _corpus_split(args, cfg):
    """The dataset split whose visual corpus gets indexed.  The corpus
    (and its MLLM captions) is language-independent; any language's
    split carries the same images/videos.  build_datasets first: for the
    synthetic dataset it generates the on-disk corpus AND rewrites
    cfg.data paths (vocab included), which the Embedder's tokenizer
    needs."""
    from leccr_tpu.train.trainer import build_datasets

    _, val_ds, test_ds = build_datasets(cfg)
    splits = test_ds if args.split == "test" else val_ds
    return next(iter(splits.values()))


def _embed_corpus(emb, cfg, ds, ids):
    """Embed the given corpus item ids (a subset of ds's id set) into an
    exact ImageIndex through the trained model."""
    import numpy as np

    captions = [ds.generated[i] for i in ids]
    if cfg.model.vision.kind == "temporal":
        pos = {im: i for i, im in enumerate(ds.index.image_ids)}
        pairs = [ds.get(pos[i])[0] for i in ids]  # ds.get is positional
        return emb.build_video_index(
            np.stack([p[0] for p in pairs]), captions,
            frame_masks=np.stack([p[1] for p in pairs]), ids=ids)
    return emb.build_image_index(
        [ds.image_path(i) for i in ids], captions, ids=ids)


def build_index_main(args, cfg):
    """--task build_index: checkpoint + dataset split -> saved serving index.

    Completes the train -> serve pipeline from one CLI: embed the split's
    image/video corpus (with its MLLM captions — text or precomputed
    feats) through the trained model and persist the index for
    `--task serve`.  The reference has no serving story at all; its
    closest artifact is the per-epoch eval embed loop
    (image_Retrieval_caption.py:123-145), which this reuses as a
    deployment artifact instead of recomputing per process."""
    from leccr_tpu.serve import Embedder, quantize_index, save_index

    if not args.index:
        raise SystemExit("--task build_index requires --index "
                         "(the output directory for serve.save_index)")
    ds = _corpus_split(args, cfg)
    emb = Embedder.from_config(cfg, checkpoint=args.checkpoint or None,
                               batch_size=args.serve_bs)
    index = _embed_corpus(emb, cfg, ds, list(ds.index.image_ids))
    if args.ivf:
        import dataclasses

        from leccr_tpu.serve_ann import (build_ivf_index, calibrate_nprobe,
                                         quantize_ivf, save_ivf)

        ivf = build_ivf_index(index, n_clusters=args.ivf_clusters or None)
        if args.int8:
            ivf = quantize_ivf(ivf)
        if args.ivf_recall:  # calibrate on the bank as deployed
            nprobe, recall = calibrate_nprobe(
                ivf, target_recall=args.ivf_recall)
            ivf = dataclasses.replace(ivf, default_nprobe=nprobe)
            print(f"### calibrated nprobe={nprobe} "
                  f"(recall@10 {recall:.3f} >= {args.ivf_recall})",
                  flush=True)
        save_ivf(ivf, args.index)
        print(f"### built IVF index: {ivf.n_valid} items, "
              f"C={ivf.n_clusters} cap={ivf.capacity}"
              + (" (int8)" if ivf.quantized else "")
              + f" -> {args.index}", flush=True)
        return
    if args.int8:
        index = quantize_index(index)
    save_index(index, args.index)
    print(f"### built index: {index.n_valid} items"
          + (" (int8)" if index.quantized else "")
          + f" -> {args.index}", flush=True)


def update_index_main(args, cfg):
    """--task update_index: incremental maintenance on a saved index.

    Syncs a deployed index with a changed corpus WITHOUT rebuilding:
    `--remove_ids a,b,c` drops dead items; `--add_new` embeds only the
    split's items not yet indexed and packs them in (exact family:
    merge_indexes; IVF family: add_to_ivf — no re-cluster).  Existing
    rows are never re-embedded and keep their bytes (int8 included).
    The save kind is auto-detected, and the model is loaded only if
    there is something to embed.  The reference's only corpus-change
    story is re-running the whole eval embed loop from scratch
    (image_Retrieval_caption.py:123-145)."""
    from leccr_tpu.serve import (Embedder, load_index, merge_indexes,
                                 quantize_index, remove_from_index,
                                 save_index)
    from leccr_tpu.serve_ann import (add_to_ivf, is_ivf_save, load_ivf,
                                     remove_from_ivf, save_ivf)

    if not args.index:
        raise SystemExit("--task update_index requires --index "
                         "(an existing saved index directory)")
    removes = [s for s in args.remove_ids.split(",") if s]
    if not removes and not args.add_new and not args.ivf_recall:
        raise SystemExit("--task update_index needs --remove_ids, "
                         "--add_new, and/or --ivf_recall")
    ivf = is_ivf_save(args.index)
    if args.ivf_recall and not ivf:
        raise SystemExit("--ivf_recall applies to IVF indexes only")
    index = load_ivf(args.index) if ivf else load_index(args.index)
    n0 = index.n_valid
    if removes:
        index = (remove_from_ivf if ivf else remove_from_index)(
            index, removes)
    added = 0
    if args.add_new:
        ds = _corpus_split(args, cfg)
        have = set(index.ids)
        new_ids = [i for i in ds.index.image_ids if i not in have]
        if new_ids:
            emb = Embedder.from_config(
                cfg, checkpoint=args.checkpoint or None,
                batch_size=args.serve_bs)
            new = _embed_corpus(emb, cfg, ds, new_ids)
            if ivf:
                index = add_to_ivf(index, new)
            else:
                if index.quantized:
                    new = quantize_index(new)
                index = merge_indexes(index, new)
            added = len(new_ids)
    if ivf and args.ivf_recall:
        # maintenance shifts the recall/nprobe curve (adds live under a
        # partition that wasn't fit to them): re-measure the smallest
        # nprobe hitting the target on the maintained bank
        import dataclasses

        from leccr_tpu.serve_ann import calibrate_nprobe

        nprobe, recall = calibrate_nprobe(index,
                                          target_recall=args.ivf_recall)
        index = dataclasses.replace(index, default_nprobe=nprobe)
        print(f"### recalibrated nprobe={nprobe} "
              f"(recall@10 {recall:.3f} >= {args.ivf_recall})", flush=True)
    (save_ivf if ivf else save_index)(index, args.index)
    print(f"### updated index: {n0} -> {index.n_valid} items "
          f"(+{added} -{len(removes)}) -> {args.index}", flush=True)


def export_main(args, cfg):
    """--task export: trained checkpoint -> reference-format torch .pth.

    Migration OUT of the framework: the emitted state_dict loads into the
    reference's model under its strict=False `--checkpoint` path
    (image_Retrieval_caption.py:384-387), so models trained here can be
    evaluated/deployed by reference-based stacks.  `--checkpoint` picks the
    source (orbax dir or torch file); default is the latest orbax step
    under --output_dir."""
    from leccr_tpu.models.weights import (export_reference_state_dict,
                                          save_reference_checkpoint)
    from leccr_tpu.serve import load_params_for_inference

    if not args.export_path:
        raise SystemExit("--task export requires --export_path "
                         "(destination .pth)")
    params = load_params_for_inference(cfg, args.checkpoint or None)
    sd = export_reference_state_dict(params, cfg)
    Path(args.export_path).parent.mkdir(parents=True, exist_ok=True)
    save_reference_checkpoint(sd, args.export_path)
    print(f"### exported {len(sd)} tensors -> {args.export_path}",
          flush=True)


def serve_main(args, cfg):
    """--task serve: checkpoint + saved index -> HTTP retrieval service."""
    import threading

    from leccr_tpu.serve import Embedder, load_index
    from leccr_tpu.serve_frontend import DynamicBatcher, ServingFrontend

    if not args.index:
        raise SystemExit("--task serve requires --index "
                         "(a serve.save_index directory)")
    if cfg.data.dataset == "synthetic":
        # a config snapshot from a synthetic-data run still says
        # "synthetic": materialize the corpus paths (tokenizer vocab
        # included) exactly as the trainer does
        from leccr_tpu.train.trainer import build_datasets

        build_datasets(cfg)
    emb = Embedder.from_config(cfg, checkpoint=args.checkpoint or None,
                               batch_size=args.serve_bs)
    from leccr_tpu.serve_ann import is_ivf_save, load_ivf

    if is_ivf_save(args.index):
        index = load_ivf(args.index)
        print(f"### IVF index: {index.n_valid} items, "
              f"C={index.n_clusters}"
              + (" (int8)" if index.quantized else ""), flush=True)
    else:
        index = load_index(args.index)
        print(f"### index: {index.n_valid} items"
              + (" (int8)" if index.quantized else ""), flush=True)
    batcher = DynamicBatcher(emb, index, max_delay=args.max_delay_ms / 1000,
                             max_pending=args.max_pending or None)
    frontend = ServingFrontend(batcher, host=args.host, port=args.port)
    # warm the compiled search paths so the first real query isn't a
    # compile; indexes with slots (video / caption double-sim) also get
    # the minmax-fusion program, the one their clients actually use
    batcher.search(["warmup"], k=min(10, index.n_valid))
    if (cfg.model.vision.kind == "temporal"
            and getattr(index, "slots", None) is not None):
        # video clients search with the double-sim fusion
        # (video_Retrieval_caption_double_sim.py eval): warm that program
        batcher.search(["warmup"], k=min(10, index.n_valid),
                       fusion="minmax")
    print(f"### serving on http://{frontend.host}:{frontend.port} "
          "(POST /search, GET /healthz, GET /stats)", flush=True)
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        pass
    finally:
        frontend.close()


def main():
    args = parse_args()
    if os.environ.get("LECCR_PLATFORM"):
        # explicit backend override (e.g. CPU debugging; some TPU transport
        # plugins ignore the JAX_PLATFORMS env var)
        import jax

        jax.config.update("jax_platforms", os.environ["LECCR_PLATFORM"])
    if args.multihost:
        import jax

        jax.distributed.initialize()

    from leccr_tpu.config import load_config

    config_path = args.config
    if not config_path:
        # per-task default configs (reference run.py:125 falls back to
        # f"configs/{args.model}/Retrieval_coco.yaml" when --config is
        # missing; our live tasks get the flagship recipe per family)
        defaults = {"itr_caption": "configs/multi30k_fr.yaml",
                    "vtr_caption": "configs/msrvtt.yaml"}
        if args.task not in defaults:
            raise SystemExit(f"--config is required for --task {args.task}")
        config_path = str(Path(__file__).parent / defaults[args.task])
        print(f"### no --config given; using the {args.task} default: "
              f"{config_path}")
    if config_path.startswith("hdfs://"):
        # stage remote config locally before parsing (reference
        # run.py:180-189 hdfs-fetches config/checkpoint up front)
        import tempfile

        from leccr_tpu.utils import io as uio

        if not uio.exists(config_path):
            raise FileNotFoundError(f"config not found: {config_path}")
        local = tempfile.NamedTemporaryFile(
            suffix=Path(config_path).suffix or ".yaml", delete=False)
        local.close()
        # real `hdfs dfs -get` refuses to overwrite an existing file — the
        # tempfile reserves the name, so remove it before staging
        os.unlink(local.name)
        uio.copy(config_path, local.name)
        config_path = local.name
    cfg = load_config(config_path)
    cfg.task = args.task
    cfg.output_dir = args.output_dir
    if args.output_dir.startswith("hdfs://"):
        # hdfs output dir: stage locally (deterministic path so a restarted
        # job reuses it), mirror up after every checkpointed epoch; on
        # --resume with an empty local stage, pull the remote dir down
        # first so orbax finds the checkpoints
        import re
        import tempfile

        from leccr_tpu.utils import io as uio

        cfg.remote_output_dir = args.output_dir
        local_out = os.path.join(
            tempfile.gettempdir(), "leccr_stage",
            re.sub(r"[^\w.-]+", "_", args.output_dir[len("hdfs://"):]))
        cfg.output_dir = local_out
        if args.resume and not os.path.exists(
                os.path.join(local_out, "checkpoints")) and uio.exists(
                args.output_dir):
            # contents-mirroring download: local_out/<name> == remote/<name>
            # (a whole-dir -get into an existing dir would nest the tree
            # under the remote basename and orbax would miss `checkpoints`)
            uio.stage_remote_dir(args.output_dir, local_out)
            print(f"### staged {args.output_dir} -> {local_out}", flush=True)
        args.output_dir = local_out
    if args.seed is not None:
        cfg.train.seed = args.seed
    if args.epoch > 0:
        cfg.train.schedular.epochs = args.epoch
        print(f"### set epochs to: {args.epoch}", flush=True)
    if args.bs > 0:
        cfg.train.batch_size_train = args.bs
    if args.resume:
        cfg.train.resume = True
    if args.task == "vtr_caption":
        assert cfg.model.vision.kind == "temporal", (
            "vtr_caption needs a temporal vision tower in the config")
    if args.task == "serve":
        serve_main(args, cfg)
        return
    if args.task == "build_index":
        build_index_main(args, cfg)
        return
    if args.task == "update_index":
        update_index_main(args, cfg)
        return
    if args.task == "export":
        export_main(args, cfg)
        return

    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    cfg.save(os.path.join(args.output_dir, "config.json"))

    from leccr_tpu.train.trainer import Trainer

    devices = None
    if args.devices > 0:
        import jax

        devices = jax.local_devices()[: args.devices]
    trainer = Trainer(cfg, devices=devices)
    if args.checkpoint and args.checkpoint != "null":
        from leccr_tpu.models.weights import load_initial_checkpoint

        trainer.state.params = load_initial_checkpoint(
            args.checkpoint, trainer.state.params, cfg)
        print(f"### loaded initial checkpoint from {args.checkpoint}")

    trainer.fit(evaluate_only=args.evaluate)


if __name__ == "__main__":
    main()
