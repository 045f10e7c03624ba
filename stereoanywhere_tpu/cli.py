"""Command-line entry points: evaluate / train / precompute-mono / serve.

Replaces the reference's per-script argparse CLIs (reference test.py,
train.py, mono_sceneflow.py, demo/fast_demo_server.py) with one typed-config
driver:

  python -m stereoanywhere_tpu.cli eval  --dataset middlebury --datapath ... \
      --checkpoint sceneflow.tar --mono-checkpoint depth_anything_v2_vitl.pth
  python -m stereoanywhere_tpu.cli train --datapath ft;monkaa;driving ...
  python -m stereoanywhere_tpu.cli precompute-mono --dataset sceneflow ...
  python -m stereoanywhere_tpu.cli serve --checkpoint ... --port 8008
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

from stereoanywhere_tpu.utils.jit import tpu_jit


def _load_stereo(checkpoint: str | None, cfg, sample_hw=(64, 96)):
    import jax
    import jax.numpy as jnp

    from stereoanywhere_tpu.models import StereoAnywhere

    model = StereoAnywhere(cfg)
    if checkpoint and checkpoint.endswith(".msgpack"):
        from flax import serialization

        variables = serialization.msgpack_restore(open(checkpoint, "rb").read())
        variables = jax.tree.map(jnp.asarray, variables)
    elif checkpoint:
        from stereoanywhere_tpu.compat import convert_stereo_checkpoint, load_torch_state_dict

        variables = convert_stereo_checkpoint(load_torch_state_dict(checkpoint))
        variables = {k: jax.tree.map(jnp.asarray, v) for k, v in variables.items()}
    else:
        import numpy as np

        h, w = sample_hw
        dummy = tuple(
            jnp.zeros((1, h, w, c), jnp.float32) for c in (3, 3, 1, 1)
        )
        init_fn = tpu_jit(lambda k, *a: model.init(k, *a, iters=1, test_mode=True))
        variables = init_fn(jax.random.PRNGKey(0), *dummy)
    return model, variables


def _load_mono(checkpoint: str | None, encoder: str = "vitl"):
    if not checkpoint:
        return None, None
    import jax.numpy as jnp
    import jax

    from stereoanywhere_tpu.compat import convert_dav2_checkpoint, load_torch_state_dict
    from stereoanywhere_tpu.config import MonoConfig
    from stereoanywhere_tpu.models.dpt import DepthAnythingV2

    cfg = MonoConfig.for_encoder(encoder)
    model = DepthAnythingV2(cfg)
    if checkpoint.endswith(".msgpack"):
        from flax import serialization

        variables = serialization.msgpack_restore(open(checkpoint, "rb").read())
    else:
        variables = convert_dav2_checkpoint(load_torch_state_dict(checkpoint))
    variables = jax.tree.map(jnp.asarray, variables)
    return model, variables


def cmd_eval(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stereoanywhere_tpu.config import EvalConfig, StereoAnywhereConfig
    from stereoanywhere_tpu.data import fetch_dataset
    from stereoanywhere_tpu.eval.harness import DAV2_SIZES, Evaluator, eval_preset

    preset = eval_preset(args.dataset)
    ec = EvalConfig(
        dataset=args.dataset,
        iters=args.iters,
        iscale=preset["iscale"] if args.iscale is None else args.iscale,
        oscale=preset["oscale"] if args.oscale is None else args.oscale,
    )
    cfg = StereoAnywhereConfig(compute_dtype=args.dtype)
    ckpt = args.checkpoint
    if ckpt is None:
        # auto-detect a dropped-in released checkpoint: the day egress
        # exists, `sceneflow.tar` in the working directory (or
        # $SA_CHECKPOINT) runs the published-weights eval with zero extra
        # wiring and the Table-2 comparison prints below
        import os as _os

        cand = _os.environ.get("SA_CHECKPOINT", "sceneflow.tar")
        if _os.path.exists(cand):
            print(f"auto-detected checkpoint: {cand}")
            ckpt = cand
    model, variables = _load_stereo(ckpt, cfg)
    mono_model, mono_vars = _load_mono(args.mono_checkpoint, args.mono_encoder)

    @tpu_jit
    def stereo_jit(im2, im3, m2, m3):
        return model.apply(variables, im2, im3, m2, m3, iters=ec.iters, test_mode=True)[
            "disparity"
        ]

    def stereo_fn(im2, im3, m2, m3):
        return stereo_jit(*[jnp.asarray(x) for x in (im2, im3, m2, m3)])

    mono_fn = None
    if mono_model is not None:
        tw, th = DAV2_SIZES.get(args.dataset, (518, 518))

        def mono_fn(images01, dataset):
            from stereoanywhere_tpu.models.dpt import infer_mono_depth

            return np.asarray(
                infer_mono_depth(mono_model, mono_vars, jnp.asarray(images01), tw, th)
            )

    # iscale/oscale run INSIDE the evaluator (reference test.py:169-176
    # semantics: nearest image downscale, gt downscale + /oscale, metrics at
    # the reduced resolution) — NOT via the dataset-level scale_factor, which
    # is the reference's separate INTER_LINEAR mechanism
    # (base_dataset.py:44-59) and not what the published tables use.
    ds = fetch_dataset(
        args.dataset, args.datapath, test=True, overfit=args.overfit,
        mono=args.mono_precomputed,
    )
    print(f"evaluating {ec.dataset}: {len(ds)} pairs")
    ev = Evaluator(
        stereo_fn, mono_fn, ec.dataset,
        iscale=ec.iscale, oscale=ec.oscale, pad_multiple=ec.pad_multiple,
        save_images_dir=args.save_images,
    )
    t0 = time.time()
    if args.tries > 1:
        # repeatability loop with mean/std reporting (reference test.py:287-392)
        from stereoanywhere_tpu.eval.report import run_tries

        res = None

        def once():
            nonlocal res
            res = ev.run(ds, max_samples=args.max_samples)
            return res.mean()

        means, stds = run_tries(once, args.tries)
        dt = time.time() - t0
        print(json.dumps({k: round(v, 4) for k, v in means.items()}, indent=2))
        print(json.dumps({f"std:{k}": round(v, 4) for k, v in stds.items()}, indent=2))
    else:
        res = ev.run(ds, max_samples=args.max_samples)
        dt = time.time() - t0
        means = res.mean()
        print(json.dumps({k: round(v, 4) for k, v in means.items()}, indent=2))
    print(f"({len(res.per_sample)} samples in {dt:.1f}s)")
    if args.csv:
        res.to_csv(args.csv, {"dataset": ec.dataset, "iters": ec.iters, "tries": args.tries})
    _print_published_comparison(ec.dataset, means, bool(ckpt))
    return means


# Published zero-shot tables for the released SceneFlow checkpoint
# (reference sterereere.md:406-420 Table 2, :475-494 Table 3, :530-541
# Table 4) — printed next to a real-weights eval for a direct comparison.
PUBLISHED = {
    "middlebury": {"bad 2.0": 0.0696, "avgerr": 0.94},
    "middlebury2021": {"bad 2.0": 0.0797, "avgerr": 1.08},
    "eth3d": {"bad 1.0": 0.0166, "avgerr": 0.24},
    "kitti2012": {"bad 3.0": 0.0390, "avgerr": 0.83},
    "kitti2015": {"bad 3.0": 0.0393, "avgerr": 0.97},
    "booster": {"bad 2.0": 0.0901, "bad 4.0": 0.0540, "bad 6.0": 0.0412,
                "bad 8.0": 0.0334, "avgerr": 1.21},
    "layeredflow": {"bad 1.0": 0.8183, "bad 3.0": 0.5766, "bad 5.0": 0.4512,
                    "avgerr": 11.20},
    "monotrap": {"depth/absrel": 0.0350, "depth/rmse": 0.06},
}


def _print_published_comparison(dataset: str, means: dict, have_ckpt: bool):
    pub = PUBLISHED.get(dataset)
    if not pub:
        return
    tag = "" if have_ckpt else "  [random init — comparison meaningless]"
    print(f"published ({dataset}, SceneFlow ckpt, paper Tables 2-4):{tag}")
    for k, v in pub.items():
        got = means.get(k)
        got_s = f"{got:.4f}" if got is not None else "-"
        print(f"  {k:14s} paper {v:.4f}   ours {got_s}")


def cmd_train(args):
    import numpy as np

    from stereoanywhere_tpu.config import StereoAnywhereConfig, TrainConfig
    from stereoanywhere_tpu.data import fetch_dataset
    from stereoanywhere_tpu.data.augmentor import DisparityAugmentor
    from stereoanywhere_tpu.parallel.mesh import make_mesh
    from stereoanywhere_tpu.train.trainer import Trainer

    # Multi-host setup in one place: rendezvous, global mesh, input shards,
    # batch assembly, cross-host stop consensus.
    shard_index, shard_count = 0, 1
    make_global = None
    stop_consensus = None
    if args.multihost:
        import jax
        from jax.experimental import multihost_utils

        from stereoanywhere_tpu.parallel import multihost as mh

        mh.initialize_distributed()
        shard_index, shard_count = jax.process_index(), jax.process_count()

    tc = TrainConfig(
        lr=args.lr, batch_size=args.batch_size, epochs=args.epochs,
        crop_h=args.crop_h, crop_w=args.crop_w, train_iters=args.iters,
        num_steps=args.num_steps, seed=args.seed, debug_grad=args.debug_grad,
        gt_mono_prob=args.gt_mono_prob,
        things_to_freeze=tuple(filter(None, args.freeze.split(","))),
    )
    aug = DisparityAugmentor(crop_size=(tc.crop_h, tc.crop_w), seed=tc.seed)
    ds = fetch_dataset(args.dataset, args.datapath, test=False, mono=args.mono_precomputed, augmentor=aug)
    steps_per_epoch = max(len(ds) // tc.batch_size, 1)
    total = tc.num_steps if tc.num_steps > 0 else steps_per_epoch * tc.epochs

    if args.multihost:
        mesh = mh.make_global_mesh()
        n_data = mesh.shape["data"]
        if tc.batch_size % n_data != 0 or tc.batch_size % shard_count != 0:
            raise SystemExit(
                f"--batch-size {tc.batch_size} must be divisible by the total "
                f"device count {n_data} for multi-host data parallelism"
            )
        make_global = lambda b: mh.global_batch_from_host_shards(b, mesh)  # noqa: E731

        def stop_consensus(local_stop: bool) -> bool:
            # SIGTERM delivery is per-host and may be skewed; hosts must agree
            # before leaving the step loop or collectives deadlock.
            flags = multihost_utils.process_allgather(np.array([local_stop]))
            return bool(np.asarray(flags).any())
    else:
        mesh = make_mesh(data=args.data_parallel) if args.data_parallel > 1 else None
    trainer = Trainer(
        StereoAnywhereConfig(
            compute_dtype=args.dtype,
            volume_corruption_prob=args.corruption_prob,
        ),
        tc, total,
        mesh=mesh, checkpoint_dir=args.savedir, sample_shape=(tc.crop_h, tc.crop_w),
    )
    if args.resume:
        trainer.restore(args.resume)

    import jax.numpy as jnp

    from stereoanywhere_tpu.data.loader import PrefetchLoader

    # Observability + provenance (reference train.py:524-529 SummaryWriter +
    # args.json + backup_source_code) — only the first host writes.
    logger = None
    if args.savedir and shard_index == 0:
        from stereoanywhere_tpu.utils.logging import MetricLogger, save_run_provenance

        save_run_provenance(args.savedir, {"model": trainer.model.cfg, "train": tc})
        logger = MetricLogger(args.savedir)

    # Periodic validation with best-checkpoint selection (reference
    # train.py:583-639, --do_validation/--valstep in run_train.sh).
    val_ds = None
    if args.val_datapath:
        val_ds = fetch_dataset(args.val_dataset, args.val_datapath, test=True,
                               mono=args.mono_precomputed)

    step = int(trainer.state.step)
    print(f"training: {len(ds)} pairs, {total} steps, starting at {step}")
    t0 = time.time()
    with PrefetchLoader(
        ds, tc.batch_size, total, seed=tc.seed, start_step=step,
        num_threads=args.loader_threads,
        shard_index=shard_index, shard_count=shard_count,
    ) as loader:
        for step0, batch in loader:
            stop = trainer.stop_requested
            if stop_consensus is not None:
                stop = stop_consensus(stop)
            if stop:
                break
            if make_global is not None:
                logs = trainer.step(make_global(batch))
            else:
                logs = trainer.step({k: jnp.asarray(v) for k, v in batch.items()})
            step = step0 + 1
            if step % args.log_every == 0:
                print(
                    f"step {step}/{total} loss {float(logs['loss/total']):.4f} "
                    f"epe {float(logs['epe/final']):.3f} ({(time.time()-t0)/args.log_every:.2f}s/step)"
                )
                t0 = time.time()
                if logger is not None:
                    logger.log(step, logs)
            if val_ds is not None and step % args.val_every == 0:
                vm = trainer.validate(
                    val_ds, metric=args.val_metric,
                    dataset_name=args.val_dataset, max_samples=args.val_samples,
                )
                print(
                    f"val @ {step}: "
                    + " ".join(f"{k}={v:.4f}" for k, v in sorted(vm.items()))
                )
                if logger is not None:
                    logger.log(step, {f"val/{k}": v for k, v in vm.items()})
            if args.savedir and step % args.save_every == 0:
                trainer.save("latest")
    stopped = trainer.stop_requested
    if stop_consensus is not None:
        stopped = stop_consensus(stopped)  # all hosts must pick the same tag
    if args.savedir:
        trainer.save("stopped" if stopped else "final")


def cmd_precompute_mono(args):
    """Offline DAv2 preprocessing (reference mono_sceneflow.py:85-106):
    writes 16-bit normalized mono PNGs next to the images in `left_DAv2/`
    style directories."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stereoanywhere_tpu.data import fetch_dataset
    from stereoanywhere_tpu.data.frame_utils import write_mono16
    from stereoanywhere_tpu.models.dpt import infer_mono_depth

    mono_model, mono_vars = _load_mono(args.mono_checkpoint, args.mono_encoder)
    assert mono_model is not None, "--mono-checkpoint required"
    ds = fetch_dataset(args.dataset, args.datapath, test=True)
    tag = f"DAv2_{args.mono_encoder}" if args.mono_encoder != "vitl" else "DAv2"
    for i in range(len(ds)):
        s = ds[i]
        for key, img in (("im2", s["im2"]), ("im3", s["im3"])):
            d = np.asarray(
                infer_mono_depth(mono_model, mono_vars, jnp.asarray(img[None]))
            )[0, ..., 0]
            d = (d - d.min()) / max(d.max() - d.min(), 1e-6)
            out = os.path.join(args.outdir, f"{i:06d}_{key}_{tag}.png")
            os.makedirs(args.outdir, exist_ok=True)
            write_mono16(out, d)
        if i % 50 == 0:
            print(f"{i}/{len(ds)}")


def cmd_convert(args):
    """Convert a reference torch checkpoint (.tar/.pth, DataParallel 'module.'
    prefixes handled — reference train.py:647-653 format) into a native flax
    msgpack checkpoint that eval/serve load without torch."""
    from flax import serialization

    from stereoanywhere_tpu.compat import (
        convert_dav2_checkpoint,
        convert_stereo_checkpoint,
        load_torch_state_dict,
    )

    state = load_torch_state_dict(args.input)
    if args.kind == "stereo":
        variables = convert_stereo_checkpoint(state)
    else:
        variables = convert_dav2_checkpoint(state)
    data = serialization.msgpack_serialize(variables)
    with open(args.output, "wb") as f:
        f.write(data)
    import numpy as np

    n = sum(np.asarray(x).size for x in _tree_leaves(variables))
    print(f"wrote {args.output}: {n/1e6:.1f}M params ({len(data)/1e6:.1f} MB)")


def _tree_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _tree_leaves(v)
    else:
        yield tree


def cmd_infer(args):
    """File-pair inference: left/right images -> disparity .npy + colormapped
    PNG (reference demo/fast_demo.py:31-178 CLI surface)."""
    import numpy as np
    from PIL import Image

    import jax.numpy as jnp

    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.serve.pipeline import StereoAnywherePipeline
    from stereoanywhere_tpu.utils.visualization import colorize_disparity

    cfg = StereoAnywhereConfig(compute_dtype=args.dtype)
    _, variables = _load_stereo(args.checkpoint, cfg)
    mono_model, mono_vars = _load_mono(args.mono_checkpoint, args.mono_encoder)
    mesh = None
    if getattr(args, "shard_rows", 1) > 1:
        from stereoanywhere_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=1, tile=args.shard_rows)
    pipe = StereoAnywherePipeline(
        variables, mono_vars, cfg, iters=args.iters, two_stage=args.two_stage, mesh=mesh
    )

    def load(path):
        im = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        if args.iscale != 1.0:
            h, w = im.shape[:2]
            im = np.asarray(
                Image.fromarray((im * 255).astype(np.uint8)).resize(
                    (int(w / args.iscale), int(h / args.iscale)), Image.BILINEAR
                ),
                np.float32,
            ) / 255.0
        return jnp.asarray(im)[None]

    im2, im3 = load(args.left), load(args.right)
    disp = np.asarray(pipe(im2, im3))[0, ..., 0] * args.iscale

    os.makedirs(args.output, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.left))[0]
    np.save(os.path.join(args.output, f"{stem}_disp.npy"), disp)
    Image.fromarray(colorize_disparity(disp)).save(
        os.path.join(args.output, f"{stem}_disp.png")
    )
    print(f"disparity range [{disp.min():.2f}, {disp.max():.2f}] -> {args.output}")


def cmd_camera(args):
    """Live capture loop (reference demo/fast_demo_oak.py): frames from an
    OAK-D camera (needs depthai) or replayed from directories, inferred
    locally or via a remote `cli.py serve` endpoint, EMA-smoothed, written
    as colormapped PNGs."""
    import glob

    import numpy as np
    from PIL import Image

    from stereoanywhere_tpu.serve.camera import (
        CaptureLoop,
        DirectorySource,
        OakDSource,
        disparity_frame,
    )

    if args.source == "oak":
        source = OakDSource(resolution=args.resolution)
    else:
        lefts, rights = sorted(glob.glob(args.left_glob)), sorted(glob.glob(args.right_glob))
        source = DirectorySource(lefts, rights, loop=args.loop)

    if args.server:
        import functools

        from stereoanywhere_tpu.serve.client import infer_remote

        infer = functools.partial(infer_remote, args.server)
    else:
        import jax.numpy as jnp

        from stereoanywhere_tpu.config import StereoAnywhereConfig
        from stereoanywhere_tpu.serve.pipeline import StereoAnywherePipeline

        cfg = StereoAnywhereConfig(compute_dtype=args.dtype)
        _, variables = _load_stereo(args.checkpoint, cfg)
        _, mono_vars = _load_mono(args.mono_checkpoint, args.mono_encoder)
        pipe = StereoAnywherePipeline(variables, mono_vars, cfg, iters=args.iters)

        def infer(l, r):
            return np.asarray(pipe(jnp.asarray(l)[None], jnp.asarray(r)[None]))[0, ..., 0]

    os.makedirs(args.output, exist_ok=True)

    def on_frame(res):
        Image.fromarray(disparity_frame(res["smoothed"])).save(
            os.path.join(args.output, f"frame_{res['index']:05d}.png")
        )
        if res["sgm"] is not None:  # the OAK's on-board SGM comparison stream
            Image.fromarray(disparity_frame(res["sgm"])).save(
                os.path.join(args.output, f"frame_{res['index']:05d}_sgm.png")
            )
        print(f"frame {res['index']}  {res['fps']:.1f} fps")

    n = CaptureLoop(
        infer,
        ema_alpha=args.ema_alpha,
        clip=(args.clip_top, args.clip_bottom, args.clip_left, args.clip_right),
        on_frame=on_frame,
    ).run(source, max_frames=args.max_frames)
    print(f"{n} frames -> {args.output}")


def cmd_serve(args):
    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.serve.pipeline import StereoAnywherePipeline, serve_http

    cfg = StereoAnywhereConfig(compute_dtype=args.dtype)
    _, variables = _load_stereo(args.checkpoint, cfg)
    mono_model, mono_vars = _load_mono(args.mono_checkpoint, args.mono_encoder)
    pipe = StereoAnywherePipeline(variables, mono_vars, cfg, iters=args.iters)
    print(f"serving on :{args.port}")
    serve_http(pipe, port=args.port)


def main(argv=None):
    p = argparse.ArgumentParser(prog="stereoanywhere_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--checkpoint", default=None)
        sp.add_argument("--mono-checkpoint", default=None)
        sp.add_argument("--mono-encoder", default="vitl")
        sp.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
        sp.add_argument("--iters", type=int, default=32)

    pe = sub.add_parser("eval")
    common(pe)
    pe.add_argument("--dataset", required=True)
    pe.add_argument("--datapath", required=True)
    pe.add_argument("--iscale", type=float, default=None,
                    help="input downscale; default = the dataset's shipped "
                    "bundle (booster 4, layeredflow 8, others 1)")
    pe.add_argument("--oscale", type=float, default=None,
                    help="output/eval scale; default = the dataset's shipped bundle")
    pe.add_argument("--overfit", action="store_true")
    pe.add_argument("--max-samples", type=int, default=None)
    pe.add_argument("--mono-precomputed", default=None)
    pe.add_argument("--tries", type=int, default=1,
                    help="repeat the whole eval N times, report mean/std")
    pe.add_argument("--save-images", default=None,
                    help="dump qualitative PNG grids per sample to this dir")
    pe.add_argument("--csv", default=None)
    pe.set_defaults(fn=cmd_eval)

    pt = sub.add_parser("train")
    common(pt)
    pt.add_argument("--dataset", default="sceneflow")
    pt.add_argument("--datapath", required=True)
    pt.add_argument("--lr", type=float, default=1e-4)
    pt.add_argument("--batch-size", type=int, default=2)
    pt.add_argument("--epochs", type=int, default=3)
    pt.add_argument("--crop-h", type=int, default=320)
    pt.add_argument("--crop-w", type=int, default=640)
    pt.add_argument("--data-parallel", type=int, default=1)
    pt.add_argument("--num-steps", type=int, default=0,
                    help="override total steps (0 = epochs * dataset/batch)")
    pt.add_argument("--seed", type=int, default=1337)
    pt.add_argument("--debug-grad", action="store_true",
                    help="per-parameter NaN/Inf gradient census to json")
    pt.add_argument("--gt-mono-prob", type=float, default=0.3)
    pt.add_argument("--corruption-prob", type=float, default=0.3,
                    help="volume-corruption augmentation probability")
    pt.add_argument("--freeze", default="fnet",
                    help="comma list of groups to freeze: fnet,cnet,monoagg")
    pt.add_argument("--val-dataset", default="middlebury")
    pt.add_argument("--val-datapath", default=None,
                    help="enable periodic validation + best-checkpoint "
                         "(val samples need precomputed mono via --mono-precomputed)")
    pt.add_argument("--val-every", type=int, default=1000)
    pt.add_argument("--val-metric", default="bad 2.0")
    pt.add_argument("--val-samples", type=int, default=None)
    pt.add_argument("--multihost", action="store_true",
                    help="multi-process pod training: jax.distributed init, "
                         "global mesh over all hosts, per-host input shards")
    pt.add_argument("--savedir", default=None)
    pt.add_argument("--resume", default=None)
    pt.add_argument("--log-every", type=int, default=20)
    pt.add_argument("--save-every", type=int, default=500)
    pt.add_argument("--mono-precomputed", default=None)
    pt.add_argument("--loader-threads", type=int, default=4,
                    help="prefetch worker threads (0 = synchronous loading)")
    pt.set_defaults(fn=cmd_train, iters=12)

    pc = sub.add_parser("convert")
    pc.add_argument("--input", required=True, help="torch .tar/.pth checkpoint")
    pc.add_argument("--output", required=True, help="output .msgpack path")
    pc.add_argument("--kind", choices=["stereo", "dav2"], default="stereo")
    pc.set_defaults(fn=cmd_convert)

    pm = sub.add_parser("precompute-mono")
    common(pm)
    pm.add_argument("--dataset", required=True)
    pm.add_argument("--datapath", required=True)
    pm.add_argument("--outdir", required=True)
    pm.set_defaults(fn=cmd_precompute_mono)

    pi = sub.add_parser("infer", help="file-pair inference -> .npy + colormap PNG")
    common(pi)
    pi.add_argument("left")
    pi.add_argument("right")
    pi.add_argument("-o", "--output", default=".")
    pi.add_argument("--iscale", type=float, default=1.0)
    pi.add_argument("--shard-rows", type=int, default=1,
                    help="shard image rows over N devices (exact GSPMD path)")
    pi.add_argument("--two-stage", action="store_true",
                    help="mono/stereo as separate programs (lower peak HBM)")
    pi.set_defaults(fn=cmd_infer)

    ps = sub.add_parser("serve")
    common(ps)
    ps.add_argument("--port", type=int, default=8008)
    ps.set_defaults(fn=cmd_serve)

    pcam = sub.add_parser("camera", help="live capture loop (OAK-D or replay)")
    common(pcam)
    pcam.add_argument("--source", default="dir", choices=["dir", "oak"])
    pcam.add_argument("--left-glob", default="left/*.png")
    pcam.add_argument("--right-glob", default="right/*.png")
    pcam.add_argument("--loop", action="store_true", help="replay forever")
    pcam.add_argument("--resolution", default="400", choices=["400", "720", "800"])
    pcam.add_argument("--server", default=None, help="remote serve endpoint")
    pcam.add_argument("-o", "--output", default="camera_out")
    pcam.add_argument("--ema-alpha", type=float, default=0.15)
    pcam.add_argument("--max-frames", type=int, default=None)
    for side in ("top", "bottom", "left", "right"):
        pcam.add_argument(f"--clip-{side}", type=int, default=0)
    pcam.set_defaults(fn=cmd_camera)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
