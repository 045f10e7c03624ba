"""Golden-readiness kit: released weights -> zero-shot Table 2/3/4 report
in ONE command.

The north-star accuracy check (BASELINE.json: EPE/bad-2 parity with the
PyTorch reference using the released checkpoints) could never run in the
build environment — no egress for `sceneflow.tar` / DAv2 weights, no
benchmark datasets on disk.  This script makes the repo one command away
from it the moment those files appear:

    python tools/golden_eval.py \
        --stereo-ckpt /path/sceneflow.tar \
        --mono-ckpt   /path/depth_anything_v2_vitl.pth \
        --data middlebury=/data/mb2014/trainingH \
        --data kitti2015=/data/kitti15/training \
        [--data eth3d=... booster=... layeredflow=... monotrap=...]

Per dataset it runs the full convert -> eval pipeline (cli eval: torch
checkpoint conversion, per-dataset DAv2 input sizes, shipped iscale/oscale
bundles, pad-32 + shape-bucketed compiles, guided metrics) and prints each
headline metric next to the paper's published value (BASELINE.md) with the
delta, plus the LaTeX-ready row in the reference's table format
(reference test.py:367-392, sterereere.md Tables 2/3/4).

Tolerances: the paper reports 2 decimals; BASELINE.json asks for parity,
so the report flags |delta| > 0.5pp on bad-tau and > 0.1px on avgerr.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Published zero-shot numbers (sterereere.md Tables 2/3/4; see BASELINE.md).
# bad-tau values are FRACTIONS here (guided_metrics convention); the paper
# prints them x100.
PUBLISHED = {
    "middlebury": {"bad 2.0": 0.0696, "noc bad 2.0": 0.0475, "occ bad 2.0": 0.2034, "avgerr": 0.94},
    "middlebury2021": {"bad 2.0": 0.0797, "avgerr": 1.08},
    "eth3d": {"bad 1.0": 0.0166, "avgerr": 0.24},
    "kitti2012": {"bad 3.0": 0.0390, "avgerr": 0.83},
    "kitti2015": {"bad 3.0": 0.0393, "avgerr": 0.97},
    "booster": {"bad 2.0": 0.0901, "bad 4.0": 0.0540, "bad 6.0": 0.0412, "bad 8.0": 0.0334, "avgerr": 1.21},
    "layeredflow": {"bad 1.0": 0.8183, "bad 3.0": 0.5766, "bad 5.0": 0.4512, "avgerr": 11.20},
    # depth metrics are already percent-valued where applicable
    # (eval/metrics.py depth_metrics: avgrelerr/a1_105 x100, rms in meters)
    "monotrap": {"depth/avgrelerr": 3.50, "depth/rms": 0.06, "depth/a1_105": 80.27},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stereo-ckpt", required=True, help="released sceneflow.tar (or converted .msgpack)")
    ap.add_argument("--mono-ckpt", required=True, help="depth_anything_v2_vitl.pth (or .msgpack)")
    ap.add_argument("--mono-encoder", default="vitl")
    ap.add_argument("--data", action="append", required=True,
                    metavar="DATASET=PATH", help="repeatable: middlebury=/path/...")
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--max-samples", type=int, default=None)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()

    from stereoanywhere_tpu.cli import main as cli_main
    from stereoanywhere_tpu.eval.report import BENCHMARK_HEADLINE_KEYS, latex_row

    report = {}
    for spec in args.data:
        name, path = spec.split("=", 1)
        argv = [
            "eval", "--dataset", name, "--datapath", path,
            "--checkpoint", args.stereo_ckpt,
            "--mono-checkpoint", args.mono_ckpt,
            "--mono-encoder", args.mono_encoder,
            "--iters", str(args.iters), "--dtype", args.dtype,
        ]
        if args.max_samples:
            argv += ["--max-samples", str(args.max_samples)]
        if args.csv:
            argv += ["--csv", args.csv]
        print(f"\n=== {name} ({path}) ===", flush=True)
        report[name] = cli_main(argv)

    print("\n" + "=" * 72)
    print("Zero-shot report vs published (sterereere.md Tables 2/3/4)")
    print("=" * 72)
    failures = 0
    for name, means in report.items():
        keys = BENCHMARK_HEADLINE_KEYS.get(name, tuple(PUBLISHED.get(name, means)))
        print(f"\n{name}:")
        for k in keys:
            ours = means.get(k, float("nan"))
            pub = PUBLISHED.get(name, {}).get(k)
            pct = "bad" in k  # guided_metrics bad-tau are fractions
            scale = 100.0 if pct else 1.0
            # pp tolerance on percent-valued metrics, 0.1 px/m otherwise
            tol = 0.5 if (pct or "a1_" in k or "relerr" in k) else 0.1
            line = f"  {k:>14s}: {ours * scale:7.2f}"
            if pub is not None:
                delta = (ours - pub) * scale
                flag = "" if abs(delta) <= tol else "  <-- OUT OF TOLERANCE"
                if flag:
                    failures += 1
                line += f"   published {pub * scale:7.2f}   delta {delta:+.2f}{flag}"
            print(line)
        print("  latex: " + latex_row(means, keys))
    print(
        f"\n{'PARITY OK' if failures == 0 else f'{failures} metric(s) out of tolerance'}"
    )
    sys.exit(0 if failures == 0 else 2)


if __name__ == "__main__":
    main()
