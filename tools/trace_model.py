"""Device-trace breakdown of one full forward on the real chip.

Captures a jax.profiler trace of a single jitted forward (after warmup),
parses the perfetto trace.json.gz, and prints per-op totals grouped by HLO
op name prefix — the ground truth behind ARCHITECTURE.md's budget tables
(isolated microbenchmarks on this remote runtime mislead; see the
"Measured performance budget" note there).

Usage: python tools/trace_model.py [--size 1024] [--iters 32] [--top 40]
"""
from __future__ import annotations

import argparse
import functools
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def summarize(trace_dir: str, top: int, by_source: bool = False) -> None:
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print("no trace.json.gz produced", file=sys.stderr)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    # Device-lane complete events only (TensorFlow-style perfetto dump:
    # pid/tid map to device lanes; host threads carry python/runtime spans
    # we don't want).  Device lanes are named like "/device:TPU:0 ..." in
    # process_name metadata.
    device_pids = set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "device" in name.lower():
                device_pids.add(ev["pid"])

    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    sources: dict[str, str] = {}
    grand = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        name = ev.get("name", "?")
        totals[name] += dur
        counts[name] += 1
        grand += dur
        # The runtime annotates each HLO span with its originating python
        # line (args.source) — surface it so hot fusions are attributable
        # without hand-parsing the perfetto JSON.
        if name not in sources:
            src = ev.get("args", {}).get("source", "")
            sources[name] = src.replace("/root/repo/", "") if src else ""

    print(f"trace: {path}")
    print(f"device total (sum of op spans): {grand:.2f} ms")
    if by_source:
        # Aggregate by originating python line; unattributed spans fall back
        # to the op-kind prefix (name up to the first '.').  The top-level
        # jit_* umbrella span is dropped (it double-counts its children).
        agg: dict[str, float] = defaultdict(float)
        acnt: dict[str, int] = defaultdict(int)
        for name, ms in totals.items():
            if name.startswith("jit_"):
                continue
            key = sources.get(name) or name.split(".")[0]
            agg[key] += ms
            acnt[key] += counts[name]
        print(f"{'ms':>10}  {'n':>5}  source / op-kind")
        for key, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{ms:10.3f}  {acnt[key]:5d}  {key}")
        return
    print(f"{'ms':>10}  {'n':>5}  op")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        src = sources.get(name, "")
        print(f"{ms:10.3f}  {counts[name]:5d}  {name[:60]:60s}  {src}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--lookup", default="auto", help="lookup_impl: auto|lagged|inline|barrel")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by-source", action="store_true")
    ap.add_argument("--out", default="/tmp/jax_trace_model")
    ap.add_argument(
        "--dump-hlo",
        default="",
        help="also write the optimized HLO text here (maps trace op names to shapes/sources)",
    )
    args = ap.parse_args()

    import stereoanywhere_tpu  # noqa: F401 — XLA dtype flags (no-op if jax preloaded; tpu_jit carries them per-compile)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models import StereoAnywhere

    print(f"backend={jax.default_backend()}", flush=True)
    h = w = args.size
    cfg = StereoAnywhereConfig(compute_dtype=args.dtype, lookup_impl=args.lookup)
    model = StereoAnywhere(cfg)
    rng = np.random.default_rng(0)
    xs = tuple(
        jnp.asarray(rng.uniform(0, 1, (1, h, w, c)).astype(np.float32)) for c in (3, 3, 1, 1)
    )
    tiny = tuple(
        jnp.asarray(rng.uniform(0, 1, (1, 64, 96, c)).astype(np.float32)) for c in (3, 3, 1, 1)
    )
    init_fn = jax.jit(lambda k, *a: model.init(k, *a, iters=1, test_mode=True))
    variables = init_fn(jax.random.PRNGKey(0), *tiny)
    if args.dtype == "bfloat16":
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, variables
        )

    from stereoanywhere_tpu.utils.jit import TPU_COMPILER_OPTIONS

    @functools.partial(jax.jit, compiler_options=TPU_COMPILER_OPTIONS)
    def fwd(im2, im3, m2, m3):
        return jnp.mean(
            model.apply(variables, im2, im3, m2, m3, iters=args.iters, test_mode=True)[
                "disparity"
            ]
        )

    float(fwd(*xs))  # compile + warmup
    float(fwd(*xs))

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        float(fwd(*xs))

    summarize(args.out, args.top, by_source=args.by_source)

    if args.dump_hlo:
        txt = fwd.lower(*xs).compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print(f"optimized HLO -> {args.dump_hlo} ({len(txt)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
