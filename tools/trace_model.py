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
    module_lanes = set()  # (pid, tid) of "XLA Modules" whole-program umbrellas
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "device" in name.lower():
                device_pids.add(ev["pid"])
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            lane = ev.get("args", {}).get("name", "")
            # Modules = whole-program umbrellas; Steps = step markers;
            # TC Overlay = duplicated overlay spans.  All three would
            # double-count the op lanes.
            if "Module" in lane or lane in ("Steps", "TC Overlay"):
                module_lanes.add((ev["pid"], ev.get("tid", 0)))

    # The runtime emits NESTED spans on the device op lane (e.g. the GRU
    # `while` umbrella contains every in-loop op, and fusions can contain
    # sub-spans) — naively summing durations double-counts.  Keep LEAF
    # spans only: sort by (start, -dur) and drop any span that strictly
    # contains a later span (stack-based containment sweep, per pid/tid).
    raw = [
        ev
        for ev in trace.get("traceEvents", [])
        if ev.get("ph") == "X"
        and ev.get("pid") in device_pids
        and (ev["pid"], ev.get("tid", 0)) not in module_lanes
    ]
    by_lane: dict[tuple, list] = defaultdict(list)
    for ev in raw:
        by_lane[(ev["pid"], ev.get("tid", 0))].append(ev)
    leaves = []
    for lane in by_lane.values():
        lane.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end_ts, ev, has_child)
        for ev in lane:
            s, t = ev["ts"], ev["ts"] + ev.get("dur", 0)
            while stack and stack[-1][0] <= s + 1e-9:
                end, parent, has_child = stack.pop()
                if not has_child:
                    leaves.append(parent)
            if stack:
                stack[-1] = (stack[-1][0], stack[-1][1], True)
            stack.append((t, ev, False))
        while stack:
            end, parent, has_child = stack.pop()
            if not has_child:
                leaves.append(parent)

    # loop/base split: leaves inside the biggest `while.*` umbrella span are
    # the GRU scan body; everything else is "base".
    loop_span = None
    for ev in raw:
        if ev.get("name", "").startswith("while") and (
            loop_span is None or ev.get("dur", 0) > loop_span.get("dur", 0)
        ):
            loop_span = ev
    loop_iv = (
        (loop_span["ts"], loop_span["ts"] + loop_span["dur"]) if loop_span else None
    )
    loop_ms = (loop_span["dur"] / 1e3) if loop_span else 0.0

    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    sources: dict[str, str] = {}
    grand = 0.0
    for ev in leaves:
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        name = ev.get("name", "?")
        if loop_iv and ev["ts"] >= loop_iv[0] and ev["ts"] < loop_iv[1]:
            name = "[loop] " + name
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
    print(f"device total (sum of leaf op spans): {grand:.2f} ms")
    if by_source:
        # Aggregate by originating python line; unattributed spans fall back
        # to the op-kind prefix (name up to the first '.').  The top-level
        # jit_* umbrella span is dropped (it double-counts its children).
        agg: dict[str, float] = defaultdict(float)
        acnt: dict[str, int] = defaultdict(int)
        for name, ms in totals.items():
            if name.startswith("jit_"):
                continue
            pre, bare = ("[loop] ", name[7:]) if name.startswith("[loop] ") else ("", name)
            key = pre + (sources.get(name) or bare.split(".")[0])
            agg[key] += ms
            acnt[key] += counts[name]
        if loop_span is not None:
            print(f"loop umbrella ({loop_span['name']}): {loop_ms:.2f} ms; base: {grand - sum(v for k, v in agg.items() if k.startswith('[loop] ')):.2f} ms")
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
