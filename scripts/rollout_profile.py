"""Per-op profile of the (s2d-defaulted) PredNet rollout at chunk shapes.

VERDICT r4 weak #4: the round-1 per-op profile (elementwise E-unit/pool
chain between conv fusions) predates the s2d pixel-layer promotion; the
next perf step must be profile-indicated, not guessed.  This script:

1. jits the production rollout (s2d on/off switchable) at the exact
   north-star chunk shapes (25 x 480x640x3, repeat 20 + extension 2,
   bf16 compute) and times it;
2. wraps one execution in a ``jax.profiler`` trace;
3. parses the perfetto trace (trace.json.gz) and prints the per-op-name
   duration aggregation per process — the real "where does the 84%
   phase go" table.  NB: a ``while.*`` event is the scan wrapper whose
   children are also listed; read shares within it, not against it.

    python scripts/tpu_run.py --log /tmp/prof.log -- \
        python scripts/rollout_profile.py --trace /tmp/rollout_trace
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(trace_dir, top=40):
    """Aggregate per-op durations from a jax.profiler perfetto trace.

    Groups complete ("X") events by process; host/runtime processes
    (python, thunk executors, plugin bookkeeping) are identified by their
    dominant event names and skipped in favor of the HLO-op streams."""
    import gzip
    import json

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print(f"[profile] no trace.json.gz under {trace_dir}")
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path) as f:
        tr = json.load(f)
    evs = tr.get("traceEvents", [])
    proc_names = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e.get("pid")] = e.get("args", {}).get("name", "")
    by_proc = {}
    for e in evs:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        d = by_proc.setdefault(pid, {})
        k = e["name"]
        t, c = d.get(k, (0.0, 0))
        d[k] = (t + e.get("dur", 0) / 1e6, c + 1)  # dur is in us
    HOST_MARKERS = ("block_until_ready", "ThunkExecutor", "PjitFunction",
                    "stop_trace", "$")
    for pid, totals in sorted(by_proc.items()):
        pname = proc_names.get(pid, str(pid))
        # drop pure host/bookkeeping streams
        filtered = {
            k: v for k, v in totals.items()
            if not any(m in k for m in HOST_MARKERS)
        }
        if not filtered:
            continue
        grand = sum(t for t, _ in filtered.values())
        if grand < 1e-4:
            continue
        print(f"\n[profile] process {pname!r} (pid {pid}): "
              f"{grand * 1e3:.1f} ms op time, {len(filtered)} distinct ops")
        print(f"{'op':60s} {'count':>6s} {'ms':>9s} {'%':>6s}")
        acc = 0.0
        for opname, (t, c) in sorted(
            filtered.items(), key=lambda kv: -kv[1][0]
        )[:top]:
            acc += t
            print(f"{opname[:60]:60s} {c:6d} {t * 1e3:9.3f} "
                  f"{100.0 * t / grand:6.2f}")
        print(f"{'(top shown)':60s} {'':6s} {acc * 1e3:9.3f} "
              f"{100.0 * acc / grand:6.2f}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pop", type=int, default=25)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--channels", default="3,48,96,192")
    p.add_argument("--repeat", type=int, default=20)
    p.add_argument("--s2d", default="1", choices=("0", "1"))
    p.add_argument("--trace", default="/tmp/rollout_trace")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--parse_only", default="",
                   help="skip running; parse this existing trace dir")
    args = p.parse_args(argv)
    if args.parse_only:
        parse_trace(args.parse_only)
        return 0
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from evolutionary_illusion_generator_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from evolutionary_illusion_generator_tpu.models.prednet import init_params
    from evolutionary_illusion_generator_tpu.models.prednet.model import (
        rollout_flow_frames,
    )

    channels = tuple(int(x) for x in args.channels.split(","))
    pop, w, h = args.pop, args.width, args.height
    params = init_params(jax.random.PRNGKey(0), channels)
    imgs = jax.random.uniform(
        jax.random.PRNGKey(1), (pop, h, w, channels[0]), jnp.float32
    )
    s2d = args.s2d == "1"

    roll = jax.jit(
        lambda p, im: rollout_flow_frames(
            p, im, repeat=args.repeat, extension=2, pair="population",
            compute_dtype=jnp.bfloat16, s2d_l0=s2d,
        )
    )
    print(f"[profile] backend={jax.default_backend()} pop={pop} {w}x{h} "
          f"stack={channels} s2d={s2d}", flush=True)
    def materialize(out):
        # force completion on backends where block_until_ready returns
        # early for repeated identical executions (the axon tunnel):
        # fetching one element cannot complete before the buffer exists
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.ravel(leaf)[0])

    t0 = time.time()
    lowered = roll.lower(params, imgs)
    compiled = lowered.compile()
    materialize(compiled(params, imgs))
    print(f"[profile] compile+first run {time.time() - t0:.1f}s", flush=True)
    ts = []
    for i in range(3):
        # vary the input so no execution can be deduped against the last
        imgs_i = imgs.at[0, 0, 0, 0].set(float(i) / 7.0)
        materialize(imgs_i)
        t0 = time.time()
        materialize(compiled(params, imgs_i))
        ts.append(time.time() - t0)
    ts.sort()
    steady = ts[1]
    print(f"[profile] steady {steady:.3f}s (all {['%.3f' % t for t in ts]})",
          flush=True)

    # Roofline account from XLA's own cost model (VERDICT r4 weak #4): the
    # compiled executable reports total flops + bytes accessed; paired with
    # the measured steady time that gives achieved TFLOP/s and effective
    # HBM GB/s to read against the chip's peaks (v5e: ~197 bf16 TFLOP/s,
    # ~819 GB/s HBM).
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        fl = float(ca.get("flops", 0.0))
        by = float(ca.get("bytes accessed", 0.0))
        print(f"[roofline] XLA cost model: {fl / 1e12:.2f} TFLOP, "
              f"{by / 1e9:.2f} GB accessed", flush=True)
        if fl:
            print(f"[roofline] achieved {fl / steady / 1e12:.1f} TFLOP/s "
                  f"({100 * fl / steady / 197e12:.1f}% of v5e bf16 peak); "
                  f"arithmetic intensity {fl / max(by, 1):.1f} flop/byte",
                  flush=True)
        if by:
            print(f"[roofline] effective bandwidth {by / steady / 1e9:.0f} "
                  f"GB/s ({100 * by / steady / 819e9:.1f}% of v5e HBM peak)",
                  flush=True)
    except Exception as e:  # cost_analysis is backend-best-effort
        print(f"[roofline] cost_analysis unavailable: {e}", flush=True)

    os.makedirs(args.trace, exist_ok=True)
    jax.profiler.start_trace(args.trace)
    jax.block_until_ready(roll(params, imgs))
    jax.profiler.stop_trace()
    print(f"[profile] trace written to {args.trace}", flush=True)
    parse_trace(args.trace)
    return 0


if __name__ == "__main__":
    sys.exit(main())
