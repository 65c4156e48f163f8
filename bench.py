"""Benchmark: wall-clock seconds per generation at the north-star config.

Measures the fused generation device program (CPPN render -> PredNet 22-step
rollout -> corner/LK flow -> scoring) at the BASELINE.json north-star point:
pop=100, 640x480, color channels [3,48,96,192], Free structure.

The reference publishes no perf numbers (BASELINE.md), so ``vs_baseline`` is
the self-measured speedup over the same pipeline run on CPU: the CPU
baseline is measured once at pop=8 (the pipeline is embarrassingly parallel
over candidates, so cost scales linearly in pop) and cached in
BASELINE_SELF.json.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent XLA compilation cache (best-effort; harmless if the backend
# ignores it)
try:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

POP = int(os.environ.get("BENCH_POP", "100"))
W = int(os.environ.get("BENCH_W", "640"))
H = int(os.environ.get("BENCH_H", "480"))
CHANNELS = (3, 48, 96, 192)
REPS = int(os.environ.get("BENCH_REPS", "3"))
# default microbatch: bound HBM at big configs (CPPN value buffers + PredNet
# states scale with the chunk); 25 divides the pop-100 north-star config
# exactly and measured fastest end to end; 0 = whole population in one shot
_auto_mb = "25" if W * H >= 640 * 480 else "0"
MICROBATCH = int(os.environ.get("BENCH_MICROBATCH", _auto_mb))
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BASELINE_SELF.json")
# last successful on-hardware measurement (committed): the outage fallback
# in main() replays it clearly marked "stale" so a dead tunnel at bench
# time doesn't erase a measurement made earlier the same round
LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LAST_GOOD.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _parse_bench_pallas(value):
    """BENCH_PALLAS: 0 = XLA chain, 1 = fused gate kernel, 2 = fully-fused
    ConvLSTM layer kernel ('fused')."""
    table = {"0": False, "1": True, "2": "fused"}
    if value not in table:
        raise SystemExit(
            f"BENCH_PALLAS={value!r} invalid: use 0 (XLA chain), "
            "1 (fused gate kernel) or 2 (fused ConvLSTM layer kernel)"
        )
    return table[value]


def measure_generation(pop, reps, backend_note=""):
    """Median seconds per generation for a pop-sized population."""
    from random import Random

    import jax

    from evolutionary_illusion_generator_tpu.evolution.evaluator import (
        EvalConfig,
        GenerationEvaluator,
    )
    from evolutionary_illusion_generator_tpu.models.prednet import init_params
    from evolutionary_illusion_generator_tpu.ops.flow.api import FlowConfig
    from evolutionary_illusion_generator_tpu.neat import Genome, preset
    from evolutionary_illusion_generator_tpu.structure import StructureType

    neat_cfg = preset("free").replace(pop_size=pop)
    params = init_params(jax.random.PRNGKey(0), CHANNELS)
    cfg = EvalConfig(
        structure=StructureType.Free,
        w=W,
        h=H,
        c_dim=3,
        gradient=1,
        # BENCH_PALLAS: 0 = XLA chain, 1 = fused gate kernel,
        # 2 = fully-fused ConvLSTM layer kernel ("fused")
        use_pallas=_parse_bench_pallas(os.environ.get("BENCH_PALLAS", "0")),
        # BENCH_SUBPIXEL=1: coarse-resolution parity decomposition of the
        # top-down upsample+conv (EvalConfig.subpixel_up)
        subpixel_up=os.environ.get("BENCH_SUBPIXEL", "0") == "1",
        # BENCH_INT8=1: int8-quantized predictor convs (2x MXU throughput,
        # quantization noise on the drift signal — EvalConfig.prednet_int8)
        prednet_int8=os.environ.get("BENCH_INT8", "0") == "1",
        # BENCH_S2D: pixel-layer convs/states in space-to-depth layout
        # (MXU lane packing — EvalConfig.s2d_l0).  Unset = auto (ON for
        # TPU backends — the measured default since the 9.41 s/gen gate,
        # BENCH_NOTES.md "s2d pixel layer"); 0/1 force it off/on.
        s2d_l0=(
            None if "BENCH_S2D" not in os.environ
            else os.environ["BENCH_S2D"] == "1"
        ),
        # BENCH_LK_BF16=1: LK window gathers/products in bfloat16 (solve
        # and accumulation stay f32 — FlowConfig.lk_dtype, ops/flow/lk.py)
        flow=FlowConfig(
            lk_dtype=(
                "bfloat16"
                if os.environ.get("BENCH_LK_BF16", "0") == "1"
                else "float32"
            )
        ),
        microbatch=MICROBATCH,
    )
    evaluator = GenerationEvaluator(cfg, params, neat_cfg)
    rng = Random(0)
    genomes = [Genome.new(i, neat_cfg, rng) for i in range(pop)]
    for g in genomes:
        g.mutate(neat_cfg, rng)
    items = [(g.key, g) for g in genomes]

    log(f"[bench{backend_note}] backend={jax.default_backend()} "
        f"pop={pop} {W}x{H} compiling...")
    t0 = time.time()
    evaluator(items)  # compile + first run
    log(f"[bench{backend_note}] first call (incl. compile): "
        f"{time.time() - t0:.1f}s")

    times = []
    for r in range(reps):
        t0 = time.time()
        evaluator(items)
        times.append(time.time() - t0)
        log(f"[bench{backend_note}] rep {r}: {times[-1]:.3f}s "
            f"(device {evaluator.last_timings['device']:.3f}s, "
            f"score {evaluator.last_timings['score']:.3f}s)")
    times.sort()
    return times[len(times) // 2]


def cpu_baseline():
    """Cached (or freshly measured) CPU seconds/generation at full pop."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            rec = json.load(f)
        if rec.get("w") == W and rec.get("h") == H:
            return rec["sec_per_generation_cpu_est"]
    # pop 8 = the evaluator's minimum population bucket, so the measurement
    # evaluates exactly 8 candidates (no hidden padding inflating the
    # baseline); the pipeline is embarrassingly parallel over candidates so
    # linear scaling to POP is fair.
    mpop = 8
    log(f"[bench] measuring CPU baseline (pop={mpop}, scaled linearly)...")
    code = (
        "import os,sys,json;"
        "sys.path.insert(0, %r);"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import bench;"
        "t = bench.measure_generation(%d, 1, backend_note='/cpu');"
        "print(json.dumps({'t': t}))"
    ) % (os.path.dirname(os.path.abspath(__file__)), mpop)
    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_MICROBATCH="0")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        timeout=7200,
    )
    if out.returncode != 0:
        log(f"[bench] CPU baseline failed: {out.stderr[-500:]}")
        return None
    t8 = json.loads(out.stdout.strip().splitlines()[-1])["t"]
    est = t8 * (POP / mpop)
    with open(BASELINE_CACHE, "w") as f:
        json.dump(
            {
                "sec_per_generation_cpu_est": est,
                "measured_pop": mpop,
                "measured_sec": t8,
                "w": W,
                "h": H,
                "note": "same pipeline on jax-CPU, pop=8 scaled x(pop/8); "
                        "the reference itself cannot run here (chainer/"
                        "submodules absent) so the baseline is self-measured "
                        "per BASELINE.md",
            },
            f,
            indent=2,
        )
    return est


def backend_alive(timeout=300.0, attempts=3, wait_between=420.0):
    """Fast TPU liveness gate before committing to 30-min measurement runs.

    The axon tunnel has two distinct failure modes (BENCH_NOTES "TPU
    outage" section): a stale device claim (drops after ~10-12 min idle)
    and a server-side outage (hours; every client hangs pre-execution or
    raises UNAVAILABLE after a ~25 min RPC deadline).  A 256x256 matmul
    in a subprocess distinguishes "up" from both within ``timeout``
    seconds; spacing retries by ``wait_between`` (> the claim-drop idle
    window) means a transient claim also recovers within one retry.
    Without this gate a dead tunnel burns 3 x 30 min of silent attempts.
    """
    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((256, 256));"
        "(x @ x).block_until_ready();"
        "print('SMOKE_OK')"
    )
    for i in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=timeout,
            )
            if "SMOKE_OK" in out.stdout:
                return True
            log(f"[bench] liveness probe {i}: rc={out.returncode} "
                f"{out.stderr.strip().splitlines()[-1][:200] if out.stderr.strip() else ''}")
        except subprocess.TimeoutExpired:
            log(f"[bench] liveness probe {i}: no device response in "
                f"{timeout:.0f}s")
        if i + 1 < attempts:
            log(f"[bench] waiting {wait_between:.0f}s (stale-claim drop "
                "window) before reprobing")
            time.sleep(wait_between)
    return False


def emit_stale_result():
    """Replay the last committed on-hardware result, marked stale.

    Returns True if a record was printed.  Keeps a real measurement made
    earlier in the round visible when the tunnel is down at bench time —
    the record carries ``"stale": true`` plus its measurement timestamp,
    so it can never be mistaken for a fresh number.
    """
    if not os.path.exists(LAST_GOOD):
        return False
    with open(LAST_GOOD) as f:
        rec = json.load(f)
    rec["stale"] = True
    rec["note"] = (
        "TPU tunnel unreachable at bench time (liveness gate); value is "
        "the most recent on-hardware measurement, taken at "
        f"{rec.get('measured_at', 'unknown')} — see BENCH_NOTES.md "
        "'TPU outage'"
    )
    print(json.dumps(rec))
    return True


def write_last_good(record):
    with open(LAST_GOOD, "w") as f:
        json.dump(record, f, indent=2)


def measure_tpu_subprocess():
    """Run the TPU measurement in a watchdogged subprocess.

    The device tunnel has a rare startup race where a fresh client hangs
    forever on the device claim; a timeout+retry makes the bench robust.
    """
    code = (
        "import sys,json;"
        "sys.path.insert(0, %r);"
        "import bench;"
        "t = bench.measure_generation(bench.POP, bench.REPS);"
        "print('BENCH_RESULT ' + json.dumps({'t': t}))"
    ) % os.path.dirname(os.path.abspath(__file__))
    for attempt in range(3):
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=1800,
            )
        except subprocess.TimeoutExpired:
            log(f"[bench] TPU measurement attempt {attempt} timed out; retrying")
            continue
        sys.stderr.write(out.stderr)
        if out.returncode == 0:
            for line in out.stdout.splitlines():
                if line.startswith("BENCH_RESULT "):
                    return json.loads(line[len("BENCH_RESULT "):])["t"]
        log(f"[bench] TPU measurement attempt {attempt} failed "
            f"(rc={out.returncode}); retrying")
    raise RuntimeError("TPU bench failed after 3 attempts")


def main():
    if not backend_alive():
        log("[bench] TPU backend unreachable after 3 spaced liveness "
            "probes — server-side outage (see BENCH_NOTES 'TPU outage'); "
            "refusing to start 30-min measurement attempts")
        if emit_stale_result():
            return
        raise SystemExit(2)
    time.sleep(30)  # let the probe's device claim drop before the real run
    sec_per_gen = measure_tpu_subprocess()
    evals_per_sec = POP / sec_per_gen
    base = cpu_baseline()
    vs = (base / sec_per_gen) if base else 0.0
    log(f"[bench] {sec_per_gen:.3f}s/gen ({evals_per_sec:.1f} evals/s/chip), "
        f"cpu est {base if base else float('nan')}s -> {vs:.1f}x")
    record = {
        "metric": f"sec_per_generation_pop{POP}_{W}x{H}",
        "value": round(sec_per_gen, 4),
        "unit": "s",
        "vs_baseline": round(vs, 2),
    }
    try:
        write_last_good(
            dict(record, measured_at=time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()))
        )
    except OSError:
        pass
    print(json.dumps(record))


if __name__ == "__main__":
    main()
