"""Bisect the fused-ConvLSTM Pallas kernel against the remote compiler.

Round-1 left ops/convlstm_fused_pallas.py interpret-only: the environment's
remote-compile helper crashed on it with an opaque HTTP 500.  This ladder
compiles + parity-checks + times kernel variants from trivial to full on the
real TPU, isolating which construct breaks and which variant is fastest:

  A  trivial elementwise copy kernel                 (sanity)
  B  shipped fused_lstm_gates                        (known-good round 1)
  C  shifted-matmul 3x3 conv, whole-image BlockSpec  (tests the 9 dots)
  D  C + fused gate math                             (conv+gates, no DMA)
  H  D with row blocks over a pre-halo'd input       (BlockSpec-only tiling)
  E  row blocks, manual HBM->VMEM DMA via scratch_shapes (no run_scoped)
  F  the full round-1 kernel (run_scoped)            (the one that 500'd)
  X  XLA reference (conv_general_dilated + fused jnp gate chain) timing

    python scripts/pallas_bisect.py [--variants ABCDHEFX] [--big]
"""

import argparse
import functools
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evolutionary_illusion_generator_tpu.utils.compilation_cache import (
    enable_compilation_cache,
)


# --------------------------------------------------------------------------
# reference math


def xla_reference(x, w, b, c_prev):
    gates = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b.astype(jnp.float32)
    C = c_prev.shape[-1]
    i = jax.nn.sigmoid(gates[..., 0 * C : 1 * C])
    f = jax.nn.sigmoid(gates[..., 1 * C : 2 * C])
    o = jax.nn.sigmoid(gates[..., 2 * C : 3 * C])
    g = jnp.tanh(gates[..., 3 * C : 4 * C])
    c = f * c_prev.astype(jnp.float32) + i * g
    h = o * jnp.tanh(c)
    return h, c


# --------------------------------------------------------------------------
# variants


def variant_A(x, w, b, c_prev):
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(c_prev.shape, jnp.float32),
    )(c_prev.astype(jnp.float32))
    return out, out


def variant_B(x, w, b, c_prev):
    from evolutionary_illusion_generator_tpu.ops.convlstm_pallas import (
        fused_lstm_gates,
    )

    gates = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b.astype(jnp.float32)
    return fused_lstm_gates(gates, c_prev)


def _shifted_dots(xpad, w, rows, W, C4):
    """9-tap shifted matmul: xpad (rows+2, W+2, Cin) -> (rows, W, 4C) f32."""
    acc = jnp.zeros((rows, W, C4), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            tap = xpad[ky : ky + rows, kx : kx + W, :]
            acc = acc + jax.lax.dot_general(
                tap,
                w[ky, kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc


def variant_C(x, w, b, c_prev):
    """Conv only, one whole (padded) image per grid step, BlockSpec-only."""
    B, H, W, Cin = x.shape
    C4 = w.shape[3]
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)))

    def kernel(x_ref, w_ref, b_ref, o_ref):
        acc = _shifted_dots(x_ref[0], w_ref[:].astype(jnp.bfloat16), H, W, C4)
        o_ref[0] = acc + b_ref[:].astype(jnp.float32)

    gates = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, Cin), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, Cin, C4), lambda bi: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C4,), lambda bi: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C4), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C4), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
    )(xp, w, b)
    C = C4 // 4
    i = jax.nn.sigmoid(gates[..., :C])
    f = jax.nn.sigmoid(gates[..., C : 2 * C])
    o = jax.nn.sigmoid(gates[..., 2 * C : 3 * C])
    g = jnp.tanh(gates[..., 3 * C :])
    c = f * c_prev.astype(jnp.float32) + i * g
    return o * jnp.tanh(c), c


def _gate_update(acc, b_ref, c_prev, C):
    gates = acc + b_ref[:].astype(jnp.float32)
    i = jax.nn.sigmoid(gates[..., 0 * C : 1 * C])
    f = jax.nn.sigmoid(gates[..., 1 * C : 2 * C])
    o = jax.nn.sigmoid(gates[..., 2 * C : 3 * C])
    g = jnp.tanh(gates[..., 3 * C : 4 * C])
    c = f * c_prev + i * g
    h = o * jnp.tanh(c)
    return h, c


def variant_D(x, w, b, c_prev):
    """Fused conv+gates, one whole image per grid step, BlockSpec-only."""
    B, H, W, Cin = x.shape
    C4 = w.shape[3]
    C = C4 // 4
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)))

    def kernel(x_ref, w_ref, b_ref, c_ref, h_out, c_out):
        acc = _shifted_dots(x_ref[0], w_ref[:].astype(jnp.bfloat16), H, W, C4)
        h, c = _gate_update(acc, b_ref, c_ref[0].astype(jnp.float32), C)
        h_out[0] = h.astype(h_out.dtype)
        c_out[0] = c

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, Cin), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, Cin, C4), lambda bi: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C4,), lambda bi: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, C), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, H, W, C), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, C), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), c_prev.dtype),
            jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
    )(xp, w, b, c_prev)


def variant_H(x, w, b, c_prev, rows=32):
    """Fused conv+gates over row blocks of a PRE-HALO'D input copy.

    BlockSpec cannot express overlapping windows; instead the halo overlap
    is materialized once in HBM ((rows+2)/rows extra x-traffic) and the
    kernel tiles cleanly."""
    B, H, W, Cin = x.shape
    C4 = w.shape[3]
    C = C4 // 4
    nblk = H // rows
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)))
    # (B, nblk, rows+2, W+2, Cin) overlapped view, materialized
    xh = jnp.stack(
        [xp[:, i * rows : i * rows + rows + 2] for i in range(nblk)], axis=1
    )

    def kernel(x_ref, w_ref, b_ref, c_ref, h_out, c_out):
        acc = _shifted_dots(
            x_ref[0, 0], w_ref[:].astype(jnp.bfloat16), rows, W, C4
        )
        h, c = _gate_update(acc, b_ref, c_ref[0].astype(jnp.float32), C)
        h_out[0] = h.astype(h_out.dtype)
        c_out[0] = c

    return pl.pallas_call(
        kernel,
        grid=(B, nblk),
        in_specs=[
            pl.BlockSpec((1, 1, rows + 2, W + 2, Cin),
                         lambda bi, r: (bi, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, Cin, C4), lambda bi, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C4,), lambda bi, r: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, W, C), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, rows, W, C), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, W, C), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), c_prev.dtype),
            jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(xh, w, b, c_prev)


def variant_E(x, w, b, c_prev, rows=32):
    """Row blocks with manual HBM->VMEM DMA via scratch_shapes (no
    run_scoped)."""
    B, H, W, Cin = x.shape
    C4 = w.shape[3]
    C = C4 // 4
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)))

    def kernel(x_hbm, w_ref, b_ref, c_ref, h_out, c_out, x_vmem, sem):
        bi = pl.program_id(0)
        r = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(r * rows, rows + 2)], x_vmem, sem
        )
        copy.start()
        copy.wait()
        acc = _shifted_dots(
            x_vmem[:].astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
            rows, W, C4,
        )
        h, c = _gate_update(acc, b_ref, c_ref[0].astype(jnp.float32), C)
        h_out[0] = h.astype(h_out.dtype)
        c_out[0] = c

    return pl.pallas_call(
        kernel,
        grid=(B, H // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 3, Cin, C4), lambda bi, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C4,), lambda bi, r: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, W, C), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, rows, W, C), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, W, C), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), c_prev.dtype),
            jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, W + 2, Cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(xp, w, b, c_prev)


def variant_E2(x, w, b, c_prev, rows=32):
    """E with the halo'd width padded to a multiple of 8 (Mosaic tiling).

    The round-1 'HTTP 500' decoded on-hardware (2026-08-17) to: "Mosaic
    failed to compile TPU kernel: Slice shape along dimension 2 must be
    aligned to tiling (8), but is 130" — W+2 halo width breaks sublane
    alignment for memref slices/DMA.  Padding the width to W+8 fixes it;
    the kernel simply ignores the 6 slack columns."""
    B, H, W, Cin = x.shape
    C4 = w.shape[3]
    C = C4 // 4
    # bf16 sublane tiling is (8)x(2 packed) = 16 — align the halo'd width
    # to 16, not 8 (the second Mosaic diagnostic after the 130->136 fix)
    Wp = ((W + 2 + 15) // 16) * 16
    xp = jnp.pad(
        x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, Wp - W - 1), (0, 0))
    )

    def kernel(x_hbm, w_ref, b_ref, c_ref, h_out, c_out, x_vmem, sem):
        bi = pl.program_id(0)
        r = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(r * rows, rows + 2)], x_vmem, sem
        )
        copy.start()
        copy.wait()
        acc = _shifted_dots(
            x_vmem[:].astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
            rows, W, C4,
        )
        h, c = _gate_update(acc, b_ref, c_ref[0].astype(jnp.float32), C)
        h_out[0] = h.astype(h_out.dtype)
        c_out[0] = c

    return pl.pallas_call(
        kernel,
        grid=(B, H // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 3, Cin, C4), lambda bi, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C4,), lambda bi, r: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, W, C), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, rows, W, C), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, W, C), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), c_prev.dtype),
            jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, Wp, Cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(xp, w, b, c_prev)


def variant_H2(x, w, b, c_prev, rows=32):
    """H with the materialized halo windows padded to aligned width."""
    B, H, W, Cin = x.shape
    C4 = w.shape[3]
    C = C4 // 4
    nblk = H // rows
    Wp = ((W + 2 + 15) // 16) * 16
    xp = jnp.pad(
        x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, Wp - W - 1), (0, 0))
    )
    xh = jnp.stack(
        [xp[:, i * rows : i * rows + rows + 2] for i in range(nblk)], axis=1
    )  # (B, nblk, rows+2, Wp, Cin)

    def kernel(x_ref, w_ref, b_ref, c_ref, h_out, c_out):
        acc = _shifted_dots(
            x_ref[0, 0], w_ref[:].astype(jnp.bfloat16), rows, W, C4
        )
        h, c = _gate_update(acc, b_ref, c_ref[0].astype(jnp.float32), C)
        h_out[0] = h.astype(h_out.dtype)
        c_out[0] = c

    return pl.pallas_call(
        kernel,
        grid=(B, nblk),
        in_specs=[
            pl.BlockSpec((1, 1, rows + 2, Wp, Cin),
                         lambda bi, r: (bi, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, Cin, C4), lambda bi, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C4,), lambda bi, r: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, W, C), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, rows, W, C), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, W, C), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), c_prev.dtype),
            jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(xh, w, b, c_prev)


def variant_F(x, w, b, c_prev):
    from evolutionary_illusion_generator_tpu.ops.convlstm_fused_pallas import (
        fused_convlstm_layer,
    )

    return fused_convlstm_layer(x.astype(jnp.bfloat16), w, b, c_prev,
                                rows_per_block=8)


VARIANTS = {
    "A": variant_A,
    "B": variant_B,
    "C": variant_C,
    "D": variant_D,
    "H": variant_H,
    "E": variant_E,
    "I": variant_H2,  # aligned-width H
    "J": variant_E2,  # aligned-width E
    "F": variant_F,
    "X": xla_reference,
}


def run_variant(name, fn, args, want, check, reps=5):
    t0 = time.time()
    try:
        jitted = jax.jit(fn)
        out = jitted(*args)
        h = np.asarray(out[0], np.float32)
        compile_s = time.time() - t0
    except Exception as e:  # noqa: BLE001
        print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:300]}")
        traceback.print_exc(limit=2)
        return None
    err = float(np.max(np.abs(h - want))) if check and name != "A" else -1.0
    # time: loop the op inside jit to amortize the ~40ms tunnel round trip
    # (CLAUDE.md microbenchmark pitfalls)
    @jax.jit
    def loop(args):
        def body(carry, _):
            h, c = fn(args[0], args[1], args[2], carry)
            return c.astype(args[3].dtype), h.mean()

        _, means = jax.lax.scan(body, args[3], None, length=10)
        return means.sum()

    loop(args)  # compile
    t0 = time.time()
    for _ in range(reps):
        float(loop(args))
    per_op = (time.time() - t0) / reps / 10
    print(
        f"[{name}] ok compile={compile_s:.1f}s max|dh|={err:.2e} "
        f"time/op={per_op * 1e3:.2f} ms"
    )
    return per_op


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="ABXCDHEF")
    p.add_argument("--big", action="store_true",
                   help="north-star layer-1 shape (B=25, 240x320, Cin=240)")
    p.add_argument("--rows", type=int, default=32)
    p.add_argument("--cpu", action="store_true", help="CPU smoke mode")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_compilation_cache()
    if args.big:
        B, H, W, Cin, C = 25, 240, 320, 240, 48
    else:
        B, H, W, Cin, C = 4, 64, 128, 64, 16

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, Cin)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, Cin, 4 * C)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 0.1, (4 * C,)), jnp.bfloat16)
    c_prev = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)
    print(f"backend={jax.default_backend()} shape B{B} {H}x{W} "
          f"Cin{Cin} C{C}")

    want = np.asarray(xla_reference(x, w, b, c_prev)[0], np.float32)
    for name in args.variants:
        fn = VARIANTS[name]
        if name in ("H", "E", "I", "J"):
            fn = functools.partial(fn, rows=args.rows)
        run_variant(name, fn, (x, w, b, c_prev), want, check=True)


if __name__ == "__main__":
    main()
