"""Fully-fused ConvLSTM layer kernel (Pallas/TPU) — round-2 prototype.

One pass per layer step: the 3x3 gate convolution (shifted-matmul
formulation — nine MXU dots against weight slices, no im2col buffer), bias,
gate nonlinearities, and the cell/hidden update, reading x and c_prev once
and writing h and c once.  XLA currently splits this chain into ~6 fusions
with intermediate HBM round-trips (see BENCH_NOTES.md profile); fusing it is
the identified next step-change for the rollout.

Row blocks overlap by the conv halo, which standard BlockSpec blocking can't
express — the input stays in HBM (``pltpu.ANY``) and each program DMAs its
(rows+2) window into a VMEM scratch explicitly.

Status: correctness-complete (parity-tested against the reference jnp math
in interpret mode on CPU).  This environment's remote-compile helper
crashes on the kernel with an opaque HTTP 500 (no Mosaic diagnostic is
relayed), so on-hardware timing is pending a local-compile environment;
integration into the rollout (per-layer shapes, the summed multi-source
gate conv, upsample input) is ROADMAP item 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_convlstm_layer"]


def _make_kernel(rows: int, W: int, Cin: int, C: int):
    def kernel(x_hbm, w_ref, b_ref, c_ref, h_out_ref, c_out_ref):
        bi = pl.program_id(0)
        r = pl.program_id(1)

        def body(x_vmem, sem):
            # DMA this block's input rows (+halo) from HBM
            copy = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(r * rows, rows + 2)], x_vmem, sem
            )
            copy.start()
            copy.wait()

            x = x_vmem[:].astype(jnp.bfloat16)  # (rows+2, W+2, Cin)
            # contract the channel dim directly ((rows, W, Cin) x (Cin, 4C))
            # — no cross-dim reshapes, which Mosaic cannot always lower
            acc = jnp.zeros((rows, W, 4 * C), jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    tap = x[ky : ky + rows, kx : kx + W, :]
                    acc = acc + jax.lax.dot_general(
                        tap,
                        w_ref[ky, kx].astype(jnp.bfloat16),
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            gates = acc + b_ref[:].astype(jnp.float32)

            i = jax.nn.sigmoid(gates[..., 0 * C : 1 * C])
            f = jax.nn.sigmoid(gates[..., 1 * C : 2 * C])
            o = jax.nn.sigmoid(gates[..., 2 * C : 3 * C])
            g = jnp.tanh(gates[..., 3 * C : 4 * C])
            c_prev = c_ref[0].astype(jnp.float32)
            c = f * c_prev + i * g
            h = o * jnp.tanh(c)
            h_out_ref[0] = h.astype(h_out_ref.dtype)
            c_out_ref[0] = c.astype(c_out_ref.dtype)

        pl.run_scoped(
            body,
            x_vmem=pltpu.VMEM((rows + 2, W + 2, Cin), x_hbm.dtype),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("rows_per_block", "interpret"))
def fused_convlstm_layer(
    x, w, b, c_prev, rows_per_block: int = 8, interpret: bool = False
):
    """One fused ConvLSTM layer update.

    Args:
      x: (B, H, W, Cin) layer input (the concatenated E/R/up sources).
      w: (3, 3, Cin, 4C) gate conv kernel (HWIO).
      b: (4C,) bias.
      c_prev: (B, H, W, C) previous cell state.
    Returns:
      (h, c): h in c_prev's dtype, c in f32, both (B, H, W, C).
    """
    B, H, W, Cin = x.shape
    C4 = w.shape[3]
    C = C4 // 4
    assert H % rows_per_block == 0, (H, rows_per_block)
    rows = rows_per_block
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    grid = (B, H // rows)
    h, c = pl.pallas_call(
        _make_kernel(rows, W, Cin, C),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((3, 3, Cin, C4), lambda bi, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C4,), lambda bi, r: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, rows, W, C),
                lambda bi, r: (bi, r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, rows, W, C),
                lambda bi, r: (bi, r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows, W, C),
                lambda bi, r: (bi, r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), c_prev.dtype),
            jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(xp, w, b, c_prev)
    return h, c
