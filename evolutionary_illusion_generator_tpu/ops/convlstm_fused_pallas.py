"""Fully-fused ConvLSTM layer kernel (Pallas/TPU).

One pass per layer step: the 3x3 gate convolution (shifted-matmul
formulation — nine MXU dots against weight slices, no im2col buffer), bias,
gate nonlinearities, and the cell/hidden update, reading x and c_prev once
and writing h and c once.  XLA splits this chain into ~6 fusions with
intermediate HBM round-trips (BENCH_NOTES.md profile); measured on one v5e
chip at the north-star layer-1 shape (B25 240x320 Cin240 C48) the fused
kernel runs 28.0 ms vs 34.7 ms for XLA's conv + fused gate chain (-19%),
including the halo materialization (scripts/pallas_bisect.py variants I/X).

Blocking: row blocks overlap by the conv halo, which plain BlockSpec
blocking cannot express — AND Mosaic rejects memref slices/DMA windows
whose sublane extent is not tile-aligned (the round-1 "HTTP 500" decoded
to: "Slice shape along dimension 2 must be aligned to tiling (8), but is
130").  Both constraints are satisfied by materializing the overlapped
row windows once in HBM with the halo'd width padded to a multiple of 16
(bf16 sublane tiling is 8 x 2-packed), then tiling with BlockSpec only:
Mosaic double-buffers the block fetches automatically, no manual DMA.

The kernel is numerics-compatible with the model's split-gate-conv path
(models/prednet/model.py prednet_step): pass x = concat([E, R, up(R+1)])
and the full fused lstm_w; the per-source conv sum is the same dot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_convlstm_layer", "fused_convlstm_layer_multi", "pick_rows"]


def pick_rows(h: int, target: int = 48) -> int:
    """Largest row-block size <= target that divides ``h``.

    Bigger blocks amortize the 2-row halo overlap; 40-48 rows measured
    fastest at the north-star shape (pallas_bisect --rows sweep)."""
    for rows in range(min(target, h), 0, -1):
        if h % rows == 0:
            return rows
    return h


def _kernel(x_ref, w_ref, b_ref, c_ref, h_out, c_out, *, rows, W, C4, C):
    x = x_ref[0, 0]  # (rows+2, Wp, Cin) bf16
    wk = w_ref[:].astype(jnp.bfloat16)
    acc = jnp.zeros((rows, W, C4), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            tap = x[ky : ky + rows, kx : kx + W, :]
            acc = acc + jax.lax.dot_general(
                tap,
                wk[ky, kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    gates = acc + b_ref[:].astype(jnp.float32)
    i = jax.nn.sigmoid(gates[..., 0 * C : 1 * C])
    f = jax.nn.sigmoid(gates[..., 1 * C : 2 * C])
    o = jax.nn.sigmoid(gates[..., 2 * C : 3 * C])
    g = jnp.tanh(gates[..., 3 * C : 4 * C])
    c = f * c_ref[0].astype(jnp.float32) + i * g
    h = o * jnp.tanh(c)
    h_out[0] = h.astype(h_out.dtype)
    c_out[0] = c.astype(c_out.dtype)


@functools.partial(jax.jit, static_argnames=("rows_per_block", "interpret"))
def fused_convlstm_layer(
    x, w, b, c_prev, rows_per_block: int = 0, interpret: bool = False
):
    """One fused ConvLSTM layer update.

    Args:
      x: (B, H, W, Cin) layer input (the concatenated E/R/up sources).
      w: (3, 3, Cin, 4C) gate conv kernel (HWIO).
      b: (4C,) bias.
      c_prev: (B, H, W, C) previous cell state.
      rows_per_block: row-block height; 0 = auto (:func:`pick_rows`).
    Returns:
      (h, c): h in c_prev's dtype, c in f32, both (B, H, W, C).
    """
    B, H, W, Cin = x.shape
    C4 = w.shape[3]
    C = C4 // 4
    rows = rows_per_block or pick_rows(H)
    assert H % rows == 0, (H, rows)
    nblk = H // rows
    # halo'd width padded to a multiple of 16 (bf16 sublane tiling);
    # kernel reads only the first W+2 columns
    Wp = ((W + 2 + 15) // 16) * 16
    xp = jnp.pad(
        x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, Wp - W - 1), (0, 0))
    )
    # materialize the overlapped row windows: (B, nblk, rows+2, Wp, Cin)
    xh = jnp.stack(
        [xp[:, i * rows : i * rows + rows + 2] for i in range(nblk)], axis=1
    )

    kern = functools.partial(_kernel, rows=rows, W=W, C4=C4, C=C)
    h, c = pl.pallas_call(
        kern,
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
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xh, w, b, c_prev)
    return h, c


def _kernel_multi(*refs, rows, W, C4, C, n_src, Cins):
    # refs: x_hbm[0..n_src-1], w[0..n_src-1], b, c_ref, h_out, c_out,
    #        x_vmem[0..n_src-1], sem[0..n_src-1]
    x_hbms = refs[:n_src]
    ws = refs[n_src : 2 * n_src]
    b_ref = refs[2 * n_src]
    c_ref = refs[2 * n_src + 1]
    h_out = refs[2 * n_src + 2]
    c_out = refs[2 * n_src + 3]
    x_vmems = refs[2 * n_src + 4 : 3 * n_src + 4]
    sems = refs[3 * n_src + 4 : 4 * n_src + 4]

    bi = pl.program_id(0)
    r = pl.program_id(1)
    copies = []
    for s in range(n_src):
        # window start r*rows and size rows+16 are both 8-aligned; the
        # +8-row top pad puts the conv halo at in-window offset 7
        cp = pltpu.make_async_copy(
            x_hbms[s].at[bi, pl.ds(r * rows, rows + 16)], x_vmems[s], sems[s]
        )
        cp.start()
        copies.append(cp)
    acc = jnp.zeros((rows, W, C4), jnp.float32)
    for s in range(n_src):
        copies[s].wait()
        x = x_vmems[s][:].astype(jnp.bfloat16)
        wk = ws[s][:].astype(jnp.bfloat16)
        for ky in range(3):
            for kx in range(3):
                tap = x[7 + ky : 7 + ky + rows, kx : kx + W, :]
                acc = acc + jax.lax.dot_general(
                    tap,
                    wk[ky, kx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    gates = acc + b_ref[:].astype(jnp.float32)
    i = jax.nn.sigmoid(gates[..., 0 * C : 1 * C])
    f = jax.nn.sigmoid(gates[..., 1 * C : 2 * C])
    o = jax.nn.sigmoid(gates[..., 2 * C : 3 * C])
    g = jnp.tanh(gates[..., 3 * C : 4 * C])
    c = f * c_ref[0].astype(jnp.float32) + i * g
    h = o * jnp.tanh(c)
    h_out[0] = h.astype(h_out.dtype)
    c_out[0] = c.astype(c_out.dtype)


@functools.partial(
    jax.jit, static_argnames=("rows_per_block", "interpret")
)
def fused_convlstm_layer_multi(
    srcs, ws, b, c_prev, rows_per_block: int = 0, interpret: bool = False
):
    """Fused ConvLSTM update reading each gate-conv source separately.

    Unlike :func:`fused_convlstm_layer`, nothing is materialized in HBM:
    each source stays as-is (8-row top / bottom padding only) and every
    program DMAs its own aligned (rows+16)-row window per source — window
    start ``r*rows`` and size ``rows+16`` are both sublane-aligned, which
    is what Mosaic requires of DMA slices.  This removes the
    concat + halo-window-stack traffic that made the single-input kernel
    a net loss in the full pipeline (BENCH_NOTES.md).

    Args:
      srcs: list of (B, H, W, Cin_s) inputs (E, R, upsampled R above).
      ws: list of (3, 3, Cin_s, 4C) weight slices, same order.
      b: (4C,) bias.
      c_prev: (B, H, W, C).
    """
    n_src = len(srcs)
    B, H, W, _ = srcs[0].shape
    C4 = ws[0].shape[3]
    C = C4 // 4
    rows = rows_per_block or pick_rows(H)
    # DMA window starts are r*rows: must be sublane-aligned
    assert H % rows == 0 and rows % 8 == 0, (H, rows)
    Wp = ((W + 2 + 15) // 16) * 16
    Cins = tuple(int(s.shape[-1]) for s in srcs)
    # 8 rows top pad (halo lives at offset 7), >=8 bottom; width 1 + pad
    xps = [
        jnp.pad(
            s.astype(jnp.bfloat16),
            ((0, 0), (8, 8), (1, Wp - W - 1), (0, 0)),
        )
        for s in srcs
    ]

    kern = functools.partial(
        _kernel_multi, rows=rows, W=W, C4=C4, C=C, n_src=n_src, Cins=Cins
    )
    h, c = pl.pallas_call(
        kern,
        grid=(B, H // rows),
        in_specs=(
            [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_src)]
            + [
                pl.BlockSpec(
                    (3, 3, Cins[s], C4), lambda bi, r: (0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
                for s in range(n_src)
            ]
            + [
                pl.BlockSpec((C4,), lambda bi, r: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, W, C), lambda bi, r: (bi, r, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
        ),
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
        scratch_shapes=(
            [pltpu.VMEM((rows + 16, Wp, Cins[s]), jnp.bfloat16)
             for s in range(n_src)]
            + [pltpu.SemaphoreType.DMA for _ in range(n_src)]
        ),
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*xps, *ws, b, c_prev)
    return h, c
