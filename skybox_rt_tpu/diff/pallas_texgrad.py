"""Pallas row-accumulation kernel: the texture-gradient transpose.

The backward of a texel gather is a scatter-add of N per-pixel rows into
the (R texels, C) gradient table.  XLA lowers that to a serialized
per-update scatter (~38 ns/row measured: 10 of the 11.5 ms shade
backward at 512^2 went to the tex grad).  On TPU the fast transpose is a
ONE-HOT MATMUL: the grid walks pixel blocks sequentially (TPU grid
steps are ordered, so VMEM accumulation is race-free by construction),
each step builds the (R, BLK) one-hot of its pixels' row indices on the
VPU and contracts it with the (BLK, C) value block on the MXU into a
VMEM-resident (R, C) accumulator.

Deterministic sum order (sequential over pixel blocks) — unlike XLA's
scatter this gives run-to-run identical gradients.

Bounded to small tables (R*C <= ~1 MB VMEM for the accumulator, R a
sublane multiple); callers fall back to the XLA scatter above that
(pipeline._accumulate_rows).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32

BLK = 1024         # pixels per grid step
R_CHUNK = 1024     # one-hot row chunk (VMEM pressure: R_CHUNK*BLK*4 B)


def supported(num_rows: int, num_cols: int) -> bool:
    return (num_rows % 8 == 0 and num_rows * max(num_cols, 128) * 4
            <= 4 * 1024 * 1024)


def _kernel(idx_ref, val_ref, out_ref, *, num_rows, split_bf16):
    """Pixels ride the SUBLANE axis (Mosaic needs sublane blocks of 8n):
    idx is a (BLK, 1) column that lane-broadcasts against the texel-row
    iota, and the contraction runs over sublanes on both dot operands.

    split_bf16: the one-hot is exact in bf16 (0/1) and the values split
    as v = hi + lo with |err| <= 2^-16 |v| per element; two bf16 MXU
    passes with f32 accumulation.  Measured slower than the single f32
    dot on v5e at these shapes (layout-bound, not FLOP-bound) — kept as
    an option for larger C."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    idx = idx_ref[...]                               # (BLK, 1) i32
    val = val_ref[...]                               # (BLK, C) f32
    if split_bf16:
        BF = jnp.bfloat16
        hi = val.astype(BF)
        lo = (val - hi.astype(F32)).astype(BF)
    dn = (((0,), (0,)), ((), ()))
    for r0 in range(0, num_rows, R_CHUNK):
        rc = min(R_CHUNK, num_rows - r0)
        rows = jax.lax.broadcasted_iota(I32, (BLK, rc), 1) + r0
        if split_bf16:
            onehot = (rows == idx).astype(jnp.bfloat16)
            acc = (jax.lax.dot_general(onehot, hi, dn,
                                       preferred_element_type=F32)
                   + jax.lax.dot_general(onehot, lo, dn,
                                         preferred_element_type=F32))
        else:
            onehot = (rows == idx).astype(F32)
            acc = jax.lax.dot_general(onehot, val, dn,
                                      preferred_element_type=F32)
        out_ref[r0:r0 + rc, :] += acc


@functools.partial(jax.jit, static_argnames=("num_rows", "interpret",
                                             "split_bf16"))
def accumulate_rows(idx, val, num_rows: int, interpret: bool = False,
                    split_bf16: bool = False):
    """Σ over n of val[n] into row idx[n]: (N,) i32 + (N, C) f32 ->
    (num_rows, C) f32.  Out-of-range idx rows are dropped (the one-hot
    never matches).  split_bf16=True trades ~1e-5-abs rounding for bf16
    MXU passes — measured SLOWER on v5e at these shapes (3.2 vs 2.4 ms
    tex-bwd stage: the f32 dot was layout-, not FLOP-bound), so exact
    f32 stays the default."""
    N, C = val.shape
    Np = -(-N // BLK) * BLK
    idx = jnp.pad(jnp.asarray(idx, I32), (0, Np - N),
                  constant_values=num_rows)          # padded rows -> no-op
    val = jnp.pad(jnp.asarray(val, F32), ((0, Np - N), (0, 0)))
    grid = Np // BLK
    out = pl.pallas_call(
        functools.partial(_kernel, num_rows=num_rows,
                          split_bf16=split_bf16),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_rows, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_rows, C), F32),
        interpret=interpret,
    )(idx.reshape(Np, 1), val)
    return out
