"""Pallas TPU kernel: 4-neighbour scatter-accumulate for flow projection.

The reference resolves this scatter with atomicAdd
(``flowprojection_cuda_kernel.cu:63-89``).  XLA's scatter HLO serialises on
TPU (~14 ms at 448x256) and the XLA-level one-hot einsum pays HBM traffic for
its one-hot operands (~5-6 ms).  This kernel builds the one-hot chunks in
VMEM and contracts them on the MXU (transposed f32 matmul, HIGHEST precision
— bit-exact sums) with the accumulator resident in VMEM; HBM traffic is just
the inputs and the output.

Semantics identical to ``_scatter4_onehot``: ``out[c,v,u] = sum_p
(1{v=iy_t(p)} + 1{v=iy_b(p)}) * (1{u=ix_l(p)} + 1{u=ix_r(p)}) * vals[p,c]``
— including double-adds where clamped neighbours coincide at the border.

Mosaic notes: all operands arrive pre-shaped from XLA as (P, 1)/(P, C)
arrays — in-kernel reshapes that move lanes to sublanes don't lower.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel_partial(h: int, w: int, c2: int, group: int):
    """Variant writing per-group partial outputs (no output-block revisiting
    across the whole grid — revisited outputs serialise the grid pipeline);
    the caller sums the partials in XLA.

    Values arrive pre-split into bf16 hi/lo channel pairs (c2 = 2c): one-hot
    (bf16, exact {0,1,2}) times bf16 parts multiply exactly into f32 on the
    MXU at single-pass DEFAULT precision — Mosaic has no Precision.HIGH, and
    HIGHEST's 6 passes are 3x slower."""
    def kernel(iy_t_ref, iy_b_ref, ix_l_ref, ix_r_ref, vals_ref, out_ref):
        @pl.when(pl.program_id(1) % group == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        p = iy_t_ref.shape[1]
        vv = jax.lax.broadcasted_iota(jnp.int32, (p, h), 1)
        a = ((vv == iy_t_ref[0]).astype(jnp.bfloat16)
             + (vv == iy_b_ref[0]).astype(jnp.bfloat16))
        a6 = jnp.concatenate([a * vals_ref[0, :, ci][:, None]
                              for ci in range(c2)], axis=1)
        uu = jax.lax.broadcasted_iota(jnp.int32, (p, w), 1)
        b = ((uu == ix_l_ref[0]).astype(jnp.bfloat16)
             + (uu == ix_r_ref[0]).astype(jnp.bfloat16))
        out_ref[0] += jax.lax.dot_general(
            a6, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(c2, h, w)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "group"))
def scatter4_pallas_partial(iy_t, iy_b, ix_l, ix_r, vals, chunk: int = 512,
                            group: int = 28):
    """EXPERIMENTAL partial-output variant: grid (B, n_chunks), each group of
    ``group`` consecutive chunks accumulates into its own (c,h,w) partial;
    the partials are summed in XLA.  Avoids whole-grid output revisiting.

    Measured (v5e, 448x256 pair): 6.1 ms — 2x faster than the revisiting
    HIGHEST kernel but only ties the XLA einsum path, and the result drifts
    ~0.045 abs.  ROUND-2 CORRECTION: the round-1 conclusion that Mosaic's
    bf16 dot does not accumulate in f32 was WRONG — the drift came from XLA
    eliding the f32->bf16->f32 convert round-trip in the hi/lo split below,
    silently zeroing the lo limb.  A clean bitmask-limb experiment confirms
    bf16 dots accumulate in f32.  Superseded by the banded kernel
    (projection_band_kernel.py), which uses exact truncation limbs; this
    whole-grid variant is kept only for comparison."""
    bsz, h, w = iy_t.shape
    c = vals.shape[-1]
    p_total = h * w
    pad = (-p_total) % chunk
    prep = lambda x: jnp.pad(x.reshape(bsz, -1, 1), ((0, 0), (0, pad), (0, 0)),
                             constant_values=-1)
    vals = vals.astype(jnp.float32)
    hi = vals.astype(jnp.bfloat16)
    lo = (vals - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    vals2 = jnp.pad(jnp.concatenate([hi, lo], axis=-1).reshape(bsz, -1, 2 * c),
                    ((0, 0), (0, pad), (0, 0)))

    n_chunks = -(-p_total // chunk)
    assert n_chunks % group == 0, (n_chunks, group)
    n_groups = n_chunks // group
    grid = (bsz, n_chunks)
    idx_spec = pl.BlockSpec((1, chunk, 1), lambda bi, i: (bi, i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel_partial(h, w, 2 * c, group),
        grid=grid,
        in_specs=[idx_spec, idx_spec, idx_spec, idx_spec,
                  pl.BlockSpec((1, chunk, 2 * c), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 2 * c, h, w),
                               lambda bi, i: (bi, i // group, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_groups, 2 * c, h, w),
                                       jnp.float32),
    )(prep(iy_t), prep(iy_b), prep(ix_l), prep(ix_r), vals2)
    summed = out.sum(axis=1)
    return (summed[:, :c] + summed[:, c:]).transpose(0, 2, 3, 1)


def _make_kernel(h: int, w: int, c: int):
    def kernel(iy_t_ref, iy_b_ref, ix_l_ref, ix_r_ref, vals_ref, out_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        p = iy_t_ref.shape[1]
        # channel-packed row one-hot: A3[p, ci*h + v] = a[p,v] * vals[p,ci]
        vv = jax.lax.broadcasted_iota(jnp.int32, (p, h), 1)
        a = ((vv == iy_t_ref[0]).astype(jnp.float32)
             + (vv == iy_b_ref[0]).astype(jnp.float32))
        a3 = jnp.concatenate([a * vals_ref[0, :, ci][:, None]
                              for ci in range(c)], axis=1)
        uu = jax.lax.broadcasted_iota(jnp.int32, (p, w), 1)
        b = ((uu == ix_l_ref[0]).astype(jnp.float32)
             + (uu == ix_r_ref[0]).astype(jnp.float32))
        out_ref[0] += jax.lax.dot_general(
            a3, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # Mosaic supports only DEFAULT/HIGHEST in-kernel (no HIGH)
            precision=jax.lax.Precision.HIGHEST).reshape(c, h, w)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk",))
def scatter4_pallas(iy_t, iy_b, ix_l, ix_r, vals, chunk: int = 512):
    """Raw batched forward. Index maps (B,H,W) int32, vals (B,H,W,C) f32 ->
    (B,H,W,C) f32.  Batch is a grid dimension (do NOT jax.vmap this — the
    pallas vmap rule would vectorise the kernel body and blow VMEM).

    No VJP — callers wrap it (flow_project via custom_vjp with the XLA
    transpose; depth_flow_project inside its own reference-exact VJP).
    """
    bsz, h, w = iy_t.shape
    c = vals.shape[-1]
    p_total = h * w
    pad = (-p_total) % chunk
    prep = lambda x: jnp.pad(x.reshape(bsz, -1, 1), ((0, 0), (0, pad), (0, 0)),
                             constant_values=-1)
    vals2 = jnp.pad(vals.reshape(bsz, -1, c), ((0, 0), (0, pad), (0, 0)))

    grid = (bsz, -(-p_total // chunk))
    idx_spec = pl.BlockSpec((1, chunk, 1), lambda bi, i: (bi, i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(h, w, c),
        grid=grid,
        in_specs=[idx_spec, idx_spec, idx_spec, idx_spec,
                  pl.BlockSpec((1, chunk, c), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c, h, w), lambda bi, i: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, c, h, w), jnp.float32),
    )(prep(iy_t), prep(iy_b), prep(ix_l), prep(ix_r), vals2)
    return out.transpose(0, 2, 3, 1)
