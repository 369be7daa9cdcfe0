#!/usr/bin/env python
"""Ablation harness for the big-C context-warp lane-gather kernel
(ops/pallas/ctx_gather_kernel.py) — isolates the kernel's cost components on
the real TPU.  Modes:

  full        the production structure
  noloop      skip the adaptive row loop entirely (fixed floor: DMA +
              per-chunk tables/idx/out + grid-step overhead)
  nogather    row loop with the lane-gathers replaced by copies
  now         row loop without the weight sublane-gathers
  staticaddr  row loop with static (non-r-dependent) slab addressing

Usage: python tools/ubench_ctx_ablate.py <mode> [se]
Round-3 measurements (se=4): full 7.0 ms, noloop 2.65 ms, now 6.77 ms
=> ~1.09 ms per row iteration, weight gathers ~4%, fixed floor dominated by
DMA + per-chunk prep + 280 grid steps.
"""
import numpy as np, jax, jax.numpy as jnp, functools, sys
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from vfidkr_tpu.utils.profiling import device_time_slope

B, H, W, C = 2, 256, 448, 200
band, tw, rv, rh, c_chunk = 64, 64, 20, 30, 40
FS, U, PC = 4, 128, 128
s = band + 2*rv + FS - 1; s8 = (s+7)//8*8
nb, nj, nc = H//band, W//tw, C//c_chunk
p = band*tw; nchunk = p//PC; noct = c_chunk//8

def make_kernel(mode):
    def kernel(rb_ref, img_hbm, ints_ref, kw_ref, out_ref, slab, sem):
        bi, ti, ci, j = [pl.program_id(i) for i in range(4)]
        def dma(jj, slot):
            return pltpu.make_async_copy(
                img_hbm.at[bi, jj, pl.ds(ti*band, s8), pl.ds(ci*c_chunk, c_chunk), :],
                slab.at[slot], sem.at[slot])
        slot = jax.lax.rem(j, 2)
        @pl.when(j == 0)
        def _(): dma(j, slot).start()
        @pl.when(j + 1 < nj)
        def _(): dma(j+1, 1-slot).start()
        dma(j, slot).wait()
        for ch in range(nchunk):
            px = slice(ch*PC, (ch+1)*PC)
            bs = jnp.broadcast_to(ints_ref[0,0,0,0:1,px], (8,PC))
            kwc = kw_ref[0,0,0,:,px]
            z1 = jnp.zeros((1,PC), jnp.float32); z3 = jnp.zeros((3,PC), jnp.float32)
            tables = [jnp.concatenate([z1, kwc[di:di+1], kwc[4+di:5+di],
                                       kwc[8+di:9+di], kwc[12+di:13+di], z3], axis=0)
                      for di in range(FS)]
            idx_g = [jnp.broadcast_to(ints_ref[0,0,0,1:2,px]+di, (8,PC)) for di in range(FS)]
            r_lo = rb_ref[bi,ti,j,2*ch]; r_hi = rb_ref[bi,ti,j,2*ch+1]
            def body(r, accs):
                idx_w = jnp.clip(r - bs, -1, FS) + 1
                if mode == "now":
                    w = [tables[di][0:1].repeat(8,0)*0 + 1.0 for di in range(FS)]
                else:
                    w = [jnp.take_along_axis(tables[di], idx_w, axis=0) for di in range(FS)]
                out = []
                for di in range(FS):
                    row = []
                    for oc in range(noct):
                        if mode == "staticaddr":
                            t = slab[0, 0, oc*8:(oc+1)*8, :]
                        else:
                            t = slab[slot, r, oc*8:(oc+1)*8, :]
                        if mode == "nogather":
                            g = t
                        else:
                            g = jnp.take_along_axis(t, idx_g[di], axis=1)
                        row.append(accs[di][oc] + w[di]*g)
                    out.append(tuple(row))
                return tuple(out)
            z = jnp.zeros((8,PC), jnp.float32)
            init = tuple(tuple(z for _ in range(noct)) for _ in range(FS))
            if mode == "noloop":
                accs = init
            else:
                accs = jax.lax.fori_loop(r_lo, r_hi, body, init)
            for oc in range(noct):
                total = (accs[0][oc]+accs[1][oc])+(accs[2][oc]+accs[3][oc])
                out_ref[0,0,0,oc*8:(oc+1)*8,px] = total
    return kernel

def run_mode(mode, iwin, ints, kw_t, rb):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, nb, nc, nj),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((1,1,1,2,p), lambda bi,i,ci,j,rb:(bi,i,j,0,0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1,1,1,16,p), lambda bi,i,ci,j,rb:(bi,i,j,0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1,1,1,c_chunk,p), lambda bi,i,ci,j,rb:(bi,i,j,ci,0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2,s8,c_chunk,U), jnp.float32), pltpu.SemaphoreType.DMA((2,))])
    return pl.pallas_call(make_kernel(mode), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B,nb,nj,C,p), jnp.float32))(rb, iwin, ints, kw_t)

rng = np.random.RandomState(0)
iwin = jnp.asarray(rng.rand(B, nj, s8+band*(nb-1), C, U), jnp.float32)
ints = jnp.asarray(rng.randint(0, 60, size=(B,nb,nj,2,p)), jnp.int32)
kw_t = jnp.asarray(rng.rand(B,nb,nj,16,p), jnp.float32)
se = int(sys.argv[2]) if len(sys.argv) > 2 else 4
rlo = rng.randint(0, s-FS-se, size=(B,nb,nj,nchunk))
rb = np.stack([rlo, rlo+se], -1).reshape(B,nb,nj,2*nchunk)
rb = jnp.asarray(rb, jnp.int32)

mode = sys.argv[1]
f = jax.jit(lambda iw: iw + run_mode(mode, iw, ints, kw_t, rb).sum() * 1e-30)
import time
print("compiling...", flush=True)
t0 = time.time()
r = f(iwin); jax.device_get(r.sum())
print("first call done", time.time()-t0, flush=True)
t = device_time_slope(f, iwin, n1=10, n2=40)
print(f"mode={mode} se={se}: {t*1e3:.2f} ms")
