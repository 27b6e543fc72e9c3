"""Sorted-bucket gradient accumulation for reference-capacity hash tables.

The capacity wall (PERFORMANCE.md round 2): training at the reference's
T=2^19 tables (gridencoder/grid.py, nerf/network.py:32) was blocked by the
gradient scatter — XLA's scatter-add runs at ~12M rows/s here regardless of
`indices_are_sorted`/`unique_indices` (measured 1.3 s for 16M rows), and the
VMEM one-hot kernel's cost is linear in T. The reference solves this with
atomicAdd (gridencoder.cu:245-337); TPUs have no atomics, so we restructure
around the one fast reordering primitive the chip has — `lax.sort` at ~400M
keys/s with payloads riding the sort network at ~+20 ms/16M each:

  1. ONE variadic `lax.sort` of (key, grad_0..grad_{F-1}).
  2. `searchsorted` of the 4096-entry bucket boundaries (tiny: n_buckets
     queries) gives each bucket's row range in the sorted stream.
  3. a Pallas kernel walks the buckets (grid = table/4096); each bucket
     DMAs its variable-length slice of the sorted stream window-by-window
     and accumulates into its private [F, 32, 128] table block with
     one-hot f32 matmuls (entry (h,l) += sum of grads with local index
     h*128+l). Buckets partition the table, so output blocks never
     conflict: the whole scatter is deterministic and atomic-free, and
     duplicate keys are just extra rows in the matmul — no segment
     pre-reduction pass, no precision-losing cumsum differencing.

Cost is ~linear in the number of gradient requests and INDEPENDENT of T.
The variadic sort is ~60% of the runtime.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BUCKET = 4096          # table entries per bucket = 32 rows x 128 lanes
ROWS = BUCKET // 128   # 32
W_ROWS = 64            # rows of the sorted stream DMA'd per inner-loop step


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _make_accum_kernel(f_dim: int):
    def kernel(start_ref, nwin_ref, keys_hbm, vals_hbm, out_ref,
               keys_v, vals_v, sem_k, sem_v):
        b = pl.program_id(0)
        out_ref[:] = jnp.zeros_like(out_ref)
        row0 = start_ref[b]
        n_win = nwin_ref[b]

        def window(w, _):
            # row0 is in 8-row units: the explicit *8 lets Mosaic prove the
            # dynamic slice offset divisible by the (8,128) sublane tiling.
            r = (row0 + w * (W_ROWS // 8)) * 8
            cp_k = pltpu.make_async_copy(
                keys_hbm.at[pl.ds(r, W_ROWS)], keys_v, sem_k)
            cp_v = pltpu.make_async_copy(
                vals_hbm.at[pl.ds(r, W_ROWS)], vals_v, sem_v)
            cp_k.start()
            cp_v.start()
            cp_k.wait()
            cp_v.wait()
            keys = keys_v[:]                       # [W_ROWS, 128]
            local = keys - b * BUCKET
            in_bucket = (local >= 0) & (local < BUCKET)
            local = jnp.where(in_bucket, local, 0)
            hi = local >> 7                        # in [0, 32)
            lo = local & 127
            # Two iotas at their native minor widths — slicing one iota's
            # minor dim crashes the Mosaic compiler.
            lane32 = jax.lax.broadcasted_iota(
                jnp.int32, (W_ROWS, 128, ROWS), 2)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (W_ROWS, 128, 128), 2)
            # Masks via f32 (Mosaic cannot reshape i1); grads stay f32 —
            # the matmuls are tiny so the f32 MXU rate is irrelevant, and
            # accumulation across windows is exact float addition.
            ib_f = in_bucket.astype(jnp.float32)
            oh_hi = (hi[:, :, None] == lane32).astype(jnp.float32)
            oh_lo = (lo[:, :, None] == lane).astype(jnp.float32)
            lane_oh = oh_lo.reshape(W_ROWS * 128, 128)
            for f in range(f_dim):
                # fold value+mask into the narrow (32-wide) operand
                vf = vals_v[:, f * 128:(f + 1) * 128]
                af = (oh_hi * (vf * ib_f)[:, :, None]
                      ).reshape(W_ROWS * 128, ROWS)
                # HIGHEST: the MXU truncates f32 operands to bf16 by default
                # (measured 0.4% grad error); the 3-pass decomposition keeps
                # true f32 accumulation and these matmuls are tiny.
                out_ref[f] += jax.lax.dot_general(
                    af, lane_oh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)     # [32, 128]
            return 0

        jax.lax.fori_loop(0, n_win, window, 0)

    return kernel


def bucket_scatter_add(keys: jnp.ndarray, grads: jnp.ndarray,
                       total_params: int) -> jnp.ndarray:
    """Deterministic scatter-add of gradient rows into a flat table.

    Args:
      keys: [R] int32 global table indices (may repeat arbitrarily).
      grads: [R, F] gradient rows.
      total_params: table length (output rows).
    Returns:
      [total_params, F] f32 accumulated gradients.
    """
    r = keys.shape[0]
    f_dim = grads.shape[-1]
    total_pad = ((total_params + BUCKET - 1) // BUCKET) * BUCKET
    n_buckets = total_pad // BUCKET
    sentinel = jnp.int32(total_pad)

    # ---- 1. ONE sort: grads ride the sort network as payloads
    ops = (keys.astype(jnp.int32),) + tuple(grads[:, f].astype(jnp.float32)
                                            for f in range(f_dim))
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    sk = sorted_ops[0]

    # pad to whole 128-lane rows plus one full window of sentinel slack so
    # the last window never reads out of bounds
    tail = ((-r) % 128) + W_ROWS * 128
    skp = jnp.concatenate([sk, jnp.full((tail,), sentinel, jnp.int32)])
    rows_total = skp.shape[0] // 128
    keys2 = skp.reshape(rows_total, 128)
    # value layout [rows, F*128]: request (row, lane)'s feature f lives at
    # column f*128 + lane — one contiguous [W, F*128] DMA per window and
    # 128-aligned static lane slices per feature inside the kernel
    vals2 = jnp.concatenate(
        [jnp.concatenate([g, jnp.zeros((tail,), jnp.float32)]).reshape(
            rows_total, 128) for g in sorted_ops[1:]], axis=1)  # [rows,F*128]

    # ---- 2. per-bucket row ranges in the sorted stream (window starts
    # rounded DOWN to 8-row boundaries — (8,128) sublane tiling makes
    # unaligned dynamic slices of the stream illegal; the in-bucket mask
    # discards the extra leading rows)
    bounds = jnp.arange(n_buckets + 1, dtype=jnp.int32) * BUCKET
    pos = jnp.searchsorted(sk, bounds).astype(jnp.int32)
    row_start8 = pos[:-1] // (128 * 8)          # in 8-row units
    row_end = (pos[1:] + 127) // 128
    n_windows = (jnp.maximum(row_end - row_start8 * 8, 0)
                 + W_ROWS - 1) // W_ROWS

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_buckets,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # sorted keys (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),   # sorted grads (HBM)
        ],
        out_specs=pl.BlockSpec((f_dim, ROWS, 128), lambda b, *_: (0, b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((W_ROWS, 128), jnp.int32),
            pltpu.VMEM((W_ROWS, f_dim * 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _make_accum_kernel(f_dim),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f_dim, total_pad // 128, 128),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(row_start8, n_windows, keys2, vals2)
    gtab = out.reshape(f_dim, total_pad).T
    return gtab[:total_params]
