"""In-place KV append kernel.

Every XLA formulation of "write one token into the big KV buffer"
(per-layer dynamic_update_slice, stacked single-slice, slot-major
layouts) measured ~0.25ms per tensor per batch-4 step at 1B scale —
the runtime does not reliably update the donated buffer in place, so
tiny writes pay far more than their bytes.  This kernel forces the
issue with ``input_output_aliases``: the grid visits one (layer, row)
per program, the 8-slot tile block containing slot ``length[row]`` is
brought to VMEM (Mosaic cannot express sub-tile slices, so the write is
an aligned read-modify-write of one (8, D) tile), the token row is
substituted, and only the visited blocks are stored back — the rest of
the cache is untouched, aliased memory.

Used by the hot decode step to land all layers' staged k/v tokens in
one op (llama.decode_step deferred-append path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 8   # slot-axis tile granule (f32 sublane count; safe for bf16)


def _tile_for(dtype) -> int:
    """Slot-axis tile granule honouring Mosaic sublane packing."""
    return {1: 32, 2: 16}.get(jnp.dtype(dtype).itemsize, _TILE)


def _kernel(len_ref, tok_k_ref, tok_v_ref, k_blk, v_blk, ko_blk, vo_blk,
            *, tile: int):
    b = pl.program_id(1)
    row = len_ref[b] % tile
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, tile, 1), 1)
    keep = sub != row                                 # [1, TILE, 1]
    ko_blk[0, 0] = jnp.where(keep, k_blk[0, 0], tok_k_ref[0, 0])
    vo_blk[0, 0] = jnp.where(keep, v_blk[0, 0], tok_v_ref[0, 0])


def _kernel_uniform(len_ref, tok_k_ref, tok_v_ref, k_blk, v_blk,
                    ko_blk, vo_blk, *, tile: int):
    """All rows share one append slot: one program per layer."""
    row = len_ref[0] % tile
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, tile, 1), 3)
    keep = sub != row                               # [1,1,1,TILE,1]
    ko_blk[...] = jnp.where(keep, k_blk[...], tok_k_ref[...])
    vo_blk[...] = jnp.where(keep, v_blk[...], tok_v_ref[...])


def append_tokens(cache_k: jnp.ndarray,   # [L, B, H, S, D]
                  cache_v: jnp.ndarray,
                  tok_k: jnp.ndarray,     # [L, B, H, 1, D]
                  tok_v: jnp.ndarray,
                  length: jnp.ndarray,    # scalar or [B] int32
                  *, interpret: bool = False):
    """Write every layer's token k/v at slot ``length`` (per row) IN PLACE.

    Returns the aliased (cache_k, cache_v) — the only blocks written are
    the (layer, row) tiles containing the append slot.

    A scalar ``length`` (all rows share the slot — uniform_lengths mode)
    runs one program per LAYER on a [1, B, H, TILE, D] block instead of
    one per (layer, row): L grid steps, not L*B."""
    L, B, H, S, D = cache_k.shape
    tile = _tile_for(cache_k.dtype)
    uniform = jnp.ndim(length) == 0
    ln = jnp.asarray(length, jnp.int32).reshape(-1)

    if uniform:
        # Batch-tiled: a [1, B, H, tile, D] block at full serving batch
        # exceeds the 16MB scoped-vmem budget with double buffering (lane
        # padding inflates D=64 int8 blocks 2x), so the grid also splits
        # B into Bb-row tiles.
        def fits(bb):
            return (2 * 4 * bb * H * tile * max(D, 128)
                    * jnp.dtype(cache_k.dtype).itemsize <= 8 * 2 ** 20)
        Bb = max(d for d in range(1, B + 1)
                 if B % d == 0 and (d == 1 or fits(d)))

        def blk_map_u(l, b, ln):
            return (l, b, 0, ln[0] // tile, 0)

        def tok_map_u(l, b, ln):
            return (l, b, 0, 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, B // Bb),
            in_specs=[
                pl.BlockSpec((1, Bb, H, 1, D), tok_map_u),
                pl.BlockSpec((1, Bb, H, 1, D), tok_map_u),
                pl.BlockSpec((1, Bb, H, tile, D), blk_map_u),
                pl.BlockSpec((1, Bb, H, tile, D), blk_map_u),
            ],
            out_specs=[
                pl.BlockSpec((1, Bb, H, tile, D), blk_map_u),
                pl.BlockSpec((1, Bb, H, tile, D), blk_map_u),
            ],
        )
        kernel = functools.partial(_kernel_uniform, tile=tile)
    else:
        ln = jnp.broadcast_to(ln, (B,))

        def blk_map(l, b, ln):
            return (l, b, 0, ln[b] // tile, 0)

        def tok_map(l, b, ln):
            return (l, b, 0, 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, B),
            in_specs=[
                pl.BlockSpec((1, 1, H, 1, D), tok_map),
                pl.BlockSpec((1, 1, H, 1, D), tok_map),
                pl.BlockSpec((1, 1, H, tile, D), blk_map),
                pl.BlockSpec((1, 1, H, tile, D), blk_map),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, H, tile, D), blk_map),
                pl.BlockSpec((1, 1, H, tile, D), blk_map),
            ],
        )
        kernel = functools.partial(_kernel, tile=tile)
    k2, v2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        # inputs: 0=length(prefetch) 1=tok_k 2=tok_v 3=cache_k 4=cache_v
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(ln, tok_k, tok_v, cache_k, cache_v)
    return k2, v2
