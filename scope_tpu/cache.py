"""Static-shape slotted KV cache.

The reference mutates HF ``DynamicCache`` lists in place with
dynamically-shaped ``cat``/``gather`` rewrites (llama_model.py:189-190,
:597-598) — every cache-length change would recompile under XLA.  Here the
cache is a fixed-capacity buffer per layer plus explicit length bookkeeping;
compression becomes a functional gather (see scope_tpu.compression) and all
shapes are jit-stable.

Layout per layer: slots [0, length) are valid and ordered the same way the
reference's physical cache would be ([compacted prefill | kept decode |
recent window]).  ``pvalid`` tracks a per-head valid count inside the
prefill segment — it only diverges from the uniform length for the headwise
method (per-head budgets); all other methods keep it equal to the prefill
kept-count.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax


@flax.struct.dataclass
class KVCache:
    k: jnp.ndarray                      # [L, B, H, S_max, D]
    v: jnp.ndarray                      # [L, B, H, S_max, D]
    length: jnp.ndarray                 # [L, B] int32, physical filled length
    # Per-head valid count within the prefill segment [0, prefill_gap).
    pvalid: jnp.ndarray                 # [L, B, H] int32
    # Static size of the reserved prefill segment.  0 for contiguous-layout
    # methods (everything), == headwise_max_budget cap for headwise.
    prefill_gap: int = flax.struct.field(pytree_node=False, default=0)
    # Recorded true prompt length (ALLKV/Quest gates; kv_utils.py:1047,1250).
    prompt_len: Optional[jnp.ndarray] = None   # [B] int32
    # Quest page metadata over the prefill region, precomputed once after
    # prefill instead of per-step (kv_utils.py:1296-1331 recomputes each
    # step; the math is identical - see compression/quest.py).
    page_min: Optional[jnp.ndarray] = None     # [L, B, H, NP, D]
    page_max: Optional[jnp.ndarray] = None     # [L, B, H, NP, D]
    # Per-channel quantization parameters.  kv_dtype="int8": k/v are int8,
    # true_k = k * k_scale[l, b, h, None, :]; offsets stay None.
    # kv_dtype="int4": k/v are uint8 with TWO 4-bit codes per byte along
    # the channel axis (storage [..., S_max, D//2]) and
    # true_k = code * k_scale + k_off (ops/quant.py int4 section — the
    # offsets fold for free: K's cancels in softmax, V's folds into the
    # attention output because probabilities sum to 1).  Calibrated once
    # at prefill; slot-axis-free, so eviction gathers never touch them.
    k_scale: Optional[jnp.ndarray] = None      # [L, B, H, D] f32
    v_scale: Optional[jnp.ndarray] = None      # [L, B, H, D] f32
    k_off: Optional[jnp.ndarray] = None        # [L, B, H, D] f32 (int4)
    v_off: Optional[jnp.ndarray] = None        # [L, B, H, D] f32 (int4)
    # Staging ring (EngineConfig.decode_ring > 0): hot decode steps write
    # the per-step token k/v HERE instead of the big k/v buffers — an
    # update on a big buffer costs a near-full-buffer copy on TPU however
    # it is expressed (per-call, in-scan, pallas-aliased; measured
    # scripts/bisect_step.py + scripts/micro_dus.py), while updates on
    # this small buffer are ~free.  Attention folds ring slots [0, fill);
    # the host flushes the ring into the big buffers (one amortized copy)
    # every R steps, before any compression fire, and before admissions.
    # ``length`` counts only FLUSHED tokens; virtual length = length+fill.
    ring_k: Optional[jnp.ndarray] = None       # [L, B, H, R, D]
    ring_v: Optional[jnp.ndarray] = None
    ring_fill: Optional[jnp.ndarray] = None    # [] int32, uniform for all
    #                                            rows/layers (every row
    #                                            appends every step)
    # Lazy eviction (EngineConfig.lazy_evict): slots [0, length) hold the
    # appended tokens in order, but only slots with alive=True are live —
    # fires tombstone instead of rewriting (eviction is permanent, so a
    # dead slot never resurrects between compactions).  compact_lazy
    # reclaims dead slots every ~lazy_slack steps.  None = eager mode.
    alive: Optional[jnp.ndarray] = None        # [L, B, H, S_max] bool

    @property
    def num_layers(self):
        return self.k.shape[0]

    @property
    def capacity(self):
        return self.k.shape[3]


def init_cache(num_layers: int, batch: int, num_heads: int, capacity: int,
               head_dim: int, dtype, prefill_gap: int = 0,
               with_pages: bool = False, num_pages: int = 0,
               kv_dtype: str = "", ring: int = 0,
               lazy: bool = False) -> KVCache:
    int8 = kv_dtype == "int8"
    int4 = kv_dtype == "int4"
    store = jnp.int8 if int8 else (jnp.uint8 if int4 else dtype)
    dstore = head_dim // 2 if int4 else head_dim   # two codes per byte
    shape = (num_layers, batch, num_heads, capacity, dstore)
    sshape = (num_layers, batch, num_heads, head_dim)
    rshape = (num_layers, batch, num_heads, ring, dstore)
    # Quest page metadata holds per-channel extremes: stored values for
    # bf16/int8, unpacked CODES (uint8, full head_dim) for int4 — code
    # order equals value order per channel since scales are positive.
    pdtype = store if not int4 else jnp.uint8
    pdim = head_dim
    return KVCache(
        k=jnp.zeros(shape, store),
        v=jnp.zeros(shape, store),
        length=jnp.zeros((num_layers, batch), jnp.int32),
        pvalid=jnp.zeros((num_layers, batch, num_heads), jnp.int32),
        prefill_gap=prefill_gap,
        prompt_len=jnp.zeros((batch,), jnp.int32),
        page_min=(jnp.zeros((num_layers, batch, num_heads, num_pages,
                             pdim), pdtype) if with_pages else None),
        page_max=(jnp.zeros((num_layers, batch, num_heads, num_pages,
                             pdim), pdtype) if with_pages else None),
        k_scale=jnp.ones(sshape, jnp.float32) if int8 or int4 else None,
        v_scale=jnp.ones(sshape, jnp.float32) if int8 or int4 else None,
        k_off=jnp.zeros(sshape, jnp.float32) if int4 else None,
        v_off=jnp.zeros(sshape, jnp.float32) if int4 else None,
        ring_k=jnp.zeros(rshape, store) if ring else None,
        ring_v=jnp.zeros(rshape, store) if ring else None,
        ring_fill=jnp.zeros((), jnp.int32) if ring else None,
        alive=(jnp.ones((num_layers, batch, num_heads, capacity), bool)
               if lazy else None),
    )


def compact_gather(cache: KVCache, gap: int):
    """Phase 1 of lazy compaction: gather the live slots of the
    evictable window [gap, cap) to the front of fresh blocks, preserving
    append order.  Returns (kblk, vblk, lns): [L,B,H,W,D] x2 + [L,B].

    Split from the write-back so neither program both reads and
    rewrites the big buffers: a fused gather-from-self + whole-buffer
    update makes XLA plan a full cache copy next to the donated input
    (8.9GB at 1B b192 int8 — deterministic compile-OOM on a 16GB chip).
    Here the cache is read-only (undonated) and the outputs are
    window-sized; compact_write is then a pure donated DUS, which
    aliases in place like every append/flush."""
    k, v, alive = cache.k, cache.v, cache.alive
    L, B, H, cap, D = k.shape
    W = cap - gap
    idx = jnp.arange(W, dtype=jnp.int32)

    # lax.scan over the layer axis SERIALIZES the per-layer slice/gather
    # temps — an unrolled loop kept all L layers' temps live at once
    # (16 x ~340MB at 1B b192 int8 = 21GB planned, compile-OOM).  The
    # scan reads xs slices per iteration (read-only dynamic_slice, no
    # buffer copy) and stacks the window-sized outputs.
    def permute(x, perm):
        """x [B,H,W,D] gathered at perm [B,H,W] along the slot axis —
        as a one-hot MATMUL, not a gather.  Row gathers over 64-byte KV
        rows are latency-bound DMA (~4GB/s effective: 805ms per compact
        at 1B b192 int8); the equivalent one-hot dot rides the MXU
        (~5 T-ops for the same compact).  Exact for 0/1 coefficients in
        every cache dtype (int8/uint8 accumulate in int32; floats hit
        one nonzero term per row)."""
        if W > 4096:
            # The one-hot is O(W^2): fine at fire-window widths (~2.5k),
            # but a gap=0 configuration (allkv) at ~10k capacity would
            # build a [B,H,10k,10k] operand (~100MB per (b,h) row) just
            # to permute.  Above this width the latency-bound gather is
            # the lesser evil (ADVICE r3).
            return jnp.take_along_axis(x, perm[..., None], axis=2)
        oh = perm[..., None] == idx[None, None, None, :]    # [B,H,W,W]
        if jnp.issubdtype(x.dtype, jnp.integer):
            # uint8 codes round-trip exactly through the int8 reinterpret
            # (two's complement) and the truncating int32 -> uint8 cast.
            out = jnp.einsum("bhij,bhjd->bhid", oh.astype(jnp.int8),
                             x.astype(jnp.int8),
                             preferred_element_type=jnp.int32)
            return out.astype(x.dtype)
        # Float path invariant: dead slots must hold FINITE values —
        # 0 * Inf/NaN would poison live rows through the matmul (unlike
        # take_along_axis).  Holds today: buffers are zero-init and only
        # finite K/V rows are ever written (ADVICE r3).
        return jnp.einsum("bhij,bhjd->bhid", oh.astype(x.dtype), x,
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype)

    def body(_, xs):
        kl, vl, al, lnl = xs                                # [B,H,cap,D]
        # Never-written tail slots [length, cap) are alive-by-init but
        # hold no token — without this mask each compaction counted them
        # into the new length (one attended zero-K/V slot leaked per
        # compact, device length drifting +1 past the host mirror).
        a = al[:, :, gap:] & (idx[None, None, :]
                              < (lnl[:, None, None] - gap))  # [B,H,W]
        # Stable order-preserving ranks: dead slots sink past W.
        key = jnp.where(a, idx[None, None, :], W + idx[None, None, :])
        perm = jnp.argsort(key, axis=-1)                    # [B,H,W]
        kb = permute(kl[:, :, gap:], perm)
        vb = permute(vl[:, :, gap:], perm)
        # Fire keep-counts are head-uniform; head 0 is authoritative.
        ln = gap + a.sum(axis=-1).astype(jnp.int32)[:, 0]   # [B]
        return 0, (kb, vb, ln)

    _, (kblk, vblk, lns) = lax.scan(body, 0, (k, v, alive, cache.length))
    return kblk, vblk, lns


def compact_write(cache: KVCache, kblk, vblk, lns, gap: int) -> KVCache:
    """Phase 2: land the compacted window (pure DUS, donation-safe)."""
    k = lax.dynamic_update_slice(cache.k, kblk, (0, 0, 0, gap, 0))
    v = lax.dynamic_update_slice(cache.v, vblk, (0, 0, 0, gap, 0))
    # All slots reset alive: [new_len, old_len) hold stale rows masked by
    # the shrunk length, and future appends overwrite them in order.
    return cache.replace(k=k, v=v, alive=jnp.ones_like(cache.alive),
                         length=lns)


def compact_lazy(cache: KVCache, gap: int) -> KVCache:
    """Reclaim tombstoned slots: move live slots of [gap, cap) to the
    front of that region, preserving append order.

    gap is the static start of the evictable region (the prefill budget P
    for the budgeted methods; 0 for allkv, whose prefill segment is fully
    alive so the permutation is the identity there).  Each fire keeps the
    same count per head, so post-compaction lengths are head-uniform and
    ``length`` becomes gap + live-count.  The expensive gather (latency-
    bound row DMA) runs HERE, once per ~lazy_slack steps, instead of on
    every fire.  Single-program reference form; the host loop dispatches
    the two phases as separate jits (see compact_gather)."""
    kblk, vblk, lns = compact_gather(cache, gap)
    return compact_write(cache, kblk, vblk, lns, gap)


def flush_ring(cache: KVCache, uniform_rows: bool,
               uniform_layers: bool = True) -> KVCache:
    """Write the staged ring tokens into the big k/v buffers.

    The full R-slot ring block is written at each (layer, row)'s flushed
    length (slots beyond ``ring_fill`` carry junk that stays masked —
    the physical capacity includes R slots of slack, see
    llama.derive_statics); ``length`` advances by ``ring_fill`` and the
    ring resets.  One big-buffer update per flush instead of one per
    step — this is where the per-step copy cost is amortized.
    """
    k, v, ln = cache.k, cache.v, cache.length
    L, B = ln.shape
    if uniform_rows and uniform_layers:
        start = (0, 0, 0, ln[0, 0], 0)
        k = lax.dynamic_update_slice(k, cache.ring_k, start)
        v = lax.dynamic_update_slice(v, cache.ring_v, start)
    elif uniform_layers:
        for b in range(B):
            sb = (0, b, 0, ln[0, b], 0)
            k = lax.dynamic_update_slice(k, cache.ring_k[:, b:b + 1], sb)
            v = lax.dynamic_update_slice(v, cache.ring_v[:, b:b + 1], sb)
    else:                       # per-layer lengths (pyramidkv budgets)
        for l in range(L):
            if uniform_rows:
                sl = (l, 0, 0, ln[l, 0], 0)
                k = lax.dynamic_update_slice(k, cache.ring_k[l:l + 1], sl)
                v = lax.dynamic_update_slice(v, cache.ring_v[l:l + 1], sl)
            else:
                for b in range(B):
                    sb = (l, b, 0, ln[l, b], 0)
                    k = lax.dynamic_update_slice(
                        k, cache.ring_k[l:l + 1, b:b + 1], sb)
                    v = lax.dynamic_update_slice(
                        v, cache.ring_v[l:l + 1, b:b + 1], sb)
    return cache.replace(k=k, v=v, length=ln + cache.ring_fill,
                         ring_fill=jnp.zeros((), jnp.int32))


def append_token(cache_k: jnp.ndarray, cache_v: jnp.ndarray,
                 new_k: jnp.ndarray, new_v: jnp.ndarray,
                 length: jnp.ndarray):
    """Write one token's K/V at per-row offset ``length``.

    cache_k/v: [B, H, S_max, D]; new_k/v: [B, H, 1, D]; length: [B] int32.
    Returns (cache_k', cache_v', length + 1).
    """
    def upd(c, n, i):
        return lax.dynamic_update_slice(c, n, (0, i, 0))
    cache_k = jax.vmap(upd)(cache_k, new_k, length)
    cache_v = jax.vmap(upd)(cache_v, new_v, length)
    return cache_k, cache_v, length + 1


def slot_mask(length: jnp.ndarray, pvalid: jnp.ndarray, prefill_gap: int,
              capacity: int) -> jnp.ndarray:
    """Validity mask per slot, per head.  length [B], pvalid [B, H] ->
    [B, H, S_max] bool."""
    idx = jnp.arange(capacity)
    if prefill_gap == 0:
        return (idx[None, :] < length[:, None])[:, None, :] | jnp.zeros(
            pvalid.shape + (capacity,), bool)
    in_prefill = idx[None, None, :] < pvalid[:, :, None]
    in_decode = ((idx[None, None, :] >= prefill_gap)
                 & (idx[None, :] < length[:, None])[:, None, :])
    return in_prefill | in_decode


def gather_rewrite(cache_k: jnp.ndarray, cache_v: jnp.ndarray,
                   src_map: jnp.ndarray):
    """Rewrite the cache as dest[d] = src[src_map[d]] in one gather.

    cache_k/v: [B, H, S, D]; src_map: [B, H, S] int32 (or broadcastable).
    This is the functional equivalent of the reference's
    gather-compact-then-cat sequence (e.g. kv_utils.py:659-666).
    """
    idx = src_map[..., None]
    return (jnp.take_along_axis(cache_k, idx, axis=2),
            jnp.take_along_axis(cache_v, idx, axis=2))
