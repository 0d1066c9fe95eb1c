"""Sweep flash_prefill/colsum block sizes at 1B 8k shapes (VERDICT r4 #1
follow-through: the pallas long-prompt path is now a driver metric —
make it fast).  Run alone — the chip is single-tenant."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(*a, file=sys.stderr, flush=True)

def main():
    import jax, jax.numpy as jnp
    from functools import partial
    from scope_tpu.ops.pallas.flash_prefill import flash_prefill, colsum_scores
    from scope_tpu.utils import compile_cache
    compile_cache.enable()
    log(f"devices: {jax.devices()}")
    B, H, S, D = 1, 32, 8192, 64
    rng = jax.random.key(0)
    q = jax.random.normal(rng, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (B, H, S, D), jnp.bfloat16)
    tl = jnp.full((B,), S, jnp.int32)

    def time_cfg(bq, bk, cq, ck_):
        f = jax.jit(partial(flash_prefill, window_size=8,
                            need_scores=True, block_q=bq, block_k=bk))
        g = jax.jit(partial(colsum_scores, window_size=8,
                            block_q=cq, block_k=ck_))
        out, m2, l2 = f(q, k, v, tl)
        cs = g(q, k, tl, m2, l2)
        jax.block_until_ready(cs)
        t0 = time.perf_counter()
        for _ in range(3):
            out, m2, l2 = f(q, k, v, tl)
            cs = g(q, k, tl, m2, l2)
        _ = jax.device_get(cs[0, 0, :4])
        dt = (time.perf_counter() - t0) / 3
        log(f"bq={bq} bk={bk} cq={cq} ck={ck_}: {dt*1e3:.1f} ms/layer-set "
            f"(x16 layers ~ {dt*16*1e3:.0f} ms)")
        return dt

    base = time_cfg(256, 512, 512, 512)          # current defaults
    for bq, bk in ((512, 512), (512, 1024), (1024, 512), (1024, 1024),
                   (256, 1024), (512, 2048), (2048, 512)):
        for cq, ck_ in ((1024, 1024),):
            try:
                time_cfg(bq, bk, cq, ck_)
            except Exception as e:
                log(f"bq={bq} bk={bk}: {type(e).__name__}: {e}")
    # colsum-only sweep at the best flash block
    for cq, ck_ in ((512, 512), (1024, 1024), (2048, 1024), (1024, 2048)):
        try:
            time_cfg(512, 1024, cq, ck_)
        except Exception as e:
            log(f"colsum {cq}/{ck_}: {type(e).__name__}: {e}")
    print("PROBE_DONE", flush=True)

if __name__ == "__main__":
    main()
