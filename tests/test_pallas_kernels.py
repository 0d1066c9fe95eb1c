"""Pallas flash-prefill kernel parity vs the XLA reference path.

Runs in interpreter mode on CPU (conftest forces the cpu platform); the
same kernels compile natively on TPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.ops.attention import prefill_attention

B, H, D = 1, 4, 64
S = 256
W = 8


def make(seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    q = (rng.standard_normal((B, H, S, D)) * scale).astype(np.float32)
    k = (rng.standard_normal((B, H, S, D)) * scale).astype(np.float32)
    v = rng.standard_normal((B, H, S, D)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("true_len", [S, 200])
def test_flash_out_matches_xla(true_len):
    q, k, v = make()
    tl = jnp.full((B,), true_len, jnp.int32)
    out_x, sc_x = prefill_attention(q, k, v, tl, window_size=W,
                                    need_colsum_all=True, backend="xla")
    out_p, sc_p = prefill_attention(q, k, v, tl, window_size=W,
                                    need_colsum_all=True,
                                    backend="pallas_interpret")
    # Only real rows are meaningful.
    np.testing.assert_allclose(np.asarray(out_p)[:, :, :true_len],
                               np.asarray(out_x)[:, :, :true_len],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sc_p.colsum_all),
                               np.asarray(sc_x.colsum_all),
                               rtol=2e-4, atol=2e-4)


def test_flash_sliding_window():
    q, k, v = make(1)
    tl = jnp.full((B,), S, jnp.int32)
    out_x, _ = prefill_attention(q, k, v, tl, window_size=W,
                                 sliding_window=64, backend="xla")
    out_p, _ = prefill_attention(q, k, v, tl, window_size=W,
                                 sliding_window=64,
                                 backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-4, atol=2e-4)


def test_flash_large_logits_stable():
    """Online softmax must be stable for large logit magnitudes."""
    q, k, v = make(2, scale=8.0)
    tl = jnp.full((B,), S, jnp.int32)
    out_x, sc_x = prefill_attention(q, k, v, tl, window_size=W,
                                    need_colsum_all=True, backend="xla")
    out_p, sc_p = prefill_attention(q, k, v, tl, window_size=W,
                                    need_colsum_all=True,
                                    backend="pallas_interpret")
    assert np.isfinite(np.asarray(out_p)).all()
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sc_p.colsum_all),
                               np.asarray(sc_x.colsum_all),
                               rtol=1e-3, atol=1e-3)


def test_flash_topk_selection_identical():
    """The eviction decision (top-k of colsum) must agree with XLA."""
    from jax import lax
    q, k, v = make(3)
    tl = jnp.full((B,), 200, jnp.int32)
    _, sc_x = prefill_attention(q, k, v, tl, window_size=W,
                                need_colsum_all=True, backend="xla")
    _, sc_p = prefill_attention(q, k, v, tl, window_size=W,
                                need_colsum_all=True,
                                backend="pallas_interpret")
    kx = lax.top_k(sc_x.colsum_all[:, :, :200 - W], 64)[1]
    kp = lax.top_k(sc_p.colsum_all[:, :, :200 - W], 64)[1]
    assert (np.asarray(kx) == np.asarray(kp)).mean() > 0.995
