"""In-place pallas append kernel vs numpy reference (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from scope_tpu.ops.pallas.append import append_tokens

L, B, H, S, D = 3, 2, 4, 32, 8


def make(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    k = jnp.asarray(rng.standard_normal((L, B, H, S, D)), dtype)
    v = jnp.asarray(rng.standard_normal((L, B, H, S, D)), dtype)
    tk = jnp.asarray(rng.standard_normal((L, B, H, 1, D)), dtype)
    tv = jnp.asarray(rng.standard_normal((L, B, H, 1, D)), dtype)
    return k, v, tk, tv


def test_append_uniform():
    k, v, tk, tv = make()
    k2, v2 = append_tokens(k, v, tk, tv, jnp.int32(7), interpret=True)
    ref_k = np.asarray(k).copy()
    ref_k[:, :, :, 7:8] = np.asarray(tk)
    ref_v = np.asarray(v).copy()
    ref_v[:, :, :, 7:8] = np.asarray(tv)
    np.testing.assert_array_equal(np.asarray(k2), ref_k)
    np.testing.assert_array_equal(np.asarray(v2), ref_v)


def test_append_per_row():
    k, v, tk, tv = make(1)
    lens = jnp.asarray([5, 9], jnp.int32)
    k2, v2 = append_tokens(k, v, tk, tv, lens, interpret=True)
    ref_k = np.asarray(k).copy()
    ref_k[:, 0, :, 5:6] = np.asarray(tk)[:, 0]
    ref_k[:, 1, :, 9:10] = np.asarray(tk)[:, 1]
    np.testing.assert_array_equal(np.asarray(k2), ref_k)


def test_append_bf16_under_jit():
    k, v, tk, tv = make(2, jnp.bfloat16)

    @jax.jit
    def step(k, v, tk, tv, ln):
        return append_tokens(k, v, tk, tv, ln, interpret=True)

    k2, _ = step(k, v, tk, tv, jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(k2[:, :, :, 0:1]),
                                  np.asarray(tk))
    # Other slots untouched.
    np.testing.assert_array_equal(np.asarray(k2[:, :, :, 1:]),
                                  np.asarray(k[:, :, :, 1:]))


def test_append_uniform_int8():
    rng = np.random.default_rng(3)
    k = jnp.asarray(rng.integers(-127, 128, (L, B, H, S, D)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, (L, B, H, S, D)), jnp.int8)
    tk = jnp.asarray(rng.integers(-127, 128, (L, B, H, 1, D)), jnp.int8)
    tv = jnp.asarray(rng.integers(-127, 128, (L, B, H, 1, D)), jnp.int8)
    k2, v2 = append_tokens(k, v, tk, tv, jnp.int32(13), interpret=True)
    ref_k = np.asarray(k).copy()
    ref_k[:, :, :, 13:14] = np.asarray(tk)
    ref_v = np.asarray(v).copy()
    ref_v[:, :, :, 13:14] = np.asarray(tv)
    np.testing.assert_array_equal(np.asarray(k2), ref_k)
    np.testing.assert_array_equal(np.asarray(v2), ref_v)
