"""The block rewrite (model fast path) must equal the full keep-map
rewrite (oracle-tested path) on the valid region."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.compression.schedulers import (DecodeCaps, _keep_map,
                                              _rewrite, apply_block_rewrite,
                                              block_map, block_width,
                                              identity_block_map)
from scope_tpu.config import CompressionConfig

B, H, D = 1, 3, 8
CAP = 96
P, W, R = 32, 16, 8


def setup(seed, length_val):
    rng = np.random.default_rng(seed)
    ck = rng.standard_normal((1, B, H, CAP, D)).astype(np.float32)
    probs = rng.random((B, H, CAP)).astype(np.float32)
    length = jnp.full((B,), length_val, jnp.int32)
    pseg = jnp.full((B,), P, jnp.int32)
    return jnp.asarray(ck), jnp.asarray(probs), length, pseg


@pytest.mark.parametrize("metric,n_keep_val", [
    ("fixed", W - R), ("linear", 5), ("jump", 11)])
def test_block_equals_full_rewrite(metric, n_keep_val):
    comp = CompressionConfig(method="h2o", decoding_metric=metric,
                             max_capacity_prompt=P, window_size=8,
                             decoding_window_size=W,
                             decoding_recent_size=R, delta=3)
    caps = DecodeCaps(keep_cap=W - R + 8, capacity=CAP)
    length_val = P + W + 5
    ck_all, probs, length, pseg = setup(0, length_val)
    row_gate = jnp.ones((B,), bool)
    n_keep = jnp.full((B,), n_keep_val, jnp.int32)

    # Full rewrite (oracle-tested).
    src_full, new_len_full = _keep_map(probs, length, pseg, R, n_keep,
                                       caps.keep_cap, CAP, row_gate)
    kf, _ = _rewrite(ck_all[0], ck_all[0], src_full)

    # Block rewrite (model path).
    src_blk, new_len_blk = block_map(comp, caps, probs, length, pseg,
                                     n_keep, row_gate, False)
    kb_all, _ = apply_block_rewrite(ck_all, ck_all, 0, src_blk, pseg, H)

    np.testing.assert_array_equal(np.asarray(new_len_full),
                                  np.asarray(new_len_blk))
    n = int(new_len_full[0])
    np.testing.assert_allclose(np.asarray(kb_all[0])[:, :, :n],
                               np.asarray(kf)[:, :, :n], rtol=0, atol=0)


def test_identity_block_is_noop():
    comp = CompressionConfig(method="h2o", decoding_metric="fixed",
                             max_capacity_prompt=P, window_size=8,
                             decoding_window_size=W,
                             decoding_recent_size=R, delta=3)
    caps = DecodeCaps(keep_cap=W - R, capacity=CAP)
    ck_all, probs, length, pseg = setup(1, P + W + 3)
    src_blk, new_len = identity_block_map(comp, caps, length, pseg, H)
    kb_all, _ = apply_block_rewrite(ck_all, ck_all, 0, src_blk, pseg, H)
    np.testing.assert_array_equal(np.asarray(new_len), np.asarray(length))
    np.testing.assert_allclose(np.asarray(kb_all), np.asarray(ck_all),
                               rtol=0, atol=0)


def test_ungated_rows_identity():
    comp = CompressionConfig(method="h2o", decoding_metric="fixed",
                             max_capacity_prompt=P, window_size=8,
                             decoding_window_size=W,
                             decoding_recent_size=R, delta=3)
    caps = DecodeCaps(keep_cap=W - R, capacity=CAP)
    ck_all, probs, length, pseg = setup(2, P + W + 2)
    row_gate = jnp.zeros((B,), bool)
    n_keep = jnp.full((B,), W - R, jnp.int32)
    src_blk, new_len = block_map(comp, caps, probs, length, pseg, n_keep,
                                 row_gate, False)
    kb_all, _ = apply_block_rewrite(ck_all, ck_all, 0, src_blk, pseg, H)
    np.testing.assert_array_equal(np.asarray(new_len), np.asarray(length))
    np.testing.assert_allclose(np.asarray(kb_all), np.asarray(ck_all),
                               rtol=0, atol=0)
