"""Independent NumPy oracle of the reference compression semantics.

Written from the behavioral spec in SURVEY.md §2.2-2.3 (which cites
kv_utils.py line-by-line); used to golden-test the JAX implementations.
Everything here operates on dynamically-sized arrays the way the reference
does, so agreement with the static-shape JAX path is a real check.
"""

from __future__ import annotations

import numpy as np


def softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def h2o_prefill_scores(q, k, w):
    """Full-query scoring with the reference's trailing w x w causal mask
    only (kv_utils.py:647-658).  q,k: [H, S, D] -> scores [H, S-w]."""
    H, S, D = q.shape
    logits = np.einsum("hqd,hkd->hqk", q, k) / np.sqrt(D)
    mask = np.zeros((w, w))
    mask[np.triu_indices(w, 1)] = -np.inf
    logits[:, -w:, -w:] += mask
    probs = softmax(logits, axis=-1)
    return probs[:, :, :-w].sum(axis=1)          # [H, S-w]


def snapkv_prefill_scores(q, k, w, kernel_size, pooling):
    """Observation-window scoring + 1D pooling (kv_utils.py:440-456)."""
    H, S, D = q.shape
    logits = np.einsum("hqd,hkd->hqk", q[:, -w:], k) / np.sqrt(D)
    mask = np.zeros((w, w))
    mask[np.triu_indices(w, 1)] = -np.inf
    logits[:, :, -w:] += mask
    probs = softmax(logits, axis=-1)
    colsum = probs[:, :, :-w].sum(axis=1)        # [H, S-w]
    pad = kernel_size // 2
    padded = np.pad(colsum, ((0, 0), (pad, pad)))
    windows = np.stack([padded[:, i:i + colsum.shape[1]]
                        for i in range(kernel_size)], axis=0)
    if pooling == "maxpool":
        return windows.max(axis=0)
    return windows.sum(axis=0) / kernel_size     # count_include_pad


def topk_desc(scores, k):
    """Indices of the k largest, ordered by descending score (torch.topk /
    lax.top_k order for distinct values)."""
    idx = np.argsort(-scores, axis=-1, kind="stable")[..., :k]
    return idx


def prefill_keep_order(scores, n_keep, S, w):
    """Kept source indices in cache order: [top-k by score | last w]."""
    H = scores.shape[0]
    kept = topk_desc(scores, n_keep)             # [H, n_keep]
    tail = np.broadcast_to(np.arange(S - w, S), (H, w))
    return np.concatenate([kept, tail], axis=1)  # [H, n_keep + w]


def pyramid_budget(P, w, beta, q_len, num_layers, layer_idx):
    """kv_utils.py:150-160 budget arithmetic."""
    min_num = (P - w) // beta
    max_num = (P - w) * 2 - min_num
    if max_num >= q_len - w:
        max_num = q_len - w
        min_num = (P - w) * 2 - max_num
    steps = (max_num - min_num) // num_layers
    return max_num - layer_idx * steps


class ScopeDecodeOracle:
    """Reference ``update_kv_in_decoding`` over a dynamic per-head cache.

    cache: list per head of source ids (ints identify tokens).  Scores are
    supplied externally (the JAX side reuses its attention probabilities;
    the oracle receives the same values keyed by token id).
    """

    def __init__(self, metric, P, W, r, delta, num_layers,
                 layer_idx=0):
        self.metric = metric
        self.P, self.W, self.r = P, W, r
        self.delta, self.L = delta, num_layers
        self.layer_idx = layer_idx
        # class-attribute counters in the reference; instance here because
        # the oracle models one cluster's view of the shared state.
        self.step = 0
        self.jump_step = 0
        self.jump_layer = 0

    def __call__(self, cache, probs_of):
        """cache: [H][k_len] token ids; probs_of: dict token_id ->
        [H] score array (this step's attention probabilities).
        Returns the new cache (list per head)."""
        H = len(cache)
        k_len = len(cache[0])
        P, W, r = self.P, self.W, self.r
        m = self.metric
        if m == "none":
            return cache
        if m in ("linear", "jump"):
            W = r + self.step // (self.delta * self.L)
            self.step += 1
        if k_len < P + W:
            return cache
        if m == "jump":
            if self.jump_step < self.delta * self.L:
                self.jump_step += 1
                return cache
            self.jump_layer += 1
            if self.jump_layer == self.L:
                self.jump_step = 0
                self.jump_layer = 0

        new = []
        for h in range(H):
            ids = cache[h]
            scores = np.array([probs_of[t][h] for t in ids])
            if m in ("fixed", "linear", "jump"):
                region = scores[P:k_len - r]
                keep = topk_desc(region, W - r)
                kept = [ids[P + i] for i in keep]
                new.append(ids[:P] + kept + ids[k_len - r:])
            elif m == "h2o":
                region = scores[:k_len - r]
                keep = topk_desc(region, P + W - r)
                new.append([ids[i] for i in keep] + ids[k_len - r:])
            elif m == "slm":
                new.append(ids[:P + W - r] + ids[k_len - r:])
            elif m == "pyramidinfer":
                min_num = (P + W - r) // 2
                max_num = (P + W - r) * 2 - min_num
                steps = (max_num - min_num) // self.L
                budget = max_num - self.layer_idx * steps
                if k_len < (P - r) * 2 + W:
                    n = P + W - r
                else:
                    n = budget + W
                region = scores[:k_len - r]
                n = min(n, len(region))
                keep = topk_desc(region, n)
                new.append([ids[i] for i in keep] + ids[k_len - r:])
            else:
                raise ValueError(m)
        return new
