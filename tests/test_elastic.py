"""Failure detection / elastic recovery for the serving engine.

The reference has no failure story at all (SURVEY §5): a crashed run is
a dead shell-loop iteration and the evaluator papers over missing files
with -1.  Here the engine can snapshot its full state (device buffers +
host mirrors + the native C++ slot scheduler via its snapshot ABI) and
restore after a fail-stop — results must be identical to an
uninterrupted run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.config import CompressionConfig, EngineConfig
from scope_tpu.engine.serving import ServingEngine
from scope_tpu.models import llama
from scope_tpu.models.registry import TINY_LLAMA

ECFG = EngineConfig(max_prompt_len=128, max_new_tokens=48, dtype="float32")


def mk_comp():
    return CompressionConfig(
        method="h2o", decoding_metric="jump", max_capacity_prompt=64,
        window_size=8, decoding_window_size=32, decoding_recent_size=16,
        delta=3)


def submit_all(eng, prompts, max_new=24):
    return [eng.submit(p, max_new) for p in prompts]


@pytest.fixture()
def setup():
    comp = mk_comp()
    params = llama.init_params(TINY_LLAMA, jax.random.key(5), jnp.float32)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 512, n).astype(np.int32)
               for n in (100, 90, 110, 80)]
    return comp, params, prompts


def test_snapshot_restore_into_fresh_engine(setup):
    comp, params, prompts = setup
    eng = ServingEngine(TINY_LLAMA, comp, ECFG, params, max_slots=2)
    ids = submit_all(eng, prompts)
    ref = dict(eng.run())

    eng2 = ServingEngine(TINY_LLAMA, comp, ECFG, params, max_slots=2)
    ids2 = submit_all(eng2, prompts)
    for _ in range(10):
        eng2.step()
    snap = eng2.snapshot()

    # Simulate the process dying: a brand-new engine restores the
    # snapshot and finishes the work.
    eng3 = ServingEngine(TINY_LLAMA, comp, ECFG, params, max_slots=2)
    eng3.restore(snap)
    out = eng3.run()
    for rid_ref, rid in zip(ids, ids2):
        np.testing.assert_array_equal(np.array(ref[rid_ref]),
                                      np.array(out[rid]))


def test_run_recovers_from_injected_failure(setup):
    comp, params, prompts = setup
    eng = ServingEngine(TINY_LLAMA, comp, ECFG, params, max_slots=2)
    ids = submit_all(eng, prompts)
    ref = dict(eng.run())

    eng2 = ServingEngine(TINY_LLAMA, comp, ECFG, params, max_slots=2)
    ids2 = submit_all(eng2, prompts)
    boom = {"left": 2}
    orig_step = eng2.step

    def flaky_step():
        if 0 < eng2.sched.live_tokens and boom["left"] > 0 \
                and len(eng2.results) >= 1:
            boom["left"] -= 1
            raise RuntimeError("injected device failure")
        return orig_step()

    eng2.step = flaky_step
    out = eng2.run(snapshot_every=4, max_recoveries=3)
    for rid_ref, rid in zip(ids, ids2):
        np.testing.assert_array_equal(np.array(ref[rid_ref]),
                                      np.array(out[rid]))


def test_recover_replays_post_snapshot_submissions(setup):
    comp, params, prompts = setup
    eng = ServingEngine(TINY_LLAMA, comp, ECFG, params, max_slots=2)
    ids_a = submit_all(eng, prompts[:2])
    for _ in range(6):
        eng.step()
    snap = eng.snapshot()
    # Submitted AFTER the snapshot: lost on failure, replayed on recover.
    ids_b = submit_all(eng, prompts[2:])
    ref_engine = ServingEngine(TINY_LLAMA, comp, ECFG, params, max_slots=2)
    rids = submit_all(ref_engine, prompts)
    ref = ref_engine.run()

    eng2 = ServingEngine(TINY_LLAMA, comp, ECFG, params, max_slots=2)
    remap = eng2.recover(snap, {ids_b[0]: (prompts[2], 24),
                                ids_b[1]: (prompts[3], 24)})
    out = eng2.run()
    np.testing.assert_array_equal(np.array(ref[rids[0]]),
                                  np.array(out[ids_a[0]]))
    np.testing.assert_array_equal(np.array(ref[rids[2]]),
                                  np.array(out[remap[ids_b[0]]]))
    np.testing.assert_array_equal(np.array(ref[rids[3]]),
                                  np.array(out[remap[ids_b[1]]]))
