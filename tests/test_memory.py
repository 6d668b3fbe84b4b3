"""OOM-retry guard (the AvoidOOM analogue, reference mmdet/utils/memory.py:78)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsprompter_tpu.utils.memory import convert_batch_bf16, is_oom_error, oom_guard


class FakeOOM(Exception):
    pass


def test_oom_guard_splits_and_recovers():
    calls = []

    def fn(params, batch):
        n = batch["x"].shape[0]
        calls.append(n)
        if n > 2:
            raise FakeOOM("RESOURCE_EXHAUSTED: while allocating 9.9G")
        return {"y": batch["x"] * params}

    batch = {"x": jnp.arange(8.0)}
    out = oom_guard(fn)(2.0, batch)
    np.testing.assert_allclose(np.asarray(out["y"]), np.arange(8.0) * 2)
    # 8 -> OOM, 4+4 -> OOM each, four 2s succeed
    assert calls == [8, 4, 2, 2, 4, 2, 2]


def test_oom_guard_propagates_non_oom():
    def fn(batch):
        raise ValueError("unrelated")

    with pytest.raises(ValueError):
        oom_guard(fn)({"x": jnp.zeros((4,))})


def test_oom_guard_gives_up_at_min_batch():
    def fn(batch):
        raise FakeOOM("RESOURCE_EXHAUSTED")

    with pytest.raises(FakeOOM):
        oom_guard(fn, min_batch=1)({"x": jnp.zeros((4,))})


def test_is_oom_error_and_bf16_fallback():
    assert is_oom_error(FakeOOM("Ran out of memory in memory space hbm"))
    assert not is_oom_error(FakeOOM("shape mismatch"))
    b = convert_batch_bf16({"images": jnp.zeros((2, 4), jnp.float32),
                            "gt_labels": jnp.zeros((2,), jnp.int32)})
    assert b["images"].dtype == jnp.bfloat16
    assert b["gt_labels"].dtype == jnp.int32
