"""utils/buffers.py: host staging pool + donation wrapper behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from esp_audio_libs_tpu.utils.buffers import BufferPool, device_put_pooled, donate


def test_pool_recycles_by_shape_dtype():
    pool = BufferPool(max_per_key=2)
    a = pool.acquire((64,), np.int32)
    pool.release(a)
    b = pool.acquire((64,), np.int32)
    assert b is a and pool.hits == 1 and pool.misses == 1
    c = pool.acquire((64,), np.float32)   # different dtype -> new buffer
    assert c is not a and pool.misses == 2
    pool.release(b)
    pool.release(c)
    pool.clear()
    assert pool.acquire((64,), np.int32) is not b


def test_pool_bounded():
    pool = BufferPool(max_per_key=1)
    a, b = pool.acquire((8,), np.int8), pool.acquire((8,), np.int8)
    pool.release(a)
    pool.release(b)   # dropped: key already holds max_per_key
    assert pool.acquire((8,), np.int8) is a
    assert pool.acquire((8,), np.int8) is not b


def test_lease_context_manager():
    pool = BufferPool()
    with pool.lease((16,), np.int16) as buf:
        buf[:] = 7
    with pool.lease((16,), np.int16) as again:
        assert again is buf


def test_device_put_pooled_round_trip():
    pool = BufferPool()
    x = device_put_pooled(lambda b: b.__setitem__(slice(None), np.arange(10)),
                          (10,), np.int32, pool=pool)
    np.testing.assert_array_equal(np.asarray(x), np.arange(10))
    # staging buffer was recycled
    assert pool.acquire((10,), np.int32) is not None and pool.hits == 1


def test_donate_wrapper_runs_and_donates():
    @donate(argnums=(1,))
    def step(x, state):
        return state + x

    s = jnp.zeros(8, jnp.float32)
    out = step(jnp.ones(8, jnp.float32), s)
    np.testing.assert_array_equal(np.asarray(out), np.ones(8, np.float32))
    # donated input buffer is dead after the call
    assert s.is_deleted()
