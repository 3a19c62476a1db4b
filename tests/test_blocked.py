import numpy as np
import jax
import jax.numpy as jnp

from ofdm_sync_tpu.kernels import blocked


def test_blocked_cumsum_matches(rng):
    for n in (100, 4096, 5000, 20000):
        x = rng.standard_normal(n).astype(np.float32)
        got = np.asarray(blocked.cumsum(jnp.asarray(x), block=512))
        want = np.cumsum(x.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-3)


def test_blocked_cumsum_batched(rng):
    x = rng.standard_normal((3, 10000)).astype(np.float32)
    got = np.asarray(blocked.cumsum(jnp.asarray(x), block=1024))
    want = np.cumsum(x, axis=-1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-2)


def test_blocked_cummax_matches(rng):
    for dtype in (np.float32, np.int32):
        for n in (100, 9000, 20000):
            x = (rng.standard_normal(n) * 100).astype(dtype)
            got = np.asarray(blocked.cummax(jnp.asarray(x), block=512))
            want = np.maximum.accumulate(x)
            np.testing.assert_array_equal(got, want)


def test_blocked_cummax_int_with_negatives():
    x = np.full(20000, -1, np.int32)
    x[7777] = 5
    got = np.asarray(blocked.cummax(jnp.asarray(x), block=4096))
    assert got[7776] == -1 and got[7777] == 5 and got[-1] == 5


def test_blocked_linear_recurrence_matches(rng):
    n = 20000
    a = rng.uniform(0.8, 1.0, n).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(blocked.linear_recurrence(jnp.asarray(a), jnp.asarray(b), block=512))
    s, want = 0.0, np.zeros(n)
    for i in range(n):
        s = a[i] * s + b[i]
        want[i] = s
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_blocked_recurrence_smoothing_semantics(rng):
    """The RTL smoother through the blocked path == serial float64 smoother."""
    n = 50000
    c = np.abs(rng.standard_normal(n)).astype(np.float32)
    valid = np.arange(n) >= 1535
    from ofdm_sync_tpu.ops.windows import exp_smooth_shift

    got = np.asarray(exp_smooth_shift(jnp.asarray(c), 3, jnp.asarray(valid)))
    s, want = 0.0, np.zeros(n)
    for i in range(n):
        if valid[i]:
            s += (c[i] - s) / 8
        want[i] = s
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
