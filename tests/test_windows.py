import numpy as np
import jax.numpy as jnp

from ofdm_sync_tpu.ops import windows as W


def test_sliding_sum_valid(rng):
    x = rng.standard_normal(100).astype(np.float32)
    for win in (1, 3, 17, 100):
        got = np.asarray(W.sliding_sum_valid(jnp.asarray(x), win))
        want = np.array([x[d : d + win].sum() for d in range(100 - win + 1)])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sliding_sum_batched(rng):
    x = rng.standard_normal((3, 50)).astype(np.float32)
    got = np.asarray(W.sliding_sum_valid(jnp.asarray(x), 7))
    for b in range(3):
        want = np.array([x[b, d : d + 7].sum() for d in range(50 - 7 + 1)])
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)


def test_running_sum_stream_matches_rtl_fill(rng):
    x = rng.standard_normal(64).astype(np.float32)
    win = 9
    got = np.asarray(W.running_sum_stream(jnp.asarray(x), win))
    want = np.array([x[max(0, n - win + 1) : n + 1].sum() for n in range(64)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_shift_right():
    x = jnp.arange(6.0)
    np.testing.assert_array_equal(
        np.asarray(W.shift_right(x, 2)), [0, 0, 0, 1, 2, 3]
    )
    np.testing.assert_array_equal(np.asarray(W.shift_right(x, 0)), np.arange(6.0))


def test_delayed_product(rng):
    x = (rng.standard_normal(30) + 1j * rng.standard_normal(30)).astype(np.complex64)
    d = 7
    got = np.asarray(W.delayed_product(jnp.asarray(x), d))
    want = np.zeros(30, np.complex64)
    want[d:] = x[d:] * np.conj(x[:-d])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_trailing_average(rng):
    x = rng.standard_normal(40)
    win = 8
    got = np.asarray(W.trailing_average(jnp.asarray(x, dtype=jnp.float32), win))
    # oracle: streaming trailing mean with warm-up denominator
    want = np.array(
        [x[max(0, n - win + 1) : n + 1].sum() / min(n + 1, win) for n in range(40)]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_exp_smooth_shift_matches_serial(rng):
    x = np.abs(rng.standard_normal(200)).astype(np.float64)
    valid = np.arange(200) >= 37
    for shift in (0, 3):
        got = np.asarray(
            W.exp_smooth_shift(jnp.asarray(x, jnp.float32), shift, jnp.asarray(valid))
        )
        s, want = 0.0, np.zeros(200)
        for i in range(200):
            if valid[i]:
                s = x[i] if shift == 0 else s + (x[i] - s) / (1 << shift)
            want[i] = s
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_linear_recurrence(rng):
    a = rng.uniform(0.5, 1.0, 50).astype(np.float32)
    b = rng.standard_normal(50).astype(np.float32)
    got = np.asarray(W.linear_recurrence(jnp.asarray(a), jnp.asarray(b)))
    s, want = 0.0, np.zeros(50)
    for i in range(50):
        s = a[i] * s + b[i]
        want[i] = s
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_frame_signal(rng):
    x = rng.standard_normal(20).astype(np.float32)
    got = np.asarray(W.frame_signal(jnp.asarray(x), 4, 5, hop=2, offset=1))
    want = np.stack([x[1 + 2 * d : 1 + 2 * d + 5] for d in range(4)])
    np.testing.assert_array_equal(got, want)
