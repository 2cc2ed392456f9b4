"""membench probe tests (interpret mode): the DMA-bound HBM read probe
must actually read every element (its running tile-max equals numpy's) and
its timing harness must return finite positive numbers."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sgvamp_tpu.ops.membench import _prep, measure_read_gbps, read_max  # noqa: E402


def test_read_max_covers_every_element():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(3, 1 << 20)).astype(np.float32))
    got = np.asarray(read_max(u, interpret=True))
    flat, chunk = _prep(u)
    want = np.asarray(flat).reshape(-1, 8, 128).max(axis=0)
    np.testing.assert_allclose(got, want)
    # plant a large value at an arbitrary position; the probe must see it
    v = np.array(u)  # writable copy
    v[2, 12345] = 1e6
    got2 = np.asarray(read_max(jnp.asarray(v), interpret=True))
    assert got2.max() == 1e6


def test_read_max_bf16():
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(1 << 20,)).astype(np.float32)).astype(
        jnp.bfloat16)
    got = np.asarray(read_max(u, interpret=True)).astype(np.float32)
    flat, chunk = _prep(u)
    want = np.asarray(flat.astype(jnp.float32)).reshape(-1, 8, 128).max(axis=0)
    np.testing.assert_allclose(got, want)


def test_read_max_int8_bitcast():
    """int8 arrays (quantized LD blocks) are probed via an equal-BYTE bf16
    substitute - mosaic has no int8 reductions, and a bitcast via
    reshape(-1, 2) puts the pair axis minormost, which TPU tiling pads 64x
    (measured 16 GB HLO temp for a 256 MB array). A read ceiling depends
    only on bytes streamed."""
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.integers(-127, 128, size=(1 << 20,)).astype(np.int8))
    got = np.asarray(read_max(u, interpret=True))
    assert got.shape == (8, 128)
    flat, chunk = _prep(u)
    assert flat.dtype == jnp.bfloat16 and flat.size == u.size // 2


def test_measure_returns_finite_rate():
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(4 << 20,)).astype(np.float32))
    gbps, per_pass = measure_read_gbps(u, n=2, interpret=True, reps=1)
    assert np.isfinite(gbps) and gbps > 0
    assert per_pass > 0
