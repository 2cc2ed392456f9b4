"""SymBandedLD pallas-kernel tests (interpret mode on CPU).

Measured on chip at M=512k, bandwidth 256, B=256 (same-run A/B): the
streamed sym kernel saturates the chip's measured HBM read bandwidth
(1.21 ms/pass vs a 1.22 ms pure-read reduction over the same bytes) and
beats both the resident flavor (1.33 ms) and the full-band einsum operator
(1.57 ms, 1.5x the bytes). int8 per-block quantized storage halves LD
traffic again (opt-in, dtype="int8" at from_band).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgvamp_tpu import PriorState, VampConfig, VampEngine, VampInputs
from sgvamp_tpu.core.operators import BandedLD
from sgvamp_tpu.data.simulate import band_to_dense, simulate_ld_band
from sgvamp_tpu.ops.band_kernel import SymBandedLD


@pytest.mark.parametrize("B,bw", [(128, 48), (128, 200), (256, 100)])
def test_matches_dense(B, bw):
    rng = np.random.default_rng(0)
    M = 700  # deliberately not a block multiple
    band, _, _ = simulate_ld_band(10000, M, bandwidth=bw, rng=rng,
                                  dtype=np.float64)
    R = band_to_dense(band)
    op = SymBandedLD.from_band(band, block_size=B, s=0.1)
    x = rng.normal(size=(2, op.M))
    y = np.asarray(op.matvec(jnp.asarray(x)))
    want = x[:, :M] @ (0.9 * R + 0.1 * np.eye(M)).T
    np.testing.assert_allclose(y[:, :M], want, rtol=1e-10, atol=1e-12)
    # padded markers carry an identity diagonal: Rused @ x = x there
    np.testing.assert_allclose(y[:, M:], x[:, M:], atol=1e-12)


@pytest.mark.parametrize("B,bw", [(128, 48), (128, 200)])
def test_window_flavor_matches_dense(B, bw):
    """The window fast path (one matmul per row over the (hb+1)B window)
    must equal the per-diagonal path, including edge rows."""
    rng = np.random.default_rng(2)
    M = 700
    band, _, _ = simulate_ld_band(10000, M, bandwidth=bw, rng=rng,
                                  dtype=np.float64)
    R = band_to_dense(band)
    op = dataclasses.replace(
        SymBandedLD.from_band(band, block_size=B, s=0.1), window=True)
    x = rng.normal(size=(2, op.M))
    y = np.asarray(op.matvec(jnp.asarray(x)))
    want = x[:, :M] @ (0.9 * R + 0.1 * np.eye(M)).T
    np.testing.assert_allclose(y[:, :M], want, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(y[:, M:], x[:, M:], atol=1e-12)


@pytest.mark.parametrize("B,bw", [(128, 48), (128, 200), (256, 100)])
def test_slab_layout_matches_dense(B, bw):
    """The slab layout (pre-transposed stacked upper blocks, one window
    matmul per row) must equal the dense operator, including edge rows
    whose x-window runs past M into the zero pad."""
    rng = np.random.default_rng(3)
    M = 700
    band, _, _ = simulate_ld_band(10000, M, bandwidth=bw, rng=rng,
                                  dtype=np.float64)
    R = band_to_dense(band)
    op = SymBandedLD.from_band(band, block_size=B, s=0.1, layout="slab")
    assert op.hb == -(-bw // B) and op.B == B
    x = rng.normal(size=(2, op.M))
    y = np.asarray(op.matvec(jnp.asarray(x)))
    want = x[:, :M] @ (0.9 * R + 0.1 * np.eye(M)).T
    np.testing.assert_allclose(y[:, :M], want, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(y[:, M:], x[:, M:], atol=1e-12)
    # to_dense rebuilds the same matrix from slab storage
    np.testing.assert_allclose(
        np.asarray(op.to_dense())[0],
        np.asarray(SymBandedLD.from_band(band, block_size=B, s=0.1).to_dense())[0],
        atol=0)


def test_fits_vmem_ceiling():
    """The VMEM-resident design fits at the bench size and not at M=1M
    (measured: 512k/bf16 runs, 1M OOMs the 16MiB scoped limit by 10MB)."""
    assert SymBandedLD.fits_vmem(524288, 2, 2)
    assert not SymBandedLD.fits_vmem(1048576, 2, 2)
    assert not SymBandedLD.fits_vmem(1048576, 2, 4)


def test_bf16_storage_f32_accumulate():
    """bf16 upper blocks: the kernel must accumulate in f32 (output dtype
    promotion) and stay within bf16 rounding of the f64 band result."""
    rng = np.random.default_rng(3)
    M = 512
    band, _, _ = simulate_ld_band(10000, M, bandwidth=64, rng=rng,
                                  dtype=np.float64)
    R = band_to_dense(band)
    op = SymBandedLD.from_band(band, block_size=128, dtype="bfloat16")
    assert str(op.upper.dtype) == "bfloat16"
    x = rng.normal(size=(2, op.M))
    y = np.asarray(op.matvec(jnp.asarray(x, jnp.float32)), np.float64)
    want = x[:, :M] @ R.T
    scale = np.abs(want).max()
    np.testing.assert_allclose(y[:, :M] / scale, want / scale, atol=2e-2)


@pytest.mark.parametrize("B,bw,G", [(128, 48, 0), (128, 200, 0), (256, 100, 0),
                                    (128, 200, 2), (128, 48, 2), (128, 100, 3)])
def test_streamed_matches_dense(B, bw, G):
    """The streamed (HBM-chunked x/y + carry) kernel must equal the dense
    result at every chunk size, including G=hb edge chunking where every
    mirror crosses a chunk boundary through the carry."""
    rng = np.random.default_rng(4)
    M = 700
    band, _, _ = simulate_ld_band(10000, M, bandwidth=bw, rng=rng,
                                  dtype=np.float64)
    R = band_to_dense(band)
    op = dataclasses.replace(
        SymBandedLD.from_band(band, block_size=B, s=0.1),
        mode="streamed", rows_per_step=G)
    x = rng.normal(size=(2, op.M))
    y = np.asarray(op.matvec(jnp.asarray(x)))
    want = x[:, :M] @ (0.9 * R + 0.1 * np.eye(M)).T
    np.testing.assert_allclose(y[:, :M], want, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(y[:, M:], x[:, M:], atol=1e-12)


@pytest.mark.parametrize("B,bw,G", [(128, 48, 0), (128, 200, 2), (256, 100, 0),
                                    (128, 100, 3)])
def test_streamed_slab_matches_dense(B, bw, G):
    """Streamed slab flavor (window matmul + dot_general mirrors over
    HBM-chunked x/y) must equal the dense result at every chunk size."""
    rng = np.random.default_rng(6)
    M = 700
    band, _, _ = simulate_ld_band(10000, M, bandwidth=bw, rng=rng,
                                  dtype=np.float64)
    R = band_to_dense(band)
    op = dataclasses.replace(
        SymBandedLD.from_band(band, block_size=B, s=0.1, layout="slab"),
        mode="streamed", rows_per_step=G)
    x = rng.normal(size=(2, op.M))
    y = np.asarray(op.matvec(jnp.asarray(x)))
    want = x[:, :M] @ (0.9 * R + 0.1 * np.eye(M)).T
    np.testing.assert_allclose(y[:, :M], want, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(y[:, M:], x[:, M:], atol=1e-12)


def test_streamed_matches_dense_K2():
    """K cohorts ride the leading grid axis; the carry must reset between
    cohorts (row 0 of cohort k+1 must not absorb cohort k's tail spill)."""
    rng = np.random.default_rng(5)
    M, B, bw = 512, 128, 96
    bands = [simulate_ld_band(10000, M, bandwidth=bw, rng=rng,
                              dtype=np.float64)[0] for _ in range(2)]
    ops = [SymBandedLD.from_band(b, block_size=B) for b in bands]
    op = dataclasses.replace(
        ops[0], upper=jnp.concatenate([o.upper for o in ops], axis=0),
        mode="streamed")
    x = rng.normal(size=(4, op.M))  # S=2 RHS x K=2 cohorts
    y = np.asarray(op.matvec(jnp.asarray(x)))
    for k, band in enumerate(bands):
        R = band_to_dense(band)
        for s in range(2):
            np.testing.assert_allclose(y[s * 2 + k], x[s * 2 + k] @ R.T,
                                       rtol=1e-10, atol=1e-12)


def test_streamed_diagonal_only_band():
    """hb=0 (bandwidth fits inside a block... bandwidth 0): no mirrors, no
    carry traffic - the degenerate shape must still be correct."""
    rng = np.random.default_rng(6)
    M, B = 384, 128
    band = rng.normal(size=(M, 1))
    op = dataclasses.replace(SymBandedLD.from_band(band, block_size=B),
                             mode="streamed")
    assert op.hb == 0
    x = rng.normal(size=(2, M))
    y = np.asarray(op.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y, x * band[:, 0], rtol=1e-12, atol=1e-13)


def test_streamed_spill_two_shard_composition():
    """spill=True contract used by the sharded path: running the kernel on
    two half-panels with halo-extended x and adding the exported carry into
    the next shard's head must reproduce the whole-panel matvec."""
    from sgvamp_tpu.ops.band_kernel import _sym_band_matvec_streamed

    rng = np.random.default_rng(7)
    M, B, bw = 1024, 128, 200
    band, _, _ = simulate_ld_band(10000, M, bandwidth=bw, rng=rng,
                                  dtype=np.float64)
    op = SymBandedLD.from_band(band, block_size=B)
    nb, hb = op.nb, op.hb
    nb_l = nb // 2
    x = rng.normal(size=(1, 2, M))
    xj = jnp.asarray(x)
    G = 4
    hbB = max(hb, 1) * B
    ys, spills = [], []
    for sh in range(2):
        ub_l = op.upper[:, sh * nb_l:(sh + 1) * nb_l]
        x_l = xj[:, :, sh * nb_l * B:(sh + 1) * nb_l * B]
        if sh == 0:
            halo = xj[:, :, nb_l * B:nb_l * B + hbB]
        else:
            halo = jnp.zeros((1, 2, hbB))  # wraparound leg: zeros
        pad = jnp.zeros((1, 2, G * B - hbB))
        x_ext = jnp.concatenate([x_l, halo, pad], axis=2)
        y_l, spill = _sym_band_matvec_streamed(ub_l, x_ext, nb_l,
                                               interpret=True,
                                               rows_per_step=G, spill=True)
        ys.append(y_l)
        spills.append(spill)
    y1 = ys[1].at[:, :, :hbB].add(spills[0])
    got = np.concatenate([np.asarray(ys[0]), np.asarray(y1)], axis=2)[0]
    want = np.asarray(op.matvec(xj.reshape(2, M)))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    # the last shard's spill leaves the global panel: must be exact zeros
    np.testing.assert_allclose(np.asarray(spills[1]), 0.0, atol=0.0)


@pytest.mark.parametrize("B,bw,G", [(128, 48, 0), (128, 200, 2), (256, 100, 0)])
def test_int8_quantized_matvec(B, bw, G):
    """int8 per-block quantized storage: the kernel must reproduce the
    dequantized matrix's matvec EXACTLY (int8 -> bf16 conversion is exact,
    scale multiply is scalar), and stay within the per-block quantization
    bound of the unquantized result."""
    rng = np.random.default_rng(8)
    M = 700
    band, _, _ = simulate_ld_band(10000, M, bandwidth=bw, rng=rng,
                                  dtype=np.float64)
    R = band_to_dense(band)
    op = dataclasses.replace(
        SymBandedLD.from_band(band, block_size=B, dtype="int8"),
        rows_per_step=G)
    assert op.quantized and str(op.upper.dtype) == "int8"
    assert op.scales.shape == (1, op.nb, op.hb + 1)
    # int8 halves traffic vs bf16 (scales add a negligible tail)
    assert op.bytes_per_pass() < 0.51 * (
        op.upper.size * 2 + op.scales.size * 4)
    x = rng.normal(size=(2, op.M))
    y = np.asarray(op.matvec(jnp.asarray(x, jnp.float32)), np.float64)
    # exact vs the dequantized matrix (up to bf16 x-cast + f32 accumulate)
    Rq = np.asarray(op.to_dense(), np.float64)[0]
    want_q = x.astype(jnp.bfloat16).astype(np.float64) @ Rq.T
    scale = np.abs(want_q).max()
    np.testing.assert_allclose(y / scale, want_q / scale, atol=1e-5)
    # within quantization error of the true matrix
    full = np.zeros((op.M, op.M))
    full[:M, :M] = R
    full[M:, M:] = np.eye(op.M - M)
    want = x @ full.T
    np.testing.assert_allclose(y / scale, want / scale, atol=2e-2)


def test_int8_resident_mode_rejected():
    """int8 has no resident kernel; forcing mode='resident' must error
    loudly instead of silently running the streamed flavor (which would
    mislead resident-vs-streamed A/B benchmarks)."""
    rng = np.random.default_rng(3)
    band, _, _ = simulate_ld_band(10000, 256, bandwidth=32, rng=rng,
                                  dtype=np.float64)
    op = dataclasses.replace(
        SymBandedLD.from_band(band, block_size=128, dtype="int8"),
        mode="resident")
    with pytest.raises(ValueError, match="no resident kernel"):
        op.matvec(jnp.ones((2, op.M), jnp.float32))


def test_int8_engine_close_to_f32():
    """Full VAMP trajectory with int8 LD storage stays close to the f32
    trajectory (the fixed point is robust to operator quantization at the
    bf16-comparable level)."""
    rng = np.random.default_rng(9)
    N, M, lam, h2, iters = 20000, 400, 0.1, 0.7, 4
    band, r, x0 = simulate_ld_band(N, M, bandwidth=32, rng=rng,
                                   dtype=np.float64, h2=h2, lam=lam)
    u = (rng.integers(0, 2, size=(iters, 1, 512)) * 2 - 1).astype(np.float64)
    cfg = VampConfig(prior_update="em", dtype="float32", cg_maxit=200,
                     cg_rtol=1e-7)
    prior = PriorState.create(lam, [1.0], [h2 / int(M * lam) * N])
    hists = {}
    for name, op in [
            ("f32", SymBandedLD.from_band(band, block_size=128,
                                          dtype="float32")),
            ("int8", SymBandedLD.from_band(band, block_size=128,
                                           dtype="int8"))]:
        Mp = op.M
        mask = np.zeros(Mp)
        mask[:M] = 1.0
        rp = np.zeros(Mp)
        rp[:M] = r
        inputs = VampInputs(op=op, r=jnp.asarray(rp, jnp.float32)[None],
                            a=jnp.asarray([1.0], jnp.float32),
                            N=jnp.asarray([float(N)], jnp.float32),
                            mask=jnp.asarray(mask, jnp.float32))
        hists[name] = VampEngine(inputs, cfg, prior).run(
            iters, fixed_u=u[:, :, :Mp], M_out=M)
    for it in range(iters):
        a, b = hists["int8"]["xhat1"][it], hists["f32"]["xhat1"][it]
        denom = np.linalg.norm(b) + 1e-30
        assert np.linalg.norm(a - b) / denom < 0.05, f"iteration {it}"
    # final estimates agree well where it matters: correlation vs truth
    ca = np.corrcoef(hists["int8"]["xhat1"][-1], hists["f32"]["xhat1"][-1])[0, 1]
    assert ca > 0.999


def test_int8_sharded_matches_unsharded():
    """int8 storage through the shard_map path: the scales leaf must shard
    with the blocks (not replicate via the index-table heuristic)."""
    from sgvamp_tpu.parallel.sharding import make_mesh, shard_inputs

    rng = np.random.default_rng(10)
    M, B, bw = 512, 64, 100
    band, r, _ = simulate_ld_band(20000, M, bandwidth=bw, rng=rng,
                                  dtype=np.float64)
    op = SymBandedLD.from_band(band, block_size=B, dtype="int8")
    x = rng.normal(size=(2, op.M)).astype(np.float32)
    want = np.asarray(op.matvec(jnp.asarray(x)))
    mesh = make_mesh(1, 4)
    inputs = VampInputs(op=op, r=jnp.asarray(r, jnp.float32)[None],
                        a=jnp.asarray([1.0]), N=jnp.asarray([20000.0]))
    sh = shard_inputs(inputs, mesh)
    assert sh.op.mesh is mesh
    # scales sharded over block rows, like the blocks themselves
    assert "shard" in str(sh.op.scales.sharding.spec)
    got = np.asarray(sh.op.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("B,bw,G", [(128, 48, 0), (128, 200, 2), (256, 100, 0)])
def test_int4_packed_matvec(B, bw, G):
    """int4 contiguous-halves packed storage (two values per byte, per-row
    scales, stripped unit diagonal on the d=0 block): the kernel must
    reproduce the dequantized matrix's matvec to bf16-compute accuracy,
    and stay within the (coarser, 4-bit) quantization bound of the
    unquantized result."""
    rng = np.random.default_rng(8)
    M = 700
    band, _, _ = simulate_ld_band(10000, M, bandwidth=bw, rng=rng,
                                  dtype=np.float64)
    R = band_to_dense(band)
    op = dataclasses.replace(
        SymBandedLD.from_band(band, block_size=B, dtype="int4"),
        rows_per_step=G)
    assert op.packed and not op.quantized
    assert str(op.upper.dtype) == "int8"
    assert op.upper.shape[-1] == B // 2  # two values per byte
    assert op.scales.shape == (1, op.nb, op.hb + 1, B)  # per ROW
    # int4 quarters traffic vs bf16 (per-row f32 scales add 4/B per block)
    bf16_bytes = op.nb * (op.hb + 1) * B * B * 2
    assert op.bytes_per_pass() < (0.25 + 2.5 / B) * bf16_bytes
    x = rng.normal(size=(2, op.M))
    y = np.asarray(op.matvec(jnp.asarray(x, jnp.float32)), np.float64)
    # vs the dequantized matrix: the row orientation applies the per-row
    # scale on the f32 output (exact); the mirror orientation must fold it
    # into x across the contraction, costing one extra bf16 round (~2^-8
    # relative) - so the bound is bf16-compute, not f32-exact like int8.
    Rq = np.asarray(op.to_dense(), np.float64)[0]
    want_q = x.astype(jnp.bfloat16).astype(np.float64) @ Rq.T
    scale = np.abs(want_q).max()
    np.testing.assert_allclose(y / scale, want_q / scale, atol=5e-4)
    # within quantization error of the true matrix (16 levels per row)
    full = np.zeros((op.M, op.M))
    full[:M, :M] = R
    full[M:, M:] = np.eye(op.M - M)
    want = x @ full.T
    np.testing.assert_allclose(y / scale, want / scale, atol=6e-2)


def test_int4_diagonal_exact():
    """The d=0 block's unit diagonal is stripped before quantization and
    re-added by the kernel, so R's exact 1.0 diagonal survives int4 even
    when off-diagonal LD is weak (a pinned 1/7 scale would wreck it)."""
    rng = np.random.default_rng(4)
    band, _, _ = simulate_ld_band(50000, 256, bandwidth=24, rng=rng,
                                  dtype=np.float64)
    op = SymBandedLD.from_band(band, block_size=128, dtype="int4")
    D = np.asarray(op.to_dense())[0]
    np.testing.assert_allclose(np.diag(D), 1.0, atol=1e-7)
    # identity vector through the kernel: y[j] ~ row sums, diagonal exact
    x = np.zeros((1, op.M), np.float32)
    x[0, 5] = 1.0
    y = np.asarray(op.matvec(jnp.asarray(x)))
    assert abs(y[0, 5] - D[5, 5]) < 1e-4


def test_int4_resident_mode_rejected():
    rng = np.random.default_rng(3)
    band, _, _ = simulate_ld_band(10000, 256, bandwidth=32, rng=rng,
                                  dtype=np.float64)
    op = dataclasses.replace(
        SymBandedLD.from_band(band, block_size=128, dtype="int4"),
        mode="resident")
    with pytest.raises(ValueError, match="no resident kernel"):
        op.matvec(jnp.ones((2, op.M), jnp.float32))


def test_int4_engine_close_to_f32():
    """Full VAMP trajectory with int4 LD storage: coarser than int8 but
    the fixed point must stay in the same basin (correlated final xhat)."""
    rng = np.random.default_rng(9)
    N, M, lam, h2, iters = 20000, 400, 0.1, 0.7, 4
    band, r, x0 = simulate_ld_band(N, M, bandwidth=32, rng=rng,
                                   dtype=np.float64, h2=h2, lam=lam)
    u = (rng.integers(0, 2, size=(iters, 1, 512)) * 2 - 1).astype(np.float64)
    cfg = VampConfig(prior_update="em", dtype="float32", cg_maxit=200,
                     cg_rtol=1e-7)
    prior = PriorState.create(lam, [1.0], [h2 / int(M * lam) * N])
    hists = {}
    for name, op in [
            ("f32", SymBandedLD.from_band(band, block_size=128,
                                          dtype="float32")),
            ("int4", SymBandedLD.from_band(band, block_size=128,
                                           dtype="int4"))]:
        Mp = op.M
        mask = np.zeros(Mp)
        mask[:M] = 1.0
        rp = np.zeros(Mp)
        rp[:M] = r
        inputs = VampInputs(op=op, r=jnp.asarray(rp, jnp.float32)[None],
                            a=jnp.asarray([1.0], jnp.float32),
                            N=jnp.asarray([float(N)], jnp.float32),
                            mask=jnp.asarray(mask, jnp.float32))
        hists[name] = VampEngine(inputs, cfg, prior).run(
            iters, fixed_u=u[:, :, :Mp], M_out=M)
    for it in range(iters):
        a, b = hists["int4"]["xhat1"][it], hists["f32"]["xhat1"][it]
        denom = np.linalg.norm(b) + 1e-30
        assert np.linalg.norm(a - b) / denom < 0.15, f"iteration {it}"
    ca = np.corrcoef(hists["int4"]["xhat1"][-1], hists["f32"]["xhat1"][-1])[0, 1]
    assert ca > 0.995


def test_int4_sharded_matches_unsharded():
    """int4 through the shard_map path: the 4-d per-row scales leaf must
    shard over block rows alongside the packed blocks."""
    from sgvamp_tpu.parallel.sharding import make_mesh, shard_inputs

    rng = np.random.default_rng(10)
    M, B, bw = 512, 64, 100
    band, r, _ = simulate_ld_band(20000, M, bandwidth=bw, rng=rng,
                                  dtype=np.float64)
    op = SymBandedLD.from_band(band, block_size=B, dtype="int4")
    x = rng.normal(size=(2, op.M)).astype(np.float32)
    want = np.asarray(op.matvec(jnp.asarray(x)))
    mesh = make_mesh(1, 4)
    inputs = VampInputs(op=op, r=jnp.asarray(r, jnp.float32)[None],
                        a=jnp.asarray([1.0]), N=jnp.asarray([20000.0]))
    sh = shard_inputs(inputs, mesh)
    assert sh.op.mesh is mesh
    assert "shard" in str(sh.op.scales.sharding.spec)
    got = np.asarray(sh.op.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_matches_banded_operator_in_engine():
    """Full engine equivalence: SymBandedLD vs BandedLD trajectories."""
    rng = np.random.default_rng(1)
    N, M, lam, h2, iters = 20000, 400, 0.1, 0.7, 3
    band, r, x0 = simulate_ld_band(N, M, bandwidth=32, rng=rng,
                                   dtype=np.float64, h2=h2, lam=lam)
    u = (rng.integers(0, 2, size=(iters, 1, 512)) * 2 - 1).astype(np.float64)
    cfg = VampConfig(prior_update="em", dtype="float64", cg_maxit=300,
                     cg_rtol=1e-12)
    prior = PriorState.create(lam, [1.0], [h2 / int(M * lam) * N])
    hists = {}
    for name, op in [("einsum", BandedLD.from_band(band, block_size=128)),
                     ("pallas", SymBandedLD.from_band(band, block_size=128))]:
        Mp = op.M
        mask = np.zeros(Mp)
        mask[:M] = 1.0
        rp = np.zeros(Mp)
        rp[:M] = r
        inputs = VampInputs(op=op, r=jnp.asarray(rp)[None], a=jnp.asarray([1.0]),
                            N=jnp.asarray([float(N)]), mask=jnp.asarray(mask))
        hists[name] = VampEngine(inputs, cfg, prior).run(
            iters, fixed_u=u[:, :, :Mp], M_out=M)
    for it in range(iters):
        np.testing.assert_allclose(hists["pallas"]["xhat1"][it],
                                   hists["einsum"]["xhat1"][it],
                                   rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("B,bw,G", [(128, 200, 2), (64, 96, 4)])
def test_hybrid_matvec(B, bw, G):
    """Hybrid int8/int4 storage (d=0 block at full int8 precision as
    column halves in slots 0,1; far blocks packed int4): kernel matches
    its own dequantized matrix to bf16-compute accuracy, the diagonal
    block quantizes at int8 error, and traffic is 2/3 of int8's."""
    rng = np.random.default_rng(12)
    M = 768
    band, _, _ = simulate_ld_band(10000, M, bandwidth=bw, rng=rng,
                                  dtype=np.float64)
    op = dataclasses.replace(
        SymBandedLD.from_band(band, block_size=B, dtype="hybrid"),
        rows_per_step=G)
    assert op.hybrid and not op.packed and not op.quantized
    assert str(op.upper.dtype) == "int8"
    assert op.upper.shape[2] == op.hb + 2  # slots 0,1 = d=0 halves
    assert op.upper.shape[-1] == B // 2
    assert op.scales.shape == (1, op.nb, op.hb + 2, B)
    int8_bytes = op.nb * (op.hb + 1) * B * B  # int8 storage of same band
    assert op.bytes_per_pass() < (op.hb + 2) / (2 * (op.hb + 1)) * int8_bytes \
        + op.scales.size * 4 + 1
    x = rng.normal(size=(2, op.M))
    y = np.asarray(op.matvec(jnp.asarray(x, jnp.float32)), np.float64)
    Rq = np.asarray(op.to_dense(), np.float64)[0]
    want_q = x.astype(jnp.bfloat16).astype(np.float64) @ Rq.T
    np.testing.assert_allclose(y, want_q,
                               atol=5e-2 * np.abs(want_q).max(), rtol=2e-2)
    # quantization error split: diagonal block at int8 error, far at int4
    Rf = np.zeros((op.M, op.M))
    Rf[:M, :M] = band_to_dense(band)
    Rf[range(M, op.M), range(M, op.M)] = 1.0
    err = np.abs(Rq - Rf)
    ii, jj = np.meshgrid(np.arange(op.M) // B, np.arange(op.M) // B,
                         indexing="ij")
    diag_err = err[ii == jj].max()
    far_err = err[ii != jj].max()
    assert diag_err < far_err / 4, (diag_err, far_err)


def test_hybrid_rescues_int4_cg_breakdown():
    """THE point of hybrid storage: on the ill-conditioned strength-4
    panel (the BENCH_AB solve_by_dtype configuration) pure-int4
    quantization makes A = 40*R + I INDEFINITE - CG breaks down and
    production rtol=1e-5 solves stall at maxiter - while hybrid keeps A
    SPD and CG converges."""
    from sgvamp_tpu.core.cg import cg_batched

    rng = np.random.default_rng(0)
    M, bw, B = 1024, 256, 128  # the bench geometry (hb = 2)
    band, r, _ = simulate_ld_band(20000, M, bw, h2=0.7, lam=0.01, rng=rng,
                                  dtype=np.float32, strength=4.0, decay=0.97)
    ops = {d: SymBandedLD.from_band(band, block_size=B, dtype=d)
           for d in ("int4", "hybrid")}
    emin = {}
    for name, op in ops.items():
        D = np.asarray(op.to_dense()[0], np.float64)
        emin[name] = np.linalg.eigvalsh(40.0 * 0.5 * (D + D.T)
                                        + np.eye(op.M))[0]
    assert emin["int4"] < 0.0, f"panel no longer breaks int4: {emin}"
    assert emin["hybrid"] > 0.0, f"hybrid not SPD: {emin}"

    b = jnp.asarray(r, jnp.float32).reshape(1, -1)
    conv = {}
    for name, op in ops.items():
        def mv(v, op=op):
            return 40.0 * op.matvec(v) + v
        res = cg_batched(mv, b, jnp.zeros_like(b), maxiter=200, rtol=1e-5)
        conv[name] = (bool(res.converged[0]), int(res.iters[0]))
    assert not conv["int4"][0], conv
    assert conv["hybrid"][0], conv


def test_hybrid_sharded_matches_unsharded():
    """Hybrid through the shard_map path: slots and per-row scales shard
    over block rows like int4's."""
    from sgvamp_tpu.parallel.sharding import make_mesh, shard_inputs

    rng = np.random.default_rng(13)
    M, B, bw = 512, 64, 100
    band, r, _ = simulate_ld_band(20000, M, bandwidth=bw, rng=rng,
                                  dtype=np.float64)
    op = SymBandedLD.from_band(band, block_size=B, dtype="hybrid")
    x = rng.normal(size=(2, op.M)).astype(np.float32)
    want = np.asarray(op.matvec(jnp.asarray(x)))
    mesh = make_mesh(1, 4)
    inputs = VampInputs(op=op, r=jnp.asarray(r, jnp.float32)[None],
                        a=jnp.asarray([1.0]), N=jnp.asarray([20000.0]))
    sh = shard_inputs(inputs, mesh)
    assert sh.op.mesh is mesh
    got = np.asarray(sh.op.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_hybrid_engine_close_to_f32():
    """Full VAMP trajectory with hybrid LD storage tracks f32 at int8-ish
    fidelity (the far-block int4 error is small on benign panels)."""
    rng = np.random.default_rng(14)
    N, M, lam, h2, iters = 20000, 512, 0.05, 0.7, 3
    band, r, x0 = simulate_ld_band(N, M, 96, h2=h2, lam=lam, rng=rng,
                                   dtype=np.float32)
    cm = max(int(M * lam), 1)
    cfg = VampConfig(prior_update="em", dtype="float32", cg_maxit=100,
                     cg_rtol=1e-6, rho=0.5, lmmse_damp=True)
    prior = PriorState.create(lam, [1.0], [h2 / cm * N])
    u = (np.random.default_rng(15).integers(0, 2, (iters, 1, M)) * 2
         - 1).astype(np.float64)
    hists = {}
    for name, op in [("f32", SymBandedLD.from_band(band, block_size=128)),
                     ("hybrid", SymBandedLD.from_band(band, block_size=128,
                                                      dtype="hybrid"))]:
        inputs = VampInputs(op=op, r=jnp.asarray(r, jnp.float32)[None],
                            a=jnp.asarray([1.0], jnp.float32),
                            N=jnp.asarray([float(N)], jnp.float32))
        hists[name] = VampEngine(inputs, cfg, prior).run(iters, fixed_u=u)
    for it in range(iters):
        a, b = hists["hybrid"]["xhat1"][it], hists["f32"]["xhat1"][it]
        err = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30)
        assert err < 5e-2, f"it={it}: {err:.3e}"
