"""Native C++ ldparse tests: parity with the pandas path, band assembly,
error handling, and a (coarse) speed sanity check."""

import os
import time

import numpy as np
import pandas as pd
import pytest

from sgvamp_tpu import native
from sgvamp_tpu.data import loaders
from sgvamp_tpu.data.simulate import band_to_dense


def _write_ld(path, rows, cols, vals, variants):
    df = pd.DataFrame({
        "CHR_A": 1, "BP_A": rows + 1, "SNP_A": [variants[i] for i in rows],
        "CHR_B": 1, "BP_B": cols + 1, "SNP_B": [variants[i] for i in cols],
        "R": vals,
    })
    df.to_csv(path, sep="\t", index=False)


@pytest.fixture(scope="module")
def lib_available():
    if native.get_lib() is None:
        pytest.skip("g++ unavailable; native path not built")


def test_parse_matches_pandas(tmp_path, lib_available):
    rng = np.random.default_rng(0)
    M, nnz = 200, 500
    variants = [f"rs{i}" for i in range(M)]
    rows = rng.integers(0, M - 1, nnz)
    cols = np.minimum(rows + rng.integers(1, 20, nnz), M - 1)
    vals = rng.normal(size=nnz).round(6)
    path = tmp_path / "panel.ld"
    _write_ld(str(path), rows, cols, vals, variants)

    a, b, v = native.parse_ld(str(path), variants)
    os.environ["SGVAMP_NO_NATIVE"] = "1"
    try:
        vindex = {rs: i for i, rs in enumerate(variants)}
        a2, b2, v2 = loaders.load_ld_table(str(path), vindex)
    finally:
        del os.environ["SGVAMP_NO_NATIVE"]
    np.testing.assert_array_equal(a, a2)
    np.testing.assert_array_equal(b, b2)
    np.testing.assert_allclose(v, v2)


def test_parse_error_paths(tmp_path, lib_available):
    variants = ["rs0", "rs1"]
    bad = tmp_path / "bad.ld"
    bad.write_text("CHR_A BP_A SNP_A CHR_B BP_B SNP_B R\n1 1 rsX 1 2 rs1 0.5\n")
    with pytest.raises(ValueError, match="unknown SNP"):
        native.parse_ld(str(bad), variants)
    noheader = tmp_path / "nh.ld"
    noheader.write_text("A B C\n1 2 3\n")
    with pytest.raises(ValueError, match="missing SNP_A"):
        native.parse_ld(str(noheader), variants)
    with pytest.raises(ValueError, match="cannot open"):
        native.parse_ld(str(tmp_path / "absent.ld"), variants)


def test_band_assembly_matches_csr(tmp_path, lib_available):
    rng = np.random.default_rng(1)
    M, nnz = 150, 300
    rows = rng.integers(0, M - 1, nnz)
    cols = np.minimum(rows + rng.integers(1, 12, nnz), M - 1)
    vals = rng.normal(size=nnz)
    bw = native.max_bandwidth(rows, cols)
    assert bw == int(np.abs(rows - cols).max())
    band, dropped = native.triplets_to_band(rows, cols, vals, M, bw)
    assert dropped == 0
    R_band = band_to_dense(band.astype(np.float64))
    R_csr = loaders.triplets_to_csr(rows, cols, vals, M).toarray()
    # duplicate triplets: CSR sums, band keeps the last write - compare on
    # a duplicate-free subset instead
    pairs = set()
    dup_free = np.ones(nnz, bool)
    for i, (r0, c0) in enumerate(zip(rows, cols)):
        key = (min(r0, c0), max(r0, c0))
        if key in pairs:
            dup_free[i] = False
        pairs.add(key)
    if dup_free.all():
        np.testing.assert_allclose(R_band, R_csr, atol=1e-6)
    else:
        band2, _ = native.triplets_to_band(rows[dup_free], cols[dup_free],
                                           vals[dup_free], M, bw)
        R2 = loaders.triplets_to_csr(rows[dup_free], cols[dup_free],
                                     vals[dup_free], M).toarray()
        np.testing.assert_allclose(band_to_dense(band2.astype(np.float64)),
                                   R2, atol=1e-6)


def test_native_speed_sanity(tmp_path, lib_available):
    """Native parse should beat pandas comfortably on a larger table."""
    rng = np.random.default_rng(2)
    M, nnz = 5000, 200_000
    variants = [f"rs{i}" for i in range(M)]
    rows = rng.integers(0, M - 1, nnz)
    cols = np.minimum(rows + rng.integers(1, 50, nnz), M - 1)
    vals = rng.normal(size=nnz).round(6)
    path = tmp_path / "big.ld"
    _write_ld(str(path), rows, cols, vals, variants)

    t0 = time.time()
    a, b, v = native.parse_ld(str(path), variants)
    native_s = time.time() - t0

    vindex = {rs: i for i, rs in enumerate(variants)}
    t0 = time.time()
    df = pd.read_table(str(path), sep=r"\s+")
    a2 = np.asarray([vindex[rs] for rs in df["SNP_A"]])
    pandas_s = time.time() - t0

    assert len(a) == nnz
    assert native_s < pandas_s  # typically 5-20x faster
