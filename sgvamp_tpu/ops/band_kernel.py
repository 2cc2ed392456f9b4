"""Pallas TPU kernel: symmetric block-banded matvec with half storage.

The LD matrix is symmetric, so only the upper-triangle block diagonals
U[i, d] = R[block i, block i+d], d = 0..hb need to live in HBM. The kernel
walks block rows sequentially (TPU grid steps are sequential on a core,
so accumulation into a VMEM-resident output is race-free): at block row i
it reads the (hb+1, B, B) upper blocks once and accumulates BOTH
contributions

    y_i += U[i, d] @ x_{i+d}          (row)
    y_{i+d} += U[i, d]^T @ x_i        (mirrored column, d > 0)

so HBM traffic per matvec is (hb+1)/(2hb+1) of the full-band operator -
approaching half for wide bands - while x and y stay VMEM-resident
(supports M up to ~1M per core at S=2 RHS in f32). The d-loop is a static
unroll of MXU matmuls; the pallas pipeline double-buffers the U block rows.

This is the single-chip hot path; the sharded path uses the XLA einsum
operator (core/operators.py::BandedLD) whose collectives XLA manages.

Measured at M=512k, bandwidth 256, B=256 on one TPU v5e (chained in-device
matvecs): bf16 upper blocks 0.94 ms/pass (vs 1.28-1.34 ms for the full-band
einsum operator in either dtype); f32 upper blocks 1.65 ms (DMA-bound at
~651 GB/s — use bf16). The `window` flavor (one MXU issue per row over the
(hb+1)B x-window) measures 1.08 ms — the in-kernel transpose outweighs the
saved issues — and is kept as a tested alternative, off by default.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sym_band_kernel(ub_ref, x_ref, y_ref, *, hb: int, B: int, nb: int, G: int,
                     window: bool = False):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[:, :] = jnp.zeros_like(y_ref)

    acc_dt = jnp.promote_types(x_ref.dtype, jnp.float32)

    def per_diagonal(row, g, x_i):
        # One matmul per stored diagonal + its mirror (edge-safe).
        for d in range(hb + 1):
            Ud = ub_ref[g, d]  # (B, B) = R[block row, block row+d]
            if d == 0:
                y_ref[:, pl.ds(row * B, B)] += jnp.dot(
                    x_i, Ud.T, preferred_element_type=acc_dt
                )
            else:
                @pl.when(row + d < nb)
                def _(row=row, Ud=Ud, x_i=x_i, d=d):
                    j = row + d
                    x_j = x_ref[:, pl.ds(j * B, B)]
                    # y_row[s, p] += sum_q Ud[p, q] x_j[s, q]
                    y_ref[:, pl.ds(row * B, B)] += jnp.dot(
                        x_j, Ud.T, preferred_element_type=acc_dt
                    )
                    # y_j[s, q] += sum_p Ud[p, q] x_row[s, p]
                    y_ref[:, pl.ds(j * B, B)] += jnp.dot(
                        x_i, Ud, preferred_element_type=acc_dt
                    )

    # G block rows per grid step amortize per-step dispatch/DMA-setup
    # overhead (the dominant cost at B<=256 with ~0.5MB panels).
    for g in range(G):
        row = i * G + g
        x_i = x_ref[:, pl.ds(row * B, B)]  # (S, B)
        if window and hb >= 1:
            # Interior fast path: ONE matmul over the whole (hb+1)B-wide x
            # window computes y_row (fewer MXU issues, larger K dim); the
            # mirrors remain one matmul per off-diagonal.
            @pl.when(row + hb < nb)
            def _(row=row, g=g, x_i=x_i):
                xw = x_ref[:, pl.ds(row * B, (hb + 1) * B)]
                W = ub_ref[g].transpose(0, 2, 1).reshape((hb + 1) * B, B)
                y_ref[:, pl.ds(row * B, B)] += jnp.dot(
                    xw, W, preferred_element_type=acc_dt
                )
                for d in range(1, hb + 1):
                    y_ref[:, pl.ds((row + d) * B, B)] += jnp.dot(
                        x_i, ub_ref[g, d], preferred_element_type=acc_dt
                    )

            @pl.when(row + hb >= nb)
            def _(row=row, g=g, x_i=x_i):
                per_diagonal(row, g, x_i)
        else:
            per_diagonal(row, g, x_i)


_VMEM_BUDGET = 14 << 20  # stay under the ~16MiB scoped-vmem limit with slack


def _pick_rows_per_step(nb: int, panel_bytes_per_row: int,
                        resident_bytes: int) -> int:
    """Largest divisor of nb whose double-buffered panel fits VMEM next to
    the resident x/y vectors (observed hard limit: 16MiB scoped vmem).
    Measured at M=512k/bf16: G=16 equals G=8, so 8 is the cap."""
    fit = max(1, (_VMEM_BUDGET - resident_bytes) // (2 * panel_bytes_per_row))
    for g in (8, 4, 2):
        if g <= fit and nb % g == 0:
            return g
    return 1


@functools.partial(jax.jit,
                   static_argnames=("interpret", "rows_per_step", "window"))
def _sym_band_matvec(ub: Array, x: Array, interpret: bool = False,
                     rows_per_step: int = 0, window: bool = False) -> Array:
    """y = R @ x from upper blocks. ub: (nb, hb+1, B, B); x: (S, M).

    y accumulates in (at least) float32 regardless of storage dtype; the
    caller casts back if it wants narrower outputs.
    """
    nb, hbp1, B, _ = ub.shape
    hb = hbp1 - 1
    S, M = x.shape
    out_dt = jnp.promote_types(x.dtype, jnp.float32)
    panel_row = hbp1 * B * B * ub.dtype.itemsize
    resident = S * M * (x.dtype.itemsize + jnp.dtype(out_dt).itemsize)
    G = rows_per_step or _pick_rows_per_step(nb, panel_row, resident)
    if nb % G:
        raise ValueError(f"rows_per_step={G} must divide nb={nb}")
    kernel = functools.partial(_sym_band_kernel, hb=hb, B=B, nb=nb, G=G,
                               window=window)
    return pl.pallas_call(
        kernel,
        grid=(nb // G,),
        in_specs=[
            pl.BlockSpec((G, hbp1, B, B), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, M), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, M), out_dt),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * nb * hbp1 * B * B * S,
            bytes_accessed=ub.size * ub.dtype.itemsize + 2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(ub, x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SymBandedLD:
    """Symmetric block-banded LD operator backed by the pallas kernel.

    upper: (K, nb, hb+1, B, B) upper-triangle block diagonals.
    Same matvec contract as the other operators: x is (S*K, M).
    """

    upper: Array
    s: float = dataclasses.field(default=0.0, metadata=dict(static=True))
    rows_per_step: int = dataclasses.field(default=0, metadata=dict(static=True))
    window: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @property
    def K(self) -> int:
        return self.upper.shape[0]

    @property
    def nb(self) -> int:
        return self.upper.shape[1]

    @property
    def hb(self) -> int:
        return self.upper.shape[2] - 1

    @property
    def B(self) -> int:
        return self.upper.shape[-1]

    @property
    def M(self) -> int:
        return self.nb * self.B

    def bytes_per_pass(self) -> int:
        """HBM bytes of LD blocks read by one matvec (roofline accounting)."""
        return self.upper.size * self.upper.dtype.itemsize

    @staticmethod
    def fits_vmem(M: int, S: int = 2, storage_bytes: int = 2) -> bool:
        """Whether the VMEM-resident x/y design fits the ~16MiB scoped
        limit at this M (observed: both vectors can be double-buffered,
        so budget 2*S*M*(storage + 4 accum) bytes + panel slack).
        M=512k/S=2/bf16 fits; M=1M does not (measured OOM by 10MB)."""
        return 2 * S * M * (storage_bytes + 4) < (13 << 20)

    def matvec(self, x: Array) -> Array:
        K = self.K
        S = x.shape[0] // K
        interpret = jax.default_backend() != "tpu"
        xs = x.reshape(S, K, self.M).transpose(1, 0, 2)  # (K, S, M)
        y = jax.vmap(lambda ub, xv: _sym_band_matvec(
            ub, xv, interpret=interpret, rows_per_step=self.rows_per_step,
            window=self.window))(
            self.upper, xs.astype(self.upper.dtype)
        )
        y = y.transpose(1, 0, 2).reshape(x.shape).astype(x.dtype)
        if self.s != 0.0:
            y = (1.0 - self.s) * y + self.s * x
        return y

    @staticmethod
    def from_band(band: "np.ndarray", block_size: int, K: int = 1,
                  s: float = 0.0, dtype=None) -> "SymBandedLD":
        """Pack symmetric band storage (M, 2*bw+1) into upper blocks.

        Same padding semantics as BandedLD.from_band (identity diagonal on
        padded markers, callers mask them).
        """
        band = np.asarray(band)
        M, nd_full = band.shape
        bw = (nd_full - 1) // 2
        B = block_size
        pad = (-M) % B
        if pad:
            ext = np.zeros((pad, nd_full), dtype=band.dtype)
            ext[:, bw] = 1.0
            band = np.concatenate([band, ext], axis=0)
            M = M + pad
        nb = M // B
        hb = -(-bw // B)
        band_r = band.reshape(nb, B, nd_full)
        out_dtype = dtype or band.dtype
        upper = np.zeros((nb, hb + 1, B, B), dtype=out_dtype)
        p = np.arange(B)[:, None]
        q = np.arange(B)[None, :]
        for d in range(hb + 1):
            off0 = d * B
            col = bw + off0 + q - p
            valid = (col >= 0) & (col < nd_full)
            colc = np.clip(col, 0, nd_full - 1)
            vals = np.take_along_axis(band_r, colc[None, :, :], axis=2)
            blk = np.where(valid[None], vals, 0.0)
            if d == 0:
                # Keep only the upper triangle + diagonal of the diagonal
                # block; the kernel's mirrored update adds the transpose,
                # so splitting the diagonal block symmetrically would
                # double-count. Instead: store the FULL diagonal block and
                # skip its mirror in the kernel (d == 0 branch).
                pass
            upper[:, d] = blk
        stacked = upper[None] if K == 1 else np.repeat(upper[None], K, axis=0)
        return SymBandedLD(upper=jnp.asarray(stacked), s=s)

    def to_dense(self) -> Array:
        """Materialize (K, M, M) - tests only."""
        K, nb, hbp1, B = self.K, self.nb, self.hb + 1, self.B
        up = np.asarray(self.upper)
        out = np.zeros((K, self.M, self.M), dtype=up.dtype)
        for k in range(K):
            for i in range(nb):
                for d in range(hbp1):
                    j = i + d
                    if j < nb:
                        blk = up[k, i, d]
                        out[k, i * B:(i + 1) * B, j * B:(j + 1) * B] += blk
                        if d > 0:
                            out[k, j * B:(j + 1) * B, i * B:(i + 1) * B] += blk.T
        eye = np.eye(self.M, dtype=out.dtype)
        return jnp.asarray((1.0 - self.s) * out + self.s * eye[None])
