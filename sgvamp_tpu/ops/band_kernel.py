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
approaching half for wide bands. The d-loop is a static unroll of MXU
matmuls; the pallas pipeline double-buffers the U block rows.

Two flavors share the storage format (SymBandedLD.mode picks, "auto" by
shape): the RESIDENT kernel above keeps x and y whole in VMEM (fastest,
caps at ~600k markers at S=2); the STREAMED kernel below chunks x/y over
HBM with a VMEM carry for chunk-crossing mirrors, so M is unbounded, and
its spill=True variant is the per-shard body of the shard_map path
(SymBandedLD.mesh) that marker-shards the kernel across devices with
halo + mirror-spill ppermutes.

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


def _sym_slab_kernel(ub_ref, x_ref, y_ref, *, hb: int, B: int, nb: int, G: int):
    """Slab-layout resident kernel: storage is pre-transposed stacked slabs
    T_i = [U[i,0]^T; ...; U[i,hb]^T] of shape ((hb+1)B, B), so the row part
    is ONE window matmul y_i += x[:, iB:(i+hb+1)B] @ T_i (the transpose that
    made the `window` flavor slow is free at pack time) and each mirror is a
    dot_general contracting both operands' last dims (no data relayout).
    x must be zero-padded by hb*B so the window never reads OOB; T blocks
    past the matrix end are zeros by band-storage construction.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[:, :] = jnp.zeros_like(y_ref)

    acc_dt = jnp.promote_types(x_ref.dtype, jnp.float32)

    for g in range(G):
        row = i * G + g
        xw = x_ref[:, pl.ds(row * B, (hb + 1) * B)]
        y_ref[:, pl.ds(row * B, B)] += jnp.dot(
            xw, ub_ref[g], preferred_element_type=acc_dt
        )
        x_i = x_ref[:, pl.ds(row * B, B)]
        for d in range(1, hb + 1):
            @pl.when(row + d < nb)
            def _(row=row, g=g, d=d, x_i=x_i):
                Td = ub_ref[g, pl.ds(d * B, B)]  # (B, B) = U[row, d]^T
                # y_{row+d}[s, q] += sum_p x_i[s, p] U[p, q]
                #                  = sum_p x_i[s, p] Td[q, p]
                y_ref[:, pl.ds((row + d) * B, B)] += jax.lax.dot_general(
                    x_i, Td, (((1,), (1,)), ((), ())),
                    preferred_element_type=acc_dt,
                )


@functools.partial(jax.jit, static_argnames=("interpret", "rows_per_step"))
def _sym_slab_matvec(ub: Array, x: Array, interpret: bool = False,
                     rows_per_step: int = 0) -> Array:
    """y = R @ x from slab storage. ub: (nb, (hb+1)*B, B); x: (S, M)."""
    nb, hbp1B, B = ub.shape
    hbp1 = hbp1B // B
    hb = hbp1 - 1
    S, M = x.shape
    out_dt = jnp.promote_types(x.dtype, jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, hb * B))) if hb else x
    panel_row = hbp1B * B * ub.dtype.itemsize
    resident = S * (M + hb * B) * x.dtype.itemsize + S * M * jnp.dtype(out_dt).itemsize
    G = rows_per_step or _pick_rows_per_step(nb, panel_row, resident)
    if nb % G:
        raise ValueError(f"rows_per_step={G} must divide nb={nb}")
    kernel = functools.partial(_sym_slab_kernel, hb=hb, B=B, nb=nb, G=G)
    return pl.pallas_call(
        kernel,
        grid=(nb // G,),
        in_specs=[
            pl.BlockSpec((G, hbp1B, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, M + hb * B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, M), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, M), out_dt),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * nb * hbp1B * B * S,
            bytes_accessed=ub.size * ub.dtype.itemsize + 2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(ub, xp)


def _sym_band_kernel_streamed(ub_ref, xc_ref, xn_ref, sc_ref, y_ref, cout_ref,
                              cin_ref, carry_ref, *, hb: int, B: int, nb: int,
                              G: int, S: int, spill: bool,
                              quantized: bool = False,
                              packed4: bool = False,
                              hybrid: bool = False):
    """Streamed flavor: x and y are chunked over HBM instead of living whole
    in VMEM, so M is unbounded (the resident kernel caps at ~600k markers).

    Grid is (K, C): per cohort k, chunks of G block rows walk sequentially.
    Row g's output is GATHERED in one pass (row part U[g,d] @ x_{g+d},
    in-chunk mirrors U[g-d,d]^T @ x_{g-d}) and stored once - no VMEM
    read-modify-write on a resident y. Mirror contributions that cross the
    chunk boundary (target rows in chunk c+1) accumulate into a (S, hb*B)
    VMEM carry that the next chunk folds into its rows; because the grid is
    sequential per cohort this is race-free, and HBM traffic stays at
    one read of the upper blocks + ~2 reads of x + 1 write of y.

    spill=True (the sharded path): x is halo-extended by the caller with
    the next shard's first hb blocks (padded to a whole chunk), tail
    mirrors are NOT dropped at the local boundary, and the final carry -
    this shard's contribution to the next shard's first hb*B markers - is
    exported through cout for a ppermute+add by the wrapper.

    quantized=True: ub holds int8 blocks; each block converts to bf16 on
    the VPU before its matmul and the dot OUTPUT is scaled by the block's
    f32 scale from sc_ref (exact, since the scale is scalar per block) -
    halving LD HBM traffic vs bf16 storage. sc_ref is ones otherwise.

    packed4=True: ub holds two int4 values per byte, packed along the
    block's column axis as contiguous HALVES - byte [p, j] carries
    Q[p, j] in its low nibble and Q[p, j + B/2] in its high nibble - so
    both matmul orientations decompose into two half-width matmuls over
    contiguous slices (no lane interleaves anywhere). Scales are PER ROW
    of each block (sc_ref block (1, G, hb+1, B), indexed by the block's
    p axis), applied on the output side for the row part and folded into
    x for the mirror part - exact in both orientations. The d=0 diagonal
    block is stored with its unit diagonal STRIPPED (from_band subtracts
    I before quantizing; the kernel adds x_g back), so the per-row scale
    adapts to off-diagonal magnitude instead of being pinned at 1/7.

    hybrid=True: ub has hb+2 slots of (B, B/2) int8. Slots 0,1 are the
    d=0 block's int8 COLUMN HALVES (full 255-level precision, stripped
    unit diagonal, per-row scales) and slot d+1 holds far diagonal d >= 1
    packed int4 exactly as packed4. Same two-half-matmul decomposition in
    both cases - the d=0 halves just skip the nibble unpack. Keeps
    A = gamw*R + gam2*I SPD on ill-conditioned panels where pure int4's
    quantization error makes it indefinite (see SymBandedLD.hybrid).
    """
    c = pl.program_id(1)
    C = pl.num_programs(1)
    acc_dt = jnp.promote_types(xc_ref.dtype, jnp.float32)
    if quantized or packed4 or hybrid:
        acc_dt = jnp.float32
    Bh = B // 2

    @pl.when(c == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    cin_ref[...] = carry_ref[...]
    carry_ref[...] = jnp.zeros_like(carry_ref)

    def xblk(local):
        # x block for local row index in [0, 2G): current or next chunk.
        if local < G:
            return xc_ref[0, :, pl.ds(local * B, B)]
        return xn_ref[0, :, pl.ds((local - G) * B, B)]

    def blk(g_idx, d):
        Ud = ub_ref[0, g_idx, d]
        return Ud.astype(jnp.bfloat16) if quantized else Ud

    def scaled(out, g_idx, d):
        return out * sc_ref[0, g_idx, d] if quantized else out

    def unpack4(g_idx, slot):
        # Sign-extend both nibbles via int32 shifts (Mosaic-safe); values
        # in [-8, 7] convert to bf16 exactly.
        p32 = ub_ref[0, g_idx, slot].astype(jnp.int32)  # (B, Bh)
        lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
        hi = jnp.right_shift(p32, 4)
        return lo.astype(jnp.bfloat16), hi.astype(jnp.bfloat16)

    def halves(g_idx, d):
        # (left, right) (B, Bh) bf16 column halves of diagonal d's block.
        if hybrid and d == 0:  # int8 halves in slots 0,1 - no unpack
            return (ub_ref[0, g_idx, 0].astype(jnp.bfloat16),
                    ub_ref[0, g_idx, 1].astype(jnp.bfloat16))
        return unpack4(g_idx, d + 1 if hybrid else d)

    def rowscale(g_idx, d):
        if hybrid:  # slots 0,1 share the d=0 scale; far d sits at d+1
            return sc_ref[0, g_idx, 0 if d == 0 else d + 1]
        return sc_ref[0, g_idx, d]

    def rowdot(g_idx, d, xfull):
        # y[s, p] = sum_q xfull[s, q] * U[g_idx, d][p, q]
        if packed4 or hybrid:
            lo, hi = halves(g_idx, d)
            out = (jnp.dot(xfull[:, :Bh], lo.T, preferred_element_type=acc_dt)
                   + jnp.dot(xfull[:, Bh:], hi.T, preferred_element_type=acc_dt))
            out = out * rowscale(g_idx, d)  # per-row scale on the p axis
            if d == 0:  # re-add the stripped unit diagonal
                out += xfull.astype(acc_dt)
            return out
        return scaled(jnp.dot(xfull, blk(g_idx, d).T,
                              preferred_element_type=acc_dt), g_idx, d)

    def mirdot(g_idx, d, xfull):
        # y[s, q] = sum_p xfull[s, p] * U[g_idx, d][p, q]   (d >= 1 only)
        if packed4 or hybrid:
            lo, hi = halves(g_idx, d)
            # per-row scale rides the contraction axis: fold it into x
            xs = (xfull.astype(jnp.float32)
                  * rowscale(g_idx, d)).astype(jnp.bfloat16)
            return jnp.concatenate(
                [jnp.dot(xs, lo, preferred_element_type=acc_dt),
                 jnp.dot(xs, hi, preferred_element_type=acc_dt)], axis=-1)
        return scaled(jnp.dot(xfull, blk(g_idx, d),
                              preferred_element_type=acc_dt), g_idx, d)

    # Row part reads x up to hb blocks past the chunk; without spill those
    # reads land past nb only in the very last chunk (where the clamped
    # x_next holds stale-but-finite data), so the contribution is zeroed.
    not_last = (c < C - 1).astype(acc_dt)

    for g in range(G):
        x_g = xblk(g)
        acc = jnp.zeros((S, B), acc_dt)
        if hb > 0 and g < hb:
            acc += cin_ref[:, pl.ds(g * B, B)]
        for d in range(hb + 1):
            contrib = rowdot(g, d, xblk(g + d))
            if g + d >= G and not spill:
                contrib = contrib * not_last
            acc += contrib
        for d in range(1, hb + 1):
            p = g - d
            if p >= 0:
                acc += mirdot(p, d, xblk(p))
        y_ref[0, :, pl.ds(g * B, B)] = acc.astype(y_ref.dtype)
        for d in range(1, hb + 1):
            if g + d >= G:
                mirror = mirdot(g, d, x_g)
                if not spill:
                    mirror = mirror * not_last
                carry_ref[:, pl.ds((g + d - G) * B, B)] += mirror

    @pl.when(c == C - 1)
    def _():
        cout_ref[0] = carry_ref[...].astype(cout_ref.dtype)


def _sym_slab_kernel_streamed(ub_ref, xc_ref, xn_ref, y_ref, cout_ref,
                              cin_ref, carry_ref, *, hb: int, B: int, nb: int,
                              G: int, S: int, spill: bool):
    """Streamed flavor of the slab kernel: same chunked walk + carry protocol
    as _sym_band_kernel_streamed, but the row part is ONE window matmul over
    the contiguous (hb+1)B x-window (slab storage is pre-transposed) and
    mirrors contract with dot_general - no relayout, fewer MXU issues.

    Needs the from_band zero-block invariant (U[i, d] == 0 for i + d >= nb)
    so windows reaching past the matrix read zeros times stale x instead of
    requiring per-diagonal masking.
    """
    c = pl.program_id(1)
    acc_dt = jnp.promote_types(xc_ref.dtype, jnp.float32)

    @pl.when(c == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    cin_ref[...] = carry_ref[...]
    carry_ref[...] = jnp.zeros_like(carry_ref)

    # One contiguous (S, 2GB) window source: current chunk + next chunk
    # (clamped to itself in the last chunk; those reads hit zero U blocks).
    xcat = jnp.concatenate([xc_ref[0], xn_ref[0]], axis=-1)

    for g in range(G):
        Tg = ub_ref[0, g]  # ((hb+1)B, B) = [U[g,0]^T; ...; U[g,hb]^T]
        xw = xcat[:, g * B:(g + hb + 1) * B]
        acc = jnp.dot(xw, Tg, preferred_element_type=acc_dt)
        if hb > 0 and g < hb:
            acc += cin_ref[:, pl.ds(g * B, B)]
        for d in range(1, hb + 1):
            p = g - d
            if p >= 0:
                # y_g[s, q] += sum_p' x_p[s, p'] U[p, d][p', q]
                #            = sum_p' x_p[s, p'] T_p[d*B + q, p']
                acc += jax.lax.dot_general(
                    xcat[:, p * B:(p + 1) * B], ub_ref[0, p, pl.ds(d * B, B)],
                    (((1,), (1,)), ((), ())), preferred_element_type=acc_dt)
        y_ref[0, :, pl.ds(g * B, B)] = acc.astype(y_ref.dtype)
        x_g = xcat[:, g * B:(g + 1) * B]
        for d in range(1, hb + 1):
            if g + d >= G:
                mirror = jax.lax.dot_general(
                    x_g, ub_ref[0, g, pl.ds(d * B, B)],
                    (((1,), (1,)), ((), ())), preferred_element_type=acc_dt)
                if not spill:
                    # interior chunks always have a real next chunk; only the
                    # last chunk's export is dropped (its targets are past nb,
                    # where U is zero so mirror == 0 anyway - keep the mask
                    # for exact-zero carry-out semantics)
                    mirror = mirror * (c < pl.num_programs(1) - 1).astype(acc_dt)
                carry_ref[:, pl.ds((g + d - G) * B, B)] += mirror

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        cout_ref[0] = carry_ref[...].astype(cout_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("nb", "interpret", "rows_per_step", "spill"))
def _sym_slab_matvec_streamed(ub: Array, x: Array, nb: int,
                              interpret: bool = False, rows_per_step: int = 0,
                              spill: bool = False):
    """Streamed slab matvec. ub: (K, nb, (hb+1)*B, B); x: (K, S, Mx)."""
    K, nb_u, hbp1B, B = ub.shape
    assert nb_u == nb
    hbp1 = hbp1B // B
    hb = hbp1 - 1
    S = x.shape[1]
    out_dt = jnp.promote_types(x.dtype, jnp.float32)
    hbB = max(hb, 1) * B
    panel_row = hbp1B * B * ub.dtype.itemsize
    stream_row = S * B * (3 * x.dtype.itemsize + jnp.dtype(out_dt).itemsize)
    G = rows_per_step or _pick_chunk_rows(nb, hb, panel_row, stream_row)
    if nb % G or G < hb:
        raise ValueError(f"rows_per_step={G} must divide nb={nb} and be >= hb={hb}")
    C = nb // G
    Cx = x.shape[2] // (G * B)
    if spill and x.shape[2] != (nb + G) * B:
        raise ValueError("spill=True needs x halo-extended to (nb + G) * B")
    kernel = functools.partial(_sym_slab_kernel_streamed, hb=hb, B=B, nb=nb,
                               G=G, S=S, spill=spill)
    return pl.pallas_call(
        kernel,
        grid=(K, C),
        in_specs=[
            pl.BlockSpec((1, G, hbp1B, B), lambda k, c: (k, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, G * B), lambda k, c: (k, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, G * B),
                         lambda k, c: (k, 0, jnp.minimum(c + 1, Cx - 1)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, S, G * B), lambda k, c: (k, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, hbB), lambda k, c: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, S, nb * B), out_dt),
            jax.ShapeDtypeStruct((K, S, hbB), out_dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, hbB), out_dt),
            pltpu.VMEM((S, hbB), out_dt),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * K * nb * hbp1B * B * S,
            bytes_accessed=(ub.size * ub.dtype.itemsize
                            + 2 * x.size * x.dtype.itemsize
                            + K * S * nb * B * jnp.dtype(out_dt).itemsize),
            transcendentals=0,
        ),
    )(ub, x, x)


def _pick_chunk_rows(nb: int, hb: int, panel_bytes_per_row: int,
                     stream_bytes_per_row: int) -> int:
    """Largest divisor of nb (capped at 32 to bound unroll size) whose
    double-buffered panels fit the VMEM budget, subject to G >= hb (the
    carry reaches at most one chunk ahead)."""
    best = nb  # fallback: single chunk
    for g in range(min(nb, 32), 0, -1):
        if nb % g:
            continue
        need = 2 * g * (panel_bytes_per_row + stream_bytes_per_row)
        if g >= hb and need <= _VMEM_BUDGET:
            return g
        if g >= hb:
            best = g
    return best


@functools.partial(jax.jit,
                   static_argnames=("nb", "interpret", "rows_per_step", "spill",
                                    "packed4", "hybrid"))
def _sym_band_matvec_streamed(ub: Array, x: Array, nb: int,
                              interpret: bool = False, rows_per_step: int = 0,
                              spill: bool = False, scales: Array = None,
                              packed4: bool = False, hybrid: bool = False):
    """(y, carry_out) = streamed symmetric block-banded matvec.

    ub: (K, nb, hb+1, B, B) upper blocks; x: (K, S, Mx) where Mx = nb*B,
    or (nb + G)*B when spill=True (halo-extended by the caller).
    y: (K, S, nb*B) in f32; carry_out: (K, S, max(hb,1)*B) mirror spill
    past the last local row (zeros unless spill=True).
    scales: (K, nb, hb+1) f32 per-block dequantization scales, required
    when ub is int8 (see SymBandedLD.from_band dtype="int8").
    packed4: ub is (K, nb, hb+1, B, B//2) int8 holding two int4 values per
    byte (contiguous-halves packing) and scales is (K, nb, hb+1, B)
    per-row (see from_band dtype="int4").
    hybrid: ub is (K, nb, hb+2, B, B//2) int8 - slots 0,1 the d=0 block's
    int8 column halves, slots d+1 the far blocks packed int4; scales is
    (K, nb, hb+2, B) per-row (see from_band dtype="hybrid").
    """
    K, nb_u, nslot, B, Bp = ub.shape
    if packed4 or hybrid:
        B = 2 * Bp
    assert nb_u == nb
    hb = nslot - 2 if hybrid else nslot - 1
    S = x.shape[1]
    quantized = ub.dtype == jnp.int8 and not packed4 and not hybrid
    out_dt = (jnp.float32 if quantized or packed4 or hybrid
              else jnp.promote_types(x.dtype, jnp.float32))
    if scales is None:
        assert not (quantized or packed4 or hybrid), \
            "quantized blocks need scales"
        scales = jnp.ones((K, nb, nslot), jnp.float32)
    hbB = max(hb, 1) * B
    panel_row = nslot * B * Bp * ub.dtype.itemsize
    stream_row = S * B * (3 * x.dtype.itemsize + jnp.dtype(out_dt).itemsize)
    G = rows_per_step or _pick_chunk_rows(nb, hb, panel_row, stream_row)
    if nb % G or G < hb:
        raise ValueError(f"rows_per_step={G} must divide nb={nb} and be >= hb={hb}")
    C = nb // G
    Cx = x.shape[2] // (G * B)
    if spill and x.shape[2] != (nb + G) * B:
        raise ValueError("spill=True needs x halo-extended to (nb + G) * B")
    kernel = functools.partial(_sym_band_kernel_streamed, hb=hb, B=B, nb=nb,
                               G=G, S=S, spill=spill, quantized=quantized,
                               packed4=packed4, hybrid=hybrid)
    sc_spec = (pl.BlockSpec((1, G, nslot, B), lambda k, c: (k, c, 0, 0),
                            memory_space=pltpu.VMEM)
               if packed4 or hybrid else
               pl.BlockSpec((1, G, nslot), lambda k, c: (k, c, 0),
                            memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(K, C),
        in_specs=[
            pl.BlockSpec((1, G, nslot, B, Bp), lambda k, c: (k, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, G * B), lambda k, c: (k, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, G * B),
                         lambda k, c: (k, 0, jnp.minimum(c + 1, Cx - 1)),
                         memory_space=pltpu.VMEM),
            sc_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, S, G * B), lambda k, c: (k, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, hbB), lambda k, c: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, S, nb * B), out_dt),
            jax.ShapeDtypeStruct((K, S, hbB), out_dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, hbB), out_dt),
            pltpu.VMEM((S, hbB), out_dt),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * K * nb * (hb + 1) * B * B * S,
            bytes_accessed=(ub.size * ub.dtype.itemsize
                            + 2 * x.size * x.dtype.itemsize
                            + K * S * nb * B * jnp.dtype(out_dt).itemsize),
            transcendentals=0,
        ),
    )(ub, x, x, scales)


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


def _unpack_int4(packed: Array) -> Array:
    """(..., B, B//2) int8 contiguous-halves packed -> (..., B, B) int32.

    Low nibble holds column j, high nibble column j + B/2 (sign-extended
    via arithmetic shifts); the inverse of from_band's dtype="int4" pack.
    """
    p32 = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    hi = jnp.right_shift(p32, 4)
    return jnp.concatenate([lo, hi], axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SymBandedLD:
    """Symmetric block-banded LD operator backed by the pallas kernel.

    upper: (K, nb, hb+1, B, B) upper-triangle block diagonals.
    Same matvec contract as the other operators: x is (S*K, M).
    """

    upper: Array
    # per-block dequantization scales (K, nb, hb+1) f32; set only when
    # upper is int8 (dtype="int8" at from_band: per-block symmetric
    # quantization q = round(U/scale), scale = max|U|/127 - halves LD HBM
    # traffic vs bf16; supported by the streamed diag kernel).
    # For dtype="int4" (packed=True) scales are PER ROW: (K, nb, hb+1, B).
    # For dtype="hybrid" scales are (K, nb, hb+2, B) per row.
    scales: Array = None
    # int4 packing: upper is (K, nb, hb+1, B, B//2) int8, two 4-bit values
    # per byte packed along the block's column axis as contiguous halves
    # (low nibble = column j, high nibble = column j + B/2), per-row
    # scales, unit diagonal of the d=0 block stripped (the kernel re-adds
    # x) - quarters LD HBM traffic vs bf16 storage.
    packed: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # hybrid int8/int4 storage (dtype="hybrid"): upper is
    # (K, nb, hb+2, B, B//2) int8. Slots 0 and 1 hold the d=0 diagonal
    # block at FULL int8 precision as contiguous column halves (slot 0 =
    # columns [0, B/2), slot 1 = columns [B/2, B)), unit diagonal
    # stripped, per-row scales; slots d+1 for d >= 1 hold the far blocks
    # packed int4 exactly like packed=True. Same 2-values-per-byte HBM
    # traffic as int4 on the far blocks, but the conditioning-critical
    # diagonal block keeps 255 levels: measured on the ill-conditioned
    # strength-4 panel, pure int4 makes A = gamw*R + gam2*I INDEFINITE
    # (eigmin -0.66 at the bench geometry; CG breakdown, the
    # BENCH_AB.json solve_by_dtype failure) while hybrid stays SPD
    # (eigmin 0.43) - production solves converge at 2/3 of int8's LD
    # traffic.
    hybrid: bool = dataclasses.field(default=False, metadata=dict(static=True))
    s: float = dataclasses.field(default=0.0, metadata=dict(static=True))
    rows_per_step: int = dataclasses.field(default=0, metadata=dict(static=True))
    window: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # "diag": upper is (K, nb, hb+1, B, B) per-diagonal blocks.
    # "slab": upper is (K, nb, (hb+1)*B, B) pre-transposed stacked slabs
    # T_i = [U[i,0]^T; ...; U[i,hb]^T] (one window matmul per row).
    layout: str = dataclasses.field(default="diag", metadata=dict(static=True))
    # "auto" picks resident (x/y whole in VMEM) when it fits the scoped
    # VMEM limit and the streamed kernel above it; "resident"/"streamed"
    # force one flavor (tests / A-B benchmarks).
    mode: str = dataclasses.field(default="auto", metadata=dict(static=True))
    # When set, matvec runs as an SPMD shard_map over this mesh's marker-
    # shard axis: block rows are sharded, x halo blocks ride a ppermute
    # right-to-left, and the mirror spill rides a ppermute left-to-right.
    mesh: object = dataclasses.field(default=None, metadata=dict(static=True))

    @property
    def K(self) -> int:
        return self.upper.shape[0]

    @property
    def nb(self) -> int:
        return self.upper.shape[1]

    @property
    def hb(self) -> int:
        if self.layout == "slab":
            return self.upper.shape[2] // self.upper.shape[3] - 1
        if self.hybrid:
            return self.upper.shape[2] - 2  # slots 0,1 both hold d=0
        return self.upper.shape[2] - 1

    @property
    def B(self) -> int:
        if self.packed or self.hybrid:
            return self.upper.shape[-1] * 2
        return self.upper.shape[-1]

    @property
    def M(self) -> int:
        return self.nb * self.B

    def bytes_per_pass(self) -> int:
        """HBM bytes of LD blocks read by one matvec (roofline accounting)."""
        n = self.upper.size * self.upper.dtype.itemsize
        if self.scales is not None:
            n += self.scales.size * self.scales.dtype.itemsize
        return n

    @staticmethod
    def fits_vmem(M: int, S: int = 2, storage_bytes: int = 2) -> bool:
        """Whether the VMEM-resident x/y design fits the ~16MiB scoped
        limit at this M (observed: both vectors can be double-buffered,
        so budget 2*S*M*(storage + 4 accum) bytes + panel slack).
        M=512k/S=2/bf16 fits; M=1M does not (measured OOM by 10MB)."""
        return 2 * S * M * (storage_bytes + 4) < (13 << 20)

    @property
    def quantized(self) -> bool:
        """int8 per-block quantized storage (int4 is `packed` and the
        int8/int4 mix is `hybrid` instead)."""
        return (self.upper.dtype == jnp.int8 and not self.packed
                and not self.hybrid)

    def diag_blocks(self) -> Array:
        """(K, nb, B, B) regularized diagonal blocks of Rused (for the
        block-Jacobi preconditioner, core/precond.py). from_band stores the
        FULL diagonal block at d=0 (no triangle split), so this is exact."""
        if self.layout == "slab":
            # T_i rows [0, B) hold U[i, 0]^T
            D = jnp.swapaxes(self.upper[:, :, :self.B, :], -1, -2)
        else:
            D = self.upper[:, :, 0]
        if self.hybrid:
            # slots 0,1 = int8 column halves of the (diag-stripped) d=0 block
            D = jnp.concatenate([self.upper[:, :, 0], self.upper[:, :, 1]],
                                axis=-1).astype(jnp.float32)
            D = D * self.scales[:, :, 0, :, None]  # per-row (p axis)
            D = D + jnp.eye(self.B, dtype=D.dtype)
        elif self.packed:
            D = _unpack_int4(D).astype(jnp.float32)
            D = D * self.scales[:, :, 0, :, None]  # per-row (p axis)
            D = D + jnp.eye(self.B, dtype=D.dtype)  # stripped unit diagonal
        else:
            D = D.astype(jnp.float32)
            if self.quantized:
                D = D * self.scales[:, :, 0, None, None]
        if self.s != 0.0:
            eye = jnp.eye(self.B, dtype=D.dtype)
            D = (1.0 - self.s) * D + self.s * eye
        return D

    def matvec(self, x: Array) -> Array:
        K = self.K
        S = x.shape[0] // K
        interpret = jax.default_backend() != "tpu"
        xs = x.reshape(S, K, self.M).transpose(1, 0, 2)  # (K, S, M)
        # int8/int4 blocks dequantize to bf16 in-kernel; x rides in bf16 too.
        comp_dt = (jnp.bfloat16 if self.quantized or self.packed or self.hybrid
                   else self.upper.dtype)
        xs = xs.astype(comp_dt)
        if self.mesh is not None:
            y = self._matvec_sharded(xs, interpret)
        elif self.layout == "slab" and self._use_resident(S, x.dtype.itemsize):
            y = jax.vmap(lambda ub, xv: _sym_slab_matvec(
                ub, xv, interpret=interpret,
                rows_per_step=self.rows_per_step))(self.upper, xs)
        elif self.layout == "slab":
            y, _ = _sym_slab_matvec_streamed(
                self.upper, xs, self.nb, interpret=interpret,
                rows_per_step=self.rows_per_step)
        elif self._use_resident(S, x.dtype.itemsize):
            y = jax.vmap(lambda ub, xv: _sym_band_matvec(
                ub, xv, interpret=interpret, rows_per_step=self.rows_per_step,
                window=self.window))(self.upper, xs)
        else:
            y, _ = _sym_band_matvec_streamed(
                self.upper, xs, self.nb, interpret=interpret,
                rows_per_step=self.rows_per_step, scales=self.scales,
                packed4=self.packed, hybrid=self.hybrid)
        y = y.transpose(1, 0, 2).reshape(x.shape).astype(x.dtype)
        if self.s != 0.0:
            y = (1.0 - self.s) * y + self.s * x
        return y

    def _use_resident(self, S: int, x_itemsize: int) -> bool:
        if self.quantized or self.packed or self.hybrid:
            if self.mode == "resident":
                raise ValueError(
                    "quantized SymBandedLD has no resident kernel "
                    "(dequant lives in the streamed flavor); use "
                    "mode='streamed' or 'auto'")
            return False
        if self.mode == "resident":
            return True
        if self.mode == "streamed":
            return False
        return SymBandedLD.fits_vmem(self.M, S, self.upper.dtype.itemsize)

    def _matvec_sharded(self, xs: Array, interpret: bool) -> Array:
        """SPMD matvec over the mesh's marker-shard axis (shard_map).

        Each shard owns a contiguous run of block rows plus the matching
        slice of x. The symmetric storage needs (a) the next shard's first
        hb x-blocks as a halo (ppermute toward lower shard ids) and (b) a
        mirror-spill exchange: contributions U[i,d]^T x_i whose target row
        lives on the next shard travel as the kernel's carry output
        (ppermute toward higher shard ids) and add into that shard's first
        hb*B outputs. Wraparound legs carry exact zeros because the upper
        blocks past the global end are zero.
        """
        import functools as _ft

        try:
            from jax import shard_map as _sm
            shard_map = _ft.partial(_sm, check_vma=False)
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map as _sm
            shard_map = _ft.partial(_sm, check_rep=False)
        from jax.sharding import PartitionSpec as P

        from sgvamp_tpu.parallel.sharding import COHORT_AXIS, SHARD_AXIS

        mesh = self.mesh
        n = mesh.shape[SHARD_AXIS]
        hb, B, nb = self.hb, self.B, self.nb
        if nb % n:
            raise ValueError(f"nb={nb} not divisible by shard axis {n}")
        nb_l = nb // n
        right_to_left = [((i + 1) % n, i) for i in range(n)]
        left_to_right = [(i, (i + 1) % n) for i in range(n)]

        slab = self.layout == "slab"

        packed = self.packed
        hybrid = self.hybrid

        def local_fn(ub_l, x_l, sc_l):
            K_l, S, M_l = x_l.shape
            panel_row = (hb + 1) * B * ub_l.shape[-1] * ub_l.dtype.itemsize
            stream_row = S * B * (3 * x_l.dtype.itemsize + 4)
            G = self.rows_per_step or _pick_chunk_rows(nb_l, hb, panel_row,
                                                       stream_row)
            hbB = max(hb, 1) * B
            halo = jax.lax.ppermute(x_l[:, :, :hbB], SHARD_AXIS, right_to_left)
            pad = jnp.zeros((K_l, S, G * B - hbB), x_l.dtype)
            x_ext = jnp.concatenate([x_l, halo, pad], axis=2)
            if slab:
                y_l, spill = _sym_slab_matvec_streamed(
                    ub_l, x_ext, nb_l, interpret=interpret, rows_per_step=G,
                    spill=True)
            else:
                y_l, spill = _sym_band_matvec_streamed(
                    ub_l, x_ext, nb_l, interpret=interpret, rows_per_step=G,
                    spill=True, scales=sc_l, packed4=packed, hybrid=hybrid)
            incoming = jax.lax.ppermute(spill, SHARD_AXIS, left_to_right)
            return y_l.at[:, :, :hbB].add(incoming)

        ub_spec = (P(COHORT_AXIS, SHARD_AXIS, None, None)
                   if slab
                   else P(COHORT_AXIS, SHARD_AXIS, None, None, None))
        scales = self.scales
        if scales is None:
            scales = jnp.ones((self.K, nb, hb + 1), jnp.float32)
        sc_spec = (P(COHORT_AXIS, SHARD_AXIS, None, None)
                   if packed or hybrid
                   else P(COHORT_AXIS, SHARD_AXIS, None))
        return shard_map(
            local_fn, mesh=mesh,
            in_specs=(ub_spec, P(COHORT_AXIS, None, SHARD_AXIS), sc_spec),
            out_specs=P(COHORT_AXIS, None, SHARD_AXIS),
        )(self.upper, xs, scales)

    @staticmethod
    def from_band(band: "np.ndarray", block_size: int, K: int = 1,
                  s: float = 0.0, dtype=None,
                  layout: str = "diag") -> "SymBandedLD":
        """Pack symmetric band storage (M, 2*bw+1) into upper blocks.

        Same padding semantics as BandedLD.from_band (identity diagonal on
        padded markers, callers mask them).
        """
        band = np.asarray(band)
        quantize = dtype in ("int8", np.int8, jnp.int8)
        quantize4 = dtype == "int4"
        quantizeh = dtype == "hybrid"
        if (quantize or quantize4 or quantizeh) and layout == "slab":
            raise ValueError("quantization supports the diag layout only")
        M, nd_full = band.shape
        bw = (nd_full - 1) // 2
        B = block_size
        if (quantize or quantizeh) and band.dtype == np.float32:
            # native one-pass pack+quantize (bit-identical to the numpy
            # path below, parity-tested; the numpy version moves ~5 GB of
            # float temporaries - measured 16.8 s at M=512k vs ~1 s)
            from sgvamp_tpu import native as _native

            got = (_native.band_pack_i8(band, B) if quantize
                   else _native.band_pack_hybrid(band, B))
            if got is not None:
                upper, scales = got
                stacked = upper[None] if K == 1 else np.repeat(upper[None],
                                                               K, axis=0)
                sc_stacked = jnp.asarray(
                    scales[None] if K == 1
                    else np.repeat(scales[None], K, axis=0))
                return SymBandedLD(upper=jnp.asarray(stacked),
                                   scales=sc_stacked, s=s, layout=layout,
                                   packed=False, hybrid=quantizeh)
        pad = (-M) % B
        if pad:
            ext = np.zeros((pad, nd_full), dtype=band.dtype)
            ext[:, bw] = 1.0
            band = np.concatenate([band, ext], axis=0)
            M = M + pad
        nb = M // B
        hb = -(-bw // B)
        band_r = band.reshape(nb, B, nd_full)
        out_dtype = (np.float32 if quantize or quantize4 or quantizeh
                     else (dtype or band.dtype))
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
        # Invariant: blocks whose column index runs past the matrix are
        # exactly zero (band storage guarantees it for real data; enforce it
        # so window matmuls need no edge masking even on adversarial input).
        for d in range(1, hb + 1):
            upper[nb - d:, d] = 0.0
        scales = None
        if quantize:
            # symmetric per-block quantization: q = round(U/scale) with
            # scale = max|U|/127, so every block's worst-case error is
            # scale/2 (relative to its own magnitude). Zero blocks get
            # scale 0 -> stored zeros, dequantized exactly.
            amax = np.abs(upper).max(axis=(-2, -1))  # (nb, hb+1)
            sc = amax / 127.0
            safe = np.where(sc == 0.0, 1.0, sc)
            upper = np.clip(np.rint(upper / safe[..., None, None]),
                            -127, 127).astype(np.int8)
            scales = sc.astype(np.float32)
        elif quantize4:
            # int4: strip the unit diagonal of the d=0 block first (the
            # kernel adds x back), so the scale adapts to the off-diagonal
            # magnitude; quantize with PER-ROW scales (16 levels stretch a
            # lot further when rows with weak LD get their own range);
            # pack two values per byte along the column axis as contiguous
            # halves (low nibble = column j, high nibble = column j+B/2).
            if B % 2:
                raise ValueError("int4 packing needs an even block size")
            upper[:, 0] -= np.eye(B, dtype=upper.dtype)
            amax = np.abs(upper).max(axis=-1)  # (nb, hb+1, B) per row
            sc = amax / 7.0
            safe = np.where(sc == 0.0, 1.0, sc)
            q = np.clip(np.rint(upper / safe[..., None]), -7, 7).astype(np.int32)
            lo = (q[..., :B // 2] & 0xF).astype(np.uint8)
            hi = ((q[..., B // 2:] & 0xF) << 4).astype(np.uint8)
            upper = (lo | hi).view(np.int8)
            scales = sc.astype(np.float32)
        elif quantizeh:
            # hybrid: d=0 at full int8 precision (per-row scales, stripped
            # unit diagonal, stored as contiguous column halves in slots
            # 0,1), d>=1 packed int4 as above in slots d+1. Same
            # bytes-per-row as int4 on the far blocks; the diagonal block
            # costs one int8 slot-pair (= one int4 slot-pair of bytes).
            if B % 2:
                raise ValueError("hybrid packing needs an even block size")
            Bh2 = B // 2
            upper[:, 0] -= np.eye(B, dtype=upper.dtype)
            amax = np.abs(upper).max(axis=-1)  # (nb, hb+1, B) per row
            sc0 = amax[:, 0] / 127.0
            safe0 = np.where(sc0 == 0.0, 1.0, sc0)
            q0 = np.clip(np.rint(upper[:, 0] / safe0[..., None]),
                         -127, 127).astype(np.int8)
            scf = amax[:, 1:] / 7.0
            safef = np.where(scf == 0.0, 1.0, scf)
            qf = np.clip(np.rint(upper[:, 1:] / safef[..., None]),
                         -7, 7).astype(np.int32)
            lo = (qf[..., :Bh2] & 0xF).astype(np.uint8)
            hi = ((qf[..., Bh2:] & 0xF) << 4).astype(np.uint8)
            packedf = (lo | hi).view(np.int8)          # (nb, hb, B, B/2)
            upper = np.concatenate(
                [q0[:, None, :, :Bh2], q0[:, None, :, Bh2:], packedf],
                axis=1)                                 # (nb, hb+2, B, B/2)
            scales = np.concatenate(
                [sc0[:, None], sc0[:, None], scf], axis=1
            ).astype(np.float32)                        # (nb, hb+2, B)
        if layout == "slab":
            # T_i[d*B + q, p] = U[i, d][p, q]
            upper = upper.transpose(0, 1, 3, 2).reshape(nb, (hb + 1) * B, B)
        stacked = upper[None] if K == 1 else np.repeat(upper[None], K, axis=0)
        sc_stacked = None
        if scales is not None:
            sc_stacked = jnp.asarray(
                scales[None] if K == 1 else np.repeat(scales[None], K, axis=0))
        return SymBandedLD(upper=jnp.asarray(stacked), scales=sc_stacked,
                           s=s, layout=layout, packed=quantize4,
                           hybrid=quantizeh)

    def to_dense(self) -> Array:
        """Materialize (K, M, M) - tests only."""
        K, nb, hbp1, B = self.K, self.nb, self.hb + 1, self.B
        up = np.asarray(self.upper)
        if self.hybrid:
            sc = np.asarray(self.scales)
            d0 = np.concatenate([up[:, :, 0], up[:, :, 1]],
                                axis=-1).astype(np.float32)
            d0 = d0 * sc[:, :, 0, :, None]
            d0 += np.eye(B, dtype=d0.dtype)
            p32 = up[:, :, 2:].astype(np.int32)
            lo = (p32 << 28) >> 28
            hi = p32 >> 4
            far = np.concatenate([lo, hi], axis=-1).astype(np.float32)
            far = far * sc[:, :, 2:, :, None]
            up = np.concatenate([d0[:, :, None], far], axis=2)
        elif self.packed:
            p32 = up.astype(np.int32)
            lo = (p32 << 28) >> 28
            hi = p32 >> 4
            q = np.concatenate([lo, hi], axis=-1).astype(np.float32)
            up = q * np.asarray(self.scales)[..., :, None]  # per-row
            up[:, :, 0] += np.eye(B, dtype=up.dtype)  # stripped diagonal
        elif self.quantized:
            up = up.astype(np.float32) * np.asarray(self.scales)[..., None, None]
        if self.layout == "slab":
            up = up.reshape(K, nb, hbp1, B, B).transpose(0, 1, 2, 4, 3)
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
