"""DMA-bound HBM read-bandwidth probe (pallas).

The roofline denominator for a bandwidth-bound kernel must itself be a
bandwidth-bound measurement. Generic XLA reductions are NOT: a
`jnp.sum(jnp.abs(u + eps))` over bf16 upcasts every element to f32 on the
VPU and measures compute, not DMA (the round-2 bench's self-contradictory
"ceiling" - 275 GB/s "peak" under a 648 GB/s achieved rate - came from
exactly that).

This probe streams the array through VMEM in pipelined chunks and performs
the cheapest possible VPU op per tile - a running elementwise max over the
(8, 128)-shaped leading-axis view, one vector op per native tile, several
times faster than the HBM DMA can deliver tiles - so the pipeline is
DMA-bound by construction and the measured GB/s is the chip's actual
achievable HBM read rate for this array size, today, on this chip.

A data dependence on the previous pass's (8, 128) result chains repeated
passes inside one jit (no per-pass dispatch); timing N vs 2N passes and
differencing removes the remaining fixed costs (dispatch, the first
pipeline fill).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 8 * 128  # native (sublane, lane) tile of one vector register


def _read_kernel(ain_ref, u_ref, o_ref, acc_ref):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        acc_ref[...] = ain_ref[...]

    x = u_ref[...].reshape(-1, 8, 128)
    # leading-axis max: one VPU op per (8, 128) tile, no relayout
    acc_ref[...] = jnp.maximum(acc_ref[...], jnp.max(x, axis=0))

    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("chunk_elems", "interpret"))
def _read_once(u: Array, a: Array, chunk_elems: int,
               interpret: bool = False) -> Array:
    C = u.size // chunk_elems
    uv = u.reshape(C, chunk_elems // _LANES, 8, 128)
    return pl.pallas_call(
        _read_kernel,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk_elems // _LANES, 8, 128),
                         lambda c: (c, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), u.dtype),
        scratch_shapes=[pltpu.VMEM((8, 128), u.dtype)],
        interpret=interpret,
    )(a, uv)


@functools.partial(jax.jit, static_argnames=("n", "chunk_elems", "interpret"))
def _read_chain(u: Array, a0: Array, n: int, chunk_elems: int,
                interpret: bool = False) -> Array:
    # each pass depends on the previous pass's (8, 128) result, so XLA can
    # neither hoist nor CSE the reads
    return jax.lax.fori_loop(
        0, n, lambda i, a: _read_once(u, a, chunk_elems, interpret), a0)


def read_max(u: Array, interpret: bool = False) -> Array:
    """Elementwise-tile max of u (correctness hook for tests): the (8, 128)
    running max the probe computes, as one pass."""
    u, chunk = _prep(u)
    a0 = jnp.full((8, 128), -jnp.inf, u.dtype)
    return _read_once(u, a0, chunk, interpret)


def _prep(u: Array, chunk_bytes: int = 4 << 20, max_bytes: int = 1 << 30):
    """Flatten + truncate to a whole number of equal chunks that divide the
    array; returns (flat array, chunk_elems). Byte-sized dtypes (int8
    quantized LD blocks) are replaced by a bfloat16 array of the SAME byte
    count - mosaic has no int8 reductions, and a bitcast via reshape(-1, 2)
    puts the pair axis minormost, which TPU tiling pads 64x (measured:
    16 GB HLO temp for a 256 MB int8 array - instant OOM). A read-rate
    ceiling depends only on bytes streamed, not values.

    The probed stream is capped at max_bytes (1 GB): HBM read rate is
    flat well below that (the 268 MB M=512k array already sustains
    750+ GB/s), and an uncapped probe must co-reside with the operand it
    mirrors - at M=1M/K=8 the 4.3 GB int8 blocks plus a 4.3 GB probe
    copy plus the engine state exhausted the v5e's HBM."""
    flat = u.reshape(-1)
    if flat.dtype.itemsize == 1:
        half = min(flat.size // 2, max_bytes // 2)
        flat = (jax.lax.iota(jnp.int32, half) % 251).astype(jnp.bfloat16)
    elif flat.size * flat.dtype.itemsize > max_bytes:
        flat = flat[: max_bytes // flat.dtype.itemsize]
    itemsize = flat.dtype.itemsize
    chunk_elems = max(_LANES, (chunk_bytes // itemsize) // _LANES * _LANES)
    n_chunks = flat.size // chunk_elems
    if n_chunks == 0:
        chunk_elems = flat.size // _LANES * _LANES
        n_chunks = 1
    if chunk_elems == 0:
        raise ValueError(f"array too small to probe ({flat.size} elems)")
    return flat[: n_chunks * chunk_elems], chunk_elems


def measure_read_gbps(u: Array, n: int = 32, interpret: bool = False,
                      reps: int = 4):
    """Measured HBM read bandwidth over u's bytes.

    Times an n-pass and a 2n-pass chain inside single jits and differences
    them, removing dispatch and pipeline-fill fixed costs. Each chain is
    timed `reps` times and the MINIMUM taken first: the remote-tunnel
    dispatch has a ~27 ms fixed cost with occasional 100-400 ms spikes
    (measured), and a single spiked sample can make the raw difference
    negative. Returns (gbps, seconds_per_pass).
    """
    flat, chunk = _prep(u)
    nbytes = flat.size * flat.dtype.itemsize
    a0 = jnp.full((8, 128), -jnp.inf, flat.dtype)

    def timed(k):
        out = _read_chain(flat, a0, k, chunk, interpret)
        _ = np.asarray(out)  # concrete fetch: the only reliable barrier here
        best = float("inf")
        for i in range(reps):
            t0 = time.time()
            out = _read_chain(flat, a0 * (1 - 1e-6 * (i + 1)), k, chunk,
                              interpret)
            _ = np.asarray(out)
            best = min(best, time.time() - t0)
        return best

    t_n, t_2n = timed(n), timed(2 * n)
    per_pass = max((t_2n - t_n) / n, 1e-12)
    return nbytes / per_pass / 1e9, per_pass
