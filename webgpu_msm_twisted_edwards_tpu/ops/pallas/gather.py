"""DMA-engine row gather: the production table-row permutation.

The bucket pipeline's single largest cost is gathering table rows into
sorted order (~170 ms of the 467 ms 2^20 budget, docs/DESIGN.md §5).  XLA's
gather issues through the vector load path at a measured 73–98 M rows/s on
one v5e core; this kernel instead drives the async DMA engines — the scalar
core issues one 512 B row-copy descriptor per entry (hand-unrolled 16-wide,
~9 ns/descriptor sustained) and the copies themselves ride the DMA engines
at full HBM bandwidth behind the issue stream.  Measured on v5e at
production scale (2^23 rows x 512 B, experiments/dma_gather_probe.py):

    XLA gather            109.6 ms   77 M rows/s
    DMA gather, unroll=8   84.2 ms  100 M rows/s
    DMA gather, unroll=16  79.0 ms  106 M rows/s
    DMA gather, unroll=32  77.5 ms  108 M rows/s

FUSING the gather into the scan kernel was measured and REJECTED twice:
synchronous in-kernel copies share the VPU port (round 2, ops/pallas/
scan.py::msm_scan_fused), and the async-DMA fusion (28.4 ns/entry vs
9.8 + 13.9 separate) loses because descriptor issue and VPU instruction
issue contend for the single scalar core — overlap is structurally
impossible on this hardware, so the best schedule is two back-to-back
passes, each at its own floor.

Reference analogue: the SMVP shader's per-bucket point gather
(reference: src/submission/implementation/wgsl/cuzk/smvp.template.wgsl:
97-112) — there the gather is fused into compute because a GPU has
thousands of independent scalar lanes; on TPU the DMA engines are the
parallel-gather resource.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import interpret_default
from .scan import K, LBLK, TWR

#: Descriptor-issue unroll (Mosaic fori_loop supports only unroll=1/full, so
#: the issue loop is hand-unrolled).  Measured knee at 16 (see module
#: docstring); 32 gains 2% more at double the code size.
UNROLL = 16


def _dma_gather_kernel(lblk, unroll, pidx_ref, table_ref, out_ref, sem):
    i = pl.program_id(0)
    base = i * lblk * K

    def one_j(j, _):
        def one_f(fu, _):
            for u in range(unroll):
                f = fu * unroll + u
                idx = pidx_ref[j, f]
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(idx, 1), :],
                    out_ref.at[pl.ds(base + f * K + j, 1), :],
                    sem,
                ).start()
            return 0

        jax.lax.fori_loop(0, lblk // unroll, one_f, 0)
        return 0

    jax.lax.fori_loop(0, K, one_j, 0)
    # One wait retires the whole block: the DMA semaphore counts bytes, and
    # this descriptor's destination covers exactly the block's bytes.
    pltpu.make_async_copy(
        table_ref.at[pl.ds(0, lblk * K), :],
        out_ref.at[pl.ds(base, lblk * K), :],
        sem,
    ).wait()


def dma_row_gather(
    table: jnp.ndarray,
    pidx_t: jnp.ndarray,
    unroll: int = UNROLL,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """table: [nt, w] u32 rows (w = TWR for the scan-input gather; any row
    width works — the descriptors copy whole rows); pidx_t: [K, NF] int32
    with the row index for entry f*K + j at [j, f].  Returns [NF*K, w] —
    bit-identical to ``table[pidx]`` for the flat entry-major pidx.

    Interpret mode falls back to the XLA gather (Pallas interpret does not
    model the DMA semaphore byte counting this kernel relies on)."""
    nf = pidx_t.shape[1]
    assert pidx_t.shape[0] == K, (pidx_t.shape, table.shape)
    if interpret_default(interpret):
        flat = jnp.transpose(pidx_t).reshape(-1)
        return table[flat]
    lblk = LBLK
    while nf % lblk != 0:
        lblk //= 2
    while lblk % unroll != 0:
        unroll //= 2
    return pl.pallas_call(
        lambda *a: _dma_gather_kernel(lblk, unroll, *a),
        grid=(nf // lblk,),
        in_specs=[
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nf * K, table.shape[1]), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(pidx_t, table)


def dma_gather_flat(
    table: jnp.ndarray,
    flat_idx: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``table[flat_idx]`` on the DMA engines for a flat [N] index vector
    (N must be a multiple of K=64 — true of every extraction gather: the end
    count per group is wg * 2^(c-1) with c >= 8).  Used by the extraction
    path's row gathers (pair rows, carries) when MSM_DMA_EXTRACT=1."""
    n = flat_idx.shape[0]
    assert n % K == 0, n
    if interpret_default(interpret):
        return table[flat_idx]
    w = table.shape[1]
    if w % 128 != 0:
        # Mosaic tiles u32 rows (1, 128): a row-copy descriptor over a
        # narrower row slices mid-tile and fails to compile ("slice shape
        # along dimension 1 must be aligned to tiling (128)").  Pad the
        # table once — e.g. the 64-wide carries table — and slice back.
        wp = -(-w // 128) * 128
        table = jnp.pad(table, ((0, 0), (0, wp - w)))
        return dma_row_gather(table, flat_idx.reshape(n // K, K).T,
                              interpret=interpret)[:, :w]
    return dma_row_gather(table, flat_idx.reshape(n // K, K).T,
                          interpret=interpret)
