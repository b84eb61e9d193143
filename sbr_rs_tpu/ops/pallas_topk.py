"""Fused catalog-scoring kernels for the streamed serving/eval paths.

The streamed top-k (``models/base.py:_build_topk_fn``) and the streamed MRR
counter (``evaluation.py``) both score catalog chunks against a batch of
user representations (the TPU-native replacement for the reference's
per-item ``simd_dot`` serving loop, ``src/models/sequence_model.rs:213-232``
and ``src/evaluation.rs:12-48``). In pure XLA each chunk materializes a
``[C, U]`` (or ``[U, C]``) score matrix in HBM only to immediately reduce
it — at the serving bench shape (10M items, U=4096, chunk=128Ki) that is
~2 GB written + re-read per chunk, ~330 GB per batch, several times the
rest of the program's traffic combined.

These kernels fuse the score matmul with its reduction so score tiles live
and die in VMEM (the flash-attention structure, applied to retrieval):

* :func:`score_groupmax` — scores a chunk and emits per-128-row GROUP
  maxima ``[G, U]`` for the exact two-phase top-k's phase 1. Output is
  ``C/128 * U`` floats instead of ``C * U``: 128x less HBM traffic.
* :func:`score_count_ge` — scores a chunk and emits per-user counts of
  items with ``score >= target`` for the streamed MRR rank counter, plus
  the scores of each user's (clamped) probe item so the caller keeps the
  reference's chunk-local self-tie semantics. Output is ``O(U)``.

Both kernels compute scores as one f32 MXU contraction of bias-augmented
representations against whole fused ``[*, D+1]`` table rows — the same
formulation as the XLA paths they replace (no embedding/bias column split,
which would force a relayout copy of every row). Storage-dtype (bf16)
tables are upcast to f32 inside VMEM, so the HBM-side convert copy of each
chunk disappears too.

Each entry point has an XLA fallback (`*_xla`) used on non-TPU backends
and for shapes that don't satisfy the tile constraints; equivalence is
pinned in ``tests/test_pallas_topk.py`` (interpret mode) and the whole
serving path in ``tests/test_models.py``. Row-SHARDED tables compose the
kernels with the mesh via ``jax.shard_map`` — each shard streams its own
contiguous slab (mid-catalog ragged slabs are safe: the kernels mask
Pallas pad rows by local index) — see ``models/base.py
topk_streamed_sharded`` and ``evaluation.py
_make_catalog_counter_pallas``; sharded==unsharded parity is pinned in
``tests/test_sharding.py`` and was executed on hardware via a (1,1) mesh
(``scripts/sharded_serving_kernel_check.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret_default() -> bool:
    """CPU-test escape hatch: ``SBR_PALLAS_INTERPRET=1`` makes every
    kernel wrapper run in Pallas interpret mode. Needed for the
    shard_map-composed paths — ``pltpu.force_tpu_interpret_mode()``
    (which the unsharded tests use) deadlocks when these kernels run
    inside ``jax.shard_map`` on the multi-device CPU backend, while the
    plain ``interpret=True`` interpreter composes fine."""
    import os

    return os.environ.get("SBR_PALLAS_INTERPRET", "0") not in (
        "0", "false", "off"
    )


# --------------------------------------------------------------------------
# score + group-max (serving top-k phase 1)
# --------------------------------------------------------------------------


def score_groupmax_xla(
    chunk_rows: jnp.ndarray,
    reps_aug: jnp.ndarray,
    lo,
    n: int,
    group: int,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Reference formulation: ``[G, U]`` group maxima of chunk scores.

    ``chunk_rows`` is a ``[C, Cc]`` slab of the fused table (rows past the
    catalog end are clip-duplicates — masked here by global id), ``reps_aug``
    is ``[U, Cc]`` bias-augmented f32 representations, ``lo`` the chunk's
    first global row id (traced ok), ``n`` the catalog size.
    ``compute_dtype=bfloat16`` rounds BOTH dot operands to bf16 (f32
    accumulation) — the opt-in fast phase-1 scoring mode; see
    ``models/base.py recommend_batch(phase1_precision=...)``.
    """
    c = chunk_rows.shape[0]
    u = reps_aug.shape[0]
    st = jax.lax.dot_general(
        chunk_rows.astype(compute_dtype),
        reps_aug.astype(compute_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C, U]
    ids = lo + jnp.arange(c)
    st = jnp.where((ids < n)[:, None], st, -jnp.inf)
    return jnp.max(st.reshape(c // group, group, u), axis=1)  # [G, U]


def _groupmax_kernel(
    lo_ref, rows_ref, reps_ref, out_ref, *, group, n, r_blk, c_total,
    compute_dtype,
):
    i = pl.program_id(0)
    rows = rows_ref[:].astype(compute_dtype)
    scores = jax.lax.dot_general(
        rows,
        reps_ref[:].astype(compute_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, UT]
    local = i * r_blk + jax.lax.broadcasted_iota(jnp.int32, (r_blk, 1), 0)
    gid = lo_ref[0] + local
    # Validity needs BOTH bounds: `local < c_total` kills the UNDEFINED
    # Pallas pad rows of a ragged final block even when the call is
    # mid-catalog (sharded slabs: lo + c < n), `gid < n` kills real rows
    # past the catalog end (clip-duplicated chunk tails).
    scores = jnp.where((gid < n) & (local < c_total), scores, -jnp.inf)
    out_ref[:] = jnp.max(scores.reshape(r_blk // group, group, -1), axis=1)


def _submax_groupmax_kernel(
    lo_ref, rows_ref, reps_ref, sub_ref, grp_ref, *, sub, group, n, r_blk,
    c_total, compute_dtype,
):
    # Two-level variant: emit SUBGROUP maxima (for the serving path's
    # phase-2 refinement) AND GROUP maxima (for the wide phase-1 merge)
    # from the same in-register score tile. Deriving group maxima from
    # the stored submax stack outside the kernel costs a full re-read —
    # and, depending on the layout XLA picks for the reshape, a
    # stack-sized relayout copy that OOMed the 20M-item catalog.
    i = pl.program_id(0)
    rows = rows_ref[:].astype(compute_dtype)
    scores = jax.lax.dot_general(
        rows,
        reps_ref[:].astype(compute_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, UT]
    local = i * r_blk + jax.lax.broadcasted_iota(jnp.int32, (r_blk, 1), 0)
    gid = lo_ref[0] + local
    # Both validity bounds — see _groupmax_kernel.
    scores = jnp.where((gid < n) & (local < c_total), scores, -jnp.inf)
    smax = jnp.max(scores.reshape(r_blk // sub, sub, -1), axis=1)
    sub_ref[:] = smax
    grp_ref[:] = jnp.max(
        smax.reshape(r_blk // group, group // sub, -1), axis=1
    )


# Row-block height: 16 groups of 128 rows = 2048. With UT=512 the VMEM
# working set is rows 1 MB (f32 Cc=128) + reps 0.25 MB + scores 4 MB +
# pipelining headroom — comfortably under the ~16 MB budget up to Cc=512.
_R_BLK = 2048
_U_TILE = 512


def groupmax_supported(c: int, cc: int, u: int, group: int) -> bool:
    """Static shape gate for the Pallas path. Group widths below 128 feed
    the serving path's subgroup refinement (``models/base.py``): the tile
    reshape-reduce runs over sublanes, so any multiple of the 8-row
    sublane that divides the row block lowers.

    Ragged ``c`` (not a multiple of ``_R_BLK``) is safe ANYWHERE in the
    catalog: the grid rounds up, Pallas pads the final row block with
    UNDEFINED rows, and the kernel masks them by LOCAL row index
    (``local < c``) in addition to the global ``gid < n`` bound — so
    mid-catalog calls (chunked streams, shard_map slabs with ``lo + c <
    n``) cannot leak garbage pad scores (advisor r4). Ragged output
    carries ``ceil(c / _R_BLK) * _R_BLK // group`` rows, the trailing pad
    rows all ``-inf`` — use :func:`groupmax_rows` for the caller-side row
    count and slice or mask accordingly."""
    return group in (8, 16, 32, 64, 128) and cc <= 512 and u >= 1


def groupmax_rows(c: int, group: int) -> int:
    """Number of group rows :func:`score_groupmax` emits for ``c`` input
    rows (the ragged final row block pads up to ``_R_BLK``; trailing
    all-past-``n`` groups come back as ``-inf``)."""
    return _round_up(c, _R_BLK) // group


def score_groupmax(
    chunk_rows: jnp.ndarray,
    reps_aug: jnp.ndarray,
    lo,
    n: int,
    group: int,
    *,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused-kernel ``[G, U]`` group maxima (see module docstring).

    Call :func:`groupmax_supported` first; unsupported shapes must use
    :func:`score_groupmax_xla`. ``chunk_rows`` may be the WHOLE catalog
    (``lo=0``), a mid-catalog chunk, or a shard_map slab: a ragged final
    row block is padded by the pipeline and masked to ``-inf`` inside the
    kernel (both ``gid < n`` and ``local < c`` bounds), and the output
    carries :func:`groupmax_rows`\\ ``(c, group)`` rows.
    """
    c, cc = chunk_rows.shape
    u = reps_aug.shape[0]
    assert groupmax_supported(c, cc, u, group)
    interpret = interpret or _interpret_default()
    # User tile: full batch when small, 512-wide tiles when large. Padding
    # users with zero reps is harmless — their outputs are sliced away.
    if u >= _U_TILE:
        ut = _U_TILE
        u_pad = _round_up(u, ut)
    else:
        u_pad = _round_up(u, 8)
        ut = u_pad
    if u_pad != u:
        reps_aug = jnp.pad(reps_aug, ((0, u_pad - u), (0, 0)))

    g_blk = _R_BLK // group
    nb = _round_up(c, _R_BLK) // _R_BLK
    grid = (nb, u_pad // ut)
    lo_arr = jnp.reshape(jnp.asarray(lo, jnp.int32), (1,))

    out = pl.pallas_call(
        functools.partial(
            _groupmax_kernel, group=group, n=n, r_blk=_R_BLK, c_total=c,
            compute_dtype=compute_dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_R_BLK, cc), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ut, cc), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g_blk, ut), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb * g_blk, u_pad), jnp.float32),
        interpret=interpret,
    )(lo_arr, chunk_rows, reps_aug)
    return out[:, :u]


def score_submax_groupmax_xla(
    chunk_rows: jnp.ndarray,
    reps_aug: jnp.ndarray,
    lo,
    n: int,
    sub: int,
    group: int,
    compute_dtype=jnp.float32,
):
    """Reference formulation of :func:`score_submax_groupmax`."""
    smax = score_groupmax_xla(
        chunk_rows, reps_aug, lo, n, sub, compute_dtype=compute_dtype
    )
    s, u = smax.shape
    gmax = jnp.max(smax.reshape(s // (group // sub), group // sub, u), axis=1)
    return smax, gmax


def score_submax_groupmax(
    chunk_rows: jnp.ndarray,
    reps_aug: jnp.ndarray,
    lo,
    n: int,
    sub: int,
    group: int,
    *,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """Fused ``([S, U] subgroup maxima, [G, U] group maxima)`` in one pass
    (see :func:`_submax_groupmax_kernel`). Requires ``sub`` dividing
    ``group``, both supported widths (:func:`groupmax_supported`); ragged
    ``c`` follows the rules of :func:`score_groupmax`.
    """
    c, cc = chunk_rows.shape
    u = reps_aug.shape[0]
    assert group % sub == 0 and sub < group
    assert groupmax_supported(c, cc, u, sub)
    assert groupmax_supported(c, cc, u, group)
    interpret = interpret or _interpret_default()
    if u >= _U_TILE:
        ut = _U_TILE
        u_pad = _round_up(u, ut)
    else:
        u_pad = _round_up(u, 8)
        ut = u_pad
    if u_pad != u:
        reps_aug = jnp.pad(reps_aug, ((0, u_pad - u), (0, 0)))

    s_blk = _R_BLK // sub
    g_blk = _R_BLK // group
    nb = _round_up(c, _R_BLK) // _R_BLK
    grid = (nb, u_pad // ut)
    lo_arr = jnp.reshape(jnp.asarray(lo, jnp.int32), (1,))

    smax, gmax = pl.pallas_call(
        functools.partial(
            _submax_groupmax_kernel, sub=sub, group=group, n=n, r_blk=_R_BLK,
            c_total=c, compute_dtype=compute_dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_R_BLK, cc), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ut, cc), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((s_blk, ut), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_blk, ut), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb * s_blk, u_pad), jnp.float32),
            jax.ShapeDtypeStruct((nb * g_blk, u_pad), jnp.float32),
        ),
        interpret=interpret,
    )(lo_arr, chunk_rows, reps_aug)
    return smax[:, :u], gmax[:, :u]


# --------------------------------------------------------------------------
# score + rank count (streamed MRR evaluation)
# --------------------------------------------------------------------------


def score_count_ge_xla(
    chunk_rows: jnp.ndarray,
    reps_aug: jnp.ndarray,
    targets: jnp.ndarray,
    probe_local: jnp.ndarray,
    lo,
    col_lo,
    n: int,
):
    """Reference formulation for the fused eval chunk reduction.

    Returns ``(counts [U] int32, probe_scores [U] f32)`` where ``counts``
    is the number of VALID chunk columns (global id < ``n``, local column
    >= ``col_lo`` — the clamped-final-chunk overlap exclusion) whose score
    is ``>= targets[u]``, and ``probe_scores[u]`` is the chunk's own score
    of local column ``probe_local[u]`` (clamped into range; the caller
    decides whether the probe was actually in-window).
    """
    c = chunk_rows.shape[0]
    st = chunk_rows.astype(jnp.float32) @ reps_aug.T  # [C, U]
    ids = lo + jnp.arange(c)
    valid = (ids < n) & (jnp.arange(c) >= col_lo)
    counts = jnp.sum(
        ((st >= targets[None, :]) & valid[:, None]).astype(jnp.int32), axis=0
    )
    u = reps_aug.shape[0]
    probe = jnp.clip(probe_local, 0, c - 1)
    probe_scores = st[probe, jnp.arange(u)]
    return counts, probe_scores


def _count_kernel(
    lo_ref, col_lo_ref, rows_ref, reps_ref, targets_ref, probe_ref,
    counts_ref, probe_ref_out, *, n, r_blk, c_total,
):
    # Grid is (user tiles, row blocks) with row blocks INNERMOST so the
    # [1, UT] accumulators stay VMEM-resident across one user tile's whole
    # stream of row blocks.
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        probe_ref_out[:] = jnp.zeros_like(probe_ref_out)

    rows = rows_ref[:].astype(jnp.float32)
    scores = jax.lax.dot_general(
        rows,
        reps_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, UT]
    local = i * r_blk + jax.lax.broadcasted_iota(jnp.int32, (r_blk, 1), 0)
    # Three validity bounds: global id inside the catalog, local column
    # past the clamped-chunk overlap, AND local column inside the actual
    # input rows — the last one kills the UNDEFINED Pallas pad rows of a
    # ragged final block even mid-catalog (sharded slabs, advisor r4).
    valid = (
        ((lo_ref[0] + local) < n)
        & (local >= col_lo_ref[0])
        & (local < c_total)
    )
    ge = (scores >= targets_ref[0:1, :]) & valid
    counts_ref[0:1, :] += jnp.sum(ge.astype(jnp.int32), axis=0, keepdims=True)

    # Probe score: each user's (clamped) probe column contributes from
    # exactly one row block; select it arithmetically (a [R, UT] one-hot
    # multiply-sum — dynamic per-user row reads are the measured-killed
    # pattern, see scripts/cand_gather_probe.py).
    probe = jnp.clip(probe_ref[0:1, :], 0, c_total - 1)  # [1, UT]
    hit = local == probe  # [R, UT] broadcast
    probe_ref_out[0:1, :] += jnp.sum(
        jnp.where(hit, scores, 0.0), axis=0, keepdims=True
    )


def count_supported(c: int, cc: int, u: int) -> bool:
    """Static shape gate for :func:`score_count_ge`. Ragged ``c`` (not a
    multiple of ``_R_BLK``) is safe anywhere in the catalog: undefined
    Pallas pad rows past the ragged edge are excluded by the in-kernel
    ``local < c`` bound (in addition to ``gid < n``), so mid-catalog
    calls — shard_map slabs with ``lo + c < n`` — cannot count garbage
    rows (advisor r4)."""
    return cc <= 512 and u >= 1


def score_count_ge(
    chunk_rows: jnp.ndarray,
    reps_aug: jnp.ndarray,
    targets: jnp.ndarray,
    probe_local: jnp.ndarray,
    lo,
    col_lo,
    n: int,
    *,
    interpret: bool = False,
):
    """Fused-kernel streamed rank count (see :func:`score_count_ge_xla`).

    ``chunk_rows`` may be the WHOLE catalog (``lo=0``, ``col_lo=0``), a
    mid-catalog chunk, or a shard_map slab: a ragged final row block is
    excluded inside the kernel (``gid < n`` and ``local < c`` bounds).
    """
    c, cc = chunk_rows.shape
    u = reps_aug.shape[0]
    assert count_supported(c, cc, u)
    interpret = interpret or _interpret_default()
    if u >= _U_TILE:
        ut = _U_TILE
        u_pad = _round_up(u, ut)
    else:
        u_pad = _round_up(u, 8)
        ut = u_pad
    if u_pad != u:
        reps_aug = jnp.pad(reps_aug, ((0, u_pad - u), (0, 0)))
        # Padding users: +inf target -> zero counts; probe 0 is in range.
        targets = jnp.pad(targets, (0, u_pad - u), constant_values=jnp.inf)
        probe_local = jnp.pad(probe_local, (0, u_pad - u))

    grid = (_round_up(c, _R_BLK) // _R_BLK, u_pad // ut)
    lo_arr = jnp.reshape(jnp.asarray(lo, jnp.int32), (1,))
    col_lo_arr = jnp.reshape(jnp.asarray(col_lo, jnp.int32), (1,))

    counts, probe_scores = pl.pallas_call(
        functools.partial(_count_kernel, n=n, r_blk=_R_BLK, c_total=c),
        grid=(grid[1], grid[0]),  # users outer, row blocks inner: the
        # [1, UT] accumulators stay VMEM-resident across the whole stream
        # of row blocks for one user tile.
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_R_BLK, cc), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ut, cc), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ut), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ut), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, ut), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ut), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, u_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, u_pad), jnp.float32),
        ),
        interpret=interpret,
    )(
        lo_arr,
        col_lo_arr,
        chunk_rows,
        reps_aug,
        targets[None, :],
        probe_local[None, :].astype(jnp.int32),
    )
    return counts[0, :u], probe_scores[0, :u]
