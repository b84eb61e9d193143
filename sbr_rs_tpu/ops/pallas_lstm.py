"""Fused Pallas LSTM tower for TPU.

The training hot loop is the LSTM recurrence (reference: wyrm's unrolled
cell chain, ``src/models/lstm.rs:293-298``; here ``lax.scan`` in
:mod:`sbr_rs_tpu.models.towers`). XLA compiles the scan into a device loop,
but every step re-reads/re-writes the carries and gate tensors through HBM.
These kernels fuse the whole recurrence, forward and backward:

* the input projection ``x @ w_x + b`` (and its gradients) stay OUTSIDE —
  single large MXU matmuls over all timesteps, XLA's sweet spot;
* kernels walk the time axis on a ``(batch_tiles, T)`` grid — the TPU grid
  executes sequentially with the last dimension innermost, so the
  ``[Bt, D]`` hidden/cell (forward) and adjoint (backward) carries live in
  VMEM scratch across the whole sequence while ``xz[t]`` / ``hidden[t]``
  tiles stream through the pipelined block machinery;
* arrays are laid out time-major ``[T, B, ...]`` so each per-timestep block
  is a well-tiled ``[Bt, lanes]`` slab (TPU block rules: the last two block
  dims must be multiples of (8, 128) or span the array);
* the per-step recurrence matmuls run on the MXU with weights resident in
  VMEM; the backward recomputes gate pre-activations from ``(xz[t],
  h[t-1])`` instead of storing ``[B, T, G*D]`` residuals;
* packed batches (:func:`sbr_rs_tpu.data.pack_windows`) are supported via a
  ``keep = 1 - starts`` stream that zeroes the carries (forward) and the
  adjoint carries (backward) across window boundaries.

Both LSTM variants are supported (Normal [i,f,g,o] and Coupled [i,g,o] with
forget = 1 - input, reference ``src/models/lstm.rs:28-35``). The public
entry point is differentiable via ``jax.custom_vjp`` with the backward as a
second Pallas kernel; the ``lax.scan`` tower remains the XLA fallback for
CPU and sharded-mesh execution, with equivalence pinned in
``tests/test_pallas.py``.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fwd_kernel(xz_ref, wh_ref, keep_ref, hidden_ref, cell_ref, h_scr, c_scr, *, coupled):
    t = pl.program_id(1)
    d = h_scr.shape[-1]

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    keep = keep_ref[0]  # [Bt, 1]; 0 where a new window begins
    h = h_scr[:] * keep
    c = c_scr[:] * keep
    z = xz_ref[0] + jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32)

    if coupled:
        i = jax.nn.sigmoid(z[:, 0 * d : 1 * d])
        g = jnp.tanh(z[:, 1 * d : 2 * d])
        o = jax.nn.sigmoid(z[:, 2 * d : 3 * d])
        c_new = (1.0 - i) * c + i * g
    else:
        i = jax.nn.sigmoid(z[:, 0 * d : 1 * d])
        f = jax.nn.sigmoid(z[:, 1 * d : 2 * d])
        g = jnp.tanh(z[:, 2 * d : 3 * d])
        o = jax.nn.sigmoid(z[:, 3 * d : 4 * d])
        c_new = f * c + i * g

    h_new = o * jnp.tanh(c_new)
    h_scr[:] = h_new
    c_scr[:] = c_new
    hidden_ref[0] = h_new
    cell_ref[0] = c_new


def _bwd_kernel(
    xz_ref, wh_ref, cell_ref, hprev_ref, cprev_ref, g_ref, keep_ref,
    dxz_ref, dwh_ref, dh_scr, dc_scr, dwh_scr, *, coupled, seq_len,
):
    """Reverse-time adjoint. Grid (batch_tiles, T) visits t = T-1 .. 0."""
    tt = pl.program_id(1)
    t = seq_len - 1 - tt
    d = dh_scr.shape[-1]

    @pl.when(tt == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)

    # Carry survives into step t only when t > 0 AND no window starts at t.
    factor = keep_ref[0] * (1.0 - (t == 0).astype(jnp.float32))  # [Bt, 1]
    h_prev = hprev_ref[0] * factor
    c_prev = cprev_ref[0] * factor

    z = xz_ref[0] + jnp.dot(h_prev, wh_ref[:], preferred_element_type=jnp.float32)
    tc = jnp.tanh(cell_ref[0])
    dh_total = g_ref[0] + dh_scr[:]

    if coupled:
        i = jax.nn.sigmoid(z[:, 0 * d : 1 * d])
        g = jnp.tanh(z[:, 1 * d : 2 * d])
        o = jax.nn.sigmoid(z[:, 2 * d : 3 * d])
        dz_o = dh_total * tc * o * (1.0 - o)
        dc_total = dc_scr[:] + dh_total * o * (1.0 - tc * tc)
        dz_i = dc_total * (g - c_prev) * i * (1.0 - i)
        dz_g = dc_total * i * (1.0 - g * g)
        dz = jnp.concatenate([dz_i, dz_g, dz_o], axis=-1)
        dc_prev = dc_total * (1.0 - i)
    else:
        i = jax.nn.sigmoid(z[:, 0 * d : 1 * d])
        f = jax.nn.sigmoid(z[:, 1 * d : 2 * d])
        g = jnp.tanh(z[:, 2 * d : 3 * d])
        o = jax.nn.sigmoid(z[:, 3 * d : 4 * d])
        dz_o = dh_total * tc * o * (1.0 - o)
        dc_total = dc_scr[:] + dh_total * o * (1.0 - tc * tc)
        dz_i = dc_total * g * i * (1.0 - i)
        dz_f = dc_total * c_prev * f * (1.0 - f)
        dz_g = dc_total * i * (1.0 - g * g)
        dz = jnp.concatenate([dz_i, dz_f, dz_g, dz_o], axis=-1)
        dc_prev = dc_total * f

    dxz_ref[0] = dz
    dh_scr[:] = jnp.dot(dz, wh_ref[:].T, preferred_element_type=jnp.float32) * factor
    dc_scr[:] = dc_prev * factor
    dwh_scr[:] += jnp.dot(h_prev.T, dz, preferred_element_type=jnp.float32)

    @pl.when(tt == seq_len - 1)
    def _():
        dwh_ref[0] = dwh_scr[:]


def _tile(b: int) -> int:
    return min(_round_up(b, 8), 512)


def _pad_batch(arrs, b_pad, b):
    if b_pad == b:
        return arrs
    return [jnp.pad(a, ((0, 0), (0, b_pad - b), (0, 0))) for a in arrs]


@functools.partial(jax.jit, static_argnames=("coupled",))
def _fwd_pallas(xz, w_h, keep, *, coupled: bool):
    """xz: [T, B, G*D] time-major pre-projected inputs; keep: [T, B, 1].
    Returns (hidden, cell), both [T, B, D]."""
    t, b, gd = xz.shape
    d = w_h.shape[0]
    bt = _tile(b)
    b_pad = _round_up(b, bt)
    xz, keep = _pad_batch([xz, keep], b_pad, b)
    grid = (b_pad // bt, t)
    blk = lambda i, tt: (tt, i, 0)
    hidden, cell = pl.pallas_call(
        functools.partial(_fwd_kernel, coupled=coupled),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, gd), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, gd), lambda i, tt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, 1), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, d), blk, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b_pad, d), xz.dtype),
            jax.ShapeDtypeStruct((t, b_pad, d), xz.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, d), jnp.float32),
            pltpu.VMEM((bt, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(xz, w_h, keep)
    return hidden[:, :b], cell[:, :b]


@functools.partial(jax.jit, static_argnames=("coupled",))
def _bwd_pallas(xz, w_h, hidden, cell, g, keep, *, coupled: bool):
    """All sequence args [T, B, ...] time-major. Returns (dxz, dw_h)."""
    t, b, gd = xz.shape
    d = w_h.shape[0]
    bt = _tile(b)
    b_pad = _round_up(b, bt)
    xz, hidden, cell, g, keep = _pad_batch([xz, hidden, cell, g, keep], b_pad, b)
    nb = b_pad // bt
    grid = (nb, t)
    rev = lambda i, tt: (t - 1 - tt, i, 0)
    rev_prev = lambda i, tt: (jnp.maximum(t - 2 - tt, 0), i, 0)
    dxz, dwh_partials = pl.pallas_call(
        functools.partial(_bwd_kernel, coupled=coupled, seq_len=t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, gd), rev, memory_space=pltpu.VMEM),      # xz[t]
            pl.BlockSpec((d, gd), lambda i, tt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, d), rev, memory_space=pltpu.VMEM),       # cell[t]
            pl.BlockSpec((1, bt, d), rev_prev, memory_space=pltpu.VMEM),  # hidden[t-1]
            pl.BlockSpec((1, bt, d), rev_prev, memory_space=pltpu.VMEM),  # cell[t-1]
            pl.BlockSpec((1, bt, d), rev, memory_space=pltpu.VMEM),       # g[t]
            pl.BlockSpec((1, bt, 1), rev, memory_space=pltpu.VMEM),       # keep[t]
        ],
        out_specs=[
            pl.BlockSpec((1, bt, gd), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, gd), lambda i, tt: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b_pad, gd), xz.dtype),
            jax.ShapeDtypeStruct((nb, d, gd), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, d), jnp.float32),
            pltpu.VMEM((bt, d), jnp.float32),
            pltpu.VMEM((d, gd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(xz, w_h, cell, hidden, cell, g, keep)
    return dxz[:, :b], dwh_partials.sum(axis=0)


def lstm_apply_pallas(
    params: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    *,
    coupled: bool,
    starts: "jnp.ndarray | None" = None,
) -> jnp.ndarray:
    """Drop-in replacement for :func:`sbr_rs_tpu.models.towers.lstm_apply`
    (same ``[B, T, D] -> [B, T, D]`` contract, including packed-batch
    ``starts``) with the recurrence — forward and VJP — as fused Pallas
    kernels."""

    b0, t0, _ = x.shape
    if starts is None:
        keep = jnp.ones((t0, b0, 1), x.dtype)
    else:
        keep = (1.0 - starts).swapaxes(0, 1)[..., None].astype(x.dtype)

    # `keep` is an EXPLICIT primal of the custom_vjp (zero cotangent), never
    # a closure: a closed-over traced value would be captured by the
    # backward's closure and leak into the transpose trace — shard_map
    # traces the backward separately and rejects it (UnexpectedTracerError).
    @jax.custom_vjp
    def _apply(params, x, keep):
        hidden, _ = _run_fwd(params, x, keep)
        return hidden

    def _run_fwd(params, x, keep):
        b_, t_, d = x.shape
        # Time-major projection: [T, B, G*D].
        xz = (
            (x.reshape(b_ * t_, d) @ params["w_x"]).reshape(b_, t_, -1) + params["b"]
        ).swapaxes(0, 1)
        hidden_tm, cell_tm = _fwd_pallas(xz, params["w_h"], keep, coupled=coupled)
        return hidden_tm.swapaxes(0, 1), (xz, hidden_tm, cell_tm)

    def _fwd(params, x, keep):
        hidden, res = _run_fwd(params, x, keep)
        return hidden, (params, x, keep, *res)

    def _bwd(res, g):
        params, x, keep, xz, hidden_tm, cell_tm = res
        b_, t_, d = x.shape
        dxz_tm, dw_h = _bwd_pallas(
            xz, params["w_h"], hidden_tm, cell_tm, g.swapaxes(0, 1), keep,
            coupled=coupled,
        )
        dxz2 = dxz_tm.swapaxes(0, 1).reshape(b_ * t_, -1)
        dparams = {
            "w_x": x.reshape(b_ * t_, d).T @ dxz2,
            "w_h": dw_h,
            "b": dxz2.sum(axis=0),
        }
        dx = (dxz2 @ params["w_x"].T).reshape(b_, t_, d)
        return dparams, dx, jnp.zeros_like(keep)

    _apply.defvjp(_fwd, _bwd)
    return _apply(params, x, keep)
