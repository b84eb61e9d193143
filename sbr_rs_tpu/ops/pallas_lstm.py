"""Fused Pallas LSTM tower for TPU.

The training hot loop is the LSTM recurrence (reference: wyrm's unrolled
cell chain, ``src/models/lstm.rs:293-298``; here ``lax.scan`` in
:mod:`sbr_rs_tpu.models.towers`). XLA compiles the scan into a device loop,
but every step re-reads/re-writes the ``[B, D]`` carry and the gate slices
through HBM. This kernel fuses the whole recurrence:

* the input projection ``x @ w_x + b`` stays OUTSIDE (one big MXU matmul
  over all timesteps — XLA's sweet spot);
* the kernel walks the time axis on a ``(batch_tiles, T)`` grid — on TPU
  the grid is executed sequentially with the last dimension innermost, so
  the ``[Bt, D]`` hidden/cell carries live in VMEM scratch across the whole
  sequence and only ``xz[t]`` / ``hidden[t]`` tiles stream through the
  pipelined block machinery;
* the per-step ``h @ w_h`` recurrence matmul runs on the MXU with the
  weights resident in VMEM.

Both LSTM variants are supported (Normal [i,f,g,o] and Coupled [i,g,o] with
forget = 1 - input, reference ``src/models/lstm.rs:28-35``). The kernel is
forward-only and wrapped in a ``jax.custom_vjp`` whose backward falls back
to the scan implementation's gradient — training uses it through
``jax.value_and_grad`` transparently.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(xz_ref, wh_ref, hidden_ref, h_scr, c_scr, *, coupled: bool):
    t = pl.program_id(1)
    d = h_scr.shape[-1]

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    c = c_scr[:]
    z = xz_ref[:, 0, :] + jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32)

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
    hidden_ref[:, 0, :] = h_new


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("coupled",))
def _lstm_forward_pallas(xz: jnp.ndarray, w_h: jnp.ndarray, *, coupled: bool):
    """Run the fused recurrence. ``xz``: [B, T, G*D] pre-projected inputs
    (+bias); ``w_h``: [D, G*D]. Returns hidden [B, T, D]."""
    b, t, gd = xz.shape
    d = w_h.shape[0]

    # Tile the batch so scratch + blocks stay comfortably inside VMEM.
    bt = min(_round_up(b, 8), 512)
    b_pad = _round_up(b, bt)
    if b_pad != b:
        xz = jnp.pad(xz, ((0, b_pad - b), (0, 0), (0, 0)))

    grid = (b_pad // bt, t)
    hidden = pl.pallas_call(
        functools.partial(_lstm_kernel, coupled=coupled),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, 1, gd), lambda i, tt: (i, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, gd), lambda i, tt: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bt, 1, d), lambda i, tt: (i, tt, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, t, d), xz.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, d), jnp.float32),
            pltpu.VMEM((bt, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(xz, w_h)
    return hidden[:b]


def lstm_apply_pallas(
    params: Dict[str, jnp.ndarray], x: jnp.ndarray, *, coupled: bool
) -> jnp.ndarray:
    """Drop-in replacement for :func:`sbr_rs_tpu.models.towers.lstm_apply`
    with the recurrence as one fused Pallas kernel. Gradients fall back to
    the scan path (same math, differentiable)."""
    from ..models.towers import lstm_apply as _scan_apply

    @jax.custom_vjp
    def _apply(params, x):
        b_, t_, d = x.shape
        xz = (x.reshape(b_ * t_, d) @ params["w_x"]).reshape(b_, t_, -1) + params["b"]
        return _lstm_forward_pallas(xz, params["w_h"], coupled=coupled)

    def _fwd(params, x):
        return _apply(params, x), (params, x)

    def _bwd(res, g):
        params, x = res
        _, vjp = jax.vjp(lambda p, xx: _scan_apply(p, xx, coupled=coupled), params, x)
        return vjp(g)

    _apply.defvjp(_fwd, _bwd)
    return _apply(params, x)
