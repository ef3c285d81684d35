"""Weight-only int8 matmul Pallas kernels (decode's HBM diet).

Serving-batch decode is bound by the weight stream: every decode step
reads every LM weight once while the MXU idles. ``ops/quant.py`` stores
kernels as int8 codes + f32 per-channel scales, but the XLA lowering of
``x @ codes.astype(bf16)`` may MATERIALIZE the bf16 upcast in HBM (read
int8 + write bf16 + read bf16 = 3x the int8 bytes), which is why weight
int8 alone bought only ~1.1x on the v5e (BASELINE.md). These kernels read
the int8 codes straight from HBM, upcast in VMEM (exact for |code|<=127),
dot on the MXU with f32 accumulation, and apply the scale as a VMEM
epilogue - HBM traffic is the int8 bytes, full stop.

Two weight layouts, matching the two consumers:

- ``int8_matmul_kn``:   x [M, K] @ codes [K, N] * scale [N]  (projections;
  per-output-column scales, ``quantize_int8(w, axis=0)``)
- ``int8_matmul_nk``:   x [M, K] @ codes [N, K].T * scale [N]  (tied LM
  head: the embed table is [V, H] quantized per row,
  ``quantize_int8(w, axis=1)``; contraction over H)

Both tile N x K with K innermost and a f32 accumulator in VMEM scratch;
numerics match the XLA path (same post-scale order) up to f32 sum
reassociation. Dispatch: ``ops/quant.py`` routes here on TPU when shapes
meet the tiling constraints (K, N multiples of 128); override with
``set_int8_matmul(True/False)`` or ``MMCP_INT8_MATMUL=1/0``. The kernels
carry no SPMD partitioning rule yet - a TP-sharded engine should set
``MMCP_INT8_MATMUL=0`` (XLA then partitions the plain-dot path; on the
single-chip serving path this does not arise).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MODE: Optional[bool] = None   # None = auto (TPU + shape check)


def set_int8_matmul(enabled: Optional[bool]) -> None:
    """Force the Pallas path on/off; ``None`` restores auto."""
    global _MODE
    _MODE = None if enabled is None else bool(enabled)


def int8_matmul_enabled() -> bool:
    if _MODE is not None:
        return _MODE
    env = os.environ.get("MMCP_INT8_MATMUL")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() == "tpu"


# The kernels keep the FULL M rows resident in VMEM (x block + f32 acc +
# out block ~ m * 4 KB at the default 512 blocks): past ~2k rows the
# scoped-VMEM budget (16 MB) blows. Decode Ms are tiny (slots, or
# slots*spec_k); large-M callers (a 6.4k-token Mllama cross-KV
# projection at prefill) fall back to XLA, where prefill is
# compute-bound anyway and the upcast copy is amortized over many rows.
_MAX_M = 2048


def _ok_shapes(m: int, k: int, n: int, block_k: int, block_n: int) -> bool:
    return m <= _MAX_M and k % block_k == 0 and n % block_n == 0


def int8_matmul_xla(x: jax.Array, codes: jax.Array, scale: jax.Array,
                    transpose_codes: bool = False) -> jax.Array:
    """Reference path (and off-TPU fallback): identical math to
    ``quant.q_dense``/``q_logits`` - upcast codes, dot, post-scale."""
    w = codes.astype(x.dtype)
    y = x @ (w.T if transpose_codes else w)
    return y * scale.astype(x.dtype)


def _kernel_kn(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]                                    # [M, bk]
    w = w_ref[...].astype(x.dtype)                    # [bk, bn] int8->bf16
    acc_ref[...] += jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _done():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


def _kernel_nk(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]                                    # [M, bk]
    w = w_ref[...].astype(x.dtype)                    # [bn, bk] int8->bf16
    acc_ref[...] += jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _done():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


def _pad_m(x: jax.Array, mult: int = 16):
    m = x.shape[0]
    pad = (-m) % mult
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, m


@functools.partial(jax.jit, static_argnames=("block_k", "block_n",
                                             "out_dtype", "interpret"))
def int8_matmul_kn(x: jax.Array, codes: jax.Array, scale: jax.Array,
                   block_k: int = 512, block_n: int = 512,
                   out_dtype=None, interpret: bool = False) -> jax.Array:
    """``x [M, K] @ codes [K, N] * scale [N]`` with the codes streamed
    from HBM as int8. Requires K % block_k == 0 and N % block_n == 0
    (all Gemma projection dims are multiples of 128; callers check via
    ``_ok_shapes`` and fall back to XLA otherwise)."""
    m0, k_dim = x.shape
    _, n_dim = codes.shape
    out_dtype = out_dtype or x.dtype
    if not _ok_shapes(m0, k_dim, n_dim, block_k, block_n) or (
            not interpret and jax.default_backend() != "tpu"):
        return int8_matmul_xla(x, codes, scale).astype(out_dtype)
    x, m0 = _pad_m(x)
    m = x.shape[0]
    n_k = k_dim // block_k
    grid = (n_dim // block_n, n_k)
    out = pl.pallas_call(
        functools.partial(_kernel_kn, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((m, n_dim), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, block_k), lambda n, k: (0, k)),
            pl.BlockSpec((block_k, block_n), lambda n, k: (k, n)),
            pl.BlockSpec((1, block_n), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda n, k: (0, n)),
        scratch_shapes=[pltpu.VMEM((m, block_n), jnp.float32)],
        interpret=interpret,
    )(x, codes, scale[None, :])
    return out[:m0]


@functools.partial(jax.jit, static_argnames=("block_k", "block_n",
                                             "out_dtype", "interpret"))
def int8_matmul_nk(x: jax.Array, codes: jax.Array, scale: jax.Array,
                   block_k: int = 512, block_n: int = 512,
                   out_dtype=None, interpret: bool = False) -> jax.Array:
    """``x [M, K] @ codes [N, K].T * scale [N]`` - the tied-LM-head
    layout (embed table quantized per row). Same tiling contract."""
    m0, k_dim = x.shape
    n_dim = codes.shape[0]
    out_dtype = out_dtype or x.dtype
    if not _ok_shapes(m0, k_dim, n_dim, block_k, block_n) or (
            not interpret and jax.default_backend() != "tpu"):
        return int8_matmul_xla(x, codes, scale,
                               transpose_codes=True).astype(out_dtype)
    x, m0 = _pad_m(x)
    m = x.shape[0]
    n_k = k_dim // block_k
    grid = (n_dim // block_n, n_k)
    out = pl.pallas_call(
        functools.partial(_kernel_nk, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((m, n_dim), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, block_k), lambda n, k: (0, k)),
            pl.BlockSpec((block_n, block_k), lambda n, k: (n, k)),
            pl.BlockSpec((1, block_n), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda n, k: (0, n)),
        scratch_shapes=[pltpu.VMEM((m, block_n), jnp.float32)],
        interpret=interpret,
    )(x, codes, scale[None, :])
    return out[:m0]
