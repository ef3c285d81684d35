"""Group-wise int4 weight matmul Pallas kernel (27B decode's HBM diet).

Companion to ops/int8_matmul.py for the ``quantize_int4`` representation
(ops/quant.py: packed nibbles [K/2, N] + per-group scales [K/G, N]).
Decode reads every LM weight once per step; int4 halves the bytes again
over int8, which is what lets gemma-3-27b (the reference's actual
generator, /root/reference/00_run_docker_containers.sh:28) live AND
decode fast on one 16 GB v5e.

The packing is group-split (see quant.py), so each group's lo/hi nibble
rows land back at their original K offsets with no in-kernel
interleave: per grid step the kernel unpacks + scales ``gpb`` groups
into an x-dtype VMEM scratch and runs ONE full-depth [M, bk] @ [bk, bn]
MXU dot (see _kernel_kn4's design-history note - a per-group
exact-int-accumulate formulation was 2.5x slower in 12B decode). Nibble
unpack happens in VMEM on int32 lanes (Mosaic has no sub-byte or
uint8->float paths; ``& 15`` / ``>> 4`` then ``- 8``). HBM traffic for
the weights is the packed uint8 bytes, full stop.

Dispatch mirrors int8: ``quant.q_dense`` routes here on TPU when K % G
== 0 and N % block_n == 0; override with ``set_int4_matmul`` /
``MMCP_INT4_MATMUL=0|1``. No SPMD partitioning rule - int4 is the
single-chip path (TP meshes use int8/bf16; quant.py docstring).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_colpali_tpu.ops.int8_matmul import _pad_m

_MODE: Optional[bool] = None


def set_int4_matmul(enabled: Optional[bool]) -> None:
    global _MODE
    _MODE = None if enabled is None else bool(enabled)


def int4_matmul_enabled() -> bool:
    if _MODE is not None:
        return _MODE
    env = os.environ.get("MMCP_INT4_MATMUL")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() == "tpu"


def int4_matmul_xla(x: jax.Array, packed: jax.Array,
                    scale: jax.Array) -> jax.Array:
    """Reference path / fallback: dequantize then matmul (same per-group
    scale math, so results match the kernel up to f32 reassociation)."""
    from multimodal_colpali_tpu.ops.quant import dequantize_int4

    w = dequantize_int4({"q4": packed, "scale": scale}, x.dtype)
    return x @ w


def _kernel_kn4(x_ref, w_ref, s_ref, o_ref, acc_ref, deq_ref,
                *, n_k, group, gpb):
    """One grid step covers ``gpb`` quantization groups: unpack + scale
    them into a bf16 VMEM scratch (group-major lo/hi rows land at their
    original K offsets), then ONE [M, bk] @ [bk, bn] MXU dot.

    Design history: a per-group two-dot formulation (exact int
    accumulate, f32 scale epilogue) was measured 2.5x SLOWER in 12B
    decode (48 vs 121 tok/s int8) - 16 K=128 dots per step starve the
    MXU. Dequant-to-bf16 in VMEM trades one bf16 rounding per weight
    (the same precision class as serving's bf16 layer math; the
    power-of-two-grid exactness pin still holds, int4 values are exact
    in bf16) for a full-depth dot."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]                                # [M, G*gpb]
    w = w_ref[...].astype(jnp.int32)              # [G/2*gpb, bn] packed
    half = group // 2
    for gi in range(gpb):
        wg = w[gi * half:(gi + 1) * half, :]
        # s_ref carries ALL group rows for this n-block (a (1, bn) block
        # would violate Mosaic's sublane-divisibility rule)
        s = s_ref[pl.ds(k * gpb + gi, 1), :]      # [1, bn] f32
        lo = (jnp.bitwise_and(wg, 15) - 8).astype(jnp.float32) * s
        hi = (jnp.right_shift(wg, 4) - 8).astype(jnp.float32) * s
        deq_ref[pl.ds(gi * group, half), :] = lo.astype(deq_ref.dtype)
        deq_ref[pl.ds(gi * group + half, half), :] = hi.astype(deq_ref.dtype)
    acc_ref[...] += jax.lax.dot_general(
        x, deq_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "out_dtype",
                                             "interpret"))
def int4_matmul_kn(x: jax.Array, packed: jax.Array, scale: jax.Array,
                   block_n: int = 512, out_dtype=None,
                   interpret: bool = False) -> jax.Array:
    """``x [M, K] @ unpack(packed) [K, N] * scale`` with the codes
    streamed from HBM packed (uint8, two weights per byte). block_k is
    pinned to the quantization group size (scale rows define it)."""
    m0, k_dim = x.shape
    k2, n_dim = packed.shape
    g_rows = scale.shape[0]
    group = (k2 * 2) // g_rows
    out_dtype = out_dtype or x.dtype
    if (k_dim != k2 * 2 or k_dim % group != 0 or n_dim % block_n != 0
            or group % 2 != 0
            or (not interpret and jax.default_backend() != "tpu")):
        return int4_matmul_xla(x, packed, scale).astype(out_dtype)
    x, m0 = _pad_m(x)
    m = x.shape[0]
    g_total = k_dim // group
    # groups per grid step: largest divisor of g_total with block_k<=2048
    gpb = 1
    for cand in range(min(g_total, max(1, 2048 // group)), 0, -1):
        if g_total % cand == 0:
            gpb = cand
            break
    n_k = g_total // gpb
    grid = (n_dim // block_n, n_k)
    out = pl.pallas_call(
        functools.partial(_kernel_kn4, n_k=n_k, group=group, gpb=gpb),
        out_shape=jax.ShapeDtypeStruct((m, n_dim), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, group * gpb), lambda n, k: (0, k)),
            pl.BlockSpec((group // 2 * gpb, block_n), lambda n, k: (k, n)),
            pl.BlockSpec((g_rows, block_n), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda n, k: (0, n)),
        scratch_shapes=[pltpu.VMEM((m, block_n), jnp.float32),
                        pltpu.VMEM((group * gpb, block_n), x.dtype)],
        interpret=interpret,
    )(x, packed, scale)
    return out[:m0]
