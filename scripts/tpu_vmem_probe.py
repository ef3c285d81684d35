#!/usr/bin/env python
"""Probe how much scoped VMEM a Pallas kernel may claim on this chip.

The fused-layer kernels hit `Scoped allocation ... limit 16.00M` - the
XLA default scoped-vmem limit, not necessarily the physical VMEM. This
compiles a trivial kernel with increasing vmem_limit_bytes + scratch to
find the real ceiling."""

import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_scratch(mb: int) -> bool:
    n = mb * 1024 * 1024 // (128 * 4)

    def kern(x_ref, o_ref, scr):
        scr[0, :] = x_ref[0, :]
        o_ref[:] = x_ref[:] + scr[0, 0]

    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(mb + 8) * 1024 * 1024),
        )(jnp.ones((8, 128), jnp.float32))
        np.asarray(out)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"  {mb} MB scratch FAILED: {str(e)[:160]}", file=sys.stderr)
        return False


if __name__ == "__main__":
    print("backend:", jax.default_backend(), file=sys.stderr)
    for mb in (15, 24, 32, 48, 64, 96, 110, 120):
        ok = try_scratch(mb)
        print(f"scratch {mb} MB: {'OK' if ok else 'FAIL'}", file=sys.stderr)
        if not ok:
            break
