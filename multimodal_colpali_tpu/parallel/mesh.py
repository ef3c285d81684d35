"""Device mesh and sharding helpers.

The framework's parallelism axes (SURVEY.md §2.3):

- ``data``: batch axis for page/query embedding (DP). This is how
  ">=1k pages/sec/chip" scales linearly to a pod slice.
- ``model``: tensor-parallel axis for large encoders (TP over attention
  heads / MLP hidden). Not needed for <=3B retrievers but wired so the
  training step and future generators shard cleanly.
- ``corpus``: page axis of the vector stores; MaxSim + top-k reduce over it
  with XLA collectives on ICI (see ops/topk.py).

The reference has no device parallelism at all (single ``cuda:0`` maps,
asyncio HTTP fan-out only - reference functions.py:1469-1473,
02_experiment01.py:213-225); these meshes are the TPU-native upgrade.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the multi-host (DCN) runtime: the >single-host corpus story.

    One process per host; after this, ``jax.devices()`` spans every host and
    a ``corpus``-axis mesh built over it shards pages across hosts - the
    all-gather in ops/topk.py then rides ICI within a slice and DCN across
    hosts, with XLA picking the transport per edge (SURVEY.md §2.3 comm
    row). The reference has no cross-process compute at all (its only
    inter-process traffic is HTTP to Qdrant/vLLM); this is the TPU-native
    replacement for "point the client at a bigger Qdrant server".

    Arguments default to the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID), so
    launchers can configure the fleet purely through the environment.
    No-op when already initialized or when running single-process.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single-process run
    kwargs = dict(coordinator_address=coordinator_address)
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def global_corpus_mesh(axis: str = "corpus") -> Mesh:
    """A one-axis mesh over every device of every process (host-major
    device order, so contiguous page ranges live on one host)."""
    return Mesh(np.array(jax.devices()), (axis,))


def make_global_corpus(local_rows: np.ndarray, mesh: Mesh,
                       axis: str = "corpus") -> jax.Array:
    """Assemble a globally page-sharded array from this process's rows.

    Every process contributes its local shard (equal row counts); the
    result is one logical array sharded over ``axis`` across all hosts,
    ready for ops/topk.sharded_maxsim_topk / the two-stage variants.
    """
    sharding = NamedSharding(mesh, P(axis, *([None] * (local_rows.ndim - 1))))
    return jax.make_array_from_process_local_data(sharding, local_rows)


def get_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over available devices.

    Default: all devices on one ``data`` axis. Pass e.g.
    ``axis_names=("data", "model"), shape=(2, 4)`` for DP x TP.
    """
    devs = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devs)] + [1] * (len(axis_names) - 1)
    arr = np.array(devs[: int(np.prod(shape))]).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_for_tp(params, mesh: Mesh, axis: str = "model"):
    """Tensor-parallel param placement for the transformer blocks.

    Column-parallel: q/k/v/gate/up projections shard their output dim;
    row-parallel: o/down projections shard their input dim; everything else
    (norms, embeddings) is replicated. XLA inserts the all-reduces.
    """
    col_keys = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
                "query", "key", "value", "fc1")
    row_keys = ("o_proj", "down_proj", "out_proj", "fc2", "output")

    def place(path, p):
        names = [getattr(k, "key", str(k)) for k in path]
        spec = P()
        if p.ndim == 2:
            if any(k in names for k in col_keys):
                spec = P(None, axis)
            elif any(k in names for k in row_keys):
                spec = P(axis, None)
        return jax.device_put(p, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
