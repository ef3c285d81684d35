"""Multi-host (DCN) seam test: 2 CPU processes, cross-process corpus shard.

Validates the >single-host corpus story (SURVEY.md §2.3 comm row) without
TPU pods: two OS processes join via jax.distributed over localhost, build
the global corpus mesh, assemble a page-sharded corpus from process-local
rows, and run the sharded MaxSim top-k whose all-gather crosses the process
boundary. Skipped gracefully where the CPU backend lacks multi-process
support.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins a remote TPU

from multimodal_colpali_tpu.parallel import (
    global_corpus_mesh, initialize_distributed, make_global_corpus)
from multimodal_colpali_tpu.ops.topk import sharded_maxsim_topk

initialize_distributed()  # from JAX_COORDINATOR_ADDRESS/_NUM_PROCESSES/_PROCESS_ID
assert jax.process_count() == 2, jax.process_count()
pid = jax.process_index()

mesh = global_corpus_mesh()
n_dev = len(jax.devices())
p_local_rows = 8  # pages owned by this process
rng = np.random.default_rng(0)
full = rng.standard_normal((2 * p_local_rows, 4, 128)).astype(np.float32)
mine = full[pid * p_local_rows: (pid + 1) * p_local_rows]
d = make_global_corpus(mine, mesh)
d_lens = make_global_corpus(np.full(p_local_rows, 4, np.int32), mesh)
q = jax.numpy.asarray(full[11][None, ...])  # page 11 lives on process 1

vals, idx = sharded_maxsim_topk(mesh, "corpus", q, d, d_lens, 3,
                                use_pallas=False)
top = np.asarray(idx)[0].tolist()
assert top[0] == 11, top  # self-similarity wins across the process boundary
print(f"DCN_OK pid={pid} top={top}", flush=True)

# store-level: the distributed corpus view (pooled two-stage across hosts)
from multimodal_colpali_tpu.store.distributed import DistributedCorpusView

view = DistributedCorpusView(mine, np.full(p_local_rows, 4, np.int32),
                             mesh=mesh, prefilter="pooled")
_, ids = view.query(full[11], limit=3, oversampling=4.0)
assert ids[0] == 11, ids
assert view.owns(11) == (pid == 1)  # page 11 lives on process 1
print(f"VIEW_OK pid={pid} ids={ids.tolist()}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_corpus_shard(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "PYTHONPATH": f"{REPO}:{os.environ.get('PYTHONPATH', '')}",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append((p.returncode, out))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-process CPU runtime hung (unsupported here)")
    for rc, out in outs:
        if rc != 0 and ("UNIMPLEMENTED" in out or "not supported" in out):
            pytest.skip(f"multi-process CPU backend unsupported: {out[-200:]}")
        assert rc == 0, out
        assert "DCN_OK" in out, out
        assert "VIEW_OK" in out, out
