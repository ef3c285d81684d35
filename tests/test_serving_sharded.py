"""Sharded serving tier: the continuous batchers over a dp x tp mesh.

The reference's generator is Gemma-3-27B behind vLLM
(00_run_docker_containers.sh:26-39); a 27B LM cannot fit one v5e chip, so
first-party serving at that scale requires the batchers - not just the raw
engine - to run TP-sharded. These tests pin the sharded batchers to the
single-device streams on the 8-device virtual CPU mesh (conftest).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from multimodal_colpali_tpu.generation.engine import GemmaDecodeEngine
from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher
from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher
from multimodal_colpali_tpu.models.colpali import ColPaliModel
from multimodal_colpali_tpu.models.configs import (ColPaliModelConfig,
                                                   Gemma3TextConfig)
from multimodal_colpali_tpu.models.registry import (fast_random_params,
                                                    gemma3_random_params)


@pytest.fixture(scope="module")
def dp_tp_mesh():
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("data", "model"))


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    model = ColPaliModel(cfg)
    params = jax.tree.map(jnp.asarray, fast_random_params(model, cfg, seed=3))
    return cfg.text, params


@pytest.fixture(scope="module")
def tiny_g3():
    # 2 kv heads so the page pool genuinely shards its head axis over tp=2
    cfg = Gemma3TextConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, sliding_window=8, sliding_window_pattern=2,
        query_pre_attn_scalar=8.0)
    return cfg, gemma3_random_params(cfg, seed=5)


PROMPTS = [[5, 9, 17, 3], [40, 2], list(range(3, 24)), [7, 30, 8, 2, 19]]


def test_sharded_dense_batcher_matches_single_device(tiny_lm, dp_tp_mesh):
    tcfg, params = tiny_lm
    plain = ContinuousBatcher(GemmaDecodeEngine(tcfg, params),
                              batch_slots=4, max_seq_len=64, chunk=3)
    want = plain.generate(PROMPTS, max_new_tokens=8)
    eng = GemmaDecodeEngine(tcfg, params, mesh=dp_tp_mesh)
    bat = ContinuousBatcher(eng, batch_slots=4, max_seq_len=64, chunk=3)
    assert bat.mesh is dp_tp_mesh
    assert bat._batch_axis() == "data"
    got = bat.generate(PROMPTS, max_new_tokens=8)
    assert got == want


def test_sharded_paged_batcher_matches_single_device(tiny_lm, dp_tp_mesh):
    """dp x tp paged serving, including preemption under a tight pool."""
    tcfg, params = tiny_lm
    plain = PagedContinuousBatcher(GemmaDecodeEngine(tcfg, params),
                                   batch_slots=4, max_seq_len=64, chunk=3,
                                   page_size=8, pool_pages=13)
    want = plain.generate(PROMPTS, max_new_tokens=8)
    eng = GemmaDecodeEngine(tcfg, params, mesh=dp_tp_mesh)
    bat = PagedContinuousBatcher(eng, batch_slots=4, max_seq_len=64, chunk=3,
                                 page_size=8, pool_pages=13)
    got = bat.generate(PROMPTS, max_new_tokens=8)
    assert got == want
    assert bat.preemptions == plain.preemptions


def test_sharded_paged_gemma3_pool_shards_heads(tiny_g3, dp_tp_mesh):
    """Gemma-3 through the sharded paged batcher: the pool's kv-head axis
    shards over "model" (2 heads / tp=2) and streams still match."""
    cfg, params = tiny_g3
    plain = PagedContinuousBatcher(GemmaDecodeEngine(cfg, params),
                                   batch_slots=4, max_seq_len=64, chunk=3,
                                   page_size=8)
    want = plain.generate(PROMPTS, max_new_tokens=8)
    eng = GemmaDecodeEngine(cfg, params, mesh=dp_tp_mesh)
    bat = PagedContinuousBatcher(eng, batch_slots=4, max_seq_len=64, chunk=3,
                                 page_size=8)
    spec = bat._kpools[0].sharding.spec
    assert spec[2] == "model", spec
    got = bat.generate(PROMPTS, max_new_tokens=8)
    assert got == want


def test_sharded_paged_int8_pools(tiny_lm, dp_tp_mesh):
    """int8 pools (codes + scales leaves) place on the mesh and serve."""
    tcfg, params = tiny_lm
    plain = PagedContinuousBatcher(GemmaDecodeEngine(tcfg, params),
                                   batch_slots=4, max_seq_len=64, chunk=3,
                                   page_size=8, kv_dtype="int8")
    want = plain.generate(PROMPTS[:2], max_new_tokens=6)
    eng = GemmaDecodeEngine(tcfg, params, mesh=dp_tp_mesh)
    bat = PagedContinuousBatcher(eng, batch_slots=4, max_seq_len=64, chunk=3,
                                 page_size=8, kv_dtype="int8")
    got = bat.generate(PROMPTS[:2], max_new_tokens=6)
    assert got == want


def test_sharded_fail_all_replaces_pools_on_mesh(tiny_lm, dp_tp_mesh):
    """Recovery after a failed (donating) dispatch keeps the mesh
    placement of the rebuilt pools."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params, mesh=dp_tp_mesh)
    bat = PagedContinuousBatcher(eng, batch_slots=4, max_seq_len=64, chunk=3,
                                 page_size=8)
    fut = bat.submit([5, 9, 17], max_new_tokens=6)
    with bat._lock:
        bat._admit()
        for leaf in jax.tree.leaves((bat._kpools, bat._vpools)):
            leaf.delete()
        bat._fail_all(RuntimeError("injected"))
    with pytest.raises(RuntimeError):
        fut.result(10)
    assert all(l.sharding is not None for l in jax.tree.leaves(bat._kpools))
    prompt = [5, 9, 17]
    fut = bat.submit(prompt, max_new_tokens=6)
    bat.drain()
    want = GemmaDecodeEngine(tcfg, params).generate([prompt],
                                                    max_new_tokens=6)[0]
    assert fut.result(10) == want
