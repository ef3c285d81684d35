"""Prompt-lookup speculative decoding: bit-identical to greedy decode.

Oracle: GemmaDecodeEngine.generate at temperature 0 - speculation is a
pure scheduling change (verify-then-accept), so every stream must match
exactly, whatever the acceptance rate.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.generation.engine import GemmaDecodeEngine
from multimodal_colpali_tpu.generation.speculative import speculative_generate
from multimodal_colpali_tpu.models.colpali import ColPaliModel
from multimodal_colpali_tpu.models.configs import (ColPaliModelConfig,
                                                   Gemma3TextConfig)
from multimodal_colpali_tpu.models.registry import (fast_random_params,
                                                    gemma3_random_params)


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    model = ColPaliModel(cfg)
    params = jax.tree.map(jnp.asarray, fast_random_params(model, cfg, seed=3))
    return cfg.text, params


def test_speculative_matches_greedy_random_prompts(tiny_lm):
    """Low-acceptance regime (random prompts): still bit-identical."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(2, 60, (n,)).tolist() for n in (5, 11, 3, 19)]
    want = eng.generate(prompts, max_new_tokens=12)
    got, acc = speculative_generate(eng, prompts, max_new_tokens=12, k=4)
    assert got == want
    assert acc >= 1.0   # every verify forward emits at least one token


def test_speculative_matches_greedy_repetitive_output(tiny_lm):
    """High-acceptance regime: greedy decode of the tiny random LM locks
    into short cycles, exactly the pattern prompt lookup drafts from -
    multiple tokens accepted per forward AND bit-identical streams."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(2, 60, (rng.integers(4, 12),)).tolist()
               for _ in range(3)]
    want = eng.generate(prompts, max_new_tokens=24)
    got, acc = speculative_generate(eng, prompts, max_new_tokens=24, k=4)
    assert got == want
    assert acc > 1.3, f"no speculation benefit measured (acc={acc})"


def test_speculative_eos_and_budget(tiny_lm):
    """eos inside an accepted draft window truncates exactly like the
    engine; budgets clamp mid-window."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    prompts = [[5, 9, 17, 3], [40, 2]]
    free = eng.generate(prompts, max_new_tokens=10)
    # use a token the model actually generates as eos
    eos = free[0][3]
    want = eng.generate(prompts, max_new_tokens=10, eos_id=eos)
    got, _ = speculative_generate(eng, prompts, max_new_tokens=10,
                                  k=4, eos_id=eos)
    assert got == want
    want1 = eng.generate(prompts, max_new_tokens=3)
    got1, _ = speculative_generate(eng, prompts, max_new_tokens=3, k=4)
    assert got1 == want1


def test_speculative_gemma3(tiny_lm):
    """Speculation composes with Gemma-3's sliding-window layers."""
    cfg = Gemma3TextConfig.tiny(vocab_size=64)
    params = gemma3_random_params(cfg, seed=5)
    eng = GemmaDecodeEngine(cfg, params)
    span = [7, 21, 9, 33, 14]
    prompts = [span * 4, [3, 17, 42, 7, 9, 23, 55, 4, 11]]
    want = eng.generate(prompts, max_new_tokens=14)
    got, _ = speculative_generate(eng, prompts, max_new_tokens=14, k=3)
    assert got == want
