"""Qwen2-VL multimodal generation engine - the old-models tier, complete.

The reference serves AdaptLLM/biomed-Qwen2-VL-2B-Instruct through a vLLM
container and sends it image-context MCQ prompts
(00_run_docker_old_models.sh:24-38; 05_experiment02.py:155-166 builds the
multi-image messages). The Qwen2 LM branch covered text serving; this
engine adds the vision path so the full VLM runs first-party:

- **Vision tower**: the same ``Qwen2VisionTower`` flax module the ColQwen2
  retrievers use (Qwen2-VL's tower IS the retriever tower) - 2D rotary,
  2x2 spatial merger straight into the LM width (no separate projector,
  unlike Gemma-3/PaliGemma);
- **Attention layout**: fully CAUSAL, images included (Qwen2-VL has no
  bidirectional image spans - simpler than both Gemma-3 MM and PaliGemma);
- **mrope positions computed IN-JIT** (``mrope_positions_from_ids``): the
  continuous batchers prefill through ``_prefill(p, vp, ids, mask, pix)``
  with no side-channel for host-computed positions, so the HF
  ``get_rope_index`` semantics (text sequential; image blocks t=const,
  h/w spatial; text resumes at max+1) are reproduced traceably from the
  ids alone via a per-token advance formulation:
  every valid text token advances the running base by 1, the LAST token
  of each image block advances it by max(grid_h', grid_w'), and each
  token's (t, h, w) = exclusive-cumsum(base) + its static in-block
  offsets. Decode is text-degenerate (all three streams equal), exactly
  HF's ``max(position)+1`` continuation for text-final prompts.

Multi-image prompts are first-class: ``pixel_values`` is
``[B, N, P, patch_dim]`` (every image pre-patchified at the processor's
static grid bucket) and each image fills its own token block. Parity is
pinned to torch ``Qwen2VLForConditionalGeneration``
(tests/test_qwen2vl_mm.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.generation.engine import (
    Qwen2DecodeEngine, filter_top_p_top_k)
from multimodal_colpali_tpu.ops.quant import q_take


def mrope_positions_from_ids(ids: jax.Array, mask: jax.Array,
                             image_token_id: int,
                             grid_hw: Tuple[int, int]) -> Tuple[jax.Array,
                                                                jax.Array]:
    """Traceable Qwen2VL ``get_rope_index`` for generation layouts.

    ``ids``/``mask`` are [B, S] (left-padded); every image block holds
    exactly ``gh*gw`` tokens of the STATIC merged grid ``grid_hw``.
    Returns (positions [3, B, S], last_pos [B]) where ``last_pos + 1``
    is the decode-time position of the first generated token (HF's
    ``max(position) + 1`` rule, valid for image-final prompts too).
    """
    gh, gw = grid_hw
    n_tok = gh * gw
    valid = mask.astype(bool)
    is_img = (ids == image_token_id) & valid
    is_txt = valid & ~is_img
    # in-block index of each image token (blocks are exactly n_tok long)
    j = (jnp.cumsum(is_img, axis=1) - 1) % n_tok
    h_off = j // gw
    w_off = j % gw
    # advance AFTER each token: text 1; last image token of a block
    # max(gh, gw); other image tokens 0; padding 0
    block_last = is_img & (j == n_tok - 1)
    adv = (is_txt.astype(jnp.int32)
           + block_last.astype(jnp.int32) * max(gh, gw))
    ecs = jnp.cumsum(adv, axis=1) - adv            # exclusive prefix sum
    base = jnp.where(valid, ecs, 0)
    pos = jnp.stack([
        base,
        base + jnp.where(is_img, h_off, 0),
        base + jnp.where(is_img, w_off, 0),
    ])
    last_pos = jnp.sum(adv, axis=1) - 1
    return pos, last_pos


class Qwen2VLImagePreprocessor:
    """PIL images -> [N, P, patch_dim] pre-patchified stack at the
    config's static grid bucket (the server's ``image_preprocessor``
    seam; the heavy lifting is the retriever processor's
    ``preprocess_image`` - same resize/normalize/patchify chain)."""

    def __init__(self, cfg):
        from multimodal_colpali_tpu.models.processing_qwen2vl import (
            ColQwen2Processor)

        self._proc = ColQwen2Processor(cfg)

    def __call__(self, images) -> np.ndarray:
        return np.stack([self._proc.preprocess_image(im) for im in images])


class Qwen2VLMMEngine:
    """Image-conditioned Qwen2-VL generation on a ColQwen2ModelConfig
    (the plain-VL constructors ``qwen2_vl_2b``/``qwen2_vl_7b``)."""

    # per-image array rank for the batchers' single-image lift: images
    # arrive pre-patchified as [P, patch_dim] (not [H, W, 3] rasters)
    image_rank = 2

    def __init__(self, cfg, params, dtype: Any = jnp.float32,
                 weight_dtype: str = "native", vision_dtype: str = "native"):
        self.cfg = cfg
        self.lm = Qwen2DecodeEngine(cfg.text, params, dtype=dtype,
                                    weight_dtype=weight_dtype)
        cast = lambda t: jax.tree.map(
            lambda p: jnp.asarray(p, dtype)
            if jnp.asarray(p).dtype == jnp.float32 else jnp.asarray(p), t)
        # Vision params ride INTO the jits as arguments (never closed
        # over): closure capture would bake the ~1.3 GB tower into the
        # lowering as constants (same rule as Gemma3MMEngine).
        self.vision_params = cast(params["visual"])
        if vision_dtype == "int8":
            from multimodal_colpali_tpu.ops.quant import (
                quantize_encoder_params)

            self.vision_params = jax.jit(quantize_encoder_params)(
                self.vision_params)
        elif vision_dtype != "native":
            raise ValueError(
                f"vision_dtype must be 'native' or 'int8', "
                f"got {vision_dtype!r}")
        self._jit_cache: Dict[Tuple, Any] = {}

    @property
    def _vp(self):
        return {"vision": self.vision_params}

    @property
    def _grid_merged(self) -> Tuple[int, int]:
        m = self.cfg.vision.spatial_merge_size
        return self.cfg.grid_h // m, self.cfg.grid_w // m

    @property
    def tokens_per_image(self) -> int:
        gh, gw = self._grid_merged
        return gh * gw

    # -- vision ------------------------------------------------------------

    def _image_features(self, vp, pix: jax.Array) -> jax.Array:
        """[B, N, P, patch_dim] -> [B, N * P/m^2, hidden] merged features
        (the tower's merger already projects to the LM width - Qwen2-VL
        has no separate multimodal projector)."""
        from multimodal_colpali_tpu.models.qwen2vl import Qwen2VisionTower

        c = self.cfg
        if pix.ndim == 3:
            pix = pix[:, None]
        b, n_img = pix.shape[:2]
        feats = Qwen2VisionTower(c.vision, c.grid_h, c.grid_w).apply(
            {"params": vp["vision"]},
            pix.reshape((b * n_img,) + pix.shape[2:]).astype(self.lm.dtype))
        return feats.reshape(b, n_img * feats.shape[1], -1
                             ).astype(self.lm.dtype)

    def _merged_embeds(self, p, vp, ids: jax.Array,
                       pix: jax.Array) -> jax.Array:
        """Text embeds (NO sqrt(hidden) scale - Qwen2 convention) with
        image features scattered into the image-token slots in order."""
        c = self.cfg
        embeds = q_take(p["embed"]["embed_tokens"],
                        jnp.where(ids == c.image_token_id, 0, ids),
                        jnp.float32).astype(self.lm.dtype)
        img = self._image_features(vp, pix)
        is_img = ids == c.image_token_id
        img_pos = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0,
                           img.shape[1] - 1)
        gathered = jnp.take_along_axis(img, img_pos[..., None], axis=1)
        return jnp.where(is_img[..., None], gathered, embeds)

    # -- prefill -------------------------------------------------------------

    def _prefill(self, p, vp, ids, mask, pix):
        """Whole-prompt CAUSAL prefill (Qwen2-VL has no bidirectional
        image spans) with in-jit mrope positions. Returns
        (k, v, next-token logits, last position) - the batchers' standard
        modality-agnostic contract."""
        c = self.cfg.text
        eng = self.lm
        b, s = ids.shape
        pos3, last_pos = mrope_positions_from_ids(
            ids, mask, self.cfg.image_token_id, self._grid_merged)
        kcaches = tuple(
            jnp.zeros((b, s, c.num_key_value_heads, c.head_dim), eng.dtype)
            for _ in range(c.num_hidden_layers))
        x = self._merged_embeds(p, vp, ids, pix)
        hidden, (k, v) = eng._chunk(p, x, pos3, kcaches, kcaches, 0,
                                    mask.astype(bool))
        return k, v, eng._logits(p, hidden[:, -1]), last_pos

    # -- generation ------------------------------------------------------------

    def _build(self, s: int, max_new: int, temperature: float,
               eos_id: int, pad_id: int, top_p: float = 1.0, top_k: int = 0):
        c = self.cfg.text
        eng = self.lm
        t = s + max_new

        def sample(logits, rng, step):
            if temperature <= 0.0:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            key = jax.random.fold_in(rng, step)
            scaled = logits / temperature
            if top_p < 1.0 or top_k > 0:
                scaled = filter_top_p_top_k(scaled, top_p, top_k)
            return jax.random.categorical(
                key, scaled, axis=-1).astype(jnp.int32)

        def run(p, vp, ids, mask, pix, rng):
            b = ids.shape[0]
            k, v, logits, last_pos = self._prefill(p, vp, ids, mask, pix)
            kcaches = tuple(
                jnp.zeros((b, t, c.num_key_value_heads, c.head_dim),
                          eng.dtype).at[:, :s].set(ki) for ki in k)
            vcaches = tuple(
                jnp.zeros((b, t, c.num_key_value_heads, c.head_dim),
                          eng.dtype).at[:, :s].set(vi) for vi in v)
            kv_valid = jnp.concatenate(
                [mask.astype(bool), jnp.ones((b, max_new), bool)], axis=1)
            tok = sample(logits, rng, 0)
            done = tok == eos_id

            def body(carry, step):
                kc, vc, tok, done = carry
                x = eng._embed(p, tok[:, None])
                pos = (last_pos + step)[:, None]   # text-degenerate mrope
                hidden, (kc, vc) = eng._chunk(
                    p, x, pos, kc, vc, s + step - 1, kv_valid)
                nxt = sample(eng._logits(p, hidden[:, -1]), rng, step)
                nxt = jnp.where(done, jnp.int32(pad_id), nxt)
                done = done | (nxt == eos_id)
                return (kc, vc, nxt, done), nxt

            (_, _, _, _), rest = jax.lax.scan(
                body, (kcaches, vcaches, tok, done),
                jnp.arange(1, max_new), length=max_new - 1)
            return jnp.concatenate([tok[:, None], rest.T], axis=1)

        return jax.jit(run)

    def _pad_batch(self, prompts, bucket: int, pad_id: int):
        s = max(max(len(pr) for pr in prompts), 1)
        s = ((s + bucket - 1) // bucket) * bucket
        b = len(prompts)
        ids = np.full((b, s), pad_id, np.int32)
        mask = np.zeros((b, s), np.int32)
        for n, pr in enumerate(prompts):
            ids[n, -len(pr):] = pr
            mask[n, -len(pr):] = 1
        return ids, mask, s

    def generate(self, prompts: Sequence[Sequence[int]], pixel_values,
                 max_new_tokens: int = 32, temperature: float = 0.0,
                 eos_id: int = -1, pad_id: int = 0, seed: int = 0,
                 bucket: int = 16, top_p: float = 1.0,
                 top_k: int = 0) -> List[List[int]]:
        """Image-conditioned continuations. ``prompts`` already contain
        the image-token blocks (``build_mm_prompt``); ``pixel_values`` is
        [B, P, patch_dim] or [B, N, P, patch_dim] pre-patchified at the
        config's static grid bucket."""
        ids, mask, s = self._pad_batch(prompts, bucket, pad_id)
        key = (s, max_new_tokens, float(temperature), eos_id, pad_id,
               float(top_p), int(top_k))
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build(
                s, max_new_tokens, float(temperature), eos_id, pad_id,
                top_p=float(top_p), top_k=int(top_k))
        out = np.asarray(self._jit_cache[key](
            self.lm.params, self._vp, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(pixel_values), jax.random.PRNGKey(seed)))
        results = []
        for row in out:
            toks = row.tolist()
            if eos_id in toks:
                toks = toks[: toks.index(eos_id)]
            results.append(toks)
        return results

    def next_token_logits(self, prompts: Sequence[Sequence[int]],
                          pixel_values, pad_id: int = 0,
                          bucket: int = 16) -> np.ndarray:
        """Image-conditioned prefill-only logits [B, V] (the server's
        constrained-enum MCQ surface)."""
        ids, mask, s = self._pad_batch(prompts, bucket, pad_id)
        key = ("prefill", s)
        if key not in self._jit_cache:
            def run(p, vp, ids, mask, pix):
                _, _, logits, _ = self._prefill(p, vp, ids, mask, pix)
                return logits

            self._jit_cache[key] = jax.jit(run)
        return np.asarray(self._jit_cache[key](
            self.lm.params, self._vp, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(pixel_values)))

    def build_mm_prompt(self, text_ids: Sequence[int], bos_id: int = -1,
                        n_images: int = 1,
                        newline_ids: Sequence[int] = ()) -> List[int]:
        """Qwen2-VL prompt layout: per image,
        ``<|vision_start|> <image>*tokens_per_image <|vision_end|>``,
        then the text. (The HF chat template adds im_start/system headers
        around this; pass them inside ``text_ids`` for checkpoint use.
        ``bos_id``/``newline_ids`` keep the server's engine-agnostic
        call shape - Qwen2 has no BOS, so pass -1 to omit.)"""
        c = self.cfg
        seq: List[int] = [] if bos_id < 0 else [bos_id]
        for _ in range(max(1, n_images)):
            seq.append(c.vision_start_token_id)
            seq += [c.image_token_id] * self.tokens_per_image
            seq.append(c.vision_end_token_id)
        return seq + list(text_ids) + list(newline_ids)
