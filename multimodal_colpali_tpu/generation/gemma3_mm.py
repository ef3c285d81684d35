"""Gemma-3 multimodal generation engine - the reference's FULL generator.

The reference's vLLM container serves google/gemma-3-27b-it over
image-context MCQ prompts (00_run_docker_containers.sh:26-39;
05_experiment02.py:155-166 builds multi-image context messages). The
round-3 Gemma-3 LM covered the text tower; this engine adds the vision
path so the complete generator runs first-party:

- **SigLIP vision tower** (the same ``SiglipVisionTower`` the ColPali
  retrievers use - Gemma-3's tower is architecturally identical);
- **Projector**: avg-pool the patch grid to ``mm_tokens_per_image``
  soft tokens, RMSNorm (Gemma (1+w) convention, vision eps), bias-free
  projection to the text width (HF ``Gemma3MultiModalProjector``);
- **Attention layout**: image tokens attend BIDIRECTIONALLY within
  their own image span; everything else is causal, composed with the
  5:1 sliding/global interleave (the bidirectional override also
  pierces the sliding window, matching HF's or-mask semantics);
- decode after prefill is pure causal and reuses the Gemma-3 branch of
  ``engine.layer_stack`` through ``GemmaDecodeEngine._chunk``.

Multi-image prompts are first-class: ``pixel_values`` is
``[B, N, H, W, 3]`` and each image's soft tokens form their own
bidirectional span. Parity pinned to torch
``Gemma3ForConditionalGeneration`` (tests/test_gemma3_mm.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.generation.engine import (
    GemmaDecodeEngine, attn_scale, filter_top_p_top_k, layer_stack)
from multimodal_colpali_tpu.models import layers as L
from multimodal_colpali_tpu.ops.quant import q_take


def _rms_g(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * (1.0 + w)).astype(x.dtype)


class Gemma3MMEngine:
    """Image-conditioned Gemma-3 generation on a Gemma3MMConfig."""

    def __init__(self, cfg, params, dtype: Any = jnp.float32,
                 weight_dtype: str = "native", vision_dtype: str = "native"):
        self.cfg = cfg
        self.lm = GemmaDecodeEngine(cfg.text, params, dtype=dtype,
                                    weight_dtype=weight_dtype)
        cast = lambda t: jax.tree.map(
            lambda p: jnp.asarray(p, dtype)
            if jnp.asarray(p).dtype == jnp.float32 else jnp.asarray(p), t)
        # Vision/projector params are passed INTO the jits as arguments
        # (never closed over): a closure would capture them as lowering
        # constants - 2+ GB of baked weights at 27B scale makes the
        # compile itself take tens of minutes.
        self.vision_params = cast(params["vision_tower"])
        if vision_dtype == "int8":
            # W8A8 SigLIP: every 2-D projection kernel becomes int8 codes
            # + per-channel scales (models/layers.dense consumes the dict,
            # int8 x int8 on the MXU at 2x the bf16 rate). At 27B the LM
            # in int4 (~14.6 GB) leaves <1 GB of a 16 GB v5e; halving the
            # 0.8 GB bf16 tower is what makes the MULTIMODAL serving path
            # (paged pool + prefill buffers) fit on one chip.
            from multimodal_colpali_tpu.ops.quant import (
                quantize_encoder_params)

            self.vision_params = jax.jit(quantize_encoder_params)(
                self.vision_params)
        elif vision_dtype != "native":
            raise ValueError(
                f"vision_dtype must be 'native' or 'int8', "
                f"got {vision_dtype!r}")
        self.projector_params = cast(params["multi_modal_projector"])
        self._jit_cache: Dict[Tuple, Any] = {}

    @property
    def _vp(self):
        return {"vision": self.vision_params, "proj": self.projector_params}

    # -- vision ----------------------------------------------------------------

    def _image_features(self, vp, pix: jax.Array) -> jax.Array:
        """[B, N, H, W, 3] -> [B, N * mm_tokens, text_hidden] soft tokens
        (HF Gemma3MultiModalProjector: avg-pool grid -> RMSNorm ->
        bias-free projection)."""
        from multimodal_colpali_tpu.models.siglip import SiglipVisionTower

        c = self.cfg
        if pix.ndim == 4:
            pix = pix[:, None]
        b, n_img = pix.shape[:2]
        vis = SiglipVisionTower(c.vision).apply(
            {"params": vp["vision"]},
            pix.reshape((b * n_img,) + pix.shape[2:]).astype(self.lm.dtype))
        side = c.vision.image_size // c.vision.patch_size
        tokens_side = int(c.mm_tokens_per_image ** 0.5)
        kernel = side // tokens_side
        v_h = vis.shape[-1]
        grid = vis.reshape(b * n_img, side, side, v_h)
        pooled = jax.lax.reduce_window(
            grid.astype(jnp.float32), 0.0, jax.lax.add,
            (1, kernel, kernel, 1), (1, kernel, kernel, 1), "VALID"
        ) / float(kernel * kernel)
        pooled = pooled.reshape(b * n_img, c.mm_tokens_per_image, v_h
                                ).astype(self.lm.dtype)
        normed = _rms_g(pooled,
                        vp["proj"]["mm_soft_emb_norm"]["weight"],
                        c.vision.layer_norm_eps)
        proj = jnp.einsum(
            "btv,vh->bth", normed.astype(jnp.float32),
            vp["proj"]["mm_input_projection"].astype(jnp.float32))
        return proj.reshape(b, n_img * c.mm_tokens_per_image, -1
                            ).astype(self.lm.dtype)

    def _merged_embeds(self, p, vp, ids: jax.Array,
                       pix: jax.Array) -> jax.Array:
        """Scaled text embeds with image soft tokens scattered into the
        <image> slots (HF: text embeds carry the sqrt(hidden) scale,
        image features do NOT get rescaled)."""
        c = self.cfg
        embeds = q_take(p["embed"]["embed_tokens"],
                        jnp.where(ids == c.image_token_id, 0, ids),
                        jnp.float32)
        scale = jnp.asarray(c.text.hidden_size ** 0.5, jnp.float32)
        embeds = (embeds * scale).astype(self.lm.dtype)
        img = self._image_features(vp, pix)
        is_img = ids == c.image_token_id
        img_pos = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0,
                           img.shape[1] - 1)
        gathered = jnp.take_along_axis(img, img_pos[..., None], axis=1)
        return jnp.where(is_img[..., None], gathered, embeds)

    # -- prefill masks ---------------------------------------------------------

    def _span_bidir(self, ids: jax.Array) -> jax.Array:
        """[B, S, S] True where query i may attend key j through the
        image-span override: both are image tokens of the SAME image."""
        is_img = ids == self.cfg.image_token_id
        starts = is_img & ~jnp.concatenate(
            [jnp.zeros_like(is_img[:, :1]), is_img[:, :-1]], axis=1)
        span = jnp.cumsum(starts.astype(jnp.int32), axis=1)
        span = jnp.where(is_img, span, -1)
        return (is_img[:, :, None] & is_img[:, None, :]
                & (span[:, :, None] == span[:, None, :]))

    def _prefill(self, p, vp, ids, mask, pix):
        """Whole-prompt prefill with the gemma3 layer masks + image-span
        bidirectional override. Returns (k, v, next-token logits,
        last position)."""
        c = self.cfg.text
        eng = self.lm
        b, s = ids.shape
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
        x = self._merged_embeds(p, vp, ids, pix)

        cols = jnp.arange(s)
        kv_valid = mask.astype(bool)[:, None, None, :]
        causal = (cols[None, :] <= cols[:, None])[None, None]
        bidir = self._span_bidir(ids)[:, None]
        base = kv_valid & (causal | bidir)
        sliding = kv_valid & ((causal
                               & (cols[None, :] > cols[:, None]
                                  - c.sliding_window)[None, None])
                              | bidir)
        types = c.layer_types_resolved
        sc = attn_scale(c)

        def kv_write(i, k, v):
            # the prefill covers every cache row, so the chunk IS the cache
            return k, v

        def attend(i, q, kcc, vcc):
            m = sliding if types[i] == "sliding_attention" else base
            return L.attention(q, kcc, vcc, mask=m, scale=sc)

        hidden, (k, v) = layer_stack(p, c, x, positions, kv_write, attend)
        return k, v, eng._logits(p, hidden[:, -1]), positions[:, -1]

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
            # widen the caches to the decode length
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
                pos = (last_pos + step)[:, None]
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

    def generate(self, prompts: Sequence[Sequence[int]], pixel_values,
                 max_new_tokens: int = 32, temperature: float = 0.0,
                 eos_id: int = -1, pad_id: int = 0, seed: int = 0,
                 bucket: int = 16, top_p: float = 1.0,
                 top_k: int = 0) -> List[List[int]]:
        """Image-conditioned continuations. ``prompts`` already contain
        the image-token spans (``build_mm_prompt``); ``pixel_values`` is
        [B, H, W, 3] or [B, N, H, W, 3]."""
        s = max(max(len(pr) for pr in prompts), 1)
        s = ((s + bucket - 1) // bucket) * bucket
        b = len(prompts)
        ids = np.full((b, s), pad_id, np.int32)
        mask = np.zeros((b, s), np.int32)
        for n, pr in enumerate(prompts):
            ids[n, -len(pr):] = pr
            mask[n, -len(pr):] = 1
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
        """Image-conditioned prefill-only logits [B, V] (the constrained
        enum surface the server's MCQ path uses)."""
        s = max(max(len(pr) for pr in prompts), 1)
        s = ((s + bucket - 1) // bucket) * bucket
        b = len(prompts)
        ids = np.full((b, s), pad_id, np.int32)
        mask = np.zeros((b, s), np.int32)
        for n, pr in enumerate(prompts):
            ids[n, -len(pr):] = pr
            mask[n, -len(pr):] = 1
        key = ("prefill", s)
        if key not in self._jit_cache:
            def run(p, vp, ids, mask, pix):
                _, _, logits, _ = self._prefill(p, vp, ids, mask, pix)
                return logits

            self._jit_cache[key] = jax.jit(run)
        return np.asarray(self._jit_cache[key](
            self.lm.params, self._vp, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(pixel_values)))

    def build_mm_prompt(self, text_ids: Sequence[int], bos_id: int = 2,
                        n_images: int = 1, newline_ids: Sequence[int] = (),
                        boi_id: int = -1, eoi_id: int = -1) -> List[int]:
        """Gemma-3 prompt layout: per image, an optional <start_of_image>
        marker, ``mm_tokens_per_image`` image tokens, and an optional
        <end_of_image> marker, then the text. (The HF processor inserts
        boi/eoi + double newlines via the chat template; pass the real
        marker ids for checkpoint use, or omit for structural tests.)"""
        c = self.cfg
        seq: List[int] = [bos_id]
        for _ in range(max(1, n_images)):
            if boi_id >= 0:
                seq.append(boi_id)
            seq += [c.image_token_id] * c.mm_tokens_per_image
            if eoi_id >= 0:
                seq.append(eoi_id)
        return seq + list(text_ids) + list(newline_ids)
