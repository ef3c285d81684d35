"""LLaVA-NeXT multimodal generation engine - the third old-model VLM.

The reference serves AdaptLLM/biomed-LLaVA-NeXT-Llama3-8B through a vLLM
container (00_run_docker_old_models.sh:41-52). Its LM (Llama-3-8B) decodes
through ``LlamaDecodeEngine``; this engine adds the vision path:

- **CLIP ViT-L/14-336 tower** (``models/clip.ClipFeatureTower``,
  feature layer -2, CLS dropped);
- **2-layer GELU projector** (HF ``LlavaNextMultiModalProjector``);
- **anyres packing** exactly as the granite retriever does it (granite
  IS LLaVA-NeXT architecture): base-image tokens, then the tiled spatial
  grid with an ``image_newline`` feature per row. For jit-stable shapes
  the serving layout pins images to the base square resolution with one
  tile == the base image (the same static deviation the ColGranite
  retriever documents: HF's unpad crop is skipped; on SQUARE pinpoints it
  is a mathematical no-op, which is what the parity test exploits);
- **plain sequential positions** and fully causal attention - simpler
  than both Gemma-3 MM (bidirectional spans) and Qwen2-VL (mrope): every
  token, image tokens included, advances the position by 1.

Generation plumbing (buckets, scan decode, batcher ``_prefill`` contract)
is inherited from ``Qwen2VLMMEngine``; only the vision path, position
rule, and prompt layout differ. Parity pinned to torch
``LlavaNextForConditionalGeneration`` (tests/test_llava_next_mm.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.generation.engine import LlamaDecodeEngine
from multimodal_colpali_tpu.generation.qwen2vl_mm import Qwen2VLMMEngine
from multimodal_colpali_tpu.models import layers as L
from multimodal_colpali_tpu.models.clip import (ClipFeatureTower,
                                                LlavaNextMMConfig)


class LlavaNextImagePreprocessor:
    """PIL images -> [N, H, W, 3] normalized rasters at the base square
    resolution (CLIP normalization constants; the static single-tile
    layout needs only the base image - the tile IS the base image)."""

    MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
    STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)

    def __init__(self, cfg: LlavaNextMMConfig):
        self.size = cfg.vision.image_size

    def __call__(self, images) -> np.ndarray:
        from PIL import Image

        out = []
        for im in images:
            if isinstance(im, Image.Image):
                arr = np.asarray(
                    im.convert("RGB").resize((self.size, self.size),
                                             Image.BICUBIC), np.float32)
            else:
                arr = np.asarray(im, np.float32)
            out.append((arr / 255.0 - self.MEAN) / self.STD)
        return np.stack(out)


class LlavaNextMMEngine(Qwen2VLMMEngine):
    """Image-conditioned LLaVA-NeXT generation. Inherits the generation
    plumbing from Qwen2VLMMEngine; overrides the vision path (CLIP tower
    + projector + anyres packing), the position rule (plain sequential),
    and the prompt layout (a single run of image tokens, no markers)."""

    image_rank = 3   # [H, W, 3] rasters (the batchers' single-image lift)

    def __init__(self, cfg: LlavaNextMMConfig, params,
                 dtype: Any = jnp.float32, weight_dtype: str = "native",
                 vision_dtype: str = "native"):
        self.cfg = cfg
        self.lm = LlamaDecodeEngine(cfg.text, params, dtype=dtype,
                                    weight_dtype=weight_dtype)
        from multimodal_colpali_tpu.ops.quant import (is_quantized,
                                                      is_quantized_int4)

        # pre-quantized subtrees (the leaf-streamed 8B random builder, or
        # a sibling engine's shared buffers) pass through UNCAST: their
        # f32 scales would degrade to bf16
        _q = lambda p: is_quantized(p) or is_quantized_int4(p)
        cast = lambda t: jax.tree.map(
            lambda p: p if _q(p)
            else jnp.asarray(p, dtype)
            if jnp.asarray(p).dtype == jnp.float32 else jnp.asarray(p),
            t, is_leaf=_q)
        self.vision_params = cast(params["vision_tower"])
        if vision_dtype == "int8":
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

    @property
    def tokens_per_image(self) -> int:
        return self.cfg.n_image_tokens

    # -- vision --------------------------------------------------------------

    def _image_features(self, vp, pix: jax.Array) -> jax.Array:
        """[B, N, H, W, 3] -> [B, N * n_image_tokens, text_hidden]:
        CLIP(-2) -> linear/GELU/linear projector -> static square anyres
        packing (base tokens + the base-as-tile with a newline per row -
        HF pack_image_features with one square tile, where unpad is a
        no-op)."""
        c = self.cfg
        if pix.ndim == 4:
            pix = pix[:, None]
        b, n_img = pix.shape[:2]
        vis = ClipFeatureTower(c.vision, c.vision_feature_layer).apply(
            {"params": vp["vision"]},
            pix.reshape((b * n_img,) + pix.shape[2:]).astype(self.lm.dtype))
        h = L.dense(vis, vp["proj"]["linear_1"]["kernel"],
                    vp["proj"]["linear_1"]["bias"])
        h = jax.nn.gelu(h, approximate=False)
        proj = L.dense(h, vp["proj"]["linear_2"]["kernel"],
                       vp["proj"]["linear_2"]["bias"])
        g = c.grid
        th = c.text.hidden_size
        newline = vp["proj"]["image_newline"].astype(proj.dtype)
        tile = proj.reshape(b * n_img, g, g, th)
        nl = jnp.broadcast_to(newline[None, None, None, :],
                              (b * n_img, g, 1, th))
        tile = jnp.concatenate([tile, nl], axis=2).reshape(
            b * n_img, g * (g + 1), th)
        feats = jnp.concatenate([proj, tile], axis=1)   # base first (HF)
        return feats.reshape(b, n_img * feats.shape[1], th
                             ).astype(self.lm.dtype)

    # _merged_embeds is inherited: unscaled q_take + in-order scatter is
    # exactly LLaVA's merge (Llama embeds carry no sqrt(hidden) scale).

    # -- prefill ---------------------------------------------------------------

    def _prefill(self, p, vp, ids, mask, pix):
        """Causal prefill with PLAIN sequential positions (image tokens
        advance by 1 like text - no mrope). Same return contract as the
        other mm engines."""
        c = self.cfg.text
        eng = self.lm
        b, s = ids.shape
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
        kcaches = tuple(
            jnp.zeros((b, s, c.num_key_value_heads, c.head_dim), eng.dtype)
            for _ in range(c.num_hidden_layers))
        x = self._merged_embeds(p, vp, ids, pix)
        hidden, (k, v) = eng._chunk(p, x, positions, kcaches, kcaches, 0,
                                    mask.astype(bool))
        return k, v, eng._logits(p, hidden[:, -1]), positions[:, -1]

    def build_mm_prompt(self, text_ids: Sequence[int], bos_id: int = -1,
                        n_images: int = 1,
                        newline_ids: Sequence[int] = ()) -> List[int]:
        """LLaVA-NeXT prompt layout: per image one run of
        ``n_image_tokens`` <image> tokens (the HF processor expands a
        single <image> placeholder to the packed count), then the text."""
        c = self.cfg
        seq: List[int] = [] if bos_id < 0 else [bos_id]
        for _ in range(max(1, n_images)):
            seq += [c.image_token_id] * self.tokens_per_image
        return seq + list(text_ids) + list(newline_ids)
