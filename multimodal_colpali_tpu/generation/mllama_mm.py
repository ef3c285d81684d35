"""Mllama (Llama-3.2-Vision) multimodal generation engine.

The reference serves AdaptLLM/biomed-Llama-3.2-11B-Vision-Instruct through
a vLLM container (/root/reference/00_run_docker_old_models.sh:8-22). Its
text stack splits into a plain Llama (the self-attention layers, served by
``LlamaDecodeEngine`` - HF skips cross layers on text-only inputs, so the
renumbered tree IS the text model) plus gated CROSS-attention layers that
this engine injects through ``engine.layer_stack``'s ``interleave`` seam:

- **Vision tower**: ``models/mllama.MllamaVisionTower`` (tiled ViT, local
  + gated global encoders, intermediate features) + the linear
  ``multi_modal_projector`` into LM width;
- **Cross KV computed ONCE** from the vision states (k_norm applied),
  then reused by the prefill AND every decode step - Mllama decode needs
  cross-attention at every token, unlike the merged-embedding VLMs;
- **Prompt layout**: ONE ``<|image|>`` token per image (vision tokens
  never enter the text sequence - the embed table's ``vocab_size + 8``
  rows cover the marker), plain sequential positions, fully causal;
- **Cross masks computed IN-JIT from the ids** (HF
  ``get_cross_attention_token_mask`` semantics for consecutive
  image-token groups): token p attends image i iff an ``<|image|>``
  token for i sits at a position <= p; rows attending NO image keep
  UNIFORM attention (HF zeroes their mask bias, not their weights) and
  their cross-MLP output is zeroed (``full_text_row_masked_out_mask``).

The static serving layout pins every image to ONE square tile
(aspect_ratio_id=1, the checkpoint's own [1, 1] layout - a supported
path of the real processor, not an approximation; multi-tile layouts are
a static-bucket extension). Parity pinned to torch
``MllamaForConditionalGeneration`` (tests/test_mllama_mm.py).

NOT batcher-compatible yet: the continuous batchers carry no per-slot
cross-KV state, so decode through them would silently drop the
cross-attention. ``batcher_compatible = False`` makes them refuse;
07_serve routes image requests through this engine's own jits and text
through the batchers.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.generation.engine import (LlamaDecodeEngine,
                                                      _lin, _rms_plain)
from multimodal_colpali_tpu.generation.qwen2vl_mm import Qwen2VLMMEngine
from multimodal_colpali_tpu.models import layers as L
from multimodal_colpali_tpu.models.mllama import (MllamaMMConfig,
                                                  MllamaVisionTower)


class MllamaImagePreprocessor:
    """PIL images -> [N, T, H, W, 3] normalized rasters at the engine's
    STATIC tile layout (CLIP normalization constants, the ones HF's
    MllamaImageProcessor uses).

    ``tiles=(1, 1)`` (default): the image stretches to the square tile.
    Multi-tile layouts ((2, 2) quadruples a document page's pixel
    budget) follow the HF processor's order of operations: aspect-
    preserving resize into the rows x cols canvas, zero-pad the RAW
    pixels bottom/right, THEN rescale+normalize (so padding lands at
    normalized black, exactly where HF's pad-before-normalize puts it),
    split row-major into tiles; unused tile slots stay 0.0 in
    normalized space (HF pads pixel_values arrays with zeros)."""

    MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
    STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)

    def __init__(self, cfg: MllamaMMConfig, tiles: Tuple[int, int] = (1, 1)):
        self.size = cfg.vision.image_size
        self.slots = cfg.vision.max_num_tiles
        self.tiles = (int(tiles[0]), int(tiles[1]))
        cfg.vision.aspect_ratio_id(self.tiles)   # validate

    def _canvas(self, im) -> np.ndarray:
        """RAW [rows*size, cols*size, 3] canvas (uint8 scale)."""
        from PIL import Image

        rows, cols = self.tiles
        ch, cw = rows * self.size, cols * self.size
        if not isinstance(im, Image.Image):
            im = Image.fromarray(np.asarray(im, np.uint8))
        im = im.convert("RGB")
        if (rows, cols) == (1, 1):
            return np.asarray(im.resize((cw, ch), Image.BICUBIC),
                              np.float32)
        scale = min(ch / im.height, cw / im.width)
        nh = max(1, int(round(im.height * scale)))
        nw = max(1, int(round(im.width * scale)))
        canvas = np.zeros((ch, cw, 3), np.float32)
        canvas[:nh, :nw] = np.asarray(
            im.resize((nw, nh), Image.BICUBIC), np.float32)
        return canvas

    def __call__(self, images) -> np.ndarray:
        rows, cols = self.tiles
        out = []
        for im in images:
            canvas = (self._canvas(im) / 255.0 - self.MEAN) / self.STD
            tiles = (canvas.reshape(rows, self.size, cols, self.size, 3)
                     .transpose(0, 2, 1, 3, 4)
                     .reshape(rows * cols, self.size, self.size, 3))
            stack = np.zeros((self.slots, self.size, self.size, 3),
                             np.float32)
            stack[:rows * cols] = tiles
            out.append(stack)
        return np.stack(out)


class MllamaMMEngine(Qwen2VLMMEngine):
    """Image-conditioned Llama-3.2-Vision generation. Inherits the
    generation plumbing (_pad_batch, generate, next_token_logits, jit
    cache) from Qwen2VLMMEngine; the vision path, cross-attention
    injection, and decode body are Mllama's own."""

    image_rank = 4        # [T, H, W, 3] tile stacks per image
    # Decode needs per-step cross-attention: batchers must carry per-slot
    # cross-KV pools and inject the cross blocks into their decode step.
    # The dense ContinuousBatcher does (supports_cross_decode); the
    # paged/speculative tiers refuse the engine instead of silently
    # dropping the cross path.
    cross_decode = True

    def __init__(self, cfg: MllamaMMConfig, params, dtype: Any = jnp.float32,
                 weight_dtype: str = "native", vision_dtype: str = "native",
                 tiles: Tuple[int, int] = (1, 1)):
        """``tiles=(rows, cols)`` picks the STATIC tile layout every image
        is packed into - one of the checkpoint's supported aspect ratios
        ((2, 2) gives document pages 4x the pixel budget of the single
        square tile). One layout per engine instance keeps the jit cache
        per shape; the batchers' cross pools size to it."""
        self.cfg = cfg
        self.tiles = (int(tiles[0]), int(tiles[1]))
        self.ar_id = cfg.vision.aspect_ratio_id(self.tiles)
        self.n_real_tiles = self.tiles[0] * self.tiles[1]
        self.lm = LlamaDecodeEngine(cfg.text, params, dtype=dtype,
                                    weight_dtype=weight_dtype)
        from multimodal_colpali_tpu.ops.quant import (is_quantized,
                                                      is_quantized_int4)

        # pre-quantized subtrees (the leaf-streamed 11B random builder,
        # or a sibling engine's shared quantized buffers) must pass
        # through UNCAST: their f32 scales would degrade to bf16
        _q = lambda p: is_quantized(p) or is_quantized_int4(p)
        cast = lambda t: jax.tree.map(
            lambda p: p if _q(p)
            else jnp.asarray(p, dtype)
            if jnp.asarray(p).dtype == jnp.float32 else jnp.asarray(p),
            t, is_leaf=_q)
        # vision/cross params ride INTO the jits as arguments (closure
        # capture would bake them into the lowering as constants)
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
        self.cross_params = cast(params["cross_layers"])
        self._jit_cache: Dict[Tuple, Any] = {}

    @property
    def _vp(self):
        return {"vision": self.vision_params, "proj": self.projector_params,
                "cross": self.cross_params}

    @property
    def tokens_per_image(self) -> int:
        return 1              # ONE <|image|> marker; no expanded block

    @property
    def cross_tokens_per_image(self) -> int:
        """Key length per image in the UNPACKED cross states (all tile
        slots, padding included - the prefill mask's granularity)."""
        c = self.cfg.vision
        return c.max_num_tiles * c.num_patches

    @property
    def packed_cross_tokens_per_image(self) -> int:
        """REAL-tile rows per image in the packed cross KV (the batchers'
        per-slot pool granularity)."""
        return self.n_real_tiles * self.cfg.vision.num_patches

    # -- vision ------------------------------------------------------------

    def _cross_states(self, vp, pix: jax.Array) -> jax.Array:
        """[B, N, T, H, W, 3] -> [B, N*T*P, text_hidden] projected vision
        states (the cross-attention keys' source). Every image sits at
        the engine's static tile layout (``tiles``): slots
        0..rows*cols-1 real, the rest zero-padded."""
        c = self.cfg
        if pix.ndim == 5:
            pix = pix[:, None]
        b, n_img, t = pix.shape[:3]
        flat = pix.reshape((b * n_img,) + pix.shape[2:]).astype(self.lm.dtype)
        ar_ids = jnp.full((b * n_img,), self.ar_id, jnp.int32)
        ar_mask = (jnp.arange(t)[None] < self.n_real_tiles
                   ).astype(jnp.int32).repeat(b * n_img, axis=0)
        feats = MllamaVisionTower(c.vision).apply(
            {"params": vp["vision"]}, flat, ar_ids, ar_mask)
        proj = L.dense(feats, vp["proj"]["kernel"], vp["proj"]["bias"])
        return proj.reshape(b, n_img * proj.shape[1], -1
                            ).astype(self.lm.dtype)

    def _cross_kv(self, vp, states: jax.Array):
        """Per cross layer: (k, v) [B, Skv, KV, head_dim], k_norm applied
        (HF MllamaTextCrossAttention computes these once per image set)."""
        c = self.cfg.text
        b, skv, _ = states.shape
        out = {}
        for g in self.cfg.cross_attention_layers:
            lp = vp["cross"][str(g)]["cross_attn"]
            k = _lin(states, lp["k_proj"]).reshape(
                b, skv, c.num_key_value_heads, c.head_dim)
            k = _rms_plain(k, lp["k_norm"]["weight"], c.rms_norm_eps)
            v = _lin(states, lp["v_proj"]).reshape(
                b, skv, c.num_key_value_heads, c.head_dim)
            out[g] = (k, v)
        return out

    # -- cross-attention decoder block --------------------------------------

    def _cross_block(self, lp, x, ck, cv, mask, full_row):
        """HF ``MllamaCrossAttentionDecoderLayer.forward``: gated
        cross-attention + gated MLP with full-row masking. ``mask`` is a
        boolean [B, 1, S, Skv] (True = attend; rows attending nothing are
        all-True = uniform, matching HF's zeroed bias) or None (decode
        steps attend everything); ``full_row`` is [B, S, 1] float (0 =
        this row attends no image -> cross-MLP output zeroed)."""
        c = self.cfg.text
        b, s, _ = x.shape
        y = _rms_plain(x, lp["input_layernorm"]["weight"], c.rms_norm_eps)
        q = _lin(y, lp["cross_attn"]["q_proj"]).reshape(
            b, s, c.num_attention_heads, c.head_dim)
        q = _rms_plain(q, lp["cross_attn"]["q_norm"]["weight"],
                       c.rms_norm_eps)
        att = L.attention(q, ck, cv, mask=mask, scale=c.head_dim ** -0.5)
        att = _lin(att.reshape(b, s, -1), lp["cross_attn"]["o_proj"])
        gate_a = jnp.tanh(lp["gate_attn"].astype(jnp.float32)).astype(x.dtype)
        x = x + gate_a * att
        y = _rms_plain(x, lp["post_attention_layernorm"]["weight"],
                       c.rms_norm_eps)
        mlp = _lin(jax.nn.silu(_lin(y, lp["mlp"]["gate_proj"]))
                   * _lin(y, lp["mlp"]["up_proj"]), lp["mlp"]["down_proj"])
        if full_row is not None:
            mlp = mlp * full_row.astype(mlp.dtype)
        gate_m = jnp.tanh(lp["gate_mlp"].astype(jnp.float32)).astype(x.dtype)
        return x + gate_m * mlp

    def _interleave(self, vp, ckv, mask, full_row):
        """{self_layer_idx: hook} for ``layer_stack`` - cross layers fire
        BEFORE the self layer their global index precedes (index ==
        num self layers -> after the last one). Consecutive cross layers
        mapping to one slot apply in global order."""
        slots: Dict[int, list] = {}
        for g, self_j in self.cfg.cross_schedule:
            slots.setdefault(self_j, []).append(g)

        def make(gs):
            def hook(x):
                for g in gs:
                    x = self._cross_block(vp["cross"][str(g)], x,
                                          ckv[g][0], ckv[g][1],
                                          mask, full_row)
                return x
            return hook

        return {j: make(gs) for j, gs in slots.items()}

    def _tile_pattern(self) -> jax.Array:
        """[T*P] bool: which of an image's vision tokens are REAL-tile
        keys in the engine's static layout (the HF processor's dense
        mask marks only ``num_tiles`` real tiles; padded tile slots stay
        masked for every row that attends the image)."""
        c = self.cfg.vision
        return (jnp.arange(c.max_num_tiles * c.num_patches)
                < self.n_real_tiles * c.num_patches)

    def _cross_masks(self, ids, mask, n_img: int):
        """In-jit HF mask semantics for consecutive image-token groups:
        token p attends image i iff image i's ``<|image|>`` token sits at
        a position <= p - and only i's REAL tiles. Returns (key mask
        [B, 1, S, Skv] bool, full_row [B, S, 1] float32)."""
        valid = mask.astype(bool)
        is_img = (ids == self.cfg.image_token_id) & valid
        n_seen = jnp.cumsum(is_img, axis=1)            # inclusive
        attends = (jnp.arange(n_img)[None, None]
                   < n_seen[:, :, None])               # [B, S, N]
        full_row = (n_seen > 0)
        keys = (attends[..., None] & self._tile_pattern()[None, None, None]
                ).reshape(ids.shape + (-1,))           # [B, S, N*T*P]
        # rows attending nothing keep UNIFORM attention over ALL keys
        # (HF zeroes the whole row's bias - padding tiles included -
        # instead of leaving -inf everywhere)
        keys = keys | ~full_row[:, :, None]
        return keys[:, None], full_row[:, :, None].astype(jnp.float32)

    # -- prefill -------------------------------------------------------------

    def _prefill(self, p, vp, ids, mask, pix):
        raise RuntimeError(
            "Mllama decode needs per-step cross-attention: use the "
            "cross-aware scheduler path (_prefill_cross + packed cross KV "
            "- ContinuousBatcher's cross_decode branch does this). A "
            "batcher calling the plain _prefill contract would silently "
            "drop the cross path from decode.")

    def packed_cross_kv(self, ckv, n_img: int):
        """{layer: (k, v) [B, n_img*T*P, KV, hd]} -> stacked REAL-tile
        rows ([n_cross, B, n_img*n_real*P, KV, hd] x2) for the batchers'
        per-slot cross pools (decode never attends padding-tile keys, so
        the pools store only the engine layout's real tiles)."""
        c = self.cfg.vision
        tp = c.max_num_tiles * c.num_patches
        p_real = self.n_real_tiles * c.num_patches

        def pack(a):
            b, skv = a.shape[:2]
            return a.reshape((b, n_img, tp) + a.shape[2:])[:, :, :p_real
                                                           ].reshape(
                (b, n_img * p_real) + a.shape[2:])

        ks = jnp.stack([pack(ckv[g][0])
                        for g in self.cfg.cross_attention_layers])
        vs = jnp.stack([pack(ckv[g][1])
                        for g in self.cfg.cross_attention_layers])
        return ks, vs

    def _prefill_cross(self, p, vp, ids, mask, pix):
        """Causal prefill with plain sequential positions and interleaved
        cross blocks. Returns (k, v, logits, last_pos, cross_kv)."""
        c = self.cfg.text
        eng = self.lm
        b, s = ids.shape
        if pix.ndim == 5:
            pix = pix[:, None]
        n_img = pix.shape[1]
        states = self._cross_states(vp, pix)
        ckv = self._cross_kv(vp, states)
        amask, full_row = self._cross_masks(ids, mask, n_img)
        inter = self._interleave(vp, ckv, amask, full_row)
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
        kcaches = tuple(
            jnp.zeros((b, s, c.num_key_value_heads, c.head_dim), eng.dtype)
            for _ in range(c.num_hidden_layers))
        x = eng._embed(p, ids)
        hidden, (k, v) = eng._chunk(p, x, positions, kcaches, kcaches, 0,
                                    mask.astype(bool), interleave=inter)
        return k, v, eng._logits(p, hidden[:, -1]), positions[:, -1], ckv

    # -- generation ----------------------------------------------------------

    def _build(self, s: int, max_new: int, temperature: float,
               eos_id: int, pad_id: int, top_p: float = 1.0, top_k: int = 0):
        from multimodal_colpali_tpu.generation.engine import (
            filter_top_p_top_k)

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
            k, v, logits, last_pos, ckv = self._prefill_cross(
                p, vp, ids, mask, pix)
            # decode-step cross hooks: every generated token attends ALL
            # images (it sits after every <|image|> marker; full_row=1)
            # but still only their REAL tiles
            n_img = pix.shape[1] if pix.ndim == 6 else 1
            dec_mask = jnp.tile(self._tile_pattern(),
                                (n_img,))[None, None, None]
            inter = self._interleave(vp, ckv, dec_mask, None)
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
                    p, x, pos, kc, vc, s + step - 1, kv_valid,
                    interleave=inter)
                nxt = sample(eng._logits(p, hidden[:, -1]), rng, step)
                nxt = jnp.where(done, jnp.int32(pad_id), nxt)
                done = done | (nxt == eos_id)
                return (kc, vc, nxt, done), nxt

            (_, _, _, _), rest = jax.lax.scan(
                body, (kcaches, vcaches, tok, done),
                jnp.arange(1, max_new), length=max_new - 1)
            return jnp.concatenate([tok[:, None], rest.T], axis=1)

        return jax.jit(run)

    def next_token_logits(self, prompts: Sequence[Sequence[int]],
                          pixel_values, pad_id: int = 0,
                          bucket: int = 16) -> np.ndarray:
        """Image-conditioned prefill-only logits [B, V] (the server's
        constrained-enum MCQ surface)."""
        ids, mask, s = self._pad_batch(prompts, bucket, pad_id)
        key = ("prefill", s)
        if key not in self._jit_cache:
            def run(p, vp, ids, mask, pix):
                _, _, logits, _, _ = self._prefill_cross(p, vp, ids, mask,
                                                         pix)
                return logits

            self._jit_cache[key] = jax.jit(run)
        return np.asarray(self._jit_cache[key](
            self.lm.params, self._vp, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(pixel_values)))

    def build_mm_prompt(self, text_ids: Sequence[int], bos_id: int = -1,
                        n_images: int = 1,
                        newline_ids: Sequence[int] = ()) -> List[int]:
        """Mllama prompt layout: ONE ``<|image|>`` token per image, then
        the text (consecutive markers form a group - every token after
        them attends all the images, HF get_cross_attention_token_mask).
        A leading BOS attends no image: its cross rows run the uniform-
        attention + zeroed-MLP path, exactly as HF computes them."""
        c = self.cfg
        seq: List[int] = [] if bos_id < 0 else [bos_id]
        seq += [c.image_token_id] * max(1, n_images)
        return seq + list(text_ids) + list(newline_ids)
