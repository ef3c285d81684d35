"""HuggingFace checkpoint -> flax parameter conversion.

Ports torch/safetensors weights of the reference's retrievers into the TPU
models (the reference loads them with torch at functions.py:1464-1477 and
01_create_context_qdrant.py:163-205). Conversion is pure array reshuffling:
``nn.Linear.weight`` is ``[out, in]`` -> flax kernel ``[in, out]``;
``Conv2d.weight`` is ``[out, in, kh, kw]`` -> flax ``[kh, kw, in, out]``.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict

import numpy as np

from multimodal_colpali_tpu.models.configs import BertConfig, ColPaliModelConfig


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _lin(sd: Dict[str, Any], prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if bias and prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _ln(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"weight": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _rms(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"weight": _np(sd[prefix + ".weight"])}


def colpali_params_from_hf(sd: Dict[str, Any], cfg: ColPaliModelConfig) -> Dict[str, Any]:
    """Convert a ``ColPaliForRetrieval`` state dict to the flax param tree.

    Accepts both the transformers layout (``vlm.model...``) and the
    colpali-engine layout (``model...``) by normalizing prefixes first.
    """
    # Normalize key prefixes.
    norm: Dict[str, Any] = {}
    for k, v in sd.items():
        k = re.sub(r"^(vlm\.)?model\.", "", k)
        k = re.sub(r"^custom_text_proj\.", "embedding_proj_layer.", k)
        norm[k] = v
    sd = norm

    vt = "vision_tower.vision_model."
    vision: Dict[str, Any] = {
        "patch_embedding": {
            "kernel": _np(sd[vt + "embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[vt + "embeddings.patch_embedding.bias"]),
        },
        "position_embedding": _np(sd[vt + "embeddings.position_embedding.weight"]),
        "post_layernorm": _ln(sd, vt + "post_layernorm"),
    }
    for i in range(cfg.vision.num_hidden_layers):
        p = f"{vt}encoder.layers.{i}."
        vision[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _lin(sd, p + "self_attn.q_proj"),
                "k_proj": _lin(sd, p + "self_attn.k_proj"),
                "v_proj": _lin(sd, p + "self_attn.v_proj"),
                "out_proj": _lin(sd, p + "self_attn.out_proj"),
            },
            "layer_norm1": _ln(sd, p + "layer_norm1"),
            "layer_norm2": _ln(sd, p + "layer_norm2"),
            "mlp": {"fc1": _lin(sd, p + "mlp.fc1"), "fc2": _lin(sd, p + "mlp.fc2")},
        }

    lm = "language_model."
    language: Dict[str, Any] = {"norm": _rms(sd, lm + "norm")}
    for i in range(cfg.text.num_hidden_layers):
        p = f"{lm}layers.{i}."
        language[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _lin(sd, p + "self_attn.q_proj", bias=False),
                "k_proj": _lin(sd, p + "self_attn.k_proj", bias=False),
                "v_proj": _lin(sd, p + "self_attn.v_proj", bias=False),
                "o_proj": _lin(sd, p + "self_attn.o_proj", bias=False),
            },
            "mlp": {
                "gate_proj": _lin(sd, p + "mlp.gate_proj", bias=False),
                "up_proj": _lin(sd, p + "mlp.up_proj", bias=False),
                "down_proj": _lin(sd, p + "mlp.down_proj", bias=False),
            },
            "input_layernorm": _rms(sd, p + "input_layernorm"),
            "post_attention_layernorm": _rms(sd, p + "post_attention_layernorm"),
        }

    return {
        "embed": {"embed_tokens": _np(sd[lm + "embed_tokens.weight"])},
        "vision_tower": vision,
        "multi_modal_projector": _lin(sd, "multi_modal_projector.linear"),
        "language_model": language,
        "embedding_proj_layer": _lin(sd, "embedding_proj_layer"),
    }


def colqwen2_params_from_hf(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Convert a ``ColQwen2ForRetrieval`` state dict to the flax param tree."""
    norm: Dict[str, Any] = {}
    for k, v in sd.items():
        k = re.sub(r"^(vlm\.)?model\.", "", k)
        k = re.sub(r"^custom_text_proj\.", "embedding_proj_layer.", k)
        norm[k] = v
    sd = norm

    is_25 = getattr(cfg.vision, "variant", "qwen2") == "qwen2_5"
    norm_fn = _rms if is_25 else _ln
    visual: Dict[str, Any] = {
        "patch_embed": {"kernel": _np(sd["visual.patch_embed.proj.weight"])
                        .reshape(cfg.vision.embed_dim, -1).T},
        "ln_q": norm_fn(sd, "visual.merger.ln_q"),
        "merger_fc1": _lin(sd, "visual.merger.mlp.0"),
        "merger_fc2": _lin(sd, "visual.merger.mlp.2"),
    }
    for i in range(cfg.vision.depth):
        p = f"visual.blocks.{i}."
        block = {
            "norm1": norm_fn(sd, p + "norm1"),
            "norm2": norm_fn(sd, p + "norm2"),
            "qkv": _lin(sd, p + "attn.qkv"),
            "attn_proj": _lin(sd, p + "attn.proj"),
        }
        if is_25:
            block["gate_proj"] = _lin(sd, p + "mlp.gate_proj")
            block["up_proj"] = _lin(sd, p + "mlp.up_proj")
            block["down_proj"] = _lin(sd, p + "mlp.down_proj")
        else:
            block["fc1"] = _lin(sd, p + "mlp.fc1")
            block["fc2"] = _lin(sd, p + "mlp.fc2")
        visual[f"blocks_{i}"] = block

    params: Dict[str, Any] = {
        "embed_tokens": _np(sd["language_model.embed_tokens.weight"]),
        "visual": visual,
        "norm": _rms(sd, "language_model.norm"),
    }
    if "embedding_proj_layer.weight" in sd:
        params["embedding_proj_layer"] = _lin(sd, "embedding_proj_layer")
    for i in range(cfg.text.num_hidden_layers):
        p = f"language_model.layers.{i}."
        params[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _lin(sd, p + "self_attn.q_proj"),
                "k_proj": _lin(sd, p + "self_attn.k_proj"),
                "v_proj": _lin(sd, p + "self_attn.v_proj"),
                "o_proj": _lin(sd, p + "self_attn.o_proj", bias=False),
            },
            "gate_proj": _lin(sd, p + "mlp.gate_proj", bias=False),
            "up_proj": _lin(sd, p + "mlp.up_proj", bias=False),
            "down_proj": _lin(sd, p + "mlp.down_proj", bias=False),
            "input_layernorm": _rms(sd, p + "input_layernorm"),
            "post_attention_layernorm": _rms(sd, p + "post_attention_layernorm"),
        }
    return params


def qwen2vl_lm_params_from_hf(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Convert a ``Qwen2VLForConditionalGeneration`` state dict (the
    reference's old-model class AdaptLLM/biomed-Qwen2-VL-2B-Instruct,
    00_run_docker_old_models.sh:24-38) to the decode-engine tree
    ``{"embed", "language_model", "visual"}``. ``cfg`` is a
    ColQwen2ModelConfig; the per-layer layout mirrors the Gemma engine
    tree (mlp nested) so quantization/TP walkers apply unchanged."""
    flat = colqwen2_params_from_hf(sd, cfg)
    lm: Dict[str, Any] = {"norm": flat["norm"]}
    for i in range(cfg.text.num_hidden_layers):
        li = flat[f"layers_{i}"]
        lm[f"layers_{i}"] = {
            "self_attn": li["self_attn"],
            "mlp": {"gate_proj": li["gate_proj"], "up_proj": li["up_proj"],
                    "down_proj": li["down_proj"]},
            "input_layernorm": li["input_layernorm"],
            "post_attention_layernorm": li["post_attention_layernorm"],
        }
    if not cfg.text.tie_word_embeddings:
        lm["lm_head"] = {"kernel": _np(sd["lm_head.weight"]).T}
    return {"embed": {"embed_tokens": flat["embed_tokens"]},
            "language_model": lm, "visual": flat["visual"]}


def llama_lm_params_from_hf(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Convert a Llama-family LM state dict to the decode-engine tree
    ``{"embed", "language_model"}``. Accepts bare ``LlamaForCausalLM``
    checkpoints AND the LM nested inside ``LlavaNextForConditionalGeneration``
    (the reference's old-model AdaptLLM/biomed-LLaVA-NeXT-Llama3-8B,
    00_run_docker_old_models.sh:41-52) - non-LM subtrees (vision tower,
    projector) are ignored here. Projections carry no biases; the layer
    layout mirrors the Gemma/Qwen2 engine trees (mlp nested) so the
    quantization/TP walkers apply unchanged."""
    norm: Dict[str, Any] = {}
    for k, v in sd.items():
        k = re.sub(r"^model\.", "", k)
        k = re.sub(r"^language_model\.(model\.)?", "", k)
        norm[k] = v
    sd = norm

    lm: Dict[str, Any] = {"norm": _rms(sd, "norm")}
    for i in range(cfg.num_hidden_layers):
        p = f"layers.{i}."
        lm[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _lin(sd, p + "self_attn.q_proj", bias=False),
                "k_proj": _lin(sd, p + "self_attn.k_proj", bias=False),
                "v_proj": _lin(sd, p + "self_attn.v_proj", bias=False),
                "o_proj": _lin(sd, p + "self_attn.o_proj", bias=False),
            },
            "mlp": {
                "gate_proj": _lin(sd, p + "mlp.gate_proj", bias=False),
                "up_proj": _lin(sd, p + "mlp.up_proj", bias=False),
                "down_proj": _lin(sd, p + "mlp.down_proj", bias=False),
            },
            "input_layernorm": _rms(sd, p + "input_layernorm"),
            "post_attention_layernorm": _rms(sd,
                                             p + "post_attention_layernorm"),
        }
    if not cfg.tie_word_embeddings:
        lm["lm_head"] = {"kernel": _np(sd["lm_head.weight"]).T}
    return {"embed": {"embed_tokens": _np(sd["embed_tokens.weight"])},
            "language_model": lm}


def llava_next_params_from_hf(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Convert a ``LlavaNextForConditionalGeneration`` state dict (the
    reference's old-model AdaptLLM/biomed-LLaVA-NeXT-Llama3-8B,
    00_run_docker_old_models.sh:41-52) to the mm-engine tree
    ``{"embed", "language_model", "vision_tower", "multi_modal_projector"}``.
    The LM converts through ``llama_lm_params_from_hf``; the CLIP tower
    keeps only the layers up to the feature layer's depth (the engine
    never runs the tail); ``image_newline`` rides in the projector dict."""
    out = llama_lm_params_from_hf(sd, cfg.text)

    norm: Dict[str, Any] = {}
    for k, v in sd.items():
        norm[re.sub(r"^model\.", "", k)] = v
    sd = norm

    vt = "vision_tower.vision_model."
    vision: Dict[str, Any] = {
        "patch_embedding": {
            "kernel": _np(sd[vt + "embeddings.patch_embedding.weight"]
                          ).transpose(2, 3, 1, 0)},   # CLIP conv: no bias
        "class_embedding": _np(sd[vt + "embeddings.class_embedding"]),
        "position_embedding": _np(
            sd[vt + "embeddings.position_embedding.weight"]),
        "pre_layrnorm": _ln(sd, vt + "pre_layrnorm"),
    }
    n = cfg.vision.num_hidden_layers
    stop = (n + 1 + cfg.vision_feature_layer if cfg.vision_feature_layer < 0
            else cfg.vision_feature_layer)
    for i in range(min(stop, n)):
        p = f"{vt}encoder.layers.{i}."
        vision[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _lin(sd, p + "self_attn.q_proj"),
                "k_proj": _lin(sd, p + "self_attn.k_proj"),
                "v_proj": _lin(sd, p + "self_attn.v_proj"),
                "out_proj": _lin(sd, p + "self_attn.out_proj"),
            },
            "layer_norm1": _ln(sd, p + "layer_norm1"),
            "layer_norm2": _ln(sd, p + "layer_norm2"),
            "mlp": {"fc1": _lin(sd, p + "mlp.fc1"),
                    "fc2": _lin(sd, p + "mlp.fc2")},
        }
    out["vision_tower"] = vision
    out["multi_modal_projector"] = {
        "linear_1": _lin(sd, "multi_modal_projector.linear_1"),
        "linear_2": _lin(sd, "multi_modal_projector.linear_2"),
        "image_newline": _np(sd["image_newline"]),
    }
    return out


def mllama_params_from_hf(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Convert a ``MllamaForConditionalGeneration`` state dict (the
    reference's old-model AdaptLLM/biomed-Llama-3.2-11B-Vision-Instruct,
    00_run_docker_old_models.sh:8-22) to the mm-engine tree
    ``{"embed", "language_model", "cross_layers", "vision_tower",
    "multi_modal_projector"}``.

    The interleaved 40-layer text stack splits in two: SELF-attention
    layers renumber densely to ``language_model.layers_0..n-1`` (this IS
    a plain Llama - HF skips cross layers on text-only inputs, so the
    renumbered tree serves text through ``LlamaDecodeEngine`` exactly);
    CROSS-attention layers keep their GLOBAL index under
    ``cross_layers``. The embed table keeps HF's ``vocab_size + 8`` rows
    (<|image|> and friends live past the lm_head vocab)."""
    norm: Dict[str, Any] = {}
    for k, v in sd.items():
        k = re.sub(r"^model\.", "", k)
        k = re.sub(r"^language_model\.model\.", "language_model.", k)
        norm[k] = v
    sd = norm

    cross_set = set(cfg.cross_attention_layers)
    lm: Dict[str, Any] = {"norm": _rms(sd, "language_model.norm")}
    cross: Dict[str, Any] = {}
    self_idx = 0
    for g in range(cfg.total_layers):
        p = f"language_model.layers.{g}."
        if g in cross_set:
            cross[f"{g}"] = {
                "cross_attn": {
                    "q_proj": _lin(sd, p + "cross_attn.q_proj", bias=False),
                    "k_proj": _lin(sd, p + "cross_attn.k_proj", bias=False),
                    "v_proj": _lin(sd, p + "cross_attn.v_proj", bias=False),
                    "o_proj": _lin(sd, p + "cross_attn.o_proj", bias=False),
                    "q_norm": _rms(sd, p + "cross_attn.q_norm"),
                    "k_norm": _rms(sd, p + "cross_attn.k_norm"),
                },
                "input_layernorm": _rms(sd, p + "input_layernorm"),
                "post_attention_layernorm": _rms(
                    sd, p + "post_attention_layernorm"),
                "mlp": {
                    "gate_proj": _lin(sd, p + "mlp.gate_proj", bias=False),
                    "up_proj": _lin(sd, p + "mlp.up_proj", bias=False),
                    "down_proj": _lin(sd, p + "mlp.down_proj", bias=False),
                },
                "gate_attn": _np(sd[p + "cross_attn_attn_gate"]),
                "gate_mlp": _np(sd[p + "cross_attn_mlp_gate"]),
            }
            continue
        lm[f"layers_{self_idx}"] = {
            "self_attn": {
                "q_proj": _lin(sd, p + "self_attn.q_proj", bias=False),
                "k_proj": _lin(sd, p + "self_attn.k_proj", bias=False),
                "v_proj": _lin(sd, p + "self_attn.v_proj", bias=False),
                "o_proj": _lin(sd, p + "self_attn.o_proj", bias=False),
            },
            "mlp": {
                "gate_proj": _lin(sd, p + "mlp.gate_proj", bias=False),
                "up_proj": _lin(sd, p + "mlp.up_proj", bias=False),
                "down_proj": _lin(sd, p + "mlp.down_proj", bias=False),
            },
            "input_layernorm": _rms(sd, p + "input_layernorm"),
            "post_attention_layernorm": _rms(
                sd, p + "post_attention_layernorm"),
        }
        self_idx += 1
    assert self_idx == cfg.text.num_hidden_layers
    if not cfg.text.tie_word_embeddings:
        lm["lm_head"] = {"kernel": _np(sd["lm_head.weight"]).T}

    vt = "vision_model."
    c = cfg.vision
    vision: Dict[str, Any] = {
        "patch_embedding": {
            "kernel": _np(sd[vt + "patch_embedding.weight"]
                          ).transpose(2, 3, 1, 0)},
        "class_embedding": _np(sd[vt + "class_embedding"]),
        "pos_embedding": _np(sd[vt + "gated_positional_embedding.embedding"]),
        "pos_gate": _np(sd[vt + "gated_positional_embedding.gate"]),
        "tile_pos_embedding": _np(
            sd[vt + "gated_positional_embedding.tile_embedding.weight"]),
        "pre_tile_embedding": _np(
            sd[vt + "pre_tile_positional_embedding.embedding.weight"]),
        "pre_tile_gate": _np(sd[vt + "pre_tile_positional_embedding.gate"]),
        "post_tile_embedding": _np(
            sd[vt + "post_tile_positional_embedding.embedding.weight"]),
        "post_tile_gate": _np(sd[vt + "post_tile_positional_embedding.gate"]),
        "layernorm_pre": _ln(sd, vt + "layernorm_pre"),
        "layernorm_post": _ln(sd, vt + "layernorm_post"),
    }

    def _vlayer(prefix: str, gated: bool) -> Dict[str, Any]:
        out = {
            "self_attn": {
                "q_proj": _lin(sd, prefix + "self_attn.q_proj", bias=False),
                "k_proj": _lin(sd, prefix + "self_attn.k_proj", bias=False),
                "v_proj": _lin(sd, prefix + "self_attn.v_proj", bias=False),
                "o_proj": _lin(sd, prefix + "self_attn.o_proj", bias=False),
            },
            "input_layernorm": _ln(sd, prefix + "input_layernorm"),
            "post_attention_layernorm": _ln(
                sd, prefix + "post_attention_layernorm"),
            "fc1": _lin(sd, prefix + "mlp.fc1"),
            "fc2": _lin(sd, prefix + "mlp.fc2"),
        }
        if gated:
            out["gate_attn"] = _np(sd[prefix + "gate_attn"])
            out["gate_ffn"] = _np(sd[prefix + "gate_ffn"])
        return out

    for i in range(c.num_hidden_layers):
        vision[f"local_{i}"] = _vlayer(f"{vt}transformer.layers.{i}.", False)
    for i in range(c.num_global_layers):
        vision[f"global_{i}"] = _vlayer(
            f"{vt}global_transformer.layers.{i}.", True)

    return {
        "embed": {"embed_tokens": _np(
            sd["language_model.embed_tokens.weight"])},
        "language_model": lm,
        "cross_layers": cross,
        "vision_tower": vision,
        "multi_modal_projector": _lin(sd, "multi_modal_projector"),
    }


def colflor_params_from_hf(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Convert a Florence-2 / ColFlor state dict to the flax param tree.

    Consumes the encoder stack only (vision tower, projector, BART encoder);
    decoder/lm_head keys are ignored. The retrieval head is accepted under
    either ``embedding_proj_layer`` or colpali-engine's ``custom_text_proj``.
    """
    norm: Dict[str, Any] = {}
    for k, v in sd.items():
        k = re.sub(r"^(vlm\.)?model\.", "", k)
        k = re.sub(r"^custom_text_proj\.", "embedding_proj_layer.", k)
        norm[k] = v
    sd = norm

    def conv(prefix):
        return {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0),
                "bias": _np(sd[prefix + ".bias"])}

    v = cfg.vision
    vision: Dict[str, Any] = {}
    for stage in range(len(v.depths)):
        vision[f"convs_{stage}"] = {
            "conv": conv(f"vision_tower.convs.{stage}.conv"),
            "norm": _ln(sd, f"vision_tower.convs.{stage}.norm"),
        }
        for d in range(v.depths[stage]):
            for kind, attn_key, attn_name in (
                ("spatial", "window_attn", "window_attn"),
                ("channel", "channel_attn", "channel_attn"),
            ):
                p = f"vision_tower.blocks.{stage}.{d}.{kind}_block."
                vision[f"blocks_{stage}_{d}_{kind}"] = {
                    "conv1": {"conv": conv(p + "conv1")},
                    "norm1": _ln(sd, p + "norm1"),
                    attn_name: {
                        "qkv": _lin(sd, p + f"{attn_key}.qkv"),
                        "proj": _lin(sd, p + f"{attn_key}.proj"),
                    },
                    "conv2": {"conv": conv(p + "conv2")},
                    "norm2": _ln(sd, p + "norm2"),
                    "ffn": {"fc1": _lin(sd, p + "ffn.fc1"),
                            "fc2": _lin(sd, p + "ffn.fc2")},
                }

    projector = {
        "image_projection": _lin(sd, "multi_modal_projector.image_projection",
                                 bias=False),
        "image_proj_norm": _ln(sd, "multi_modal_projector.image_proj_norm"),
        "row_embeddings": _np(
            sd["multi_modal_projector.image_position_embed.row_embeddings.weight"]),
        "column_embeddings": _np(
            sd["multi_modal_projector.image_position_embed.column_embeddings.weight"]),
    }

    enc = "language_model.encoder."
    params: Dict[str, Any] = {
        "embed_tokens": _np(sd[enc + "embed_tokens.weight"]),
        "embed_positions": _np(sd[enc + "embed_positions.weight"]),
        "layernorm_embedding": _ln(sd, enc + "layernorm_embedding"),
        "vision_tower": vision,
        "multi_modal_projector": projector,
    }
    for i in range(cfg.text.encoder_layers):
        p = f"{enc}layers.{i}."
        params[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _lin(sd, p + "self_attn.q_proj"),
                "k_proj": _lin(sd, p + "self_attn.k_proj"),
                "v_proj": _lin(sd, p + "self_attn.v_proj"),
                "out_proj": _lin(sd, p + "self_attn.out_proj"),
            },
            "self_attn_layer_norm": _ln(sd, p + "self_attn_layer_norm"),
            "fc1": _lin(sd, p + "fc1"),
            "fc2": _lin(sd, p + "fc2"),
            "final_layer_norm": _ln(sd, p + "final_layer_norm"),
        }
    if "embedding_proj_layer.weight" in sd:
        params["embedding_proj_layer"] = _lin(sd, "embedding_proj_layer")
    return params


def colidefics3_params_from_hf(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Convert an Idefics3/SmolVLM (ColIdefics3) state dict to flax params."""
    norm: Dict[str, Any] = {}
    for k, v in sd.items():
        k = re.sub(r"^(vlm\.)?model\.", "", k)
        k = re.sub(r"^custom_text_proj\.", "embedding_proj_layer.", k)
        norm[k] = v
    sd = norm

    vt = "vision_model."
    vision: Dict[str, Any] = {
        "patch_embedding": {
            "kernel": _np(sd[vt + "embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[vt + "embeddings.patch_embedding.bias"]),
        },
        "position_embedding": _np(sd[vt + "embeddings.position_embedding.weight"]),
        "post_layernorm": _ln(sd, vt + "post_layernorm"),
    }
    for i in range(cfg.vision.num_hidden_layers):
        p = f"{vt}encoder.layers.{i}."
        vision[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _lin(sd, p + "self_attn.q_proj"),
                "k_proj": _lin(sd, p + "self_attn.k_proj"),
                "v_proj": _lin(sd, p + "self_attn.v_proj"),
                "out_proj": _lin(sd, p + "self_attn.out_proj"),
            },
            "layer_norm1": _ln(sd, p + "layer_norm1"),
            "layer_norm2": _ln(sd, p + "layer_norm2"),
            "mlp": {"fc1": _lin(sd, p + "mlp.fc1"), "fc2": _lin(sd, p + "mlp.fc2")},
        }

    params: Dict[str, Any] = {
        "embed_tokens": _np(sd["text_model.embed_tokens.weight"]),
        "vision_model": vision,
        "modality_projection": _lin(sd, "connector.modality_projection.proj",
                                    bias=False),
        "norm": _rms(sd, "text_model.norm"),
    }
    for i in range(cfg.text.num_hidden_layers):
        p = f"text_model.layers.{i}."
        params[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _lin(sd, p + "self_attn.q_proj", bias=False),
                "k_proj": _lin(sd, p + "self_attn.k_proj", bias=False),
                "v_proj": _lin(sd, p + "self_attn.v_proj", bias=False),
                "o_proj": _lin(sd, p + "self_attn.o_proj", bias=False),
            },
            "gate_proj": _lin(sd, p + "mlp.gate_proj", bias=False),
            "up_proj": _lin(sd, p + "mlp.up_proj", bias=False),
            "down_proj": _lin(sd, p + "mlp.down_proj", bias=False),
            "input_layernorm": _rms(sd, p + "input_layernorm"),
            "post_attention_layernorm": _rms(sd, p + "post_attention_layernorm"),
        }
    if "embedding_proj_layer.weight" in sd:
        params["embedding_proj_layer"] = _lin(sd, "embedding_proj_layer")
    return params


def colgranite_params_from_hf(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Convert a granite-vision / LLaVA-Next state dict to flax params.

    The SigLIP post_layernorm and attention-pool head are skipped: LLaVA-Next
    extracts features from an encoder layer before them.
    """
    norm: Dict[str, Any] = {}
    for k, v in sd.items():
        k = re.sub(r"^(vlm\.)?model\.", "", k)
        k = re.sub(r"^custom_text_proj\.", "embedding_proj_layer.", k)
        norm[k] = v
    sd = norm

    vt = "vision_tower.vision_model."
    vision: Dict[str, Any] = {
        "patch_embedding": {
            "kernel": _np(sd[vt + "embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[vt + "embeddings.patch_embedding.bias"]),
        },
        "position_embedding": _np(sd[vt + "embeddings.position_embedding.weight"]),
    }
    n_layers = cfg.vision.num_hidden_layers
    stop = (n_layers + 1 + cfg.vision_feature_layer
            if cfg.vision_feature_layer < 0 else cfg.vision_feature_layer)
    for i in range(min(stop, n_layers)):
        p = f"{vt}encoder.layers.{i}."
        vision[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _lin(sd, p + "self_attn.q_proj"),
                "k_proj": _lin(sd, p + "self_attn.k_proj"),
                "v_proj": _lin(sd, p + "self_attn.v_proj"),
                "out_proj": _lin(sd, p + "self_attn.out_proj"),
            },
            "layer_norm1": _ln(sd, p + "layer_norm1"),
            "layer_norm2": _ln(sd, p + "layer_norm2"),
            "mlp": {"fc1": _lin(sd, p + "mlp.fc1"), "fc2": _lin(sd, p + "mlp.fc2")},
        }

    params: Dict[str, Any] = {
        "embed_tokens": _np(sd["language_model.embed_tokens.weight"]),
        "vision_tower": vision,
        "projector_linear_1": _lin(sd, "multi_modal_projector.linear_1"),
        "projector_linear_2": _lin(sd, "multi_modal_projector.linear_2"),
        "image_newline": _np(sd["image_newline"]),
        "norm": _rms(sd, "language_model.norm"),
    }
    for i in range(cfg.text.num_hidden_layers):
        p = f"language_model.layers.{i}."
        params[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _lin(sd, p + "self_attn.q_proj", bias=False),
                "k_proj": _lin(sd, p + "self_attn.k_proj", bias=False),
                "v_proj": _lin(sd, p + "self_attn.v_proj", bias=False),
                "o_proj": _lin(sd, p + "self_attn.o_proj", bias=False),
            },
            "gate_proj": _lin(sd, p + "mlp.gate_proj", bias=False),
            "up_proj": _lin(sd, p + "mlp.up_proj", bias=False),
            "down_proj": _lin(sd, p + "mlp.down_proj", bias=False),
            "input_layernorm": _rms(sd, p + "input_layernorm"),
            "post_attention_layernorm": _rms(sd, p + "post_attention_layernorm"),
        }
    if "embedding_proj_layer.weight" in sd:
        params["embedding_proj_layer"] = _lin(sd, "embedding_proj_layer")
    return params


def bert_params_from_hf(sd: Dict[str, Any], cfg: BertConfig) -> Dict[str, Any]:
    """Convert a ``BertModel`` state dict (bge-base) to the flax param tree."""
    norm: Dict[str, Any] = {}
    for k, v in sd.items():
        norm[re.sub(r"^bert\.", "", k)] = v
    sd = norm

    params: Dict[str, Any] = {
        "word_embeddings": _np(sd["embeddings.word_embeddings.weight"]),
        "position_embeddings": _np(sd["embeddings.position_embeddings.weight"]),
        "token_type_embeddings": _np(sd["embeddings.token_type_embeddings.weight"]),
        "embeddings_layernorm": _ln(sd, "embeddings.LayerNorm"),
    }
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}."
        params[f"layers_{i}"] = {
            "attention": {
                "query": _lin(sd, p + "attention.self.query"),
                "key": _lin(sd, p + "attention.self.key"),
                "value": _lin(sd, p + "attention.self.value"),
            },
            "attention_output": _lin(sd, p + "attention.output.dense"),
            "attention_layernorm": _ln(sd, p + "attention.output.LayerNorm"),
            "intermediate": _lin(sd, p + "intermediate.dense"),
            "output": _lin(sd, p + "output.dense"),
            "output_layernorm": _ln(sd, p + "output.LayerNorm"),
        }
    return params


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint directory or file into a flat numpy state dict.

    Supports ``*.safetensors`` (single or sharded) and torch ``*.bin``.
    """
    sd: Dict[str, np.ndarray] = {}
    files = []
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith((".safetensors", ".bin"))
        )
    else:
        files = [path]
    for f in files:
        if f.endswith(".safetensors"):
            from safetensors.numpy import load_file
            sd.update(load_file(f))
        else:
            import torch
            sd.update({k: _np(v) for k, v in torch.load(f, map_location="cpu").items()})
    return sd


def gemma3_params_from_hf(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Convert a torch ``Gemma3ForCausalLM`` state dict to the decode
    engine's param tree (the reference's actual generator class:
    google/gemma-3-27b-it served by vLLM, 00_run_docker_containers.sh:26-39).

    Layout matches ``colpali_params_from_hf``'s language tree plus the
    Gemma-3 extras per layer: ``q_norm``/``k_norm`` (per-head RMSNorm) and
    ``pre/post_feedforward_layernorm`` (sandwich norms). The LM head is
    tied to the embedding table (``GemmaDecodeEngine._logits``); untied
    checkpoints are not supported.
    """
    norm: Dict[str, Any] = {}
    for k, v in sd.items():
        norm[re.sub(r"^(model\.)?(language_model\.)?", "", k)] = v
    sd = norm

    language: Dict[str, Any] = {"norm": _rms(sd, "norm")}
    for i in range(cfg.num_hidden_layers):
        p = f"layers.{i}."
        language[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _lin(sd, p + "self_attn.q_proj", bias=False),
                "k_proj": _lin(sd, p + "self_attn.k_proj", bias=False),
                "v_proj": _lin(sd, p + "self_attn.v_proj", bias=False),
                "o_proj": _lin(sd, p + "self_attn.o_proj", bias=False),
                "q_norm": _rms(sd, p + "self_attn.q_norm"),
                "k_norm": _rms(sd, p + "self_attn.k_norm"),
            },
            "mlp": {
                "gate_proj": _lin(sd, p + "mlp.gate_proj", bias=False),
                "up_proj": _lin(sd, p + "mlp.up_proj", bias=False),
                "down_proj": _lin(sd, p + "mlp.down_proj", bias=False),
            },
            "input_layernorm": _rms(sd, p + "input_layernorm"),
            "post_attention_layernorm": _rms(sd, p + "post_attention_layernorm"),
            "pre_feedforward_layernorm": _rms(sd, p + "pre_feedforward_layernorm"),
            "post_feedforward_layernorm": _rms(sd, p + "post_feedforward_layernorm"),
        }

    return {
        "embed": {"embed_tokens": _np(sd["embed_tokens.weight"])},
        "language_model": language,
    }


def gemma3_mm_params_from_hf(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Convert a torch ``Gemma3ForConditionalGeneration`` state dict to the
    Gemma3MMEngine param tree (the reference's full generator: vLLM serves
    google/gemma-3-27b-it over image-context MCQs,
    00_run_docker_containers.sh:26-39).

    Vision tree matches ``colpali_params_from_hf``'s (same SigLIP tower;
    the attention-pooling ``head`` in the checkpoint is unused by the mm
    path and skipped); language tree matches ``gemma3_params_from_hf``;
    the projector carries the bias-free ``mm_input_projection`` matrix
    ([v_hidden, t_hidden], already kernel-oriented) and the
    ``mm_soft_emb_norm`` RMS weight.
    """
    norm: Dict[str, Any] = {}
    for k, v in sd.items():
        norm[re.sub(r"^model\.", "", k)] = v
    sd = norm

    vt = "vision_tower.vision_model."
    vision: Dict[str, Any] = {
        "patch_embedding": {
            "kernel": _np(sd[vt + "embeddings.patch_embedding.weight"]
                          ).transpose(2, 3, 1, 0),
            "bias": _np(sd[vt + "embeddings.patch_embedding.bias"]),
        },
        "position_embedding": _np(
            sd[vt + "embeddings.position_embedding.weight"]),
        "post_layernorm": _ln(sd, vt + "post_layernorm"),
    }
    for i in range(cfg.vision.num_hidden_layers):
        p = f"{vt}encoder.layers.{i}."
        vision[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _lin(sd, p + "self_attn.q_proj"),
                "k_proj": _lin(sd, p + "self_attn.k_proj"),
                "v_proj": _lin(sd, p + "self_attn.v_proj"),
                "out_proj": _lin(sd, p + "self_attn.out_proj"),
            },
            "layer_norm1": _ln(sd, p + "layer_norm1"),
            "layer_norm2": _ln(sd, p + "layer_norm2"),
            "mlp": {"fc1": _lin(sd, p + "mlp.fc1"),
                    "fc2": _lin(sd, p + "mlp.fc2")},
        }

    lm_sd = {k[len("language_model."):]: v for k, v in sd.items()
             if k.startswith("language_model.")}
    language = gemma3_params_from_hf(lm_sd, cfg.text)

    return {
        "embed": language["embed"],
        "language_model": language["language_model"],
        "vision_tower": vision,
        "multi_modal_projector": {
            "mm_input_projection": _np(
                sd["multi_modal_projector.mm_input_projection_weight"]),
            "mm_soft_emb_norm": _rms(
                sd, "multi_modal_projector.mm_soft_emb_norm"),
        },
    }
