"""Prompt-lookup (n-gram) speculative decoding, TPU-native.

vLLM's ``speculative_config={"method": "ngram"}`` accelerates decode by
drafting tokens from the prompt itself - RAG answers copy spans from
their context, so the draft source is free. This module implements the
same idea as ONE jitted ``lax.while_loop``, with every iteration doing a
single k-token verify forward instead of k sequential single-token
steps:

1. **Draft**: find the most recent earlier occurrence of the context's
   last ``ngram`` tokens in the (prompt + generated) buffer and propose
   the ``k`` tokens that followed it (pure vectorized compare - no host
   round trip, no draft model).
2. **Verify**: feed ``[last_token, d1..d_{k-1}]`` through the engine's
   ``_chunk`` (one chunked forward writing k KV rows) and compare each
   draft against the greedy argmax of the previous position.
3. **Accept** the longest matching prefix plus the correction token -
   between 1 and k tokens emitted per forward. Rejected drafts' KV rows
   are causally masked and overwritten by later iterations, so the
   emitted stream is BIT-IDENTICAL to vanilla greedy decode (tested).

Greedy only (the standard lossless setting; the reference's MCQ answers
decode at temperature 0). Batched: each row drafts/accepts
independently; the loop runs until every row is done.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp


def _draft(tokens: jax.Array, first: jax.Array, cur_end: jax.Array,
           k: int, ngram: int, pad_id: int) -> jax.Array:
    """Vectorized prompt-lookup draft.

    tokens: [B, T] buffer (prompt left-aligned at ``first``, generated
    appended); cur_end: [B] index one past the last valid token. Returns
    [B, k] proposals (the tokens that followed the most recent earlier
    occurrence of the trailing ngram; pad_id when no match).
    """
    b, t = tokens.shape
    idx = jnp.arange(t)
    # trailing ngram per row: tokens[cur_end - ngram : cur_end]
    tail = jax.vmap(
        lambda row, e: jax.lax.dynamic_slice(row, (e - ngram,), (ngram,))
    )(tokens, cur_end)
    # windows[b, j] == tokens[b, j : j + ngram]
    win = jnp.stack([tokens[:, i: t - ngram + 1 + i] for i in range(ngram)],
                    axis=-1)                      # [B, T-ngram+1, ngram]
    match = jnp.all(win == tail[:, None, :], axis=-1)
    pos = idx[None, : t - ngram + 1]
    # earlier occurrence with a FULL k-token continuation inside the valid
    # region: the trailing ngram itself always matches at cur_end - ngram
    # but has nothing after it, and on periodic text (the common
    # acceptance case) every near-end match is similarly truncated - so
    # require room for the whole draft window
    ok = (match & (pos >= first[:, None])
          & (pos + ngram + k <= cur_end[:, None]))
    # most recent such match
    best = jnp.max(jnp.where(ok, pos, -1), axis=1)          # [B]
    has = best >= 0
    start = jnp.where(has, best + ngram, 0)
    out = jax.vmap(
        lambda row, s: jax.lax.dynamic_slice(row, (s,), (k,))
    )(tokens, jnp.minimum(start, t - k))
    return jnp.where(has[:, None], out, jnp.int32(pad_id))


def speculative_generate(
    engine,
    prompts: Sequence[Sequence[int]],
    max_new_tokens: int = 64,
    k: int = 4,
    ngram: int = 2,
    eos_id: int = -1,
    pad_id: int = 0,
    bucket: int = 16,
) -> tuple:
    """Greedy generation with prompt-lookup speculation.

    Returns (token lists - bit-identical to ``engine.generate`` greedy -
    and the mean accepted tokens per verify forward, the speedup
    signal)."""
    if not prompts:
        return [], 0.0
    c = engine.cfg
    s = max(max(len(p) for p in prompts), ngram + 1)
    s = ((s + bucket - 1) // bucket) * bucket
    b = len(prompts)
    t_buf = s + max_new_tokens + k + 1
    ids = np.full((b, s), pad_id, np.int32)
    mask = np.zeros((b, s), np.int32)
    for i, p in enumerate(prompts):
        ids[i, -len(p):] = p
        mask[i, -len(p):] = 1

    # b must key the cache: the run closure bakes the batch size into the
    # cache/token-buffer shapes, so a second call with a different prompt
    # count reusing the same bucketed s would retrace with mismatched
    # shapes.
    key = ("spec", b, s, max_new_tokens, k, ngram, eos_id, pad_id)
    cache = engine._jit_cache
    if key not in cache:
        t_kv = t_buf

        def run(params, ids, mask):
            kc = tuple(
                jnp.zeros((b, t_kv, c.num_key_value_heads, c.head_dim),
                          engine.dtype) for _ in range(c.num_hidden_layers))
            first = s - jnp.sum(mask, axis=1)                # [B]
            kv_valid_prompt = jnp.concatenate(
                [mask.astype(bool),
                 jnp.ones((b, t_buf - s), bool)], axis=1)
            positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
            x = engine._embed(params, ids)
            hidden, (kc, vc) = engine._chunk(
                params, x, positions, kc, kc, 0, kv_valid_prompt)
            logits = engine._logits(params, hidden[:, -1])
            tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)

            tokens = jnp.zeros((b, t_buf), jnp.int32).at[:, :s].set(ids)
            tokens = tokens.at[:, s].set(tok0)
            n_gen = jnp.ones((b,), jnp.int32)
            done = tok0 == eos_id
            last_pos = positions[:, -1]                      # len_p - 1

            def cond(st):
                _, _, _, n_gen, done, _, _ = st
                return jnp.any(~done & (n_gen < max_new_tokens))

            def body(st):
                kc, vc, tokens, n_gen, done, n_fwd, n_acc = st
                cur_end = s + n_gen
                drafts = _draft(tokens, first, cur_end, k, ngram, pad_id)
                last = jax.vmap(lambda row, e: row[e - 1])(tokens, cur_end)
                fed = jnp.concatenate([last[:, None], drafts[:, : k - 1]],
                                      axis=1)                # [B, k]
                # positions: last token sits at len_p - 1 + n_gen
                pos = (last_pos + n_gen)[:, None] + jnp.arange(k)[None, :]
                # write rows start where the last token's KV row belongs
                write0 = s + n_gen - 1
                # per-row write offset differs; roll each row's chunk into
                # a common buffer via per-row dynamic_update_slice
                x = engine._embed(params, fed)

                def kv_write(i, knew, vnew):
                    def upd(cache, new):
                        return jax.vmap(
                            lambda cb, nb, w: jax.lax.dynamic_update_slice(
                                cb, nb, (w, 0, 0))
                        )(cache, new, write0)
                    return upd(kc[i], knew), upd(vc[i], vnew)

                cols = jnp.arange(t_buf)
                gq = write0[:, None] + jnp.arange(k)[None, :]  # [B, k]
                amask = (kv_valid_prompt[:, None, :]
                         & (cols[None, None, :] <= gq[:, :, None])
                         )[:, None, :, :]

                from multimodal_colpali_tpu.generation.engine import (
                    attn_scale, layer_stack)
                from multimodal_colpali_tpu.models import layers as L

                sc = attn_scale(c)
                types = (c.layer_types_resolved
                         if getattr(c, "is_gemma3", False) else None)
                if types is not None:
                    sl = amask & (cols[None, None, None, :]
                                  > (gq[:, :, None] - c.sliding_window)
                                  [:, None, :, :])

                def attend(i, q, kcc, vcc):
                    m = amask
                    if types is not None and \
                            types[i] == "sliding_attention":
                        m = sl
                    # amask is [B, 1, k, T]
                    return L.attention(q, kcc, vcc, mask=m, scale=sc)

                hidden, (kc2, vc2) = layer_stack(params, c, x, pos,
                                                 kv_write, attend)
                logits = engine._logits(
                    params, hidden.reshape(b * k, -1)).reshape(b, k, -1)
                greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

                # accept: drafts[i] confirmed iff drafts[i] == greedy[i-1]
                ok = drafts[:, 1:k] == greedy[:, : k - 1]    # [B, k-1]
                acc = jnp.cumprod(ok.astype(jnp.int32), axis=1)
                j = jnp.sum(acc, axis=1)                     # 0..k-1
                # emitted token i (0-based): drafts[i+1] for i<j, else
                # greedy[j] at i==j
                ii = jnp.arange(k)[None, :]
                emit = jnp.where(
                    ii < j[:, None],
                    jnp.concatenate([drafts[:, 1:],
                                     jnp.zeros((b, 1), jnp.int32)], 1),
                    jnp.take_along_axis(greedy, j[:, None], axis=1))
                # stop at eos / budget; rows already done emit nothing
                can = ((ii <= j[:, None]) & ~done[:, None]
                       & (n_gen[:, None] + ii < max_new_tokens))
                is_eos = emit == eos_id
                before_eos = jnp.cumsum(
                    jnp.concatenate([jnp.zeros((b, 1), jnp.int32),
                                     is_eos.astype(jnp.int32)[:, :-1]], 1),
                    axis=1) == 0
                can = can & before_eos
                n_emit = jnp.sum(can.astype(jnp.int32), axis=1)

                write_pos = cur_end[:, None] + ii
                rows = jnp.arange(b)[:, None] * 0 + jnp.arange(b)[:, None]
                flat_pos = jnp.clip(write_pos, 0, t_buf - 1)
                cur_vals = jax.vmap(lambda row, p: row[p])(tokens, flat_pos)
                new_vals = jnp.where(can, emit, cur_vals)
                tokens = jax.vmap(
                    lambda row, p, v: row.at[p].set(v)
                )(tokens, flat_pos, new_vals)

                hit_eos = jnp.any(is_eos & can, axis=1)
                n_gen2 = jnp.minimum(n_gen + n_emit, max_new_tokens)
                done2 = done | hit_eos | (n_gen2 >= max_new_tokens)
                n_fwd2 = n_fwd + jnp.sum(~done)
                n_acc2 = n_acc + jnp.sum(n_emit)
                return (kc2, vc2, tokens, n_gen2, done2, n_fwd2, n_acc2)

            st = (kc, vc, tokens, n_gen, done, jnp.int32(0), jnp.int32(0))
            kc, vc, tokens, n_gen, done, n_fwd, n_acc = jax.lax.while_loop(
                cond, body, st)
            return tokens[:, s:], n_gen, n_fwd, n_acc

        cache[key] = jax.jit(run)

    toks, n_gen, n_fwd, n_acc = cache[key](
        engine.params, jnp.asarray(ids), jnp.asarray(mask))
    toks = np.asarray(toks)
    n_gen = np.asarray(n_gen)
    results: List[List[int]] = []
    for i in range(b):
        row = toks[i, : int(n_gen[i])].tolist()
        if eos_id in row:
            row = row[: row.index(eos_id)]
        results.append(row)
    accepted_per_fwd = float(n_acc) / max(float(n_fwd), 1.0)
    return results, accepted_per_fwd


class SpeculativeContinuousBatcher:
    """Continuous batching with per-slot prompt-lookup speculation.

    Subclasses the dense ``ContinuousBatcher``: admission, prefill (incl.
    chunked prefill), streaming, and failure recovery are inherited; only
    the decode step changes. Each scan step feeds ``spec_k`` tokens per
    slot ([cur, d1..d_{k-1}] drafted from a device-resident token-history
    buffer), verifies them in one forward, and advances each slot by its
    own accepted count (1..spec_k) - vLLM's ngram speculative decoding
    inside the slot batch, TPU-style (static shapes; ragged advance via
    per-slot end indices, which the dense cache already carries).

    Rules: greedy slots accept drafts; sampled slots (temperature > 0)
    ignore drafts and advance exactly one (their correction token comes
    from ``sample_per_slot`` at the slot's own step index, so streams
    still bit-match the non-speculative scheduler). Requests wanting
    logprobs route the whole chunk through the parent's decode (the
    per-position records don't compose with variable acceptance).
    """

    pass  # replaced below (needs the class defined after imports)


class SpeculativePagedContinuousBatcher:
    """Prompt-lookup speculation over the PAGED KV pool.

    ``PagedContinuousBatcher`` with the speculative decode step: vLLM's
    ngram speculative decoding composed with its PagedAttention memory
    model (vLLM supports exactly this pairing; the reference's serving
    container is vLLM, 00_run_docker_containers.sh:26-39). Admission,
    page allocation, preemption-with-recompute, prefix caching, and int8
    pools are all inherited - only the per-chunk decode changes:

    - the verify forward scatters ``spec_k`` K/V rows per slot into
      (page, row) picked from the block table (one batched scatter, no
      host round trip);
    - attention flattens the ``[B, spec_k]`` verify queries into a
      ``B * spec_k`` slot batch sharing repeated block tables, so ONE
      paged-attention kernel call covers the window with per-query
      lengths (query i attends logical rows ``< len + i + 1``);
    - rejected drafts' rows are simply left behind: the next verify
      window starts at the accepted end and overwrites them before any
      accepted query can attend them, so streams stay BIT-IDENTICAL to
      the non-speculative paged batcher (tested, incl. int8 pools).

    Page accounting covers the stale rows: ``_slot_capacity`` keeps
    ``spec_k - 1`` rows of slack, ``_can_admit`` adds the same slack to
    worst-case demand, and each chunk grants pages for up to
    ``chunk * spec_k`` accepted tokens plus the slack.
    """

    pass  # replaced below


def _make_speculative_batchers():
    from multimodal_colpali_tpu.generation.engine import (
        attn_scale, layer_stack, sample_per_slot)
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher
    from multimodal_colpali_tpu.models import layers as L
    from multimodal_colpali_tpu.ops.paged_attention import (
        paged_attention, paged_attention_int8, quantize_kv_rows)

    def accept_emit(drafts, logits, *, temp, seed, gen_step, top_p, top_k,
                    active, remaining, eos, pad_id, k, with_filter):
        """Accept/emit shared by the dense and paged speculative decodes:
        longest verified draft prefix plus the correction token, gated by
        activity, budget, and eos. Returns (emit [B,k], can [B,k],
        n_emit [B], hit_eos [B])."""
        b = drafts.shape[0]
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        ok = drafts[:, 1:k] == greedy[:, : k - 1]
        acc = jnp.cumprod(ok.astype(jnp.int32), axis=1)
        j = jnp.sum(acc, axis=1)
        j = jnp.where(temp > 0, 0, j)    # sampled slots: no drafts
        corr_g = jnp.take_along_axis(greedy, j[:, None], axis=1)[:, 0]
        corr_t = sample_per_slot(logits[:, 0], seed, gen_step, temp,
                                 top_p, top_k, use_filter=with_filter)
        correction = jnp.where(temp > 0, corr_t, corr_g)
        ii = jnp.arange(k)[None, :]
        emit = jnp.where(
            ii < j[:, None],
            jnp.concatenate([drafts[:, 1:],
                             jnp.zeros((b, 1), jnp.int32)], 1),
            jnp.where(ii == j[:, None], correction[:, None],
                      jnp.int32(pad_id)))
        can = ((ii <= j[:, None]) & active[:, None]
               & (ii < remaining[:, None]))
        is_eos = emit == eos[:, None]
        before_eos = jnp.cumsum(jnp.concatenate(
            [jnp.zeros((b, 1), jnp.int32),
             is_eos.astype(jnp.int32)[:, :-1]], 1), axis=1) == 0
        can = can & before_eos
        n_emit = jnp.sum(can.astype(jnp.int32), axis=1)
        hit_eos = jnp.any(is_eos & can, axis=1)
        return emit, can, n_emit, hit_eos

    class _SpecHostMixin:
        """Host-side speculation state shared by both batchers: the
        device-resident token-history buffer drafts are looked up in, the
        per-slot valid length, and per-chunk accounting of variable
        acceptance back into request state."""

        def __init__(self, *args, spec_k: int = 4, spec_ngram: int = 2,
                     **kwargs):
            super().__init__(*args, **kwargs)
            self.spec_k = int(spec_k)
            self.spec_ngram = int(spec_ngram)
            self._spec_dirty = False
            self._toks_dev = jnp.zeros((self.B, self._spec_buf_width()),
                                       jnp.int32)
            self._nlen = jnp.zeros((self.B,), jnp.int32)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                b_ax = self._batch_axis()
                self._toks_dev = jax.device_put(
                    self._toks_dev,
                    NamedSharding(self.mesh, P(b_ax, None)))
                self._nlen = jax.device_put(
                    self._nlen, NamedSharding(self.mesh, P(b_ax)))
            self.spec_forwards = 0
            self.spec_accepted = 0

        def _spec_buf_width(self) -> int:
            return self.T

        def _cross_setup(self):
            """Static cross-layer schedule for the verify forward (None
            when the engine has no cross decode). Every verify-window
            token is a generated continuation - it sits after every
            <|image|> marker - so the decode-time mask (all of the
            slot's pooled real-tile rows) is exact for all k queries."""
            if not self._cross_mode:
                return None
            mm = self.mm_engine
            cross_slots = {}
            order = {g: i for i, g in
                     enumerate(mm.cfg.cross_attention_layers)}
            for g, self_j in mm.cfg.cross_schedule:
                cross_slots.setdefault(self_j, []).append((order[g], g))
            return mm, self._cross_skv, cross_slots

        def _cross_hooks(self, setup, cross):
            """{self_layer_idx: hook} closing over the chunk's cross
            pools; h is [B, S, H] (S = spec_k verify window). Mirrors
            the dense/paged batchers' decode hooks: mm slots attend
            their pooled vision keys, text slots run the block under a
            uniform mask and DISCARD it (HF skips cross layers on
            text-only inputs)."""
            mm, skv_max, cross_slots = setup
            cp, ckp, cvp, clen = cross
            kmask = jnp.arange(skv_max)[None] < clen[:, None]
            has = clen > 0
            amask = (kmask | ~has[:, None])[:, None, None, :]

            def make(entries):
                def hook(h):
                    for row, g in entries:
                        y = mm._cross_block(cp[str(g)], h, ckp[row],
                                            cvp[row], amask, None)
                        h = jnp.where(has[:, None, None], y, h)
                    return h
                return hook

            return {j: make(e) for j, e in cross_slots.items()}

        def _slot_capacity(self, s: int) -> int:
            # the verify window may write spec_k - 1 stale rows past the
            # last accepted token; keep that slack out of the budget
            return super()._slot_capacity(s) - (self.spec_k - 1)

        def _finish_admission(self, slot, req, s, prompt_eff, *a, **kw):
            super()._finish_admission(slot, req, s, prompt_eff, *a, **kw)
            row = list(prompt_eff) + list(req.tokens[-1:])
            self._toks_dev = self._toks_dev.at[slot, : len(row)].set(
                jnp.asarray(row, jnp.int32))
            self._nlen = self._nlen.at[slot].set(len(row))

        def _sync_spec_history(self) -> None:
            """Rebuild the draft history from host truth after chunks that
            ran the parent's exact decode path (logprobs requests): that
            path advances the slots without touching _toks_dev/_nlen, so
            resuming speculation on the stale buffer would draft from a
            truncated history and write emits at stale offsets (silent
            acceptance collapse, not wrong tokens - verify is exact)."""
            if not self._spec_dirty:
                return
            self._spec_dirty = False
            w = self._toks_dev.shape[1]
            for slot, req in enumerate(self._slots):
                if req is None:
                    continue
                row = list(req.prompt) + list(req.tokens)
                assert len(row) <= w, "slot history exceeds the spec buffer"
                self._toks_dev = self._toks_dev.at[slot, : len(row)].set(
                    jnp.asarray(row, jnp.int32))
                self._nlen = self._nlen.at[slot].set(len(row))

        def _account_spec_chunk(self, ys) -> None:
            emit, can, active = (np.asarray(y) for y in ys)
            self.spec_forwards += int(active.sum())
            self.spec_accepted += int(can.sum())
            remaining = np.asarray(self._remaining)
            for slot, req in enumerate(self._slots):
                if req is None:
                    continue
                done = False
                for step in range(emit.shape[0]):
                    for i in range(emit.shape[2]):
                        if not can[step, slot, i]:
                            continue
                        tokv = int(emit[step, slot, i])
                        req.tokens.append(tokv)
                        if tokv == req.eos_id:
                            done = True
                            break
                    if done:
                        break
                self._emit_stream(req)
                if (remaining[slot] <= 0
                        or len(req.tokens) >= req.max_new_tokens
                        or (req.tokens and req.tokens[-1] == req.eos_id)):
                    self._finish(slot)

    class _SpeculativeContinuousBatcher(_SpecHostMixin, ContinuousBatcher):
        __doc__ = SpeculativeContinuousBatcher.__doc__

        # Mllama rides this tier too: the verify forward injects the
        # cross hooks over its [B, spec_k] window (every verify token is
        # a generated continuation, so the decode-time cross mask is
        # exact for all k queries; verify-then-accept never changes the
        # attended keys).
        supports_cross_decode = True

        def _decode_fn(self, chunk: int, with_filter: bool = True,
                       with_logprobs: bool = True):
            if with_logprobs:
                return super()._decode_fn(chunk, with_filter, with_logprobs)
            eng, c = self.engine, self.cfg
            n_layers = c.num_hidden_layers
            t, b = self.T, self.B
            k = self.spec_k
            ngram = self.spec_ngram
            pad_id = self.pad_id
            sc = attn_scale(c)
            types = (c.layer_types_resolved
                     if getattr(c, "is_gemma3", False) else None)
            cross_setup = self._cross_setup()

            def one_step(p, cross, caches, toks_dev, nlen, tok, pos, start,
                         end, temp, seed, remaining, gen_step, eos, top_p,
                         top_k):
                kcs, vcs = caches[:n_layers], caches[n_layers:]
                active = remaining > 0
                first = jnp.zeros((b,), jnp.int32)
                drafts = _draft(toks_dev, first, jnp.maximum(nlen, ngram),
                                k, ngram, pad_id)
                fed = jnp.concatenate([tok[:, None], drafts[:, : k - 1]],
                                      axis=1)                  # [B, k]
                x = eng._embed(p, fed)
                positions = pos[:, None] + jnp.arange(k)[None, :]
                rows = jnp.arange(b)
                wcols = end[:, None] + jnp.arange(k)[None, :]  # [B, k]
                wcols_safe = jnp.clip(wcols, 0, t - 1)
                cols = jnp.arange(t)
                base_m = ((cols[None, None, :] >= start[:, None, None])
                          & (cols[None, None, :] <= wcols[:, :, None])
                          )[:, None]                           # [B,1,k,T]
                if types is not None:
                    sl_m = base_m & (cols[None, None, None, :]
                                     > (wcols[:, :, None] - c.sliding_window)
                                     [:, None])

                def kv_write(i, kk, vv):
                    return (kcs[i].at[rows[:, None], wcols_safe].set(kk),
                            vcs[i].at[rows[:, None], wcols_safe].set(vv))

                def attend(i, q, kc, vc):
                    m = base_m
                    if types is not None and \
                            types[i] == "sliding_attention":
                        m = sl_m
                    return L.attention(q, kc, vc, mask=m, scale=sc)

                inter = (self._cross_hooks(cross_setup, cross)
                         if cross_setup else None)
                xx, (nk, nv) = layer_stack(p, c, x, positions, kv_write,
                                           attend, interleave=inter)
                logits = eng._logits(p, xx.reshape(b * k, -1)
                                     ).reshape(b, k, -1)
                emit, can, n_emit, hit_eos = accept_emit(
                    drafts, logits, temp=temp, seed=seed, gen_step=gen_step,
                    top_p=top_p, top_k=top_k, active=active,
                    remaining=remaining, eos=eos, pad_id=pad_id, k=k,
                    with_filter=with_filter)

                ii = jnp.arange(k)[None, :]
                bpos = nlen[:, None] + ii
                bpos_safe = jnp.clip(bpos, 0, t - 1)
                cur = jax.vmap(lambda row, p2: row[p2])(toks_dev, bpos_safe)
                toks_dev = jax.vmap(lambda row, p2, v2: row.at[p2].set(v2))(
                    toks_dev, bpos_safe, jnp.where(can, emit, cur))
                last = jnp.take_along_axis(
                    emit, jnp.maximum(n_emit - 1, 0)[:, None], axis=1)[:, 0]
                tok = jnp.where(n_emit > 0, last, tok)
                nlen = nlen + n_emit
                end = end + n_emit
                pos = pos + n_emit
                gen_step = gen_step + n_emit
                remaining = jnp.maximum(remaining - n_emit, 0)
                remaining = jnp.where(hit_eos, 0, remaining)
                caches = tuple(nk) + tuple(nv)
                return ((caches, toks_dev, nlen, tok, pos, start, end, temp,
                         seed, remaining, gen_step, eos, top_p, top_k),
                        (emit, can, active))

            if cross_setup:
                # cross pools/params are decode CONSTANTS (scan closure)
                def run(p, cp, ck, cv, clen, caches, toks_dev, nlen, tok,
                        pos, start, end, temp, seed, remaining, gen_step,
                        eos, top_p, top_k):
                    cross = (cp, ck, cv, clen)

                    def body(carry, _):
                        carry, ys = one_step(p, cross, *carry)
                        return carry, ys

                    carry, ys = jax.lax.scan(
                        body, (caches, toks_dev, nlen, tok, pos, start,
                               end, temp, seed, remaining, gen_step, eos,
                               top_p, top_k), None, length=chunk)
                    return carry, ys

                return jax.jit(run)

            def run(p, caches, toks_dev, nlen, tok, pos, start, end, temp,
                    seed, remaining, gen_step, eos, top_p, top_k):
                def body(carry, _):
                    carry, ys = one_step(p, None, *carry)
                    return carry, ys

                carry, ys = jax.lax.scan(
                    body, (caches, toks_dev, nlen, tok, pos, start, end,
                           temp, seed, remaining, gen_step, eos, top_p,
                           top_k), None, length=chunk)
                return carry, ys

            return jax.jit(run)

        def _step_chunk(self) -> None:
            flags = self._decode_flags()
            if flags[1]:   # logprobs wanted: parent's exact decode path
                super()._step_chunk()
                self._spec_dirty = True
                return
            self._sync_spec_history()
            key = ("spec_decode", flags)
            if key not in self._jit:
                self._jit[key] = self._decode_fn(self.chunk, flags[0],
                                                 False)
            extra = ((self.mm_engine.cross_params, self._cross_k,
                      self._cross_v, self._cross_len)
                     if self._cross_mode else ())
            carry, ys = self._jit[key](
                self.engine.params, *extra, self._caches, self._toks_dev,
                self._nlen, self._tok, self._pos, self._start, self._end,
                self._temp, self._seed, self._remaining, self._gen_step,
                self._eos, self._top_p, self._top_k)
            (self._caches, self._toks_dev, self._nlen, self._tok,
             self._pos, self._start, self._end, self._temp, self._seed,
             self._remaining, self._gen_step, self._eos, self._top_p,
             self._top_k) = carry
            self._account_spec_chunk(ys)

    class _SpeculativePagedContinuousBatcher(_SpecHostMixin,
                                             PagedContinuousBatcher):
        __doc__ = SpeculativePagedContinuousBatcher.__doc__

        # Mllama rides this tier too (see the dense speculative class):
        # the paged verify forward injects the same cross hooks, and
        # preemption resumes through the causal _prefill_cross
        supports_cross_decode = True

        @property
        def _spec_slack(self):
            return self.spec_k - 1

        def _spec_buf_width(self) -> int:
            # logical rows a slot can hold plus the verify window's slack
            return self.NB * self.page + self.spec_k

        def _chunk_rows(self, rem: int) -> int:
            # up to spec_k accepted tokens per scan step, plus the stale
            # verify rows past the last accepted one
            return min(self.chunk * self.spec_k, rem) + self.spec_k - 1

        def _decode_fn(self, chunk: int, with_filter: bool = True,
                       with_logprobs: bool = True):
            if with_logprobs:
                return super()._decode_fn(chunk, with_filter, with_logprobs)
            eng, c = self.engine, self.cfg
            b = self.B
            k = self.spec_k
            page = self.page
            nb = self.NB
            ngram = self.spec_ngram
            pad_id = self.pad_id
            int8 = self.kv_dtype == "int8"
            sc = attn_scale(c)
            types = (c.layer_types_resolved
                     if getattr(c, "is_gemma3", False) else None)

            def layer_window(i: int) -> int:
                if types is not None and types[i] == "sliding_attention":
                    return int(c.sliding_window)
                return 0

            cross_setup = self._cross_setup()

            def one_step(p, bt, cross, kpools, vpools, toks_dev, nlen, tok,
                         pos, length, temp, seed, remaining, gen_step, eos,
                         top_p, top_k):
                active = remaining > 0
                first = jnp.zeros((b,), jnp.int32)
                drafts = _draft(toks_dev, first, jnp.maximum(nlen, ngram),
                                k, ngram, pad_id)
                fed = jnp.concatenate([tok[:, None], drafts[:, : k - 1]],
                                      axis=1)                  # [B, k]
                x = eng._embed(p, fed)
                positions = pos[:, None] + jnp.arange(k)[None, :]
                rows = jnp.arange(b)
                ii = jnp.arange(k)[None, :]
                # verify row i of a slot lands at logical position
                # length + i -> (block table entry, in-page offset)
                wtok = length[:, None] + ii                    # [B, k]
                blk = bt[rows[:, None], jnp.clip(wtok // page, 0, nb - 1)]
                blk = jnp.where(active[:, None], blk, 0)       # trash page
                off = wtok % page
                # per-query attention lengths: query i sees rows <= its own
                att_len = jnp.where(active[:, None], wtok + 1,
                                    length[:, None])
                btf = jnp.repeat(bt, k, axis=0)                # [B*k, NB]
                alf = att_len.reshape(-1)

                if int8:
                    def kv_write(i, kk, vv):
                        kc_, ks_ = quantize_kv_rows(kk)   # [B,k,Hkv,D]
                        vc_, vs_ = quantize_kv_rows(vv)
                        kp, kps = kpools[i]
                        vp, vps = vpools[i]
                        return ((kp.at[blk, off].set(kc_),
                                 kps.at[blk, off].set(ks_)),
                                (vp.at[blk, off].set(vc_),
                                 vps.at[blk, off].set(vs_)))

                    def attend(i, q, kp, vp):
                        qf = q.reshape((b * k,) + q.shape[2:])
                        out = paged_attention_int8(
                            qf, kp[0], kp[1], vp[0], vp[1], btf, alf,
                            scale=sc, window=layer_window(i))
                        return out.reshape(b, k, -1)
                else:
                    def kv_write(i, kk, vv):
                        return (kpools[i].at[blk, off].set(kk),
                                vpools[i].at[blk, off].set(vv))

                    def attend(i, q, kp, vp):
                        qf = q.reshape((b * k,) + q.shape[2:])
                        out = paged_attention(qf, kp, vp, btf, alf,
                                              scale=sc,
                                              window=layer_window(i))
                        return out.reshape(b, k, -1)

                inter = (self._cross_hooks(cross_setup, cross)
                         if cross_setup else None)
                xx, (nk, nv) = layer_stack(p, c, x, positions, kv_write,
                                           attend, interleave=inter)
                logits = eng._logits(p, xx.reshape(b * k, -1)
                                     ).reshape(b, k, -1)
                emit, can, n_emit, hit_eos = accept_emit(
                    drafts, logits, temp=temp, seed=seed, gen_step=gen_step,
                    top_p=top_p, top_k=top_k, active=active,
                    remaining=remaining, eos=eos, pad_id=pad_id, k=k,
                    with_filter=with_filter)

                width = toks_dev.shape[1]
                bpos = nlen[:, None] + ii
                bpos_safe = jnp.clip(bpos, 0, width - 1)
                cur = jax.vmap(lambda row, p2: row[p2])(toks_dev, bpos_safe)
                toks_dev = jax.vmap(lambda row, p2, v2: row.at[p2].set(v2))(
                    toks_dev, bpos_safe, jnp.where(can, emit, cur))
                last = jnp.take_along_axis(
                    emit, jnp.maximum(n_emit - 1, 0)[:, None], axis=1)[:, 0]
                tok = jnp.where(n_emit > 0, last, tok)
                nlen = nlen + n_emit
                length = length + n_emit
                pos = pos + n_emit
                gen_step = gen_step + n_emit
                remaining = jnp.maximum(remaining - n_emit, 0)
                remaining = jnp.where(hit_eos, 0, remaining)
                return ((tuple(nk), tuple(nv), toks_dev, nlen, tok, pos,
                         length, temp, seed, remaining, gen_step, eos,
                         top_p, top_k),
                        (emit, can, active))

            if cross_setup:
                # cross pools/params are decode CONSTANTS (scan closure,
                # never donated)
                def run(p, bt, cp, ck, cv, clen, kpools, vpools, toks_dev,
                        nlen, tok, pos, length, temp, seed, remaining,
                        gen_step, eos, top_p, top_k):
                    cross = (cp, ck, cv, clen)

                    def body(carry, _):
                        carry, ys = one_step(p, bt, cross, *carry)
                        return carry, ys

                    carry, ys = jax.lax.scan(
                        body, (kpools, vpools, toks_dev, nlen, tok, pos,
                               length, temp, seed, remaining, gen_step,
                               eos, top_p, top_k), None, length=chunk)
                    return carry, ys

                return jax.jit(run, donate_argnums=(6, 7))

            def run(p, bt, kpools, vpools, toks_dev, nlen, tok, pos,
                    length, temp, seed, remaining, gen_step, eos, top_p,
                    top_k):
                def body(carry, _):
                    carry, ys = one_step(p, bt, None, *carry)
                    return carry, ys

                carry, ys = jax.lax.scan(
                    body, (kpools, vpools, toks_dev, nlen, tok, pos,
                           length, temp, seed, remaining, gen_step, eos,
                           top_p, top_k), None, length=chunk)
                return carry, ys

            return jax.jit(run, donate_argnums=(2, 3))

        def _step_chunk(self) -> None:
            flags = self._decode_flags()
            if flags[1]:   # logprobs wanted: parent's exact paged decode
                super()._step_chunk()
                self._spec_dirty = True
                return
            self._sync_spec_history()
            self._ensure_chunk_capacity()
            if not any(r is not None for r in self._slots):
                return
            key = ("spec_decode", flags)
            if key not in self._jit:
                self._jit[key] = self._decode_fn(self.chunk, flags[0],
                                                 False)
            extra = ((self.mm_engine.cross_params, self._cross_k,
                      self._cross_v, self._cross_len)
                     if self._cross_mode else ())
            carry, ys = self._jit[key](
                self.engine.params, jnp.asarray(self._bt_host), *extra,
                self._kpools, self._vpools, self._toks_dev, self._nlen,
                self._tok, self._pos, self._len, self._temp, self._seed,
                self._remaining, self._gen_step, self._eos, self._top_p,
                self._top_k)
            (self._kpools, self._vpools, self._toks_dev, self._nlen,
             self._tok, self._pos, self._len, self._temp, self._seed,
             self._remaining, self._gen_step, self._eos, self._top_p,
             self._top_k) = carry
            self._account_spec_chunk(ys)

    return _SpeculativeContinuousBatcher, _SpeculativePagedContinuousBatcher


(SpeculativeContinuousBatcher,
 SpeculativePagedContinuousBatcher) = _make_speculative_batchers()
