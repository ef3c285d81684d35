"""Paged-KV continuous batching: vLLM's PagedAttention memory model, TPU-native.

``ContinuousBatcher`` preallocates a dense ``[B, max_seq_len]`` KV cache per
slot; serving B long-context slots costs ``B * T_max`` HBM whether or not the
requests use it. ``PagedContinuousBatcher`` replaces the dense cache with a
shared pool of fixed-size pages plus per-slot block tables
(ops/paged_attention.py), so HBM pins only what requests actually hold -
the memory architecture that lets vLLM (the reference's generation server,
00_run_docker_containers.sh:26-39) oversubscribe sequence capacity.

Scheduling additions over the parent:

- **On-demand page allocation**: pages are granted per decode chunk, not
  reserved for a request's whole ``max_new_tokens`` budget up front.
- **Preemption with recompute**: when the pool runs dry, the youngest
  active request is evicted (its pages freed) and requeued; on
  readmission its prompt + generated-so-far tokens re-prefill, and
  sampling resumes at its own step counter - the emitted stream is
  identical to an uninterrupted run (tested), which is vLLM's
  "recompute" preemption mode.
- **One jit, static shapes**: the decode step is the parent's layer math
  with two substitutions - K/V writes scatter into (page, row) picked
  from the block table, and attention runs the paged kernel. Block
  tables are small int32 inputs refreshed per chunk; pool tensors are
  donated through the scan carry exactly like the dense caches.

Physical page 0 is a write-off trash page: inactive slots scatter there so
the step function stays branch-free.
"""

from __future__ import annotations

from typing import Any, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.generation.engine import (
    GemmaDecodeEngine, _step_logprobs, layer_stack, sample_per_slot)
from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher
from multimodal_colpali_tpu.ops.paged_attention import (
    paged_attention, paged_attention_int8, quantize_kv_rows)


class PagedContinuousBatcher(ContinuousBatcher):
    """Slot-based continuous batching over a shared paged KV pool."""

    # Extra KV rows a decode step may touch past the last accepted token
    # (0 here; the speculative subclass writes spec_k - 1 stale verify
    # rows that page-demand accounting must cover).
    _spec_slack = 0
    # Cross-attention decode engines (Mllama) ride this tier too: the
    # per-slot cross-KV pools are fixed-size decode CONSTANTS (written at
    # install, never paged), and preemption resumes through the engine's
    # causal ``_prefill_cross`` (scheduler._full_prefill), so recompute
    # preemption stays bit-exact for image requests.
    supports_cross_decode = True

    def __init__(self, engine: GemmaDecodeEngine, batch_slots: int = 4,
                 max_seq_len: int = 512, chunk: int = 8,
                 prompt_bucket: int = 16, eos_id: int = -1, pad_id: int = 0,
                 prefill_cache_entries: int = 8, mm_engine: Any = None,
                 page_size: int = 16, pool_pages: Optional[int] = None,
                 kv_dtype: str = "native", prefix_caching: bool = False,
                 prefill_chunk: int = 0, cross_max_images: int = 1,
                 max_queue: int = 0, admission_timeout: float = 0.0):
        """``pool_pages`` sizes the shared pool (default: enough for every
        slot to reach ``max_seq_len`` - set it lower to exercise
        oversubscription + preemption). ``page_size`` tokens per page.

        ``kv_dtype="int8"`` stores the pool as int8 codes with one fp32
        absmax scale per (token, kv head) - vLLM's ``kv_cache_dtype``
        role. The pool's HBM cost per token roughly halves (vs bf16), so
        the same budget holds ~2x the context; attention runs the int8
        Pallas kernel (scales factored out of the dots, MXU stays bf16).

        ``prefix_caching=True`` (vLLM's automatic prefix caching) shares
        FULL prompt pages between requests by content: each full page is
        keyed by the chain (modality ctx, tokens so far), installs reuse
        matching pages read-only (refcounted) and skip their writes, and
        text prompts with a cached prefix prefill ONLY their tail against
        the cached K/V (``_prefix_prefill`` - the prefix's forward compute
        is skipped entirely, the big win for shared-preamble RAG sweeps).
        Unreferenced cached pages persist in an LRU until the allocator
        needs them. Decode pages and partial prompt tails stay private.
        Off by default: a reused page was written under the DONOR's
        padding bucket, so streams are guaranteed equal only mathematically
        (not bit-for-bit) when prompt lengths differ - same caveat as
        vLLM's feature.
        """
        super().__init__(engine, batch_slots, max_seq_len, chunk,
                         prompt_bucket, eos_id, pad_id,
                         prefill_cache_entries, mm_engine,
                         prefill_chunk=prefill_chunk,
                         cross_max_images=cross_max_images,
                         max_queue=max_queue,
                         admission_timeout=admission_timeout)
        c = self.cfg
        self.page = page_size
        self.NB = -(-max_seq_len // page_size)          # blocks per slot
        if pool_pages is None:
            pool_pages = batch_slots * self.NB + 1
        self.P = max(pool_pages, 2)
        if kv_dtype not in ("native", "int8"):
            raise ValueError(f"kv_dtype must be 'native' or 'int8', got {kv_dtype!r}")
        self.kv_dtype = kv_dtype
        # the dense per-slot caches are unused; release them
        self._caches = ()
        pool_shape = (self.P, self.page, c.num_key_value_heads, c.head_dim)
        if kv_dtype == "int8":
            # pool leaf = (codes int8, scales fp32 per (token, head))
            self._kpools = tuple(
                (jnp.zeros(pool_shape, jnp.int8),
                 jnp.zeros(pool_shape[:-1], jnp.float32))
                for _ in range(c.num_hidden_layers))
            self._vpools = tuple(
                (jnp.zeros(pool_shape, jnp.int8),
                 jnp.zeros(pool_shape[:-1], jnp.float32))
                for _ in range(c.num_hidden_layers))
        else:
            self._kpools = tuple(jnp.zeros(pool_shape, engine.dtype)
                                 for _ in range(c.num_hidden_layers))
            self._vpools = tuple(jnp.zeros(pool_shape, engine.dtype)
                                 for _ in range(c.num_hidden_layers))
        self._len = jnp.zeros((self.B,), jnp.int32)     # tokens held per slot
        # Multimodal prefix caching is sound ONLY for causal mm engines
        # with fixed-length image spans (Gemma-3 MM: a page's K/V depend
        # on the tokens up to its end plus, for spans crossing its right
        # boundary, on soft tokens fully determined by the pixel digest in
        # the chain root and the span's fixed extent). PaliGemma's
        # bidirectional PREFIX makes every page depend on the whole
        # prompt, so it stays excluded - and so do cross-attention
        # engines (Mllama exposes a raising ``_prefill``; its image
        # context lives in the per-slot cross pools, not prompt pages).
        self._mm_prefix_ok = (prefix_caching and mm_engine is not None
                              and hasattr(mm_engine, "_prefill")
                              and not self._cross_mode)
        self._place_pool_state()
        # host-side allocator state; page 0 is the trash page
        self._free: List[int] = list(range(self.P - 1, 0, -1))
        self._slot_pages: List[List[int]] = [[] for _ in range(self.B)]
        self._bt_host = np.zeros((self.B, self.NB), np.int32)
        self._admit_seq = 0
        self._slot_age = [0] * self.B                   # admission order
        self.preemptions = 0
        # prefix cache: content-addressed full pages, refcounted
        from collections import OrderedDict

        self.prefix_caching = prefix_caching
        self._page_ref = [0] * self.P                   # live holders per page
        self._page_key: dict = {}                       # phys -> chain key
        self._key_page: dict = {}                       # chain key -> phys
        self._cache_lru: "OrderedDict[int, None]" = OrderedDict()  # ref==0
        self.prefix_cache_hits = 0
        self.prefix_prefill_hits = 0   # tail-only prefills (compute skipped)

    def _place_pool_state(self) -> None:
        """Mesh placement for the paged tier: the shared page pool shards
        its KV-head axis over "model" (each TP shard owns its heads' pages
        - no duplication of the dominant serving buffer) when the head
        count divides the axis, else replicates; ``_len`` shards with the
        slot batch. Block tables are small host int32 arrays refreshed per
        chunk and stay replicated."""
        if self.mesh is None:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P

        c = self.cfg
        tp = self.mesh.shape.get("model", 1)
        h = "model" if tp > 1 and c.num_key_value_heads % tp == 0 else None
        pool4 = NamedSharding(self.mesh, P(None, None, h, None))
        pool3 = NamedSharding(self.mesh, P(None, None, h))

        def place(leaf):
            sh = pool4 if leaf.ndim == 4 else pool3
            return jax.device_put(leaf, sh)

        self._kpools = jax.tree.map(place, self._kpools)
        self._vpools = jax.tree.map(place, self._vpools)
        self._len = jax.device_put(
            self._len, NamedSharding(self.mesh, P(self._batch_axis())))

    # -- allocator -------------------------------------------------------------

    def _alloc_page(self) -> Optional[int]:
        """A fresh private page: free list first, then evict the
        least-recently-used unreferenced cached page (deregistering its
        content key)."""
        if self._free:
            return self._free.pop()
        if self._cache_lru:
            phys, _ = self._cache_lru.popitem(last=False)
            key = self._page_key.pop(phys, None)
            if key is not None:
                self._key_page.pop(key, None)
            return phys
        return None

    def _free_now(self) -> int:
        """Pages the allocator can hand out right now."""
        return len(self._free) + len(self._cache_lru)

    def _attach(self, slot: int, phys: int) -> None:
        """Append ``phys`` as the slot's next logical page, holding a ref
        (shared cached pages leave the LRU while referenced)."""
        pages = self._slot_pages[slot]
        self._bt_host[slot, len(pages)] = phys
        pages.append(phys)
        self._page_ref[phys] += 1
        self._cache_lru.pop(phys, None)

    def _alloc_to(self, slot: int, n_tokens: int) -> bool:
        """Grow the slot's page list to cover ``n_tokens``; False if the
        pool is dry (caller preempts and retries)."""
        need = -(-n_tokens // self.page)
        if need > self.NB:
            return False
        pages = self._slot_pages[slot]
        while len(pages) < need:
            phys = self._alloc_page()
            if phys is None:
                return False
            self._attach(slot, phys)
        return True

    def _release(self, slot: int) -> None:
        for phys in reversed(self._slot_pages[slot]):
            self._page_ref[phys] -= 1
            if self._page_ref[phys] == 0:
                if phys in self._page_key:
                    # content-addressed page: keep it resident, evictable
                    self._cache_lru[phys] = None
                else:
                    self._free.append(phys)
        self._slot_pages[slot] = []
        self._bt_host[slot] = 0

    def _preempt_youngest(self, protect: int) -> bool:
        """Evict the most recently admitted active slot (never ``protect``)
        back to the readmission queue; its generation resumes via
        prompt+tokens re-prefill. Returns False if no victim exists."""
        victim, best = -1, -1
        for slot, req in enumerate(self._slots):
            if req is None or slot == protect:
                continue
            if self._slot_age[slot] > best:
                victim, best = slot, self._slot_age[slot]
        if victim < 0:
            return False
        req = self._slots[victim]
        self._slots[victim] = None
        self._release(victim)
        self._remaining = self._remaining.at[victim].set(0)
        self._len = self._len.at[victim].set(0)
        if self._cross_mode:
            # the victim's cross rows are re-packed at readmission
            self._cross_len = self._cross_len.at[victim].set(0)
        self._readmit.insert(0, req)
        self.preemptions += 1
        return True


    # -- cached-prefix tail prefill ------------------------------------------

    def _chain_keys(self, tokens, ctx):
        """Chain keys of the prompt's FULL pages."""
        page = self.page
        keys: List[Any] = []
        chain: Any = ("root", ctx)
        for i in range(len(tokens) // page):
            chain = (chain, tuple(tokens[i * page:(i + 1) * page]))
            keys.append(chain)
        return keys

    def _mm_spans_ok(self, tokens) -> bool:
        """Chain-key soundness check for mm prompts: every image-token run
        must have EXACTLY ``mm_tokens_per_image`` tokens - only then does
        (digest, tokens-so-far) determine the soft tokens a boundary-
        crossing span contributes to a page's K/V. Malformed prompts
        (truncated runs a user could hand-craft) disable sharing."""
        img = self.mm_engine.cfg.image_token_id
        per = self.mm_engine.cfg.mm_tokens_per_image
        run = 0
        for t in tokens:
            if t == img:
                run += 1
            elif run:
                if run != per:
                    return False
                run = 0
        return run in (0, per)

    def _prefix_prefill(self, prompt_eff, ctx, mm):
        """Prefill ONLY the prompt tail against cached prefix pages - the
        compute half of automatic prefix caching (the write half is the
        page reuse in ``_install_slot``). The cached K/V rows are gathered
        from the pool inside the jit; tail tokens attend to them plus
        themselves causally, at positions offset by the prefix length.

        Multimodal prompts participate when the engine's prefill is
        causal with fixed-length image spans (Gemma-3 MM; the pixel
        digest is part of the chain root so different images never
        alias) and the TAIL carries no image tokens - a RAG sweep's
        shared image+preamble prefix then skips its forward entirely
        across questions. PaliGemma mm prompts fall back (bidirectional
        prefix)."""
        if not self.prefix_caching or (mm and not self._mm_prefix_ok):
            return None
        if mm and not self._mm_spans_ok(prompt_eff):
            return None
        page = self.page
        n_prompt = len(prompt_eff)
        keys = self._chain_keys(prompt_eff, ctx)
        n_reused = 0
        for key_i in keys:
            if key_i not in self._key_page:
                break
            n_reused += 1
        # keep at least one real token in the tail: the next-token logits
        # come from the tail's last hidden state
        if n_reused * page >= n_prompt:
            n_reused = max((n_prompt - 1) // page, 0)
        if n_reused == 0:
            return None
        n_ctx = n_reused * page
        tail = prompt_eff[n_ctx:]
        if mm and self.mm_engine.cfg.image_token_id in tail:
            # an image span in the tail needs the mm embed path; only
            # text tails ride the cached-prefix compute skip
            return None
        n_tail = len(tail)
        s_tail = max(((n_tail + self.bucket - 1) // self.bucket)
                     * self.bucket, self.bucket)
        phys = jnp.asarray(
            [self._key_page[k] for k in keys[:n_reused]], jnp.int32)
        eng, c = self.engine, self.cfg
        # The tail chunk is LEFT-aligned after the context rows: tail
        # token i sits at global slot n_ctx + i, so slot distance equals
        # token distance and per-layer sliding-window masks (Gemma-3)
        # stay true. (Right-aligning would put the pad slots BETWEEN the
        # context and the tokens, inflating every distance.) The returned
        # rows are re-right-aligned to the install contract.
        jkey = ("prefix_prefill", s_tail, n_reused, n_tail)
        if jkey not in self._jit:
            int8 = self.kv_dtype == "int8"
            total = n_ctx + s_tail

            def run(p, ids, mask, kpools, vpools, phys):
                kc, vc = [], []
                for kp, vp in zip(kpools, vpools):
                    if int8:
                        ck = (kp[0][phys].astype(jnp.float32)
                              * kp[1][phys][..., None]).astype(eng.dtype)
                        cv = (vp[0][phys].astype(jnp.float32)
                              * vp[1][phys][..., None]).astype(eng.dtype)
                    else:
                        ck, cv = kp[phys], vp[phys]
                    shape = (1, n_ctx, c.num_key_value_heads, c.head_dim)
                    base = jnp.zeros(
                        (1, total, c.num_key_value_heads, c.head_dim),
                        eng.dtype)
                    kc.append(base.at[:, :n_ctx].set(ck.reshape(shape)))
                    vc.append(base.at[:, :n_ctx].set(cv.reshape(shape)))
                positions = n_ctx + jnp.cumsum(mask, axis=1) - 1
                positions = jnp.maximum(positions, 0)
                kv_valid = jnp.concatenate(
                    [jnp.ones((1, n_ctx), bool), mask.astype(bool)], axis=1)
                x = eng._embed(p, ids)
                hidden, (k, v) = eng._chunk(p, x, positions, tuple(kc),
                                            tuple(vc), n_ctx, kv_valid)
                k_tail = tuple(jnp.roll(kk[:, n_ctx:], s_tail - n_tail,
                                        axis=1) for kk in k)
                v_tail = tuple(jnp.roll(vv[:, n_ctx:], s_tail - n_tail,
                                        axis=1) for vv in v)
                return (k_tail, v_tail,
                        eng._logits(p, hidden[:, n_tail - 1])[0],
                        jnp.int32(n_ctx + n_tail - 1))

            self._jit[jkey] = jax.jit(run)
        ids = np.full((1, s_tail), self.pad_id, np.int32)
        mask = np.zeros((1, s_tail), np.int32)
        ids[0, :n_tail] = tail
        mask[0, :n_tail] = 1
        k, v, logits, last_pos = self._jit[jkey](
            eng.params, jnp.asarray(ids), jnp.asarray(mask),
            self._kpools, self._vpools, phys)
        self.prefix_prefill_hits += 1
        return k, v, logits, last_pos, ("tail", n_reused, s_tail, keys)

    # -- ContinuousBatcher hooks -------------------------------------------------

    def _can_admit(self, s: int, n_prompt: int, budget: int,
                   tokens=None, mm: bool = False, ctx=None) -> bool:
        """Admit only requests that (a) fit the free pool right now and
        (b) could finish with the pool to themselves. Without (b), a
        request whose prompt consumes the whole pool but still has decode
        budget is admitted and later crashes `_ensure_chunk_capacity` (no
        victim left to preempt), killing every in-flight request instead
        of failing alone through the empty-scheduler guard.

        Row accounting: install packs exactly ``n_prompt`` rows (not the
        bucketed ``s``), tok0 comes from the prefill logits without a KV
        row, and each of the remaining ``budget - 1`` decode steps writes
        one row - so peak demand is ``n_prompt + budget - 1`` rows, with
        ``budget`` clamped to the slot row capacity as at install time.

        With ``prefix_caching`` on, prompt pages whose chain keys already
        live in the cache attach read-only without drawing on the free
        pool, so only the non-cached remainder needs fresh pages - a
        prompt whose prefix is fully cached must not be deferred (or
        failed against an empty scheduler) for pages it will never
        allocate. Reused pages currently parked in the LRU are excluded
        from the free count (attaching them removes them from the LRU
        before any fresh allocation can evict them)."""
        usable = self.P - 1                       # page 0 is the trash page
        budget_c = min(budget, self._slot_capacity(s))
        if budget_c <= 1:
            # finishes at prefill; only the prompt pages are ever allocated
            worst_rows = n_prompt
        else:
            worst_rows = n_prompt + budget_c - 1 + self._spec_slack
        if -(-worst_rows // self.page) > min(usable, self.NB):
            return False
        n_reused = 0
        reused_in_lru = 0
        if self.prefix_caching and tokens is not None and (
                not mm or ctx is None
                or (self._mm_prefix_ok and self._mm_spans_ok(tokens))):
            # mirror the install-time reuse depth (same eligibility as
            # _install_slot: Gemma-3 MM prompts with well-formed spans
            # participate, keyed by the pixel digest ctx), conservatively
            # including _prefix_prefill's keep-one-tail-token cap
            keys = self._chain_keys(tokens, ctx if mm else None)
            for key_i in keys:
                phys = self._key_page.get(key_i)
                if phys is None:
                    break
                n_reused += 1
            if n_reused * self.page >= n_prompt:
                n_reused = max((n_prompt - 1) // self.page, 0)
            for key_i in keys[:n_reused]:
                if self._key_page[key_i] in self._cache_lru:
                    reused_in_lru += 1
        need_fresh = (-(-n_prompt // self.page)) - n_reused
        avail = self._free_now() - reused_in_lru
        return need_fresh <= min(avail, self.NB - n_reused)

    def _slot_capacity(self, s: int) -> int:
        return self.NB * self.page - s

    def _install_slot(self, slot: int, s: int, n_prompt: int, k, v,
                      tokens=None, ctx=None, hint=None) -> None:
        """Scatter the prefill K/V rows (left-padded to ``s``) into the
        slot's pages, valid tokens first (jnp.roll drops the padding), so
        logical token t of the slot sits at page t//page, row t%page.

        With ``prefix_caching``, full prompt pages whose chain key
        (modality ctx + tokens so far) matches a cached page are attached
        read-only and their writes are skipped; newly written full pages
        register under their keys. Chain keys are compared by equality
        (nested tuples), so a hash collision cannot alias content.

        A ``("cross", (ks, vs))`` hint (Mllama image request) fills the
        slot's cross-KV pool rows instead - the prompt's self-attention
        rows then page exactly like a text request's."""
        if self._cross_mode:
            if isinstance(hint, tuple) and hint and hint[0] == "cross":
                ks, vs = hint[1]          # [n_cross, 1, skv_real, kv, hd]
                skv = ks.shape[2]
                self._cross_k = self._cross_k.at[:, slot, :skv].set(ks[:, 0])
                self._cross_v = self._cross_v.at[:, slot, :skv].set(vs[:, 0])
                self._cross_len = self._cross_len.at[slot].set(skv)
                hint = None               # paging below sees a plain prompt
            else:                         # text request in this slot
                self._cross_len = self._cross_len.at[slot].set(0)
        page = self.page
        n_pages = -(-n_prompt // page)
        keys: List[Any] = []
        n_reused = 0
        # ctx is the multimodal pixel digest. PaliGemma mm prompts are
        # EXCLUDED from page sharing (bidirectional prefill: a page's K/V
        # depends on the whole prompt); Gemma-3 MM prompts participate
        # (causal + fixed-length spans; the digest is in the chain root)
        # when their span structure is well-formed.
        if self.prefix_caching and tokens is not None and (
                ctx is None
                or (self._mm_prefix_ok and self._mm_spans_ok(tokens))):
            keys = hint[3] if hint is not None                 else self._chain_keys(tokens, ctx)
            if hint is not None:
                # tail prefill already chose the reuse depth; install MUST
                # match it exactly - the k/v rows cover only the tail
                n_reused = hint[1]
                for key_i in keys[:n_reused]:
                    self._attach(slot, self._key_page[key_i])
            else:
                for key_i in keys:
                    phys = self._key_page.get(key_i)
                    if phys is None:
                        break
                    self._attach(slot, phys)
                    n_reused += 1
            self.prefix_cache_hits += n_reused
        if not self._alloc_to(slot, n_prompt):
            raise RuntimeError("admission without capacity")  # _can_admit gates
        phys_new = self._slot_pages[slot][n_reused:]
        if phys_new:
            # rows source: whole-prompt prefill rows [1, s] (skip the reused
            # pages' share) or, under a hint, tail-only rows [1, s_tail]
            src_s = hint[2] if hint is not None else s
            n_valid = n_prompt - n_reused * page if hint is not None \
                else n_prompt
            skip = 0 if hint is not None else n_reused * page
            jkey = ("install", hint is not None, src_s, n_pages, n_reused)
            if jkey not in self._jit:
                int8 = self.kv_dtype == "int8"

                def install(kpools, vpools, k, v, phys, n_valid):
                    n_new = n_pages - n_reused
                    width = n_new * page
                    outk, outv = [], []
                    for kp, vp, ki, vi in zip(kpools, vpools, k, v):
                        rows_k = jnp.roll(ki[0], n_valid - src_s, axis=0)
                        rows_v = jnp.roll(vi[0], n_valid - src_s, axis=0)
                        full = skip + width
                        if full > src_s:
                            padding = ((0, full - src_s), (0, 0), (0, 0))
                            rows_k = jnp.pad(rows_k, padding)
                            rows_v = jnp.pad(rows_v, padding)
                        else:
                            rows_k = rows_k[:full]
                            rows_v = rows_v[:full]
                        rows_k = rows_k[skip:]     # reused pages keep theirs
                        rows_v = rows_v[skip:]
                        shp = (n_new, page) + rows_k.shape[1:]
                        if int8:
                            kc, ks = quantize_kv_rows(rows_k)
                            vc, vs = quantize_kv_rows(rows_v)
                            outk.append((kp[0].at[phys].set(kc.reshape(shp)),
                                         kp[1].at[phys].set(
                                             ks.reshape(shp[:-1]))))
                            outv.append((vp[0].at[phys].set(vc.reshape(shp)),
                                         vp[1].at[phys].set(
                                             vs.reshape(shp[:-1]))))
                        else:
                            outk.append(kp.at[phys].set(rows_k.reshape(shp)))
                            outv.append(vp.at[phys].set(rows_v.reshape(shp)))
                    return tuple(outk), tuple(outv)

                self._jit[jkey] = jax.jit(install)
            self._kpools, self._vpools = self._jit[jkey](
                self._kpools, self._vpools, k, v,
                jnp.asarray(phys_new, jnp.int32), jnp.int32(n_valid))
            # register the newly written FULL pages under their chain keys
            for i in range(n_reused, len(keys)):
                ph = self._slot_pages[slot][i]
                if keys[i] not in self._key_page:
                    self._key_page[keys[i]] = ph
                    self._page_key[ph] = keys[i]
        self._len = self._len.at[slot].set(n_prompt)
        self._slot_age[slot] = self._admit_seq
        self._admit_seq += 1

    def _finish(self, slot: int) -> None:
        self._release(slot)
        self._len = self._len.at[slot].set(0)
        super()._finish(slot)

    def _fail_all(self, exc: BaseException) -> None:
        """On a scheduler error every active slot's pages must be released
        (refcounts dropped, block tables cleared) before the parent fails
        the futures - otherwise the next request admitted into the slot
        misaligns against stale page lists and shared pages leak.

        The pools themselves are REBUILT, not kept: ``_decode_fn`` jits
        with ``donate_argnums`` on the pools, so a dispatch that fails
        mid-flight (e.g. a transient TPU tunnel error) may already have
        invalidated the donated buffers. Keeping serving with deleted
        pools would brick every subsequent chunk/install; fresh zero
        pools plus a reset allocator restore the documented
        fail-loudly-and-keep-serving behavior. Cached prefix pages live
        in the pools, so the prefix cache resets with them."""
        for slot, req in enumerate(self._slots):
            if req is not None:
                self._release(slot)
        self._remaining = jnp.zeros_like(self._remaining)
        self._len = jnp.zeros((self.B,), jnp.int32)
        c = self.cfg
        pool_shape = (self.P, self.page, c.num_key_value_heads, c.head_dim)
        if self.kv_dtype == "int8":
            self._kpools = tuple(
                (jnp.zeros(pool_shape, jnp.int8),
                 jnp.zeros(pool_shape[:-1], jnp.float32))
                for _ in range(c.num_hidden_layers))
            self._vpools = tuple(
                (jnp.zeros(pool_shape, jnp.int8),
                 jnp.zeros(pool_shape[:-1], jnp.float32))
                for _ in range(c.num_hidden_layers))
        else:
            self._kpools = tuple(jnp.zeros(pool_shape, self.engine.dtype)
                                 for _ in range(c.num_hidden_layers))
            self._vpools = tuple(jnp.zeros(pool_shape, self.engine.dtype)
                                 for _ in range(c.num_hidden_layers))
        self._free = list(range(self.P - 1, 0, -1))
        self._slot_pages = [[] for _ in range(self.B)]
        self._bt_host = np.zeros((self.B, self.NB), np.int32)
        self._page_ref = [0] * self.P
        self._page_key.clear()
        self._key_page.clear()
        self._cache_lru.clear()
        self._place_pool_state()
        super()._fail_all(exc)

    # -- decode ------------------------------------------------------------------

    def _decode_fn(self, chunk: int, with_filter: bool = True,
                   with_logprobs: bool = True):
        """Parent's chunked decode with paged K/V writes + paged attention
        (same static ``with_filter``/``with_logprobs`` variants)."""
        eng, c = self.engine, self.cfg
        b = self.B
        page = self.page
        pad_id = self.pad_id
        from multimodal_colpali_tpu.generation.engine import attn_scale

        sc = attn_scale(c)
        types = (c.layer_types_resolved
                 if getattr(c, "is_gemma3", False) else None)
        cross_mode = self._cross_mode
        if cross_mode:
            mm = self.mm_engine
            skv_max = self._cross_skv
            # {self_layer_idx: [(pool_row, global_idx), ...]} - pool rows
            # follow cfg.cross_attention_layers order (packed_cross_kv)
            cross_slots = {}
            order = {g: i for i, g in
                     enumerate(mm.cfg.cross_attention_layers)}
            for g, self_j in mm.cfg.cross_schedule:
                cross_slots.setdefault(self_j, []).append((order[g], g))

        def layer_window(i: int) -> int:
            """0 = full causal; else the layer's sliding window (Gemma-3
            local layers attend only the last `sliding_window` tokens)."""
            if types is not None and types[i] == "sliding_attention":
                return int(c.sliding_window)
            return 0

        def one_step(p, bt, cross, kpools, vpools, tok, pos, length, temp,
                     seed, remaining, gen_step, eos, top_p, top_k):
            x = eng._embed(p, tok[:, None])                     # [B, 1, H]
            active = remaining > 0
            rows = jnp.arange(b)
            # the new token lands at logical position `length`
            blk = bt[rows, length // page]
            blk = jnp.where(active, blk, 0)                     # trash page
            off = length % page
            att_len = length + active.astype(jnp.int32)

            # engine.layer_stack with paged K/V writes + paged attention
            if self.kv_dtype == "int8":
                def kv_write(i, k, v):
                    kc, ks = quantize_kv_rows(k[:, 0])   # [B, Hkv, D]/[B, Hkv]
                    vc, vs = quantize_kv_rows(v[:, 0])
                    kp, kps = kpools[i]
                    vp, vps = vpools[i]
                    return ((kp.at[blk, off].set(kc),
                             kps.at[blk, off].set(ks)),
                            (vp.at[blk, off].set(vc),
                             vps.at[blk, off].set(vs)))

                def attend(i, q, kp, vp):
                    return paged_attention_int8(
                        q[:, 0], kp[0], kp[1], vp[0], vp[1], bt, att_len,
                        scale=sc, window=layer_window(i))
            else:
                def kv_write(i, k, v):
                    return (kpools[i].at[blk, off].set(k[:, 0]),
                            vpools[i].at[blk, off].set(v[:, 0]))

                def attend(i, q, kp, vp):
                    return paged_attention(q[:, 0], kp, vp, bt, att_len,
                                           scale=sc, window=layer_window(i))

            inter = None
            if cross_mode:
                # Mllama cross hooks (the dense batcher's, verbatim): mm
                # slots attend their pooled vision keys; text slots run
                # the block under a uniform mask and DISCARD it (HF skips
                # cross layers on text-only inputs)
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

                inter = {j: make(e) for j, e in cross_slots.items()}

            xx, (new_k, new_v) = layer_stack(p, c, x, pos[:, None],
                                             kv_write, attend,
                                             interleave=inter)
            logits = eng._logits(p, xx[:, 0])                   # [B, V]

            nxt = sample_per_slot(logits, seed, gen_step, temp, top_p,
                                  top_k, use_filter=with_filter)
            nxt = jnp.where(active, nxt, jnp.int32(pad_id))
            if with_logprobs:
                lp, tid, tlp = _step_logprobs(logits, nxt)
            else:   # tiny placeholders keep the ys structure static
                lp = jnp.zeros((b,), jnp.float32)
                tid = jnp.zeros((b, 1), jnp.int32)
                tlp = jnp.zeros((b, 1), jnp.float32)

            length = jnp.where(active, length + 1, length)
            pos = jnp.where(active, pos + 1, pos)
            gen_step = jnp.where(active, gen_step + 1, gen_step)
            remaining = jnp.where(active, remaining - 1, remaining)
            remaining = jnp.where(nxt == eos, 0, remaining)
            return ((tuple(new_k), tuple(new_v), nxt, pos, length, temp,
                     seed, remaining, gen_step, eos, top_p, top_k),
                    (nxt, lp, tid, tlp))

        if cross_mode:
            # cross pools/params are decode CONSTANTS (scan closure, not
            # carry, never donated): written only at install time
            def run(p, bt, cp, ck, cv, clen, kpools, vpools, tok, pos,
                    length, temp, seed, remaining, gen_step, eos, top_p,
                    top_k):
                cross = (cp, ck, cv, clen)

                def body(carry, _):
                    carry, ys = one_step(p, bt, cross, *carry)
                    return carry, ys

                carry, ys = jax.lax.scan(
                    body,
                    (kpools, vpools, tok, pos, length, temp, seed,
                     remaining, gen_step, eos, top_p, top_k),
                    None, length=chunk)
                return carry, ys

            return jax.jit(run, donate_argnums=(6, 7))

        def run(p, bt, kpools, vpools, tok, pos, length, temp, seed,
                remaining, gen_step, eos, top_p, top_k):
            def body(carry, _):
                carry, ys = one_step(p, bt, None, *carry)
                return carry, ys

            carry, ys = jax.lax.scan(
                body,
                (kpools, vpools, tok, pos, length, temp, seed, remaining,
                 gen_step, eos, top_p, top_k),
                None, length=chunk)
            return carry, ys  # ys: (toks, lps, top_ids, top_lps) per step

        return jax.jit(run, donate_argnums=(2, 3))

    def _chunk_rows(self, rem: int) -> int:
        """KV rows one decode chunk may append for a slot with ``rem``
        budget left (the speculative subclass emits up to spec_k per scan
        step and writes spec_k - 1 stale verify rows past the last)."""
        return min(self.chunk, rem)

    def _ensure_chunk_capacity(self) -> None:
        """Grant every active slot pages for the coming chunk, preempting
        youngest-first when the pool runs dry. Oldest slots are served
        first, so the oldest request always makes progress."""
        order = sorted(
            (slot for slot, r in enumerate(self._slots) if r is not None),
            key=lambda slot: self._slot_age[slot])
        lens = np.asarray(self._len)
        rem = np.asarray(self._remaining)
        for slot in order:
            if self._slots[slot] is None:   # preempted by an earlier pass
                continue
            want = int(lens[slot]) + self._chunk_rows(int(rem[slot]))
            while not self._alloc_to(slot, want):
                if not self._preempt_youngest(protect=slot):
                    raise RuntimeError(
                        f"slot {slot} needs {want} tokens of KV but the "
                        f"pool cannot hold them even alone")

    def _step_chunk(self) -> None:
        self._ensure_chunk_capacity()
        if not any(r is not None for r in self._slots):
            return
        flags = self._decode_flags()
        if ("decode", flags) not in self._jit:
            self._jit[("decode", flags)] = self._decode_fn(self.chunk, *flags)
        rem_before = np.asarray(self._remaining)  # real tokens this chunk
        extra = ((self.mm_engine.cross_params, self._cross_k,
                  self._cross_v, self._cross_len)
                 if self._cross_mode else ())
        carry, ys = self._jit[("decode", flags)](
            self.engine.params, jnp.asarray(self._bt_host), *extra,
            self._kpools, self._vpools, self._tok, self._pos, self._len,
            self._temp, self._seed, self._remaining, self._gen_step,
            self._eos, self._top_p, self._top_k)
        (self._kpools, self._vpools, self._tok, self._pos, self._len,
         self._temp, self._seed, self._remaining, self._gen_step,
         self._eos, self._top_p, self._top_k) = carry
        self._account_chunk(ys, rem_before)
