"""Continuous-batching generation engine.

The scheduler keeps a fixed set of decode slots; requests are admitted
into free slots whenever the page pool can hold their prompt (prefill
runs immediately, padded to a page multiple), and every engine tick
decodes up to ``decode_chunk`` tokens for *all* active slots in a
single jitted dispatch with on-device sampling — the host syncs once
per chunk, not per token (critical when the chip is remote-attached).
Finished requests free their pages on the spot — admission and
completion interleave freely, no generation-length batching.

Single-host by default; under a TP mesh the same engine works with
sharded params and a head-sharded KV pool (pages shard on the kv-head
axis) — see tgq.parallel.
"""
from __future__ import annotations

import dataclasses
import logging
import time
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tgq.models.config import ModelConfig
from tgq.serve.decode import decode_steps, prefill_batch
from tgq.serve.kv_cache import PagedKVCache, PageTable

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ServeConfig:
    max_slots: int = 8
    page_size: int = 64
    num_pages: int = 512
    max_pages_per_slot: int = 32
    max_new_tokens: int = 128
    eos_id: Optional[int] = None
    temperature: float = 0.0  # 0 = greedy
    seed: int = 0
    # max decode steps fused into one device dispatch (host syncs once
    # per chunk; sampling runs on device).  Rounded down to a power of
    # two per tick so at most log2(chunk)+1 step counts ever compile.
    decode_chunk: int = 8
    # KV storage: 16 = bf16, 8 = int8 with per-token-per-head scales
    # (halves decode-attention traffic, doubles cache capacity)
    kv_bits: int = 16
    # optional static per-channel equalizers for quantized KV, each
    # (layers, kv_heads·head_dim): rows store K/k_eq, V/v_eq so channel
    # outliers stop consuming the per-token dynamic range (see
    # tgq.serve.kv_cache + tgq.serve.kv_calibrate.estimate_kv_equalizers)
    kv_k_eq: Optional[object] = None
    kv_v_eq: Optional[object] = None
    # decode attention backend: "auto" | "kernel" | "gather"
    attn_impl: str = "auto"
    # activation precision for the packed matmuls: 16 = bf16 MXU, 8 =
    # W4A8 (per-token-absmax int8 activations on the int8 MXU, 2× the
    # bf16 rate on v5e — tgq.kernels.dequant_matmul._a8_matmul_kernel).
    # Applies to decode AND prefill; w_bits must be <= 4.  Off-TPU
    # backends simulate the same semantics by fake-quantizing
    # activations in the XLA path.
    a_bits: int = 16
    # dispatch decode chunk N+1 from the on-device token carry before
    # fetching chunk N's tokens: the device runs continuously while the
    # host processes results (token-identical; a slot that finishes
    # mid-pipeline — EOS or budget — just discards its speculative
    # tokens, and its pages are held back from the free pool until the
    # in-flight chunk's device work has completed)
    overlap_host: bool = True
    # chunked prefill: cap the PADDED prompt tokens admitted per prefill
    # dispatch, and dispatch prefill chunks ASYNCHRONOUSLY between
    # decode chunks (collected one tick later).  A monolithic admission
    # wave stalls the decode stream for the whole wave's prefill and
    # gives every admitted request the same worst-case TTFT; chunking
    # streams first tokens out as each chunk lands while decode of
    # already-admitted slots interleaves on the device.  0 = unbounded
    # (one wave, the pre-r4 behavior).
    prefill_chunk_tokens: int = 4096


@dataclasses.dataclass
class _Chunk:
    """An in-flight decode chunk: device token block + the slot↔request
    binding at dispatch time.  ``deferred`` collects pages of slots
    retired while this chunk was still executing — the chunk's
    dispatch-time page table maps to them, so they only return to the
    free pool after the chunk's outputs are fetched (a real device
    sync), in :meth:`Engine._collect`."""

    toks: object                      # (n, slots) int32 device array
    group: list                       # [(slot, Request), ...]
    n: int
    deferred: list = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class _PrefillChunk:
    """An in-flight (async) prefill dispatch: first-token device array +
    the slot↔request binding.  Its slots sit in ``Engine._staging`` —
    occupied (pages allocated, KV being written on device) but excluded
    from decode dispatches until the tokens are collected."""

    toks: object                      # (b,) int32 device array
    group: list                       # [(slot, Request), ...]


@dataclasses.dataclass
class Request:
    rid: int
    prompt: list[int]
    max_new_tokens: int = 128
    temperature: Optional[float] = None
    output: list[int] = dataclasses.field(default_factory=list)
    done: bool = False
    submit_t: float = 0.0
    first_token_t: float = 0.0
    finish_t: float = 0.0


def _mark_act_bits(params, bits: int):
    """Tag every packed DECODER-LAYER linear with the activation
    precision (W4A8); the lm_head stays on its own path (int8 weights
    dequantize to bf16 — bandwidth-bound, and its 8-bit codes cannot
    zero-shift into int8).  Returns ``(params, n_marked)`` so the
    caller can detect a silent no-op (w_bits > 4 packs nothing the A8
    kernel can run)."""
    from tgq.core.packing import PackedLinear

    n_marked = 0

    def walk(node):
        nonlocal n_marked
        if isinstance(node, PackedLinear):
            if node.bits in (2, 3, 4):
                n_marked += 1
                return dataclasses.replace(node, act_bits=bits)
            return node
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params), n_marked


class Engine:
    def __init__(self, params, cfg: ModelConfig, scfg: ServeConfig, mesh=None,
                 stack_layers: bool = True):
        """``mesh``: optional ("data","model") Mesh — params are TP-sharded
        per tgq.parallel rules and the KV page pools shard on the kv-head
        axis, so the same engine serves single-chip or a whole slice.
        ``stack_layers``: scan-friendly stacked layer params (one traced
        decode layer regardless of depth)."""
        assert cfg.family == "llama", (
            "the serving engine is llama-family by design (rope/GQA "
            "decode path — README.md §Supported architectures); "
            "gpt2/opt-family models quantize/eval/export but generate "
            "through tgq.models.causal_lm.forward or an HF runtime via "
            "hf_export")
        self.cfg = cfg
        self.scfg = scfg
        self.mesh = mesh
        self.a8_active = False
        if scfg.a_bits == 8:
            params, n_marked = _mark_act_bits(params, 8)
            self.a8_active = n_marked > 0
            if not self.a8_active:
                logger.warning(
                    "a_bits=8 requested but no decoder-layer linear is "
                    "packed at bits<=4 — A8 is a no-op (w_bits > 4?)")
        if stack_layers:
            from tgq.serve.decode import (fuse_packed_projections,
                                          stack_layer_params)

            if mesh is None:
                # fuse q/k/v and gate/up packed projections (exact; the
                # TP rules shard the unfused names, so mesh path skips)
                params = fuse_packed_projections(params)
            params = stack_layer_params(params)
        # int4 pools under TP: segment the nibble packing at shard
        # boundaries so each shard's byte slice is self-contained and
        # the fused attention kernel stays available (kv_cache
        # pack_segments; r4 VERDICT directive #4)
        tp = 1 if mesh is None else mesh.shape.get("model", 1)
        segments = tp if (scfg.kv_bits == 4 and tp > 1
                          and cfg.num_kv_heads % tp == 0) else 1
        cache = PagedKVCache.init(cfg, scfg.num_pages, scfg.page_size,
                                  kv_bits=scfg.kv_bits,
                                  k_eq=scfg.kv_k_eq, v_eq=scfg.kv_v_eq,
                                  pack_segments=segments)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from tgq.parallel import mark_tp_kinds, shard_params
            import dataclasses as _dc

            # tag packed projections with their TP role so apply_linear
            # routes them through the shard_map'd fused kernel
            params = mark_tp_kinds(params)
            self.params = shard_params(params, mesh)
            # pools shard on the kv-head axis: k/v (L, P, page, kvh·d)
            # shard the fused head dim; scales (L, P, kvh, spad) shard
            # the head dim directly
            kv_sh = NamedSharding(mesh, P(None, None, None, "model"))
            s_sh = NamedSharding(mesh, P(None, None, "model", None))
            eq_sh = NamedSharding(mesh, P(None, "model"))
            self.cache = _dc.replace(
                cache,
                k=jax.device_put(cache.k, kv_sh),
                v=jax.device_put(cache.v, kv_sh),
                ks=None if cache.ks is None else jax.device_put(cache.ks, s_sh),
                vs=None if cache.vs is None else jax.device_put(cache.vs, s_sh),
                k_eq=(None if cache.k_eq is None
                      else jax.device_put(cache.k_eq, eq_sh)),
                v_eq=(None if cache.v_eq is None
                      else jax.device_put(cache.v_eq, eq_sh)),
            )
        else:
            self.params = params
            self.cache = cache
        from tgq.serve.decode import default_attn_impl

        # "auto" (default): fused kernel on TPU (single-device or TP
        # with per-shard DMA alignment — including the tighter int4
        # nibble-packed lane extent), gather elsewhere; override for
        # experiments / interpret-mode testing
        self.attn_impl = (scfg.attn_impl if scfg.attn_impl != "auto"
                          else default_attn_impl(mesh, cfg, scfg.kv_bits,
                                                 kv_segments=segments))
        self.pt = PageTable(scfg.num_pages, scfg.page_size, scfg.max_slots,
                            scfg.max_pages_per_slot)
        self.slots: list[Optional[Request]] = [None] * scfg.max_slots
        self.queue: deque[Request] = deque()
        self.key = jax.random.key(scfg.seed)
        self._next_rid = 0
        self.steps = 0
        self.tokens_emitted = 0
        self.decode_wall_s = 0.0   # time in decode dispatch + token D2H
        self.prefill_wall_s = 0.0  # time in prefill dispatch + sampling
        # in-flight decode chunks (_Chunk): _pending awaits collection;
        # _spec is the speculative successor during the collect of
        # _pending (visible to _retire so it can defer page frees)
        self._pending: Optional[_Chunk] = None
        self._spec: Optional[_Chunk] = None
        # in-flight prefill chunks (oldest first) + their staging slots
        # (occupied but not yet decodable — first tokens still on
        # device).  Two chunks ride in flight during an admission burst
        # so the device prefills back-to-back while the host collects —
        # one-deep left a dispatch-latency bubble between chunks.
        self._pf: deque[_PrefillChunk] = deque()
        self._staging: set = set()

    # ------------------------------------------------------------- API

    def submit(self, prompt: list[int], max_new_tokens: Optional[int] = None,
               temperature: Optional[float] = None) -> Request:
        req = Request(
            rid=self._next_rid, prompt=list(prompt),
            max_new_tokens=max_new_tokens or self.scfg.max_new_tokens,
            temperature=temperature, submit_t=time.time(),
        )
        self._next_rid += 1
        self.queue.append(req)
        return req

    @property
    def idle(self) -> bool:
        """True when nothing is queued, active, or in flight."""
        return not (self.queue or any(self.slots)
                    or self._pending is not None or self._pf)

    def step(self) -> list[Request]:
        """ONE engine tick: chunked/async admission, then (unless more
        of the queue can be admitted right now) one decode chunk.
        Returns the requests that finished this tick.

        This is the incremental serving surface (r4 VERDICT directive
        #5): callers interleave :meth:`submit` with ``step()`` freely —
        a request submitted while earlier ones are mid-decode joins the
        next admission chunk, exactly as in :meth:`run` (which is just
        ``while not idle: step()``).  Greedy outputs are per-slot
        deterministic (no cross-slot ops in the decode step), so a
        late-submitted request's tokens are identical to a fresh-queue
        run (tests/test_serve.py::test_engine_step_mid_flight_submit).
        """
        self._admit()
        if self._can_admit_more():
            return []
        return self._decode_tick()

    def run(self) -> list[Request]:
        """Drive until queue and slots are empty; returns finished reqs.

        Admission is prefill-priority (the standard continuous-batching
        policy): while free slots and pages can take queued prompts,
        admission chunks dispatch back-to-back and decode waits — first
        tokens stream out chunk by chunk instead of after one monolithic
        wave.  Once the admissible backlog is in slots, decode chunks
        and (as slots free up) further prefill chunks interleave."""
        finished: list[Request] = []
        while not self.idle:
            finished.extend(self.step())
        return finished

    # -------------------------------------------------------- internals

    def _can_admit_more(self) -> bool:
        """True while the head of the queue could join a prefill chunk
        right now (free slot + pages) — run() then keeps admitting
        before the next decode chunk."""
        if not self.queue:
            return False
        if not any(s is None for s in self.slots):
            return False
        return (self.pt.num_free
                >= self.pt.pages_needed(len(self.queue[0].prompt) + 1))

    def _admit(self) -> None:
        """Chunked, asynchronous admission.  Collect the in-flight
        prefill chunk (the only blocking sync), then dispatch at most
        ONE new chunk — head-of-queue requests whose prompts pad to the
        same page multiple, bounded by free slots, the page pool, and
        ``prefill_chunk_tokens`` of padded prompt — WITHOUT waiting for
        it.  A chunk's slots sit in ``_staging`` until collection and
        join decode on the next tick; on-device sampling means only the
        (b,) first-token array ever crosses to the host."""
        page = self.scfg.page_size
        while len(self._pf) >= 2:
            self._collect_prefill()
        if not self.queue:
            return
        free = [s for s in range(self.scfg.max_slots)
                if self.slots[s] is None]
        if not free:
            return
        head_pages = self.pt.pages_needed(len(self.queue[0].prompt))
        cap_tok = self.scfg.prefill_chunk_tokens or 0
        group: list[Request] = []
        budget = self.pt.num_free
        for req in self.queue:
            need = self.pt.pages_needed(len(req.prompt) + 1)
            if (self.pt.pages_needed(len(req.prompt)) != head_pages
                    or need > budget or len(group) >= len(free)
                    or (group and cap_tok
                        and (len(group) + 1) * head_pages * page > cap_tok)):
                break
            group.append(req)
            budget -= need
        if not group:
            return  # head of queue doesn't fit yet
        b = 1 << (len(group).bit_length() - 1)  # power-of-two batch
        group = group[:b]
        t0 = time.time()
        pad = head_pages * page
        ids = np.zeros((b, pad), np.int32)
        true_len = np.zeros((b,), np.int32)
        temps = np.zeros((b,), np.float32)
        slot_pages = np.zeros((b, head_pages), np.int32)
        slots = free[:b]
        for i, (s, req) in enumerate(zip(slots, group)):
            self.queue.popleft()
            n_prompt = len(req.prompt)
            ids[i, :n_prompt] = req.prompt
            true_len[i] = n_prompt
            temps[i] = (req.temperature if req.temperature is not None
                        else self.scfg.temperature)
            slot_pages[i] = self.pt.alloc_slot(s, n_prompt)
            self.slots[s] = req
        toks, self.cache, self.key = prefill_batch(
            self.params, self.cache, self.cfg,
            jnp.asarray(slot_pages), jnp.asarray(ids),
            jnp.asarray(true_len), jnp.asarray(temps), self.key,
            mesh=self.mesh,
            greedy_only=bool((temps == 0).all()),
        )
        self.prefill_wall_s += time.time() - t0
        self._pf.append(_PrefillChunk(toks, list(zip(slots, group))))
        self._staging.update(slots)

    def _collect_prefill(self) -> None:
        """Fetch the oldest in-flight prefill chunk's first tokens (a
        real device sync on that dispatch) and make its slots
        decodable."""
        chunk = self._pf.popleft()
        t0 = time.time()
        toks = np.asarray(chunk.toks)  # blocks on the prefill dispatch
        now = time.time()
        self.prefill_wall_s += now - t0
        for i, (s, req) in enumerate(chunk.group):
            self._staging.discard(s)
            tok = int(toks[i])
            req.output.append(tok)
            req.first_token_t = now
            self.tokens_emitted += 1
            if self._finished(req, tok):
                self._retire(s)

    def _finished(self, req: Request, tok: int) -> bool:
        if self.scfg.eos_id is not None and tok == self.scfg.eos_id:
            return True
        return len(req.output) >= req.max_new_tokens

    def _retire(self, s: int) -> None:
        req = self.slots[s]
        req.done = True
        req.finish_t = time.time()
        # if an in-flight chunk's dispatch-time table maps this slot's
        # pages, they must not re-enter the free pool until that chunk's
        # device work completes — detach now, release at its collect
        holder = None
        for chunk in (self._spec, self._pending):
            if chunk is not None and any(cs == s for cs, _ in chunk.group):
                holder = chunk
                break  # newest in-flight chunk outlives the older one
        if holder is not None:
            holder.deferred.extend(self.pt.detach_slot(s))
        else:
            self.pt.free_slot(s)
        self.slots[s] = None

    def _chunk_steps(self, active: list[int], lens0: np.ndarray) -> int:
        """Decode steps to fuse this tick: bounded by every active
        slot's remaining budget (so no slot overshoots max_new_tokens),
        by free pages, and rounded down to a power of two."""
        n = self.scfg.decode_chunk
        cap = self.scfg.max_pages_per_slot * self.scfg.page_size
        for s in active:
            req = self.slots[s]
            n = min(n, req.max_new_tokens - len(req.output),
                    cap - int(lens0[s]))
        n = max(n, 1)
        while n > 1:
            extra = sum(
                self.pt.pages_needed(int(lens0[s]) + n)
                - self.pt.pages_needed(int(lens0[s]))
                for s in active)
            if extra <= self.pt.num_free:
                break
            n //= 2
        return 1 << (n.bit_length() - 1)

    def _dispatch(self, tokens, active: list[int]) -> _Chunk:
        """Dispatch one decode chunk (async).  ``tokens``: (slots,)
        int32, host or device (the speculative path feeds the previous
        chunk's on-device carry directly — no D2H on the critical path).
        Returns the in-flight :class:`_Chunk`."""
        lens0 = np.asarray(self.pt.lens, np.int32)
        n = self._chunk_steps(active, lens0)
        for s in active:
            self.pt.extend(s, n)
        table, _ = self.pt.device_tables()
        temps = np.zeros((self.scfg.max_slots,), np.float32)
        for s in active:
            req = self.slots[s]
            temps[s] = (req.temperature if req.temperature is not None
                        else self.scfg.temperature)
        # decode_step convention at step 0: lens includes the token
        # being decoded, pos = lens - 1
        # static greedy flag: when every active slot decodes greedily
        # (the serving default), _sample_tokens skips the categorical
        # path — ~300 MB/step of thrown-away gumbel work at a 152k
        # vocab.  At most two jit variants exist (greedy / sampled).
        greedy = all(temps[s] == 0 for s in active)
        # per-slot write gate: the step computes ALL slots (static
        # shapes) but only active ones may write KV — retired slots
        # would race on the page-0 scratch rows and prefill-staging
        # slots would scribble their own pages
        live = np.zeros((self.scfg.max_slots,), np.int32)
        live[active] = 1
        toks, self.cache, self.key = decode_steps(
            self.params, self.cache, self.cfg, table,
            jnp.asarray(lens0 + 1), jnp.asarray(tokens),
            jnp.asarray(lens0), jnp.asarray(temps), self.key, n,
            self.attn_impl, mesh=self.mesh, greedy_only=greedy,
            live=jnp.asarray(live),
        )
        self.steps += n
        return _Chunk(toks, [(s, self.slots[s]) for s in active], n)

    def _can_speculate(self, pending: _Chunk) -> bool:
        """Safe to dispatch chunk N+1 before reading chunk N's tokens.

        A queued backlog does NOT disable pipelining: admission needs a
        retired slot, and the budget checks below already refuse to
        speculate past any budget-driven retirement — so speculating
        never delays an admission point except after an EOS surprise,
        which (like all mid-chunk finishes) just discards its
        speculative tokens at collect and defers its pages until the
        in-flight chunk's device work completes (``_retire``).  One
        chunk of TTFT risk vs a full host round-trip per chunk for the
        whole backlog phase."""
        if not self.scfg.overlap_host:
            return False
        cap = self.scfg.max_pages_per_slot * self.scfg.page_size
        for s, req in pending.group:
            if self.slots[s] is not req:
                return False
            if len(req.output) + pending.n >= req.max_new_tokens:
                return False  # finishes during the pending chunk
            if int(self.pt.lens[s]) + 1 > cap:
                return False
        return True

    def _collect(self, chunk: _Chunk) -> list[Request]:
        """Fetch a dispatched chunk's tokens and fold them into requests.
        Slots whose request was retired (or replaced) since dispatch
        discard their tokens — they were speculative garbage."""
        t0 = time.time()
        toks = np.asarray(chunk.toks)  # (n, slots) — blocks on the chunk
        self.decode_wall_s += time.time() - t0
        finished = []
        for s, req in chunk.group:
            if self.slots[s] is not req:
                continue
            for i in range(chunk.n):
                tok = int(toks[i, s])
                req.output.append(tok)
                self.tokens_emitted += 1
                if self._finished(req, tok):
                    # tokens past EOS were speculative garbage; the
                    # unused tail of the chunk's pages frees with the slot
                    self._retire(s)
                    finished.append(req)
                    break
        # the token fetch above is a real device sync: every KV write of
        # this chunk has landed, so pages deferred to it are safe to reuse
        if chunk.deferred:
            self.pt.release_pages(chunk.deferred)
            chunk.deferred = []
        return finished

    def _decode_tick(self) -> list[Request]:
        if self._pending is None:
            # about to form a fresh decode dispatch: in-flight prefill
            # chunks' device work precedes anything we dispatch now, so
            # collecting them first costs no device time and lets their
            # slots join this chunk instead of idling through it
            while self._pf:
                self._collect_prefill()
        # staging slots (in-flight prefill) are occupied but their first
        # token is still on device — they join decode after collection
        active = [s for s in range(self.scfg.max_slots)
                  if self.slots[s] and s not in self._staging]
        if self._pending is None:
            if not active:
                return []
            tokens = np.zeros((self.scfg.max_slots,), np.int32)
            for s in active:
                tokens[s] = self.slots[s].output[-1]
            t0 = time.time()
            self._pending = self._dispatch(tokens, active)
            self.decode_wall_s += time.time() - t0

        pending = self._pending
        # never speculate past a change in the decodable set: newly
        # collected prefill slots must join the next dispatch, so the
        # pipeline re-forms instead of chaining the stale group
        if (self._can_speculate(pending)
                and set(active) == {s for s, _ in pending.group}):
            # chunk N+1 from chunk N's on-device final tokens — the
            # device stays busy while the host fetches/processes N
            t0 = time.time()
            self._spec = self._dispatch(pending.toks[-1],
                                        [s for s, _ in pending.group])
            self.decode_wall_s += time.time() - t0
        out = self._collect(pending)  # retires may defer pages to _spec
        self._pending, self._spec = self._spec, None
        return out
