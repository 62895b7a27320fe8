"""Paged KV cache for the serving engine — bf16 or quantized INT8.

The reference has no serving side at all (SURVEY.md §0); this is the
BASELINE.json north-star component, built jax-native:

- one global **page pool** stacked over layers: K and V of shape
  ``(layers, num_pages, page_size, kv_heads·head_dim)`` living on device
  (sharded on the "model" axis by head under TP).  The head and feature
  dims stay fused so one page is a single contiguous 2-D block — the
  paged-attention kernel DMAs it in one async copy covering every KV
  head (tgq.kernels.paged_attention).  Storage is bf16, or **int8 with
  per-token-per-head absmax scales** (``kv_bits=8``, KIVI/InnerQ-style
  tuning-free KV quantization — PAPERS.md): halves decode-attention HBM
  traffic and doubles the contexts that fit.  Scales live as
  ``(layers, num_pages, kv_heads, scale_pad)`` f32 with the token dim
  lane-padded to a multiple of 128 (TPU DMA slices need 128-aligned
  lane extents);
- a host-side **allocator** (free list) and a device **page table**
  (slots × max_pages_per_slot int32) mapping each decode slot's logical
  blocks to physical pages — slots admit/finish without moving KV;
- decode writes one (k, v) per slot per step with a vectorized scatter
  into (layer, page, offset) — the layer index keeps every update a
  dynamic-update-slice on the *stacked* pools, so the decode scan never
  slices out (= copies) a layer's pools.  Shapes are fully static:
  every jit sees (slots, max_pages_per_slot, page_size, ...) regardless
  of occupancy.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tgq.models.config import ModelConfig


def scale_pad(page_size: int) -> int:
    """Token-dim padding of the scale pools (128-aligned DMA lanes)."""
    return max(128, -(-page_size // 128) * 128)


class PageTable:
    """Host-side page allocator + per-slot logical→physical mapping.

    Two interchangeable backends with identical semantics: the native
    C++ allocator (tgq/_native/pagealloc.cc — the production serving
    runtime) and a pure-Python fallback.  Page 0 is reserved as the
    scratch page: freed/inactive slots' table entries clamp to it, so
    the decode step's vectorized scatter for inactive slots lands
    somewhere harmless.
    """

    def __init__(self, num_pages: int, page_size: int, max_slots: int,
                 max_pages_per_slot: int, backend: str = "auto"):
        import numpy as np

        self.num_pages = num_pages
        self.page_size = page_size
        self.max_slots = max_slots
        self.max_pages_per_slot = max_pages_per_slot
        self._tbuf = np.zeros((max_slots, max_pages_per_slot), np.int32)
        self._lbuf = np.zeros((max_slots,), np.int32)

        self._native = None
        if backend in ("auto", "native"):
            from tgq._native import get_page_alloc_cls

            cls = get_page_alloc_cls()
            if cls is not None:
                self._native = cls(num_pages=num_pages, page_size=page_size,
                                   max_slots=max_slots,
                                   max_pages_per_slot=max_pages_per_slot)
            elif backend == "native":
                raise RuntimeError("native page allocator unavailable")
        if self._native is None:
            self._free = list(range(num_pages - 1, 0, -1))
            self._table = [[-1] * max_pages_per_slot for _ in range(max_slots)]
            self._lens = [0] * max_slots

    # ------------------------------------------------------------- API

    def pages_needed(self, n_tokens: int) -> int:
        return -(-n_tokens // self.page_size)

    @property
    def num_free(self) -> int:
        if self._native is not None:
            return self._native.num_free()
        return len(self._free)

    @property
    def lens(self) -> list[int]:
        if self._native is not None:
            return [self._native.get_len(s) for s in range(self.max_slots)]
        return list(self._lens)

    def can_alloc(self, n_tokens: int) -> bool:
        return self.num_free >= self.pages_needed(n_tokens)

    def alloc_slot(self, slot: int, n_tokens: int) -> tuple[int, ...]:
        """Allocate a slot's prompt pages; returns the physical pages."""
        if self._native is not None:
            return self._native.alloc_slot(slot, n_tokens)
        need = self.pages_needed(n_tokens)
        assert need <= self.max_pages_per_slot, (need, self.max_pages_per_slot)
        assert len(self._free) >= need, "page pool exhausted"
        for i in range(need):
            self._table[slot][i] = self._free.pop()
        self._lens[slot] = n_tokens
        return tuple(self._table[slot][:need])

    def extend(self, slot: int, n_new: int = 1) -> None:
        """Grow a slot by n_new tokens, allocating pages on crossing."""
        if self._native is not None:
            self._native.extend(slot, n_new)
            return
        old = self._lens[slot]
        new = old + n_new
        have = self.pages_needed(old) if old else 0
        need = self.pages_needed(new)
        for i in range(have, need):
            assert self._free, "page pool exhausted"
            self._table[slot][i] = self._free.pop()
        self._lens[slot] = new

    def free_slot(self, slot: int) -> None:
        if self._native is not None:
            self._native.free_slot(slot)
            return
        for i, p in enumerate(self._table[slot]):
            if p >= 0:
                self._free.append(p)
                self._table[slot][i] = -1
        self._lens[slot] = 0

    def detach_slot(self, slot: int) -> tuple[int, ...]:
        """Clear a slot's mapping WITHOUT returning its pages to the
        free pool — for retiring a slot while an in-flight speculative
        decode chunk may still write to those pages.  The caller hands
        the returned pages to :meth:`release_pages` once the chunk's
        device work has provably completed (its outputs fetched)."""
        if self._native is not None:
            return self._native.detach_slot(slot)
        pages = tuple(p for p in self._table[slot] if p >= 0)
        self._table[slot] = [-1] * self.max_pages_per_slot
        self._lens[slot] = 0
        return pages

    def release_pages(self, pages) -> None:
        """Return detached pages to the free pool."""
        if self._native is not None:
            self._native.release_pages(tuple(int(p) for p in pages))
            return
        self._free.extend(int(p) for p in pages)

    def slot_pages(self, slot: int) -> tuple[int, ...]:
        if self._native is not None:
            return self._native.slot_pages(slot)
        return tuple(p for p in self._table[slot] if p >= 0)

    def device_tables(self):
        """(table (slots, mpps) int32 — freed entries clamp to page 0 —
        and lens (slots,) int32) for the jitted step."""
        import numpy as np

        if self._native is not None:
            self._native.fill_tables(self._tbuf, self._lbuf)
            return jnp.asarray(self._tbuf), jnp.asarray(self._lbuf)
        t = np.asarray(self._table, np.int32)
        np.copyto(self._tbuf, np.where(t < 0, 0, t))
        self._lbuf[:] = self._lens
        return jnp.asarray(self._tbuf), jnp.asarray(self._lbuf)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Layer-stacked device page pools.

    k/v: (layers, num_pages, page_size, kv_heads·head_dim); for
    ``kv_bits=8`` the pools are int8 and ks/vs hold per-token-per-head
    absmax scales (layers, num_pages, kv_heads, scale_pad) f32 — token
    dim lane-padded, entries ≥ page_size unused.  For ``kv_bits=4`` the
    pools are **uint8 nibble-packed split-half along the fused dim**
    (byte j holds features j and j+fused/2, biased codes c+8 ∈ [0,15]);
    the dtype alone distinguishes the formats (int8 ⇒ 8-bit, uint8 ⇒
    4-bit) so no extra flag reaches the attention kernel.
    """

    k: jax.Array
    v: jax.Array
    ks: Optional[jax.Array] = None
    vs: Optional[jax.Array] = None
    # static per-channel equalizers (layers, kv_heads·head_dim) f32:
    # quantized writes store K/k_eq and V/v_eq with per-token absmax
    # scales on the *equalized* rows, reads multiply back.  Channel-wise
    # outliers (V especially — KIVI/KVQuant observation) stop consuming
    # the per-token dynamic range.  Exact identity when None/ones.
    # Kernel-path algebra: K-eq folds into the query ((q·eq)·K_q) and
    # V-eq into the attention output — zero extra kernel work.
    k_eq: Optional[jax.Array] = None
    v_eq: Optional[jax.Array] = None
    # required (kw-only): a silently-defaulted value mis-derives
    # head_dim/fused_dim for any cache built outside .init()
    num_kv_heads: int = dataclasses.field(
        kw_only=True, metadata=dict(static=True))
    # int4 nibble layout: the fused row is divided into ``pack_segments``
    # equal contiguous segments, each packed split-half INTERNALLY.
    # pack_segments == tp makes every TP shard's byte slice a
    # self-contained split-half block of exactly its own kv heads, so
    # the fused attention kernel's lane-concat unpack works per shard
    # (r4 VERDICT directive #4); 1 (default) is the single-device
    # global split-half layout, unchanged.
    pack_segments: int = dataclasses.field(
        default=1, kw_only=True, metadata=dict(static=True))

    def __post_init__(self):
        # guard: JAX tree transforms may unflatten with sentinel leaves
        shape = getattr(self.k, "shape", None)
        if shape is not None and len(shape) == 4 and hasattr(self.k, "dtype"):
            assert self.fused_dim % self.num_kv_heads == 0, (
                shape, self.num_kv_heads)

    @classmethod
    def init(cls, cfg: ModelConfig, num_pages: int, page_size: int,
             dtype=jnp.bfloat16, kv_bits: int = 16,
             k_eq=None, v_eq=None,
             pack_segments: int = 1) -> "PagedKVCache":
        fused = cfg.num_kv_heads * cfg.head_dim
        shape = (cfg.num_layers, num_pages, page_size, fused)
        if kv_bits in (8, 4):
            sshape = (cfg.num_layers, num_pages, cfg.num_kv_heads,
                      scale_pad(page_size))
            if kv_bits == 4:
                shape = shape[:-1] + (fused // 2,)
                assert cfg.num_kv_heads % pack_segments == 0 and (
                    fused // pack_segments) % 2 == 0, (
                    cfg.num_kv_heads, pack_segments)
            dt = jnp.int8 if kv_bits == 8 else jnp.uint8
            eq = lambda e: (None if e is None  # noqa: E731
                            else jnp.asarray(e, jnp.float32).reshape(
                                cfg.num_layers, fused))
            return cls(k=jnp.zeros(shape, dt),
                       v=jnp.zeros(shape, dt),
                       ks=jnp.zeros(sshape, jnp.float32),
                       vs=jnp.zeros(sshape, jnp.float32),
                       k_eq=eq(k_eq), v_eq=eq(v_eq),
                       num_kv_heads=cfg.num_kv_heads,
                       pack_segments=(pack_segments if kv_bits == 4
                                      else 1))
        assert kv_bits == 16, kv_bits
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   num_kv_heads=cfg.num_kv_heads)

    @property
    def kv_bits(self) -> int:
        if self.k.dtype == jnp.uint8:
            return 4
        return 8 if self.k.dtype == jnp.int8 else 16

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def fused_dim(self) -> int:
        f = self.k.shape[3]
        return f * 2 if self.kv_bits == 4 else f

    @property
    def head_dim(self) -> int:
        return self.fused_dim // self.num_kv_heads


def _absmax_quantize(x: jax.Array):
    """(..., d) f32 → int8 codes + (...,) f32 scale (per-vector absmax)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-10)
    q = jnp.round(xf / s[..., None]).astype(jnp.int8)
    return q, s


def _absmax_quantize4(x: jax.Array, segments: int = 1):
    """(..., kvh, d) f32 → nibble-packed uint8 (..., kvh·d/2) +
    (..., kvh) f32 per-head scales.

    Scales are per token per head (symmetric absmax/7, codes clipped to
    [-7, 7]); packing is split-half within each of ``segments`` equal
    contiguous chunks of the fused row (default 1 = the whole row) —
    within a segment, byte j = (c[j]+8) | ((c[j+S/2]+8) << 4), so a
    segment unpacks with one lane-concat regardless of head boundaries
    (kv_unpack4).  ``segments == tp`` aligns segment boundaries with TP
    shard boundaries (engine sets it), making each shard's byte slice
    self-contained."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 7.0, 1e-10)
    q = jnp.clip(jnp.round(xf / s[..., None]), -7, 7).astype(jnp.int32) + 8
    flat = q.reshape(*q.shape[:-2], -1)
    fused = flat.shape[-1]
    assert fused % (2 * segments) == 0, (fused, segments)
    seg = flat.reshape(*flat.shape[:-1], segments, fused // segments)
    half = fused // segments // 2
    packed = (seg[..., :half] | (seg[..., half:] << 4)).reshape(
        *flat.shape[:-1], fused // 2)
    return packed.astype(jnp.uint8), s


def kv_unpack4(w: jax.Array, dtype=jnp.float32,
               segments: int = 1) -> jax.Array:
    """Inverse of the nibble packing: (..., d/2) uint8 → (..., d).

    With ``segments`` == 1 this is a single lane-concat — the form the
    fused attention kernel uses on its per-shard block (a shard's slice
    of a segment-packed pool with segments == tp IS one segment, so the
    kernel never needs the segmented form)."""
    wi = w.astype(jnp.int32)
    if segments == 1:
        return jnp.concatenate(
            [(wi & 0xF) - 8, ((wi >> 4) & 0xF) - 8], axis=-1).astype(dtype)
    b = wi.shape[-1]
    seg = wi.reshape(*wi.shape[:-1], segments, b // segments)
    out = jnp.concatenate(
        [(seg & 0xF) - 8, ((seg >> 4) & 0xF) - 8], axis=-1)
    return out.reshape(*wi.shape[:-1], 2 * b).astype(dtype)


def _eq_div(x: jax.Array, eq: Optional[jax.Array], layer) -> jax.Array:
    """Divide (..., kvh, d) rows by layer ``layer``'s channel equalizer."""
    if eq is None:
        return x
    kvh, d = x.shape[-2:]
    return x / eq[layer].reshape(kvh, d)


def _eq_div_all(x: jax.Array, eq: Optional[jax.Array]) -> jax.Array:
    """Divide (L, slots, kvh, d) rows by every layer's equalizer."""
    if eq is None:
        return x
    L, _, kvh, d = x.shape
    return x / eq.reshape(L, 1, kvh, d)


def _pad_scales(s: jax.Array, spad: int) -> jax.Array:
    """(..., page) → (..., spad) zero-padded."""
    if s.shape[-1] == spad:
        return s
    pad = [(0, 0)] * (s.ndim - 1) + [(0, spad - s.shape[-1])]
    return jnp.pad(s, pad)


def kv_write_token(cache: PagedKVCache, layer, pages: jax.Array,
                   offsets: jax.Array, k_new: jax.Array,
                   v_new: jax.Array) -> PagedKVCache:
    """Scatter one token's K/V per slot into layer ``layer``.

    pages/offsets: (slots,); k_new/v_new: (slots, kvh, d).  All writes
    index the stacked pools directly (dynamic-update-slice in place
    under donation) — no per-layer pool slicing.
    """
    slots = k_new.shape[0]
    kf = k_new.reshape(slots, -1)
    vf = v_new.reshape(slots, -1)
    if cache.ks is None:
        return dataclasses.replace(
            cache,
            k=cache.k.at[layer, pages, offsets].set(kf.astype(cache.k.dtype)),
            v=cache.v.at[layer, pages, offsets].set(vf.astype(cache.v.dtype)),
        )
    quant = (functools.partial(_absmax_quantize4,
                               segments=cache.pack_segments)
             if cache.kv_bits == 4 else _absmax_quantize)
    qk, sk = quant(_eq_div(k_new, cache.k_eq, layer))
    qv, sv = quant(_eq_div(v_new, cache.v_eq, layer))
    return dataclasses.replace(
        cache,
        k=cache.k.at[layer, pages, offsets].set(qk.reshape(slots, -1)),
        v=cache.v.at[layer, pages, offsets].set(qv.reshape(slots, -1)),
        ks=cache.ks.at[layer, pages, :, offsets].set(sk),
        vs=cache.vs.at[layer, pages, :, offsets].set(sv),
    )


def kv_write_token_all(cache: PagedKVCache, pages: jax.Array,
                       offsets: jax.Array, k_all: jax.Array,
                       v_all: jax.Array) -> PagedKVCache:
    """Scatter one token's K/V per slot for ALL layers in one update.

    k_all/v_all: (layers, slots, kvh, d) — the layer scan's stacked ys
    when the fused attention kernel handles the current token inline
    (tgq.kernels.paged_attention ``k_current``): one scatter per decode
    step instead of one per layer.
    """
    L, slots = k_all.shape[:2]
    kf = k_all.reshape(L, slots, -1)
    vf = v_all.reshape(L, slots, -1)
    if cache.ks is None:
        return dataclasses.replace(
            cache,
            k=cache.k.at[:, pages, offsets].set(kf.astype(cache.k.dtype)),
            v=cache.v.at[:, pages, offsets].set(vf.astype(cache.v.dtype)),
        )
    quant = (functools.partial(_absmax_quantize4,
                               segments=cache.pack_segments)
             if cache.kv_bits == 4 else _absmax_quantize)
    qk, sk = quant(_eq_div_all(k_all, cache.k_eq))  # codes, (L, slots, kvh)
    qv, sv = quant(_eq_div_all(v_all, cache.v_eq))
    # ks (L, P, kvh, spad): the slice between the two advanced indices
    # moves the broadcast (slots) dim to the front — transpose to match
    return dataclasses.replace(
        cache,
        k=cache.k.at[:, pages, offsets].set(qk.reshape(L, slots, -1)),
        v=cache.v.at[:, pages, offsets].set(qv.reshape(L, slots, -1)),
        ks=cache.ks.at[:, pages, :, offsets].set(sk.transpose(1, 0, 2)),
        vs=cache.vs.at[:, pages, :, offsets].set(sv.transpose(1, 0, 2)),
    )


def kv_write_pages(cache: PagedKVCache, layer, slot_pages: jax.Array,
                   k_new: jax.Array, v_new: jax.Array) -> PagedKVCache:
    """Write full prompts' K/V (prefill) into layer ``layer``.

    slot_pages: ([b,] n_pages); k_new/v_new: ([b,] seq, kvh, d) with
    seq == n_pages * page_size.
    """
    page = cache.page_size
    lead, n_pages = slot_pages.shape[:-1], slot_pages.shape[-1]

    def tile(x):  # ([b,] seq, f) → ([b,] n_pages, page, f)
        return x.reshape(*lead, n_pages, page, x.shape[-1])

    kf = k_new.reshape(*k_new.shape[:-2], -1)
    vf = v_new.reshape(*v_new.shape[:-2], -1)
    if cache.ks is None:
        return dataclasses.replace(
            cache,
            k=cache.k.at[layer, slot_pages].set(
                tile(kf).astype(cache.k.dtype)),
            v=cache.v.at[layer, slot_pages].set(
                tile(vf).astype(cache.v.dtype)),
        )
    quant = (functools.partial(_absmax_quantize4,
                               segments=cache.pack_segments)
             if cache.kv_bits == 4 else _absmax_quantize)
    qk, sk = quant(_eq_div(k_new, cache.k_eq, layer))  # ([b,] seq, kvh)
    qv, sv = quant(_eq_div(v_new, cache.v_eq, layer))
    spad = cache.ks.shape[-1]

    def tile_s(s):  # ([b,] seq, kvh) → ([b,] n_pages, kvh, spad)
        s = s.reshape(*lead, n_pages, page, s.shape[-1])
        s = jnp.swapaxes(s, -1, -2)  # ([b,] n_pages, kvh, page)
        return _pad_scales(s, spad)

    return dataclasses.replace(
        cache,
        k=cache.k.at[layer, slot_pages].set(
            tile(qk.reshape(*kf.shape[:-1], -1))),
        v=cache.v.at[layer, slot_pages].set(
            tile(qv.reshape(*vf.shape[:-1], -1))),
        ks=cache.ks.at[layer, slot_pages].set(tile_s(sk)),
        vs=cache.vs.at[layer, slot_pages].set(tile_s(sv)),
    )


def kv_gather(cache: PagedKVCache, layer, table: jax.Array,
              dtype=jnp.bfloat16):
    """Gather + dequantize each slot's pages from layer ``layer``:
    (slots, mpps·page, kvh, d) views of K and V.

    The XLA fallback attention path (CPU tests, TP serving).  The
    gathered views materialize in HBM, so their dtype sets the attention
    path's traffic — bf16 halves it vs f32 at no observable quality cost
    (the QK/AV dots still accumulate in f32).  On single-device TPU the
    fused kernel (tgq.kernels.paged_attention) replaces this entirely.
    """
    page = cache.page_size
    slots, mpps = table.shape
    kvh = cache.num_kv_heads
    d = cache.head_dim
    k_l = cache.k[layer][table]  # gather pages, then unpack rows
    v_l = cache.v[layer][table]
    if cache.kv_bits == 4:
        k_l = kv_unpack4(k_l, dtype, segments=cache.pack_segments)
        v_l = kv_unpack4(v_l, dtype, segments=cache.pack_segments)
    kg = k_l.reshape(slots, mpps * page, kvh, d).astype(dtype)
    vg = v_l.reshape(slots, mpps * page, kvh, d).astype(dtype)
    if cache.ks is not None:
        ks_l = cache.ks[layer][:, :, :page]   # (P, kvh, page)
        vs_l = cache.vs[layer][:, :, :page]
        sk = jnp.swapaxes(ks_l[table], -1, -2).reshape(
            slots, mpps * page, kvh)[..., None].astype(dtype)
        sv = jnp.swapaxes(vs_l[table], -1, -2).reshape(
            slots, mpps * page, kvh)[..., None].astype(dtype)
        kg = kg * sk
        vg = vg * sv
        if cache.k_eq is not None:
            kg = kg * cache.k_eq[layer].reshape(kvh, d).astype(dtype)
        if cache.v_eq is not None:
            vg = vg * cache.v_eq[layer].reshape(kvh, d).astype(dtype)
    return kg, vg


# ----------------------------------------------------- chunk window
#
# decode_steps keeps the multi-GB page pools SCAN-INVARIANT: per-step
# K/V rows land in this small layer-stacked window of RAW bf16 rows
# and flush to the pools (quantizing once, if the pools are quantized)
# with ONE scatter per chunk.  Measured at 128 slots, the per-step
# pool scatter cost ~9 ms/step — not the scatter itself (a scatter
# into pools the kernels don't read is ~1 ms) but XLA copying the
# pools every step because they were simultaneously custom-call
# (attention kernel) operands and scatter targets.  The round-3 window
# was quantized in the pool format and read BY the kernel — recreating
# the same defensive copy at window scale (~4 ms/step).  This window
# is therefore raw and strictly XLA-side: written by one DUS per step,
# read only by tgq.serve.decode._window_partial's einsums, so XLA
# keeps it in place across the scan.


def window_init(cache: PagedKVCache, slots: int, w: int):
    """(wk, wv) zeros of shape (L, slots, kvh, w, d) bf16 — raw
    (un-equalized, unquantized) K/V rows for one decode chunk.  The
    kv-head axis precedes the token axis so the window attention's
    batched matmuls (tgq.serve.decode._window_partial) read each
    layer's rows as a contiguous (slots, kvh·w, d) operand with no
    transpose."""
    L = cache.k.shape[0]
    kvh, d = cache.num_kv_heads, cache.head_dim
    wk = jnp.zeros((L, slots, kvh, w, d), jnp.bfloat16)
    wv = jnp.zeros((L, slots, kvh, w, d), jnp.bfloat16)
    return (wk, wv)


def window_write_step(win, i, k_all: jax.Array, v_all: jax.Array):
    """Write one step's raw rows for ALL layers into window column
    ``i``.  k_all/v_all: (L, slots, kvh, d) raw rows."""
    wk, wv = win
    L, slots, kvh, d = k_all.shape
    kf = k_all.reshape(L, slots, kvh, 1, d).astype(wk.dtype)
    vf = v_all.reshape(L, slots, kvh, 1, d).astype(wv.dtype)
    return (jax.lax.dynamic_update_slice_in_dim(wk, kf, i, axis=3),
            jax.lax.dynamic_update_slice_in_dim(wv, vf, i, axis=3))


def window_flush(cache: PagedKVCache, win, table: jax.Array,
                 pos0: jax.Array, n: int, live=None) -> PagedKVCache:
    """Quantize (when the pools are quantized) and scatter the window's
    first ``n`` columns into the pools — ONE aliasing event per chunk
    instead of per step.

    table: (slots, mpps); pos0: (slots,) position of window column 0
    (= the chunk's first decoded token).  Equalizers and absmax scales
    apply exactly as kv_write_token_all would (the only delta vs the
    per-step scatter path is the bf16 rounding of the staged rows)."""
    wk, wv = win
    L, slots = wk.shape[:2]
    kvh, d = cache.num_kv_heads, cache.head_dim
    page = cache.page_size
    j = jnp.arange(n, dtype=jnp.int32)
    pos = pos0[:, None] + j[None, :]                  # (slots, n)
    pidx = jnp.clip(pos // page, 0, table.shape[1] - 1)
    pages = jnp.take_along_axis(table, pidx, axis=1)  # (slots, n)
    if live is not None:
        # retired/staging slots' window rows are garbage — flush them
        # to the page-0 scratch instead of their (or a future) real page
        pages = jnp.where(live[:, None] > 0, pages, 0)
    offsets = (pos % page).reshape(-1)
    pages = pages.reshape(-1)
    # window is (L, slots, kvh, W, d): bring tokens ahead of heads
    k_rows = wk[:, :, :, :n].transpose(0, 1, 3, 2, 4).reshape(
        L, slots * n, kvh, d).astype(jnp.float32)
    v_rows = wv[:, :, :, :n].transpose(0, 1, 3, 2, 4).reshape(
        L, slots * n, kvh, d).astype(jnp.float32)
    if cache.ks is None:
        return dataclasses.replace(
            cache,
            k=cache.k.at[:, pages, offsets].set(
                k_rows.reshape(L, slots * n, -1).astype(cache.k.dtype)),
            v=cache.v.at[:, pages, offsets].set(
                v_rows.reshape(L, slots * n, -1).astype(cache.v.dtype)),
        )
    quant = (functools.partial(_absmax_quantize4,
                               segments=cache.pack_segments)
             if cache.kv_bits == 4 else _absmax_quantize)
    qk, sk = quant(_eq_div_all(k_rows, cache.k_eq))  # codes, (L, s·n, kvh)
    qv, sv = quant(_eq_div_all(v_rows, cache.v_eq))
    # ks (L, P, kvh, spad) at [:, pages, :, offsets]: advanced indices
    # in dims 1 and 3 → update shape (slots·n, L, kvh)
    return dataclasses.replace(
        cache,
        k=cache.k.at[:, pages, offsets].set(qk.reshape(L, slots * n, -1)),
        v=cache.v.at[:, pages, offsets].set(qv.reshape(L, slots * n, -1)),
        ks=cache.ks.at[:, pages, :, offsets].set(sk.transpose(1, 0, 2)),
        vs=cache.vs.at[:, pages, :, offsets].set(sv.transpose(1, 0, 2)),
    )
