"""Paged KV cache for the serving engine — bf16 or quantized INT8.

The reference has no serving side at all (SURVEY.md §0); this is the
BASELINE.json north-star component, built jax-native:

- one global **page pool** per layer: (num_pages, page_size, kv_heads,
  head_dim) for K and V, living on device (sharded on the "model" axis
  by head under TP).  Storage is bf16, or **int8 with per-token-per-head
  absmax scales** (`kv_bits=8`, KIVI/InnerQ-style tuning-free KV
  quantization — PAPERS.md): halves decode-attention HBM traffic and
  doubles the contexts that fit, with dequantization fused into the
  attention gather;
- a host-side **allocator** (free list) and a device **page table**
  (slots × max_pages_per_slot int32) mapping each decode slot's logical
  blocks to physical pages — slots admit/finish without moving KV;
- decode writes one (k, v) per slot per step with a vectorized scatter
  into (page, offset); attention gathers each slot's pages and masks by
  true length.  Shapes are fully static: every jit sees (slots,
  max_pages_per_slot, page_size, ...) regardless of occupancy.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from tgq.models.config import ModelConfig


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
class LayerKV:
    """One layer's page pools: k/v (num_pages, page, kvh, d); for int8
    storage, ks/vs hold per-token-per-head absmax scales
    (num_pages, page, kvh) f32 — None for bf16 storage."""

    k: jax.Array
    v: jax.Array
    ks: Optional[jax.Array] = None
    vs: Optional[jax.Array] = None

    @property
    def page_size(self) -> int:
        return self.k.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Device page pools, stacked over layers: k/v of shape
    (layers, num_pages, page, kvh, d) and (for kv_bits=8) scale pools
    ks/vs of shape (layers, num_pages, page, kvh) f32."""

    k: jax.Array
    v: jax.Array
    ks: Optional[jax.Array] = None
    vs: Optional[jax.Array] = None

    @classmethod
    def init(cls, cfg: ModelConfig, num_pages: int, page_size: int,
             dtype=jnp.bfloat16, kv_bits: int = 16) -> "PagedKVCache":
        shape = (cfg.num_layers, num_pages, page_size, cfg.num_kv_heads,
                 cfg.head_dim)
        if kv_bits == 8:
            return cls(k=jnp.zeros(shape, jnp.int8),
                       v=jnp.zeros(shape, jnp.int8),
                       ks=jnp.zeros(shape[:-1], jnp.float32),
                       vs=jnp.zeros(shape[:-1], jnp.float32))
        assert kv_bits == 16, kv_bits
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    def layer(self, li: int) -> LayerKV:
        return LayerKV(
            k=self.k[li], v=self.v[li],
            ks=None if self.ks is None else self.ks[li],
            vs=None if self.vs is None else self.vs[li],
        )

    def set_layer(self, li: int, kv: LayerKV) -> "PagedKVCache":
        return PagedKVCache(
            k=self.k.at[li].set(kv.k), v=self.v.at[li].set(kv.v),
            ks=None if self.ks is None else self.ks.at[li].set(kv.ks),
            vs=None if self.vs is None else self.vs.at[li].set(kv.vs),
        )

    def stacked(self) -> LayerKV:
        """Layer-stacked pools as one LayerKV pytree — scan xs."""
        return LayerKV(k=self.k, v=self.v, ks=self.ks, vs=self.vs)

    @classmethod
    def from_stacked(cls, kv: LayerKV) -> "PagedKVCache":
        return cls(k=kv.k, v=kv.v, ks=kv.ks, vs=kv.vs)


def _absmax_quantize(x: jax.Array):
    """(..., d) f32 → int8 codes + (...,) f32 scale (per-vector absmax)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-10)
    q = jnp.round(xf / s[..., None]).astype(jnp.int8)
    return q, s


def kv_write_token(kv: LayerKV, pages: jax.Array, offsets: jax.Array,
                   k_new: jax.Array, v_new: jax.Array) -> LayerKV:
    """Scatter one token's K/V per slot.  pages/offsets: (slots,);
    k_new/v_new: (slots, kvh, d)."""
    if kv.ks is None:
        return LayerKV(
            k=kv.k.at[pages, offsets].set(k_new.astype(kv.k.dtype)),
            v=kv.v.at[pages, offsets].set(v_new.astype(kv.v.dtype)),
        )
    qk, sk = _absmax_quantize(k_new)
    qv, sv = _absmax_quantize(v_new)
    return LayerKV(
        k=kv.k.at[pages, offsets].set(qk),
        v=kv.v.at[pages, offsets].set(qv),
        ks=kv.ks.at[pages, offsets].set(sk),
        vs=kv.vs.at[pages, offsets].set(sv),
    )


def kv_write_pages(kv: LayerKV, slot_pages: jax.Array,
                   k_new: jax.Array, v_new: jax.Array) -> LayerKV:
    """Write full prompts' K/V (prefill).  slot_pages: ([b,] n_pages);
    k_new/v_new: ([b,] seq, kvh, d) with seq == n_pages * page_size."""
    page = kv.page_size
    lead, n_pages = slot_pages.shape[:-1], slot_pages.shape[-1]

    def tile(x):
        return x.reshape(*lead, n_pages, page, *x.shape[len(lead) + 1:])

    if kv.ks is None:
        return LayerKV(
            k=kv.k.at[slot_pages].set(tile(k_new).astype(kv.k.dtype)),
            v=kv.v.at[slot_pages].set(tile(v_new).astype(kv.v.dtype)),
        )
    qk, sk = _absmax_quantize(k_new)
    qv, sv = _absmax_quantize(v_new)
    return LayerKV(
        k=kv.k.at[slot_pages].set(tile(qk)),
        v=kv.v.at[slot_pages].set(tile(qv)),
        ks=kv.ks.at[slot_pages].set(tile(sk)),
        vs=kv.vs.at[slot_pages].set(tile(sv)),
    )


def kv_gather(kv: LayerKV, table: jax.Array, dtype=jnp.bfloat16):
    """Gather + dequantize each slot's pages: (slots, mpps·page, kvh, d)
    views of K and V.

    The gathered views materialize in HBM (XLA does not fuse gathers
    into dot operands on TPU), so their dtype sets the attention path's
    HBM traffic — bf16 halves it vs f32 at no observable quality cost
    (the QK/AV dots still accumulate in f32)."""
    page = kv.page_size
    slots, mpps = table.shape
    kvh, d = kv.k.shape[-2:]
    kg = kv.k[table].reshape(slots, mpps * page, kvh, d).astype(dtype)
    vg = kv.v[table].reshape(slots, mpps * page, kvh, d).astype(dtype)
    if kv.ks is not None:
        kg = kg * kv.ks[table].reshape(slots, mpps * page, kvh)[..., None].astype(dtype)
        vg = vg * kv.vs[table].reshape(slots, mpps * page, kvh)[..., None].astype(dtype)
    return kg, vg
