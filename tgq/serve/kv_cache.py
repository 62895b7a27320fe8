"""Paged KV cache for the serving engine.

The reference has no serving side at all (SURVEY.md §0); this is the
BASELINE.json north-star component, built jax-native:

- one global **page pool** per layer: (num_pages, page_size, kv_heads,
  head_dim) bf16 for K and V, living on device (sharded on the "model"
  axis by head under TP);
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
class PagedKVCache:
    """Device page pools: k/v of shape (layers, num_pages, page, kvh, d)."""

    k: jax.Array
    v: jax.Array

    @classmethod
    def init(cls, cfg: ModelConfig, num_pages: int, page_size: int,
             dtype=jnp.bfloat16) -> "PagedKVCache":
        shape = (cfg.num_layers, num_pages, page_size, cfg.num_kv_heads,
                 cfg.head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def page_size(self) -> int:
        return self.k.shape[2]


def write_prefill(cache: PagedKVCache, layer: int, slot_pages: jax.Array,
                  k_new: jax.Array, v_new: jax.Array) -> PagedKVCache:
    """Write a full prompt's K/V for one layer.

    slot_pages: (n_pages,) physical page ids for this slot.
    k_new/v_new: (seq, kvh, d) with seq == n_pages * page_size (padded).
    """
    page = cache.page_size
    n_pages = slot_pages.shape[0]
    kp = k_new.reshape(n_pages, page, *k_new.shape[1:]).astype(cache.k.dtype)
    vp = v_new.reshape(n_pages, page, *v_new.shape[1:]).astype(cache.v.dtype)
    k = cache.k.at[layer, slot_pages].set(kp)
    v = cache.v.at[layer, slot_pages].set(vp)
    return PagedKVCache(k=k, v=v)


def write_decode(cache: PagedKVCache, layer: int, pages: jax.Array,
                 offsets: jax.Array, k_new: jax.Array, v_new: jax.Array
                 ) -> PagedKVCache:
    """Scatter one token's K/V per slot.

    pages/offsets: (slots,) physical page + in-page offset per slot.
    k_new/v_new: (slots, kvh, d).
    """
    k = cache.k.at[layer, pages, offsets].set(k_new.astype(cache.k.dtype))
    v = cache.v.at[layer, pages, offsets].set(v_new.astype(cache.v.dtype))
    return PagedKVCache(k=k, v=v)


def gather_slot_kv(cache: PagedKVCache, layer: int, table: jax.Array):
    """(slots, mpps·page, kvh, d) views of each slot's K/V."""
    page = cache.page_size
    slots, mpps = table.shape
    k = cache.k[layer][table]  # (slots, mpps, page, kvh, d)
    v = cache.v[layer][table]
    kvh, d = k.shape[-2:]
    return (k.reshape(slots, mpps * page, kvh, d),
            v.reshape(slots, mpps * page, kvh, d))
