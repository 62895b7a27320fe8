"""Fused paged decode attention — Pallas TPU kernel.

Decode attention over the serving engine's paged KV pools.  The XLA
fallback path (tgq.serve.kv_cache.kv_gather + einsums) materializes the
gathered K/V views and the probability matrix in HBM every step — at 64
slots × 256-token contexts that traffic dwarfs the packed-weight reads.
This kernel streams pages HBM→VMEM with double-buffered async copies and
runs the flash-style online-softmax accumulation entirely on-chip: per
decode step the attention path reads exactly the live KV bytes.

TPU-first design (differs from jax.experimental.pallas.ops.tpu
.paged_attention, whose cross-program DMA-prefetch scheme this follows):

- **One grid program per slot, one MXU dot per page for ALL heads.**
  Pools keep the engine's token-major page layout ``(layers, num_pages,
  page_size, kv_heads·head_dim)`` so each page is a single contiguous
  2-D DMA covering every KV head.  Queries are packed block-diagonally —
  ``Q'[h, g·d:(g+1)·d] = q[h]`` for h's KV group g — so one
  (num_q_heads × kvh·d) @ (kvh·d × page) dot yields all heads' logits
  for the page.  The off-diagonal FLOPs are free next to DMA time, and
  the grid shrinks from batch×kvh×blocks tiny-dot programs to `batch`
  MXU-shaped ones.
- **Layer-indexed stacked pools.**  Pools arrive stacked over layers
  plus a scalar layer index; the per-layer ``lax.scan`` over a stacked
  cache never slices the pool arrays (XLA would materialize a full
  per-layer pool copy every layer, every step).
- **Scales on logits, not elements.**  int8 storage carries
  per-token-per-head absmax scales ``(layers, num_pages, kv_heads,
  page_size)`` f32.  Since ``q·(s∘k) = s·(q·k)`` and
  ``p@(s∘v) = (p∘s)@v``, the scales multiply the (heads × page) logits
  and probs — lane-aligned, 16× less VPU work than dequantizing K/V
  element-wise, and no pre-broadcast scale traffic (the upstream kernel
  broadcasts scales to head_dim before the call).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


class _BlockCopy:
    """Async HBM→VMEM copy of up to ``ppb`` consecutive slot-pages
    (K or V, + scales).  All copies are issued back-to-back on one
    semaphore so the DMA engine keeps them in flight together — at
    page-sized granularity the loop is issue-latency-bound, not
    bandwidth-bound, and batching pages per wait is what buys the
    bandwidth back.

    ``n_live`` is the number of LIVE pages in this block (≥1, ≤ ppb):
    page j is copied (and waited) only when ``j < n_live``.  Without
    the guard the tail block of every sequence copied a full ``ppb``
    pages of clamped garbage — at a 256-token block, a 257-token pool
    DMA'd 512 tokens' worth of pages, a measured +4 ms/step cliff at
    128 slots the moment contexts crossed the block multiple."""

    def __init__(self, pool_ref, scales_ref, vmem, scales_vmem, sem,
                 page_indices_ref, base_idx, pps, page_size, ppb, layer,
                 n_live):
        self._copies = []
        self._n_live = n_live
        self._scales_vmem = scales_vmem
        for j in range(ppb):
            # clamp: dead trailing entries still index a valid page
            # (they are never started; the clamp keeps the address
            # computation in range)
            idx = jnp.minimum(base_idx + j, pps - 1)
            p = page_indices_ref[idx]
            pair = [pltpu.make_async_copy(
                pool_ref.at[layer, p],
                vmem.at[pl.ds(j * page_size, page_size)], sem)]
            if scales_ref is not None:
                pair.append(pltpu.make_async_copy(
                    scales_ref.at[layer, p], scales_vmem.at[j], sem))
            self._copies.append(pair)

    def start(self):
        for j, pair in enumerate(self._copies):
            @pl.when(j < self._n_live)
            def _(pair=pair):
                for c in pair:
                    c.start()
            if self._scales_vmem is not None:
                # dead entries keep whatever the previous block left in
                # VMEM; stale f32 could be NaN/Inf and 0·NaN would leak
                # through the softmax's zero probabilities — zero them
                @pl.when(j >= self._n_live)
                def _(j=j):
                    self._scales_vmem[j] = jnp.zeros_like(
                        self._scales_vmem[j])

    def wait(self):
        for j, pair in enumerate(self._copies):
            @pl.when(j < self._n_live)
            def _(pair=pair):
                for c in pair:
                    c.wait()


def _kernel(lengths_ref, page_indices_ref, layer_ref, buffer_index_ref,
            init_flag_ref, next_live_ref, w_live_ref, live_ref,
            q_ref, k_ref, ks_ref, v_ref, vs_ref,
            kc_ref, vc_ref,
            o_ref, m_ref, l_ref,
            k_out_ref, ks_out_ref, v_out_ref, vs_out_ref,
            k_vmem, ks_vmem, v_vmem, vs_vmem, k_sems, v_sems,
            kw_blk, vw_blk, ksw_tile, vsw_tile, w_sems, *,
            batch_size: int, pages_per_sequence: int, num_kv_heads: int,
            pages_per_block: int, int4: bool, has_window: bool,
            write_current: bool,
            mask_value: float, attn_logits_soft_cap: float | None):
    b = pl.program_id(0)
    ppb = pages_per_block
    page_size = k_ref.shape[-2]
    block = ppb * page_size                      # tokens per loop step
    fused = k_ref.shape[-1] * (2 if int4 else 1)  # kv_heads * head_dim
    head_dim = fused // num_kv_heads
    layer = layer_ref[0]
    length = lengths_ref[b]
    num_q_heads = q_ref.shape[0]
    group = num_q_heads // num_kv_heads
    quantized = ks_ref is not None
    # current-token K/V arrive as registers (deferred pool writes); in
    # chunk-window mode (has_window) the w_live most recent tokens
    # before that live OUTSIDE the kernel, in a raw scan-carried window
    # that XLA-side attention covers (tgq.serve.decode) — the kernel
    # only shrinks its pool coverage to [0, length - 1 - w_live) and
    # returns flash partials (m_ref/l_ref) so the caller can merge the
    # two softmaxes exactly.  Keeping the window OUT of the kernel is
    # what stops XLA copying it every step (a custom-call operand that
    # is also a per-step DUS target gets defensively copied).
    # pool pass-through outputs (alias_pools): the SAME buffers as the
    # pool inputs.  Without write_current the kernel never touches them
    # — they exist so the caller's scatter updates the kernel's own
    # (aliased) output in place instead of forcing XLA to defensively
    # copy a multi-GB custom-call operand that is also a scatter target
    # (measured ~13 ms/step at 128 slots for the layout copies).  With
    # write_current the kernel itself stores the current token's
    # quantized row+scale into them (see the RMW block below) and the
    # caller does no pool writes at all.
    has_current = kc_ref is not None
    w_live = w_live_ref[0] if has_window else 0
    return_stats = m_ref is not None

    o_ref[...] = jnp.zeros_like(o_ref)
    if return_stats:
        m_ref[...] = jnp.full_like(m_ref, mask_value)
        l_ref[...] = jnp.zeros_like(l_ref)

    def pool_len_of(bb):
        ln = lengths_ref[bb]
        tail = (1 if has_current else 0) + w_live
        return jnp.maximum(ln - tail, 0) if (has_current or has_window) \
            else ln

    def n_blocks_of(bb):
        return lax.div(pool_len_of(bb) + block - 1, block)

    def next_block(b, i):
        """First (b', i') with work at/after block i of slot b.

        ``next_live_ref[b]`` is the next slot after b with pool work
        (batch_size sentinel when none), precomputed OUTSIDE the kernel
        by the wrapper — the previous in-kernel linear scan cost O(batch)
        scalar SMEM iterations per block invocation, which at 128 slots
        × 36 layers × 1 block each was hundreds of thousands of scalar
        steps per decode step, all replaced by one table read."""
        return lax.cond(i < n_blocks_of(b), lambda: (b, i),
                        lambda: (next_live_ref[b], 0))

    def make_copies(b, i, buf):
        base = b * pages_per_sequence + i * ppb
        pps_end = (b + 1) * pages_per_sequence
        # live pages of this block: the tail block only copies what the
        # pool actually holds (page-granular), not a full ppb of
        # clamped garbage
        live_pages = lax.div(pool_len_of(b) + page_size - 1, page_size)
        n_live = live_pages - i * ppb
        ck = _BlockCopy(k_ref, ks_ref, k_vmem.at[buf],
                        None if ks_vmem is None else ks_vmem.at[buf],
                        k_sems.at[buf], page_indices_ref, base, pps_end,
                        page_size, ppb, layer, n_live)
        cv = _BlockCopy(v_ref, vs_ref, v_vmem.at[buf],
                        None if vs_vmem is None else vs_vmem.at[buf],
                        v_sems.at[buf], page_indices_ref, base, pps_end,
                        page_size, ppb, layer, n_live)
        return ck, cv

    # ---- in-kernel current-token pool write (write_current) --------
    # The row lands at (layer, wpage, woff).  TPU sublane tiling only
    # allows 8-row-aligned page slices, so this is a read-modify-write
    # of the 8-row block containing woff (and of the page's full scale
    # tile): DMA in, overwrite one row/lane, DMA back.  The reads are
    # issued HERE so they overlap the attention block loop; the
    # write-back happens strictly AFTER the loop has consumed its last
    # block (rows < length-1 are rewritten with identical bytes; row
    # length-1 itself is masked out of this step's softmax and folded
    # from registers instead).  Replacing the XLA per-layer scatters
    # (serialized row loops, ~2 ms/step at 128 slots) with four small
    # DMAs per live program.
    if write_current:
        last = jnp.maximum(length - 1, 0)
        wpage = page_indices_ref[b * pages_per_sequence
                                 + lax.div(last, page_size)]
        woff = lax.rem(last, page_size)
        wblk = lax.div(woff, 8) * 8
        rmw_k_in = pltpu.make_async_copy(
            k_ref.at[layer, wpage, pl.ds(wblk, 8)], kw_blk, w_sems.at[0])
        rmw_v_in = pltpu.make_async_copy(
            v_ref.at[layer, wpage, pl.ds(wblk, 8)], vw_blk, w_sems.at[1])
        if quantized:
            rmw_ks_in = pltpu.make_async_copy(
                ks_ref.at[layer, wpage], ksw_tile, w_sems.at[2])
            rmw_vs_in = pltpu.make_async_copy(
                vs_ref.at[layer, wpage], vsw_tile, w_sems.at[3])
        # ``live``: host-controlled per-slot write gate.  The engine
        # decodes ALL slots every step (static shapes), so retired and
        # prefill-staging slots run through here with garbage tokens —
        # their attention output is discarded on the host, but a pool
        # write would scribble: retired slots share the page-0 scratch
        # row (a cross-program DMA race) and staging slots would touch
        # their own future-token rows.
        do_write = (length > 0) & (live_ref[b] > 0)

        @pl.when(do_write)
        def _():
            rmw_k_in.start()
            rmw_v_in.start()
            if quantized:
                rmw_ks_in.start()
                rmw_vs_in.start()

    # block-diagonal queries: Q'[h, g(h)*d:(g(h)+1)*d] = q[h]
    q = q_ref[...].astype(jnp.float32)           # (H, d)
    q_tiled = jnp.concatenate([q] * num_kv_heads, axis=1)   # (H, kvh*d)
    row_g = lax.broadcasted_iota(jnp.int32, (num_q_heads, fused), 0) // group
    lane_g = lax.broadcasted_iota(jnp.int32, (num_q_heads, fused), 1) \
        // head_dim
    qd = jnp.where(row_g == lane_g, q_tiled, 0.0)           # (H, kvh*d)

    # group-selector matrix for scale expansion: E[h, g] = 1 iff q-head
    # h reads KV head g.  Expanding the per-head scale rows to (H,
    # block) is then ONE tiny MXU dot E @ S instead of H slice-concats
    # per page — the concat chain was the dominant per-block VPU cost
    # (~0.8 µs/program/block at 128 slots; jnp.repeat was worse still,
    # +5 ms/step, Mosaic lowers it through memory)
    sel_rows = lax.broadcasted_iota(
        jnp.int32, (num_q_heads, num_kv_heads), 0) // group
    sel_cols = lax.broadcasted_iota(
        jnp.int32, (num_q_heads, num_kv_heads), 1)
    sel_mat = (sel_rows == sel_cols).astype(jnp.float32)

    def expand_rows(s):
        """(ppb, kvh, spad) → (H, ppb·page) via the selector dot,
        dropping the 128-lane DMA padding of the scale rows."""
        if ppb > 1:
            rows = jnp.concatenate(
                [s[j, :, :page_size] for j in range(ppb)], axis=1)
        else:
            rows = s[0, :, :page_size]
        return jax.lax.dot_general(
            sel_mat, rows, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def _unpack(w):
        """VMEM block → f32 (ppb·page, fused).  int4 pools store
        nibble-packed split-half rows — the same kv_unpack4 lane-concat
        the gather fallback uses, so the formats cannot diverge."""
        if not int4:
            return w.astype(jnp.float32)
        from tgq.serve.kv_cache import kv_unpack4

        return kv_unpack4(w, jnp.float32)

    def block_body(i, carry):
        m_prev, l_prev, acc = carry
        buf = buffer_index_ref[0]
        init_flag = init_flag_ref[0]
        init_flag_ref[0] = 0

        # only the first live block in the whole grid starts its own
        # copies; every block prefetches its successor's (the SMEM
        # buffer_index/init_flag persist across grid programs)
        @pl.when(init_flag)
        def _():
            ck, cv = make_copies(b, i, buf)
            ck.start()
            cv.start()

        nb, ni = next_block(b, i + 1)

        @pl.when(nb < batch_size)
        def _():
            nbuf = jnp.where(buf == 0, 1, 0)
            ck, cv = make_copies(nb, ni, nbuf)
            ck.start()
            cv.start()
            buffer_index_ref[0] = nbuf

        ck, cv = make_copies(b, i, buf)
        ck.wait()
        k = _unpack(k_vmem[buf])                 # (ppb*page, kvh*d)
        # DEFAULT (single-pass bf16) MXU precision: int8 codes are exact
        # in bf16 and ~1e-3 relative logits error is bf16-grade attention,
        # while HIGHEST (6-pass) multiplies the kernel's MXU time ~6x
        qk = jax.lax.dot_general(qd, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if quantized:
            qk = qk * expand_rows(ks_vmem[buf])  # (H, ppb*page) lane-aligned
        if attn_logits_soft_cap is not None:
            qk = jnp.tanh(qk / attn_logits_soft_cap) * attn_logits_soft_cap
        t = i * block + lax.broadcasted_iota(jnp.int32, qk.shape, 1)
        # SELECT-mask (not additive): dead-page lanes hold stale VMEM,
        # whose logits may be NaN — select replaces them outright
        qk = jnp.where(t < pool_len_of(b), qk, mask_value)

        m_curr = qk.max(axis=-1)[:, None]        # (H, 1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(qk - m_next)                 # (H, ppb*page)
        l_next = l_prev * alpha + p.sum(axis=-1)[:, None]

        cv.wait()
        v = _unpack(v_vmem[buf])                 # (ppb*page, kvh*d)
        if quantized:
            # dead-page lanes: V codes convert to finite floats and
            # their scale rows are zeroed in _BlockCopy.start, so
            # p·s = 0 exactly — nothing stale reaches the AV dot
            p_v = p * expand_rows(vs_vmem[buf])
        else:
            # bf16 pools carry raw bytes — stale VMEM could be NaN and
            # the MXU propagates 0·NaN; zero the dead rows
            tv = lax.broadcasted_iota(jnp.int32, v.shape, 0) + i * block
            v = jnp.where(tv < pool_len_of(b), v, 0.0)
            p_v = p
        o_curr = jax.lax.dot_general(p_v, v, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        return m_next, l_next, acc * alpha + o_curr

    m0 = jnp.full((num_q_heads, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((num_q_heads, 1), jnp.float32)
    acc0 = jnp.zeros((num_q_heads, fused), jnp.float32)
    m_fin, l_fin, acc = lax.fori_loop(0, n_blocks_of(b), block_body,
                                      (m0, l0, acc0))

    if has_current:
        # fold the current token in from registers — one online-softmax
        # step with a length-1 block (exact; never quantized)
        kc = kc_ref[...].astype(jnp.float32)     # (1, fused)
        vc = vc_ref[...].astype(jnp.float32)
        qk_c = jax.lax.dot_general(qd, kc, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        if attn_logits_soft_cap is not None:
            qk_c = jnp.tanh(
                qk_c / attn_logits_soft_cap) * attn_logits_soft_cap
        m_next = jnp.maximum(m_fin, qk_c)        # (H, 1)
        alpha = jnp.exp(m_fin - m_next)
        p_c = jnp.exp(qk_c - m_next)
        l_fin = l_fin * alpha + p_c
        acc = acc * alpha + p_c * vc             # (H,1)·(1,fused)
        m_fin = m_next                           # keep stats consistent

    if write_current:
        # quantize exactly as tgq.serve.kv_cache._absmax_quantize[4]
        # (the gather path's math): per-token-per-head absmax in f32.
        # kc/vc arrive already equalizer-divided — the stored format.
        def _quant_row(x):
            heads = x.reshape(num_kv_heads, head_dim)
            if not quantized:
                return heads.reshape(1, fused).astype(kw_blk.dtype), None
            qmax = 7.0 if int4 else 127.0
            s = jnp.maximum(
                jnp.max(jnp.abs(heads), axis=-1, keepdims=True) / qmax,
                1e-10)
            qv = jnp.round(heads / s)
            if int4:
                qi = jnp.clip(qv, -7, 7).astype(jnp.int32) + 8
                flat = qi.reshape(1, fused)
                half = fused // 2
                packed = flat[:, :half] | (flat[:, half:] << 4)
                return packed.astype(jnp.uint8), s
            return qv.astype(jnp.int8).reshape(1, fused), s

        @pl.when(do_write)
        def _():
            kq, ksc = _quant_row(kc_ref[...].astype(jnp.float32))
            vq, vsc = _quant_row(vc_ref[...].astype(jnp.float32))
            rmw_k_in.wait()
            rmw_v_in.wait()
            row_sel = lax.broadcasted_iota(
                jnp.int32, kw_blk.shape, 0) == (woff - wblk)
            kw_blk[...] = jnp.where(
                row_sel, jnp.broadcast_to(kq, kw_blk.shape), kw_blk[...])
            vw_blk[...] = jnp.where(
                row_sel, jnp.broadcast_to(vq, vw_blk.shape), vw_blk[...])
            wb_k = pltpu.make_async_copy(
                kw_blk, k_out_ref.at[layer, wpage, pl.ds(wblk, 8)],
                w_sems.at[0])
            wb_v = pltpu.make_async_copy(
                vw_blk, v_out_ref.at[layer, wpage, pl.ds(wblk, 8)],
                w_sems.at[1])
            wb_k.start()
            wb_v.start()
            if quantized:
                rmw_ks_in.wait()
                rmw_vs_in.wait()
                lane_sel = lax.broadcasted_iota(
                    jnp.int32, ksw_tile.shape, 1) == woff
                ksw_tile[...] = jnp.where(
                    lane_sel, jnp.broadcast_to(ksc, ksw_tile.shape),
                    ksw_tile[...])
                vsw_tile[...] = jnp.where(
                    lane_sel, jnp.broadcast_to(vsc, vsw_tile.shape),
                    vsw_tile[...])
                wb_ks = pltpu.make_async_copy(
                    ksw_tile, ks_out_ref.at[layer, wpage], w_sems.at[2])
                wb_vs = pltpu.make_async_copy(
                    vsw_tile, vs_out_ref.at[layer, wpage], w_sems.at[3])
                wb_ks.start()
                wb_vs.start()
                wb_ks.wait()
                wb_vs.wait()
            wb_k.wait()
            wb_v.wait()

    @pl.when(length > 0)
    def _():
        # extract each head's diagonal block: o[h] = acc[h, g(h)*d:...]
        row_sel = lax.broadcasted_iota(
            jnp.int32, (num_q_heads, head_dim), 0) // group
        out = jnp.zeros((num_q_heads, head_dim), jnp.float32)
        for g in range(num_kv_heads):
            blk = acc[:, g * head_dim:(g + 1) * head_dim]
            out = out + jnp.where(row_sel == g, blk, 0.0)
        if return_stats:
            # UN-normalized partials: caller merges with the window's
            # softmax block (acc, m, l), then divides once
            o_ref[...] = out.astype(o_ref.dtype)
            m_ref[...] = m_fin
            l_ref[...] = l_fin
        else:
            o_ref[...] = (out / l_fin).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_kv_heads", "mask_value", "attn_logits_soft_cap",
                     "return_stats", "alias_pools", "write_current"),
)
def paged_decode_attention(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    k_scales: jax.Array | None,
    v_scales: jax.Array | None,
    layer: jax.Array,
    lengths: jax.Array,
    page_indices: jax.Array,
    k_current: jax.Array | None = None,
    v_current: jax.Array | None = None,
    w_live: jax.Array | None = None,
    live: jax.Array | None = None,
    *,
    num_kv_heads: int,
    mask_value: float = DEFAULT_MASK_VALUE,
    attn_logits_soft_cap: float | None = None,
    return_stats: bool = False,
    alias_pools: bool = False,
    write_current: bool = False,
):
    """Decode attention for one layer of layer-stacked paged KV pools.

    Args:
      q: (batch, num_q_heads, head_dim) — pre-scaled by 1/sqrt(head_dim).
      k_pages/v_pages: (layers, num_pages, page_size, kv_heads*head_dim),
        bf16 (k_scales None) or int8 (with scales).
      k_scales/v_scales: (layers, num_pages, kv_heads, scale_pad) f32
        per-token-per-head multipliers with the token dim lane-padded to
        a multiple of 128 (DMA slices need 128-aligned lane extents);
        entries beyond page_size are ignored.  None for float storage.
      layer: scalar int32 — which layer's pools to attend against.
      lengths: (batch,) int32 — live context length per slot (0 = idle;
        idle slots return zeros), INCLUDING the current token.
      page_indices: (batch, pages_per_sequence) int32 physical pages.
      k_current/v_current: (batch, kv_heads*head_dim) — when given, the
        current token's K/V are folded into the softmax from registers
        and the pools are only read for tokens [0, length-1): the layer
        scan can then defer all pool writes to one batched scatter per
        decode step (tgq.serve.kv_cache.kv_write_token_all).
      w_live: chunk-window mode (decode_steps): this chunk's last
        ``w_live`` decoded tokens live OUTSIDE the kernel (a raw
        scan-carried window, tgq.serve.kv_cache.window_init) and the
        pools cover only [0, length - 1 - w_live); use with
        ``return_stats=True`` so the caller can merge the window's
        softmax block exactly.  The window stays out of the kernel on
        purpose: a custom-call operand that is also a per-step DUS
        target gets defensively copied by XLA every step (measured
        ~9 ms/step for the pools, ~4 ms/step for the r3 in-kernel
        window at 128 slots).
      return_stats: also return the flash partials — (o_unnormalized,
        m, l) with m/l of shape (batch, num_q_heads, 1) f32; ``o`` is
        then the UN-normalized accumulator in f32.
      alias_pools: thread the pool arrays THROUGH the kernel as aliased
        in/out buffers and additionally return ``(k_pages, v_pages,
        k_scales, v_scales)``.  The kernel never writes them — the
        point is ownership: a buffer that is simultaneously a
        custom-call operand and a later scatter target gets defensively
        copied by XLA every decode step (~9 ms at 128 slots); aliased
        through the call, the caller's per-step
        ``kv_cache.kv_write_token_all`` scatter updates the kernel's
        own output in place.  This is what lets ``decode_steps`` carry
        the pools through its scan with zero per-step copies and no
        chunk-window machinery on the single-device path.

    Returns (batch, num_q_heads, head_dim) in q.dtype, or the
    (o, m, l) triple when ``return_stats``; with ``alias_pools`` the
    pool tuple is appended: (out_or_triple..., k, v, ks, vs) with
    ks/vs None for bf16 pools.

    ``write_current`` (requires ``alias_pools`` and ``k_current``): the
    kernel itself quantizes and stores the current token's K/V row
    (+ absmax scales) into the aliased pools at position ``length - 1``
    — an 8-row-aligned read-modify-write DMA per live slot, ordered
    after the attention loop.  The caller then performs NO pool writes
    at all: no XLA scatter, no layout copies, no chunk window.  Same
    math as kv_cache's ``_absmax_quantize``/``_absmax_quantize4``
    (k_current/v_current must arrive equalizer-divided, which
    ``_decode_layer`` already guarantees).
    """
    batch, num_q_heads, head_dim = q.shape
    layers, _, page_size, fused_stored = k_pages.shape
    int4 = k_pages.dtype == jnp.uint8   # nibble-packed (kv_cache docs)
    fused = fused_stored * 2 if int4 else fused_stored
    _, pages_per_sequence = page_indices.shape
    assert fused == num_kv_heads * head_dim, (fused, num_kv_heads, head_dim)
    assert num_q_heads % num_kv_heads == 0, (num_q_heads, num_kv_heads)

    quantized = k_scales is not None
    if quantized:
        spad = k_scales.shape[-1]
        assert spad % 128 == 0 and spad >= page_size, (spad, page_size)
    if write_current:
        assert alias_pools and k_current is not None and w_live is None, (
            "write_current needs aliased pools and register current rows")
    # pages per loop step: batch page DMAs per wait until a K-block is
    # ~256KB — the loop is DMA-issue-latency-bound at page granularity,
    # and fewer, bigger waits with 2·ppb copies in flight recover the
    # bandwidth (measured 170 → ~400 GB/s at 64KB pages)
    page_bytes = page_size * fused_stored * k_pages.dtype.itemsize
    ppb = max(1, min(pages_per_sequence, 524288 // page_bytes))
    has_current = k_current is not None
    # next-live-slot table for the kernel's cross-program DMA prefetch:
    # nl[b] = smallest b' > b whose POOL holds tokens (with k_current the
    # pools cover [0, len-1), so a 1-token slot has no pool work),
    # batch_size when none — O(batch log batch) once here vs an O(batch)
    # scalar scan per block inside the kernel
    has_window = w_live is not None
    tail = (1 if has_current else 0)
    if has_window:
        tail = tail + w_live
    pool_lens = lengths - tail
    slot_ids = jnp.arange(batch, dtype=jnp.int32)
    vals = jnp.where(pool_lens > 0, slot_ids, batch)
    suffix_min = lax.associative_scan(jnp.minimum, vals, reverse=True)
    next_live = jnp.concatenate(
        [suffix_min[1:], jnp.full((1,), batch, jnp.int32)])
    io_spec = pl.BlockSpec((None, num_q_heads, head_dim),
                           lambda b, *_: (b, 0, 0))
    stat_spec = pl.BlockSpec((None, num_q_heads, 1), lambda b, *_: (b, 0, 0))
    cur_spec = pl.BlockSpec((None, 1, fused), lambda b, *_: (b, 0, 0))
    kv_buf = pltpu.VMEM((2, ppb * page_size, fused_stored), k_pages.dtype)
    scale_buf = (pltpu.VMEM((2, ppb, num_kv_heads, spad), jnp.float32)
                 if quantized else None)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    stat_shape = jax.ShapeDtypeStruct((batch, num_q_heads, 1), jnp.float32)
    struct = lambda a: (None if a is None  # noqa: E731
                        else jax.ShapeDtypeStruct(a.shape, a.dtype))
    pool_out_shapes = (
        (struct(k_pages), struct(k_scales), struct(v_pages),
         struct(v_scales)) if alias_pools else (None, None, None, None))
    pool_out_specs = tuple(None if s is None else any_spec
                           for s in pool_out_shapes)
    # input_output_aliases indexes the FLATTENED call operands (scalar
    # prefetch included, None entries skipped — None is an empty
    # pytree).  Derive the indices from the same presence flags that
    # build the operand/out lists below, so adding or reordering an
    # operand cannot silently alias the wrong buffer (a donated pool
    # aliased wrong corrupts the KV cache with no error).
    N_SCALARS = 8  # lengths, page_indices, layer, buffer_index,
    #                init_flag, next_live, w_live, live
    # tensor operand presence, in call order: q, k, ks, v, vs, kc, vc
    in_present = [True, True, quantized, True, quantized,
                  has_current, has_current]
    # output presence, in out_shape order: o, m, l, k, ks, v, vs
    out_present = [True, return_stats, return_stats] + [
        s is not None for s in pool_out_shapes]
    aliases = {}
    if alias_pools:
        # pools sit at input positions 1..4 and output positions 3..6,
        # both in (k, ks, v, vs) order
        for j, (ip, op) in enumerate(zip((1, 2, 3, 4), (3, 4, 5, 6))):
            if in_present[ip]:
                assert out_present[op], (ip, op)
                aliases[N_SCALARS + sum(in_present[:ip])] = (
                    sum(out_present[:op]))
    call = pl.pallas_call(
        functools.partial(
            _kernel,
            batch_size=batch,
            pages_per_sequence=pages_per_sequence,
            num_kv_heads=num_kv_heads,
            pages_per_block=ppb,
            int4=int4,
            has_window=has_window,
            write_current=write_current,
            mask_value=mask_value,
            attn_logits_soft_cap=attn_logits_soft_cap,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            # lengths, page_indices, layer, buffer_index, init_flag,
            # next_live, w_live, live
            num_scalar_prefetch=8,
            in_specs=[
                io_spec,
                any_spec,
                any_spec if quantized else None,
                any_spec,
                any_spec if quantized else None,
                cur_spec if has_current else None,
                cur_spec if has_current else None,
            ],
            out_specs=(((io_spec, stat_spec, stat_spec) if return_stats
                        else (io_spec, None, None)) + pool_out_specs),
            grid=(batch,),
            scratch_shapes=(
                kv_buf, scale_buf, kv_buf, scale_buf,
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                # write_current RMW staging (8-row pool block + full
                # scale tile per K/V) — tiny, so allocated regardless
                pltpu.VMEM((8, fused_stored), k_pages.dtype),
                pltpu.VMEM((8, fused_stored), k_pages.dtype),
                (pltpu.VMEM((num_kv_heads, spad), jnp.float32)
                 if quantized else pltpu.VMEM((8, 128), jnp.float32)),
                (pltpu.VMEM((num_kv_heads, spad), jnp.float32)
                 if quantized else pltpu.VMEM((8, 128), jnp.float32)),
                pltpu.SemaphoreType.DMA((4,)),
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        out_shape=(
            jax.ShapeDtypeStruct(
                (batch, num_q_heads, head_dim), jnp.float32),
            stat_shape if return_stats else None,
            stat_shape if return_stats else None,
        ) + pool_out_shapes,
        input_output_aliases=aliases,
    )
    scalar_ops = (
        lengths.astype(jnp.int32),
        page_indices.reshape(-1).astype(jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.zeros((1,), jnp.int32),
        jnp.ones((1,), jnp.int32),
        next_live.astype(jnp.int32),
        (jnp.asarray(w_live, jnp.int32).reshape(1) if has_window
         else jnp.zeros((1,), jnp.int32)),
        (jnp.ones((batch,), jnp.int32) if live is None
         else live.astype(jnp.int32)),
    )
    tensor_ops = (
        q.astype(jnp.float32),
        k_pages,
        k_scales if quantized else None,
        v_pages,
        v_scales if quantized else None,
        (k_current.astype(jnp.float32).reshape(batch, 1, fused)
         if has_current else None),
        (v_current.astype(jnp.float32).reshape(batch, 1, fused)
         if has_current else None),
    )
    # the alias indices above were derived from these exact patterns
    assert len(scalar_ops) == N_SCALARS
    assert [x is not None for x in tensor_ops] == in_present, in_present
    out = call(*scalar_ops, *tensor_ops)
    o, m, l, k_out, ks_out, v_out, vs_out = out
    res = (o, m, l) if return_stats else o.astype(q.dtype)
    if alias_pools:
        pools = (k_out, v_out, ks_out, vs_out)
        return res + pools if return_stats else (res,) + pools
    return res
