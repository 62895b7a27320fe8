"""Jitted prefill / decode steps over the paged KV cache.

Decode processes all slots every step (inactive slots compute garbage
that is masked on the host) — static shapes, one compiled step reused
for the whole serving lifetime.

The cache is **carried** through the layer loop (a ``lax.scan`` over
stacked layer params with the layer index as xs) and every KV write is
a layer-indexed dynamic-update-slice on the stacked pools: the scan
never slices a layer's pools out of the stack, which would materialize
a full per-layer pool copy every layer, every step.

Attention backends (``attn_impl``):
- ``"kernel"`` — fused Pallas paged attention (tgq.kernels
  .paged_attention): streams pages HBM→VMEM, int8 dequant via logit
  scaling, flash accumulation on-chip.  Single-device TPU.
- ``"gather"`` — XLA gather + einsums (CPU tests, TP-sharded serving
  where a Pallas custom call cannot be auto-partitioned).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from tgq.models.causal_lm import (
    apply_linear,
    apply_final_norm,
    embed_tokens,
    lm_logits,
    rms_norm,
    rope_cache,
)
from tgq.models.config import ModelConfig
from tgq.serve.kv_cache import (
    PagedKVCache,
    kv_gather,
    kv_write_pages,
    kv_write_token,
    kv_write_token_all,
)


def stack_layer_params(params):
    """Stack the per-layer param list into leading-axis pytrees so the
    decode/prefill loops run as a single-trace ``lax.scan``."""
    layers = params["model"]["layers"]
    if not isinstance(layers, list):
        return params
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    out = dict(params)
    out["model"] = dict(params["model"])
    out["model"]["layers"] = stacked
    return out


def fuse_packed_projections(params):
    """Fuse each layer's q/k/v and gate/up PackedLinears into single
    ``qkv_proj`` / ``gate_up_proj`` nodes (tgq.core.packing.concat_out —
    exact, since quant groups run along in_features).  7 → 4 dequant-
    matmul dispatches per decode layer and wider out-dims per kernel.
    Single-device serving only (the TP sharding rules shard the
    unfused names); no-op unless every projection is packed."""
    from tgq.core.packing import PackedLinear, concat_out

    layers = params["model"]["layers"]
    if not isinstance(layers, list):
        return params
    fused = []
    for lp in layers:
        sa, mlp = lp["self_attn"], lp["mlp"]
        if not all(isinstance(sa.get(k), PackedLinear)
                   for k in ("q_proj", "k_proj", "v_proj")):
            return params
        if not all(isinstance(mlp.get(k), PackedLinear)
                   for k in ("gate_proj", "up_proj")):
            return params
        sa2 = {k: v for k, v in sa.items()
               if k not in ("q_proj", "k_proj", "v_proj")}
        sa2["qkv_proj"] = concat_out(
            [sa["q_proj"], sa["k_proj"], sa["v_proj"]])
        mlp2 = {k: v for k, v in mlp.items()
                if k not in ("gate_proj", "up_proj")}
        mlp2["gate_up_proj"] = concat_out([mlp["gate_proj"], mlp["up_proj"]])
        lp2 = dict(lp)
        lp2["self_attn"] = sa2
        lp2["mlp"] = mlp2
        fused.append(lp2)
    out = dict(params)
    out["model"] = dict(params["model"])
    out["model"]["layers"] = fused
    return out


def _slice_layer(tree, li):
    """Per-layer view of a stacked layers tree: slice small leaves
    (norm weights), keep PackedLinear nodes stacked — apply_linear
    indexes them with ``layer=li`` inside the kernel, so the scan never
    materializes a per-layer copy of the packed weights."""
    from tgq.core.packing import PackedLinear

    def rec(node):
        if isinstance(node, PackedLinear):
            return node
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node[li]

    return rec(tree)


def default_attn_impl(mesh=None, cfg=None, kv_bits: int = 16,
                      kv_segments: int = 1) -> str:
    """Fused kernel on TPU — single-device, or TP meshes where every
    shard's pool slice stays DMA-aligned (the kernel runs per-shard via
    shard_map, see ``_kernel_attention_tp``); XLA gather path elsewhere.

    The kernel DMAs whole KV-pool pages as (page_size, fused) blocks
    where fused = kv_heads·head_dim / tp per shard, so the *stored* dim
    must be a multiple of the 128-lane tile or Mosaic rejects the memref
    slice.  Real presets (fused 768..1024) pass at tp ≤ 4; shrunken
    test configs may not, and fall back to gather.

    int4 pools under TP require **segment-aligned nibble packing**
    (``kv_segments == tp``): with the r4 global split-half layout (byte
    j holds features j and j+F/2), sharding the stored byte axis on
    "model" hands each shard bytes for features {[sB,(s+1)B) ∪
    [F/2+sB, F/2+(s+1)B)} — NOT its kv heads' contiguous range — and
    the per-shard kernel would pair q heads with the wrong heads' K/V.
    With ``pack_segments == tp`` (kv_cache._absmax_quantize4) each
    shard's slice is one self-contained split-half segment of exactly
    its own heads, so the kernel's lane-concat unpack is correct
    per shard; any other segment count falls back to gather (the
    gather path unpacks the logically-global array with plain XLA ops,
    so GSPMD keeps it correct at any tp)."""
    if jax.default_backend() != "tpu":
        return "gather"
    tp = 1 if mesh is None else mesh.shape.get("model", 1)
    if cfg is not None:
        if cfg.num_kv_heads % tp != 0:
            return "gather"
        if kv_bits == 4 and tp > 1 and kv_segments != tp:
            return "gather"
        fused_local = cfg.num_kv_heads * cfg.head_dim // tp
        stored = fused_local // 2 if kv_bits == 4 else fused_local
        if stored % 128 != 0:
            return "gather"
    return "kernel"


def _kernel_attention_tp(num_kv_heads: int, qs, cache: PagedKVCache, li,
                         lens, table, k_cur, v_cur, mesh,
                         w_live=None, return_stats: bool = False):
    """Fused paged attention under a TP mesh: shard_map over "model".

    The pools are head-sharded (kv_cache sharding in Engine.__init__)
    and GQA groups are contiguous in the q-head dim, so each shard owns
    ``kvh/tp`` complete KV-head groups plus their q heads — attention
    is fully local, zero collectives; each shard runs the same Pallas
    kernel on its slice (mirrors quantized_matmul_tp's routing of the
    dequant matmuls, tgq.parallel.mesh).  With ``return_stats`` each
    shard's (o, m, l) flash partials stay head-sharded; the caller's
    window merge is elementwise per head so GSPMD keeps it local."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from tgq.kernels.paged_attention import paged_decode_attention

    tp = mesh.shape["model"]
    kvh_local = num_kv_heads // tp
    opt = lambda a, spec: None if a is None else spec  # noqa: E731

    in_specs = (
        P(None, "model", None),                       # q (slots, H, d)
        P(None, None, None, "model"),                 # k pools
        P(None, None, None, "model"),                 # v pools
        opt(cache.ks, P(None, None, "model", None)),  # k scales
        opt(cache.vs, P(None, None, "model", None)),  # v scales
        P(),                                          # layer index
        P(),                                          # lens
        P(),                                          # page table
        opt(k_cur, P(None, "model")),                 # current-token K
        opt(v_cur, P(None, "model")),                 # current-token V
        opt(w_live, P()),                             # window live count
    )
    head_spec = P(None, "model", None)
    out_specs = ((head_spec, head_spec, head_spec) if return_stats
                 else head_spec)

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=out_specs, check_vma=False)
    def f(q, k, v, ks, vs, li, lens, table, kc, vc, wl):
        return paged_decode_attention(
            q, k, v, ks, vs, li, lens, table, kc, vc,
            w_live=wl, num_kv_heads=kvh_local, return_stats=return_stats)

    return f(qs, cache.k, cache.v, cache.ks, cache.vs,
             jnp.asarray(li, jnp.int32), lens, table, k_cur, v_cur,
             None if w_live is None else jnp.asarray(w_live, jnp.int32))


def _rope_at(cos_p, sin_p, x):
    """Apply rotary with per-slot cos/sin rows.  x: (slots, heads, d);
    cos_p/sin_p: (slots, d) — gathered from the rope tables ONCE per
    decode step in ``_decode_core`` (they depend only on ``pos``; doing
    the (40960, d)-table gather inside every layer cost 2 gathers × 36
    layers per step)."""
    half = x.shape[-1] // 2
    cos = cos_p[:, None, :]  # (slots, 1, d)
    sin = sin_p[:, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rot.astype(jnp.float32) * sin).astype(x.dtype)


def _gather_attention(cfg: ModelConfig, q, cache, li, table, lens):
    """XLA fallback: gathered-KV attention with bf16 operands."""
    slots = q.shape[0]
    kg, vg = kv_gather(cache, li, table)
    rep = cfg.num_heads // cfg.num_kv_heads
    qg = q.reshape(slots, cfg.num_kv_heads, rep, cfg.head_dim)
    scale = 1.0 / jnp.sqrt(jnp.float32(cfg.head_dim))
    logits = jnp.einsum("skgd,stkd->skgt", qg.astype(kg.dtype), kg,
                        preferred_element_type=jnp.float32) * scale
    t_ids = jnp.arange(kg.shape[1])[None, None, None, :]
    mask = t_ids < lens[:, None, None, None]
    probs = jax.nn.softmax(jnp.where(mask, logits, -1e30), axis=-1)
    return jnp.einsum("skgt,stkd->skgd", probs.astype(vg.dtype), vg,
                      preferred_element_type=jnp.float32
                      ).reshape(slots, cfg.num_heads, cfg.head_dim)


def _window_partial(q_scaled, win, li, w_live, num_kv_heads: int):
    """Flash partials (acc, m, l) of attention over a chunk window's
    raw rows for layer ``li``.

    The window (tgq.serve.kv_cache.window_init) carries this chunk's
    already-decoded K/V rows RAW (bf16, un-equalized) — it is read here
    with plain XLA ops and written with one dynamic-update-slice per
    step, never touching the Pallas kernel, so XLA updates it in place
    across the decode scan (a custom-call operand that is also a DUS
    target gets defensively copied every step — the r3 in-kernel window
    cost ~4 ms/step at 128 slots).  q_scaled: (slots, H, d) f32 with
    the 1/sqrt(d) factor and WITHOUT the KV-equalizer fold (raw rows
    need the raw query).  Returns acc (slots, H, d) f32 UN-normalized,
    m/l (slots, H, 1) f32 — merge with the kernel's partials via
    ``_merge_partials``."""
    from tgq.kernels.paged_attention import DEFAULT_MASK_VALUE

    wk, wv = win
    slots, H, d = q_scaled.shape
    kvh = num_kv_heads
    rep = H // kvh
    W = wk.shape[3]
    # ONE MXU-shaped batched matmul per layer: contract the FULL query
    # head block against every kv head's window rows — (s, H, d) @
    # (s, kvh·W, d)ᵀ — and let the softmax mask kill the off-group
    # (k' != k) logits.  The p it produces is exactly zero off-group,
    # so the AV matmul needs no diagonal extraction either.  The
    # per-(slot, kv-head) GQA einsum form lowered to 1024 tiny
    # (rep × d)·(d × W) dots + window transposes — measured ~4.6
    # ms/step of the composed decode at 128 slots; this form is
    # (32 × 128)·(128 × 128) per slot, bf16 single-pass.
    kw = wk[li].reshape(slots, kvh * W, d)
    vw = wv[li].reshape(slots, kvh * W, d)
    q_bf = q_scaled.astype(jnp.bfloat16)
    logits = jax.lax.dot_general(
        q_bf, kw, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)       # (s, H, kvh*W)
    view = logits.reshape(slots, kvh, rep, kvh, W)
    k_own = jax.lax.broadcasted_iota(jnp.int32, view.shape, 1)
    k_row = jax.lax.broadcasted_iota(jnp.int32, view.shape, 3)
    wcol = jax.lax.broadcasted_iota(jnp.int32, view.shape, 4)
    valid = (k_own == k_row) & (wcol < w_live)
    logits = jnp.where(valid, view, DEFAULT_MASK_VALUE).reshape(
        slots, H, kvh * W)
    m = logits.max(axis=-1, keepdims=True)        # (s, H, 1)
    p = jnp.exp(logits - m)
    l = p.sum(axis=-1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(jnp.bfloat16), vw, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)       # (s, H, d)
    return acc, m, l


def _merge_partials(a, b):
    """Exact merge of two flash-softmax partials (acc, m, l) → the
    normalized attention output.  Masked-empty sides carry the finite
    DEFAULT_MASK_VALUE max, so their exp underflows to zero instead of
    producing -inf - -inf NaNs."""
    acc_a, m_a, l_a = a
    acc_b, m_b, l_b = b
    m = jnp.maximum(m_a, m_b)
    ca = jnp.exp(m_a - m)
    cb = jnp.exp(m_b - m)
    l = ca * l_a + cb * l_b
    return (ca * acc_a + cb * acc_b) / jnp.maximum(l, 1e-30)


def _gather_attention_window(cfg: ModelConfig, q, cache, li, table, lens,
                             win, w_live, k_cur, v_cur):
    """Gather fallback for chunk-window decoding: pools (read-only,
    tokens [0, lens-1-w_live)) + the exact current-token row as one
    masked softmax block, merged with the SAME `_window_partial` the
    kernel path uses — so gather vs kernel differ only in the pool
    block's arithmetic, exactly as in non-window decoding."""
    from tgq.kernels.paged_attention import DEFAULT_MASK_VALUE

    slots = q.shape[0]
    kvh, d = cfg.num_kv_heads, cfg.head_dim
    kg, vg = kv_gather(cache, li, table)          # (slots, T, kvh, d)
    # k_cur/v_cur are the RAW current-token rows (no eq division)
    kc = k_cur.reshape(slots, 1, kvh, d).astype(kg.dtype)
    vc = v_cur.reshape(slots, 1, kvh, d).astype(vg.dtype)
    T = kg.shape[1]
    k_all = jnp.concatenate([kg, kc], axis=1)
    v_all = jnp.concatenate([vg, vc], axis=1)
    t_ids = jnp.arange(T + 1)[None, :]
    pool_len = (lens - 1 - w_live)[:, None]
    valid = jnp.where(t_ids < T, t_ids < pool_len, True)
    rep = cfg.num_heads // kvh
    qg = q.reshape(slots, kvh, rep, d)
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    logits = jnp.einsum("skgd,stkd->skgt", qg.astype(k_all.dtype), k_all,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(valid[:, None, None, :], logits, DEFAULT_MASK_VALUE)
    m = logits.max(axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = p.sum(axis=-1, keepdims=True)
    acc = jnp.einsum("skgt,stkd->skgd", p.astype(v_all.dtype), v_all,
                     preferred_element_type=jnp.float32)
    H = cfg.num_heads
    pool_part = (acc.reshape(slots, H, d), m.reshape(slots, H, 1),
                 l.reshape(slots, H, 1))
    qs = (q.astype(jnp.float32) * scale)
    return _merge_partials(
        pool_part, _window_partial(qs, win, li, w_live, kvh))


def _decode_layer(lp, li, cfg: ModelConfig, x, cache: PagedKVCache,
                  cos_p, sin_p, pos, pages, offsets, table, lens,
                  attn_impl: str, win=None, w_live=None, live=None):
    """One decoder layer's decode for all slots.  Returns (x, cache,
    kv_rows).  With ``win``/``w_live`` (chunk-window mode) the pools are
    never written here — rows flow back for the window write."""
    slots = x.shape[0]
    h = rms_norm(x, lp["input_layernorm"]["weight"], cfg.rms_norm_eps)
    if "qkv_proj" in lp["self_attn"]:
        qkv = apply_linear(lp["self_attn"]["qkv_proj"], h, layer=li)
        q, k, v = jnp.split(
            qkv, [cfg.q_size, cfg.q_size + cfg.kv_size], axis=-1)
    else:
        q = apply_linear(lp["self_attn"]["q_proj"], h, layer=li)
        k = apply_linear(lp["self_attn"]["k_proj"], h, layer=li)
        v = apply_linear(lp["self_attn"]["v_proj"], h, layer=li)
    q = q.reshape(slots, cfg.num_heads, cfg.head_dim)
    k = k.reshape(slots, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(slots, cfg.num_kv_heads, cfg.head_dim)
    if cfg.qk_norm:
        q = rms_norm(q, lp["self_attn"]["q_norm"]["weight"], cfg.rms_norm_eps)
        k = rms_norm(k, lp["self_attn"]["k_norm"]["weight"], cfg.rms_norm_eps)
    q = _rope_at(cos_p, sin_p, q)
    k = _rope_at(cos_p, sin_p, k)

    kv_rows = None
    if attn_impl == "kernel":
        from tgq.kernels.paged_attention import paged_decode_attention

        # deferred pool writes: the kernel folds the current token in
        # from registers (and, in chunk-window mode, this chunk's
        # previous tokens from the window); the caller either scatters
        # all layers' rows at once (kv_write_token_all) or writes them
        # into the window (window_write_step + one flush per chunk)
        kv_rows = (k.reshape(slots, -1).astype(jnp.float32),
                   v.reshape(slots, -1).astype(jnp.float32))
        scale = 1.0 / jnp.sqrt(jnp.float32(cfg.head_dim))
        qs = (q * scale).astype(jnp.float32)
        q_raw = qs  # pre-equalizer query for the raw-row window block
        k_cur, v_cur = kv_rows
        rep = cfg.num_heads // cfg.num_kv_heads
        if cache.k_eq is not None:
            # stored rows are K/eq ⇒ fold eq into the query:
            # (q·eq)·K_stored == q·K; current-token rows divide to match
            ek = cache.k_eq[li]
            qs = (qs.reshape(slots, cfg.num_kv_heads, rep, cfg.head_dim)
                  * ek.reshape(cfg.num_kv_heads, 1, cfg.head_dim)
                  ).reshape(slots, cfg.num_heads, cfg.head_dim)
            k_cur = k_cur / ek
        if cache.v_eq is not None:
            v_cur = v_cur / cache.v_eq[li]
        from tgq.parallel.mesh import serving_mesh

        mesh = serving_mesh()
        stats = win is not None
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            attn = _kernel_attention_tp(cfg.num_kv_heads, qs, cache, li,
                                        lens, table, k_cur, v_cur, mesh,
                                        w_live=w_live, return_stats=stats)
        elif win is None:
            # single-device steady state: pools pass THROUGH the kernel
            # as aliased in/out buffers AND the kernel itself stores
            # the current token's quantized row+scale (write_current) —
            # no XLA pool writes at all.  The r2/r3 alternatives both
            # lost: an end-of-step all-layer scatter makes XLA pick an
            # L-minor-adjacent pool layout ({3,0,2,1}) for the scatter
            # while the Pallas call mandates the default → two
            # full-pool layout copies (~13 ms/step at 128 slots); even
            # per-layer scatters on the aliased buffers lower to
            # serialized row loops (~2 ms/step) and stall the next
            # layer's kernel.
            attn, pk, pv, pks, pvs = paged_decode_attention(
                qs, cache.k, cache.v,
                cache.ks, cache.vs, li, lens, table,
                k_cur, v_cur, live=live,
                num_kv_heads=cfg.num_kv_heads, alias_pools=True,
                write_current=True)
            cache = dataclasses.replace(cache, k=pk, v=pv, ks=pks, vs=pvs)
            kv_rows = None
        else:
            attn = paged_decode_attention(
                qs, cache.k, cache.v,
                cache.ks, cache.vs, li, lens, table,
                k_cur, v_cur,
                w_live=w_live,
                num_kv_heads=cfg.num_kv_heads, return_stats=stats)
        def _veq_scale(a):
            # stored rows are V/eq ⇒ the weighted sum scales back per
            # channel.  Exact on the UN-normalized accumulator too (it
            # is linear in V) — in stats mode this must apply to the
            # kernel partial ONLY, never the raw-row window block.
            return (a.reshape(slots, cfg.num_kv_heads, rep, cfg.head_dim)
                    * cache.v_eq[li].reshape(cfg.num_kv_heads, 1,
                                             cfg.head_dim)
                    ).reshape(slots, cfg.num_heads, cfg.head_dim)

        if stats:
            # merge the kernel's pool+current partials with the raw
            # chunk-window softmax block computed in XLA
            acc_k, m_k, l_k = attn
            if cache.v_eq is not None:
                acc_k = _veq_scale(acc_k)
            attn = _merge_partials(
                (acc_k, m_k, l_k),
                _window_partial(q_raw, win, li, w_live,
                                cfg.num_kv_heads))
        elif cache.v_eq is not None:
            attn = _veq_scale(attn)
    elif win is not None:
        kv_rows = (k.reshape(slots, -1).astype(jnp.float32),
                   v.reshape(slots, -1).astype(jnp.float32))
        attn = _gather_attention_window(
            cfg, q, cache, li, table, lens, win, w_live,
            kv_rows[0], kv_rows[1]).astype(jnp.float32)
    else:
        # live gate: retired/staging slots must not scribble their (or
        # the scratch page's) rows — route their writes to page 0
        wpages = pages if live is None else jnp.where(live > 0, pages, 0)
        cache = kv_write_token(cache, li, wpages, offsets, k, v)
        attn = _gather_attention(cfg, q, cache, li, table, lens)

    x = x + apply_linear(lp["self_attn"]["o_proj"],
                         attn.reshape(slots, cfg.q_size).astype(x.dtype),
                         layer=li)
    h2 = rms_norm(x, lp["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
    # NOTE: quantized_matmul(glu=True) can fold silu(gate)·up into the
    # down kernel, but measured +1.25 ms/step at 128 slots on v5e (the
    # kernel re-reads gate+up tiles separately and the in-kernel silu
    # sits on the MXU critical path, while XLA's separate elementwise
    # fusion overlaps with the previous kernel) — the split form stays.
    if "gate_up_proj" in lp["mlp"]:
        gate, up = jnp.split(
            apply_linear(lp["mlp"]["gate_up_proj"], h2, layer=li), 2, axis=-1)
    else:
        gate = apply_linear(lp["mlp"]["gate_proj"], h2, layer=li)
        up = apply_linear(lp["mlp"]["up_proj"], h2, layer=li)
    x = x + apply_linear(lp["mlp"]["down_proj"], jax.nn.silu(gate) * up,
                         layer=li)
    return x, cache, kv_rows


def _decode_core(params, cache: PagedKVCache, cfg: ModelConfig,
                 table, lens, tokens, pos, attn_impl: str,
                 win=None, w_live=None, live=None):
    """One token for every slot.

    table: (slots, mpps) int32; lens: (slots,) lengths *including* the
    token being decoded; tokens: (slots,) current input token; pos:
    (slots,) its position (= lens - 1).  Returns (logits, cache, rows).

    With ``win``/``w_live`` (chunk-window mode, decode_steps) the pools
    are NEVER written here — the raw K/V rows return to the caller for
    the window write, and the pools stay scan-invariant so XLA never
    copies them (they are attention-kernel operands).  Without a
    window, rows are scattered here per step (decode_step's path).

    Stacked layer params (see ``stack_layer_params``) run as one
    ``lax.scan`` over (layer params, layer index) — one traced layer
    body regardless of depth; a plain per-layer list falls back to a
    python loop.
    """
    page = cache.page_size
    slots = tokens.shape[0]
    x = embed_tokens(params, tokens[:, None])[:, 0]  # (slots, hidden)
    cos_tab, sin_tab = rope_cache(cfg, cfg.max_position_embeddings)
    cos_p, sin_p = cos_tab[pos], sin_tab[pos]  # (slots, d), once per step
    pages = table[jnp.arange(slots), pos // page]
    offsets = pos % page

    layers = params["model"]["layers"]
    out_rows = None
    if isinstance(layers, list):
        rows = []
        for li, lp in enumerate(layers):
            x, cache, kv_rows = _decode_layer(
                lp, li, cfg, x, cache, cos_p, sin_p,
                pos, pages, offsets, table, lens, attn_impl,
                win=win, w_live=w_live, live=live)
            rows.append(kv_rows)
        if rows and rows[0] is not None:
            ka = jnp.stack([r[0] for r in rows]).reshape(
                len(rows), slots, cfg.num_kv_heads, cfg.head_dim)
            va = jnp.stack([r[1] for r in rows]).reshape(
                len(rows), slots, cfg.num_kv_heads, cfg.head_dim)
            if win is None:
                wpages = (pages if live is None
                          else jnp.where(live > 0, pages, 0))
                cache = kv_write_token_all(cache, wpages, offsets, ka, va)
            else:
                out_rows = (ka, va)
    else:
        n_layers = jax.tree.leaves(layers)[0].shape[0]

        def body(carry, li):
            x, cache = carry
            lp = _slice_layer(layers, li)
            x, cache, kv_rows = _decode_layer(
                lp, li, cfg, x, cache, cos_p, sin_p,
                pos, pages, offsets, table, lens, attn_impl,
                win=win, w_live=w_live, live=live)
            return (x, cache), kv_rows

        (x, cache), rows = jax.lax.scan(
            body, (x, cache), jnp.arange(n_layers))
        if rows is not None:
            ka = rows[0].reshape(n_layers, slots, cfg.num_kv_heads,
                                 cfg.head_dim)
            va = rows[1].reshape(n_layers, slots, cfg.num_kv_heads,
                                 cfg.head_dim)
            if win is None:
                # one batched scatter for all layers' current-token K/V
                wpages = (pages if live is None
                          else jnp.where(live > 0, pages, 0))
                cache = kv_write_token_all(cache, wpages, offsets, ka, va)
            else:
                out_rows = (ka, va)

    x = apply_final_norm(params, cfg, x[:, None])[:, 0]
    logits = lm_logits(params, cfg, x[:, None])[:, 0]
    return logits, cache, out_rows


@partial(jax.jit, static_argnames=("cfg", "attn_impl", "mesh"),
         donate_argnums=(1,))
def decode_step(params, cache: PagedKVCache, cfg: ModelConfig,
                table, lens, tokens, pos, attn_impl: str = "gather",
                mesh=None, live=None):
    """One decode token per slot.  ``mesh`` is static and scopes the TP
    routing of packed matmuls for this trace — part of the jit cache key
    so mesh/non-mesh engines never alias a compiled program."""
    from tgq.parallel.mesh import serving_mesh_scope

    with serving_mesh_scope(mesh):
        logits, cache, _ = _decode_core(params, cache, cfg, table, lens,
                                        tokens, pos, attn_impl, live=live)
    return logits, cache


def _sample_tokens(logits, temps, key, greedy_only: bool = False):
    """Per-slot greedy/temperature sampling on device.  logits: (slots,
    vocab); temps: (slots,) with 0 = greedy.  Returns (tokens, key).

    ``greedy_only`` (static, from the engine when every active request
    has temperature 0 — the common serving default) skips the
    categorical path entirely: at a 152k vocab the threefry gumbel
    draw + log/divide is ~300 MB of VPU traffic per decode step that
    the ``where`` would just throw away."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if greedy_only:
        return greedy, key
    key, sub = jax.random.split(key)
    safe_t = jnp.maximum(temps, 1e-6)[:, None]
    sampled = jax.random.categorical(
        sub, logits.astype(jnp.float32) / safe_t, axis=-1).astype(jnp.int32)
    return jnp.where(temps > 0, sampled, greedy), key


@partial(jax.jit, static_argnames=("cfg", "n_steps", "attn_impl", "mesh",
                                   "greedy_only"),
         donate_argnums=(1,))
def decode_steps(params, cache: PagedKVCache, cfg: ModelConfig,
                 table, lens, tokens, pos, temps, key, n_steps: int,
                 attn_impl: str = "gather", mesh=None,
                 greedy_only: bool = False, live=None):
    """``n_steps`` tokens for every slot with zero host round-trips.

    The per-step host sync (sampled-token D2H + full-logits transfer)
    dominates decode latency on a remote-attached chip, so the engine
    batches ``n_steps`` decode iterations into one dispatch: sampling
    runs on device (`_sample_tokens`) and only the (n_steps, slots)
    int32 token block crosses to the host.  The page table must already
    cover ``lens + n_steps`` tokens per slot (the engine pre-extends).

    lens/pos are the step-0 values under decode_step's convention (lens
    includes the token being decoded; pos = lens - 1); both advance by 1
    each scanned step.  Returns (tokens (n_steps, slots), cache, key).
    """
    from tgq.parallel.mesh import serving_mesh_scope
    from tgq.serve.kv_cache import (window_flush, window_init,
                                    window_write_step)

    # the chunk window exists only for the TP *kernel* path: a
    # shard_map'd Pallas call cannot alias the pools through the call,
    # so they must stay scan-invariant.  TP + gather (CPU meshes) uses
    # the same plain per-step path as single-device — GSPMD shards the
    # scatter correctly, and sharing the arithmetic with the
    # single-device engine keeps greedy traces comparable.
    tp = mesh is not None and mesh.shape.get("model", 1) > 1
    if n_steps == 1 or not (tp and attn_impl == "kernel"):
        # plain per-step scan.  On the single-device kernel path the
        # pools pass THROUGH the attention kernel as aliased in/out
        # buffers (paged_decode_attention alias_pools), so the per-step
        # kv_write_token_all scatter updates the kernel's own output in
        # place — XLA carries the pools through the scan with zero
        # copies and no chunk-window machinery (the r3 window existed
        # only to dodge the operand+scatter-target defensive copy).
        def step1(carry, _):
            cache, tok, lens, pos, key = carry
            logits, cache, _ = _decode_core(params, cache, cfg, table,
                                            lens, tok, pos, attn_impl,
                                            live=live)
            tok, key = _sample_tokens(logits, temps, key, greedy_only)
            return (cache, tok, lens + 1, pos + 1, key), tok

        with serving_mesh_scope(mesh):
            (cache, _, _, _, key), toks = jax.lax.scan(
                step1, (cache, tokens, lens, pos, key), None,
                length=n_steps)
        return toks, cache, key

    # TP chunk-window mode: the shard_map'd kernel cannot alias the
    # pools through the call, so they stay SCAN-INVARIANT — per-step
    # rows land in a small RAW bf16 window read only by XLA attention
    # (_window_partial) and written with one DUS per step, and ONE
    # quantize+flush scatter runs after the scan.  The per-step scatter
    # forced XLA to copy the pools every step (custom-call operand +
    # scatter target): ~9 ms/step at 128 slots; the r3 quantized
    # in-kernel window re-created the same copy at window scale
    # (~4 ms/step) because the window itself was a kernel operand.
    pos0 = pos

    def step(carry, _):
        win, tok, lens, pos, key, i = carry
        logits, _, rows = _decode_core(params, cache, cfg, table, lens,
                                       tok, pos, attn_impl,
                                       win=win, w_live=i, live=live)
        win = window_write_step(win, i, rows[0], rows[1])
        tok, key = _sample_tokens(logits, temps, key, greedy_only)
        return (win, tok, lens + 1, pos + 1, key, i + 1), tok

    with serving_mesh_scope(mesh):
        win = window_init(cache, tokens.shape[0], n_steps)
        (win, _, _, _, key, _), toks = jax.lax.scan(
            step, (win, tokens, lens, pos, key, jnp.int32(0)),
            None, length=n_steps)
        cache = window_flush(cache, win, table, pos0, n_steps, live=live)
    return toks, cache, key


def _prefill_layer(lp, li, cfg: ModelConfig, x, cache: PagedKVCache,
                   cos, sin, slot_pages, attn_impl: str):
    """One layer of batched prefill; writes pages, attends in-activation."""
    from tgq.models.causal_lm import apply_rope, causal_attention

    b, seq, _ = x.shape
    h = rms_norm(x, lp["input_layernorm"]["weight"], cfg.rms_norm_eps)
    if "qkv_proj" in lp["self_attn"]:
        qkv = apply_linear(lp["self_attn"]["qkv_proj"], h, layer=li)
        q, k, v = jnp.split(
            qkv, [cfg.q_size, cfg.q_size + cfg.kv_size], axis=-1)
    else:
        q = apply_linear(lp["self_attn"]["q_proj"], h, layer=li)
        k = apply_linear(lp["self_attn"]["k_proj"], h, layer=li)
        v = apply_linear(lp["self_attn"]["v_proj"], h, layer=li)
    q = q.reshape(b, seq, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, seq, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, seq, cfg.num_kv_heads, cfg.head_dim)
    if cfg.qk_norm:
        q = rms_norm(q, lp["self_attn"]["q_norm"]["weight"], cfg.rms_norm_eps)
        k = rms_norm(k, lp["self_attn"]["k_norm"]["weight"], cfg.rms_norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    cache = kv_write_pages(cache, li, slot_pages, k, v)
    attn = causal_attention(q, k, v, impl=attn_impl)
    x = x + apply_linear(lp["self_attn"]["o_proj"],
                         attn.reshape(b, seq, cfg.q_size).astype(x.dtype),
                         layer=li)
    h2 = rms_norm(x, lp["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
    if "gate_up_proj" in lp["mlp"]:
        gate, up = jnp.split(
            apply_linear(lp["mlp"]["gate_up_proj"], h2, layer=li), 2, axis=-1)
    else:
        gate = apply_linear(lp["mlp"]["gate_proj"], h2, layer=li)
        up = apply_linear(lp["mlp"]["up_proj"], h2, layer=li)
    x = x + apply_linear(lp["mlp"]["down_proj"], jax.nn.silu(gate) * up,
                         layer=li)
    return x, cache


@partial(jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=(1,))
def prefill(params, cache: PagedKVCache, cfg: ModelConfig,
            slot_pages, input_ids, true_len, mesh=None):
    """Process one prompt (padded to a page multiple) and fill its pages.

    slot_pages: (n_pages,) physical pages; input_ids: (1, seq_pad);
    true_len: scalar — returns (last-token logits, cache)."""
    from tgq.parallel.mesh import serving_mesh_scope

    with serving_mesh_scope(mesh):
        logits, cache = _prefill_core(params, cache, cfg, slot_pages[None],
                                      input_ids, true_len[None])
    return logits[0], cache


def _prefill_core(params, cache: PagedKVCache, cfg: ModelConfig,
                  slot_pages, input_ids, true_len):
    """Batched prefill: b prompts padded to the same page multiple.

    slot_pages: (b, n_pages); input_ids: (b, seq_pad); true_len: (b,).
    Returns (last-token logits (b, vocab), cache).
    """
    b, seq = input_ids.shape
    x = embed_tokens(params, input_ids)
    cos, sin = rope_cache(cfg, seq)
    attn_impl = "naive" if seq < 512 else "auto"

    layers = params["model"]["layers"]
    if isinstance(layers, list):
        for li, lp in enumerate(layers):
            x, cache = _prefill_layer(lp, li, cfg, x, cache, cos, sin,
                                      slot_pages, attn_impl)
    else:
        n_layers = jax.tree.leaves(layers)[0].shape[0]

        def body(carry, li):
            x, cache = carry
            lp = _slice_layer(layers, li)
            x, cache = _prefill_layer(lp, li, cfg, x, cache, cos, sin,
                                      slot_pages, attn_impl)
            return (x, cache), None

        (x, cache), _ = jax.lax.scan(
            body, (x, cache), jnp.arange(n_layers))

    x = apply_final_norm(params, cfg, x)
    last = x[jnp.arange(b), true_len - 1][:, None]
    logits = lm_logits(params, cfg, last)[:, 0]
    return logits, cache


@partial(jax.jit, static_argnames=("cfg", "mesh", "greedy_only"),
         donate_argnums=(1,))
def prefill_batch(params, cache: PagedKVCache, cfg: ModelConfig,
                  slot_pages, input_ids, true_len, temps, key, mesh=None,
                  greedy_only: bool = False):
    """Batched prefill with on-device sampling: returns (first tokens
    (b,) int32, cache, key) — only b int32s cross to the host, and b
    prompts cost one dispatch instead of b (admission-wave TTFT)."""
    from tgq.parallel.mesh import serving_mesh_scope

    with serving_mesh_scope(mesh):
        logits, cache = _prefill_core(params, cache, cfg, slot_pages,
                                      input_ids, true_len)
        toks, key = _sample_tokens(logits, temps, key, greedy_only)
    return toks, cache, key
