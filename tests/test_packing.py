"""Packed INT4/3/2/8 storage round-trip tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from tgq.core.packing import PackedLinear, pack_rows, unpack_rows
from tgq.core.quant import QuantSpec, expand_params, find_params, quantize, dequantize


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_pack_unpack_roundtrip(rng, bits):
    n = 256
    codes = rng.integers(0, 2**bits, size=(16, n)).astype(np.int32)
    packed = pack_rows(jnp.asarray(codes), bits)
    out = unpack_rows(packed, bits)
    np.testing.assert_array_equal(np.asarray(out), codes)


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_packed_sizes(bits):
    n = 256
    codes = jnp.zeros((4, n), jnp.int32)
    packed = pack_rows(codes, bits)
    assert packed.dtype == jnp.uint8
    assert packed.size * 8 == 4 * n * bits  # exactly b bits per code


@pytest.mark.parametrize("bits", [2, 3, 4])
@pytest.mark.parametrize("sym", [False, True])
def test_packed_linear_dequant_matches_fake_quant(rng, bits, sym):
    spec = QuantSpec(bits=bits, group_size=64, sym=sym)
    w = rng.normal(size=(8, 128)).astype(np.float32)
    p = find_params(jnp.asarray(w), spec)
    scale, zero = expand_params(p, 128)
    q = quantize(jnp.asarray(w), scale, zero, spec)
    wq = dequantize(q, scale, zero)

    packed = PackedLinear.from_codes(q.astype(jnp.int32), p.scale, p.zero, spec)
    np.testing.assert_allclose(np.asarray(packed.dequantize()), np.asarray(wq), rtol=1e-6, atol=1e-6)


def test_packed_linear_is_pytree(rng):
    import jax

    spec = QuantSpec(bits=4, group_size=-1, sym=False)
    w = rng.normal(size=(8, 128)).astype(np.float32)
    p = find_params(jnp.asarray(w), spec)
    scale, zero = expand_params(p, 128)
    q = quantize(jnp.asarray(w), scale, zero, spec)
    packed = PackedLinear.from_codes(q.astype(jnp.int32), p.scale, p.zero, spec)
    leaves = jax.tree_util.tree_leaves(packed)
    assert len(leaves) == 3  # codes, scale, zero

    @jax.jit
    def deq(pl: PackedLinear):
        return pl.dequantize()

    out = deq(packed)
    assert out.shape == (8, 128)


def test_concat_out_matches_parts(rng):
    """concat_out fuses out-dims exactly: dequant(concat) == vstack of
    the parts' dequants (quant groups run along in_features)."""
    from tgq.core.packing import concat_out

    spec = QuantSpec(bits=4, group_size=32, sym=False)
    parts = []
    deqs = []
    for m in (16, 8, 8):
        w = jnp.asarray(rng.normal(size=(m, 64)).astype(np.float32))
        p = find_params(w, spec)
        scale, zero = expand_params(p, 64)
        q = quantize(w, scale, zero, spec).astype(jnp.int32)
        pl = PackedLinear.from_codes(q, p.scale, p.zero, spec)
        parts.append(pl)
        deqs.append(np.asarray(pl.dequantize()))
    fused = concat_out(parts)
    assert fused.out_features == 32 and fused.in_features == 64
    np.testing.assert_array_equal(
        np.asarray(fused.dequantize()), np.vstack(deqs))


def test_pad_out_head_logits_unchanged():
    """pad_out lane-pads a packed vocab head; lm_logits slices back so
    logits (and thus sampling) are unchanged."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tgq.core.packing import PackedLinear, pad_out
    from tgq.core.quant import QuantSpec, expand_params, find_params, quantize
    from tgq.models.causal_lm import lm_logits
    from tgq.models.config import PRESETS

    cfg = dataclasses.replace(PRESETS["tiny-qwen3"], vocab_size=600,
                              tie_word_embeddings=False)
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((600, cfg.hidden_size)), jnp.float32)
    spec = QuantSpec(bits=8, group_size=32, sym=False)
    p = find_params(w, spec)
    s, z = expand_params(p, cfg.hidden_size)
    q = quantize(w, s, z, spec).astype(jnp.int32)
    head = PackedLinear.from_codes(q, p.scale, p.zero, spec)
    padded = pad_out(head, 512)
    assert padded.out_features == 1024

    x = jnp.asarray(rng.standard_normal((3, 1, cfg.hidden_size)),
                    jnp.bfloat16)
    want = np.asarray(lm_logits({"lm_head": head}, cfg, x))
    got = np.asarray(lm_logits({"lm_head": padded}, cfg, x))
    assert got.shape == want.shape == (3, 1, 600)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int3_planes21_byte_layout():
    """Pin the v2 'planes21' int3 byte layout (checkpoint pack_layout=2):
    per group, g/4 bytes of split-quarter 2-bit plane then g/8 bytes of
    split-eighth 1-bit plane.  A layout drift would silently corrupt
    every stored W3 checkpoint, so the exact bytes are asserted."""
    import numpy as np
    import jax.numpy as jnp

    from tgq.core.packing import pack_rows

    g = 8
    codes = np.array([[1, 3, 0, 2, 5, 7, 4, 6]], np.int32)  # one group
    p = np.asarray(pack_rows(jnp.asarray(codes), 3, group_size=g))
    assert p.shape == (1, 3)
    lo = codes & 3          # [1,3,0,2,1,3,0,2]
    hi = (codes >> 2) & 1   # [0,0,0,0,1,1,1,1]
    # 2-bit plane: byte j = lo[j] | lo[j+2]<<2 | lo[j+4]<<4 | lo[j+6]<<6
    exp0 = lo[0, 0] | lo[0, 2] << 2 | lo[0, 4] << 4 | lo[0, 6] << 6
    exp1 = lo[0, 1] | lo[0, 3] << 2 | lo[0, 5] << 4 | lo[0, 7] << 6
    # 1-bit plane: byte 0 = sum hi[e] << e
    exp2 = sum(int(hi[0, e]) << e for e in range(8))
    assert list(p[0]) == [exp0, exp1, exp2], (p, [exp0, exp1, exp2])
