"""Model architecture configs for the decoder families the framework serves.

The reference adapts whatever HF ``AutoModelForCausalLM`` loads
(model_utils.py:23-74, developed on Qwen3-8B and supporting Llama-style
stacks).  Here the models are first-party JAX definitions; these configs
cover the same families (Qwen3, Llama-3) plus tiny variants for tests.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rope_theta: float = 1e6
    rms_norm_eps: float = 1e-6
    qk_norm: bool = True          # Qwen3 per-head q/k RMSNorm
    attention_bias: bool = False  # Qwen2-style qkv bias
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 40960
    seqlen: int = 2048            # calibration/eval window (reference default)
    # "llama" covers the RMSNorm+SiLU+rope decoders (Qwen3/Qwen2.5/
    # Llama-3, differentiated by the flags above); "gpt2" is the
    # structurally different transformer.h layout: LayerNorm with bias,
    # fused QKV (attn.c_attn), GELU MLP, learned position embeddings
    # (reference model_utils.py:54-74 adapts this family via
    # model.transformer.h); "opt" is the model.decoder.layers layout:
    # LayerNorm with bias, unfused biased q/k/v/out projections, ReLU
    # MLP, learned positions with the HF +2 offset (reference
    # model_utils.py:60-63)
    family: str = "llama"

    @property
    def q_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim


PRESETS: dict[str, ModelConfig] = {}


def _register(cfg: ModelConfig) -> ModelConfig:
    PRESETS[cfg.name] = cfg
    return cfg


# Qwen3 family (configs mirror the published HF configs)
QWEN3_0_6B = _register(ModelConfig(
    name="qwen3-0.6b", vocab_size=151936, hidden_size=1024,
    intermediate_size=3072, num_layers=28, num_heads=16, num_kv_heads=8,
    head_dim=128, rope_theta=1e6, tie_word_embeddings=True,
))
QWEN3_8B = _register(ModelConfig(
    name="qwen3-8b", vocab_size=151936, hidden_size=4096,
    intermediate_size=12288, num_layers=36, num_heads=32, num_kv_heads=8,
    head_dim=128, rope_theta=1e6,
))

# Llama-3 family
LLAMA3_8B = _register(ModelConfig(
    name="llama3-8b", vocab_size=128256, hidden_size=4096,
    intermediate_size=14336, num_layers=32, num_heads=32, num_kv_heads=8,
    head_dim=128, rope_theta=5e5, rms_norm_eps=1e-5, qk_norm=False,
))
LLAMA3_70B = _register(ModelConfig(
    name="llama3-70b", vocab_size=128256, hidden_size=8192,
    intermediate_size=28672, num_layers=80, num_heads=64, num_kv_heads=8,
    head_dim=128, rope_theta=5e5, rms_norm_eps=1e-5, qk_norm=False,
))

# Qwen2.5 family (qkv biases, no qk-norm)
QWEN25_7B = _register(ModelConfig(
    name="qwen2.5-7b", vocab_size=152064, hidden_size=3584,
    intermediate_size=18944, num_layers=28, num_heads=28, num_kv_heads=4,
    head_dim=128, rope_theta=1e6, qk_norm=False, attention_bias=True,
))

# GPT-2 family (transformer.h layout; intermediate = 4·hidden, ctx 1024)
GPT2 = _register(ModelConfig(
    name="gpt2", vocab_size=50257, hidden_size=768, intermediate_size=3072,
    num_layers=12, num_heads=12, num_kv_heads=12, head_dim=64,
    rms_norm_eps=1e-5, qk_norm=False, tie_word_embeddings=True,
    max_position_embeddings=1024, seqlen=1024, family="gpt2",
))
GPT2_XL = _register(ModelConfig(
    name="gpt2-xl", vocab_size=50257, hidden_size=1600,
    intermediate_size=6400, num_layers=48, num_heads=25, num_kv_heads=25,
    head_dim=64, rms_norm_eps=1e-5, qk_norm=False, tie_word_embeddings=True,
    max_position_embeddings=1024, seqlen=1024, family="gpt2",
))

# OPT family (model.decoder.layers layout: LayerNorm+bias, unfused
# biased q/k/v/out projections, ReLU fc1/fc2, learned positions with the
# HF +2 offset; reference model_utils.py:60-63 adapts this family via
# model.model.decoder.layers).  Pre-norm variants only (350m is
# post-norm + project_in/out and is rejected at import).
OPT_125M = _register(ModelConfig(
    name="opt-125m", vocab_size=50272, hidden_size=768,
    intermediate_size=3072, num_layers=12, num_heads=12, num_kv_heads=12,
    head_dim=64, rms_norm_eps=1e-5, qk_norm=False, tie_word_embeddings=True,
    max_position_embeddings=2048, seqlen=2048, family="opt",
))
OPT_1_3B = _register(ModelConfig(
    name="opt-1.3b", vocab_size=50272, hidden_size=2048,
    intermediate_size=8192, num_layers=24, num_heads=32, num_kv_heads=32,
    head_dim=64, rms_norm_eps=1e-5, qk_norm=False, tie_word_embeddings=True,
    max_position_embeddings=2048, seqlen=2048, family="opt",
))

# tiny variants for hermetic tests (structure-identical to their parents)
TINY_QWEN3 = _register(ModelConfig(
    name="tiny-qwen3", vocab_size=512, hidden_size=64,
    intermediate_size=128, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=16, rope_theta=1e4, tie_word_embeddings=True, seqlen=128,
))
# Like tiny-qwen3 but with a 128-lane-aligned fused KV dim
# (num_kv_heads*head_dim = 128) so the fused paged-attention kernel's
# page DMA is Mosaic-legal on real TPU hardware — the composed-path
# kernel tests use this one; real models are always aligned.
TINY_QWEN3_KV128 = _register(ModelConfig(
    name="tiny-qwen3-kv128", vocab_size=512, hidden_size=64,
    intermediate_size=128, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=64, rope_theta=1e4, tie_word_embeddings=True, seqlen=128,
))
TINY_LLAMA = _register(ModelConfig(
    name="tiny-llama", vocab_size=512, hidden_size=64,
    intermediate_size=128, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=16, rope_theta=1e4, qk_norm=False, seqlen=128,
))
TINY_QWEN2 = _register(ModelConfig(
    name="tiny-qwen2", vocab_size=512, hidden_size=64,
    intermediate_size=128, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=16, rope_theta=1e4, qk_norm=False, attention_bias=True,
    seqlen=128,
))
TINY_GPT2 = _register(ModelConfig(
    name="tiny-gpt2", vocab_size=512, hidden_size=64,
    intermediate_size=256, num_layers=2, num_heads=4, num_kv_heads=4,
    head_dim=16, rms_norm_eps=1e-5, qk_norm=False,
    tie_word_embeddings=True, max_position_embeddings=256, seqlen=128,
    family="gpt2",
))
TINY_OPT = _register(ModelConfig(
    name="tiny-opt", vocab_size=512, hidden_size=64,
    intermediate_size=256, num_layers=2, num_heads=4, num_kv_heads=4,
    head_dim=16, rms_norm_eps=1e-5, qk_norm=False,
    tie_word_embeddings=True, max_position_embeddings=256, seqlen=128,
    family="opt",
))
