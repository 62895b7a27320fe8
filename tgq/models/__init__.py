from tgq.models.config import ModelConfig, PRESETS
from tgq.models.causal_lm import (
    greedy_generate,
    init_params,
    embed_tokens,
    decoder_layer,
    apply_final_norm,
    lm_logits,
    forward,
    rope_cache,
    find_linear_paths,
    sequenced_groups,
)
