"""Backend-aware matmul precision selection for f32 solver GEMMs.

The solver's dense linear algebra (Gram matrices, blocked triangular
inverse, error-propagation GEMMs) needs ~f32 accuracy from genuinely-f32
operands.  On TPU, ``Precision.HIGHEST`` lowers an f32 dot to the 6-pass
bf16 decomposition (~29 TF/s on v5e at 12288²); the 3-pass
``BF16_BF16_F32_X3`` algorithm delivers ~1.9× that (measured 54 TF/s)
with relative error ~1e-7 per GEMM — far below both the solver's
pivot-breakdown guard (pivot_rtol=1e-6) and the quantization noise floor
(~1e-2).  The reference pins f32 for the same role by disabling TF32
(gptq_utils.py:474-475); X3-on-TPU is the equivalent "fast but
f32-faithful" point on TPU hardware.

On CPU (tests) and any backend without dot-algorithm support this
resolves to HIGHEST, so CPU test vectors — including the pchol≡eigh
pivot-parity assertions — are unchanged.
"""
from __future__ import annotations

import functools

import jax


@functools.cache
def best_f32_dot_precision():
    """Fastest dot precision that preserves ~f32 accuracy on this backend."""
    if jax.default_backend() == "tpu":
        try:
            return jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3
        except AttributeError:  # older jax
            pass
    return jax.lax.Precision.HIGHEST
