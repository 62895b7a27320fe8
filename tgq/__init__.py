"""tgq — TPU-native TruncGPTQ quantization + serving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
davidtweedle/gptq-svd (reference mounted at /root/reference):

- ``tgq.core``     quantization math (uniform affine quantizer, static groups)
                   and packed INT4/INT3/INT2/INT8 storage formats.
- ``tgq.solver``   the TruncGPTQ solver stack: streamed Hessian accumulation,
                   truncated spectral factorization, rank-revealing pivoted QR,
                   and the blockwise column-sequential quantization loop.
- ``tgq.kernels``  Pallas TPU kernels (GPTQ block kernel, fused dequant-matmul).
- ``tgq.models``   pure-JAX decoder model definitions (Qwen3, Llama-3) with
                   mesh-aware sharding and HF-checkpoint import.
- ``tgq.calib``    the layer-sequential calibration pipeline driver.
- ``tgq.eval``     strided sliding-window perplexity evaluation.
- ``tgq.serve``    quantized serving engine: paged KV cache, continuous
                   batching, multi-host tensor parallelism.
- ``tgq.parallel`` device mesh construction and sharding rules.
- ``tgq.cli``      flag-compatible command-line entry points.

The reference is CUDA/torch/Triton/Magma; nothing here is a translation.
Everything on the compute path is jit-compiled JAX with Pallas kernels for
the hot loops, float64 exists only inside host callbacks (TPUs have no f64),
and parallelism is jax.sharding over a Mesh instead of NCCL.
"""

__version__ = "0.1.0"
