from tgq.solver.hessian import HessianAccumulator, SketchAccumulator, hessian_from_activations
from tgq.solver.factorize import (
    FactorResult,
    trunc_spectral_factor,
    gptq_cholesky_factor,
    sketch_factor,
    truncate_rank,
)
from tgq.solver.gptq_loop import quantize_weight, QuantizeResult
from tgq.solver.pqr import pivoted_qr
