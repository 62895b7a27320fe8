from tgq.core.quant import QuantSpec, QuantParams, find_params, expand_params, quantize, dequantize, fake_quantize
from tgq.core.packing import pack_rows, unpack_rows, PackedLinear
