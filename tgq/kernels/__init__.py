from tgq.kernels.gptq_block import process_block_pallas
