from tgq.calib.data import get_loaders, load_eval_tokens, synthetic_calibration
from tgq.calib.pipeline import quantize_model, QuantizeConfig
