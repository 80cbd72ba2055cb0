from torch_tts_tpu.core import masks, config
