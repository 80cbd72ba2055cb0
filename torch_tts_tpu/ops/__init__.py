# Submodules are imported directly (torch_tts_tpu.ops.layers etc.); keep this
# __init__ empty to avoid import cycles while the library is assembled.
