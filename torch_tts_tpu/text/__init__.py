from torch_tts_tpu.text.symbols import symbols, SPACE_ID
from torch_tts_tpu.text.frontend import (
    text_to_sequence,
    cleaned_text_to_sequence,
    sequence_to_text,
    intersperse,
)
from torch_tts_tpu.text.encoder import TextEncoder, MixedTextEncoder
