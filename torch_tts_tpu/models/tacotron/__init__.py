from torch_tts_tpu.models.tacotron.model import (
    Tacotron,
    Encoder,
    Encoder2,
    Decoder,
    Taco1DecoderCell,
    Taco2DecoderCell,
    Taco2ProdDecoderCell,
    build_tacotron,
)
