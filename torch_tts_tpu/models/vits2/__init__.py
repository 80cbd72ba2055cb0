from torch_tts_tpu.models.vits2.model import SynthesizerTrn, AVAILABLE_FLOW_TYPES
from torch_tts_tpu.models.vits2.discriminators import (
    MultiPeriodDiscriminator,
    DurationDiscriminatorV1,
    DurationDiscriminatorV2,
)
