from vae_music_tpu.nn.resnet import ResnetConv1DBlock, DilatedResnet1D
from vae_music_tpu.nn.encdec import EncoderConvBlock, DecoderConvBlock, Encoder, Decoder
from vae_music_tpu.nn.quantizer import (
    CodebookState,
    init_codebook,
    quantize,
    codebook_lookup,
    VQOutput,
)
from vae_music_tpu.nn.positional import (
    sinusoidal_encoding,
    PositionalEmbedding,
    noam_schedule,
)
