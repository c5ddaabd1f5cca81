from egoego_release_tpu.models.transformer import Decoder, MultiHeadAttention
from egoego_release_tpu.models.mlp import MLP
from egoego_release_tpu.models.denoiser import TransformerDiffusionModel
