from moegan_tpu.core.modconv import ModulatedConv
from moegan_tpu.core.mtm import ModulatedTransformationModule
from moegan_tpu.core.router import BayesianRouter
from moegan_tpu.core.moe import SparseMoE, SparseExpertFFN
from moegan_tpu.core.attention import AttentionBlock, MultiHeadAttention
from moegan_tpu.core.blocks import ConvolutionBlock, GenerativeBlock

__all__ = [
    "ModulatedConv",
    "ModulatedTransformationModule",
    "BayesianRouter",
    "SparseMoE",
    "SparseExpertFFN",
    "AttentionBlock",
    "MultiHeadAttention",
    "ConvolutionBlock",
    "GenerativeBlock",
]
