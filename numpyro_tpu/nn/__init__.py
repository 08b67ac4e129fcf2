from numpyro_tpu.nn.auto_reg_nn import AutoregressiveNN
from numpyro_tpu.nn.block_neural_arn import BlockNeuralAutoregressiveNN
from numpyro_tpu.nn.masked_dense import MaskedDense

__all__ = ["AutoregressiveNN", "BlockNeuralAutoregressiveNN", "MaskedDense"]
