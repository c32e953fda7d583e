"""TPU-native framework for context-adaptive neural-network-based intra prediction.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
thierrydumas/context_adaptive_neural_network_based_prediction (IEEE TIP 2019,
arXiv:1807.06244): HEVC All-Intra encoding/decoding with PNN intra predictors
(fully-connected for 4x4/8x8 target blocks, two-branch convolutional for
16x16-64x64), three codec behaviours (regular / substitution / switch), and the
research stack around them (dataset creation, training, prediction benchmarks,
rate-distortion and mode-statistics experiments).

Subpackages
-----------
utils     : color conversion, PSNR, Bjontegaard, YUV/image IO, CLI validators.
data      : context/target extraction, masking, dataset builders, input pipeline.
models    : PNN model family (FC + convolutional), losses, training, IPFCN baseline.
ops       : HEVC intra-mode kernels, integer transforms, SATD, Pallas kernels.
codec     : CABAC, syntax coding, RDO, full-frame encoder/decoder, stats.
parallel  : device-mesh sharding, CTU wavefront schedule, halo exchange.
"""

__version__ = "0.1.0"
