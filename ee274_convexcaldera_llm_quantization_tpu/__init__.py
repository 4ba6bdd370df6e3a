"""TPU-native CALDERA / Convex-CALDERA quantized-inference framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the reference
project ``genglongling/EE274_ConvexCaldera_LLM_quantization`` (see SURVEY.md):

- ``ops``      — Pallas kernels + XLA reference twins (pack/unpack, fused
                 dequant-matmul + low-rank add, fast Walsh-Hadamard transform).
- ``quant``    — block quantizer family (uniform, NF4/NF2 codebooks, packed
                 int4/int2 with outlier extraction) and SCL classical baselines
                 (scalar uniform, Lloyd-Max, K-means VQ) as jitted fixed-point
                 iterations.
- ``decomp``   — the CALDERA alternating solver (W ~= Q + L @ R) in JAX.
- ``allocate`` — Convex-CALDERA: nuclear-norm + exponential-cone rate-distortion
                 bit allocation with honest duality-gap certificates (first-order
                 solver, no external cone solver needed).
- ``models``   — Llama-family model in JAX with CompressedLinear layers.
- ``calibrate``— Hessian / activation second-moment collection.
- ``parallel`` — device-mesh construction and sharding specs.
- ``serve``    — batched serving engine with paged KV cache.
- ``evalm``    — metrics, perplexity eval, plotting.

Import as::

    import ee274_convexcaldera_llm_quantization_tpu as ccq
"""

__version__ = "0.1.0"

from ee274_convexcaldera_llm_quantization_tpu.quant.quantizers import (  # noqa: F401
    BlockQuantizer,
    QuantizerFactory,
    QuantizedTensor,
)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (  # noqa: F401
    CalderaParams,
    CalderaDecomposition,
    caldera,
)
