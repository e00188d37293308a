"""ETCH-TPU: a TPU-native JAX/XLA/Pallas rebuild of the ETCH scan-to-body pipeline.

ETCH ("Equivariant Tightness fitting for Clothed Humans") fits a SMPL body to a
3D scan of a clothed human by predicting per-point tightness vectors with an
SE(3)-locally-equivariant point network and fitting SMPL to confidence-weighted
sparse markers with a Levenberg-Marquardt optimizer.

This package is a ground-up TPU-first re-design (reference: boqian-li/ETCH,
PyTorch + CUDA).  Compute runs through jit/pjit with static shapes, dense
(B, N, ...) batching, Pallas kernels for the point-cloud primitives, and a
jitted LM fitter in lax.while_loop instead of Theseus.
"""

__version__ = "0.1.0"

import jax as _jax

# f32 tensors must multiply at f32 precision: the default (bf16-class MXU
# passes) silently costs ~1e-3 relative error, which breaks rotation math,
# distance-based neighbor ordering, and the equivariance contract.  Hot paths
# that can tolerate bf16 opt in explicitly by casting their inputs, which this
# flag does not affect.
_jax.config.update("jax_default_matmul_precision", "float32")

from etch_tpu.utils.config import EtchConfig  # noqa: F401
