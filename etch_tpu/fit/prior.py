"""SMPLify-style GMM pose prior (max-mixture).

Rebuild of reference `src/utils/prior.py:100-230` (MaxMixturePrior): negative
log-likelihood of the body pose under an 8-component Gaussian mixture fitted
to mocap poses, approximated by the best component ("max-mixture").  Loads
the standard gmm_08.pkl when available; `synthetic_gmm` provides a stand-in
for tests.
"""

from __future__ import annotations

import pickle
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class GMMPrior(NamedTuple):
    means: jnp.ndarray        # (C, 69)
    precisions: jnp.ndarray   # (C, 69, 69)
    # log of: weight_c / sqrt((2 pi)^D det(cov_c))
    log_norm: jnp.ndarray     # (C,)

    def __call__(self, pose: jnp.ndarray) -> jnp.ndarray:
        """pose: (B, 69) -> (B,) negative log likelihood (max-mixture)."""
        diff = pose[:, None, :] - self.means[None]             # (B, C, D)
        mah = jnp.einsum("bcd,cde,bce->bc", diff, self.precisions, diff)
        log_comp = self.log_norm[None] - 0.5 * mah             # (B, C)
        return -jnp.max(log_comp, axis=1)


def load_gmm_prior(path: str, dtype=np.float32) -> GMMPrior:
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    means = np.asarray(data["means"], dtype)
    covs = np.asarray(data["covars"], dtype)
    weights = np.asarray(data["weights"], dtype)
    precisions = np.stack([np.linalg.inv(c) for c in covs]).astype(dtype)
    D = means.shape[1]
    _, logdets = np.linalg.slogdet(covs)
    log_norm = np.log(weights) - 0.5 * (D * np.log(2 * np.pi) + logdets)
    return GMMPrior(
        jnp.asarray(means), jnp.asarray(precisions), jnp.asarray(log_norm)
    )


def synthetic_gmm(n_components: int = 8, dim: int = 69, seed: int = 0) -> GMMPrior:
    rng = np.random.RandomState(seed)
    means = rng.randn(n_components, dim).astype(np.float32) * 0.1
    precisions = np.stack(
        [np.eye(dim, dtype=np.float32) * 4.0 for _ in range(n_components)]
    )
    log_norm = np.full((n_components,), -0.5 * dim * np.log(2 * np.pi) +
                       0.5 * dim * np.log(4.0) - np.log(n_components),
                       np.float32)
    return GMMPrior(
        jnp.asarray(means), jnp.asarray(precisions), jnp.asarray(log_norm)
    )
