"""Latent distributions for the CVAE and the diversity sampler.

Reference surface: the diagonal-Gaussian ``Normal`` with reparameterized
sampling and the 2-distribution KL (model/STTODE.py:79-109, duplicated at
utils/dist.py:5-36), and the relaxed one-hot ``Categorical`` (utils/dist.py:
39-70, defined-but-unused — provided for capability parity).

Pure pytree implementation: a distribution is a NamedTuple of arrays, so it
flows through jit/vmap/scan and can be returned from jitted functions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DiagNormal(NamedTuple):
    """Diagonal Gaussian parameterized by (mu, logvar)."""
    mu: jnp.ndarray
    logvar: jnp.ndarray

    @property
    def sigma(self) -> jnp.ndarray:
        return jnp.exp(0.5 * self.logvar)

    @staticmethod
    def from_params(params: jnp.ndarray) -> "DiagNormal":
        """Split a [..., 2Z] parameter vector into mu / logvar halves."""
        mu, logvar = jnp.split(params, 2, axis=-1)
        return DiagNormal(mu=mu, logvar=logvar)

    @staticmethod
    def standard(shape, dtype=jnp.float32) -> "DiagNormal":
        z = jnp.zeros(shape, dtype)
        return DiagNormal(mu=z, logvar=z)

    def rsample(self, key) -> jnp.ndarray:
        eps = jax.random.normal(key, self.mu.shape, self.mu.dtype)
        return self.mu + eps * self.sigma

    def mode(self) -> jnp.ndarray:
        return self.mu

    def kl(self, p: "DiagNormal | None" = None) -> jnp.ndarray:
        """Elementwise KL(self ‖ p); p=None means standard normal.

        Matches the reference's closed form incl. the 1e-8 sigma guards
        (model/STTODE.py:98-107)."""
        if p is None:
            return -0.5 * (1.0 + self.logvar - jnp.square(self.mu)
                           - jnp.exp(self.logvar))
        t1 = (self.mu - p.mu) / (p.sigma + 1e-8)
        t2 = self.sigma / (p.sigma + 1e-8)
        return 0.5 * (t1 * t1 + t2 * t2) - 0.5 - jnp.log(t2)


class RelaxedOneHot(NamedTuple):
    """Gumbel-softmax relaxed categorical over the last axis
    (reference utils/dist.py:39-70 capability)."""
    logits: jnp.ndarray
    temperature: float = 0.1

    @property
    def probs(self) -> jnp.ndarray:
        return jax.nn.softmax(self.logits, axis=-1)

    def rsample(self, key) -> jnp.ndarray:
        g = jax.random.gumbel(key, self.logits.shape, self.logits.dtype)
        return jax.nn.softmax((self.logits + g) / self.temperature, axis=-1)

    def sample(self, key) -> jnp.ndarray:
        idx = jax.random.categorical(key, self.logits, axis=-1)
        return jax.nn.one_hot(idx, self.logits.shape[-1],
                              dtype=self.logits.dtype)

    def kl(self, p: "RelaxedOneHot | None" = None) -> jnp.ndarray:
        q = self.probs
        logq = jax.nn.log_softmax(self.logits, axis=-1)
        if p is None:
            logp = -jnp.log(jnp.asarray(self.logits.shape[-1], q.dtype))
            return jnp.sum(q * (logq - logp), axis=-1)
        logp = jax.nn.log_softmax(p.logits, axis=-1)
        return jnp.sum(q * (logq - logp), axis=-1)

    def mode(self) -> jnp.ndarray:
        idx = jnp.argmax(self.logits, axis=-1)
        return jax.nn.one_hot(idx, self.logits.shape[-1],
                              dtype=self.logits.dtype)
