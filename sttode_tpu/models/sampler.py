"""DLow-style diversity sampler (stage 2) + its losses.

Reference surface: sampler.py:7-76 (Sampler) and samplerloss.py (losses).
The sampler learns an affine flow ``z_k = A_k ⊙ ε + b_k`` over the frozen
CVAE's latent space to spread the best-of-K samples; trained with
KL(sampler ‖ vae prior) + a pairwise-repulsion diversity term.

Frozen-net semantics: the reference optimizes only ``sampler.parameters()``
while gradients flow through the frozen net's graph (trainsampler.py:282).
Here the net's params enter under ``jax.lax.stop_gradient`` — activations stay
differentiable, parameters don't, which is the same gradient.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sttode_tpu.models.sttode import (
    Batch, STTODEConfig, _decode_mp, encode_past, prior,
)
from sttode_tpu.nn import core
from sttode_tpu.utils.distributions import DiagNormal


class SamplerConfig(NamedTuple):
    """Stage-2 hyperparameters (reference trainsampler.py:56-101 defaults and
    the per-dataset diversity table :103-114)."""
    nk: int = 20                    # number of diverse samples
    nz: int = 32                    # latent dim
    qnet_mlp: tuple = (512, 256)
    share_eps: bool = True
    train_w_mean: bool = True
    kld_weight: float = 0.1
    kld_min_clamp: float = 10.0
    div_weight: float = 1.0
    div_scale: float = 1.0


DIVERSITY_CONFIG = {
    # dataset -> (weight, scale); reference trainsampler.py:103-114
    "sdd": (0.5, 0.5),
    "eth": (1.0, 1.0),
    "univ": (10.0, 10.0),
    "nba": (1.0, 1.0),
    "hotel": (3.0, 2.0),
    "zara1": (3.0, 2.0),
    "zara2": (3.0, 2.0),
}


def sampler_init(key, cfg: SamplerConfig, pred_model_dim: int = 64,
                 past_feature_dim: int = 128, dtype=jnp.float32) -> dict:
    """Parameter surface mirrors the reference Sampler (sampler.py:18-27):
    linear(128→64) → tanh-MLP[512,256] (N(0,0.01) init via utils/mlp.py) →
    A/b heads (→nk·nz) → q_c (nk·nz→nz)."""
    ks = jax.random.split(key, 5)
    return {
        "linear": core.dense_init(ks[0], past_feature_dim, pred_model_dim,
                                  dtype=dtype),
        "q_mlp": core.mlp_init_normal001(ks[1], pred_model_dim,
                                         list(cfg.qnet_mlp), dtype=dtype),
        "q_A": core.dense_init(ks[2], cfg.qnet_mlp[-1], cfg.nk * cfg.nz,
                               dtype=dtype),
        "q_b": core.dense_init(ks[3], cfg.qnet_mlp[-1], cfg.nk * cfg.nz,
                               dtype=dtype),
        "q_c": core.dense_init(ks[4], cfg.nk * cfg.nz, cfg.nz, dtype=dtype),
    }


class SamplerOutput(NamedTuple):
    dec_motion: jnp.ndarray      # [M, K, T_f, 2] diverse decode (scene-normed)
    sampler_dist: DiagNormal     # q(z) = N(b, A²)  [M·K, nz]
    vae_dist: DiagNormal         # frozen net's prior, repeated K×
    recon_motion: jnp.ndarray    # [M, T_f, 2] decode from the fused latent


def sampler_forward(sampler_params: dict, net_params: dict,
                    scfg: SamplerConfig, cfg: STTODEConfig, batch: Batch,
                    rng, *, mean: bool | None = None,
                    mesh=None) -> SamplerOutput:
    """Reference Sampler.forward (sampler.py:32-73) as a pure function.

    ``mean=None`` resolves to ``scfg.train_w_mean`` (the reference's default
    deterministic path z=b); ``mean=False`` draws ε per the share_eps policy.
    """
    if mean is None:
        mean = scfg.train_w_mean
    net_params = jax.lax.stop_gradient(net_params)
    k_enc, k_eps, k_dec = jax.random.split(rng, 3)
    M = batch.batch_size * batch.agent_num
    K, Z = scfg.nk, scfg.nz

    past_feature = encode_past(net_params, cfg, batch, rng=k_enc, train=False,
                               mesh=mesh)

    h = core.dense(sampler_params["linear"], past_feature)        # [M, 64]
    h = core.mlp(sampler_params["q_mlp"], h, activation="tanh",
                 activate_final=True)                              # [M, 256]
    A = core.dense(sampler_params["q_A"], h).reshape(M * K, Z)
    b = core.dense(sampler_params["q_b"], h).reshape(M * K, Z)

    if mean:
        z_flow = b
    else:
        if scfg.share_eps:
            eps = jax.random.normal(k_eps, (1, Z), b.dtype)
            eps = jnp.tile(eps, (M * K, 1))
        else:
            eps = jax.random.normal(k_eps, (M, Z), b.dtype)
            eps = jnp.repeat(eps, K, axis=0)
        z_flow = A * eps + b

    sampler_dist = DiagNormal(mu=b, logvar=jnp.log(jnp.square(A) + 1e-8))

    # fused single latent (q_c collapses the K flows) → reconstruction decode.
    # _decode_mp honors cfg.decode_dtype: these decodes ARE differentiable in
    # stage 2 (grads flow through the frozen net's graph into the sampler
    # params, trainsampler.py:282 semantics), so the bf16-storage lever
    # applies here exactly as in the stage-1 step.
    z_fused = core.dense(sampler_params["q_c"], z_flow.reshape(M, K * Z))
    recon_motion, _ = _decode_mp(net_params, cfg, past_feature, z_fused,
                                 batch.past, batch.cur_location, 1)

    # diverse decode from the K flow latents (net.decoder_future_1 semantics)
    past_feature_k = jnp.repeat(past_feature, K, axis=0)
    diverse, _ = _decode_mp(net_params, cfg, past_feature_k, z_flow,
                            batch.past, batch.cur_location, K)
    dec_motion = diverse.reshape(M, K, cfg.future_length, 2)

    vae_dist = prior(net_params, cfg, past_feature_k)
    return SamplerOutput(dec_motion, sampler_dist, vae_dist, recon_motion)


# --------------------------------------------------------------------------- #
# stage-2 losses (reference samplerloss.py)                                   #
# --------------------------------------------------------------------------- #

def sampler_kld(sampler_dist: DiagNormal, vae_dist: DiagNormal,
                agent_num: int, min_clip: float, weight: float,
                valid: jnp.ndarray | None = None):
    """KL(sampler ‖ vae prior) / N, floored then weighted
    (samplerloss.py:4-9; max() reproduces clamp_min_ grads — quirk Q5)."""
    kl = sampler_dist.kl(vae_dist)
    if valid is not None:
        K = kl.shape[0] // valid.shape[0]
        kl = kl * jnp.repeat(valid, K, axis=0)[:, None]
        # normalize by the REAL agent count: the reference's /N
        # (samplerloss.py:4-9) counts real agents (it never pads), so on
        # padded batches a padded denominator would deflate the term and
        # hit the min_clip floor early (zero KL gradient)
        denom = jnp.maximum(jnp.sum(valid), 1.0)
    else:
        denom = agent_num
    loss_uw = jnp.maximum(jnp.sum(kl) / denom, min_clip)
    return weight * loss_uw, loss_uw


def sampler_diversity(dec_motion: jnp.ndarray, agent_num: int, weight: float,
                      scale: float, valid: jnp.ndarray | None = None):
    """Pairwise repulsion exp(-‖Δ‖²/scale) over the K samples of each agent,
    averaged over pairs, summed over agents / N (samplerloss.py:12-20).
    dec_motion: [M, K, T, 2]."""
    M, K = dec_motion.shape[:2]
    flat = dec_motion.reshape(M, K, -1)
    d2 = jnp.sum(jnp.square(flat[:, :, None] - flat[:, None, :]), axis=-1)
    off_diag = 1.0 - jnp.eye(K, dtype=flat.dtype)
    per_agent = jnp.sum(jnp.exp(-d2 / scale) * off_diag, axis=(1, 2)) / (
        K * (K - 1))
    if valid is not None:
        per_agent = per_agent * valid
        denom = jnp.maximum(jnp.sum(valid), 1.0)   # real agents, not padded
    else:
        denom = agent_num
    loss_uw = jnp.sum(per_agent) / denom
    return weight * loss_uw, loss_uw


def sampler_loss(out: SamplerOutput, scfg: SamplerConfig, batch: Batch):
    """Total stage-2 loss = weighted KLD + weighted diversity
    (samplerloss.py:45-74; the recon term ships disabled in the reference's
    totals and is omitted here the same way)."""
    M = batch.batch_size * batch.agent_num
    kld, kld_uw = sampler_kld(out.sampler_dist, out.vae_dist, M,
                              scfg.kld_min_clamp, scfg.kld_weight, batch.valid)
    div, div_uw = sampler_diversity(out.dec_motion, M, scfg.div_weight,
                                    scfg.div_scale, batch.valid)
    total = kld + div
    return total, {"kld": kld_uw, "diverse": div_uw}
