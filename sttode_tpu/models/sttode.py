"""STTODE CVAE trajectory forecaster (L4) — TPU-native functional build.

Reference surface: model/STTODE.py (STTODENet :349-623, PastEncoder :178-236,
FutureEncoder :238-300, Decoder :302-347, DecomposeBlock :16-77). The torch
model threads state through module attributes (``set_data`` → ``forward``);
here everything is pure: a ``Batch`` pytree in, params pytree in, loss /
predictions out, RNG keys explicit. Static structure (shapes, sample counts)
lives in ``STTODEConfig`` so jit sees concrete shapes.

Shapes: B scenes × N agents are flattened to M = B·N for all per-agent
tensors; the encoders' interaction attention re-views them as [B, N, 1, D]
and attends per the configured axis:

- ``attn_axis="scene"`` reproduces the reference exactly (quirk Q4: tokens are
  the B scenes for a fixed agent slot — for ETH/SDD's B=1 the softmax is over a
  single token and attention degenerates to a gated value transform).
- ``attn_axis="agent"`` attends over the N agents of each scene with the
  validity mask applied — what the reference's [N,N] mask shape says was
  intended, and the mode padded SPMD batches require.

Sampling: best-of-K decoding is laid out as an explicit sample axis
[M, K, ...] flattened to M·K for the decode matmuls — one big MXU batch, no
python loop over samples.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sttode_tpu.kernels.select_decode import select_decode
from sttode_tpu.nn import core, embed
from sttode_tpu.nn.ode_block import ode_encoder
from sttode_tpu.nn.recurrent import conv1d, conv1d_init, gru, gru_init
from sttode_tpu.nn.transformer import LayerConfig, encoder_stack_init
from sttode_tpu.utils.distributions import DiagNormal


class STTODEConfig(NamedTuple):
    """Static model hyperparameters (reference defaults: train.py:21-52 and the
    hard-coded encoder constants at model/STTODE.py:190-195,249-254)."""
    hidden_dim: int = 64
    zdim: int = 32
    num_heads: int = 8
    ff_dim: int = 1024
    nlayer: int = 1
    ode_time: float = 12.0
    ode_method: str = "euler"
    ode_steps: int = 1
    ode_adjoint: bool = False     # O(1)-memory continuous-adjoint gradients
                                  # through the ODE encoder
    ode_rtol: float = 1e-7        # dopri5 adaptive tolerances (torchdiffeq
    ode_atol: float = 1e-9        # defaults); looser = fewer steps — v5e,
                                  # fp32-pinned RHS (the solver default):
                                  # 11.9 ms/solve device-side at defaults
                                  # (71 steps), proportionally less loosened
                                  # (16 steps at 1e-5/1e-7, 7 at 1e-3/1e-6).
                                  # BENCHMARKS.md dopri5 accounting has the
                                  # story: under ambient bf16 matmuls the
                                  # error estimator noise-floors and the
                                  # controller grinds to 7,762 steps/997 ms.
    ode_scan_budget: int = 0      # >0 runs dopri5 as a lax.scan over exactly
                                  # this many RK45 attempts per interval
                                  # (masked no-ops once converged) instead of
                                  # a while_loop — same control law, directly
                                  # reverse-differentiable (the while form is
                                  # not); pays budget-steps_needed wasted
                                  # attempts for the static trip count.
                                  # Step needs at the flagship RHS: 71
                                  # (default tolerances), 16 (1e-5/1e-7),
                                  # 7 (1e-3/1e-6). 0 = while_loop.
    past_length: int = 8
    future_length: int = 12
    num_decompose: int = 2
    min_clip: float = 2.0
    sample_k: int = 20
    scale_num: int = 4            # 2 + len(hyper_scales); enters feature widths
    learn_prior: bool = False
    compat: str = "reference"     # score orientation + mask handling (Q2/Q3)
    attn_axis: str = "scene"      # "scene" (reference, Q4) | "agent"
    attn_impl: str = "auto"       # attention kernel route: "auto" | "dense" |
                                  # "fused" | "flash" | "packed" (Pallas;
                                  # packed = the head-packed small-shape
                                  # kernel auto picks at model scale) | "ring" |
                                  # "ulysses" (the sequence-parallel
                                  # shard_map paths over the mesh's "data"
                                  # axis — ring rotates K/V shards via
                                  # ppermute, ulysses all-to-alls heads
                                  # against tokens; pass mesh= through
                                  # sttode_forward / make_train_step)
    attn_metric: str = "oblique"  # "oblique" (reference live path) |
                                  # "poincare" (the paper's MHGSA framing:
                                  # ball geodesic distance — the reference
                                  # ships the pmath toolbox but never wires
                                  # it into attention; here it's a config)
    curvature: float = 1.0        # Poincaré ball c (attn_metric="poincare")
    pe_dropout: float = 0.1
    dropout: float = 0.0
    remat: bool = False           # jax.checkpoint the encoder trunks: trade
                                  # recompute for activation memory at large
                                  # batch/bucket sizes
    compute_dtype: str = "float32"  # "bfloat16" casts the decode-MLP matmul
                                    # operands (the step's dominant HBM
                                    # traffic — measured 88% of v5e bandwidth
                                    # at fp32) while accumulating fp32;
                                    # attention Gram/losses stay fp32
    loss_terms: tuple = ("pred", "recover", "kl", "diverse")
                                    # which loss terms enter the total —
                                    # ("pred","recover","kl") is the
                                    # VAE-only objective the reference's
                                    # broken trainvae.py intended; dropping
                                    # "diverse" also skips the K-sample
                                    # decode entirely
    diverse_grad: str = "sparse"    # best-of-K gradient strategy: "sparse"
                                    # selects the winning sample with a
                                    # gradient-free K-decode and recomputes
                                    # only it differentiably (identical
                                    # gradients a.e. — min flows through the
                                    # argmin branch only); "dense" is plain
                                    # autodiff through all K samples
    select_dtype: str = "float32"   # "bfloat16" runs the gradient-free
                                    # best-of-K SELECTION decode wholly in
                                    # bf16 (params + activations cast once at
                                    # entry, bf16 stores throughout — unlike
                                    # compute_dtype's per-matmul operand cast)
                                    # — that decode only picks the argmin
                                    # winner, which is then recomputed in
                                    # fp32, so loss numerics are fp32 and
                                    # only near-tie winner choices can move.
                                    # Requires diverse_grad="sparse".
    select_impl: str = "xla"        # "fused" runs the gradient-free best-of-K
                                    # SELECTION decode as ONE Pallas kernel
                                    # (kernels/select_decode.py): the whole
                                    # per-row chain (both decompose blocks'
                                    # MLPs + conv + GRU + the K-distance)
                                    # stays VMEM-resident, the K-repeat is
                                    # realized by grid index maps instead of
                                    # HBM, and only one fp32 scalar per row
                                    # leaves the chip — vs XLA's per-matmul
                                    # [R,512]-class intermediates. Measured
                                    # win region: M·K ≥ ~10⁵ rows (B=512:
                                    # ×1.04; loses ×0.87-0.95 below —
                                    # BENCHMARKS.md round-3 notes). "auto"
                                    # routes by that threshold on TPU.
                                    # Computes at select_dtype numerics.
                                    # Requires diverse_grad="sparse" and
                                    # num_decompose=2 ("auto" falls back to
                                    # xla otherwise). diverse_pred is
                                    # returned as zeros under "fused" (the
                                    # trajectories never leave the kernel).
    decode_dtype: str = "float32"   # "bfloat16" runs the DIFFERENTIABLE
                                    # decompose decode(s) — the posterior
                                    # reconstruction + best-of-K winner
                                    # recompute (or the dense K-decode under
                                    # diverse_grad="dense") — with bf16
                                    # STORAGE: decoder params cast once at
                                    # entry (differentiably — fp32 master
                                    # weights stay in the optimizer, grads
                                    # return fp32 through the cast's VJP),
                                    # every activation and AD residual stored
                                    # bf16, outputs cast back to fp32 before
                                    # the loss reductions. This is the
                                    # storage-level mixed precision round 2's
                                    # compute_dtype operand cast was not (that
                                    # per-matmul cast broke XLA fusion and
                                    # washed out); it halves the HBM bytes of
                                    # the step's differentiable decode half.
                                    # Encoders, attention, losses, optimizer
                                    # state all stay fp32.

    @property
    def layer_cfg(self) -> LayerConfig:
        return LayerConfig(d_model=self.hidden_dim, num_heads=self.num_heads,
                           ff_dim=self.ff_dim, dropout=self.dropout,
                           compat=self.compat, attn_impl=self.attn_impl,
                           attn_metric=self.attn_metric,
                           curvature=self.curvature)

    def validate(self) -> "STTODEConfig":
        """Fail fast on inconsistent hyperparameters."""
        assert self.hidden_dim % self.num_heads == 0, \
            f"hidden_dim {self.hidden_dim} must divide num_heads {self.num_heads}"
        assert self.compat in ("reference", "tpu"), self.compat
        assert self.attn_axis in ("scene", "agent"), self.attn_axis
        assert not (self.attn_axis == "agent" and self.compat == "reference"), \
            "attn_axis='agent' requires compat='tpu' (see _encode_trunk)"
        assert self.ode_method in ("euler", "midpoint", "rk4", "dopri5"), \
            self.ode_method
        assert self.attn_impl in ("auto", "dense", "fused", "flash", "packed",
                                  "ring", "ulysses"), self.attn_impl
        assert self.compute_dtype in ("float32", "bfloat16"), \
            self.compute_dtype
        assert self.attn_metric in ("oblique", "poincare"), self.attn_metric
        # every attn_impl serves both metrics (oblique -acos and the
        # poincare Möbius distance via the Gram closed form)
        assert self.curvature > 0.0, self.curvature
        assert self.ode_steps >= 1 and self.sample_k >= 1
        assert self.diverse_grad in ("sparse", "dense"), self.diverse_grad
        assert self.select_dtype in ("float32", "bfloat16"), self.select_dtype
        assert not (self.select_dtype == "bfloat16"
                    and self.diverse_grad != "sparse"), \
            "select_dtype='bfloat16' requires diverse_grad='sparse' (the " \
            "dense path differentiates through the K-decode, which must " \
            "stay fp32)"
        assert self.select_impl in ("xla", "fused", "auto"), self.select_impl
        assert self.decode_dtype in ("float32", "bfloat16"), self.decode_dtype
        assert not (self.select_impl == "fused"
                    and (self.diverse_grad != "sparse"
                         or self.num_decompose != 2)), \
            "select_impl='fused' requires diverse_grad='sparse' (the kernel " \
            "is forward-only) and num_decompose=2 (the kernel's unrolled " \
            "block structure); 'auto' falls back to xla instead"
        allowed = {"pred", "recover", "kl", "diverse"}
        assert self.loss_terms and set(self.loss_terms) <= allowed, \
            f"loss_terms must be a non-empty subset of {allowed}"
        return self


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["past", "past_vel", "future", "future_vel",
                                "valid"],
                   meta_fields=["batch_size", "agent_num"])
@dataclasses.dataclass(frozen=True)
class Batch:
    """Scene batch, already normalized/augmented by the data layer
    (``sttode_tpu.data.preprocess``). All per-agent tensors are [M, T, 2]
    with M = batch_size·agent_num.

    ``valid`` marks real (non-padded) agents; all-ones reproduces the
    reference's unpadded batches.

    ``batch_size``/``agent_num`` are pytree *metadata* (static under jit) —
    shapes stay concrete inside compiled steps."""
    past: jnp.ndarray          # [M, T_p, 2] scene-normalized positions
    past_vel: jnp.ndarray      # [M, T_p, 2]
    future: jnp.ndarray        # [M, T_f, 2]
    future_vel: jnp.ndarray    # [M, T_f, 2]
    valid: jnp.ndarray         # [M] float 1/0
    batch_size: int            # static B
    agent_num: int             # static N

    @property
    def inputs(self) -> jnp.ndarray:
        return jnp.concatenate([self.past, self.past_vel], axis=-1)

    @property
    def inputs_for_posterior(self) -> jnp.ndarray:
        return jnp.concatenate([self.future, self.future_vel], axis=-1)

    @property
    def cur_location(self) -> jnp.ndarray:
        return self.past[:, -1:]


# --------------------------------------------------------------------------- #
# init                                                                        #
# --------------------------------------------------------------------------- #

def _trunk_init(key, cfg: STTODEConfig, seq_len: int, dtype):
    """Shared encoder trunk: input_fc → PE → input_fc2 → (+category) input_fc3
    → ODE-integrated interaction encoder (reference PastEncoder/FutureEncoder
    share this structure)."""
    D = cfg.hidden_dim
    ks = jax.random.split(key, 5)
    return {
        "input_fc": core.dense_init(ks[0], 4, D, dtype=dtype),
        "pe": embed.positional_agent_encoding_init(ks[1], D, dtype=dtype),
        "input_fc2": core.dense_init(ks[2], D * seq_len, D, dtype=dtype),
        "input_fc3": core.dense_init(ks[3], D + 3, D, dtype=dtype),
        "ode_layers": encoder_stack_init(ks[4], cfg.layer_cfg, cfg.nlayer,
                                         dtype=dtype),
    }


def _decompose_init(key, cfg: STTODEConfig, dtype):
    """One DecomposeBlock (reference model/STTODE.py:16-77): Conv1d(2→32,k3)
    + GRU(32→96) over the past residual, MLP[512,256] heads for future/past."""
    D = cfg.hidden_dim
    gru_hidden = 96
    feat_dim = 2 * D + cfg.zdim + gru_hidden
    ks = jax.random.split(key, 4)
    return {
        "conv_past": conv1d_init(ks[0], 2, 32, 3, dtype=dtype),
        "gru": gru_init(ks[1], 32, gru_hidden, dtype=dtype),
        "decoder_y": core.mlp_init(ks[2], feat_dim, [512, 256],
                                   cfg.future_length * 2, dtype=dtype),
        "decoder_x": core.mlp_init(ks[3], feat_dim, [512, 256],
                                   cfg.past_length * 2, dtype=dtype),
    }


def sttode_init(key, cfg: STTODEConfig, dtype=jnp.float32) -> dict:
    D = cfg.hidden_dim
    ks = jax.random.split(key, 6)
    fut_extra_in = cfg.scale_num * D  # cat(past_feature[2D], future_feature[2D])
    params = {
        "past_encoder": _trunk_init(ks[0], cfg, cfg.past_length, dtype),
        "future_encoder": _trunk_init(ks[1], cfg, cfg.future_length, dtype),
        # posterior head: MLP2(relu, N(0,0.01) init) + qz linear (same init) —
        # reference model/STTODE.py:258-261
        "out_mlp": core.mlp_init_normal001(ks[2], fut_extra_in, [128], dtype=dtype),
        "qz_layer": {"w": core.normal_001(ks[3], 128, 2 * cfg.zdim, dtype=dtype),
                     "b": jnp.zeros((2 * cfg.zdim,), dtype)},
        "decoder": [_decompose_init(k, cfg, dtype)
                    for k in jax.random.split(ks[4], cfg.num_decompose)],
    }
    if cfg.learn_prior:
        # reference pz_layer expects scale_num·D input (quirk Q8: dead unless
        # learn_prior; we wire it to the real 2D past-feature width instead of
        # reproducing the latent shape bug).
        params["pz_layer"] = {
            "w": core.normal_001(ks[5], 2 * D, 2 * cfg.zdim, dtype=dtype),
            "b": jnp.zeros((2 * cfg.zdim,), dtype)}
    return params


# --------------------------------------------------------------------------- #
# encoders                                                                    #
# --------------------------------------------------------------------------- #

def _add_category(x: jnp.ndarray) -> jnp.ndarray:
    """Append a 3-dim one-hot category marking only the last agent slot (the
    NBA ball) — reference add_category, model/STTODE.py:199-210, whose first
    two indexing statements are no-ops."""
    B, N, _ = x.shape
    category = jnp.zeros((N, 3), x.dtype).at[N - 1, 2].set(1.0)
    category = jnp.broadcast_to(category, (B, N, 3))
    return jnp.concatenate([x, category], axis=-1)


def _agent_attn_mask(valid: jnp.ndarray, B: int, N: int) -> jnp.ndarray:
    """Additive [B, N, N] mask from per-agent validity for attn_axis='agent'."""
    v = valid.reshape(B, N)
    neg = jnp.asarray(jnp.finfo(v.dtype).min, v.dtype)
    return jnp.where(v[:, None, :] > 0, 0.0, neg)


def _encode_trunk(p: dict, cfg: STTODEConfig, inputs: jnp.ndarray,
                  B: int, N: int, valid: jnp.ndarray, *, rng, train: bool,
                  mesh=None):
    """Shared trunk → [M, 2D] concat(skip, interaction) feature
    (reference PastEncoder.forward, model/STTODE.py:214-236)."""
    D = cfg.hidden_dim
    T = inputs.shape[1]
    k_pe, k_ode = jax.random.split(rng)

    x = core.dense(p["input_fc"], inputs)                     # [M, T, D]
    x = embed.positional_agent_encoding(
        p["pe"], x, rng=k_pe, dropout_rate=cfg.pe_dropout,
        deterministic=not train)
    x = x.reshape(B, N, T * D)
    x = core.dense(p["input_fc2"], x)                          # [B, N, D]
    x = core.dense(p["input_fc3"], _add_category(x))           # [B, N, D]

    if cfg.attn_axis == "agent" and cfg.compat == "reference":
        raise ValueError(
            "attn_axis='agent' requires compat='tpu': reference compat drops "
            "attention masks (quirk Q2) and uses the transposed score "
            "orientation (Q3), under which the agent validity mask is "
            "ill-defined — padded agents would silently leak into attention")
    kv_valid = None
    if cfg.attn_axis == "scene":
        tokens = x[:, :, None, :]                              # [L=B, N, 1, D]
        mask = None
    else:
        tokens = jnp.transpose(x, (1, 0, 2))[:, :, None, :]    # [L=N, B, 1, D]
        if cfg.attn_impl in ("ring", "ulysses"):
            # the sequence-parallel paths consume per-key validity directly
            # (their only mask form); the agent-axis additive mask is exactly
            # that, so no expressiveness is lost
            mask = None
            kv_valid = valid.reshape(B, N)                     # [B, N]
        else:
            mask = _agent_attn_mask(valid, B, N)               # [B, N, N]

    z = ode_encoder(p["ode_layers"], tokens, cfg.layer_cfg, time=cfg.ode_time,
                    method=cfg.ode_method, steps=cfg.ode_steps, mask=mask,
                    adjoint=cfg.ode_adjoint, rtol=cfg.ode_rtol,
                    atol=cfg.ode_atol, rng=k_ode,
                    scan_budget=cfg.ode_scan_budget or None,
                    deterministic=not train, mesh=mesh, kv_valid=kv_valid)
    if cfg.attn_axis == "scene":
        z = z[:, :, 0]                                         # [B, N, D]
    else:
        z = jnp.transpose(z[:, :, 0], (1, 0, 2))               # [B, N, D]

    feat = jnp.concatenate([x, z], axis=-1)                    # [B, N, 2D]
    return feat.reshape(B * N, 2 * D)


def encode_past(params: dict, cfg: STTODEConfig, batch: Batch, *, rng,
                train: bool, mesh=None) -> jnp.ndarray:
    """past_feature [M, 2D] (reference encode_history, model/STTODE.py:488-496).

    With ``cfg.remat`` the trunk is wrapped in ``jax.checkpoint`` so the
    backward pass recomputes trunk activations instead of storing them —
    memory for FLOPs at large batch/bucket sizes."""
    def trunk(p, inputs, valid):
        return _encode_trunk(p, cfg, inputs, batch.batch_size,
                             batch.agent_num, valid, rng=rng, train=train,
                             mesh=mesh)

    if cfg.remat:
        trunk = jax.checkpoint(trunk)
    return trunk(params["past_encoder"], batch.inputs, batch.valid)


def encode_future(params: dict, cfg: STTODEConfig, batch: Batch,
                  past_feature: jnp.ndarray, *, rng, train: bool,
                  mesh=None) -> DiagNormal:
    """Posterior q(z|x,y) params (reference FutureEncoder.forward,
    model/STTODE.py:276-301)."""
    def trunk(p, inputs, valid):
        return _encode_trunk(p, cfg, inputs, batch.batch_size,
                             batch.agent_num, valid, rng=rng, train=train,
                             mesh=mesh)

    if cfg.remat:
        # same remat policy as encode_past: without this the future trunk
        # (the LARGER of the two — future_length > past_length) stored all
        # its activations and roughly half the documented memory saving
        # never materialized
        trunk = jax.checkpoint(trunk)
    fut_feat = trunk(params["future_encoder"],
                     batch.inputs_for_posterior, batch.valid)
    h = jnp.concatenate([past_feature, fut_feat], axis=-1)
    h = core.mlp(params["out_mlp"], h, activation="relu", activate_final=True)
    qz_params = core.dense(params["qz_layer"], h)
    return DiagNormal.from_params(qz_params)


def prior(params: dict, cfg: STTODEConfig,
          past_feature: jnp.ndarray) -> DiagNormal:
    """p(z): N(0, I) unless learn_prior (reference fu_encoder,
    model/STTODE.py:512-525)."""
    if cfg.learn_prior:
        return DiagNormal.from_params(core.dense(params["pz_layer"],
                                                 past_feature))
    M = past_feature.shape[0]
    return DiagNormal.standard((M, cfg.zdim), past_feature.dtype)


# --------------------------------------------------------------------------- #
# decoder                                                                     #
# --------------------------------------------------------------------------- #

# Above this many decode rows the gradient-free decodes (best-of-K selection,
# inference) stop hoisting the GRU input projection: the hoisted gi_all
# [R, T, 3H] is a full HBM round trip (3H=288 vs the 32-wide conv input it
# replaces), which beats dispatch-latency savings once R is large. Step-level
# A/B measured the unhoisted form winning at EVERY tested selection size
# (R=7040-112640: ×1.04-1.11 bf16, ×1.19 fp32 at R=28160 — BENCHMARKS.md
# round-3 notes); the threshold keeps tiny eval batches (ETH per-scene
# R≈120) on the latency-friendly hoisted form. The differentiable decodes
# always hoist (round-2 measurement, small rows).
SELECT_GRU_HOIST_MAX_ROWS = 4096

# lax.scan unroll factor for the decode GRU scans (True = full unroll).
# The recurrence is serial either way; this only trades XLA while-loop
# machinery for code size. Measured a wash-to-loss on v5e at every
# train-step batch size (unroll speedup ×0.905/×0.973/×0.983 at
# B=32/128/512 — scripts/gru_unroll_ab.py), so the loop form stays.
GRU_UNROLL: int | bool = 1

# select_impl="auto" routes the selection decode to the fused Pallas kernel
# at and above this many rows. Round-4 four-point step-level A/B (bf16
# selection, 5 alternating rounds, medians — BENCHMARKS.md round-4 notes):
# R=14,080 ×0.907, R=28,160 ×0.930, R=56,320 ×0.957, R=112,640 ×1.038 —
# monotone in R, crossover between 56k and 113k; the threshold sits just
# under the measured win point. Tile sweeps and isolated micros cannot
# tighten it further (session drift up to 2.2× on the isolated XLA
# subgraph; the interleaved step A/B is the decision-grade measurement).
# The same threshold routes the INFERENCE decode to the kernel's traj mode,
# where the win is larger (×2.72 at R=112,640: the XLA inference decode
# materializes its [R, 512]-class intermediates with no bf16/unhoist
# mitigations).
SELECT_FUSED_MIN_ROWS = 100_000


# test hook: lets the CPU suite exercise the inference kernel route, which
# is otherwise TPU-gated (interpret-mode Pallas is far too slow to select
# silently for a served model whose checkpointed config says "fused")
_ALLOW_FUSED_INFERENCE_INTERPRET = False


def _select_routing(cfg: STTODEConfig, M: int, K: int, mesh):
    """Shared train/inference routing state: (dp, per-device rows,
    resolved select_impl, GRU hoist flag). Both thresholds reason about
    PER-DEVICE row counts — under data parallelism each device decodes
    M/dp scenes."""
    dp = mesh.shape.get("data", 1) if mesh is not None else 1
    rows = (M // dp) * K
    impl = cfg.select_impl
    if impl == "auto":
        impl = "fused" if (cfg.num_decompose == 2
                           and rows >= SELECT_FUSED_MIN_ROWS
                           and jax.default_backend() == "tpu") else "xla"
    hoist = rows <= SELECT_GRU_HOIST_MAX_ROWS
    return dp, rows, impl, hoist


def _fused_select_call(params, past_feature, z, state0, past_traj,
                       target_rel_flat, *, mode, dtype, mesh, dp):
    """Call the fused selection kernel, shard_mapped over "data" under a
    mesh (a bare pallas_call is not SPMD-partitionable). ``z`` arrives in
    the sampler's [M·K, Z] layout and is re-laid k-major for the kernel's
    (m, k) grid; per-scene operands pass UNREPEATED."""
    M = past_feature.shape[0]
    K = z.shape[0] // M
    z_km = jnp.transpose(z.reshape(M, K, -1), (1, 0, 2))
    kernel = functools.partial(select_decode, mode=mode, dtype=dtype,
                               interpret=jax.default_backend() != "tpu")
    if dp > 1:
        from jax.sharding import PartitionSpec as _P
        kernel = jax.shard_map(
            kernel, mesh=mesh,
            in_specs=(_P(), _P("data", None), _P(None, "data", None),
                      _P("data", None), _P("data", None), _P("data", None)),
            out_specs=_P("data", None) if mode == "dist"
            else _P(None, "data", None),
            # pallas_call's out_shape carries no varying-mesh-axes type, so
            # the vma checker cannot see through it
            check_vma=False)
    return kernel(params, past_feature, z_km, state0,
                  past_traj.reshape(M, -1), target_rel_flat)

def _bf16_tree(t):
    """Cast every floating leaf to bfloat16 (ints/bools pass through). The
    cast is differentiable: under AD its VJP casts cotangents back to fp32,
    so fp32 master params receive fp32 gradients — the standard
    master-weight mixed-precision contract."""
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)


def decode_block0_state(params: dict, past_traj: jnp.ndarray) -> jnp.ndarray:
    """Decompose block 1's conv+GRU state [M, 96]. Block 1 always sees
    residual = x_true − 0 = past_traj, independent of z and the sample
    count — so ONE scan serves every decode of the step (posterior recon,
    gradient-free best-of-K, winner recompute): pass the result to
    ``decode(block0_state=...)``. Bitwise-identical to the in-decode
    computation."""
    block = params["decoder"][0]
    h = jax.nn.relu(conv1d(block["conv_past"], past_traj, padding=1))
    _, state_m = gru(block["gru"], h, unroll=GRU_UNROLL)       # [M, 96]
    return state_m


def decode(params: dict, cfg: STTODEConfig, past_feature: jnp.ndarray,
           z: jnp.ndarray, past_traj: jnp.ndarray, cur_location: jnp.ndarray,
           sample_num: int, block0_state: jnp.ndarray | None = None,
           gru_hoist: bool = True):
    """Iterative decompose decoder (reference Decoder.forward,
    model/STTODE.py:320-347).

    past_feature: [M·s, 2D] (pre-repeated), z: [M·s, zdim],
    past_traj: [M, T_p, 2], cur_location: [M, 1, 2];
    ``block0_state`` optionally shares block 1's [M, 96] GRU state across
    decodes (see ``decode_block0_state``).
    Returns (out_seq [M·s, T_f, 2] absolute, reconstruction [M·s, T_p, 2]).
    """
    s = sample_num
    x_true = jnp.repeat(past_traj, s, axis=0)                  # [M·s, T_p, 2]
    hidden = jnp.concatenate([past_feature, z], axis=-1)       # [M·s, 2D+Z]

    x_hat = jnp.zeros_like(x_true)
    prediction = jnp.zeros((x_true.shape[0], cfg.future_length, 2),
                           x_true.dtype)
    reconstruction = jnp.zeros((x_true.shape[0], cfg.past_length, 2),
                               x_true.dtype)
    cd = None if cfg.compute_dtype == "float32" else \
        jnp.dtype(cfg.compute_dtype)
    # num_decompose=2 distinct blocks — unrolled (each has its own params);
    # block i+1 refines the residual x_true - x_hat_i.
    for i, block in enumerate(params["decoder"]):
        if i == 0 and block0_state is not None:
            state = jnp.repeat(block0_state, s, axis=0) if s > 1 \
                else block0_state
        elif i == 0 and s > 1:
            # Block 1 sees residual = x_true - 0, identical across the s
            # samples: run its conv+GRU once on the M unrepeated rows and
            # repeat the final state — K× less sequential scan work in the
            # best-of-K decode, bitwise-identical output.
            state = jnp.repeat(decode_block0_state(params, past_traj),
                               s, axis=0)                      # [M·s, 96]
        else:
            residual = x_true - x_hat                          # [M·s, T_p, 2]
            h = jax.nn.relu(conv1d(block["conv_past"], residual, padding=1))
            _, state = gru(block["gru"], h, hoist=gru_hoist,
                           unroll=GRU_UNROLL)                  # [M·s, 96]
        feat = jnp.concatenate([hidden, state], axis=-1)
        x_hat = core.mlp(block["decoder_x"], feat,
                         compute_dtype=cd).reshape(-1, cfg.past_length, 2)
        y_hat = core.mlp(block["decoder_y"], feat,
                         compute_dtype=cd).reshape(-1, cfg.future_length, 2)
        prediction = prediction + y_hat
        reconstruction = reconstruction + x_hat

    out_seq = prediction + jnp.repeat(cur_location, s, axis=0)
    return out_seq, reconstruction


def _decode_mp(params: dict, cfg: STTODEConfig, past_feature, z, past_traj,
               cur_location, sample_num: int, *, block0_state=None,
               gru_hoist: bool = True):
    """``decode`` at ``cfg.decode_dtype`` storage. Under "bfloat16" every
    operand (decoder params included) is cast ONCE at entry — the casts are
    differentiable, so fp32 master weights receive fp32 grads through the
    cast VJP while all decode activations/AD-residuals store bf16 — and the
    outputs return fp32 so loss reductions keep fp32 numerics. Accelerates
    the reference decode at model/STTODE.py:302-347."""
    if cfg.decode_dtype != "bfloat16":
        return decode(params, cfg, past_feature, z, past_traj, cur_location,
                      sample_num, block0_state=block0_state,
                      gru_hoist=gru_hoist)
    b0 = None if block0_state is None else _bf16_tree(block0_state)
    out, rec = decode({"decoder": _bf16_tree(params["decoder"])}, cfg,
                      _bf16_tree(past_feature), _bf16_tree(z),
                      _bf16_tree(past_traj), _bf16_tree(cur_location),
                      sample_num, block0_state=b0, gru_hoist=gru_hoist)
    return out.astype(jnp.float32), rec.astype(jnp.float32)


# --------------------------------------------------------------------------- #
# losses (reference model/STTODE.py:372-395)                                  #
# --------------------------------------------------------------------------- #

def loss_pred(pred, target, batch_size, valid=None):
    """ΣSE / B / T — the reference's normalization (÷batch÷horizon, NOT ÷agents).
    ``valid`` masks padded agents so padded batches match unpadded numerics."""
    se = jnp.square(target - pred)
    if valid is not None:
        se = se * valid[:, None, None]
    return jnp.sum(se) / batch_size / pred.shape[1]


def _masked_mean(per_agent, valid):
    """Mean of a per-agent [M] quantity over the REAL agents: padded batches
    match unpadded numerics (the reference never pads, so its divisions by
    B·N always count real agents)."""
    if valid is not None:
        return jnp.sum(per_agent * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.mean(per_agent)


def loss_kl(qz: DiagNormal, pz: DiagNormal, batch_size, agent_num, min_clip,
            valid=None):
    """Σ KL / (real agent count), floored at min_clip. The floor uses max(),
    reproducing the gradient semantics of the reference's in-place clamp_min_
    (quirk Q5): zero gradient when the unclamped loss is below the floor.
    The reference's B·N denominator (model/STTODE.py:378-382) counts real
    agents (it never pads); on padded batches the denominator is Σvalid so
    the term is not deflated by bucket padding."""
    kl = jnp.sum(qz.kl(pz), axis=-1)                           # [M]
    if valid is not None:
        return jnp.maximum(_masked_mean(kl, valid), min_clip)
    loss = jnp.sum(kl) / (batch_size * agent_num)
    return jnp.maximum(loss, min_clip)


def loss_diverse(pred_k, target, valid=None):
    """Best-of-K: min over samples of ΣSE, averaged over agents.
    pred_k: [M, K, T, 2], target: [M, T, 2]."""
    diff = target[:, None] - pred_k
    dist = jnp.sum(jnp.square(diff), axis=(-1, -2))            # [M, K]
    best = jnp.min(dist, axis=1)                               # [M]
    return _masked_mean(best, valid)


# --------------------------------------------------------------------------- #
# training forward & inference                                                #
# --------------------------------------------------------------------------- #

class ForwardOutput(NamedTuple):
    total_loss: jnp.ndarray
    loss_pred: jnp.ndarray
    loss_recover: jnp.ndarray
    loss_kl: jnp.ndarray
    loss_diverse: jnp.ndarray
    qz: DiagNormal
    pz: DiagNormal
    past_feature: jnp.ndarray
    pred_traj: jnp.ndarray      # [M, T_f, 2] posterior reconstruction decode
    diverse_pred: jnp.ndarray   # [M, K, T_f, 2] prior samples (values only —
                                # carries stop_gradient under
                                # cfg.diverse_grad="sparse"). Under
                                # select_impl="fused" (or "auto" routed to
                                # the Pallas kernel) the K trajectories never
                                # leave the kernel — only their [M, K]
                                # distances do — so this field is filled with
                                # NaN to make accidental consumption loud;
                                # use select_impl="xla" when the trajectories
                                # themselves are needed. All-zeros when
                                # "diverse" is not in cfg.loss_terms (no
                                # K-decode runs at all).


def sttode_forward(params: dict, cfg: STTODEConfig, batch: Batch, rng, *,
                   train: bool = True, mesh=None) -> ForwardOutput:
    """Full CVAE training step forward (reference STTODENet.forward,
    model/STTODE.py:553-568): posterior decode + KL + best-of-K diverse loss.

    ``mesh`` is consumed by ``attn_impl="ring"``/``"ulysses"`` (sequence-
    parallel attention) and by the fused/auto selection decode (shard_map
    over "data" + per-device routing thresholds); other routes ignore it —
    under data parallelism, pass it even when attention is dense."""
    k_enc, k_fenc, k_q, k_p = jax.random.split(rng, 4)
    B, N = batch.batch_size, batch.agent_num
    M = B * N
    K = cfg.sample_k
    valid = batch.valid

    past_feature = encode_past(params, cfg, batch, rng=k_enc, train=train,
                               mesh=mesh)
    qz = encode_future(params, cfg, batch, past_feature, rng=k_fenc,
                       train=train, mesh=mesh)
    pz = prior(params, cfg, past_feature)
    qz_sample = qz.rsample(k_q)

    # decompose block 1's GRU state depends only on past_traj: one scan
    # serves every decode below (posterior, grad-free K, winner recompute)
    state0 = decode_block0_state(params, batch.past)

    if cfg.diverse_grad == "sparse" and K > 1 and "diverse" in cfg.loss_terms:
        # defer the posterior decode: it batches with the winner recompute
        # into ONE decode (one block-2 GRU scan instead of two)
        pred_traj = recover_traj = None
    else:
        pred_traj, recover_traj = _decode_mp(params, cfg, past_feature,
                                             qz_sample, batch.past,
                                             batch.cur_location, 1,
                                             block0_state=state0)
    l_kl = loss_kl(qz, pz, B, N, cfg.min_clip, valid)

    if "diverse" not in cfg.loss_terms:
        l_pred = loss_pred(pred_traj, batch.future, B, valid)
        l_recover = loss_pred(recover_traj, batch.past, B, valid)
        # VAE-only objective (the reference trainvae.py intent): no K-sample
        # decode at all — the dominant FLOPs of the step vanish with it
        zeros_k = jnp.zeros((M, K, cfg.future_length, 2), pred_traj.dtype)
        total = sum({"pred": l_pred, "recover": l_recover,
                     "kl": l_kl}[name] for name in cfg.loss_terms)
        return ForwardOutput(total, l_pred, l_recover, l_kl,
                             jnp.zeros((), pred_traj.dtype), qz, pz,
                             past_feature, pred_traj, zeros_k)

    # best-of-K diverse decode from the (repeated) prior
    past_feature_k = jnp.repeat(past_feature, K, axis=0)
    pz_k = prior(params, cfg, past_feature_k)
    pz_sample = pz_k.rsample(k_p)
    if cfg.diverse_grad == "sparse" and K > 1:
        # d(min over K)/dθ flows only through the argmin sample, so a full
        # K-sample backward is pure waste (measured: the K=20 decode was 88%
        # of step FLOPs / 60% of HBM traffic). Select the winner with a
        # gradient-free decode — argmin's integer output carries no
        # cotangent, so AD stores no residuals for it — then recompute ONLY
        # the winning sample differentiably. Loss value and gradients are
        # identical a.e. (ties are measure-zero in continuous data); the
        # "dense" mode keeps plain autodiff through all K for exact-tie
        # gradient-splitting semantics.
        sg = jax.lax.stop_gradient
        dp, _, sel_impl, sel_hoist = _select_routing(cfg, M, K, mesh)
        if sel_impl == "fused":
            # one Pallas kernel for the whole K-decode + distance: only an
            # [M, K] fp32 matrix leaves the chip (kernels/select_decode.py).
            # Per-scene operands pass UNREPEATED — the kernel's (m, k) grid
            # index maps realize the K-repeat for free, so none of the
            # repeated operands ever materializes in HBM. Interpret mode
            # keeps CPU meshes/tests working.
            sel_dt = jnp.bfloat16 if cfg.select_dtype == "bfloat16" \
                else jnp.float32
            dist = _fused_select_call(
                sg(params), sg(past_feature), sg(pz_sample), sg(state0),
                batch.past,
                (batch.future - batch.cur_location).reshape(M, -1),
                mode="dist", dtype=sel_dt, mesh=mesh, dp=dp)       # [M, K]
            # trajectories never leave the kernel: NaN-fill so a consumer
            # reading diverse_pred fails loudly (see ForwardOutput docstring)
            diverse = jnp.full((M, K, cfg.future_length, 2), jnp.nan,
                               batch.future.dtype)
        elif cfg.select_dtype == "bfloat16":
            # the K-decode below exists ONLY to pick the argmin winner (its
            # values feed dist → argmin; the winner is recomputed in fp32),
            # so run it wholly in bf16: params + inputs cast ONCE here, every
            # intermediate stored bf16 — half the HBM bytes of the step's
            # dominant component (measured 58-69% of step time at B≥128).
            # Selection flips only where two samples' squared errors land
            # within bf16 resolution of each other.
            _cast = _bf16_tree
            diverse, _ = decode({"decoder": _cast(sg(params["decoder"]))},
                                cfg, _cast(sg(past_feature_k)),
                                _cast(sg(pz_sample)), _cast(batch.past),
                                _cast(batch.cur_location), K,
                                block0_state=_cast(sg(state0)),
                                gru_hoist=sel_hoist)
            diverse = diverse.astype(batch.future.dtype)
        else:
            diverse, _ = decode(sg(params), cfg, sg(past_feature_k),
                                sg(pz_sample), batch.past,
                                batch.cur_location, K,
                                block0_state=sg(state0),
                                gru_hoist=sel_hoist)
        if sel_impl != "fused":
            diverse = diverse.reshape(M, K, cfg.future_length, 2)
            dist = jnp.sum(jnp.square(batch.future[:, None] - diverse),
                           axis=(-1, -2))                      # [M, K]
        best = jnp.argmin(dist, axis=1)                        # [M]
        # gather the winning latents from the NON-stopped sample array so a
        # learned prior still receives gradients through its chosen draws
        z_best = jnp.take_along_axis(pz_sample.reshape(M, K, -1),
                                     best[:, None, None], axis=1)[:, 0]
        # ONE differentiable decode for (posterior, winner): the two z's
        # interleave as a sample axis of 2 — row-wise ops keep each sample's
        # numerics identical to separate decodes
        pf2 = jnp.repeat(past_feature, 2, axis=0)
        z2 = jnp.stack([qz_sample, z_best], axis=1).reshape(2 * M, -1)
        out2, rec2 = _decode_mp(params, cfg, pf2, z2, batch.past,
                                batch.cur_location, 2, block0_state=state0)
        out2 = out2.reshape(M, 2, cfg.future_length, 2)
        pred_traj = out2[:, 0]
        best_pred = out2[:, 1]
        recover_traj = rec2.reshape(M, 2, cfg.past_length, 2)[:, 0]
        best_se = jnp.sum(jnp.square(batch.future - best_pred), axis=(-1, -2))
        l_div = _masked_mean(best_se, valid)
    else:
        diverse, _ = _decode_mp(params, cfg, past_feature_k, pz_sample,
                                batch.past, batch.cur_location, K,
                                block0_state=state0)
        diverse = diverse.reshape(M, K, cfg.future_length, 2)
        l_div = loss_diverse(diverse, batch.future, valid)

    l_pred = loss_pred(pred_traj, batch.future, B, valid)
    l_recover = loss_pred(recover_traj, batch.past, B, valid)

    terms = {"pred": l_pred, "recover": l_recover, "kl": l_kl,
             "diverse": l_div}
    total = sum(terms[name] for name in cfg.loss_terms)
    return ForwardOutput(total, l_pred, l_recover, l_kl, l_div, qz, pz,
                         past_feature, pred_traj, diverse)


def sttode_inference(params: dict, cfg: STTODEConfig, batch: Batch, rng, *,
                     sample_k: int | None = None, mesh=None) -> jnp.ndarray:
    """Best-of-K prior decode (reference STTODENet.inference,
    model/STTODE.py:574-623). Returns [K, M, T_f, 2] in scene-normalized
    coordinates; the caller re-adds scene_orig (data layer's job).

    ``select_impl`` "fused"/"auto" runs the whole decode as the Pallas
    kernel's traj mode — measured ×2.72 at B=512 (the XLA inference decode
    has no bf16/unhoist mitigations, so the kernel's win is larger here
    than in the train step; BENCHMARKS.md round-3 notes). The kernel route
    is TPU-only for inference: a checkpointed "fused" config evaluated on
    a CPU/GPU host falls back to the XLA decode rather than silently
    running interpret-mode Pallas. The fused route is NON-differentiable
    (forward-only kernel, loud missing-VJP error) — use select_impl="xla"
    to differentiate through inference. Always fp32 (inference outputs
    are real, unlike the argmin-only selection decode select_dtype
    governs)."""
    K = sample_k or cfg.sample_k
    k_enc, k_p = jax.random.split(rng)
    M = batch.batch_size * batch.agent_num

    past_feature = encode_past(params, cfg, batch, rng=k_enc, train=False,
                               mesh=mesh)
    past_feature_k = jnp.repeat(past_feature, K, axis=0)
    pz = prior(params, cfg, past_feature_k)
    z = pz.rsample(k_p)

    dp, _, sel_impl, sel_hoist = _select_routing(cfg, M, K, mesh)
    on_tpu = jax.default_backend() == "tpu" \
        or _ALLOW_FUSED_INFERENCE_INTERPRET
    if sel_impl == "fused" and on_tpu:
        state0 = decode_block0_state(params, batch.past)
        rel = _fused_select_call(
            params, past_feature, z, state0, batch.past,
            jnp.zeros((M, cfg.future_length * 2), batch.past.dtype),
            mode="traj", dtype=jnp.float32, mesh=mesh, dp=dp)  # [K, M, 2T_f]
        return rel.reshape(K, M, cfg.future_length, 2) \
            + batch.cur_location[None]

    diverse, _ = decode(params, cfg, past_feature_k, z, batch.past,
                        batch.cur_location, K, gru_hoist=sel_hoist)
    return jnp.transpose(diverse.reshape(M, K, cfg.future_length, 2),
                         (1, 0, 2, 3))
