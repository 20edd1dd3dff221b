"""Shared CLI plumbing: one typed flag surface for every entry point.

The reference duplicates ~50 argparse flags per entry point with drift
(SURVEY.md §5.6); here a single parser builds the typed configs
(STTODEConfig / SamplerConfig) and the dataset loading is one function.

Dataset-conditional defaults match the reference: NBA 5/10 horizons and batch
32, others 8/12 and per-scene batches; ETH max_train_agent 32; SDD pixels÷50
(train.py:102-106,134-135,52,146).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from sttode_tpu.models.sampler import DIVERSITY_CONFIG, SamplerConfig
from sttode_tpu.models.sttode import STTODEConfig

ETH_UCY = ("eth", "hotel", "univ", "zara1", "zara2")


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--dataset", default="eth",
                   choices=ETH_UCY + ("sdd", "nba"))
    p.add_argument("--data_root", default="./datasets")
    p.add_argument("--ckpt_dir", default="./saved_models")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--zdim", type=int, default=32)
    p.add_argument("--num_decompose", type=int, default=2)
    p.add_argument("--min_clip", type=float, default=2.0)
    p.add_argument("--sample_k", type=int, default=20)
    p.add_argument("--learn_prior", action="store_true")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--decay_step", type=int, default=10)
    p.add_argument("--decay_gamma", type=float, default=0.5)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--model_save_epoch", type=int, default=5)
    p.add_argument("--keep_last_ckpts", type=int, default=0,
                   help="retain only the newest N checkpoints (0 = keep all, "
                        "the reference behavior)")
    p.add_argument("--async_ckpt", action="store_true",
                   help="flush checkpoints to disk in the background so "
                        "training steps overlap the write")
    p.add_argument("--epoch_continue", type=int, default=0)
    p.add_argument("--max_train_agent", type=int, default=100)
    p.add_argument("--no_rand_rot", action="store_true")
    p.add_argument("--batch_size", type=int, default=0,
                   help="0 = dataset default (32 NBA, per-scene otherwise)")
    p.add_argument("--scenes_per_batch", type=int, default=1,
                   help=">1 stacks same-bucket scenes (needs --attn_axis agent)")
    p.add_argument("--attn_axis", default="scene", choices=("scene", "agent"))
    p.add_argument("--compat", default="reference", choices=("reference", "tpu"))
    p.add_argument("--ode_method", default="euler",
                   choices=("euler", "midpoint", "rk4", "dopri5"))
    p.add_argument("--ode_steps", type=int, default=1)
    p.add_argument("--ode_adjoint", action="store_true")
    p.add_argument("--ode_rtol", type=float, default=1e-7,
                   help="dopri5 relative tolerance (looser = fewer steps)")
    p.add_argument("--ode_atol", type=float, default=1e-9)
    p.add_argument("--ode_scan_budget", type=int, default=0,
                   help="dopri5 only: >0 runs the adaptive controller as a "
                        "lax.scan over exactly this many RK45 attempts per "
                        "interval (static trip count, directly reverse-"
                        "differentiable; step needs at the flagship RHS: 71 "
                        "at default tolerances, 16 at 1e-5/1e-7, 7 at "
                        "1e-3/1e-6). 0 = while_loop")
    p.add_argument("--compute_dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="bfloat16 casts the decode-MLP matmul operands (the "
                        "step's dominant HBM traffic) with fp32 accumulate; "
                        "attention Gram / losses stay fp32")
    p.add_argument("--select_dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="bfloat16 runs the gradient-free best-of-K SELECTION "
                        "decode wholly in bf16 (winner recomputed fp32 — "
                        "loss numerics stay fp32, only near-tie winner "
                        "choices can move); the selection decode is the "
                        "step's dominant component at B>=128")
    p.add_argument("--select_impl", default="xla",
                   choices=("xla", "fused", "auto"),
                   help="best-of-K selection decode route: 'fused' = the "
                        "single-kernel Pallas selection decode (wins at "
                        "M*K >= ~1e5 rows, i.e. B>=512 at NBA shapes); "
                        "'auto' routes by that measured threshold")
    p.add_argument("--decode_dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="bfloat16 gives the DIFFERENTIABLE decompose decode "
                        "(posterior + winner recompute; stage-2 sampler "
                        "decodes) bf16 storage — params cast once "
                        "differentiably, fp32 master weights stay in the "
                        "optimizer, activations + AD residuals store bf16, "
                        "losses stay fp32")
    p.add_argument("--attn_impl", default="auto",
                   choices=("auto", "dense", "fused", "flash", "packed",
                            "ring", "ulysses"),
                   help="attention kernel route; 'ring'/'ulysses' = the two "
                        "sequence-parallel shard_map paths over the mesh's "
                        "data axis (K/V ppermute ring vs head<->token "
                        "all-to-all)")
    p.add_argument("--attn_metric", default="oblique",
                   choices=("oblique", "poincare"),
                   help="MHGSA distance metric: oblique unit-sphere (the "
                        "reference's live path) or Poincare-ball geodesic "
                        "(the paper's framing)")
    p.add_argument("--curvature", type=float, default=1.0,
                   help="Poincare ball curvature c (attn_metric=poincare)")
    p.add_argument("--loss_terms", default="pred,recover,kl,diverse",
                   help="comma-separated subset of pred,recover,kl,diverse; "
                        "'pred,recover,kl' is the VAE-only objective the "
                        "reference's broken trainvae.py intended (dropping "
                        "diverse also skips the K-sample decode)")
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--scan_steps", type=int, default=1,
                   help="optimizer steps fused into one device dispatch via "
                        "lax.scan over stacked batches (amortizes dispatch "
                        "latency; 1 = step-per-dispatch)")
    return p


def horizons_for(dataset: str) -> tuple[int, int]:
    return (5, 10) if dataset == "nba" else (8, 12)


def model_config(args) -> STTODEConfig:
    past_len, future_len = horizons_for(args.dataset)
    return _build_config(args, past_len, future_len).validate()


def _build_config(args, past_len, future_len) -> STTODEConfig:
    return STTODEConfig(
        hidden_dim=args.hidden_dim, zdim=args.zdim,
        past_length=past_len, future_length=future_len,
        num_decompose=args.num_decompose, min_clip=args.min_clip,
        sample_k=args.sample_k, learn_prior=args.learn_prior,
        compat=args.compat, attn_axis=args.attn_axis,
        ode_method=args.ode_method, ode_steps=args.ode_steps,
        ode_adjoint=args.ode_adjoint, ode_rtol=args.ode_rtol,
        ode_atol=args.ode_atol,
        ode_scan_budget=getattr(args, "ode_scan_budget", 0),
        compute_dtype=getattr(args, "compute_dtype", "float32"),
        select_dtype=getattr(args, "select_dtype", "float32"),
        select_impl=getattr(args, "select_impl", "xla"),
        decode_dtype=getattr(args, "decode_dtype", "float32"),
        attn_impl=getattr(args, "attn_impl", "auto"),
        attn_metric=getattr(args, "attn_metric", "oblique"),
        curvature=getattr(args, "curvature", 1.0),
        loss_terms=tuple(
            t for t in getattr(args, "loss_terms",
                               "pred,recover,kl,diverse").split(",") if t),
    )


def sampler_config(args) -> SamplerConfig:
    w, s = DIVERSITY_CONFIG.get(args.dataset, (3.0, 2.0))
    return SamplerConfig(
        nk=args.sample_k, nz=getattr(args, "nz", 32),
        qnet_mlp=tuple(getattr(args, "qnet_mlp", (512, 256))),
        share_eps=not getattr(args, "no_share_eps", False),
        train_w_mean=not getattr(args, "no_train_w_mean", False),
        kld_weight=getattr(args, "kld_weight", 0.1),
        kld_min_clamp=getattr(args, "kld_min_clamp", 10.0),
        div_weight=w, div_scale=s,
    )


def effective_max_train_agent(args) -> int:
    if args.dataset == "eth" and args.max_train_agent == 100:
        return 32   # reference train.py:134-135 override
    return args.max_train_agent


def load_scenes(args, split: str):
    """split: 'train' | 'test'. Returns scene list (ETH/SDD) or
    (past, future) arrays (NBA)."""
    from sttode_tpu.data import load_eth_ucy, load_nba, load_sdd
    ds = args.dataset
    if ds in ETH_UCY:
        return load_eth_ucy(os.path.join(args.data_root, ds, split),
                            obs_len=8, pred_len=12)
    if ds == "sdd":
        return load_sdd(os.path.join(args.data_root, "sdd", split))
    return load_nba(os.path.join(args.data_root, "nba"),
                    training=(split == "train"))


def ckpt_dir(args) -> str:
    return os.path.join(args.ckpt_dir, args.dataset)


def seed_everything(seed: int) -> np.random.Generator:
    np.random.seed(seed)
    return np.random.default_rng(seed)
