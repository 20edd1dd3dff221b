"""Stage-2 evaluation CLI (reference test_sampler.py).

    python -m sttode_tpu.cli.test_sampler --dataset eth

Nested sweep over sampler × vae checkpoints reporting the best best-of-20
min-ADE/FDE (reference test_sampler.py:608-682).
"""

from __future__ import annotations

import functools
import os

import jax
import numpy as np

from sttode_tpu.cli import common
from sttode_tpu.cli.trainsampler import add_sampler_args
from sttode_tpu.data import scene_batches
from sttode_tpu.models import sampler_forward, sampler_init, sttode_init
from sttode_tpu.train import checkpoint_epochs, load_checkpoint
from sttode_tpu.utils.metrics import AverageMeter, compute_ade, compute_fde


@functools.partial(jax.jit, static_argnames=("scfg", "cfg"))
def _sample(sampler_params, net_params, scfg, cfg, batch, key):
    out = sampler_forward(sampler_params, net_params, scfg, cfg, batch, key,
                          mean=True)
    return out.dec_motion


@functools.partial(jax.jit, static_argnums=(2, 3))
def _sample_and_reduce(sampler_params, net_params, scfg, cfg, batch, key):
    """Sampler decode AND best-of-K min/ADE/FDE in one device dispatch
    (mirrors evaluation._infer_and_reduce — scene origins cancel in
    pred − gt, so the reduction is origin-free). Returns masked sums
    (Σ ade, Σ fde, Σ valid)."""
    import jax.numpy as jnp

    dec = _sample(sampler_params, net_params, scfg, cfg, batch, key)
    err = jnp.linalg.norm(dec - batch.future[:, None], axis=-1)  # [M, K, T]
    ade_per = jnp.min(jnp.mean(err, axis=-1), axis=1)            # [M]
    fde_per = jnp.min(err[..., -1], axis=1)                      # [M]
    v = batch.valid
    return jnp.sum(ade_per * v), jnp.sum(fde_per * v), jnp.sum(v)


def eval_sampler(sampler_params, net_params, scfg, cfg, scenes, key, *,
                 device_reduce: bool = True):
    """Best-of-K sampler eval. ``device_reduce=True`` (default) reduces on
    device and host-syncs once after the loop; False keeps the host-numpy
    path — the oracle the device path is tested against."""
    if device_reduce:
        sums = None
        for batch, _origs in scene_batches(scenes, training=False,
                                           compat=cfg.compat):
            key, sub = jax.random.split(key)
            batch = jax.tree_util.tree_map(jax.numpy.asarray, batch)
            a, f, n = _sample_and_reduce(sampler_params, net_params, scfg,
                                         cfg, batch, sub)
            sums = (a, f, n) if sums is None else \
                (sums[0] + a, sums[1] + f, sums[2] + n)
        if sums is None:
            return 0.0, 0.0
        n_f = max(float(sums[2]), 1.0)
        return float(sums[0]) / n_f, float(sums[1]) / n_f

    ade_m, fde_m = AverageMeter(), AverageMeter()
    for batch, origs in scene_batches(scenes, training=False,
                                      compat=cfg.compat):
        key, sub = jax.random.split(key)
        batch = jax.tree_util.tree_map(jax.numpy.asarray, batch)
        dec = np.asarray(_sample(sampler_params, net_params, scfg, cfg,
                                 batch, sub))
        B, N = batch.batch_size, batch.agent_num
        K, T = dec.shape[1], dec.shape[2]
        dec = dec.reshape(B, N, K, T, 2) + origs[:, None, None, None, :]
        gt = np.asarray(batch.future).reshape(B, N, T, 2) + \
            origs[:, None, None, :]
        valid = np.asarray(batch.valid).reshape(B, N)
        for b in range(B):
            n_real = int(valid[b].sum())
            if n_real == 0:
                continue
            ade_m.update(compute_ade(dec[b], gt[b], valid[b]), n=n_real)
            fde_m.update(compute_fde(dec[b], gt[b], valid[b]), n=n_real)
    return ade_m.avg, fde_m.avg


def main(argv=None):
    parser = add_sampler_args(
        common.base_parser("STTODE stage-2 sampler evaluation (TPU)"))
    parser.add_argument("--sweep", type=int, default=2)
    args = parser.parse_args(argv)
    cfg = common.model_config(args)
    scfg = common.sampler_config(args)
    cdir = common.ckpt_dir(args)
    sdir = os.path.join(cdir, "sampler")

    vae_epochs = checkpoint_epochs(cdir)[-args.sweep:]
    sampler_epochs = checkpoint_epochs(sdir)[-args.sweep:]
    if not vae_epochs or not sampler_epochs:
        raise SystemExit(f"need checkpoints under {cdir} and {sdir}")

    scenes = common.load_scenes(args, "test")
    net_template = sttode_init(jax.random.PRNGKey(0), cfg)
    s_template = sampler_init(jax.random.PRNGKey(0), scfg,
                              pred_model_dim=cfg.hidden_dim,
                              past_feature_dim=2 * cfg.hidden_dim)
    best = {"ade": float("inf"), "fde": float("inf")}
    for ve in vae_epochs:
        net_params, _, _, cfg_l = load_checkpoint(
            os.path.join(cdir, f"model_{ve:04d}"),
            template={"params": net_template, "opt_state": None,
                      "epoch": np.asarray(0)})
        for se in sampler_epochs:
            sp, _, _, scfg_l = load_checkpoint(
                os.path.join(sdir, f"model_{se:04d}"),
                template={"params": s_template, "opt_state": None,
                          "epoch": np.asarray(0)})
            ade, fde = eval_sampler(sp, net_params, scfg_l, cfg_l, scenes,
                                    jax.random.PRNGKey(args.seed))
            print(f"vae {ve} × sampler {se}: ADE {ade:.4f} FDE {fde:.4f}")
            if ade < best["ade"]:
                best = {"ade": ade, "fde": fde, "vae": ve, "sampler": se}
    print(f"best: ADE: {best['ade']:.4f} FDE: {best['fde']:.4f}")
    return best


if __name__ == "__main__":
    main()
