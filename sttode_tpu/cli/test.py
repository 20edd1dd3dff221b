"""Stage-1 evaluation CLI (reference test.py).

    python -m sttode_tpu.cli.test --dataset eth

Sweeps the last ``--sweep`` checkpoints, reports best best-of-20 min-ADE/FDE
(reference test.py:658-700); NBA additionally prints the horizon table
(test.py:495-588).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from sttode_tpu.cli import common
from sttode_tpu.data import nba_batches
from sttode_tpu.evaluation import evaluate_nba, evaluate_scenes
from sttode_tpu.models import sttode_init
from sttode_tpu.train import checkpoint_epochs, load_checkpoint


def main(argv=None):
    parser = common.base_parser("STTODE stage-1 evaluation (TPU)")
    parser.add_argument("--sweep", type=int, default=2,
                        help="evaluate the last N checkpoints")
    parser.add_argument("--save_plots", default="",
                        help="directory for best-of-K trajectory renderings "
                             "(reference show.py / vis_result role)")
    parser.add_argument("--max_plots", type=int, default=20)
    args = parser.parse_args(argv)
    cfg = common.model_config(args)
    cdir = common.ckpt_dir(args)
    epochs = checkpoint_epochs(cdir)[-args.sweep:]
    if not epochs:
        raise SystemExit(f"no checkpoints under {cdir}")

    data = common.load_scenes(args, "test")
    template_params = sttode_init(jax.random.PRNGKey(0), cfg)
    best = {"ade": float("inf"), "fde": float("inf"), "epoch": -1}
    for epoch in epochs:
        path = os.path.join(cdir, f"model_{epoch:04d}")
        params, _, _, cfg_loaded = load_checkpoint(
            path, template={"params": template_params, "opt_state": None,
                            "epoch": np.asarray(0)})
        key = jax.random.PRNGKey(args.seed)
        if args.dataset == "nba":
            past, fut = data
            table = evaluate_nba(params, cfg_loaded,
                                 nba_batches(past, fut, args.batch_size or 128),
                                 key, sample_k=args.sample_k)
            print(f"epoch {epoch}: " + " ".join(
                f"ADE@{h}: {v:.4f}" for h, v in table["ade"].items()))
            print(" " * 11 + " ".join(
                f"FDE@{h}: {v:.4f}" for h, v in table["fde"].items()))
            ade, fde = table["ade"]["4.0s"], table["fde"]["4.0s"]
        else:
            m = evaluate_scenes(params, cfg_loaded, data, key,
                                sample_k=args.sample_k)
            ade, fde = m["ade"], m["fde"]
            print(f"epoch {epoch}: ADE {ade:.4f} FDE {fde:.4f} "
                  f"miss {m['miss_rate']:.4f} ({m['agents']} agents)")
        if ade < best["ade"]:
            best = {"ade": ade, "fde": fde, "epoch": epoch,
                    "params": params, "cfg": cfg_loaded}
    print(f"best (epoch {best['epoch']}): ADE: {best['ade']:.4f} "
          f"FDE: {best['fde']:.4f}")

    if args.save_plots:
        if args.dataset == "nba":
            _render_nba_plots(best["params"], best["cfg"], data, args)
        else:
            _render_plots(best["params"], best["cfg"], data, args)
    best.pop("params", None)
    best.pop("cfg", None)
    return best


def _render_nba_plots(params, cfg, data, args):
    """Court renderings with best-of-K predictions for the first scenes
    (reference vis_result, test.py:65-161)."""
    import jax.numpy as jnp
    from sttode_tpu.data import nba_batches, prepare_nba_batch
    from sttode_tpu.evaluation import _infer
    from sttode_tpu.utils.visualize import plot_nba_court

    os.makedirs(args.save_plots, exist_ok=True)
    past, fut = data
    key = jax.random.PRNGKey(args.seed)
    n_plotted = 0
    for d in nba_batches(past, fut, 1):
        if n_plotted >= args.max_plots:
            break
        batch = prepare_nba_batch(d)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        key, sub = jax.random.split(key)
        preds = np.asarray(_infer(params, cfg, batch, sub, args.sample_k))
        best_pred = preds[0].reshape(11, cfg.future_length, 2)
        out = os.path.join(args.save_plots, f"court_{n_plotted:04d}.png")
        plot_nba_court(d["past_traj"][0], d["future_traj"][0], best_pred,
                       save_path=out, title=f"scene {n_plotted}")
        n_plotted += 1
    print(f"wrote {n_plotted} court plots to {args.save_plots}")


def _render_plots(params, cfg, scenes, args):
    """Best-of-K fan renderings for the first --max_plots scenes."""
    import jax.numpy as jnp
    from sttode_tpu.data import prepare_scene
    from sttode_tpu.evaluation import _infer
    from sttode_tpu.utils.visualize import plot_best_of_k

    os.makedirs(args.save_plots, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    for i, scene in enumerate(scenes[:args.max_plots]):
        batch, orig = prepare_scene(scene, training=False)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        key, sub = jax.random.split(key)
        preds = np.asarray(_infer(params, cfg, batch, sub, args.sample_k))
        pred_k = np.transpose(preds, (1, 0, 2, 3)) + orig   # [N, K, T, 2]
        out = os.path.join(args.save_plots, f"scene_{i:04d}.png")
        plot_best_of_k(np.asarray(scene["obs"]), np.asarray(scene["pred"]),
                       pred_k, save_path=out,
                       title=f"{args.dataset} frame {scene['frame']:.0f}")
    print(f"wrote {min(len(scenes), args.max_plots)} plots to "
          f"{args.save_plots}")


if __name__ == "__main__":
    main()
