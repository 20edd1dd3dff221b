"""Turnkey ETH-UCY leave-one-out protocol runner (round-2 VERDICT item 8).

The reference's published protocol trains and evaluates one model per held-out
scene over the five splits eth/hotel/univ/zara1/zara2
(/root/reference/README.md:26-36; per-dataset constants resolve inside the
CLIs exactly as reference train.py:102-114 does — eth's max_train_agent=32,
the per-dataset sampler diversity table, StepLR decay). Neither repo ships the
raw datasets; this runner makes real-data accuracy parity a ONE-COMMAND claim
the moment data lands:

    python scripts/leave_one_out.py --data_root /path/to/datasets \
        --ckpt_dir ./loo_models --num_epochs 100

Expects the reference's raw layout: ``<data_root>/<split>/{train,test}/*.csv``
(or .txt), frame-id / ped-id / x / y rows — sttode_tpu.data.eth_ucy reads
both delimiters. Each split runs the full four-stage workflow:
train → test (stage-1 best-of-20) → trainsampler → test_sampler (stage-2),
and the summary table + per-split JSON land in ``--out``.

Smoke-tested end-to-end on generated CSV streams (tests/test_e2e.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPLITS = ("eth", "hotel", "univ", "zara1", "zara2")


def run_split(split: str, args) -> dict:
    from sttode_tpu.cli import test as test_cli
    from sttode_tpu.cli import test_sampler as test_sampler_cli
    from sttode_tpu.cli import train as train_cli
    from sttode_tpu.cli import trainsampler as trainsampler_cli

    common = ["--dataset", split, "--data_root", args.data_root,
              "--ckpt_dir", args.ckpt_dir, "--seed", str(args.seed)] \
        + args.extra_list + getattr(args, "per_split_extra_map",
                                    {}).get(split, [])
    sampler_common = common + args.sampler_extra_list
    t0 = time.time()

    train_cli.main(common + ["--num_epochs", str(args.num_epochs),
                             "--model_save_epoch", str(args.save_epoch)])
    stage1 = test_cli.main(common + ["--sweep", str(args.sweep)])

    trainsampler_cli.main(
        sampler_common + ["--num_epochs", str(args.sampler_epochs),
                          "--model_save_epoch", str(args.save_epoch)])
    stage2 = test_sampler_cli.main(sampler_common
                                   + ["--sweep", str(args.sweep)])

    return {
        "split": split,
        "stage1_ade": stage1["ade"], "stage1_fde": stage1["fde"],
        "stage2_ade": stage2["ade"], "stage2_fde": stage2["fde"],
        "seconds": round(time.time() - t0, 1),
        "extra_flags": " ".join(common[8:]),   # provenance past the 4 fixed pairs
    }


def main(argv=None):
    p = argparse.ArgumentParser(
        description="ETH-UCY leave-one-out sweep (reference README protocol)")
    p.add_argument("--data_root", required=True,
                   help="root with <split>/{train,test}/ raw csv/txt files")
    p.add_argument("--ckpt_dir", default="./loo_models")
    p.add_argument("--out", default="./loo_results.json")
    p.add_argument("--splits", nargs="*", default=list(SPLITS),
                   choices=SPLITS)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--sampler_epochs", type=int, default=100)
    p.add_argument("--save_epoch", type=int, default=5)
    p.add_argument("--sweep", type=int, default=2,
                   help="checkpoints per stage swept at eval")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--extra", default="",
                   help="quoted flags forwarded to all four CLIs, e.g. "
                        "--extra '--async_ckpt --keep_last_ckpts 3'")
    p.add_argument("--sampler_extra", default="",
                   help="quoted flags forwarded to the two sampler-stage "
                        "CLIs only, e.g. --sampler_extra '--nz 32'")
    p.add_argument("--per_split_extra", default="{}",
                   help="JSON {split: 'quoted flags'} forwarded to that "
                        "split's four CLIs on top of --extra — e.g. "
                        '\'{"univ": "--ode_method dopri5 --ode_adjoint"}\' '
                        "drives BASELINE.json config 2 through one split")
    p.add_argument("--synthesize", type=int, default=0, metavar="FRAMES",
                   help="generate per-split synthetic CSV data (FRAMES "
                        "frames/file, distinct seed per split, "
                        "data.synthetic.write_eth_style_csvs) into data_root "
                        "for any split whose train dir is missing — proves "
                        "the five-split protocol machinery end-to-end on "
                        "everything except the real data itself (round-5 "
                        "VERDICT item 4)")
    args = p.parse_args(argv)
    import shlex
    args.extra_list = shlex.split(args.extra)
    args.sampler_extra_list = shlex.split(args.sampler_extra)
    args.per_split_extra_map = {
        k: shlex.split(v) for k, v in json.loads(args.per_split_extra).items()}
    unknown = set(args.per_split_extra_map) - set(SPLITS)
    if unknown:
        raise SystemExit(f"--per_split_extra names unknown splits {unknown}")

    if args.synthesize:
        from sttode_tpu.data.synthetic import write_eth_style_csvs
        for i, split in enumerate(args.splits):
            for part, seed_off in (("train", 0), ("test", 1)):
                d = os.path.join(args.data_root, split, part)
                if os.path.isdir(d):
                    continue
                write_eth_style_csvs(
                    d, n_files=2, frames_per_file=args.synthesize,
                    agents=12, seed=100 * i + seed_off)
                print(f"synthesized {d} ({args.synthesize} frames/file)",
                      flush=True)

    missing = [s for s in args.splits if not os.path.isdir(
        os.path.join(args.data_root, s, "train"))]
    if missing:
        raise SystemExit(
            f"data_root {args.data_root} lacks train dirs for {missing} — "
            "expected <data_root>/<split>/{train,test}/ in the reference's "
            "raw CSV format")

    results = []
    for split in args.splits:
        print(f"=== split {split} "
              f"({args.splits.index(split) + 1}/{len(args.splits)}) ===",
              flush=True)
        results.append(run_split(split, args))
        with open(args.out, "w") as f:      # incremental: survive preemption
            json.dump(results, f, indent=2)

    print(f"\n{'split':8s} {'S1 ADE':>8s} {'S1 FDE':>8s} "
          f"{'S2 ADE':>8s} {'S2 FDE':>8s}")
    for r in results:
        print(f"{r['split']:8s} {r['stage1_ade']:8.4f} {r['stage1_fde']:8.4f}"
              f" {r['stage2_ade']:8.4f} {r['stage2_fde']:8.4f}")
    if len(results) == len(SPLITS):
        avg = {k: sum(r[k] for r in results) / len(results)
               for k in ("stage1_ade", "stage1_fde", "stage2_ade",
                         "stage2_fde")}
        print(f"{'AVG':8s} {avg['stage1_ade']:8.4f} {avg['stage1_fde']:8.4f}"
              f" {avg['stage2_ade']:8.4f} {avg['stage2_fde']:8.4f}")
    print(f"results written to {args.out}")
    return results


if __name__ == "__main__":
    main()
