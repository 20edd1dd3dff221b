"""Multi-seed trained-parity study (round-5 VERDICT item 2).

Round 4's reference-vs-ours trained A/Bs were single-seed (fixture seeds 2/3,
torch.manual_seed(0), PRNGKey(0)) — deltas of 6-9% FDE were called "within
noise" with no noise estimate. This script re-runs each of the three A/B
protocols (stage-1 ETH-shape `convergence`, `convergence_nba`, full two-stage
`stage2`; protocols per /root/reference/trainsampler.py:124-194 and
/root/reference/test_sampler.py:117-212) at N seeds per framework, varying
BOTH the fixture draw and each framework's init/train randomness, and reports
mean ± sample std (ddof=1) per metric per framework, plus an explicit
overlap verdict per row.

Each (mode, seed) runs in a FRESH subprocess: torch and jax never share a
process's allocator/jit-cache state across runs, and one crash loses one cell,
not the sweep. Results accumulate in PARITY_SEEDS.json keyed by
"{mode}/seed{n}" so the sweep is resumable — completed cells are skipped.

Usage:
    python scripts/parity_seeds.py [--seeds 5] [--modes convergence,...]
    python scripts/parity_seeds.py --report    # aggregate only, no runs
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MEASURE = os.path.join(REPO, "scripts", "measure_reference_baseline.py")
OUT = os.path.join(REPO, "PARITY_SEEDS.json")

# epochs match the round-4 single-seed rows (CONVERGENCE.md):
# convergence/convergence_nba at 12 epochs, stage2 at 10+10
MODE_ARGS = {
    "convergence": ["--epochs", "12"],
    "convergence_nba": ["--epochs", "12"],
    "stage2": ["--epochs", "10", "--epochs2", "10"],
}
# the result_key each mode writes inside its JSON
MODE_KEY = {"convergence": "convergence", "convergence_nba": "convergence_nba",
            "stage2": "stage2"}


def _load():
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)
    return {}


def run_cell(mode: str, seed: int, store: dict) -> bool:
    """One (mode, seed) A/B in a subprocess; returns True on success."""
    cell_key = f"{mode}/seed{seed}"
    if cell_key in store:
        print(f"[skip] {cell_key} already done", flush=True)
        return True
    tmp = os.path.join(REPO, f".parity_cell_{mode}_{seed}.json")
    if os.path.exists(tmp):
        os.remove(tmp)
    # seed plan: seed 0 = the round-4 canonical cell (fixture 2/3, torch 0,
    # jax 0); seed n shifts every stream so no two cells share data OR init
    cmd = [sys.executable, MEASURE, mode, *MODE_ARGS[mode],
           "--fixture-seed", str(2 + 10 * seed),
           "--torch-seed", str(seed),
           "--jax-seed", str(100 * seed),
           "--out", tmp]
    print(f"[run ] {cell_key}: {' '.join(cmd[2:])}", flush=True)
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=3600)
    if r.returncode != 0 or not os.path.exists(tmp):
        print(f"[FAIL] {cell_key} rc={r.returncode}\n{r.stderr[-2000:]}",
              flush=True)
        return False
    with open(tmp) as f:
        store[cell_key] = json.load(f)[MODE_KEY[mode]]
    os.remove(tmp)
    with open(OUT, "w") as f:
        json.dump(store, f, indent=2)
    return True


def _mean_std(xs):
    m = sum(xs) / len(xs)
    if len(xs) < 2:
        return m, float("nan")
    var = sum((x - m) ** 2 for x in xs) / (len(xs) - 1)
    return m, math.sqrt(var)


def report(store: dict, modes) -> str:
    lines = ["| protocol | metric | reference (mean ± σ, N) | "
             "ours (mean ± σ, N) | verdict |",
             "|---|---|---|---|---|"]
    for mode in modes:
        cells = [v for k, v in sorted(store.items())
                 if k.startswith(mode + "/")]
        if not cells:
            continue
        for metric in ("min_ade", "min_fde"):
            ref = [c["reference_torch_cpu"][metric] for c in cells]
            ours = [c["ours_jax_cpu"][metric] for c in cells]
            rm, rs = _mean_std(ref)
            om, os_ = _mean_std(ours)
            n = len(cells)
            # paired t-test on the per-seed deltas (each seed shares its
            # fixture across frameworks, so pairing removes the fixture-
            # difficulty variance, which dominates the raw σ columns);
            # significance against the two-sided 95% Student-t critical
            # value at df=N-1 — NOT a fixed 2.0, which over-claims at the
            # small N this study runs at
            T_CRIT_95 = {1: 12.71, 2: 4.30, 3: 3.18, 4: 2.78, 5: 2.57,
                         6: 2.45, 7: 2.36, 8: 2.31, 9: 2.26}
            deltas = [o - r for o, r in zip(ours, ref)]
            dm, ds = _mean_std(deltas)
            if n >= 2 and ds == ds:  # not NaN
                se = ds / math.sqrt(n)
                t = dm / se if se > 0 else float("inf")
                tc = T_CRIT_95.get(n - 1, 2.0)
                if abs(t) < tc:
                    verdict = (f"parity (Δ={dm:+.3f}, t={t:.1f} < "
                               f"t₉₅={tc:.2f})")
                elif dm < 0:
                    verdict = (f"ours better (Δ={dm:+.3f}, t={t:.1f} ≥ "
                               f"t₉₅={tc:.2f})")
                else:
                    verdict = (f"reference better (Δ={dm:+.3f}, t={t:.1f} ≥ "
                               f"t₉₅={tc:.2f})")
            else:
                verdict = "N<2"
            lines.append(
                f"| {mode} | {metric} | {rm:.4f} ± {rs:.4f} (N={n}) "
                f"| {om:.4f} ± {os_:.4f} (N={n}) | {verdict} |")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--modes", default="convergence,convergence_nba,stage2")
    ap.add_argument("--report", action="store_true",
                    help="aggregate PARITY_SEEDS.json only; run nothing")
    args = ap.parse_args()
    modes = args.modes.split(",")
    store = _load()
    if not args.report:
        for seed in range(args.seeds):
            for mode in modes:
                run_cell(mode, seed, store)
    print(report(store, modes))


if __name__ == "__main__":
    main()
