"""VAE-only training entry point — the working replacement for the
reference's unrunnable ``trainvae.py`` (imports a nonexistent ``vaeloss``
module and calls a module as a class; SURVEY.md §2.3).

Its evident intent — train the CVAE with the ELBO terms only, no best-of-K
diverse objective — is realized by the main trainer with
``loss_terms=("pred", "recover", "kl")``; dropping the diverse term also
removes the K-sample decode from the compiled step entirely. All other flags
(datasets, schedulers, checkpointing, --supervise, --profile_dir) are shared
with ``cli.train``.
"""

from __future__ import annotations

import sys

from sttode_tpu.cli.train import main as _train_main


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not any(a.startswith("--loss_terms") for a in argv):
        argv += ["--loss_terms", "pred,recover,kl"]
    return _train_main(argv)


if __name__ == "__main__":
    main()
