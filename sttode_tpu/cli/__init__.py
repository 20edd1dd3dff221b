"""CLI entry points (L6): train / trainsampler / test / test_sampler, mirroring
the reference's four runnable commands (README.md:26-36) as python -m modules."""
