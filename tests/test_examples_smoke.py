"""Smoke tests for the example scripts closing the reference's example
surface (examples/circular_nsf.ipynb, examples/plain_vae.py): tiny configs,
assert they run end-to-end and the loss is finite."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/examples")


def test_circular_nsf_example_smoke():
    import circular_nsf

    nll = circular_nsf.main(["--iters", "3", "--k", "2", "--hidden", "16",
                             "--batch", "64"])
    assert np.isfinite(nll)


def test_plain_vae_example_smoke():
    import plain_vae

    neg_elbo = plain_vae.main(["--epochs", "1", "--latent", "8",
                               "--batch", "512"])
    assert np.isfinite(neg_elbo)
