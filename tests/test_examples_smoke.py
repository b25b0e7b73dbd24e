"""Smoke tests for EVERY example script (reference surface: the 16 notebooks
+ 2 scripts in /root/reference/examples; ours are runnable .py counterparts).

Each script runs in-process (runpy, monkeypatched argv) at a tiny config so
refactors cannot silently rot an example — round 4 found
spline_bwd_ablate.py referencing deleted kernel symbols precisely because it
had no smoke coverage.  A completeness check asserts every examples/*.py has
a case here, so NEW examples must register a smoke config too.
"""

import os
import runpy
import sys

import pytest

EXAMPLES = "/root/repo/examples"
sys.path.insert(0, EXAMPLES)

# script -> tiny-config argv (every examples/*.py must appear here)
CASES = {
    "ar_large_d_bench.py": ["--tiny"],
    "augmented_flow.py": ["--iters", "2", "--num-samples", "64",
                          "--anneal-iters", "1"],
    "change_base.py": ["--iters", "2"],
    "circular_nsf.py": ["--iters", "2", "--k", "2", "--hidden", "16",
                        "--batch", "64"],
    "compile_time_report.py": ["--tiny", "--only", "flagship"],
    "conditional_flow.py": ["--iters", "2", "--batch", "32"],
    "data_parallel_training.py": ["--iters", "2", "--k", "2",
                                  "--global-batch", "64"],
    "flagship_backward_probe.py": ["--tiny"],
    "flagship_decomposition.py": ["--tiny"],
    "glow_batch_sweep.py": ["--tiny", "--iters", "2"],
    "glow_backward_probe.py": ["--tiny"],
    "glow_decomposition.py": ["--tiny"],
    "glow_image.py": ["--iters", "2", "--L", "2", "--K", "2",
                      "--hidden", "16", "--batch", "16"],
    "glow_large_batch_recipe.py": ["--tiny"],
    "image_density.py": ["--iters", "2", "--k", "2", "--batch", "64"],
    "inference_bench.py": ["--tiny", "--iters", "2"],
    "mfu_report.py": ["--tiny", "--iters", "2"],
    "native_data_pipeline.py": ["--iters", "2", "--batch", "32",
                                "--workers", "2"],
    "neural_spline_twomoons.py": ["--iters", "2", "--batch", "64"],
    "nsf_cylinder.py": ["--iters", "2", "--num-samples", "64"],
    "nuts_bench.py": ["--tiny"],
    "onchip_kernel_parity.py": [],  # prints {"skipped": ...} off-TPU
    "parallel_modes.py": [],
    "plain_vae.py": ["--epochs", "1", "--latent", "8", "--batch", "512"],
    "planar_radial_comparison.py": ["--iters", "2", "--k", "2"],
    "quality_compare.py": ["vae", "--side", "ours", "--iters", "1"],
    "real_nvp_twomoons.py": ["--iters", "2", "--k", "2", "--batch", "64"],
    "residual_twomoons.py": ["--iters", "2", "--k", "2", "--batch", "64"],
    "scanchain_compare.py": ["--K", "2", "--hidden", "16",
                             "--num-samples", "64", "--iters", "2"],
    "snf_hais.py": [],
    "spline_bwd_ablate.py": ["--tiny"],
    "spline_bwd_probe.py": ["--tiny"],
    "vae_flow.py": ["--epochs", "1", "--latent", "8", "--k", "2",
                    "--batch", "256"],
}


def test_every_example_has_a_smoke_case():
    scripts = {f for f in os.listdir(EXAMPLES) if f.endswith(".py")}
    missing = scripts - set(CASES)
    extra = set(CASES) - scripts
    assert not missing, f"examples without a smoke case: {sorted(missing)}"
    assert not extra, f"smoke cases for deleted examples: {sorted(extra)}"


@pytest.mark.parametrize("script", sorted(CASES))
def test_example_smoke(script, monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", [script] + CASES[script])
    runpy.run_path(os.path.join(EXAMPLES, script), run_name="__main__")
