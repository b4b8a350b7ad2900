"""Every example workload must run end-to-end (the reference ships its
examples as living documentation; here they are also CI-gated).

Each example is a self-contained synthetic analog of a reference workload
(examples/README.md) exposing ``main()``; conftest.py has already forced
the 8-device virtual CPU backend, so these exercise the same code paths
the docs tell users to run.
"""

import importlib.util
import os

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "examples")

EXAMPLES = [
    "harmonic_oscillators.py",
    "alchemical_free_energy.py",
    "umbrella_sampling_fes.py",
    "heat_capacity.py",
    "parallel_tempering_2dfes.py",
    "constant_force_optical_trap.py",
    # Published-data workflow: analyzes the reference tree's bundled
    # lysozyme umbrella-sampling dataset in place (skips itself cleanly
    # when the dataset isn't mounted) and asserts 1e-8 agreement with the
    # reference package on identical data.
    "umbrella_sampling_real_data.py",
]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name, capsys):
    path = os.path.join(EXAMPLES_DIR, name)
    spec = importlib.util.spec_from_file_location(f"example_{name[:-3]}", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    module.main()
    out = capsys.readouterr().out
    assert out.strip(), f"{name} produced no output"
    assert "nan" not in out.lower().replace("nanometer", ""), (
        f"{name} printed NaNs:\n{out}"
    )
