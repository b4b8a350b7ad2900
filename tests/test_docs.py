"""Documentation executability gates.

The reference's README quickstart doubles as a golden test and its
docstrings carry runnable doctests (/root/reference/README.md:53-86,
SURVEY.md §4); this module provides the same guarantees here:

* every ``>>>`` doctest in the package collects and passes;
* the README's quickstart code block runs verbatim and produces
  statistically correct free energies.
"""

import doctest
import os
import re

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _doctest_modules():
    import pymbar_tpu.fes
    import pymbar_tpu.mbar
    import pymbar_tpu.other_estimators
    import pymbar_tpu.solvers
    import pymbar_tpu.testsystems.exponential_distributions
    import pymbar_tpu.testsystems.gaussian_work
    import pymbar_tpu.testsystems.harmonic_oscillators
    import pymbar_tpu.testsystems.timeseries
    import pymbar_tpu.timeseries
    import pymbar_tpu.utils

    return [
        pymbar_tpu.mbar,
        pymbar_tpu.fes,
        pymbar_tpu.solvers,
        pymbar_tpu.testsystems.harmonic_oscillators,
        pymbar_tpu.testsystems.exponential_distributions,
        pymbar_tpu.testsystems.gaussian_work,
        pymbar_tpu.testsystems.timeseries,
        pymbar_tpu.other_estimators,
        pymbar_tpu.timeseries,
        pymbar_tpu.utils,
    ]


@pytest.mark.parametrize("module", _doctest_modules(), ids=lambda m: m.__name__)
def test_docstring_doctests(module):
    results = doctest.testmod(module, verbose=False, raise_on_error=False)
    assert results.failed == 0, f"{results.failed} doctest failures in {module.__name__}"


def test_readme_quickstart_is_golden():
    """The README's first quickstart block must run verbatim and recover
    the analytic free energies within its asymptotic uncertainties."""
    with open(os.path.join(REPO, "README.md")) as fh:
        readme = fh.read()
    blocks = re.findall(r"```python\n(.*?)```", readme, flags=re.DOTALL)
    assert blocks, "README must contain a python quickstart block"

    ns = {}
    exec(compile(blocks[0], "README-quickstart", "exec"), ns)

    tc, mbar, results = ns["tc"], ns["mbar"], ns["results"]
    fa = tc.analytical_free_energies()
    fa = fa - fa[0]
    z = (results["Delta_f"][0, 1:] - fa[1:]) / results["dDelta_f"][0, 1:]
    assert np.all(np.isfinite(z))
    assert np.max(np.abs(z)) < 6.0, f"quickstart z-scores too large: {z}"

    ex = ns["ex"]
    means = tc.analytical_means()
    assert np.max(np.abs(ex["mu"] - means) / np.maximum(ex["sigma"], 1e-3)) < 6.0
