"""Driver entry points: keep them compiling (the driver runs these)."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 128, 128, 2)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # raises on any sharding/compile failure


def test_dryrun_multichip_driver_scenarios():
    """Exact driver conditions (round-1 failure mode, VERDICT.md Missing #1):
    the process calling dryrun_multichip has (a) an untouched backend or
    (b) a backend already initialized with ONE device (entry() compile check
    ran first). Both must pass without pytest's conftest rewiring."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_NUM_CPU_DEVICES"] = "1"  # stand-in for the single real chip

    fresh = "import sys; sys.path.insert(0, {r!r}); " \
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    pre_init = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "jax.config.update('jax_num_cpu_devices', 1); "
        "assert len(jax.devices()) == 1; "  # backend now stuck at 1 device
        "import sys; sys.path.insert(0, {r!r}); "
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    )
    for code in (fresh, pre_init):
        proc = subprocess.run(
            [sys.executable, "-c", code.format(r=repo)],
            env=env, cwd=repo, capture_output=True, text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr[-2000:]
