"""Driver-gate regression tests for __graft_entry__.

The driver runs ``dryrun_multichip(8)`` in a fresh interpreter with NO
conftest configuration — the entry point itself must provision virtual
devices when fewer than n real chips are visible (VERDICT.md round 1:
MULTICHIP_r01.json failed because it relied on the test harness env).
These tests replicate the driver's invocation exactly: fresh subprocess,
repo root cwd, inherited environment.
"""

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_fresh(code: str) -> subprocess.CompletedProcess:
    # Strip the conftest-injected virtual-device flag so the subprocess
    # starts exactly like the driver's: one (or zero) real accelerators.
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if "host_platform_device_count" not in f
    )
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO_ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


def test_dryrun_multichip_like_the_driver():
    proc = _run_fresh(
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    )
    assert proc.returncode == 0, f"stderr:\n{proc.stderr}\nstdout:\n{proc.stdout}"
    assert "dryrun_multichip ok" in proc.stdout


def _tunnel_alive() -> bool:
    """One quick default-platform round-trip; False when the axon tunnel is
    down (it drops for hours at a time — e.g. the 2026-08-18 outage)."""
    try:
        probe = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax, jax.numpy as jnp; "
                "x = jnp.ones((8, 8)); print('up', float((x @ x).sum()))",
            ],
            cwd=REPO_ROOT,
            capture_output=True,
            text=True,
            timeout=120,
        )
    except subprocess.TimeoutExpired:
        return False
    return probe.returncode == 0 and "up" in probe.stdout


def test_entry_compiles():
    code = (
        "{prelude}import jax; from __graft_entry__ import entry; "
        "fn, args = entry(); out = jax.jit(fn)(*args); "
        "print('entry ok', out.shape)"
    )
    if _tunnel_alive():
        prelude = ""  # the driver's exact invocation: default (TPU) platform
    else:
        # Tunnel outage: still assert the entry is jittable, on CPU (the
        # platform must be forced post-import; the env var alone is ignored
        # when the axon plugin is installed).
        prelude = "import jax; jax.config.update('jax_platforms', 'cpu'); "
    proc = _run_fresh(code.format(prelude=prelude))
    assert proc.returncode == 0, f"stderr:\n{proc.stderr}\nstdout:\n{proc.stdout}"
    assert "entry ok" in proc.stdout
