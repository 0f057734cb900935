"""The driver entry points must work regardless of the caller's JAX state.

Round-1 recorded failure: the driver imported __graft_entry__ into a
process whose JAX was already initialized on one real chip, and
dryrun_multichip crashed reshaping 1 device to a (2, 4) mesh. The fix
self-bootstraps a subprocess with the virtual-CPU topology env.
"""

import subprocess
import sys
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_dryrun_multichip_bootstraps_from_initialized_process():
    # simulate the driver: JAX initialized (on whatever platform this
    # test process uses — conftest pins CPU with 8 virtual devices, but
    # the bootstrap must not rely on that), then call dryrun.
    import jax

    jax.devices()  # force backend init
    sys.path.insert(0, str(REPO))
    try:
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)
    finally:
        sys.path.remove(str(REPO))


def test_dryrun_worker_env_is_scrubbed():
    """The worker subprocess must not inherit the single-chip TPU
    registration env (the round-1 crash vector)."""
    import os

    import __graft_entry__ as ge

    # build the env the same way dryrun_multichip does
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = "127.0.0.1"  # poison as in the container
    env[ge._WORKER_FLAG] = "1"
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                "AXON_LOOPBACK_RELAY"):
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; d = jax.devices(); "
         "print(len(d), d[0].platform)"],
        env=env, capture_output=True, text=True, cwd=str(REPO), timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    n, platform = out.stdout.split()
    assert platform == "cpu" and int(n) == 8
