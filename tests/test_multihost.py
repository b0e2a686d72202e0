"""True multi-process distributed run: 2 OS processes x 4 CPU devices.

The closest this environment gets to the reference north star's "1 chip ->
N hosts" topology: jax.distributed with a real coordinator, cross-process
collectives (Gloo as the DCN stand-in), and the all-to-all sharded
receiver's ppermute/all_to_all crossing the process boundary.  The single-
process virtual-mesh tests prove numerics; this proves the same program
runs under an actual multi-controller runtime.
"""
import os
import socket
import subprocess
import sys

_WORKER = os.path.join(os.path.dirname(__file__), "..", "scripts",
                       "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_a2a_receiver():
    port = _free_port()
    env = dict(os.environ)
    # append rather than overwrite (conftest.py idiom): keep whatever
    # flags the environment set, replacing only a prior device count
    kept = [f for f in env.get("XLA_FLAGS", "").split()
            if not f.startswith("--xla_force_host_platform_device_count")]
    env["XLA_FLAGS"] = " ".join(
        kept + ["--xla_force_host_platform_device_count=4"])
    env.pop("JAX_PLATFORMS", None)           # worker forces cpu in-process
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid={pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST OK pid={pid}" in out, out[-3000:]
