"""True multi-process validation of the distributed path (SURVEY §4, §5.8):
two OS processes joined by ``jax.distributed`` over TCP, each with 4 virtual
CPU devices, run the sharded epoch over the global 8-device mesh.  The
shard-invariant per-lane RNG must make the result bitwise identical to a
single-process 8-device run — the analogue of the reference's determinism
under changing ``mpirun -np``."""

import os
import shutil
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
proc_id, n_proc, port, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=n_proc, process_id=proc_id
)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, %(repo)r)
from polychordlite_tpu.ops.evaluate import make_batched_calculator
from polychordlite_tpu.ops.slice_kernel import EpochConfig
from polychordlite_tpu.parallel.mesh import make_epoch_runner

D = 3
calc = make_batched_calculator(
    lambda c: c, lambda th: -jnp.sum((th - 0.5) ** 2), D, n_derived=1
)
cfg = EpochConfig(n_dims=D, n_phi=calc.n_phi, grade_dims=(D,), num_repeats=(4,))
run, B = make_epoch_runner(calc, cfg, batch_size=64)
assert len(jax.devices()) == 4 * n_proc, jax.devices()

key = jax.random.PRNGKey(5)
seeds = np.full((B, D), 0.5)
bound = np.full((B,), -0.09)
chol = np.broadcast_to(np.eye(D), (B, D, D))
cube, theta, phi, logL, nlike = run(key, seeds, bound, chol)
if proc_id == 0:
    np.savez(out, cube=cube, logL=logL, nlike=nlike, B=B)
print("WORKER_OK", proc_id, flush=True)
"""


@pytest.mark.skipif(shutil.which("python") is None, reason="no python")
def test_two_process_matches_single_process(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO})

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""  # the worker sets its own device count (4)

    # single-process reference (8 local devices)
    ref_out = tmp_path / "ref.npz"
    subprocess.run(
        [sys.executable, str(script), "0", "1", port, str(ref_out)],
        check=True,
        timeout=300,
        env=env,
        capture_output=True,
    )

    # two processes, 4 devices each, joined over TCP
    out2 = tmp_path / "dist.npz"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", port, str(out2)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]
        assert "WORKER_OK" in so

    a = np.load(ref_out)
    b = np.load(out2)
    assert a["B"] == b["B"]
    assert np.array_equal(a["cube"], b["cube"])
    assert np.array_equal(a["logL"], b["logL"])
    assert np.array_equal(a["nlike"], b["nlike"])
