"""Evidence calibration sweep: nursery staleness vs the logZ pull.

VERDICT r2 item 2: the 10-seed 20-D study showed mean pull -0.54 and pull
sigma 1.28 — the batched nursery is suspected of biasing logZ low via seed
staleness (babies accepted against contours that rose since their seeds were
drawn).  This sweeps the two staleness knobs on the 4-D quickstart oracle
(analytic logZ = -4 log 2):

  * ``synchronous`` — True: one nursery in flight (seeds current at
    dispatch, reference sync mode); False: dispatch-ahead (babies up to two
    nurseries stale, round-2 behaviour).
  * ``batch_size`` — nursery width B; smaller B = fresher contours per baby.

Each (config, seed) runs in its own subprocess on the CPU backend (runs are
independent; JAX state does not survive forks cleanly).  Writes
``benchmarks/calibration_study.json`` and prints per-config pull summaries.

Usage: python benchmarks/calibration_study.py [n_seeds] [n_workers]
"""

import json
import math
import os
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N_WORKERS = int(sys.argv[2]) if len(sys.argv) > 2 else max(os.cpu_count() - 2, 1)

ANALYTIC = -4 * math.log(2)

WORKER = r"""
import os, sys, json, math
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax; jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, %(repo)r)
import jax.numpy as jnp
import polychordlite_tpu
from polychordlite_tpu.priors import UniformPrior

seed, sync, bs = int(sys.argv[1]), sys.argv[2] == '1', int(sys.argv[3])

def lik(theta):
    return (-jnp.sum((theta / 0.1) ** 2) / 2
            - 4 * math.log(0.1 * math.sqrt(2 * math.pi)), [jnp.sum(theta**2)])

out = polychordlite_tpu.run(
    lik, 4, nDerived=1, prior=UniformPrior(-1, 1), nlive=200,
    read_resume=False, write_resume=False, posteriors=False, equals=False,
    write_live=False, write_dead=False, write_stats=False, write_prior=False,
    base_dir='/tmp/calib_%%d_%%d_%%d' %% (seed, sync, bs),
    seed=seed, feedback=-1, synchronous=sync, batch_size=bs)
print(json.dumps({'logZ': out.logZ, 'logZerr': out.logZerr, 'ndead': out.ndead}))
""" % {"repo": REPO}


def run_one(args):
    seed, sync, bs = args
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(seed), "1" if sync else "0", str(bs)],
        capture_output=True, text=True, timeout=900,
    )
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    d.update(seed=seed, synchronous=sync, batch_size=bs)
    return d


CONFIGS = [
    ("async_B=nlive", False, 200),
    ("sync_B=nlive", True, 200),
    ("sync_B=nlive/4", True, 56),
    ("async_B=nlive/4", False, 56),
]


def main():
    jobs = [
        (name, (seed + 1, sync, bs))
        for name, sync, bs in CONFIGS
        for seed in range(N_SEEDS)
    ]
    results = {name: [] for name, *_ in CONFIGS}
    with ThreadPoolExecutor(N_WORKERS) as ex:
        futs = {ex.submit(run_one, args): name for name, args in jobs}
        for f in futs:
            pass
        for fut, name in futs.items():
            try:
                results[name].append(fut.result())
            except Exception as e:
                print(f"{name}: worker failed: {e}", file=sys.stderr)

    summary = {}
    for name, rows in results.items():
        pulls = [(r["logZ"] - ANALYTIC) / max(r["logZerr"], 1e-9) for r in rows]
        n = len(pulls)
        mean = sum(pulls) / n
        sd = math.sqrt(sum((p - mean) ** 2 for p in pulls) / max(n - 1, 1))
        summary[name] = {
            "n": n,
            "mean_pull": round(mean, 3),
            "pull_sigma": round(sd, 3),
            "sigma_of_mean": round(sd / math.sqrt(n), 3),
            "mean_ndead": round(sum(r["ndead"] for r in rows) / n, 0),
        }
        print(name, json.dumps(summary[name]), flush=True)

    with open(os.path.join(REPO, "benchmarks", "calibration_study.json"), "w") as f:
        json.dump({"analytic_logZ": ANALYTIC, "n_seeds": N_SEEDS,
                   "results": results, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
