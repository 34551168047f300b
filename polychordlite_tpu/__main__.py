"""Ini-file CLI driver: ``python -m polychordlite_tpu ini/gaussian.ini``.

Equivalent of the reference's compiled ini drivers
(``src/drivers/polychord_examples.f90`` -> ``run_polychord_ini``,
``interfaces.F90:232-276``): parse the ini, build the block priors and grade
layout, pick the example likelihood (by ``--likelihood`` or the file_root
name), and run.
"""

from __future__ import annotations

import argparse
import os
import sys

# Honour JAX_PLATFORMS=cpu even on hosts whose sitecustomize registers a TPU
# plugin programmatically (the env var alone is overridden there); this is
# what lets the test-suite run the CLI subprocess on the CPU mesh.  Other
# values are left to the plugin machinery (forcing them here would hide the
# host CPU backend that callback-path likelihoods need).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

from .inidriver import run_ini
from .models import LIKELIHOODS


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="polychordlite_tpu",
        description="TPU-native nested sampling (PolyChordLite-compatible)",
    )
    ap.add_argument("inifile", help="ini configuration file")
    ap.add_argument(
        "--likelihood",
        default=None,
        help="example likelihood name (default: inferred from file_root); "
        f"available: {', '.join(sorted(LIKELIHOODS))}",
    )
    args = ap.parse_args(argv)

    try:
        out = run_ini(args.inifile, likelihood_name=args.likelihood)
    except ValueError as e:
        ap.error(str(e))
    print(
        "logZ = %.6f +/- %.6f | ndead = %d | nlike = %d"
        % (out["logZ"], out["logZerr"], out["ndead"], out["nlike"])
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
