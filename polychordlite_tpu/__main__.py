"""Ini-file CLI driver: ``python -m polychordlite_tpu ini/gaussian.ini``.

Equivalent of the reference's compiled ini drivers
(``src/drivers/polychord_examples.f90`` -> ``run_polychord_ini``,
``interfaces.F90:232-276``): parse the ini, build the block priors and grade
layout, pick the example likelihood (by ``--likelihood`` or the file_root
name), and run.
"""

from __future__ import annotations

import argparse
import sys

from .core.nested_sampling import default_dumper, nested_sampling
from .models import LIKELIHOODS, get_likelihood
from .priors import hypercube_to_physical
from .utils import io as io_mod
from .utils.inifile import read_ini


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

    settings, blocks, paramnames, derived, kv = read_ini(args.inifile)

    name = args.likelihood or kv.get("likelihood") or settings.file_root
    if name not in LIKELIHOODS:
        ap.error(
            f"no example likelihood named {name!r}; pass --likelihood "
            f"(available: {', '.join(sorted(LIKELIHOODS))})"
        )
    loglikelihood = get_likelihood(name, settings.nDims)

    if blocks:
        def prior(cube):
            return hypercube_to_physical(cube, blocks)
    else:
        def prior(cube):
            return cube

    if settings.write_paramnames and paramnames:
        io_mod.write_paramnames_file(settings, list(paramnames) + list(derived))

    out = nested_sampling(loglikelihood, prior, default_dumper, settings)
    print(
        "logZ = %.6f +/- %.6f | ndead = %d | nlike = %d"
        % (out["logZ"], out["logZerr"], out["ndead"], out["nlike"])
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
