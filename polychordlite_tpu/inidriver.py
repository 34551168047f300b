"""Ini-file run driver (the reference's ``run_polychord_ini`` path,
``interfaces.F90:232-276``): parse the ini, build block priors and grade
layout, resolve the likelihood, run.  Used by the CLI (``__main__``) and by
the C ABI's ini variant (``capi.run_from_c_ini``)."""

from __future__ import annotations

from .core.nested_sampling import default_dumper, nested_sampling
from .models import LIKELIHOODS, get_likelihood
from .priors import hypercube_to_physical
from .utils import io as io_mod
from .utils.inifile import read_ini


def run_ini(inifile: str, likelihood_name=None, loglikelihood=None):
    """Run from an ini file.

    ``loglikelihood(theta, nDerived) -> (logL, phi)``, if given, overrides
    the example-zoo lookup (the C-ABI path, where the likelihood is a user's
    C function).  Otherwise the zoo likelihood is picked by
    ``likelihood_name`` / the ini's ``likelihood`` key / ``file_root``.
    """
    settings, blocks, paramnames, derived, kv = read_ini(inifile)

    if loglikelihood is not None:
        n_derived = settings.nDerived

        def like(theta):
            return loglikelihood(theta, n_derived)

    else:
        name = likelihood_name or kv.get("likelihood") or settings.file_root
        if name not in LIKELIHOODS:
            raise ValueError(
                f"no example likelihood named {name!r}; available: "
                f"{', '.join(sorted(LIKELIHOODS))}"
            )
        kwargs = {}
        if name in ("fitting", "object_detection"):
            # data-driven examples read the reference data/ formats; the
            # directory comes from the ini's `data_dir` key (default: a
            # data/ directory next to the ini file, like the reference's
            # hard-coded relative 'data/' paths in fitting.f90)
            import os

            data_dir = kv.get("data_dir")
            if data_dir is None:
                candidate = os.path.join(
                    os.path.dirname(os.path.abspath(inifile)), "..", "data"
                )
                if os.path.exists(os.path.join(candidate, "data.dat")):
                    data_dir = candidate
            kwargs["data_dir"] = data_dir
        like = get_likelihood(name, settings.nDims, **kwargs)

    if blocks:

        def prior(cube):
            return hypercube_to_physical(cube, blocks)

    else:

        def prior(cube):
            return cube

    if settings.write_paramnames and paramnames:
        io_mod.write_paramnames_file(settings, list(paramnames) + list(derived))

    return nested_sampling(like, prior, default_dumper, settings)
