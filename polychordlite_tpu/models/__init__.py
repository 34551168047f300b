"""Example likelihood zoo.

JAX-native re-implementations of the reference's analytic test problems
(``likelihoods/examples/*.f90``).  Each factory returns a traceable
``loglikelihood(theta) -> logL`` or ``-> (logL, phi)`` suitable for the
batched device engine; all are exercised by the ini-file suite.
"""

from .examples import (
    eggbox,
    gaussian,
    gaussian_shell,
    gaussian_shells,
    half_gaussian,
    himmelblau,
    pyramidal,
    random_gaussian,
    rastrigin,
    rosenbrock,
    twin_gaussian,
    get_likelihood,
    LIKELIHOODS,
)
from .data_driven import fitting, object_detection
from .graded import GradedLikelihood

LIKELIHOODS["fitting"] = fitting
LIKELIHOODS["object_detection"] = object_detection

__all__ = [
    "GradedLikelihood",
    "fitting",
    "object_detection",
    "eggbox",
    "gaussian",
    "gaussian_shell",
    "gaussian_shells",
    "half_gaussian",
    "himmelblau",
    "pyramidal",
    "random_gaussian",
    "rastrigin",
    "rosenbrock",
    "twin_gaussian",
    "get_likelihood",
    "LIKELIHOODS",
]
