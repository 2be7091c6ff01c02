from .posterior import ensemble_posterior, laplace_mixture_posterior  # noqa: F401
