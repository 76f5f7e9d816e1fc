from .gaussians import GaussianParams, GaussianAux, Gaussians  # noqa: F401
