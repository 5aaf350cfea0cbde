from . import actnorm, augment, coupling, distributions, permuters, spline

__all__ = ["actnorm", "augment", "coupling", "distributions", "permuters", "spline"]
