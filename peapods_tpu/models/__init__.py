from .ising import Ising  # noqa: F401
