from .config import SimConfig  # noqa: F401
from .simulation import IsingSimulation  # noqa: F401
