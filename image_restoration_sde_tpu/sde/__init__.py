from .schedules import make_theta_schedule, ScheduleTables, build_tables
from .irsde import IRSDE
from .denoising_sde import DenoisingSDE
from . import rng, samplers

__all__ = [
    "make_theta_schedule",
    "ScheduleTables",
    "build_tables",
    "IRSDE",
    "DenoisingSDE",
    "rng",
    "samplers",
]
