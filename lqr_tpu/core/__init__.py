from .state import EngineConfig, MapState, init_state, round_up
from .engine import extend_map, materialize, materialize_all, seam_step
from . import energy, dp

__all__ = [
    "EngineConfig", "MapState", "init_state", "round_up",
    "extend_map", "materialize", "materialize_all", "seam_step",
    "energy", "dp",
]
