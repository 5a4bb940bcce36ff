from thinktwice_tpu.maps.town import TownMap, interpolate_route, densify_polyline
from thinktwice_tpu.maps.procedural import make_grid_town

__all__ = ["TownMap", "interpolate_route", "densify_polyline", "make_grid_town"]
