"""OpenSCENARIO subset parser (harness/openscenario.py) against the
reference's shipped srunner examples (SURVEY §2.1 S8)."""

import os

import numpy as np
import pytest

from thinktwice_tpu.harness.openscenario import parse_xosc, to_scenario_arrays

EXAMPLES = "/root/reference/scenario_runner/srunner/examples"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference examples not mounted")


@needs_ref
def test_follow_leading_vehicle():
    osc = parse_xosc(os.path.join(EXAMPLES, "FollowLeadingVehicle.xosc"))
    assert osc.town == "Town01"
    assert osc.ego_pos is None or isinstance(osc.ego_pos, tuple)
    # the adversary teleports to WorldPosition(190, 133) and its first
    # SpeedAction resolves the $leadingSpeed parameter (2.0 m/s) with a
    # RelativeDistanceCondition(40 m) start trigger
    adv = [e for e in osc.entities if e.name == "adversary"]
    assert len(adv) == 1
    a = adv[0]
    assert a.pos == (190.0, 133.0)
    assert a.target_speed == pytest.approx(2.0)
    assert a.trigger_kind == "distance"
    assert a.trigger_value == pytest.approx(40.0)

    arrs = to_scenario_arrays(osc, max_vehicles=32, max_walkers=4)
    assert arrs is not None
    assert arrs["kinds"].shape == arrs["actor_idx"].shape
    # same-heading adversary -> lead-vehicle kind, top traffic slot
    assert int(arrs["kinds"][0]) == 6
    assert int(arrs["actor_idx"][0]) == 31
    assert arrs["params"][0][0] == pytest.approx(40.0)


@needs_ref
def test_pedestrian_crossing():
    path = os.path.join(EXAMPLES, "PedestrianCrossingFront.xosc")
    if not os.path.exists(path):
        pytest.skip("example missing")
    osc = parse_xosc(path)
    peds = [e for e in osc.entities if e.category == "pedestrian"]
    assert peds, "example should declare a pedestrian adversary"
    arrs = to_scenario_arrays(osc, max_vehicles=32, max_walkers=4)
    kinds = list(arrs["kinds"])
    assert 1 in kinds  # walker-dash kind


@needs_ref
def test_changing_weather_maps_to_vector():
    path = os.path.join(EXAMPLES, "ChangingWeather.xosc")
    if not os.path.exists(path):
        pytest.skip("example missing")
    osc = parse_xosc(path)
    if osc.weather is not None:
        assert osc.weather.shape == (10,)
        assert np.all(np.isfinite(osc.weather))


@needs_ref
def test_unsupported_features_are_reported_not_silent():
    # LaneChangeSimple uses LanePosition inits — outside the subset; the
    # parser must surface that rather than fabricate positions
    path = os.path.join(EXAMPLES, "LaneChangeSimple.xosc")
    if not os.path.exists(path):
        pytest.skip("example missing")
    osc = parse_xosc(path)
    assert isinstance(osc.unsupported, list)
