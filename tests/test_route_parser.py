import json
import os

import numpy as np

from thinktwice_tpu.harness.route_parser import (
    downsample_route,
    match_scenarios_to_route,
    parse_routes_file,
    parse_scenarios_file,
)
from thinktwice_tpu.maps.town import interpolate_route, route_length

REF_ROUTES = "/root/reference/leaderboard/data/routes_for_evaluation/routes_town05_long.xml"


def test_interpolate_route_straight():
    kp = np.asarray([[0.0, 0.0], [100.0, 0.0]])
    yaw = np.asarray([0.0, 0.0])
    dense = interpolate_route(kp, yaw, spacing=1.0)
    assert len(dense) >= 100
    np.testing.assert_allclose(dense[:, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(route_length(dense), 100.0, atol=0.5)


def test_interpolate_route_turn():
    # 90-degree corner with posed headings: spline should round the corner
    kp = np.asarray([[0.0, 0.0], [50.0, 50.0]])
    yaw = np.asarray([0.0, 90.0])
    dense = interpolate_route(kp, yaw, spacing=1.0)
    length = route_length(dense)
    # quarter arc of radius 50 is ~78.5 m; straight line is 70.7
    assert 70.0 < length < 90.0
    # starts heading +x, ends heading +y
    assert abs(dense[0, 2]) < 0.2
    assert abs(dense[-2, 2] - np.pi / 2) < 0.2


def test_interpolate_route_padding():
    kp = np.asarray([[0.0, 0.0], [10.0, 0.0]])
    dense = interpolate_route(kp, np.zeros(2), spacing=1.0, max_len=64)
    assert dense.shape == (64, 3)
    np.testing.assert_allclose(dense[-1, :2], [10.0, 0.0], atol=1e-5)


def test_parse_reference_routes():
    if not os.path.exists(REF_ROUTES):
        return  # reference not mounted
    routes = parse_routes_file(REF_ROUTES)
    assert len(routes) == 10  # Town05 Long has 10 routes
    assert all(r.town == "Town05" for r in routes)
    dense = routes[0].dense(spacing=1.0)
    assert route_length(dense) > 1000.0  # long routes are km-scale


def test_scenario_json_parse_and_match(tmp_path):
    doc = {
        "available_scenarios": [
            {
                "Town05": [
                    {
                        "scenario_type": "Scenario3",
                        "available_event_configurations": [
                            {"transform": {"x": 5.0, "y": 0.0, "yaw": 0.0}},
                            {"transform": {"x": 500.0, "y": 500.0, "yaw": 0.0}},
                        ],
                    }
                ]
            }
        ]
    }
    p = tmp_path / "scen.json"
    p.write_text(json.dumps(doc))
    trigs = parse_scenarios_file(str(p), "Town05")
    assert len(trigs) == 2
    route = np.stack(
        [np.linspace(0, 100, 101), np.zeros(101), np.zeros(101)], axis=1
    )
    matched = match_scenarios_to_route(trigs, route)
    assert len(matched) == 1
    np.testing.assert_allclose(matched[0].pos, [5.0, 0.0])


def test_downsample_route():
    route = np.stack(
        [np.linspace(0, 200, 201), np.zeros(201), np.zeros(201)], axis=1
    )
    sparse = downsample_route(route, 50.0)
    assert 4 <= len(sparse) <= 6
    np.testing.assert_allclose(sparse[-1, 0], 200.0)
