import numpy as np

from thinktwice_tpu.harness.statistics import (
    RouteResult,
    compute_global_statistics,
    compute_route_statistics,
    results_document,
    save_results,
    resume_done_indices,
)


def mk(completion=100.0, finished=True, **kw):
    return RouteResult(
        route_id="0",
        index=0,
        route_length_m=1000.0,
        completion_pct=completion,
        finished=finished,
        **kw,
    )


def test_perfect_route():
    rec = compute_route_statistics(mk())
    assert rec["scores"]["score_composed"] == 100.0
    assert rec["status"] == "Completed"


def test_penalty_product():
    # matches statistics_manager.py:22-30 constants
    rec = compute_route_statistics(
        mk(n_collision_vehicle=2, n_red_light=1, n_collision_walker=1)
    )
    expected = 100.0 * (0.60**2) * 0.70 * 0.50
    np.testing.assert_allclose(rec["scores"]["score_composed"], expected)


def test_offlane_penalty_multiplicative():
    rec = compute_route_statistics(mk(offlane_pct=25.0))
    np.testing.assert_allclose(rec["scores"]["score_composed"], 75.0)


def test_longest6_stop_waived():
    rec = compute_route_statistics(mk(n_stop_sign=3), stop_penalty=1.0)
    assert rec["scores"]["score_composed"] == 100.0


def test_failed_statuses():
    rec = compute_route_statistics(mk(completion=40.0, finished=False, blocked=True))
    assert rec["status"] == "Failed - Agent got blocked"
    assert rec["scores"]["score_route"] == 40.0


def test_global_statistics_mean_and_per_km():
    r1 = compute_route_statistics(mk())
    r2 = compute_route_statistics(mk(completion=50.0, finished=False, n_red_light=2))
    g = compute_global_statistics([r1, r2])
    np.testing.assert_allclose(g["scores"]["score_route"], 75.0)
    # reference normalization (statistics_manager.py:222): "km" =
    # score_route(0-100) x meters / 1000 — i.e. 100x the true km, kept for
    # result-JSON comparability. route2: 50 x 1000 / 1000 = 50 "km",
    # 2 events -> 0.04/km
    np.testing.assert_allclose(g["infractions"]["red_light"], 0.04)
    assert g["status"] == "Failed"


def test_results_document_roundtrip(tmp_path):
    r1 = compute_route_statistics(mk())
    g = compute_global_statistics([r1])
    doc = results_document([r1], g)
    assert doc["labels"][0] == "Driving score"
    p = tmp_path / "results.json"
    save_results(str(p), [r1], g)
    assert resume_done_indices(str(p)) == {0}
    assert resume_done_indices(str(tmp_path / "missing.json")) == set()
