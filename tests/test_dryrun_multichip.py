"""Regression guard for the driver's multi-chip dry run (VERDICT r2 #9).

Round 1 failed the driver's dryrun with rc=124 (timeout); round 2 passed at
288 s of a ~580 s budget, dominated by a single-core XLA compile. This test
pins two things so model growth can't silently re-break it:

1. the dryrun model config stays at the frozen tiny shapes (any change must
   be made here AND in `__graft_entry__._DRYRUN_FROZEN` deliberately);
2. `dryrun_multichip(8)` completes end-to-end in a fresh subprocess within
   DRYRUN_BUDGET_S on this host (subprocess because the dryrun must own the
   XLA_FLAGS device-count setting before backend init, which the test
   session has already consumed).
"""

import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Comfortably under the driver's ~580 s budget; round-2 measured 288 s cold,
# far less warm (persistent compile cache). If this trips, shrink the dryrun
# model — do NOT raise the budget without re-reading the driver's timeout.
DRYRUN_BUDGET_S = 400.0


def test_dryrun_config_frozen():
    import __graft_entry__ as ge

    assert ge._DRYRUN_FROZEN == {
        "img_height": 32,
        "img_width": 64,
        "refine_num": 1,
        "pred_len": 2,
        "bev_channels": 64,
        "n_depth_bins": 16,
        "lidar_pillar_grid": 84,
        "n_z_anchors": 5,
        "n_attn_heads": 4,
        "n_cams": 2,
        "backbone": 10,
        "n_points": 128,
    }


@pytest.mark.slow
def test_dryrun_multichip_under_budget():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # dryrun sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as ge; ge.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True,
        timeout=DRYRUN_BUDGET_S + 60,
    )
    wall = time.time() - t0
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout[-2000:]
    assert wall < DRYRUN_BUDGET_S, (
        f"dryrun took {wall:.0f}s >= {DRYRUN_BUDGET_S}s budget — shrink the "
        f"dryrun model (see __graft_entry__._DRYRUN_FROZEN)"
    )
