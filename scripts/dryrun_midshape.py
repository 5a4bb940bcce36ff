"""Half-flagship multichip dryrun (VERDICT r4 task 7).

Runs the FULL sharded train step — ResNet-50 backbone, all 4 cameras,
refine_num 5, pred_len 4, 128x256 images — over an 8-virtual-device CPU
mesh, and records the wall-clock to runs/multichip_midshape.json. The
driver's fast dryrun path keeps the frozen toy shapes; this is the
evidence that the flagship-class model actually shards (reference
equivalent: 16xA100 DDP, docs/TRAIN.md:8).

Usage: JAX_PLATFORMS=cpu python scripts/dryrun_midshape.py

8 virtual devices time-slice ONE host core here, so per-device fwd+bwd can
take minutes — far beyond XLA:CPU's default 40 s collective-rendezvous
termination (the first attempt died exactly there, runs/dryrun_midshape.log).
The flag below raises that budget; on a real multi-chip TPU the devices run
concurrently and the default is fine.
"""

import json
import os
import sys
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "terminate_timeout" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags
        + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    ).strip()
if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as g

if __name__ == "__main__":
    n = int(os.environ.get("DRYRUN_DEVICES", "8"))
    t0 = time.time()
    g.dryrun_multichip(n, shapes=g._DRYRUN_MID)
    wall = time.time() - t0
    doc = {
        "ok": True,
        "devices": n,
        "shapes": g._DRYRUN_MID,
        "wall_s": round(wall, 1),
    }
    with open("runs/multichip_midshape.json", "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(doc))
