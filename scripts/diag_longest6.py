"""Diagnose Longest6 route timeouts (town-parameterized diag_blocked).

Round-3 density-corrected Longest6 runs still time out almost everywhere
(Town03: 6/6, Town01: 5/6). Per-route ledger arithmetic splits the failures
into two modes:
  (a) near-miss: v_eff 1.1-1.24 m/s vs the 1.25 m/s the reference budget
      (0.8 s/m + 5 s, route_scenario.py:52-54) requires — congested but
      moving;
  (b) gridlock: v_eff < 0.2 (Town03 routes 15-17, RC 2-14%) — the ego is
      walled near spawn for the whole budget.
This records per-tick telemetry (ego speed + binding v_des term, NPC fleet
speed/stopped-count, nearest-NPC distance) on one route at the corrected
density so the stall can be attributed: ego rule too cautious vs NPC queue
that never drains.

Runs fine on CPU (rule-based autopilot, no raster): JAX_PLATFORMS=cpu.

Usage: python scripts/diag_longest6.py --town Town03 --route 15 [--steps N]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.jaxenv import setup as _jax_setup

_jax_setup()

from thinktwice_tpu.agents.autopilot import autopilot_control
from thinktwice_tpu.config import Config, SimConfig
from thinktwice_tpu.harness.evaluator import (
    build_route_scenarios,
    derive_map_triggers,
)
from thinktwice_tpu.harness.route_parser import parse_routes_file
from thinktwice_tpu.maps.cache import town05_cached
from thinktwice_tpu.maps.router import raster_planner
from thinktwice_tpu.maps.town import traffic_light_states
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world
from thinktwice_tpu.sim.traffic import _front_gap, traffic_policy

MAPS = "/root/reference/roach/obs_manager/birdview/maps"
ROUTES = (
    "/root/reference/leaderboard/data/routes_for_evaluation/"
    "routes_longest6.xml"
)
BANK = "/root/reference/leaderboard/data/routes_for_open_loop_training"
MAX_ROUTE_LEN = 3584

# see scripts/eval_longest6.py for the derivation of these caps
CARLA_SPAWN_POINTS = {
    "Town01": 255, "Town02": 101, "Town03": 265,
    "Town04": 372, "Town05": 302, "Town06": 436,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--town", default="Town03")
    ap.add_argument("--route", type=int, default=15,
                    help="GLOBAL longest6 route index (0..35)")
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--no-scenarios", action="store_true")
    ap.add_argument("--vehicles", type=int, default=0,
                    help="override (default: the town's CARLA spawn cap)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=200,
                    help="sim ticks per telemetry row")
    args = ap.parse_args()

    h5 = os.path.join(MAPS, f"{args.town}.h5")
    bank_files = sorted(
        glob.glob(os.path.join(BANK, f"routes_{args.town.lower()}_*.xml"))
    )[:4]
    town = town05_cached(h5, [ROUTES] + bank_files, town=args.town,
                         max_lane_pts=49152, max_road_segs=8192,
                         max_lane_segs=8192, strict=True)
    planner = raster_planner(h5)
    n_veh = args.vehicles or CARLA_SPAWN_POINTS[args.town]
    print(f"{args.town}: {int(np.asarray(town.tl_valid).sum())} lights, "
          f"{n_veh} vehicles")

    cfg = Config(sim=SimConfig(
        max_vehicles=n_veh + 8, max_walkers=16, max_lights=256,
        max_stop_signs=32, max_route_len=MAX_ROUTE_LEN, max_scenarios=8))

    specs = [s for s in parse_routes_file(ROUTES)
             if f"_{s.route_id}" == f"_{args.route}"]
    assert specs, f"route {args.route} not found"
    spec = specs[0]
    assert spec.town == args.town, f"route {args.route} is in {spec.town}"
    dense = spec.dense(spacing=1.0, max_len=cfg.sim.max_route_len,
                       planner=planner)
    scen = None
    if not args.no_scenarios:
        scen = build_route_scenarios(cfg, dense,
                                     derive_map_triggers(town, dense))
    print(f"route {args.route}: {len(dense)} m dense")
    R = cfg.sim.max_route_len
    if len(dense) < R:
        dense = np.concatenate([dense, np.repeat(dense[-1:], R - len(dense), 0)])
    dense = jnp.asarray(dense[:R], jnp.float32)

    state = reset_world(cfg, town, dense, jax.random.key(args.seed),
                        n_vehicles=n_veh, scenario=scen)

    @jax.jit
    def run_chunk(state):
        def body(st, _):
            ctrl, dbg = autopilot_control(cfg, town, st, debug=True)
            st2, ev = step_world(cfg, town, st, ctrl)
            all_pos = jnp.concatenate([st2.traffic.pos, st2.walkers.pos], 0)
            all_yaw = jnp.concatenate([st2.traffic.yaw, st2.walkers.yaw], 0)
            all_ext = jnp.concatenate(
                [st2.traffic.extent, st2.walkers.extent], 0)
            all_act = jnp.concatenate(
                [st2.traffic.active, st2.walkers.active], 0)
            gap = _front_gap(st2.ego.pos[None], st2.ego.yaw[None],
                             st2.ego.speed[None], all_pos, all_yaw, all_ext,
                             all_act,
                             jnp.zeros((1, all_pos.shape[0]), bool))[0]
            act = st2.traffic.active
            npc_speed = jnp.sum(jnp.where(act, st2.traffic.speed, 0.0)) / \
                jnp.maximum(jnp.sum(act), 1)
            npc_stopped = jnp.sum(act & (st2.traffic.speed < 0.3))
            d_npc = jnp.where(act, jnp.linalg.norm(
                st2.traffic.pos - st2.ego.pos[None], axis=-1), 1e9)
            # NPC stop-cause attribution: re-run the traffic policy in
            # debug mode on the post-step state (cheap on CPU)
            tls = traffic_light_states(town, st2.time_s)
            _, _, _, _, tdbg = traffic_policy(
                cfg.sim, town, tls, st2.traffic.pos, st2.traffic.yaw,
                st2.traffic.speed, st2.traffic.extent, st2.traffic.wp_idx,
                st2.traffic.active, st2.ego.pos, st2.ego.yaw,
                st2.ego.extent, st2.ego.speed, st2.walkers.pos,
                st2.walkers.extent, st2.walkers.active,
                ego_route=jax.lax.dynamic_slice_in_dim(
                    st2.route[:, :2], st2.criteria.route_idx, 16),
                ego_slow_s=st2.criteria.slow_s, debug=True)
            stopped = act & (st2.traffic.speed < 0.3)
            npc_stop_red = jnp.sum(stopped & (tdbg["d_red"] < 12.0))
            npc_stop_gap = jnp.sum(stopped & (tdbg["gap_front"] < 8.0))
            npc_stop_yield = jnp.sum(stopped & tdbg["yielding"])
            npc_stop_hold = jnp.sum(stopped & tdbg["hold"])
            npc_stop_court = jnp.sum(stopped & tdbg["courteous"])
            n_court = jnp.sum(tdbg["courteous"])
            near30 = act & (jnp.linalg.norm(
                st2.traffic.pos - st2.ego.pos[None], axis=-1) < 30.0)
            min_dconf = jnp.min(
                jnp.where(near30, tdbg["court_d_conf"], 1e4))
            n_conf30 = jnp.sum(near30 & (tdbg["court_d_conf"] < 1e3))
            # per-vehicle blocking pointers (pooled actor axis: [veh, ego,
            # walkers]) so the host can trace the ego's waiting chain to its
            # root blocker
            V = st2.traffic.pos.shape[0]
            A2 = V + 1 + st2.walkers.pos.shape[0]
            p_pos = jnp.concatenate(
                [st2.traffic.pos, st2.ego.pos[None], st2.walkers.pos], 0)
            p_yaw = jnp.concatenate(
                [st2.traffic.yaw, st2.ego.yaw[None], st2.walkers.yaw], 0)
            p_ext = jnp.concatenate(
                [st2.traffic.extent, st2.ego.extent[None],
                 st2.walkers.extent], 0)
            p_act = jnp.concatenate(
                [st2.traffic.active, jnp.ones((1,), bool),
                 st2.walkers.active], 0)
            sm = (jax.lax.broadcasted_iota(jnp.int32, (V, A2), 1)
                  == jax.lax.broadcasted_iota(jnp.int32, (V, A2), 0))
            _, blk = _front_gap(
                st2.traffic.pos, st2.traffic.yaw, st2.traffic.speed,
                p_pos, p_yaw, p_ext, p_act, sm,
                self_ext_x=st2.traffic.extent[:, 0], return_idx=True)
            sm_e = (jax.lax.broadcasted_iota(jnp.int32, (1, A2), 1) == V)
            _, eblk = _front_gap(
                st2.ego.pos[None], st2.ego.yaw[None], st2.ego.speed[None],
                p_pos, p_yaw, p_ext, p_act, sm_e,
                self_ext_x=st2.ego.extent[None, 0], return_idx=True)
            tel = dict(
                npc_stop_red=npc_stop_red, npc_stop_gap=npc_stop_gap,
                npc_stop_yield=npc_stop_yield, npc_stop_hold=npc_stop_hold,
                npc_stop_court=npc_stop_court, n_court=n_court,
                min_dconf=min_dconf, n_conf30=n_conf30,
                slow_s=st2.criteria.slow_s,
                speed=st2.ego.speed, comp=st2.criteria.route_completion,
                gap=gap, npc_speed=npc_speed, npc_stopped=npc_stopped,
                nearest_npc=jnp.min(d_npc), pos=st2.ego.pos,
                blocked_s=st2.criteria.blocked_s,
                n_layout=st2.criteria.n_collision_static,
                n_veh=st2.criteria.n_collision_vehicle,
                done=st2.criteria.done, ctrl=ctrl, dbg=dbg,
                blk=blk, ego_blk=eblk[0],
                t_red=tdbg["d_red"], t_hold=tdbg["hold"],
                t_court=tdbg["courteous"],
                t_yield=tdbg["yielding"], t_gapf=tdbg["gap_front"],
            )
            return st2, tel

        return jax.lax.scan(body, state, None, length=args.chunk)

    for chunk in range(args.steps // args.chunk):
        state, tel = run_chunk(state)
        t = jax.device_get(jax.tree.map(lambda x: x[-1], tel))
        d = jax.device_get(tel["dbg"])
        stall = jax.device_get(tel["speed"]) < 0.3
        attrib = {
            "red": int((stall & (d["v_red"] < 0.3)).sum()),
            "gap": int((stall & (d["v_gap"] < 0.3)).sum()),
            "hazard": int((stall & d["hazard"]).sum()),
            "sign": int((stall & (d["v_sign"] < 0.3)).sum()),
            "yield": int((stall & (d["v_yield"] < 0.3)).sum()),
            "d_conf": round(float(d["d_conf"][-1]), 1),
        }
        print(f"t={(chunk + 1) * args.chunk * 0.05:6.1f}s comp={t['comp']:.3f} "
              f"v={t['speed']:4.1f} gap={min(float(t['gap']), 999):5.1f} "
              f"npc_v={t['npc_speed']:4.2f} npc_stop={t['npc_stopped']:3d} "
              f"near={t['nearest_npc']:5.1f} blocked={t['blocked_s']:4.1f} "
              f"lay={t['n_layout']} veh={t['n_veh']} "
              f"pos=({t['pos'][0]:.0f},{t['pos'][1]:.0f}) "
              f"ctrl={np.round(np.asarray(t['ctrl']), 2)} "
              f"stall={int(stall.sum())}/{args.chunk} of which {attrib} "
              f"npc_stop[red={int(t['npc_stop_red'])} "
              f"gap={int(t['npc_stop_gap'])} "
              f"yield={int(t['npc_stop_yield'])} "
              f"hold={int(t['npc_stop_hold'])} "
              f"court={int(t['npc_stop_court'])}] "
              f"slow_s={float(t['slow_s']):.0f} "
              f"court={int(t['n_court'])}/{int(t['n_conf30'])} "
              f"mindc={min(float(t['min_dconf']), 99):.0f}",
              flush=True)
        if float(t["speed"]) < 0.5:
            st0 = jax.device_get(state)
            sp = np.asarray(town.stop_pos)
            sy = np.asarray(town.stop_yaw)
            sv = np.asarray(town.stop_valid)
            d_stop0 = np.linalg.norm(sp - st0.ego.pos[None], axis=-1)
            k = int(np.argmin(np.where(sv, d_stop0, 1e9)))
            if d_stop0[k] < 15.0:
                fwd = np.array([np.cos(st0.ego.yaw), np.sin(st0.ego.yaw)])
                ahead = float((sp[k] - st0.ego.pos) @ fwd)
                dyaw = float(np.abs(
                    (sy[k] - st0.ego.yaw + np.pi) % (2 * np.pi) - np.pi))
                print(f"  sign probe: #{k} eucl={d_stop0[k]:.2f} "
                      f"ahead={ahead:.2f} dyaw={np.degrees(dyaw):.0f} "
                      f"in_zone={bool(st0.criteria.stop_in_zone[k])} "
                      f"has_stopped={bool(st0.criteria.stop_has_stopped[k])} "
                      f"ego_v={float(st0.ego.speed):.3f}", flush=True)
        # trace the ego's waiting chain to its root blocker (last tick of
        # the chunk): blk[i] points at whoever governs vehicle i's front gap
        if float(t["speed"]) < 0.5 and float(t["gap"]) < 30.0:
            st = jax.device_get(state)
            V = st.traffic.pos.shape[0]
            cur = int(t["ego_blk"])
            seen = set()
            parts = []
            for _hop in range(30):
                if cur == V:
                    parts.append("EGO")  # cycle back to ego == deadlock
                    break
                if cur > V:
                    parts.append(f"walker{cur - V - 1}")
                    break
                cause = []
                if t["t_red"][cur] < 12.0:
                    cause.append("red")
                if t["t_yield"][cur]:
                    cause.append("yield")
                if t["t_hold"][cur]:
                    cause.append("hold")
                if t["t_court"][cur]:
                    cause.append("court")
                g = float(t["t_gapf"][cur])
                wp_d = float(np.linalg.norm(
                    np.asarray(town.lane_pts)[st.traffic.wp_idx[cur]]
                    - st.traffic.pos[cur]))
                parts.append(
                    f"v{cur}(v={st.traffic.speed[cur]:.1f},g={min(g,99):.1f},"
                    f"wpd={wp_d:.0f}{',' + '+'.join(cause) if cause else ''})")
                if cur in seen or g > 30.0:
                    break
                seen.add(cur)
                cur = int(t["blk"][cur])
            print("  chain: ego -> " + " -> ".join(parts), flush=True)
            # courtesy-geometry probe on the root blocker: its 8-hop lane
            # path vs the ego's next-16 m route slice
            first = int(t["ego_blk"])
            if first < V:
                lane_next = np.asarray(town.lane_next)
                lane_pts = np.asarray(town.lane_pts)
                wp = int(st.traffic.wp_idx[first])
                hops = []
                for _h in range(8):
                    wp = int(lane_next[wp])
                    hops.append(lane_pts[wp])
                hops = np.stack(hops)
                ridx = int(st.criteria.route_idx)
                ego_rt = np.asarray(st.route)[ridx:ridx + 16, :2]
                dmat = np.linalg.norm(
                    hops[:, None, :] - ego_rt[None, :, :], axis=-1)
                print(f"  probe v{first}: wp_hops->ego_route min "
                      f"{dmat.min():.1f} m (per-hop "
                      f"{np.round(dmat.min(1), 1)}), ridx={ridx}, "
                      f"ego->route0 "
                      f"{np.linalg.norm(st.ego.pos - ego_rt[0]):.1f} m, "
                      f"v{first}->ego "
                      f"{np.linalg.norm(st.traffic.pos[first] - st.ego.pos):.1f} m",
                      flush=True)
        if bool(t["done"]):
            print("DONE:", {k: bool(jax.device_get(getattr(state.criteria, k)))
                            for k in ["blocked", "timeout", "route_deviation",
                                      "finished"]})
            break


if __name__ == "__main__":
    main()
