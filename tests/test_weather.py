"""Weather axis: XML parsing, presets, and render modulation
(route_parser.py:23-40,100-138; leaderboard_evaluator.py:67,387)."""

import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.sim import weather as weather_lib


def test_parse_weather_default_and_attrs():
    route = ET.fromstring("<route id='0' town='Town05'/>")
    w = weather_lib.parse_weather_elem(route)
    assert w[weather_lib.W_ALTITUDE] == 70.0
    assert w[weather_lib.W_CLOUD] == 30.0

    route2 = ET.fromstring(
        "<route id='1' town='Town05'>"
        "<weather cloudiness='80' precipitation='60' sun_altitude_angle='-20'"
        " fog_density='40'/></route>"
    )
    w2 = weather_lib.parse_weather_elem(route2)
    assert w2[weather_lib.W_CLOUD] == 80.0
    assert w2[weather_lib.W_RAIN] == 60.0
    assert w2[weather_lib.W_ALTITUDE] == -20.0
    assert w2[weather_lib.W_FOG_DENSITY] == 40.0
    assert weather_lib.is_night(w2)
    assert not weather_lib.is_night(w)


def test_presets_table():
    assert len(weather_lib.WEATHERS) == 14
    assert weather_lib.PRESETS["ClearSunset"][weather_lib.W_ALTITUDE] == 15.0
    assert weather_lib.PRESETS["HardRainNoon"][weather_lib.W_RAIN] == 80.0


def test_weather_modulates_camera(small_cfg, town):
    """Night is darker than noon; hard fog washes out distant contrast."""
    from tests.test_sensors import CAM, _state_with_actor
    import dataclasses
    from thinktwice_tpu.sensors.camera import cameras_from_state

    st = _state_with_actor(small_cfg, town, veh_at=[20.0, -1.75])
    render = jax.jit(cameras_from_state, static_argnums=0)

    def with_weather(**kw):
        return dataclasses.replace(
            st, weather=jnp.asarray(weather_lib.make_weather(**kw))
        )

    noon = np.asarray(render(CAM, town, with_weather())["rgb"])
    night = np.asarray(
        render(CAM, town, with_weather(sun_altitude_angle=-30.0))["rgb"]
    )
    assert night.mean() < 0.5 * noon.mean()

    foggy = np.asarray(
        render(CAM, town, with_weather(fog_density=100.0))["rgb"]
    )
    # distant rows converge to the fog color -> lower per-pixel variance
    far = foggy[0, 18:22]
    far_clear = noon[0, 18:22]
    assert far.std() < far_clear.std()


def test_weather_rain_drops_lidar(small_cfg, town):
    import dataclasses
    from tests.test_sensors import LID, _state_with_actor
    from thinktwice_tpu.sensors.lidar import lidar_from_state

    st = _state_with_actor(small_cfg, town, veh_at=[20.0, -1.75])
    _, mask_clear = jax.jit(lidar_from_state, static_argnums=0)(LID, town, st)
    st_rain = dataclasses.replace(
        st, weather=jnp.asarray(weather_lib.make_weather(precipitation=100.0))
    )
    _, mask_rain = jax.jit(lidar_from_state, static_argnums=0)(
        LID, town, st_rain
    )
    n_clear, n_rain = int(mask_clear.sum()), int(mask_rain.sum())
    assert n_rain < 0.85 * n_clear


def test_route_xml_weather_threads_to_spec(tmp_path):
    from thinktwice_tpu.harness.route_parser import parse_routes_file

    xml = (
        "<routes><route id='7' town='Town01'>"
        "<weather cloudiness='55'/>"
        "<waypoint x='0' y='0' z='0' yaw='0'/>"
        "<waypoint x='50' y='0' z='0' yaw='0'/>"
        "</route></routes>"
    )
    p = tmp_path / "r.xml"
    p.write_text(xml)
    specs = parse_routes_file(str(p))
    assert specs[0].weather[weather_lib.W_CLOUD] == 55.0
