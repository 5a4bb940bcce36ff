from thinktwice_tpu.sensors.birdview import render_birdview

__all__ = ["render_birdview"]
