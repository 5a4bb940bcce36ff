from thinktwice_tpu.models.encoder_decoder import ThinkTwiceModel

__all__ = ["ThinkTwiceModel"]
