from unetseg_tpu.models import unet

__all__ = ["unet"]
