from .unet_vc2 import UNetConfig, UNetModel

__all__ = ["UNetConfig", "UNetModel"]
