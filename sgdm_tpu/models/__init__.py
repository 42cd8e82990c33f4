from .attention_lr import AttentionLR, CrossAttentionLR
from .ema import ema_decay_schedule, ema_update
from .factory import create_denoiser
from .layers import (
    Downsample,
    GroupNorm32,
    ResBlock,
    SelfAttentionBlock,
    Upsample,
    timestep_embedding,
)
from .unet import UNetBackbone, UNetCAModel, UNetModel
from .zoo import LatentFC, VDMUNet
from .zoo_imagen import BaseUnet64, ImagenUNet

__all__ = [
    "LatentFC",
    "VDMUNet",
    "ImagenUNet",
    "BaseUnet64",
    "AttentionLR",
    "CrossAttentionLR",
    "ema_decay_schedule",
    "ema_update",
    "create_denoiser",
    "Downsample",
    "GroupNorm32",
    "ResBlock",
    "SelfAttentionBlock",
    "Upsample",
    "timestep_embedding",
    "UNetBackbone",
    "UNetCAModel",
    "UNetModel",
]
