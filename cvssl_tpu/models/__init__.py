"""Model zoo: 2D (UNet family, SwinUnet, ENet, PNet, nnUNet, ...) and 3D
(UNet3D, VNet, VoxResNet, attention UNet, UNETR, SwinUNETR) backbones plus
SSL auxiliaries (discriminators, contrastive heads)."""

from cvssl_tpu.models.factory import (  # noqa: F401
    net_factory, net_factory_3d, available_2d, available_3d)
