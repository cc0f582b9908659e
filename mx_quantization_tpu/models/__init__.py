"""Model zoo: DeiT/ViT, DiT, PixArt-alpha transformers (MX-quantized)."""

from .vit import (VIT_CONFIGS, VitConfig, VitQuantConfig, create_vit,
                  init_vit, vit_forward)
from .dit import (DiT_models, DiTConfig, DiTQuantConfig, dit_forward,
                  dit_forward_with_cfg, init_dit, get_2d_sincos_pos_embed,
                  timestep_embedding)
from .pixart import (PixArtConfig, PixArtQuantConfig, init_pixart,
                     pixart_forward)
