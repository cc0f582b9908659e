from .checkpoint import (load_deit_checkpoint, load_dit_checkpoint,
                         save_params, load_params)
