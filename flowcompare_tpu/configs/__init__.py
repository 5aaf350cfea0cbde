from .presets import PRESETS, derive, from_checkpoint_config, get_config

__all__ = ["PRESETS", "derive", "from_checkpoint_config", "get_config"]
