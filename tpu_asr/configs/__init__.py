from tpu_asr.configs.presets import PRESETS, TrainConfig, get_preset

__all__ = ["PRESETS", "TrainConfig", "get_preset"]
