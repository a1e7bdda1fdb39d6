from gan_sr_wind_field_tpu.config.config import (
    Config,
    DatasetConfig,
    DiscriminatorConfig,
    EnvConfig,
    GANConfig,
    GeneratorConfig,
    TrainingConfig,
    load_config,
    safe_list_from_string,
)

__all__ = [
    "Config",
    "DatasetConfig",
    "DiscriminatorConfig",
    "EnvConfig",
    "GANConfig",
    "GeneratorConfig",
    "TrainingConfig",
    "load_config",
    "safe_list_from_string",
]
