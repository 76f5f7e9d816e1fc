from .config import Config, load_config, load_config_from_dict  # noqa: F401
