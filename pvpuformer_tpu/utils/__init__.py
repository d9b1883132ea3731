from .serialization import (save_checkpoint, load_checkpoint,  # noqa: F401
                            config_to_dict, config_from_dict)
