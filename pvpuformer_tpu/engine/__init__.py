from . import losses, metrics, optimizer, prompt_sim, train_step  # noqa: F401
