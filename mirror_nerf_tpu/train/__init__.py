from .losses import LossSettings, total_loss  # noqa: F401
