from lass_tpu.train.optim import get_lr_schedule, build_optimizer

__all__ = ["get_lr_schedule", "build_optimizer"]
