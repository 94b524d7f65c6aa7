from lass_tpu.tasks.audiosep import AudioSepTask, TrainState

__all__ = ["AudioSepTask", "TrainState"]
