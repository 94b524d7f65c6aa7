from lass_tpu.utils.logging import create_logging, MetricsLogger

__all__ = ["create_logging", "MetricsLogger"]
