from graphsage_tpu.utils.metrics import micro_f1, macro_f1, accuracy

__all__ = ["micro_f1", "macro_f1", "accuracy"]
